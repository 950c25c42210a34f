"""Guard the driver contract in __spark_entry__.py: entry() runs the
flagship query at sf0.001 and returns a non-empty DataFrame with a
stable schema; queries()/oracle_sql() stay consistent."""

import __spark_entry__ as entry_mod


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["r_name", "rev"]


def test_oracles_subset_of_queries():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(queries)
    # since round 6 EVERY entry has an oracle (q05b's sketch is now
    # checked via an exact count + validated error-bound boolean)
    assert set(queries) == set(oracles)
