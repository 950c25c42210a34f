"""Python UDF surface (SURVEY Q27): Arrow-batched Pandas UDFs.

The reference has no UDF surface; the engine exposes Spark's — with the
scale rule that Python in the row path must be Arrow-batched
(``pandas_udf`` / ``applyInPandas``), never row-at-a-time ``udf``:
vectorized transfer is the difference between a 1× and a 100× slowdown
over built-ins on a 100 TB corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table


def make_py_norm():
    """Vectorized scalar Pandas UDF: lowercase + strip spaces.  Built
    lazily — pandas_udf registration needs an active session."""

    def py_norm(s: "pd.Series") -> "pd.Series":
        return s.str.lower().str.strip(" ")

    return pandas_udf(py_norm, T.StringType())


def make_py_mean():
    """Grouped-aggregate Pandas UDF (type-hint form: Series -> scalar
    marks it GROUPED_AGG without the deprecated PandasUDFType)."""

    def py_mean(v: pd.Series) -> float:
        return float(v.mean())

    return pandas_udf(py_mean, T.DoubleType())


def _pandas_norm(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", make_py_norm()("text").alias("norm")).orderBy("doc_id")


def _pandas_grouped_agg(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return (
        d.groupBy("lang")
        .agg(F.round(make_py_mean()("n_chars"), 4).alias("mean_chars"))
        .orderBy("lang")
    )


def make_sentence_udtf():
    """Python UDTF (Spark 4 table function): one input doc row →
    one output row per '. '-separated sentence, with its position.
    UDTFs are the row-multiplying Python surface (SURVEY Q27); like
    all Python-in-the-row-path, reserve for logic Catalyst can't
    express — this one IS expressible (posexplode(split(...))), which
    is exactly what makes it oracle-checkable."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for pos, sentence in enumerate(text.split(". ")):
                yield pos, sentence

    return SentenceSplit


def _udtf_sentences(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    SentenceSplit = make_sentence_udtf()
    spark.udtf.register("sentence_split", SentenceSplit)
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.sentence
        FROM __udtf_docs d,
             LATERAL sentence_split(d.doc_id, d.text) s
        ORDER BY d.doc_id, s.pos
        """
    )


_UDTF_ORACLE = """
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, '. '), 1) - 1 AS INT) AS pos,
       unnest(string_split(text, '. ')) AS sentence
FROM documents WHERE doc_id < 100
ORDER BY doc_id, pos
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "q27c_udtf",
        "Python UDTF: per-row sentence fan-out via LATERAL (Q27)",
        _udtf_sentences,
        _UDTF_ORACLE,
    ),
    QuerySpec(
        "q27_pandas_udf",
        "Scalar Pandas UDF (Arrow-vectorized normalization, Q27)",
        _pandas_norm,
        "SELECT doc_id, lower(trim(text, ' ')) AS norm FROM documents ORDER BY doc_id",
    ),
    QuerySpec(
        "q27_pandas_grouped_agg",
        "Grouped-aggregate Pandas UDF (Q27)",
        _pandas_grouped_agg,
        """
        SELECT lang, round(avg(n_chars), 4) AS mean_chars
        FROM documents GROUP BY lang ORDER BY lang
        """,
    ),
]
