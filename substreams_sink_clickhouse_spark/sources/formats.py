"""Generic table-source formats: parquet, CSV/TSV, JSON lines, ORC, XML.

The reference reads exactly one transport (gRPC substreams) and stores
in ClickHouse; this engine's table layer is format-agnostic the way
ClickHouse's ``file()``/``url()`` table functions are.  Everything maps
to Spark's native readers, so predicate pushdown / column pruning /
parallel split reading come for free where the format supports them
(parquet/ORC: full pushdown + pruning; CSV/JSON: pruning at parse
time, schema REQUIRED — schema inference scans the data twice and
guesses, never acceptable at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: formats whose reader needs an explicit schema at scale
_SCHEMA_REQUIRED = {"csv", "tsv", "json", "xml"}
_FORMATS = {"parquet", "orc", "csv", "tsv", "json", "xml"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    header: bool = True,
    row_tag: str = "row",
) -> DataFrame:
    """Read a table directory/file in any supported format.

    CSV/TSV/JSON require ``schema`` — inference is refused because it
    costs an extra full pass and produces driver-dependent types.
    """
    fmt = fmt.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    if fmt in _SCHEMA_REQUIRED and schema is None:
        raise ValueError(
            f"{fmt} requires an explicit schema (inference double-scans "
            "and guesses types; supply the catalog StructType)"
        )
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "json":
        return spark.read.schema(schema).json(path)
    if fmt == "xml":
        # Spark 4 built-in XML source (ClickHouse emits XML as an
        # output FORMAT; reading it back needs the row element name)
        return (
            spark.read.schema(schema)
            .option("rowTag", row_tag)
            .format("xml")
            .load(path)
        )
    sep = "\t" if fmt == "tsv" else ","
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", header: bool = True,
    row_tag: str = "row",
) -> None:
    """Write a DataFrame in any supported format (mode=overwrite)."""
    fmt = fmt.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "xml":
        writer.option("rowTag", row_tag).format("xml").save(path)
    else:
        sep = "\t" if fmt == "tsv" else ","
        writer.option("header", str(header).lower()).option("sep", sep).csv(path)
