"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Real pipelines carry images/audio/video as ``binary`` columns next to
typed metadata and run decode / resize / feature-extraction as
vectorized Pandas stages.  The decode libraries (PIL/ffmpeg/…) are not
in this container, so the *decode* step is stubbed behind
``NotImplementedError`` while everything Spark-side — schema, binary
column handling, Arrow batch shape, partitioning — is real and tested.
A deterministic byte-level feature extractor stands in for the decoded
path so the operator is oracle-checkable end-to-end.

Scale notes: ``mapInPandas`` streams Arrow batches — per-task memory is
one batch, not one partition; binary payloads should be size-bucketed
(``repartitionByRange`` on byte length) so batches stay balanced when
payload sizes are skewed (a 100 TB image corpus always is).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table

if TYPE_CHECKING:
    import pandas as pd

#: Schema of a multimodal asset row: payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("byte_len", T.IntegerType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("checksum16", T.IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to pixels.  STUB: the decode libraries
    are not available in this environment."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; wire PIL/torchvision here in a real deployment"
    )


def _extract_features_batches(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """Deterministic byte-level feature extraction (the stand-in for the
    decoded path).  Pure-pandas per Arrow batch: vectorized transfer,
    no per-row Python in the JVM loop."""
    import pandas as pd

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "byte_len": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                "checksum16": payloads.map(lambda b: sum(b[:16]) % 256).astype("int32"),
            }
        )


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal asset table from the documents fixture:
    payload = utf-8 bytes of the text (an opaque binary stand-in)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.map_from_arrays(
            F.array(F.lit("n_chars")), F.array(F.col("n_chars").cast("string"))
        ).alias("meta"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""
    return assets.mapInPandas(_extract_features_batches, schema=FEATURE_SCHEMA)


def _multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return extract_features(assets_from_documents(docs)).orderBy("asset_id")


#: Oracle: the fixture text is pure ASCII, so utf-8 bytes == codepoints.
_FEATURES_ORACLE = """
SELECT doc_id AS asset_id,
       CAST(len(text) AS INT) AS byte_len,
       CAST(unicode(substr(text, 1, 1)) AS INT) AS first_byte,
       CAST(list_reduce(
              list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, least(len(text), 16) + 1),
                               i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))),
              (a, b) -> a + b) % 256 AS INT) AS checksum16
FROM documents ORDER BY asset_id
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "multimodal_features",
        "Binary-payload feature extraction via Arrow mapInPandas "
        "(decode step stubbed; plumbing real)",
        _multimodal_features,
        _FEATURES_ORACLE,
    ),
]
