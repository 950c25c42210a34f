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


def decode_video(payload: bytes) -> "object":
    """Decode a video payload to frames.  STUB: no ffmpeg/av in this
    container."""
    raise NotImplementedError(
        "video decoding requires ffmpeg/pyav not present in this "
        "container; wire it here in a real deployment"
    )


def decode_audio(payload: bytes) -> "object":
    """Decode an audio payload to samples.  STUB: no soundfile/librosa
    in this container."""
    raise NotImplementedError(
        "audio decoding requires soundfile/librosa not present in this "
        "container; wire it here in a real deployment"
    )


#: Deterministic stand-ins for the decoded paths, so the Spark-side
#: plumbing (schemas, Arrow batch shapes, fan-out) is oracle-checkable:
#: "resize" keeps every RESIZE_STRIDE-th byte up to RESIZE_MAX bytes;
#: "frame sampling" treats the payload as FRAME_BYTES-sized frames and
#: keeps every FRAME_STRIDE-th frame.
RESIZE_STRIDE = 4
RESIZE_MAX = 64
FRAME_BYTES = 32
FRAME_STRIDE = 4

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("orig_len", T.IntegerType(), True),
        T.StructField("thumb_len", T.IntegerType(), True),
        T.StructField("thumb_sum", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_len", T.IntegerType(), True),
        T.StructField("frame_sum", T.IntegerType(), True),
    ]
)


def _resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Stand-in resize: downsample the byte stream (a real deployment
    decodes + PIL-resizes here; same schema, same batch shape)."""
    import pandas as pd

    for pdf in batches:
        payloads = pdf["payload"]
        thumbs = payloads.map(lambda b: b[:: RESIZE_STRIDE][:RESIZE_MAX])
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "orig_len": payloads.map(len).astype("int32"),
                "thumb_len": thumbs.map(len).astype("int32"),
                "thumb_sum": thumbs.map(lambda t: sum(t) % 65536).astype("int32"),
            }
        )


def _frame_sample_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Stand-in frame sampler: fan-out — each asset row yields one row
    per sampled frame (the Arrow batch out is LARGER than the batch
    in, the shape a real video pipeline has)."""
    import pandas as pd

    for pdf in batches:
        ids, idxs, lens, sums = [], [], [], []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                frame = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                ids.append(asset_id)
                idxs.append(i)
                lens.append(len(frame))
                sums.append(sum(frame) % 65536)
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_len": pd.Series(lens, dtype="int32"),
                "frame_sum": pd.Series(sums, dtype="int32"),
            }
        )


def resize_assets(assets: DataFrame) -> DataFrame:
    """mapInPandas resize (stand-in byte downsample; decode stubbed)."""
    return assets.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


def sample_frames(assets: DataFrame) -> DataFrame:
    """mapInPandas frame sampling with per-row fan-out."""
    return assets.mapInPandas(_frame_sample_batches, schema=FRAME_SCHEMA)


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


def _multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return resize_assets(assets_from_documents(docs)).orderBy("asset_id")


_RESIZE_ORACLE = f"""
SELECT doc_id AS asset_id,
       CAST(len(text) AS INT) AS orig_len,
       CAST(least((len(text) + {RESIZE_STRIDE - 1}) // {RESIZE_STRIDE}, {RESIZE_MAX}) AS INT) AS thumb_len,
       CAST(list_reduce(
              list_prepend(CAST(0 AS BIGINT),
                list_transform(
                  range(0, least((len(text) + {RESIZE_STRIDE - 1}) // {RESIZE_STRIDE}, {RESIZE_MAX})),
                  i -> CAST(unicode(substr(text, 1 + i * {RESIZE_STRIDE}, 1)) AS BIGINT))),
              (a, b) -> a + b) % 65536 AS INT) AS thumb_sum
FROM documents ORDER BY asset_id
"""


#: Audio stand-in: treat the payload as 8-bit PCM; per-window energy
#: (sum of squared samples) over AUDIO_WINDOW-byte windows, first
#: AUDIO_MAX_WINDOWS windows — the batch shape of a real spectrogram /
#: VAD feature stage (decode stubbed like image/video).
AUDIO_WINDOW = 16
AUDIO_MAX_WINDOWS = 4

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_windows", T.IntegerType(), True),
        # CSV-rendered (the external driver's pandas canonicalizer
        # cannot sort/hash raw array columns).
        T.StructField("energies", T.StringType(), True),
    ]
)


def _audio_energy_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    def energies(b: bytes) -> str:
        n = (len(b) + AUDIO_WINDOW - 1) // AUDIO_WINDOW
        out = []
        for w in range(min(n, AUDIO_MAX_WINDOWS)):
            win = b[w * AUDIO_WINDOW : (w + 1) * AUDIO_WINDOW]
            out.append(sum(x * x for x in win))
        return ",".join(str(x) for x in out)

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "n_windows": payloads.map(
                    lambda b: (len(b) + AUDIO_WINDOW - 1) // AUDIO_WINDOW
                ).astype("int32"),
                "energies": payloads.map(energies),
            }
        )


def audio_energies(assets: DataFrame) -> DataFrame:
    """mapInPandas windowed-energy extraction (decode stubbed)."""
    return assets.mapInPandas(_audio_energy_batches, schema=AUDIO_SCHEMA)


def _multimodal_audio(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return audio_energies(assets_from_documents(docs)).orderBy("asset_id")


_AUDIO_ORACLE = f"""
SELECT doc_id AS asset_id,
       CAST((len(text) + {AUDIO_WINDOW - 1}) // {AUDIO_WINDOW} AS INT) AS n_windows,
       coalesce(list_aggregate(list_transform(list_transform(
         range(0, least((len(text) + {AUDIO_WINDOW - 1}) // {AUDIO_WINDOW},
                        {AUDIO_MAX_WINDOWS})),
         w -> list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                  list_transform(
                    range(1, least(len(text) - w * {AUDIO_WINDOW}, {AUDIO_WINDOW}) + 1),
                    j -> CAST(unicode(substr(text, w * {AUDIO_WINDOW} + j, 1)) AS BIGINT)
                         * CAST(unicode(substr(text, w * {AUDIO_WINDOW} + j, 1)) AS BIGINT))),
                (a, b) -> a + b)), x -> CAST(x AS VARCHAR)), 'string_agg', ','), '') AS energies
FROM documents ORDER BY asset_id
"""


def _multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return sample_frames(assets_from_documents(docs)).orderBy("asset_id", "frame_idx")


_FRAMES_ORACLE = f"""
WITH f AS (
  SELECT doc_id AS asset_id, text, len(text) AS L,
         unnest(range(0, (len(text) + {FRAME_BYTES - 1}) // {FRAME_BYTES}, {FRAME_STRIDE})) AS fi
  FROM documents)
SELECT asset_id,
       CAST(fi AS INT) AS frame_idx,
       CAST(least(L - fi * {FRAME_BYTES}, {FRAME_BYTES}) AS INT) AS frame_len,
       CAST(list_reduce(
              list_prepend(CAST(0 AS BIGINT),
                list_transform(
                  range(1, least(L - fi * {FRAME_BYTES}, {FRAME_BYTES}) + 1),
                  j -> CAST(unicode(substr(text, fi * {FRAME_BYTES} + j, 1)) AS BIGINT))),
              (a, b) -> a + b) % 65536 AS INT) AS frame_sum
FROM f ORDER BY asset_id, frame_idx
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "multimodal_features",
        "Binary-payload feature extraction via Arrow mapInPandas "
        "(decode step stubbed; plumbing real)",
        _multimodal_features,
        _FEATURES_ORACLE,
    ),
    QuerySpec(
        "multimodal_resize",
        "Binary-payload resize via mapInPandas (byte-downsample stand-in)",
        _multimodal_resize,
        _RESIZE_ORACLE,
    ),
    QuerySpec(
        "multimodal_frames",
        "Video-frame sampling via mapInPandas with per-row fan-out",
        _multimodal_frames,
        _FRAMES_ORACLE,
    ),
    QuerySpec(
        "multimodal_audio",
        "Audio windowed-energy features via mapInPandas (decode stubbed)",
        _multimodal_audio,
        _AUDIO_ORACLE,
    ),
]
