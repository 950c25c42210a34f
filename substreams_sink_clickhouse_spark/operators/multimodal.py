"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Real pipelines carry images/audio/video as ``binary`` columns next to
typed metadata and run decode / resize / feature-extraction as
vectorized Pandas stages.  The decode step is REAL for the container
formats implementable without native libraries: WAV via the stdlib
RIFF parser (``decode_audio``), 24-bit BMP with stride-padding /
BGR / bottom-up handling and binary PPM (``decode_image``), PNG —
a complete decoder built on stdlib zlib: chunk CRC walk, inflate,
all five scanline filters (``decode_png``) — baseline-sequential
JPEG via the stdlib+numpy codec in ``jpeg_codec.py`` (marker parse,
DHT Huffman reconstruction, dequant, IDCT; grayscale profile) — and
a raw concatenated-frame video container (``decode_video``).  Codecs
still needing native libraries (WebP/H.264/MP3, chroma-subsampled
color JPEG) raise ``ValueError`` — PIL/ffmpeg/soundfile are not in
this container; the Arrow plumbing around them is identical either
way.  The byte-level feature extractors remain as the
oracle-checkable fast path; the ``multimodal_wav_decode`` /
``multimodal_bmp_decode`` / ``multimodal_png_decode`` /
``multimodal_jpeg_decode`` gate entries run encode -> real decode ->
features end-to-end.

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


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(rgb_topdown: bytes, width: int, height: int) -> bytes:
    """Encode top-down RGB bytes as a REAL PNG (zlib DEFLATE is
    stdlib; PNG needs nothing else).  Scanline filters cycle through
    all five types (None/Sub/Up/Average/Paeth) by row index, so any
    image of >=5 rows exercises the decoder's full unfiltering path —
    the encode is not a no-op wrapper."""
    import struct
    import zlib

    bpp = 3
    stride = width * bpp
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = rgb_topdown[y * stride : (y + 1) * stride]
        f = y % 5
        raw.append(f)
        if f == 0:
            raw += row
        elif f == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:  # Average
            raw += bytes(
                (row[i] - (((row[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Real PNG decode for 8-bit truecolor (type 2) and grayscale
    (type 0), non-interlaced: chunk walk with CRC verification, IDAT
    concatenation, zlib inflate, and full five-filter scanline
    reconstruction (None/Sub/Up/Average/Paeth).  Grayscale expands to
    RGB so callers see one pixel layout.  Palette/alpha/16-bit/Adam7
    raise ``ValueError`` — documented capability bounds, not stubs."""
    import struct
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, ctype_id, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or comp != 0 or filt != 0:
                raise ValueError("only 8-bit depth, deflate, filter-method 0")
            if interlace != 0:
                raise ValueError("Adam7 interlacing not supported")
            if ctype_id == 2:
                channels = 3
            elif ctype_id == 0:
                channels = 1
            else:
                raise ValueError(f"PNG color type {ctype_id} not supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter type {f}")
        prev = line
        out += line
    if channels == 1:  # expand grayscale to RGB
        out = bytearray(b for g in out for b in (g, g, g))
    return width, height, bytes(out)


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an image payload to ``(width, height, rgb_bytes)``.

    Real pure-Python decoders for the two uncompressed container
    formats this engine ships with:

    * **BMP** (``BM`` magic): 24-bit BITMAPINFOHEADER files.  Handles
      the three things naive parsers get wrong — the 4-byte row-stride
      padding, the bottom-up row order (positive ``biHeight``), and
      the BGR channel order — returning top-down RGB.
    * **PPM** (``P6`` magic): binary Portable Pixmap; whitespace/
      comment-tolerant header parse, raw RGB payload.

    * **PNG** (full signature): real DEFLATE decode via
      :func:`decode_png` — zlib is stdlib, so this is a complete
      decoder for 8-bit RGB/grayscale, all five scanline filters.

    * **JPEG** (``FFD8`` magic): real baseline-sequential decode via
      :func:`operators.jpeg_codec.decode_jpeg_color` (marker parse,
      DHT Huffman reconstruction, dequant, IDCT) — grayscale (luma
      replicated to RGB) and 3-component YCbCr with 4:2:0 / 4:2:2 /
      4:4:0 / 4:4:4 chroma subsampling.  Progressive / 12-bit JPEGs
      raise ``ValueError`` naming the marker.

    Formats still needing codecs outside the stdlib (WebP) raise
    ``ValueError`` with the magic.
    """
    import struct

    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        off_bits = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        if hdr_size < 40 or planes != 1 or bpp != 24:
            raise ValueError(f"unsupported BMP variant (bpp={bpp})")
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
        rows = []
        for y in range(h):
            src_y = (h - 1 - y) if bottom_up else y
            row = payload[off_bits + src_y * stride : off_bits + src_y * stride + w * 3]
            if len(row) != w * 3:
                raise ValueError("truncated BMP pixel data")
            # BGR -> RGB
            rows.append(bytes(b for px in range(w) for b in row[px * 3 : px * 3 + 3][::-1]))
        return w, h, b"".join(rows)
    if payload[:2] == b"P6":
        fields: list[int] = []
        i = 2
        while len(fields) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment to end of line
                while i < len(payload) and payload[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        i += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError("only 8-bit PPM supported")
        rgb = payload[i : i + w * h * 3]
        if len(rgb) != w * h * 3:
            raise ValueError("truncated PPM pixel data")
        return w, h, rgb
    if payload[:8] == PNG_SIG:
        w, h, rgb = decode_png(payload)
        return w, h, rgb
    if payload[:2] == b"\xff\xd8":
        from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
            decode_jpeg_color,
        )

        # handles baseline grayscale AND 3-component YCbCr (4:2:0 /
        # 4:2:2 / 4:4:0 / 4:4:4); grayscale luma is replicated to RGB
        return decode_jpeg_color(payload)
    raise ValueError(f"unsupported image format (magic={payload[:2]!r}); "
                     "WebP needs an imaging library not in this container")


#: Magic + layout of the engine's raw video container: concatenated
#: length-prefixed PPM frames.  Interframe codecs (H.264/VP9) need
#: ffmpeg; a raw frame container is what a decode stage downstream of
#: a demuxer actually consumes.
VIDEO_MAGIC = b"VID0"


def decode_video(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Decode a raw-container video payload to a list of
    ``(width, height, rgb_bytes)`` frames.

    Container layout: ``b"VID0"`` + u32-LE frame count, then each
    frame as u32-LE length + PPM bytes (see :func:`decode_image`).
    Compressed codecs raise ``ValueError`` — they need ffmpeg/pyav,
    not present in this container.
    """
    import struct

    if payload[:4] != VIDEO_MAGIC:
        raise ValueError(f"unsupported video container (magic={payload[:4]!r}); "
                         "compressed codecs need ffmpeg/pyav")
    (n_frames,) = struct.unpack_from("<I", payload, 4)
    frames = []
    pos = 8
    for _ in range(n_frames):
        (flen,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        frames.append(decode_image(payload[pos : pos + flen]))
        pos += flen
    return frames


def decode_audio(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a WAV payload to ``(nchannels, sampwidth, framerate,
    sample_bytes)`` using the stdlib RIFF/WAVE parser.

    Real container decode: the ``wave`` module validates the RIFF
    chunk structure, fmt chunk, and PCM encoding.  Perceptual codecs
    (MP3/Opus/FLAC) raise ``ValueError`` — they need an audio library
    not present in this container.
    """
    import io
    import wave

    if payload[:4] != b"RIFF":
        raise ValueError(f"unsupported audio container (magic={payload[:4]!r}); "
                         "compressed codecs need soundfile/librosa")
    with wave.open(io.BytesIO(payload), "rb") as rd:
        return (
            rd.getnchannels(),
            rd.getsampwidth(),
            rd.getframerate(),
            rd.readframes(rd.getnframes()),
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
    """mapInPandas resize (stand-in byte downsample).

    Projects to (asset_id, payload) before the Arrow exchange — the
    batch function touches nothing else, and shipping the metadata map
    through Arrow would be pure transfer cost (mapInPandas consumes
    whole rows; Catalyst cannot column-prune through it)."""
    return assets.select("asset_id", "payload").mapInPandas(
        _resize_batches, schema=RESIZE_SCHEMA
    )


def sample_frames(assets: DataFrame) -> DataFrame:
    """mapInPandas frame sampling with per-row fan-out (input projected
    to the two consumed columns before the Arrow exchange)."""
    return assets.select("asset_id", "payload").mapInPandas(
        _frame_sample_batches, schema=FRAME_SCHEMA
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
    """Feature extraction over binary payloads as a struct-returning
    scalar ``pandas_udf``.

    The scalar form is the right API for 1:1 row-aligned shapes: it
    composes with other projections, and BECAUSE it is elidable,
    Catalyst drops it entirely when a caller never touches the
    features — free column pruning the map-iter form structurally
    cannot get.

    HAZARD (measured, Spark 4.1): a ``filter`` directly on a scalar
    pandas-UDF output column plans as TWO ``ArrowEvalPython`` nodes
    (the predicate's and the projection's) and the filter-side eval
    degrades ~25x (84 ms -> 4.2 s on a 5000-row coalesced input).
    Callers that filter on the extracted features should go through
    :func:`extract_features_mip` (the ``mapInPandas`` kernel — a
    pipeline barrier, evaluated exactly once) or insert an
    ``explode(array(...))`` Generate barrier first."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _feats_fn(p):
        return pd.DataFrame(
            {
                "byte_len": p.map(len).astype("int32"),
                "first_byte": p.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                "checksum16": p.map(lambda b: sum(b[:16]) % 256).astype("int32"),
            }
        )

    # set hints explicitly: the module's `from __future__ import
    # annotations` would stringify inline ones, which pandas_udf's
    # signature inspection rejects
    _feats_fn.__annotations__ = {"p": pd.Series, "return": pd.DataFrame}
    _feats = pandas_udf(_feats_fn, "byte_len int, first_byte int, checksum16 int")

    return assets.select("asset_id", _feats("payload").alias("f")).select(
        "asset_id", "f.*"
    )


def extract_features_mip(assets: DataFrame) -> DataFrame:
    """The ``mapInPandas`` form of :func:`extract_features`: identical
    semantics and Arrow batching, but the map-iter node is a pipeline
    barrier Catalyst can neither duplicate nor elide — one Python
    evaluation no matter what predicates the caller stacks on top
    (see the filter-duplication hazard in ``extract_features``)."""
    return assets.select("asset_id", "payload").mapInPandas(
        _extract_features_batches, schema=FEATURE_SCHEMA
    )


def _parallel_docs(spark: SparkSession, sf: str) -> DataFrame:
    """The documents fixture with scan parallelism decoupled from its
    single row group: every decode entry's per-row Python (RIFF/BMP/
    PNG/JPEG parse, resample, VAD) is the expensive stage, and a
    one-row-group parquet file otherwise feeds ONE Python worker.
    ``ensure_parallelism`` is a no-op whenever the input already has
    splits, i.e. at any real corpus scale."""
    from substreams_sink_clickhouse_spark.functions.skew import ensure_parallelism

    return ensure_parallelism(load_table(spark, sf, "documents"))


def _multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    # unordered result set (SQL semantics): presentation sorts cost
    # a range exchange + sampler job per execution.  The empty-payload
    # filter is the operator's real contract (decode stages drop empty
    # assets) — and it makes the result's cardinality depend on the
    # extracted features, so a count-only action cannot prune the UDF.
    # mapInPandas, not the scalar pandas_udf: the filter on a UDF
    # output column would otherwise be double-evaluated at a ~25x
    # per-partition cost (see extract_features).  On an idle 32-thread
    # box the wall-clock looks similar (cores absorb the waste); the
    # CPU burned per execution drops ~10x, which is what survives
    # contention and cluster scale.
    return extract_features_mip(assets_from_documents(docs)).filter(
        F.col("byte_len") > 0
    )


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
FROM documents WHERE len(text) > 0 ORDER BY asset_id
"""


def _multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    docs = _parallel_docs(spark, sf)
    return resize_assets(assets_from_documents(docs))  # unordered; see _multimodal_features


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
    """mapInPandas windowed-energy extraction over raw payload bytes
    (for container decode see :func:`decode_audio` / the
    ``multimodal_wav_decode`` gate entry)."""
    return assets.select("asset_id", "payload").mapInPandas(
        _audio_energy_batches, schema=AUDIO_SCHEMA
    )


def _multimodal_audio(spark: SparkSession, sf: str) -> DataFrame:
    docs = _parallel_docs(spark, sf)
    return audio_energies(assets_from_documents(docs))  # unordered; see _multimodal_features


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


# ---------------------------------------------------------------- real
# decode paths: encode each document's bytes into a genuine media
# container (WAV / BMP), then run the real decoder inside the Arrow
# batch — container parse, stride/channel-order handling and all —
# and extract features from the DECODED samples/pixels.  The features
# are pure integer functions of the original text bytes, so DuckDB
# can verify them end-to-end.

#: WAV synthesis parameters: 8-bit unsigned mono PCM at 8 kHz, first
#: AUDIO_MAX_BYTES text bytes as samples.
AUDIO_RATE = 8000
AUDIO_MAX_BYTES = 256

#: BMP synthesis parameters: 24-bit, WIDTH x HEIGHT, top-left pixel =
#: first 3 text bytes.  WIDTH=17 makes the row stride (51) non-4-byte-
#: aligned, so the decoder's padding handling is actually exercised.
BMP_WIDTH = 17
BMP_HEIGHT = 4


def encode_wav(samples: bytes) -> bytes:
    """Frame raw 8-bit PCM samples as a WAV file (stdlib writer)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wr:
        wr.setnchannels(1)
        wr.setsampwidth(1)
        wr.setframerate(AUDIO_RATE)
        wr.writeframes(samples)
    return buf.getvalue()


def encode_bmp(rgb_topdown: bytes, width: int, height: int) -> bytes:
    """Frame raw top-down RGB bytes as a 24-bit BMP: bottom-up row
    order, BGR channel order, 4-byte row-stride padding — the layout
    every real .bmp on disk has."""
    import struct

    stride = (width * 3 + 3) & ~3
    img = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = rgb_topdown[(y * width + x) * 3 : (y * width + x) * 3 + 3]
            row += bytes((b, g, r))  # BGR
        row += b"\x00" * (stride - len(row))
        img += row
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(img), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return header + bytes(img)


WAV_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("framerate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sum_amp", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
    ]
)


def _wav_decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Encode -> real WAV decode -> features, per Arrow batch."""
    import pandas as pd

    def feats(b: bytes):
        wav = encode_wav(b[:AUDIO_MAX_BYTES])
        nch, sw, rate, samples = decode_audio(wav)
        assert nch == 1 and sw == 1
        return rate, len(samples), sum(samples), sum(x * x for x in samples)

    for pdf in batches:
        rows = [(a,) + feats(p) for a, p in zip(pdf["asset_id"], pdf["payload"])]
        yield pd.DataFrame(
            {
                "asset_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "framerate": pd.Series([r[1] for r in rows], dtype="int32"),
                "n_samples": pd.Series([r[2] for r in rows], dtype="int32"),
                "sum_amp": pd.Series([r[3] for r in rows], dtype="int64"),
                "sum_sq": pd.Series([r[4] for r in rows], dtype="int64"),
            }
        )


def _multimodal_wav(spark: SparkSession, sf: str) -> DataFrame:
    docs = _parallel_docs(spark, sf)
    assets = assets_from_documents(docs).select("asset_id", "payload")
    return assets.mapInPandas(_wav_decode_batches, schema=WAV_SCHEMA)  # unordered


_WAV_ORACLE = f"""
WITH s AS (
  SELECT doc_id AS asset_id,
         list_transform(range(1, least(len(text), {AUDIO_MAX_BYTES}) + 1),
                        i -> CAST(unicode(substr(text, i, 1)) AS BIGINT)) AS samp
  FROM documents)
SELECT asset_id,
       {AUDIO_RATE} AS framerate,
       CAST(len(samp) AS INT) AS n_samples,
       CAST(coalesce(list_sum(samp), 0) AS BIGINT) AS sum_amp,
       CAST(coalesce(list_sum(list_transform(samp, x -> x * x)), 0) AS BIGINT) AS sum_sq
FROM s ORDER BY asset_id
"""


BMP_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("first_r", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def _bmp_decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Encode -> real BMP decode (stride/BGR/bottom-up) -> channel
    stats, per Arrow batch."""
    import pandas as pd

    npx = BMP_WIDTH * BMP_HEIGHT

    def feats(b: bytes):
        rgb = (b[: npx * 3] + b"\x00" * (npx * 3))[: npx * 3]
        w, h, pixels = decode_image(encode_bmp(rgb, BMP_WIDTH, BMP_HEIGHT))
        assert (w, h) == (BMP_WIDTH, BMP_HEIGHT) and pixels == rgb
        return (
            w,
            h,
            pixels[0],
            sum(pixels[0::3]),
            sum(pixels[1::3]),
            sum(pixels[2::3]),
        )

    for pdf in batches:
        rows = [(a,) + feats(p) for a, p in zip(pdf["asset_id"], pdf["payload"])]
        yield pd.DataFrame(
            {
                "asset_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "width": pd.Series([r[1] for r in rows], dtype="int32"),
                "height": pd.Series([r[2] for r in rows], dtype="int32"),
                "first_r": pd.Series([r[3] for r in rows], dtype="int32"),
                "sum_r": pd.Series([r[4] for r in rows], dtype="int64"),
                "sum_g": pd.Series([r[5] for r in rows], dtype="int64"),
                "sum_b": pd.Series([r[6] for r in rows], dtype="int64"),
            }
        )


def _multimodal_bmp(spark: SparkSession, sf: str) -> DataFrame:
    docs = _parallel_docs(spark, sf)
    assets = assets_from_documents(docs).select("asset_id", "payload")
    return assets.mapInPandas(_bmp_decode_batches, schema=BMP_SCHEMA)  # unordered


_BMP_ORACLE = f"""
WITH px AS (
  SELECT doc_id AS asset_id,
         list_transform(range(0, {BMP_WIDTH * BMP_HEIGHT * 3}),
                        j -> CASE WHEN j < len(text)
                                  THEN CAST(unicode(substr(text, j + 1, 1)) AS BIGINT)
                                  ELSE 0 END) AS b
  FROM documents)
SELECT asset_id,
       {BMP_WIDTH} AS width,
       {BMP_HEIGHT} AS height,
       CAST(b[1] AS INT) AS first_r,
       CAST(list_sum(list_transform(range(0, {BMP_WIDTH * BMP_HEIGHT}), p -> b[3 * p + 1])) AS BIGINT) AS sum_r,
       CAST(list_sum(list_transform(range(0, {BMP_WIDTH * BMP_HEIGHT}), p -> b[3 * p + 2])) AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(range(0, {BMP_WIDTH * BMP_HEIGHT}), p -> b[3 * p + 3])) AS BIGINT) AS sum_b
FROM px ORDER BY asset_id
"""


def _multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    docs = _parallel_docs(spark, sf)
    return sample_frames(assets_from_documents(docs))  # unordered; see _multimodal_features


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
    QuerySpec(
        "multimodal_wav_decode",
        "Real WAV container decode (stdlib RIFF parser) inside Arrow "
        "batches: encode -> decode -> PCM sample stats",
        _multimodal_wav,
        _WAV_ORACLE,
    ),
    QuerySpec(
        "multimodal_bmp_decode",
        "Real BMP decode (stride padding, BGR, bottom-up) inside Arrow "
        "batches: encode -> decode -> channel stats",
        _multimodal_bmp,
        _BMP_ORACLE,
    ),
]


# ---------------------------------------------------------------- PNG

PNG_WIDTH = 13
PNG_HEIGHT = 5  # >= 5 rows: the filter cycle exercises all five types


def _png_decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Encode -> real PNG decode (zlib inflate + five-filter scanline
    reconstruction + chunk CRC verification) -> channel stats, per
    Arrow batch."""
    import pandas as pd

    npx = PNG_WIDTH * PNG_HEIGHT

    def feats(b: bytes):
        rgb = (b[: npx * 3] + b"\x00" * (npx * 3))[: npx * 3]
        w, h, pixels = decode_image(encode_png(rgb, PNG_WIDTH, PNG_HEIGHT))
        assert (w, h) == (PNG_WIDTH, PNG_HEIGHT) and pixels == rgb
        return (
            w,
            h,
            pixels[0],
            sum(pixels[0::3]),
            sum(pixels[1::3]),
            sum(pixels[2::3]),
        )

    for pdf in batches:
        rows = [(a,) + feats(p) for a, p in zip(pdf["asset_id"], pdf["payload"])]
        yield pd.DataFrame(
            {
                "asset_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "width": pd.Series([r[1] for r in rows], dtype="int32"),
                "height": pd.Series([r[2] for r in rows], dtype="int32"),
                "first_r": pd.Series([r[3] for r in rows], dtype="int32"),
                "sum_r": pd.Series([r[4] for r in rows], dtype="int64"),
                "sum_g": pd.Series([r[5] for r in rows], dtype="int64"),
                "sum_b": pd.Series([r[6] for r in rows], dtype="int64"),
            }
        )


def _multimodal_png(spark: SparkSession, sf: str) -> DataFrame:
    docs = _parallel_docs(spark, sf)
    assets = assets_from_documents(docs).select("asset_id", "payload")
    return assets.mapInPandas(_png_decode_batches, schema=BMP_SCHEMA)  # unordered


_PNG_ORACLE = f"""
WITH px AS (
  SELECT doc_id AS asset_id,
         list_transform(range(0, {PNG_WIDTH * PNG_HEIGHT * 3}),
                        j -> CASE WHEN j < len(text)
                                  THEN CAST(unicode(substr(text, j + 1, 1)) AS BIGINT)
                                  ELSE 0 END) AS b
  FROM documents)
SELECT asset_id,
       {PNG_WIDTH} AS width,
       {PNG_HEIGHT} AS height,
       CAST(b[1] AS INT) AS first_r,
       CAST(list_sum(list_transform(range(0, {PNG_WIDTH * PNG_HEIGHT}), p -> b[3 * p + 1])) AS BIGINT) AS sum_r,
       CAST(list_sum(list_transform(range(0, {PNG_WIDTH * PNG_HEIGHT}), p -> b[3 * p + 2])) AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(range(0, {PNG_WIDTH * PNG_HEIGHT}), p -> b[3 * p + 3])) AS BIGINT) AS sum_b
FROM px ORDER BY asset_id
"""


SPECS.append(
    QuerySpec(
        "multimodal_png_decode",
        "Real PNG decode (zlib inflate, 5-filter reconstruction, CRC "
        "checks) inside Arrow batches: encode -> decode -> channel stats",
        _multimodal_png,
        _PNG_ORACLE,
    )
)


# -------------------------------------------------- decoded resize

RESIZE_W, RESIZE_H = 8, 2  # target dims for the decoded-resize entry


def resize_nearest(
    pixels: bytes, w: int, h: int, w2: int, h2: int
) -> bytes:
    """Nearest-neighbor resample of top-down RGB pixels (the standard
    decode-stage resize; floor mapping ``src = dst * src_dim //
    dst_dim``)."""
    out = bytearray()
    for y2 in range(h2):
        y = y2 * h // h2
        for x2 in range(w2):
            x = x2 * w // w2
            out += pixels[(y * w + x) * 3 : (y * w + x) * 3 + 3]
    return bytes(out)


def _resize_decoded_batches(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """Encode -> real BMP decode -> nearest-neighbor resize on DECODED
    pixels -> channel stats of the resized image, per Arrow batch."""
    import pandas as pd

    npx = BMP_WIDTH * BMP_HEIGHT

    def feats(b: bytes):
        rgb = (b[: npx * 3] + b"\x00" * (npx * 3))[: npx * 3]
        w, h, pixels = decode_image(encode_bmp(rgb, BMP_WIDTH, BMP_HEIGHT))
        small = resize_nearest(pixels, w, h, RESIZE_W, RESIZE_H)
        return (
            RESIZE_W,
            RESIZE_H,
            small[0],
            sum(small[0::3]),
            sum(small[1::3]),
            sum(small[2::3]),
        )

    for pdf in batches:
        rows = [(a,) + feats(p) for a, p in zip(pdf["asset_id"], pdf["payload"])]
        yield pd.DataFrame(
            {
                "asset_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "width": pd.Series([r[1] for r in rows], dtype="int32"),
                "height": pd.Series([r[2] for r in rows], dtype="int32"),
                "first_r": pd.Series([r[3] for r in rows], dtype="int32"),
                "sum_r": pd.Series([r[4] for r in rows], dtype="int64"),
                "sum_g": pd.Series([r[5] for r in rows], dtype="int64"),
                "sum_b": pd.Series([r[6] for r in rows], dtype="int64"),
            }
        )


def _multimodal_resize_decoded(spark: SparkSession, sf: str) -> DataFrame:
    docs = _parallel_docs(spark, sf)
    assets = assets_from_documents(docs).select("asset_id", "payload")
    return assets.mapInPandas(_resize_decoded_batches, schema=BMP_SCHEMA)  # unordered


#: The oracle replays the same floor-mapped nearest-neighbor gather on
#: the deterministic source bytes: src index = (y2*H//H2)*W + (x2*W//W2).
_RESIZE_DECODED_ORACLE = f"""
WITH px AS (
  SELECT doc_id AS asset_id,
         list_transform(range(0, {BMP_WIDTH * BMP_HEIGHT * 3}),
                        j -> CASE WHEN j < len(text)
                                  THEN CAST(unicode(substr(text, j + 1, 1)) AS BIGINT)
                                  ELSE 0 END) AS b
  FROM documents),
small AS (
  SELECT asset_id,
         flatten(list_transform(range(0, {RESIZE_H * RESIZE_W}), p ->
           [b[3 * ((p // {RESIZE_W} * {BMP_HEIGHT} // {RESIZE_H}) * {BMP_WIDTH}
                   + (p % {RESIZE_W}) * {BMP_WIDTH} // {RESIZE_W}) + 1],
            b[3 * ((p // {RESIZE_W} * {BMP_HEIGHT} // {RESIZE_H}) * {BMP_WIDTH}
                   + (p % {RESIZE_W}) * {BMP_WIDTH} // {RESIZE_W}) + 2],
            b[3 * ((p // {RESIZE_W} * {BMP_HEIGHT} // {RESIZE_H}) * {BMP_WIDTH}
                   + (p % {RESIZE_W}) * {BMP_WIDTH} // {RESIZE_W}) + 3]])) AS s
  FROM px)
SELECT asset_id,
       {RESIZE_W} AS width,
       {RESIZE_H} AS height,
       CAST(s[1] AS INT) AS first_r,
       CAST(list_sum(list_transform(range(0, {RESIZE_W * RESIZE_H}), p -> s[3 * p + 1])) AS BIGINT) AS sum_r,
       CAST(list_sum(list_transform(range(0, {RESIZE_W * RESIZE_H}), p -> s[3 * p + 2])) AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(range(0, {RESIZE_W * RESIZE_H}), p -> s[3 * p + 3])) AS BIGINT) AS sum_b
FROM small ORDER BY asset_id
"""


SPECS.append(
    QuerySpec(
        "multimodal_resize_decoded",
        "Real decode -> nearest-neighbor pixel resize -> channel stats",
        _multimodal_resize_decoded,
        _RESIZE_DECODED_ORACLE,
    )
)


# ------------------------------------------------------------------ JPEG

JPEG_W, JPEG_H = 32, 16  # 4x2 grid of 8x8 blocks


def _jpeg_decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Encode -> real baseline-JPEG decode (marker parse, Huffman,
    dequant, IDCT) -> pixel stats, per Arrow batch.

    The fixture image is built from the doc text as a 4x2 grid of
    SOLID 8x8 blocks (block i = byte i of text, 0-padded): flat blocks
    are pure DC, so with the unit quantization table the lossy codec
    roundtrips bit-exactly and the DuckDB oracle can state the
    expected pixels arithmetically (see jpeg_codec.py).  The decoder
    still runs its full baseline path — Huffman reconstruction from
    DHT, dezigzag, dequant, IDCT per block."""
    import pandas as pd

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    n_blocks = (JPEG_W // 8) * (JPEG_H // 8)

    def feats(b: bytes):
        vals = (b[:n_blocks] + b"\x00" * n_blocks)[:n_blocks]
        rows = bytearray()
        for by in range(JPEG_H // 8):
            for _y in range(8):
                for bx in range(JPEG_W // 8):
                    rows.extend([vals[by * (JPEG_W // 8) + bx]] * 8)
        pixels = bytes(rows)
        w, h, out = decode_jpeg_gray(encode_jpeg_gray(pixels, JPEG_W, JPEG_H))
        assert (w, h) == (JPEG_W, JPEG_H) and out == pixels  # DC-only => exact
        return w, h, out[0], sum(out)

    for pdf in batches:
        rows = [(a,) + feats(p) for a, p in zip(pdf["asset_id"], pdf["payload"])]
        yield pd.DataFrame(
            {
                "asset_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "width": pd.Series([r[1] for r in rows], dtype="int32"),
                "height": pd.Series([r[2] for r in rows], dtype="int32"),
                "first_px": pd.Series([r[3] for r in rows], dtype="int32"),
                "sum_px": pd.Series([r[4] for r in rows], dtype="int64"),
            }
        )


JPEG_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("first_px", T.IntegerType(), True),
        T.StructField("sum_px", T.LongType(), True),
    ]
)


def _multimodal_jpeg(spark: SparkSession, sf: str) -> DataFrame:
    # encode->decode is the per-row-expensive stage of this entry
    # (measured 4.4 s of 1-task executor time at sf0.1 before the
    # fan-out); see _parallel_docs
    docs = _parallel_docs(spark, sf)
    assets = assets_from_documents(docs).select("asset_id", "payload")
    return assets.mapInPandas(_jpeg_decode_batches, schema=JPEG_SCHEMA)  # unordered


_JPEG_ORACLE = f"""
WITH v AS (
  SELECT doc_id AS asset_id,
         list_transform(range(0, {(JPEG_W // 8) * (JPEG_H // 8)}),
                        j -> CASE WHEN j < len(text)
                                  THEN CAST(unicode(substr(text, j + 1, 1)) AS BIGINT)
                                  ELSE 0 END) AS b
  FROM documents)
SELECT asset_id,
       {JPEG_W} AS width,
       {JPEG_H} AS height,
       CAST(b[1] AS INT) AS first_px,
       CAST(64 * list_sum(b) AS BIGINT) AS sum_px
FROM v ORDER BY asset_id
"""


SPECS.append(
    QuerySpec(
        "multimodal_jpeg_decode",
        "Real baseline-JPEG decode (Huffman, dequant, IDCT) inside "
        "Arrow batches: encode -> decode -> pixel stats",
        _multimodal_jpeg,
        _JPEG_ORACLE,
    )
)


# ------------------------------------------------------------ color JPEG

JPEG_C_W, JPEG_C_H = 32, 32  # 2x2 grid of 16x16 MCUs (4:2:0)


def _jpeg_color_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Encode -> real baseline YCbCr 4:2:0 JPEG decode (interleaved
    MCUs, per-component DC predictors, chroma tables from DHT, chroma
    upsample, YCbCr->RGB) -> channel stats, per Arrow batch.

    The fixture image is a 2x2 grid of SOLID 16x16 RGB tiles (tile i's
    color = text bytes 3i..3i+2, 0-padded): solid MCU-aligned tiles
    keep every Y/Cb/Cr block pure DC AND make the 2x2 chroma box
    average exact, so with the unit quantization table the lossy codec
    roundtrips the YCbCr planes bit-exactly.  What the decoder returns
    is therefore exactly ycbcr_to_rgb(rgb_to_ycbcr(color)) — the
    color transform is integer-rounded in both directions with
    floor(x+0.5) (jpeg_codec.py), so the DuckDB oracle states the
    expected pixels with the same plain arithmetic."""
    import numpy as np
    import pandas as pd

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        decode_jpeg_color,
        encode_jpeg_color,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    tiles_x, tiles_y = JPEG_C_W // 16, JPEG_C_H // 16
    n_tiles = tiles_x * tiles_y

    def feats(b: bytes):
        vals = (b[: 3 * n_tiles] + b"\x00" * (3 * n_tiles))[: 3 * n_tiles]
        img = np.zeros((JPEG_C_H, JPEG_C_W, 3), dtype=np.uint8)
        for t in range(n_tiles):
            ty, tx = divmod(t, tiles_x)
            img[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16] = (
                vals[3 * t], vals[3 * t + 1], vals[3 * t + 2],
            )
        w, h, out = decode_jpeg_color(
            encode_jpeg_color(img.tobytes(), JPEG_C_W, JPEG_C_H)
        )
        got = np.frombuffer(out, dtype=np.uint8).reshape(JPEG_C_H, JPEG_C_W, 3)
        want = ycbcr_to_rgb(*rgb_to_ycbcr(img))
        assert (w, h) == (JPEG_C_W, JPEG_C_H) and (got == want).all()  # DC-only => exact
        return (
            w, h,
            int(got[0, 0, 0]), int(got[0, 0, 1]), int(got[0, 0, 2]),
            int(got[:, :, 0].sum(dtype=np.int64)),
            int(got[:, :, 1].sum(dtype=np.int64)),
            int(got[:, :, 2].sum(dtype=np.int64)),
        )

    for pdf in batches:
        rows = [(a,) + feats(p) for a, p in zip(pdf["asset_id"], pdf["payload"])]
        yield pd.DataFrame(
            {
                "asset_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "width": pd.Series([r[1] for r in rows], dtype="int32"),
                "height": pd.Series([r[2] for r in rows], dtype="int32"),
                "first_r": pd.Series([r[3] for r in rows], dtype="int32"),
                "first_g": pd.Series([r[4] for r in rows], dtype="int32"),
                "first_b": pd.Series([r[5] for r in rows], dtype="int32"),
                "sum_r": pd.Series([r[6] for r in rows], dtype="int64"),
                "sum_g": pd.Series([r[7] for r in rows], dtype="int64"),
                "sum_b": pd.Series([r[8] for r in rows], dtype="int64"),
            }
        )


JPEG_C_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("first_r", T.IntegerType(), True),
        T.StructField("first_g", T.IntegerType(), True),
        T.StructField("first_b", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def _multimodal_jpeg_color(spark: SparkSession, sf: str) -> DataFrame:
    # see _multimodal_jpeg: the color decode burned 9.3 s of 1-task
    # executor time at sf0.1 on the single-row-group fixture scan
    docs = _parallel_docs(spark, sf)
    assets = assets_from_documents(docs).select("asset_id", "payload")
    return assets.mapInPandas(_jpeg_color_batches, schema=JPEG_C_SCHEMA)  # unordered


#: The forward/inverse transform below mirrors jpeg_codec.rgb_to_ycbcr /
#: ycbcr_to_rgb term-for-term (same literals, same left-to-right
#: association, floor(x+0.5) rounding), so doubles agree bit-for-bit.
_JPEG_C_ORACLE = f"""
WITH v AS (
  SELECT doc_id AS asset_id,
         list_transform(range(0, {3 * (JPEG_C_W // 16) * (JPEG_C_H // 16)}),
                        j -> CASE WHEN j < len(text)
                                  THEN CAST(unicode(substr(text, j + 1, 1)) AS BIGINT)
                                  ELSE 0 END) AS b
  FROM documents),
t AS (
  SELECT asset_id,
         list_transform(range(0, {(JPEG_C_W // 16) * (JPEG_C_H // 16)}),
                        i -> [b[3 * i + 1], b[3 * i + 2], b[3 * i + 3]]) AS tiles
  FROM v),
ycc AS (
  SELECT asset_id, list_transform(tiles, c ->
    [least(255, greatest(0, floor(0.299 * c[1] + 0.587 * c[2] + 0.114 * c[3] + 0.5))),
     least(255, greatest(0, floor(128 - 0.168736 * c[1] - 0.331264 * c[2] + 0.5 * c[3] + 0.5))),
     least(255, greatest(0, floor(128 + 0.5 * c[1] - 0.418688 * c[2] - 0.081312 * c[3] + 0.5)))]) AS p
  FROM t),
rgb AS (
  SELECT asset_id, list_transform(p, q ->
    [least(255, greatest(0, floor(q[1] + 1.402 * (q[3] - 128) + 0.5))),
     least(255, greatest(0, floor(q[1] - 0.344136 * (q[2] - 128) - 0.714136 * (q[3] - 128) + 0.5))),
     least(255, greatest(0, floor(q[1] + 1.772 * (q[2] - 128) + 0.5)))]) AS p
  FROM ycc)
SELECT asset_id,
       {JPEG_C_W} AS width,
       {JPEG_C_H} AS height,
       CAST(p[1][1] AS INT) AS first_r,
       CAST(p[1][2] AS INT) AS first_g,
       CAST(p[1][3] AS INT) AS first_b,
       CAST(256 * list_sum(list_transform(p, q -> q[1])) AS BIGINT) AS sum_r,
       CAST(256 * list_sum(list_transform(p, q -> q[2])) AS BIGINT) AS sum_g,
       CAST(256 * list_sum(list_transform(p, q -> q[3])) AS BIGINT) AS sum_b
FROM rgb ORDER BY asset_id
"""


SPECS.append(
    QuerySpec(
        "multimodal_jpeg_color",
        "Real baseline YCbCr 4:2:0 color-JPEG decode (interleaved "
        "MCUs, chroma subsample/upsample, YCbCr->RGB) inside Arrow "
        "batches: encode -> decode -> channel stats",
        _multimodal_jpeg_color,
        _JPEG_C_ORACLE,
    )
)


# ------------------------------------------------ perceptual hash dedup

#: dHash grid: 8 rows x 9 gray columns -> 8 comparisons/row -> 64 bits.
PHASH_COLS = 9
PHASH_ROWS = 8

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("phash", T.StringType(), True),
    ]
)


def dhash64(gray_grid: list[int]) -> str:
    """64-bit difference hash over an 8x9 gray grid (row-major): bit
    ``r*8+c`` is set iff ``gray[r][c+1] > gray[r][c]`` — the standard
    dHash (gradient direction survives brightness/contrast shifts,
    which is why it is the stock perceptual near-dup key for image
    corpora).  Rendered as 16 hex chars so engines without uint64
    arithmetic compare it exactly."""
    h = 0
    for r in range(PHASH_ROWS):
        for c in range(PHASH_COLS - 1):
            if gray_grid[r * PHASH_COLS + c + 1] > gray_grid[r * PHASH_COLS + c]:
                h |= 1 << (r * (PHASH_COLS - 1) + c)
    return f"{h:016x}"


def _phash_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Encode -> real BMP decode -> nearest-neighbor resize to the
    dHash grid -> 64-bit difference hash, per Arrow batch."""
    import pandas as pd

    npx = BMP_WIDTH * BMP_HEIGHT

    def phash(b: bytes) -> str:
        rgb = (b[: npx * 3] + b"\x00" * (npx * 3))[: npx * 3]
        w, h, pixels = decode_image(encode_bmp(rgb, BMP_WIDTH, BMP_HEIGHT))
        small = resize_nearest(pixels, w, h, PHASH_COLS, PHASH_ROWS)
        gray = [
            (small[3 * i] + small[3 * i + 1] + small[3 * i + 2]) // 3
            for i in range(PHASH_COLS * PHASH_ROWS)
        ]
        return dhash64(gray)

    for pdf in batches:
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(list(pdf["asset_id"]), dtype="int64"),
                "phash": pd.Series([phash(p) for p in pdf["payload"]], dtype="object"),
            }
        )


def phash_assets(assets: DataFrame) -> DataFrame:
    """Per-asset perceptual hash (``asset_id``, ``phash``) — the
    image-level analogue of the text dedup family's fingerprints.
    One ``mapInPandas`` barrier; grouping/joining on the hash happens
    JVM-side downstream."""
    return assets.select("asset_id", "payload").mapInPandas(
        _phash_batches, schema=PHASH_SCHEMA
    )


def _multimodal_phash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Image near-dup dedup via perceptual hash: decode every asset,
    dHash it, then count bucket occupancy per hash — assets sharing a
    phash are visual near-duplicates (the image-side analogue of
    dedup_exact; at 100 TB the hash is the shuffle key and each
    bucket is tiny, same shape as the text MinHash banding).  The
    oracle replays the floor-mapped gray gather and the bit packing on
    the deterministic source bytes."""
    from pyspark.sql import Window

    docs = _parallel_docs(spark, sf)
    hashed = phash_assets(assets_from_documents(docs))
    return hashed.select(
        "asset_id",
        "phash",
        F.count(F.lit(1)).over(Window.partitionBy("phash")).alias("dup_count"),
    )  # unordered; see _multimodal_features


#: Oracle: gray(r,c) = mean of the RGB triple at the floor-mapped
#: source pixel (y = r*H//ROWS, x = c*W//COLS); bit k=r*8+c set iff
#: gray(r,c+1) > gray(r,c); rendered '%08x%08x' (hi32, lo32) exactly
#: like Python's f'{h:016x}'.
_PHASH_ORACLE = f"""
WITH px AS (
  SELECT doc_id AS asset_id,
         list_transform(range(0, {BMP_WIDTH * BMP_HEIGHT * 3}),
                        j -> CASE WHEN j < len(text)
                                  THEN CAST(unicode(substr(text, j + 1, 1)) AS BIGINT)
                                  ELSE 0 END) AS b
  FROM documents),
g AS (
  SELECT asset_id,
         list_transform(range(0, {PHASH_ROWS * PHASH_COLS}), p ->
           (b[3 * (((p // {PHASH_COLS}) * {BMP_HEIGHT} // {PHASH_ROWS}) * {BMP_WIDTH}
                   + ((p % {PHASH_COLS}) * {BMP_WIDTH} // {PHASH_COLS})) + 1]
          + b[3 * (((p // {PHASH_COLS}) * {BMP_HEIGHT} // {PHASH_ROWS}) * {BMP_WIDTH}
                   + ((p % {PHASH_COLS}) * {BMP_WIDTH} // {PHASH_COLS})) + 2]
          + b[3 * (((p // {PHASH_COLS}) * {BMP_HEIGHT} // {PHASH_ROWS}) * {BMP_WIDTH}
                   + ((p % {PHASH_COLS}) * {BMP_WIDTH} // {PHASH_COLS})) + 3]) // 3) AS gray
  FROM px),
bits AS (
  SELECT asset_id,
         list_transform(range(0, 64), k ->
           CASE WHEN gray[(k // 8) * {PHASH_COLS} + (k % 8) + 2]
                     > gray[(k // 8) * {PHASH_COLS} + (k % 8) + 1]
                THEN 1 ELSE 0 END) AS bit
  FROM g),
hashed AS (
  SELECT asset_id,
         printf('%08x%08x',
           CAST(list_sum(list_transform(range(32, 64),
                k -> bit[k + 1] * (1::BIGINT << (k - 32)))) AS BIGINT),
           CAST(list_sum(list_transform(range(0, 32),
                k -> bit[k + 1] * (1::BIGINT << k))) AS BIGINT)) AS phash
  FROM bits)
SELECT asset_id, phash,
       count(*) OVER (PARTITION BY phash) AS dup_count
FROM hashed ORDER BY asset_id
"""


SPECS.append(
    QuerySpec(
        "multimodal_phash_dedup",
        "Image near-dup dedup: real decode -> dHash-64 perceptual "
        "hash -> bucket occupancy per hash (image-side dedup_exact)",
        _multimodal_phash_dedup,
        _PHASH_ORACLE,
    )
)


# ---------------------------------------------- phash Hamming near-dup

PHASH_BANDS = 4
#: 4 bands of 16 bits guarantee recall only at Hamming distance <= 3
#: (pigeonhole: d differing bits can touch at most d bands, so one
#: band is exact whenever d < PHASH_BANDS).  The histogram threshold
#: therefore stops at 3 — every reported bucket is COMPLETE, not a
#: candidate subset (round-8 advisory: at the old threshold 6, pairs
#: at d=4..6 whose bits spanned all 4 bands were silently missing).
PHASH_HAM_T = PHASH_BANDS - 1


def phash_near_pairs(hashed: DataFrame) -> DataFrame:
    """Candidate near-dup pairs ``(ida, idb, la, lb)`` from a
    ``(asset_id, phash)`` DataFrame via banded Hamming LSH with the
    same bucket-expansion + hot-bucket contract as ``dedup_minhash``
    (dedup.py:182-216): band values group (ONE exchange), each bucket
    emits its ordered pairs as an array expansion — no join operator
    in the plan — and buckets over :data:`dedup.MAX_BUCKET_SIZE`
    collapse to linear star pairs against the bucket minimum instead
    of exploding quadratically (the degenerate-corpus hazard: a
    constant-color thumbnail corpus shares one 16-bit band value).

    The 16-hex phash is reinterpreted ONCE as a signed 64-bit integer
    (``la``/``lb``); bands are 16-bit integer slices of it and the
    downstream Hamming verify is a single ``bit_count(la ^ lb)`` —
    at 10x-replicated corpora the candidate set grows ~100x
    (quadratic in near-dup family size, by design), so per-pair cost
    must be one codegen op, not 32 substring/conv string allocations
    (measured: the string form turned the 10x scale proof from
    seconds into minutes)."""
    from substreams_sink_clickhouse_spark.operators.dedup import _pair_rows_capped

    with_long = hashed.select(
        "asset_id", F.expr("CAST(conv(phash, 16, -10) AS BIGINT)").alias("l")
    )
    bands = with_long.select(
        "asset_id",
        "l",
        F.explode(F.expr(f"sequence(0, {PHASH_BANDS - 1})")).alias("band"),
    ).withColumn(
        "bv", F.expr("CAST(shiftrightunsigned(l, 48 - band * 16) & 65535 AS INT)")
    )
    buckets = (
        bands.groupBy("band", "bv")
        .agg(F.sort_array(F.collect_list(F.struct("asset_id", "l"))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        _pair_rows_capped(buckets.select("ids"), "ids")
        .select(
            F.col("x.asset_id").alias("ida"),
            F.col("y.asset_id").alias("idb"),
            F.col("x.l").alias("la"),
            F.col("y.l").alias("lb"),
        )
        .distinct()
    )


def _multimodal_phash_near(spark: SparkSession, sf: str) -> DataFrame:
    """NEAR-duplicate images by Hamming distance on the 64-bit
    perceptual hash — the real-world upgrade of
    ``multimodal_phash_dedup`` (exact-equal buckets): images that
    differ by compression/resize noise land a few bits apart, not
    zero.

    Banded Hamming LSH (see :func:`phash_near_pairs`): the 16-hex
    phash splits into 4 bands of 16 bits; candidate pairs share at
    least one exact band, which guarantees recall at Hamming distance
    <= :data:`PHASH_HAM_T` = 3 — so the returned per-distance pair
    histogram is complete, not approximate.  Candidates verify with a
    single ``bit_count(la ^ lb)`` over the longs carried through the
    banding (whole-stage codegen, one op per pair) and the output is
    bounded (<= 4 rows) at any corpus size.

    Scale shape: the full ``dedup_minhash`` banding contract — ONE
    exchange on (band, value) equi-keys, bucket EXPANSION rather than
    a band self-join (no join operator in the plan), and the
    MAX_BUCKET_SIZE hot-bucket cap with star-pair collapse, mirrored
    in the oracle.
    """
    docs = _parallel_docs(spark, sf)
    hashed = phash_assets(assets_from_documents(docs))
    ham = phash_near_pairs(hashed).withColumn(
        "hamming", F.expr("CAST(bit_count(la ^ lb) AS BIGINT)")
    )
    return (
        ham.where(F.col("hamming") <= PHASH_HAM_T)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


def _phash_near_oracle() -> str:
    """Reuses the exact-phash oracle's decode CTE chain up to the
    ``bits`` CTE, re-packs the 64 bits as a SIGNED 64-bit integer
    (two's-complement — exactly Spark's ``conv(phash, 16, -10)``
    reinterpretation), bands it with integer arithmetic, candidate-
    generates (mirroring the Spark side's MAX_BUCKET_SIZE star-pair
    cap exactly as ``_duck_pairs_cte`` does for minhash), and
    verifies with one integer ``bit_count(xor(la, lb))`` per pair."""
    from substreams_sink_clickhouse_spark.operators.dedup import MAX_BUCKET_SIZE

    prefix = _PHASH_ORACLE[: _PHASH_ORACLE.rindex("hashed AS (")]
    if MAX_BUCKET_SIZE is None:
        cand = """cand AS (
  SELECT DISTINCT a.asset_id AS ida, b.asset_id AS idb, a.l AS la, b.l AS lb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv = b.bv AND a.asset_id < b.asset_id
)"""
    else:
        cand = f"""bsz AS (
  SELECT band, bv, count(*) AS n,
         min(asset_id) AS rep, arg_min(l, asset_id) AS rep_l
  FROM bands GROUP BY 1, 2
), cand AS (
  SELECT a.asset_id AS ida, b.asset_id AS idb, a.l AS la, b.l AS lb
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.asset_id < b.asset_id
  JOIN bsz s ON a.band = s.band AND a.bv = s.bv
  WHERE s.n <= {MAX_BUCKET_SIZE}
  UNION
  SELECT s.rep AS ida, b.asset_id AS idb, s.rep_l AS la, b.l AS lb
  FROM bands b
  JOIN bsz s ON b.band = s.band AND b.bv = s.bv
  WHERE s.n > {MAX_BUCKET_SIZE} AND b.asset_id > s.rep
)"""
    return f"""{prefix.rstrip().rstrip(',')},
hl AS (
  SELECT asset_id, hi, lo,
         CAST((hi - CASE WHEN hi >= 2147483648 THEN 4294967296 ELSE 0 END)
              * 4294967296 + lo AS BIGINT) AS l
  FROM (
    SELECT asset_id,
           CAST(list_sum(list_transform(range(32, 64),
                k -> bit[k + 1] * (1::BIGINT << (k - 32)))) AS BIGINT) AS hi,
           CAST(list_sum(list_transform(range(0, 32),
                k -> bit[k + 1] * (1::BIGINT << k))) AS BIGINT) AS lo
    FROM bits)),
bands AS (
  SELECT asset_id, l, 0 AS band, CAST(hi // 65536 AS INT) AS bv FROM hl
  UNION ALL
  SELECT asset_id, l, 1, CAST(hi % 65536 AS INT) FROM hl
  UNION ALL
  SELECT asset_id, l, 2, CAST(lo // 65536 AS INT) FROM hl
  UNION ALL
  SELECT asset_id, l, 3, CAST(lo % 65536 AS INT) FROM hl
), {cand}, ham AS (
  SELECT ida, idb, CAST(bit_count(xor(la, lb)) AS BIGINT) AS hamming
  FROM cand
)
SELECT hamming, count(*) AS n_pairs
FROM ham WHERE hamming <= {PHASH_HAM_T}
GROUP BY hamming ORDER BY hamming"""


SPECS.append(
    QuerySpec(
        "multimodal_phash_near",
        "Near-duplicate images: 4-band Hamming LSH on the perceptual "
        "hash, popcount-verified pair histogram",
        _multimodal_phash_near,
        _phash_near_oracle(),
    )
)


# -------------------------------------------------- voice activity

#: VAD windowing over the decoded PCM: 16 samples per energy window
#: (AUDIO_WINDOW), clip capped at AUDIO_MAX_BYTES samples like the
#: wav_decode path.  A window is SPEECH iff its energy exceeds the
#: clip's MEAN window energy — integer cross-multiplication
#: (e * n_windows > total), no division, so both engines agree exactly.
VAD_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_windows", T.IntegerType(), True),
        T.StructField("n_speech", T.IntegerType(), True),
        T.StructField("n_segments", T.IntegerType(), True),
    ]
)


def _vad_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Encode -> real WAV decode -> windowed-energy voice-activity
    segmentation, per Arrow batch."""
    import pandas as pd

    def feats(b: bytes):
        wav = encode_wav(b[:AUDIO_MAX_BYTES])
        _nch, _sw, _rate, samples = decode_audio(wav)
        wins = [
            samples[i : i + AUDIO_WINDOW]
            for i in range(0, len(samples), AUDIO_WINDOW)
        ]
        energies = [sum(x * x for x in w) for w in wins]
        n = len(energies)
        total = sum(energies)
        flags = [e * n > total for e in energies]
        segs = sum(
            1 for i, f in enumerate(flags) if f and (i == 0 or not flags[i - 1])
        )
        return n, sum(flags), segs

    for pdf in batches:
        rows = [(a,) + feats(p) for a, p in zip(pdf["asset_id"], pdf["payload"])]
        yield pd.DataFrame(
            {
                "asset_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "n_windows": pd.Series([r[1] for r in rows], dtype="int32"),
                "n_speech": pd.Series([r[2] for r in rows], dtype="int32"),
                "n_segments": pd.Series([r[3] for r in rows], dtype="int32"),
            }
        )


def _multimodal_vad(spark: SparkSession, sf: str) -> DataFrame:
    """Voice-activity detection over the decoded WAV clips — the audio
    curation step that decides which clips carry usable speech (energy
    VAD: windowed short-time energy vs the clip mean, then contiguous
    speech windows merge into segments).  Real decode path: the bytes
    round-trip through the RIFF container and the stdlib parser, like
    multimodal_wav_decode.

    Integer-exact by construction: energies are integer sums of
    squared 8-bit samples; the speech test cross-multiplies
    (e * n_windows > total) instead of comparing means, so there is no
    float anywhere and DuckDB replays the identical decision from the
    source text bytes.  Scale: one plan-pinned mapInPandas over the
    asset batch, zero shuffle before the (unordered) result (the
    round-robin fan-out riding the scan is ensure_parallelism's
    local-fixture no-op-at-scale contract)."""
    docs = _parallel_docs(spark, sf)
    assets = assets_from_documents(docs).select("asset_id", "payload")
    return assets.mapInPandas(_vad_batches, schema=VAD_SCHEMA)  # unordered


_VAD_ORACLE = f"""
WITH s AS (
  SELECT doc_id AS asset_id,
         list_transform(range(1, least(len(text), {AUDIO_MAX_BYTES}) + 1),
                        i -> CAST(unicode(substr(text, i, 1)) AS BIGINT)) AS samp
  FROM documents),
e AS (
  SELECT asset_id,
         list_transform(range(0, CAST((len(samp) + {AUDIO_WINDOW - 1}) // {AUDIO_WINDOW} AS INT)),
                        w -> coalesce(list_sum(list_transform(
                               samp[w * {AUDIO_WINDOW} + 1 : w * {AUDIO_WINDOW} + {AUDIO_WINDOW}],
                               x -> x * x)), 0)) AS energies
  FROM s),
f AS (
  SELECT asset_id, energies,
         CAST(len(energies) AS INT) AS n_windows,
         coalesce(list_sum(energies), 0) AS total
  FROM e),
g AS (
  SELECT asset_id, n_windows,
         list_transform(energies, x -> x * n_windows > total) AS flags
  FROM f)
SELECT asset_id, n_windows,
       CAST(coalesce(len(list_filter(flags, x -> x)), 0) AS INT) AS n_speech,
       CAST(coalesce(len(list_filter(range(1, n_windows + 1),
                          i -> flags[i] AND (i = 1 OR NOT flags[i - 1]))), 0) AS INT)
         AS n_segments
FROM g ORDER BY asset_id
"""


SPECS.append(
    QuerySpec(
        "multimodal_vad",
        "Energy VAD over real-decoded WAV clips: integer windowed "
        "energies vs clip mean, contiguous speech segments counted",
        _multimodal_vad,
        _VAD_ORACLE,
    )
)
