"""Unit tests for the real multimodal container codecs (no Spark).

The Spark-side plumbing (schemas, Arrow batch shapes, gate entries) is
covered by tests/test_queries_smoke.py + the oracle gate; these pin the
decoder semantics: WAV RIFF parse, BMP stride/BGR/bottom-up handling,
PPM header tolerance, the raw video container, and the explicit
rejection of compressed codecs.
"""

from __future__ import annotations

import struct

import pytest

from substreams_sink_clickhouse_spark.operators.multimodal import (
    VIDEO_MAGIC,
    decode_audio,
    decode_image,
    decode_video,
    encode_bmp,
    encode_wav,
)


def test_wav_roundtrip():
    samples = bytes(range(256))
    nch, sw, rate, out = decode_audio(encode_wav(samples))
    assert (nch, sw, rate) == (1, 1, 8000)
    assert out == samples


def test_wav_rejects_compressed():
    with pytest.raises(ValueError, match="audio container"):
        decode_audio(b"ID3\x04" + b"\x00" * 64)


def test_bmp_roundtrip_unaligned_stride():
    # width 17 -> stride 51 -> padded to 52; decoder must strip padding,
    # flip bottom-up rows, and swap BGR back to RGB.
    rgb = bytes((i * 13) % 256 for i in range(17 * 4 * 3))
    w, h, out = decode_image(encode_bmp(rgb, 17, 4))
    assert (w, h) == (17, 4)
    assert out == rgb


def test_bmp_first_pixel_is_topleft():
    rgb = bytes([200, 100, 50] + [0] * (17 * 4 * 3 - 3))
    _, _, out = decode_image(encode_bmp(rgb, 17, 4))
    assert out[:3] == bytes([200, 100, 50])


def test_ppm_header_with_comment():
    ppm = b"P6\n# a comment\n3 2\n255\n" + bytes(range(18))
    assert decode_image(ppm) == (3, 2, bytes(range(18)))


def test_image_rejects_webp_and_truncated_jpeg():
    # WebP still needs a native codec; JPEG now dispatches to the real
    # baseline decoder, so a truncated JPEG fails inside it (clean
    # error, not garbage pixels)
    with pytest.raises(ValueError, match="image format"):
        decode_image(b"RIFFxxxxWEBP")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0jfif...")


def test_truncated_png_signature_errors():
    # a bare signature routes to the PNG decoder, which must fail
    # cleanly (missing IHDR/IDAT), not return garbage
    with pytest.raises(ValueError, match="IHDR|IDAT"):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_video_container_roundtrip():
    f1 = b"P6\n2 1\n255\n" + bytes(6)
    f2 = b"P6\n1 1\n255\n" + bytes((9, 8, 7))
    vid = (
        VIDEO_MAGIC
        + struct.pack("<I", 2)
        + struct.pack("<I", len(f1))
        + f1
        + struct.pack("<I", len(f2))
        + f2
    )
    frames = decode_video(vid)
    assert [f[:2] for f in frames] == [(2, 1), (1, 1)]
    assert frames[1][2] == bytes((9, 8, 7))


def test_video_rejects_compressed():
    with pytest.raises(ValueError, match="video container"):
        decode_video(b"\x00\x00\x01\xba mpeg-ps")


# --------------------------------------------------------- properties

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @given(
        w=st.integers(min_value=1, max_value=23),
        h=st.integers(min_value=1, max_value=9),
        data=st.data(),
    )
    @settings(max_examples=60, deadline=None)
    def test_bmp_roundtrip_property(w, h, data):
        """encode->decode is identity for every (w, h) — including the
        widths whose stride is already 4-aligned and those that pad."""
        rgb = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
                )
            )
        )
        assert decode_image(encode_bmp(rgb, w, h)) == (w, h, rgb)

    @given(samples=st.binary(min_size=0, max_size=512))
    @settings(max_examples=60, deadline=None)
    def test_wav_roundtrip_property(samples):
        nch, sw, rate, out = decode_audio(encode_wav(samples))
        assert (nch, sw, rate) == (1, 1, 8000)
        assert out == samples


def test_png_roundtrip_all_filters():
    """Height 5 cycles through every PNG filter type (None/Sub/Up/
    Average/Paeth) — the decode must unfilter all of them."""
    from substreams_sink_clickhouse_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rgb = bytes((i * 37 + 11) % 256 for i in range(13 * 5 * 3))
    png = encode_png(rgb, 13, 5)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert decode_png(png) == (13, 5, rgb)
    assert decode_image(png) == (13, 5, rgb)


def test_png_grayscale_expands_to_rgb():
    import struct
    import zlib

    from substreams_sink_clickhouse_spark.operators.multimodal import decode_png

    # hand-build a 3x2 grayscale PNG (color type 0), filter 0 rows
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    gray = bytes([10, 20, 30, 40, 50, 60])
    raw = b"\x00" + gray[:3] + b"\x00" + gray[3:]
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, rgb = decode_png(png)
    assert (w, h) == (3, 2)
    assert rgb == bytes(b for g in gray for b in (g, g, g))


def test_png_rejects_corrupt_crc():
    from substreams_sink_clickhouse_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    png = bytearray(encode_png(b"\x01" * 4 * 1 * 3, 4, 1))
    png[20] ^= 0xFF  # flip a byte inside IHDR data
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


if _HAVE_HYPOTHESIS:

    @given(
        w=st.integers(min_value=1, max_value=19),
        h=st.integers(min_value=1, max_value=11),
        data=st.data(),
    )
    @settings(max_examples=60, deadline=None)
    def test_png_roundtrip_property(w, h, data):
        from substreams_sink_clickhouse_spark.operators.multimodal import (
            encode_png,
        )

        rgb = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
                )
            )
        )
        assert decode_image(encode_png(rgb, w, h)) == (w, h, rgb)


def test_features_mip_single_python_eval(spark):
    """_multimodal_features must plan exactly ONE Python eval node: a
    filter stacked on a scalar pandas_udf output column duplicates the
    ArrowEvalPython (predicate + projection evals — measured ~25x
    slower); the mapInPandas kernel is a barrier that cannot be
    duplicated."""
    from substreams_sink_clickhouse_spark.operators.multimodal import (
        _multimodal_features,
    )

    df = _multimodal_features(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_python = plan.count("MapInPandas") + plan.count("ArrowEvalPython")
    assert n_python == 1, plan
    assert df.count() > 0


# ------------------------------------------------------------- JPEG codec


def test_jpeg_flat_blocks_roundtrip_exact():
    """Solid 8x8 blocks are pure DC: with the unit quantization table
    the lossy codec roundtrips bit-exactly (the gate entry's fixture
    construction relies on this)."""
    import numpy as np

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    img = np.zeros((16, 32), dtype=np.uint8)
    for i, v in enumerate([7, 200, 99, 0, 255, 128, 31, 64]):
        by, bx = divmod(i, 4)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    w, h, out = decode_jpeg_gray(encode_jpeg_gray(img.tobytes(), 32, 16))
    assert (w, h) == (32, 16) and out == img.tobytes()


def test_jpeg_arbitrary_content_error_bound():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def check(w, h, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        dw, dh, out = decode_jpeg_gray(encode_jpeg_gray(img.tobytes(), w, h))
        assert (dw, dh) == (w, h)
        err = np.abs(
            np.frombuffer(out, np.uint8).astype(int) - img.flatten().astype(int)
        )
        # quant=1: only float-DCT rounding error survives; +/-1 bound
        assert err.max() <= 1

    check()


def test_jpeg_quant_tradeoff_and_rejections():
    import numpy as np
    import pytest

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 40), dtype=np.uint8)
    small = encode_jpeg_gray(img.tobytes(), 40, 24, quant=16)
    big = encode_jpeg_gray(img.tobytes(), 40, 24, quant=1)
    assert len(small) < len(big)  # coarser quant really compresses
    _, _, out = decode_jpeg_gray(small)
    err = np.abs(np.frombuffer(out, np.uint8).astype(int) - img.flatten().astype(int))
    assert err.max() <= 8 * 16  # bounded by quant step across the block
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg_gray(b"\xff\xd8\xff\xc2\x00\x05aaa")  # progressive
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"notajpeg")


def test_decode_image_dispatches_jpeg():
    import numpy as np

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        encode_jpeg_gray,
    )
    from substreams_sink_clickhouse_spark.operators.multimodal import decode_image

    img = np.full((8, 8), 77, dtype=np.uint8)
    w, h, rgb = decode_image(encode_jpeg_gray(img.tobytes(), 8, 8))
    assert (w, h) == (8, 8)
    assert rgb == bytes([77, 77, 77]) * 64  # luma replicated to RGB


def test_jpeg_color_solid_mcus_roundtrip_exact():
    """Solid 16x16 MCU tiles keep every Y/Cb/Cr block pure DC and make
    the 4:2:0 box average exact, so the codec roundtrips to exactly
    the double color transform (the multimodal_jpeg_color fixture
    construction relies on this)."""
    import numpy as np

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        decode_jpeg_color,
        encode_jpeg_color,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    img = np.zeros((32, 32, 3), dtype=np.uint8)
    colors = [(255, 0, 0), (0, 255, 0), (7, 99, 200), (128, 128, 128)]
    for i, c in enumerate(colors):
        ty, tx = divmod(i, 2)
        img[ty * 16 : ty * 16 + 16, tx * 16 : tx * 16 + 16] = c
    w, h, out = decode_jpeg_color(encode_jpeg_color(img.tobytes(), 32, 32))
    want = ycbcr_to_rgb(*rgb_to_ycbcr(img))
    assert (w, h) == (32, 32)
    assert np.array_equal(np.frombuffer(out, np.uint8).reshape(32, 32, 3), want)


def test_jpeg_color_444_error_bound_and_subsampling_property():
    """4:4:4 at quant=1 loses only transform+DCT rounding (tight
    bound); 4:2:0 output must equal the reference pipeline computed
    independently: subsample the (rounded) chroma planes by box
    average, replicate back up, inverse transform."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        decode_jpeg_color,
        encode_jpeg_color,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    @given(w=st.integers(1, 24), h=st.integers(1, 20), seed=st.integers(0, 2**31 - 1))
    @settings(max_examples=25, deadline=None)
    def check(w, h, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        dw, dh, out = decode_jpeg_color(
            encode_jpeg_color(img.tobytes(), w, h, subsampling="4:4:4")
        )
        assert (dw, dh) == (w, h)
        got = np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(int)
        want = ycbcr_to_rgb(*rgb_to_ycbcr(img)).astype(int)
        # quant=1, no subsampling: only float-DCT rounding survives,
        # scaled by at most the inverse-transform gain (~1.8)
        assert np.abs(got - want).max() <= 3

    check()


def test_jpeg_color_rejections_and_gray_delegation():
    import numpy as np
    import pytest

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        decode_jpeg_color,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    img = np.full((16, 16, 3), 50, dtype=np.uint8)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_color(img.tobytes(), 16, 16, subsampling="4:1:1")
    with pytest.raises(ValueError, match="RGB"):
        encode_jpeg_color(b"xx", 16, 16)
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg_color(b"\xff\xd8\xff\xc2\x00\x05aaa")  # progressive
    # grayscale JPEG delegates: luma replicated to RGB
    g = np.full((8, 8), 77, dtype=np.uint8)
    w, h, rgb = decode_jpeg_color(encode_jpeg_gray(g.tobytes(), 8, 8))
    assert (w, h) == (8, 8) and rgb == bytes([77, 77, 77]) * 64


def test_decode_image_dispatches_color_jpeg():
    import numpy as np

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        encode_jpeg_color,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )
    from substreams_sink_clickhouse_spark.operators.multimodal import decode_image

    img = np.full((16, 16, 3), 0, dtype=np.uint8)
    img[:, :] = (10, 200, 30)
    w, h, rgb = decode_image(encode_jpeg_color(img.tobytes(), 16, 16))
    want = ycbcr_to_rgb(*rgb_to_ycbcr(img)).tobytes()
    assert (w, h) == (16, 16) and rgb == want


def test_dhash64_gradient_semantics():
    from substreams_sink_clickhouse_spark.operators.multimodal import (
        PHASH_COLS,
        PHASH_ROWS,
        dhash64,
    )

    # strictly increasing rows -> every comparison fires -> all 64 bits
    grid = [c for _ in range(PHASH_ROWS) for c in range(PHASH_COLS)]
    assert dhash64(grid) == "f" * 16
    # constant image -> no gradient -> zero hash
    assert dhash64([7] * (PHASH_ROWS * PHASH_COLS)) == "0" * 16
    # brightness shift must not change the hash (the dHash property)
    base = [(r * 31 + c * 7) % 200 for r in range(PHASH_ROWS) for c in range(PHASH_COLS)]
    shifted = [v + 55 for v in base]
    assert dhash64(base) == dhash64(shifted)


def test_phash_identical_payloads_collide(spark):
    from substreams_sink_clickhouse_spark.operators.multimodal import phash_assets

    rows = [(1, b"hello world " * 20), (2, b"hello world " * 20), (3, b"different!" * 30)]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = {r.asset_id: r.phash for r in phash_assets(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert len(out[1]) == 16 and int(out[1], 16) >= 0


def test_phash_near_plan_has_no_join(spark):
    # the banding contract: candidates come from bucket EXPANSION
    # (groupBy + per-bucket pair arrays), never a band self-join —
    # same pin as test_minhash_has_no_join
    from substreams_sink_clickhouse_spark.operators.multimodal import (
        _multimodal_phash_near,
    )
    from substreams_sink_clickhouse_spark.plans.explain import simple_plan

    plan = simple_plan(_multimodal_phash_near(spark, "/root/testdata/sf0.001"))
    assert "Join" not in plan, plan[:2000]


def test_phash_near_hot_bucket_collapses_to_star_pairs(spark):
    """Degenerate corpus (constant-color thumbnails -> one shared band
    value per band): an over-cap bucket must emit n-1 linear star
    pairs against the bucket minimum, not n*(n-1)/2 quadratic pairs —
    the MAX_BUCKET_SIZE contract inherited from dedup_minhash."""
    from substreams_sink_clickhouse_spark.operators import dedup as D
    from substreams_sink_clickhouse_spark.operators.multimodal import (
        phash_near_pairs,
    )

    n = 20
    rows = [(i, "0" * 16) for i in range(n)]  # constant image -> zero hash
    hashed = spark.createDataFrame(rows, "asset_id long, phash string")
    old = D.MAX_BUCKET_SIZE
    D.MAX_BUCKET_SIZE = 8  # force every band bucket (size 20) over cap
    try:
        pairs = phash_near_pairs(hashed).collect()
    finally:
        D.MAX_BUCKET_SIZE = old
    got = sorted((r.ida, r.idb) for r in pairs)
    assert got == [(0, i) for i in range(1, n)], got[:30]


def test_phash_near_under_cap_matches_self_join(spark):
    # value parity with the self-join it replaced on a mixed corpus:
    # two 3-member clusters one bit apart plus singletons
    from pyspark.sql import functions as F

    from substreams_sink_clickhouse_spark.operators.multimodal import (
        PHASH_BANDS,
        phash_near_pairs,
    )

    rows = [
        (1, "00ab00cd00ef0011"), (2, "00ab00cd00ef0011"), (3, "00ab00cd00ef0013"),
        (4, "ffab11cd22ef3311"), (5, "ffab11cd22ef3311"), (6, "ffab11cd22ef3319"),
        (7, "1234567890abcdef"),
    ]
    hashed = spark.createDataFrame(rows, "asset_id long, phash string")
    got = sorted((r.ida, r.idb) for r in phash_near_pairs(hashed).collect())
    bands = hashed.select(
        "asset_id", "phash",
        F.explode(F.expr(f"sequence(0, {PHASH_BANDS - 1})")).alias("band"),
    ).withColumn("bv", F.expr("substring(phash, band * 4 + 1, 4)"))
    a = bands.select(F.col("asset_id").alias("ida"), "band", "bv")
    b = bands.select(F.col("asset_id").alias("idb"), "band", "bv")
    want = sorted(
        (r.ida, r.idb)
        for r in a.join(b, ["band", "bv"])
        .where(F.col("ida") < F.col("idb"))
        .select("ida", "idb").distinct().collect()
    )
    assert got == want and len(got) >= 6, (got, want)


# ------------------------------------- JPEG codec fast-path equivalence


def test_jpeg_batched_dct_matches_per_block_reference():
    """The round-11 batched FDCT/IDCT must be bit-identical to the
    per-block matmul reference (_fdct/_idct): stacked np.matmul
    dispatches the same dgemm per slice, but pin it mechanically so a
    numpy upgrade or a refactor to a different reduction order fails
    here, not at the oracle gate."""
    import numpy as np

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        _DCT,
        _ZIGZAG,
        _fdct,
        _idct,
        _idct_batch,
        _quantized_zz_blocks,
    )

    rng = np.random.default_rng(11)
    plane = rng.integers(0, 256, (24, 40)).astype(np.float64)
    quant = 3
    got = _quantized_zz_blocks(plane, quant)
    bh, bw = 3, 5
    for bi, zz in enumerate(got):
        by, bx = divmod(bi, bw)
        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        coef = np.rint(_fdct(block) / quant).astype(np.int64)
        want = [int(coef.flat[_ZIGZAG[i]]) for i in range(64)]
        assert zz == want, f"block {bi} diverged"
    # decode side: batched dezigzag+dequant+IDCT vs per-block
    qtab = [2] * 64
    zz_rows = [list(rng.integers(-200, 200, 64)) for _ in range(7)]
    batched = _idct_batch(zz_rows, qtab)
    for i, zz in enumerate(zz_rows):
        coef = np.zeros(64, dtype=np.float64)
        for k in range(64):
            coef[_ZIGZAG[k]] = zz[k] * qtab[k]
        ref = _idct(coef.reshape(8, 8)) + 128.0
        assert (batched[i] == ref).all(), f"IDCT block {i} diverged"
    assert _DCT.shape == (8, 8)


def test_jpeg_entropy_decoder_contract():
    """The flat-table entropy reader preserves the old _BitReader's
    observable contract: 0xFF00 unstuffing, 'unexpected marker' when a
    read crosses a real marker, 'truncated' when bytes run out, and
    'invalid Huffman code' for a non-code prefix."""
    import pytest

    from substreams_sink_clickhouse_spark.operators.jpeg_codec import (
        _EntropyDecoder,
        _build_flat_decode,
    )

    # one-code table: value 7 encoded as the single 1-bit code '0'
    tab = _build_flat_decode([1] + [0] * 15, [7])
    r = _EntropyDecoder(b"\x00\x00", 0)  # 16 zero bits
    assert r.nbits == 16
    assert [r.read_huff(tab) for _ in range(16)] == [7] * 16
    with pytest.raises(ValueError, match="truncated JPEG entropy stream"):
        r.read_huff(tab)
    # 0xFF00 unstuffing keeps the 0xFF as DATA (8 one-bits)
    assert _EntropyDecoder(b"\xff\x00", 0).nbits == 8
    assert _EntropyDecoder(b"\xff\x00", 0).read_bits(8) == 0xFF
    # a real marker terminates the stream: reading past it names it
    r2 = _EntropyDecoder(b"\x00\xff\xd9", 0)
    assert r2.nbits == 8
    r2.read_bits(8)
    with pytest.raises(ValueError, match="unexpected marker"):
        r2.read_bits(1)
    # an all-ones prefix that matches no code raises invalid
    short_tab = _build_flat_decode([1] + [0] * 15, [3])  # only code '0'
    r3 = _EntropyDecoder(b"\xff\x00", 0)  # stuffed 0xFF: 8 one-bits
    with pytest.raises(ValueError, match="invalid Huffman code"):
        r3.read_huff(short_tab)
