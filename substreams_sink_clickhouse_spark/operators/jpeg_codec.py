"""Baseline-sequential JPEG codec (grayscale + YCbCr color), stdlib +
numpy only.

Closes the multimodal realism gap (compressed codecs previously
errored cleanly): a real JFIF encoder/decoder pair for baseline
sequential DCT, 8-bit images — single-component (grayscale) and
3-component YCbCr with 4:2:0 / 4:2:2 / 4:4:4 chroma subsampling —
public-knowledge construction straight from ITU-T T.81:

* encoder — level shift, 8×8 float DCT-II, quantization, zigzag, DC
  differential coding, AC run-length (ZRL/EOB), Annex-K standard
  luminance Huffman tables, 0xFF byte stuffing, JFIF marker framing;
* decoder — marker parse (SOI/APP/COM/DQT/SOF0/DHT/SOS/EOI), general
  DHT Huffman-table reconstruction (not hardcoded — any baseline
  table decodes), stuffed-byte-aware bit reader, DC prediction, AC
  RLE, dezigzag, dequantization, IDCT, level shift + clamp.  The
  color decoder handles interleaved multi-component MCUs with
  per-component sampling factors ≤ 2 (4:2:0 / 4:2:2 / 4:4:0 / 4:4:4),
  per-component DC predictors, chroma upsampling by replication, and
  the JFIF YCbCr→RGB transform.  Raises ``ValueError`` with the
  offending marker for anything outside baseline sequential
  (progressive SOF2, 12-bit, restart intervals, >2 sampling factors)
  rather than mis-decoding.

Color-transform exactness convention: both directions round with
``floor(x + 0.5)`` (round-half-up, matching SQL ``round`` /
``floor(x + 0.5)``) rather than numpy's banker's ``rint``, so a DuckDB
oracle can reproduce the transform bit-for-bit in plain arithmetic.

Exactness note for oracles: JPEG is lossy, but an image whose every
8×8 block is a SOLID value is pure DC — with a unit quantization
table the encode→decode roundtrip is bit-exact (DCT of a flat block
has zero AC energy; the DC term is represented exactly).  The gate
entry builds its fixture that way so DuckDB can state the expected
pixels arithmetically; the property tests additionally bound the
error on arbitrary (non-flat) content.

Reference parity: the reference sinks opaque bytes and never decodes
(db/operations.go stores string/bytes columns verbatim); this is part
of the engine's training-data surface, not a reference port.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: Zigzag order: index i of the scan -> (row, col) flattened position.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: ITU-T T.81 Annex K.3.1: luminance DC table (bits per length, values).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

#: Annex K.3.2: luminance AC table.
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)

#: (bits, vals) -> flat 16-bit-window lookup (lengths, values): entry
#: ``w`` (the next 16 bits of the stream, zero-padded at the tail)
#: resolves the next Huffman symbol in O(1) instead of bit-by-bit dict
#: probing.  Keyed by the DHT definition so arbitrary baseline tables
#: work and repeated images share one build (the gate corpus uses the
#: four Annex-K tables; a 65,536-slot list pair per table).
_FLAT_DECODE_CACHE: dict[tuple, tuple[list[int], list[int]]] = {}

#: ~1-2 MB of Python ints per distinct DHT — only the four Annex-K
#: tables recur in practice, so bound the cache (FIFO eviction) rather
#: than let a long-lived executor decoding heterogeneous/adversarial
#: JPEGs with many distinct tables grow it without bound.
_FLAT_DECODE_CACHE_MAX = 16


def _build_flat_decode(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    key = (tuple(bits), tuple(vals))
    got = _FLAT_DECODE_CACHE.get(key)
    if got is not None:
        return got
    lens = [0] * 65536
    syms = [0] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            span = 1 << (16 - length)
            lens[start : start + span] = [length] * span
            syms[start : start + span] = [vals[k]] * span
            code += 1
            k += 1
        code <<= 1
    if len(_FLAT_DECODE_CACHE) >= _FLAT_DECODE_CACHE_MAX:
        _FLAT_DECODE_CACHE.pop(next(iter(_FLAT_DECODE_CACHE)))
    _FLAT_DECODE_CACHE[key] = (lens, syms)
    return lens, syms

# ------------------------------------------------------------------ DCT


def _dct_matrix() -> np.ndarray:
    n = 8
    m = np.zeros((n, n))
    for k in range(n):
        for x in range(n):
            c = np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
            m[k, x] = c * np.cos((2 * x + 1) * k * np.pi / (2 * n))
    return m


_DCT = _dct_matrix()


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


# -------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3


def _magnitude(v: int) -> tuple[int, int]:
    """(category, offset bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _quantized_zz_blocks(plane: "np.ndarray", quant: int) -> list[list[int]]:
    """Level-shift, FDCT, quantize and zigzag EVERY 8x8 block of a
    padded float64 plane in one batched pass — the same per-block
    arithmetic as the former block loop (stacked matmul dispatches the
    identical dgemm per slice; rint/divide are elementwise), so the
    coefficients are bit-identical.  Returns raster-order rows of 64
    Python ints (fast to iterate in the sequential entropy coder)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coefs = np.matmul(np.matmul(_DCT, blocks), _DCT.T)
    zz = np.rint(coefs.reshape(-1, 64) / quant).astype(np.int64)[:, _ZZ_IDX]
    return zz.tolist()


def _write_block_zz(
    writer: _BitWriter,
    zz: list[int],
    prev_dc: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Entropy-code one quantized zigzag block; returns the new DC
    predictor.  Identical bit output to the former per-block encoder
    (DC differential + AC run-length with ZRL/EOB)."""
    cat, bits = _magnitude(zz[0] - prev_dc)
    code, length = dc_codes[cat]
    writer.write(code, length)
    if cat:
        writer.write(bits, cat)
    run = 0
    for i in range(1, 64):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            writer.write(zc, zl)
            run -= 16
        cat, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | cat]
        writer.write(code, length)
        writer.write(bits, cat)
        run = 0
    if run:
        ec, el = ac_codes[0x00]  # EOB
        writer.write(ec, el)
    return zz[0]


def encode_jpeg_gray(
    pixels: bytes, width: int, height: int, quant: int = 1
) -> bytes:
    """Baseline sequential JFIF, 8-bit grayscale, flat quantization
    table ``quant`` (1 = near-lossless; exact for DC-only content)."""
    if width <= 0 or height <= 0 or len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    if not 1 <= quant <= 255:
        raise ValueError("quant must be 1..255")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    # edge-replicate padding (the standard choice: no ringing into the
    # image from the pad region at these quantization levels)
    padded = np.pad(
        img, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge"
    ).astype(np.float64)

    qtab = bytes([quant] * 64)
    writer = _BitWriter()
    prev_dc = 0
    for zz in _quantized_zz_blocks(padded, quant):
        prev_dc = _write_block_zz(writer, zz, prev_dc, _DC_CODES, _AC_CODES)
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qtab)  # DQT, table 0, 8-bit
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    out += seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -------------------------------------------------------------- decoder


class _EntropyDecoder:
    """MSB-first reader over entropy-coded data: the 0xFF00-unstuffed
    stream is prepared ONCE (vectorized) and every symbol resolves
    with a single 16-bit window peek against a flat Huffman table —
    O(1) per symbol instead of per-bit dict probing (the former
    ``_BitReader`` path; ~10x on the decode-bound gate entries).

    Behavior contract of the old reader, preserved: reading past a
    real marker raises "unexpected marker inside entropy stream";
    running out of bytes raises "truncated JPEG entropy stream"; an
    unresolvable code raises "invalid Huffman code in JPEG stream"."""

    def __init__(self, data: bytes, pos: int) -> None:
        raw = np.frombuffer(data, dtype=np.uint8)[pos:]
        ff = np.flatnonzero(raw == 0xFF)
        # lookahead byte after each 0xFF; a trailing 0xFF with nothing
        # after it counts as a marker (the old reader raised
        # "unexpected marker" on the missing lookahead)
        nxt = np.full(ff.shape, 0xD9, dtype=np.uint8)
        inb = ff + 1 < len(raw)
        nxt[inb] = raw[ff[inb] + 1]
        markers = ff[nxt != 0x00]
        if markers.size:
            end_at_marker = True
            end = int(markers[0])
        else:
            end_at_marker = False
            end = len(raw)
        stuffed = ff[(nxt == 0x00) & (ff < end)]
        buf = np.delete(raw[:end], stuffed + 1)
        self._end_at_marker = end_at_marker
        self.nbits = len(buf) * 8
        # 32-bit big-endian window per byte offset: bits at position p
        # are (acc[p >> 3] >> (16 - (p & 7))) & 0xFFFF — zero-padded at
        # the tail, bounds-checked against nbits before every advance.
        padded = np.concatenate([buf, np.zeros(3, dtype=np.uint8)]).astype(np.uint32)
        acc = (
            (padded[:-3] << 24)
            | (padded[1:-2] << 16)
            | (padded[2:-1] << 8)
            | padded[3:]
        )
        self.acc = acc.tolist() or [0]
        self.p = 0

    def _past_end(self) -> ValueError:
        if self._end_at_marker:
            return ValueError("unexpected marker inside entropy stream")
        return ValueError("truncated JPEG entropy stream")

    def read_huff(self, table: tuple[list[int], list[int]]) -> int:
        p = self.p
        if p >= self.nbits:
            raise self._past_end()
        w = (self.acc[p >> 3] >> (16 - (p & 7))) & 0xFFFF
        length = table[0][w]
        if length == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        if p + length > self.nbits:
            raise self._past_end()
        self.p = p + length
        return table[1][w]

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if n > 16:
            # a malformed DHT can map a code to a category > 16; the
            # 16-bit window below cannot serve it (baseline JPEG never
            # emits one) — surface the decoder's documented error, not
            # a bare negative-shift ValueError
            raise ValueError("invalid Huffman code in JPEG stream")
        p = self.p
        if p + n > self.nbits:
            raise self._past_end()
        self.p = p + n
        return ((self.acc[p >> 3] >> (16 - (p & 7))) & 0xFFFF) >> (16 - n)


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


#: Zigzag order as an index array: ``coefs[:, _ZZ_IDX] = zz`` scatters
#: a batch of zigzag scans into natural order in one numpy op.
_ZZ_IDX = np.array(_ZIGZAG)


def _decode_blocks_zz(
    reader: _EntropyDecoder,
    dc_tab: tuple[list[int], list[int]],
    ac_tab: tuple[list[int], list[int]],
    prev_dc: int,
) -> tuple[list[int], int]:
    """Decode ONE block's zigzag coefficients (list of 64 ints) plus
    the new DC predictor — the shared entropy kernel of the gray and
    color decode loops."""
    zz = [0] * 64
    cat = reader.read_huff(dc_tab)
    prev_dc += _extend(reader.read_bits(cat), cat)
    zz[0] = prev_dc
    i = 1
    while i < 64:
        rs = reader.read_huff(ac_tab)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            i += 16
            continue
        i += rs >> 4
        if i > 63:
            raise ValueError("AC run past end of block")
        cat = rs & 0xF
        zz[i] = _extend(reader.read_bits(cat), cat)
        i += 1
    return zz, prev_dc


def _idct_batch(zz_rows: list[list[int]], qtab: list[int]) -> np.ndarray:
    """Dezigzag + dequantize + IDCT a batch of blocks at once:
    ``(n, 8, 8)`` level-shifted pixels.  The per-block arithmetic is
    the same two 8x8 matmuls as the former per-block loop (stacked
    matmul dispatches the identical dgemm per slice), so outputs are
    bit-identical."""
    zzs = np.asarray(zz_rows, dtype=np.float64)
    coefs = np.empty_like(zzs)
    coefs[:, _ZZ_IDX] = zzs * np.asarray(qtab, dtype=np.float64)
    blocks = coefs.reshape(-1, 8, 8)
    return np.matmul(np.matmul(_DCT.T, blocks), _DCT) + 128.0


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline sequential grayscale JPEG -> (w, h, pixels).

    General within its profile: quantization and Huffman tables are
    read from the stream (any baseline tables decode, not just the
    encoder's); raises ``ValueError`` naming the unsupported feature
    for progressive / multi-component / 12-bit inputs."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    width = height = None
    comp_qtab = comp_dc = comp_ac = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qtables[tid] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tclass, tid)] = _build_flat_decode(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("only single-component (grayscale) supported")
            # per-component triplet: id, sampling factors, qtab id
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
            comp_qtab = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) unsupported"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if body[0] != 1:
                raise ValueError("scan must cover exactly 1 component")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0xF
            pos += seglen
            break
        pos += seglen
    if width is None or height is None:
        raise ValueError("missing SOF0 before SOS")
    qtab = qtables.get(comp_qtab)
    dc_map = htables.get((0, comp_dc))
    ac_map = htables.get((1, comp_ac))
    if qtab is None or dc_map is None or ac_map is None:
        raise ValueError("missing quantization or Huffman tables")

    reader = _EntropyDecoder(payload, pos)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    prev_dc = 0
    zz_rows: list[list[int]] = []
    for _ in range(bh * bw):
        zz, prev_dc = _decode_blocks_zz(reader, dc_map, ac_map, prev_dc)
        zz_rows.append(zz)
    # dezigzag + dequant + IDCT the whole scan at once (identical
    # per-block arithmetic; see _idct_batch), then stitch the raster
    # block grid back into the padded image
    out = (
        _idct_batch(zz_rows, qtab)
        .reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)
    )
    pixels = np.clip(np.rint(out[:height, :width]), 0, 255).astype(np.uint8)
    return width, height, pixels.tobytes()


# ------------------------------------------------------- color (YCbCr)

#: ITU-T T.81 Annex K.3.1: chrominance DC table.
_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_C = list(range(12))

#: Annex K.3.2: chrominance AC table.
_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_DC_CODES_C = _build_codes(_DC_BITS_C, _DC_VALS_C)
_AC_CODES_C = _build_codes(_AC_BITS_C, _AC_VALS_C)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5): matches SQL round for the non-negative pixel
    domain (numpy rint is banker's rounding and would diverge from a
    DuckDB oracle on exact .5 values)."""
    return np.floor(x + 0.5)


def rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range BT.601 forward transform, uint8 planes."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    clip = lambda p: np.clip(_round_half_up(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601 inverse transform -> uint8 H*W*3."""
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def encode_jpeg_color(
    pixels: bytes, width: int, height: int, quant: int = 1, subsampling: str = "4:2:0"
) -> bytes:
    """Baseline sequential JFIF, 8-bit YCbCr from interleaved RGB
    bytes, flat quantization table ``quant`` for all components.

    ``subsampling``: ``4:2:0`` (Y 2x2, chroma quarter-res — the
    dominant corpus format), ``4:2:2`` (Y 2x1) or ``4:4:4`` (no
    subsampling).  Chroma is box-averaged on the downsample, so solid
    MCU-aligned tiles stay pure-DC and roundtrip exactly (the oracle
    construction; see module docstring)."""
    if width <= 0 or height <= 0 or len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 RGB bytes")
    if not 1 <= quant <= 255:
        raise ValueError("quant must be 1..255")
    factors = {"4:2:0": (2, 2), "4:2:2": (2, 1), "4:4:4": (1, 1)}.get(subsampling)
    if factors is None:
        raise ValueError("subsampling must be 4:2:0, 4:2:2 or 4:4:4")
    hs, vs = factors
    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    y, cb, cr = rgb_to_ycbcr(rgb)

    mcu_w, mcu_h = 8 * hs, 8 * vs
    mw, mh = (width + mcu_w - 1) // mcu_w, (height + mcu_h - 1) // mcu_h
    pad = lambda p, ph, pw: np.pad(  # noqa: E731
        p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
    ).astype(np.float64)
    yp = pad(y, mh * mcu_h, mw * mcu_w)
    # chroma: box-average downsample by (vs, hs), then pad to MCU grid
    cbp = pad(cb, mh * mcu_h, mw * mcu_w)
    crp = pad(cr, mh * mcu_h, mw * mcu_w)
    if (hs, vs) != (1, 1):
        cbp = cbp.reshape(mh * 8, vs, mw * 8, hs).mean(axis=(1, 3))
        crp = crp.reshape(mh * 8, vs, mw * 8, hs).mean(axis=(1, 3))

    # batched FDCT/quantize/zigzag per plane (bit-identical per-block
    # arithmetic, see _quantized_zz_blocks); the MCU walk below only
    # sequences the precomputed blocks through the entropy coder
    zz_y = _quantized_zz_blocks(yp, quant)
    zz_cb = _quantized_zz_blocks(cbp, quant)
    zz_cr = _quantized_zz_blocks(crp, quant)
    y_cols = mw * hs
    writer = _BitWriter()
    dc = [0, 0, 0]
    for my in range(mh):
        for mx in range(mw):
            for v in range(vs):  # Y blocks, raster order within the MCU
                for h in range(hs):
                    by, bx = my * vs + v, mx * hs + h
                    dc[0] = _write_block_zz(
                        writer, zz_y[by * y_cols + bx], dc[0],
                        _DC_CODES, _AC_CODES,
                    )
            for ci, zz_c in ((1, zz_cb), (2, zz_cr)):
                dc[ci] = _write_block_zz(
                    writer, zz_c[my * mw + mx], dc[ci],
                    _DC_CODES_C, _AC_CODES_C,
                )
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qtab = bytes([quant] * 64)
    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qtab)  # table 0 (luma)
    out += seg(0xFFDB, b"\x01" + qtab)  # table 1 (chroma)
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes([1, (hs << 4) | vs, 0])  # Y
    sof += bytes([2, 0x11, 1])  # Cb
    sof += bytes([3, 0x11, 1])  # Cr
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += seg(0xFFC4, b"\x01" + bytes(_DC_BITS_C) + bytes(_DC_VALS_C))
    out += seg(0xFFC4, b"\x11" + bytes(_AC_BITS_C) + bytes(_AC_VALS_C))
    out += seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_color(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline sequential 3-component YCbCr JPEG ->
    (w, h, interleaved RGB bytes).

    General within its profile: quantization/Huffman tables and
    per-component sampling factors come from the stream; any
    combination with factors <= 2 decodes (4:2:0, 4:2:2, 4:4:0,
    4:4:4).  Grayscale inputs are delegated to
    :func:`decode_jpeg_gray` (returned pixels are replicated to RGB).
    Raises ``ValueError`` naming the unsupported feature otherwise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, qtab)
    scan: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("no scan data before EOI")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qtables[tid] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tclass, tid)] = _build_flat_decode(bits, vals)
                i += 17 + n
        elif marker == 0xC0:
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp == 1:
                w, h, gray = decode_jpeg_gray(payload)
                g = np.frombuffer(gray, dtype=np.uint8)
                return w, h, np.repeat(g, 3).tobytes()
            if ncomp != 3:
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            for c in range(3):
                cid, sf, qid = body[6 + 3 * c : 9 + 3 * c]
                ch, cv = sf >> 4, sf & 0xF
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise ValueError("sampling factors above 2 unsupported")
                comps.append((cid, ch, cv, qid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) unsupported"
            )
        elif marker == 0xDD:
            if struct.unpack_from(">H", body, 0)[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            if body[0] != len(comps):
                raise ValueError("scan must cover every frame component")
            by_id = {c[0]: i for i, c in enumerate(comps)}
            for s in range(body[0]):
                cid, tabs = body[1 + 2 * s], body[2 + 2 * s]
                scan.append((by_id[cid], tabs >> 4, tabs & 0xF))
            pos += seglen
            break
        pos += seglen
    if width is None or height is None or not comps:
        raise ValueError("missing SOF0 before SOS")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mw, mh = (width + mcu_w - 1) // mcu_w, (height + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mh * 8 * c[2], mw * 8 * c[1]), dtype=np.float64) for c in comps
    ]
    preds = [0] * len(comps)
    for ci, dct, act in scan:
        _, _, _, qid = comps[ci]
        if (
            qtables.get(qid) is None
            or htables.get((0, dct)) is None
            or htables.get((1, act)) is None
        ):
            raise ValueError("missing quantization or Huffman tables")
    reader = _EntropyDecoder(payload, pos)
    # entropy-decode the interleaved MCU stream (inherently sequential),
    # accumulating each component's zigzag rows + block positions; the
    # dezigzag/dequant/IDCT then runs batched per component
    zz_rows: list[list[list[int]]] = [[] for _ in comps]
    blk_pos: list[list[tuple[int, int]]] = [[] for _ in comps]
    for my in range(mh):
        for mx in range(mw):
            for (ci, dct, act) in scan:
                _, ch, cv, _ = comps[ci]
                dc_map = htables[(0, dct)]
                ac_map = htables[(1, act)]
                for v in range(cv):
                    for h in range(ch):
                        zz, preds[ci] = _decode_blocks_zz(
                            reader, dc_map, ac_map, preds[ci]
                        )
                        zz_rows[ci].append(zz)
                        blk_pos[ci].append((my * cv + v, mx * ch + h))
    for ci, (_, _, _, qid) in enumerate(comps):
        if not zz_rows[ci]:
            continue
        blocks = _idct_batch(zz_rows[ci], qtables[qid])
        plane = planes[ci]
        for (by, bx), block in zip(blk_pos[ci], blocks):
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    # clamp to sample domain, upsample by replication, crop, transform
    full = []
    for (cid, ch, cv, qid), plane in zip(comps, planes):
        p = np.clip(np.rint(plane), 0, 255)
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:height, :width])
    rgb = ycbcr_to_rgb(full[0], full[1], full[2])
    return width, height, rgb.tobytes()
