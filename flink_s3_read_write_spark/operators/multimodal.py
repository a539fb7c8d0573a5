"""Multimodal column support: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

Image decode is REAL for the two dominant web formats — full PNG
(zlib + all five filters) and baseline JPEG (Huffman + dequant +
IDCT + chroma upsample + YCbCr), both stdlib+numpy — via
``decode_image``.  Other media (audio/video codecs: no
ffmpeg/torchaudio in this container) stay behind a clearly-marked
deterministic fake / ``NotImplementedError``.  Everything Spark-side
is real and tested: binary column handling, ``mapInPandas`` batch
iteration, output schemas, explode of frame samples, partition
sizing.

At 100 TB the pattern is: media bytes stay in parquet/object storage,
``spark.sql.files.maxPartitionBytes`` bounds the bytes a task decodes,
and the UDF processes Arrow record batches (no per-row Python
overhead beyond the decode call itself, which dominates anyway).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # richer decoders (JPEG etc.), absent in this container
    from PIL import Image  # type: ignore  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal stdlib-only PNG writer (8-bit grey/RGB/RGBA, filter 0).

    For fixtures and round-trip tests — a real, spec-conforming PNG any
    external viewer can open.  ``pixels``: (h, w) or (h, w, {1,3,4})
    uint8 array.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real stdlib-only PNG decode: chunk walk → IHDR dims → zlib
    IDAT inflate → per-scanline unfilter (all five filter types) →
    (width, height, channels, uint8 pixel array of shape (h, w, c)).

    Supports the dominant web case: 8-bit, non-interlaced, color types
    0/2/3/4/6 (palette rows are expanded via PLTE).  Anything else
    raises ``ValueError`` — callers route those rows to the stub or an
    error column rather than silently guessing.
    """
    if buf[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, idat, ihdr, plte = len(_PNG_SIG), [], None, None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); 8-bit non-interlaced 0/2/3/4/6 only"
        )
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = line
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                b = int(prev[x])
                if ftype == 1:
                    cur[x] = (int(line[x]) + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    cc = int(prev[x - c]) if x >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter {ftype}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, c)
    if color_type == 3:
        if plte is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        px = plte[px[:, :, 0]]
        c = 3
    return w, h, c, px

# --------------------------------------------------------------------------
# Baseline JPEG decode, stdlib+numpy only (ITU-T T.81 / ISO 10918-1 —
# public spec).  Covers baseline sequential DCT (SOF0): DQT/DHT/SOS
# marker parse, entropy (Huffman) decode with byte-stuffing and
# restart markers, dequant, zigzag, 8x8 IDCT, chroma upsampling for
# any sampling factors, YCbCr→RGB.  Progressive (SOF2) and
# arithmetic-coded variants raise ValueError — callers route those to
# the stub rather than silently guessing.
# --------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Orthonormal 8-point DCT-II basis: pixels = C.T @ coef @ C
_DCT_C = np.array([
    [(np.sqrt(0.125) if k == 0 else 0.5) * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])


def _huff_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman map: (code_length, code) → symbol."""
    table, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data: un-stuffs
    0xFF00, stops at markers, realigns at restart markers."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos, self.bit = buf, pos, 0

    def read_bit(self) -> int:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt != 0x00:  # a real marker: entropy data ended
                raise ValueError("hit marker inside entropy data")
        bit = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if b == 0xFF else 0)  # skip stuffed 0x00
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Skip to just past the next RSTn marker (byte-aligned)."""
        if self.bit:
            self.bit = 0
            self.pos += 1 + (1 if self.buf[self.pos] == 0xFF else 0)
        while not (
            self.buf[self.pos] == 0xFF and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a ``size``-bit magnitude to its signed value."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real stdlib+numpy baseline JPEG decode → (w, h, channels,
    uint8 pixels (h, w, c)).  Grayscale and YCbCr (any sampling
    factors, e.g. 4:4:4/4:2:2/4:2:0) supported; progressive or
    arithmetic coding raises ValueError."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI marker)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad marker alignment in JPEG header")
        marker = buf[pos + 1]
        seg_len = struct.unpack(">H", buf[pos + 2 : pos + 4])[0]
        data = buf[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(data):
                prec, tid = data[i] >> 4, data[i] & 0xF
                n = 64 * (2 if prec else 1)
                raw = data[i + 1 : i + 1 + n]
                tbl = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                qt[tid] = tbl
                i += 1 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline
            _prec, h, w, ncomp = struct.unpack(">BHHB", data[:6])
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = data[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG variant (progressive/arithmetic)")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(data):
                cls, tid = data[i] >> 4, data[i] & 0xF
                bits = list(data[i + 1 : i + 17])
                nv = sum(bits)
                vals = data[i + 17 : i + 17 + nv]
                (huff_ac if cls else huff_dc)[tid] = _huff_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", data[:2])[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            ns = data[0]
            sel = {}
            for si in range(ns):
                cs, tabs = data[1 + 2 * si], data[2 + 2 * si]
                sel[cs] = (tabs >> 4, tabs & 0xF)
            scan_pos = pos + 2 + seg_len
            return _decode_scan(
                buf, scan_pos, w, h, comps, sel, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("truncated JPEG: no SOS marker")


def _decode_scan(buf, scan_pos, w, h, comps, sel, qt, huff_dc, huff_ac, dri):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    rd = _BitReader(buf, scan_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                rd.align_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = sel[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        s = rd.decode_symbol(huff_dc[dc_t])
                        diff = _extend(rd.read_bits(s), s)
                        pred[ci] += diff
                        coef[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = rd.decode_symbol(huff_ac[ac_t])
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            coef[k] = _extend(rd.read_bits(sz), sz) * q[k]
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coef
                        px = _DCT_C.T @ block.reshape(8, 8) @ _DCT_C
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample each component to full MCU-grid resolution, crop to (h, w)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, px
    if len(full) == 3:  # JFIF YCbCr → RGB (BT.601 full-range)
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        px = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
        return w, h, 3, px
    raise ValueError(f"unsupported JPEG component count: {len(full)}")


IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int, "
    "channels int, feature array<float>"
)
FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_ts_ms bigint, frame_digest string"
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped frame from the documents table: content as
    an opaque binary column + typed metadata struct.  Stands in for a
    real image/audio parquet until one exists."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.when(F.col(id_col) % 3 == 0, "image/png")
            .when(F.col(id_col) % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("media_type"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ).alias("meta"),
    )


def jpeg_dimensions(buf: bytes) -> tuple[int, int, int]:
    """Parse (width, height, channels) from JPEG/JFIF markers — pure
    stdlib, no codec needed.  Walks the marker stream to the first
    frame header (SOF0/1/2/3/5/6/7/9/10/11/13/14/15), which carries the
    image dimensions and component count; pixel decode (the entropy-
    coded scan) is NOT performed.  Raises ValueError on non-JPEG or
    truncated input."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":  # SOI
        raise ValueError("not a JPEG (missing SOI marker)")
    pos = 2
    sof_markers = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # not DHT/JPG/DAC
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            pos += 1  # fill bytes / entropy data resync
            continue
        marker = buf[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers, no length
            continue
        if pos + 4 > len(buf):
            break
        seg_len = struct.unpack(">H", buf[pos + 2 : pos + 4])[0]
        if marker in sof_markers:
            if pos + 10 > len(buf):
                break
            _prec, h, w, ncomp = struct.unpack(">BHHB", buf[pos + 4 : pos + 10])
            return w, h, ncomp
        pos += 2 + seg_len
    raise ValueError("truncated JPEG: no SOF marker found")


def decode_image(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Full pixel decode for the two dominant web formats, stdlib+
    numpy only: PNG (``decode_png``) and baseline JPEG
    (``decode_jpeg``).  Other formats route through PIL when present,
    else raise ``NotImplementedError`` explicitly."""
    if buf[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(buf)
    if buf[:2] == b"\xff\xd8":
        return decode_jpeg(buf)
    if not HAS_PIL:
        raise NotImplementedError(
            "non-PNG/JPEG decode requires PIL; this container has no imaging "
            "libs — use fake=True (deterministic stub) for synthetic media"
        )
    raise NotImplementedError("PIL decode wiring is deferred until PIL exists")


def _decode_image_real(buf: bytes) -> tuple[int, int, int]:
    """Real decode path, stdlib only: full PNG and baseline-JPEG pixel
    decode via :func:`decode_image` (dims come from the decoded array,
    so a corrupt scan fails loudly instead of trusting headers)."""
    w, h, c, _px = decode_image(buf)
    return w, h, c


def _real_feature(buf: bytes, dim: int = 8) -> np.ndarray:
    """Real image feature from decoded pixels: per-channel mean and
    std (normalized to [0,1]), zero-padded to ``dim`` float32s — the
    shape a downstream embedding model would consume."""
    _w, _h, c, px = decode_image(buf)
    flat = px.reshape(-1, px.shape[2]).astype(np.float64) / 255.0
    stats = np.concatenate([flat.mean(axis=0), flat.std(axis=0)])
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(stats))] = stats[:dim]
    return out


def resize_pixels(px: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize via pure NumPy index maps — the real
    kernel behind ``resize_images`` when the bytes are decodable."""
    h, w = px.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return px[ys][:, xs]


def _fake_decode(buf: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode: width/height/channels derived from a
    digest of the bytes.  Exercises the exact same plumbing (bytes in,
    dims out) with stable outputs for tests/oracles."""
    d = hashlib.md5(buf).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240, 1 + d[2] % 4


def _fake_feature(buf: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake feature vector: fold the md5 digest into
    ``dim`` floats in [0,1)."""
    d = hashlib.md5(buf).digest()
    raw = np.frombuffer((d * ((dim * 4) // len(d) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1_000_003).astype(np.float32) / 1_000_003.0


def image_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Decode + feature-extract media batches via ``mapInPandas``.

    Input: frame from ``attach_media``.  Arrow streams batches of
    (doc_id, content, meta) into Python; each batch is processed with
    numpy, never row-at-a-time pickling.
    """
    decode = _fake_decode if fake else _decode_image_real
    feature = _fake_feature if fake else _real_feature
    # Arrow-input pruning: this fn DOES read meta (media_type/n_bytes
    # passthrough), but a caller's extra columns must still stop at
    # the boundary — mapInPandas serializes every input column.
    df = df.select("doc_id", "content", "meta")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [decode(b) for b in pdf["content"]]
            feats = [feature(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples int, n_frames int, rms double, "
    "peak double, zero_crossing_rate double, frame_rms array<float>"
)


def wav_pcm(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Real RIFF/WAVE container parse, stdlib-only: chunk walk to
    ``fmt `` (must be format 1 = integer PCM, 16-bit) and ``data``,
    returning (sample_rate, n_channels, int16 sample array — channels
    interleaved).  Word-aligned chunk skipping per the RIFF spec, so
    files with LIST/INFO/fact chunks parse correctly.  Raises
    ``ValueError`` on non-WAV bytes or unsupported encodings (float/
    ADPCM/24-bit) — callers quarantine those rows."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    audio_fmt, n_ch, rate, _bps, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV encoding (format={audio_fmt}, bits={bits}); "
            "16-bit integer PCM only"
        )
    data = data[: len(data) - (len(data) % 2)]
    return rate, n_ch, np.frombuffer(data, dtype="<i2")


def audio_features(df: DataFrame, frame_len: int = 256) -> DataFrame:
    """Audio feature extraction over raw PCM bytes — fully real (no
    codec library needed): the binary column is interpreted as
    little-endian int16 PCM, framed, and reduced with NumPy.

    Per clip: overall RMS/peak/zero-crossing-rate plus per-frame RMS
    (the input shape for VAD/segmentation downstream).  Arrow-batched
    ``mapInPandas``; at 100 TB the audio bytes stream through the scan
    and the DSP is C-speed per batch.
    """
    # Prune the Arrow input to exactly what the Python fn reads:
    # mapInPandas is a column-pruning barrier (Catalyst must feed it
    # every input column), so an unused column here would be
    # serialized into every Arrow batch.  meta is consumed by the
    # Catalyst-side filter, then dropped BEFORE the boundary.
    auds = (
        df.filter(F.col("meta.media_type") == "audio/wav")
        .select("doc_id", "content")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "n_samples", "n_frames", "rms",
                                    "peak", "zero_crossing_rate", "frame_rms")}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                buf = bytes(content)
                if buf[:4] == b"RIFF":  # real WAV container: unwrap
                    _rate, _ch, pcm16 = wav_pcm(buf)
                else:  # headerless bytes: interpret as raw int16 PCM
                    buf = buf[: len(buf) - (len(buf) % 2)]
                    pcm16 = np.frombuffer(buf, dtype="<i2")
                pcm = pcm16.astype(np.float64) / 32768.0
                n = len(pcm)
                if n == 0:
                    pcm = np.zeros(1)
                    n = 0
                n_frames = max(1, len(pcm) // frame_len)
                frames = pcm[: n_frames * frame_len].reshape(n_frames, -1) \
                    if len(pcm) >= frame_len else pcm[None, :]
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(n)
                rows["n_frames"].append(frames.shape[0])
                rows["rms"].append(float(np.sqrt(np.mean(pcm**2))))
                rows["peak"].append(float(np.max(np.abs(pcm))))
                rows["zero_crossing_rate"].append(
                    float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))) if n > 1 else 0.0
                )
                rows["frame_rms"].append(
                    np.sqrt((frames**2).mean(axis=1)).astype(np.float32)
                )
            yield pd.DataFrame(rows)

    return auds.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, target_w int, target_h int, "
    "resized_digest string"
)


def resize_images(
    df: DataFrame, target: tuple[int, int] = (224, 224), *, fake: bool = True
) -> DataFrame:
    """Resize via ``mapInPandas``: decode → nearest-neighbor resample
    to ``target`` → emit the resized buffer's digest.

    ``fake=False`` is the REAL path for PNG/JPEG bytes: full pixel
    decode (:func:`decode_image`) + :func:`resize_pixels` (pure NumPy
    index maps), digesting the actual resized pixel array.  The
    default fake path keeps the Spark-side contract testable on
    synthetic non-image bytes (digest stands in for pixels)."""
    tw, th = target
    # Arrow-input pruning: the fn reads (doc_id, content) only; meta
    # is consumed by the Catalyst filter and must not cross the
    # mapInPandas boundary (no column pruning through it).
    imgs = (
        df.filter(F.col("meta.media_type") == "image/png")
        .select("doc_id", "content")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "target_w", "target_h", "resized_digest")}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if fake:
                    w, h, _c = _fake_decode(content)
                    digest = hashlib.md5(
                        bytes(content) + f"{tw}x{th}".encode()
                    ).hexdigest()
                else:
                    w, h, _c, px = decode_image(bytes(content))
                    digest = hashlib.md5(
                        resize_pixels(px, tw, th).tobytes()
                    ).hexdigest()
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["target_w"].append(tw)
                rows["target_h"].append(th)
                rows["resized_digest"].append(digest)
            yield pd.DataFrame(rows)

    return imgs.mapInPandas(batches, RESIZED_SCHEMA)


VIDEO_META_SCHEMA = (
    "doc_id bigint, brand string, duration_ms bigint, n_tracks int, parse_error string"
)


def mp4_metadata(buf: bytes) -> dict:
    """Real ISO BMFF (MP4/MOV) metadata parse, stdlib-only: walk the
    box tree to ``ftyp`` (major brand) and ``moov/mvhd`` (timescale +
    duration, both v0 and v1 layouts), counting ``trak`` boxes.  No
    codec decode — this is the container-level metadata a curation
    pipeline filters on (duration caps, track sanity) before paying
    for any frame decode.  Raises ``ValueError`` on corrupt boxes or
    missing ``moov`` (e.g. fragmented streams)."""
    def boxes(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size, typ = struct.unpack(">I4s", buf[pos : pos + 8])
            hdr = 8
            if size == 1:  # 64-bit largesize
                size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
                hdr = 16
            elif size == 0:  # to end of enclosing box
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError("corrupt MP4: box overruns its parent")
            yield typ, pos + hdr, pos + size
            pos += size

    brand, timescale, duration, n_tracks = None, None, None, 0
    for typ, s, e in boxes(0, len(buf)):
        if typ == b"ftyp":
            brand = buf[s : s + 4].decode("ascii", "replace")
        elif typ == b"moov":
            for t2, s2, _e2 in boxes(s, e):
                if t2 == b"mvhd":
                    ver = buf[s2]
                    if ver == 1:
                        timescale, duration = struct.unpack(
                            ">IQ", buf[s2 + 20 : s2 + 32]
                        )
                    else:
                        timescale, duration = struct.unpack(
                            ">II", buf[s2 + 12 : s2 + 20]
                        )
                elif t2 == b"trak":
                    n_tracks += 1
    if timescale is None:
        raise ValueError("no moov/mvhd box (not an MP4, or fragmented stream)")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "duration_ms": (duration * 1000) // timescale if timescale else 0,
        "n_tracks": n_tracks,
    }


def video_metadata(df: DataFrame) -> DataFrame:
    """Container-metadata extraction over video rows: real MP4 box
    parse per row (Arrow batches, numpy/stdlib only); rows whose bytes
    aren't a parseable MP4 carry the error in ``parse_error`` instead
    of failing the batch — at 100 TB a poison row must never kill the
    task, it gets quarantined by a downstream filter."""
    # Arrow-input pruning: (doc_id, content) only — see audio_features.
    vids = (
        df.filter(F.col("meta.media_type") == "video/mp4")
        .select("doc_id", "content")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "brand": [], "duration_ms": [],
                    "n_tracks": [], "parse_error": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                rows["doc_id"].append(doc_id)
                try:
                    m = mp4_metadata(bytes(content))
                    rows["brand"].append(m["brand"])
                    rows["duration_ms"].append(m["duration_ms"])
                    rows["n_tracks"].append(m["n_tracks"])
                    rows["parse_error"].append(None)
                except ValueError as exc:
                    rows["brand"].append(None)
                    rows["duration_ms"].append(None)
                    rows["n_tracks"].append(None)
                    rows["parse_error"].append(str(exc))
            yield pd.DataFrame(rows)

    return vids.mapInPandas(batches, VIDEO_META_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video rows: N frame records per
    media row (explode), each with a deterministic digest standing in
    for decoded frame bytes.  Real decoder would replace the digest
    with pixel tensors; the schema/explode/partition shape is what
    matters for the pipeline."""
    # Arrow-input pruning: (doc_id, content) only — see audio_features.
    vids = (
        df.filter(F.col("meta.media_type") == "video/mp4")
        .select("doc_id", "content")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_digest": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n = min(max_frames, 1 + len(content) % max_frames)
                for i in range(n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame_digest"].append(
                        hashlib.md5(content + i.to_bytes(4, "little")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return vids.mapInPandas(batches, FRAME_SCHEMA)
