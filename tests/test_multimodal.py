"""Multimodal plumbing tests (operators/multimodal.py): binary media
columns + mapInPandas decode/feature/frame-sample stubs (q43/q44)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators import multimodal as M
from flink_s3_read_write_spark.sources.io import load_table
from tests.conftest import arrow_input_cols as _arrow_input_cols


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return M.attach_media(load_table(spark, sf_dir, "documents").limit(60))


def test_attach_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    assert "media_type" in media.select("meta.*").columns


def test_image_features_deterministic_and_shaped(media):
    a = {r["doc_id"]: r for r in M.image_features(media, fake=True).collect()}
    b = {r["doc_id"]: r for r in M.image_features(media, fake=True).collect()}
    assert len(a) == 60
    for doc_id, r in a.items():
        assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        assert 1 <= r["channels"] <= 4
        assert len(r["feature"]) == 8 and all(0 <= f < 1 for f in r["feature"])
        assert list(r["feature"]) == list(b[doc_id]["feature"])


def test_real_decode_path_raises_without_pil(media):
    if M.HAS_PIL:
        pytest.skip("PIL present")
    with pytest.raises(Exception, match="(NotImplementedError|decode requires PIL)"):
        M.image_features(media, fake=False).collect()


def test_sample_frames(media):
    vids = media.filter(F.col("meta.media_type") == "video/mp4")
    n_vids = vids.count()
    frames = M.sample_frames(media).collect()
    assert len(frames) >= n_vids                     # >=1 frame per video
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    content = {r["doc_id"]: bytes(r["content"]) for r in vids.collect()}
    assert set(by_doc) == set(content)
    for doc_id, rows in by_doc.items():
        idxs = sorted(r["frame_idx"] for r in rows)
        assert idxs == list(range(len(rows))) and len(rows) <= 4
        r0 = min(rows, key=lambda r: r["frame_idx"])
        expect = hashlib.md5(content[doc_id] + (0).to_bytes(4, "little")).hexdigest()
        assert r0["frame_digest"] == expect
        assert r0["frame_ts_ms"] == 0


def test_resize_images_plumbing(media):
    from pyspark.sql import functions as F2

    imgs = media.filter(F2.col("meta.media_type") == "image/png")
    out = {r["doc_id"]: r for r in M.resize_images(media, target=(224, 224)).collect()}
    assert set(out) == {r["doc_id"] for r in imgs.collect()}
    for r in out.values():
        assert (r["target_w"], r["target_h"]) == (224, 224)
        assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        assert len(r["resized_digest"]) == 32
    again = {r["doc_id"]: r["resized_digest"]
             for r in M.resize_images(media, target=(224, 224)).collect()}
    assert again == {k: v["resized_digest"] for k, v in out.items()}


def test_audio_features_numpy_oracle(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    pcm = (rng.randn(1000) * 3000).astype("<i2")
    silent = np.zeros(512, dtype="<i2")
    df = spark.createDataFrame(
        [(1, bytearray(pcm.tobytes()), ("audio/wav", 2000)),
         (2, bytearray(silent.tobytes()), ("audio/wav", 1024)),
         (3, bytearray(b"xx"), ("video/mp4", 2))],
        "doc_id long, content binary, meta struct<media_type string, n_bytes int>",
    )
    out = {r["doc_id"]: r for r in M.audio_features(df, frame_len=256).collect()}
    assert set(out) == {1, 2}                      # video row filtered out
    x = pcm.astype(np.float64) / 32768.0
    assert out[1]["n_samples"] == 1000
    assert out[1]["rms"] == pytest.approx(float(np.sqrt(np.mean(x**2))), rel=1e-9)
    assert out[1]["peak"] == pytest.approx(float(np.max(np.abs(x))), rel=1e-9)
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    assert out[1]["zero_crossing_rate"] == pytest.approx(zcr, rel=1e-9)
    assert out[1]["n_frames"] == 3 and len(out[1]["frame_rms"]) == 3
    f0 = float(np.sqrt(np.mean(x[:256] ** 2)))
    assert out[1]["frame_rms"][0] == pytest.approx(f0, rel=1e-6)
    assert out[2]["rms"] == 0.0 and out[2]["peak"] == 0.0


def test_jpeg_dimensions_header_parse():
    """jpeg_dimensions reads w/h/channels from the SOF marker of a
    hand-assembled minimal JPEG stream (SOI + APP0 + DQT + SOF0), with
    no pixel decode and no imaging library."""
    import struct

    import pytest

    from flink_s3_read_write_spark.operators.multimodal import (
        _decode_image_real,
        jpeg_dimensions,
    )

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    w, h, ncomp = 640, 480, 3
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + b"\x01\x11\x00" * ncomp)
    jpeg = (
        b"\xff\xd8"                                   # SOI
        + seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")  # APP0
        + seg(0xDB, b"\x00" + bytes(64))              # DQT (ignored)
        + sof0
        + b"\xff\xd9"                                 # EOI
    )
    assert jpeg_dimensions(jpeg) == (w, h, ncomp)
    # the full-decode path must NOT trust headers: a JPEG without an
    # entropy-coded scan is undecodable and fails loudly
    with pytest.raises(ValueError, match="no SOS"):
        _decode_image_real(jpeg)

    with pytest.raises(ValueError):
        jpeg_dimensions(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        jpeg_dimensions(jpeg[:8])  # truncated before SOF


def _box(typ: bytes, payload: bytes) -> bytes:
    import struct as _s

    return _s.pack(">I", len(payload) + 8) + typ + payload


def _minimal_mp4(duration: int = 30000, timescale: int = 1000, tracks: int = 2,
                 v1: bool = False) -> bytes:
    import struct as _s

    if v1:
        mvhd = (b"\x01" + b"\x00" * 3 + b"\x00" * 16
                + _s.pack(">IQ", timescale, duration) + b"\x00" * 80)
    else:
        mvhd = (b"\x00" * 4 + b"\x00" * 8
                + _s.pack(">II", timescale, duration) + b"\x00" * 80)
    moov = _box(b"mvhd", mvhd) + b"".join(
        _box(b"trak", _box(b"tkhd", b"\x00" * 84)) for _ in range(tracks)
    )
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _box(b"moov", moov)


def test_mp4_metadata_real_parse():
    """Real ISO BMFF box walk: brand, v0+v1 mvhd duration, trak count."""
    m = M.mp4_metadata(_minimal_mp4())
    assert m["brand"] == "isom"
    assert m["duration_ms"] == 30000 and m["timescale"] == 1000
    assert m["n_tracks"] == 2
    m1 = M.mp4_metadata(_minimal_mp4(duration=90_000, timescale=600, tracks=1, v1=True))
    assert m1["duration_ms"] == 150_000  # 90000/600 s
    assert m1["n_tracks"] == 1
    with pytest.raises(ValueError, match="moov"):
        M.mp4_metadata(_box(b"ftyp", b"isom\x00\x00\x02\x00"))
    with pytest.raises(ValueError, match="corrupt"):
        M.mp4_metadata(b"\x00\x00\xff\xffftyp")  # box overruns buffer


def test_video_metadata_operator_quarantines_poison_rows(spark):
    """Spark-side: real MP4 rows parse; garbage rows land in
    parse_error instead of failing the Arrow batch."""
    good = _minimal_mp4()
    rows = [
        (1, bytearray(good), {"media_type": "video/mp4", "n_bytes": len(good)}),
        (2, bytearray(b"not a video"), {"media_type": "video/mp4", "n_bytes": 11}),
        (3, bytearray(b"x"), {"media_type": "image/png", "n_bytes": 1}),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, content binary, meta struct<media_type:string,n_bytes:int>"
    )
    got = {r["doc_id"]: r for r in M.video_metadata(df).collect()}
    assert set(got) == {1, 2}  # the PNG row is filtered out, not parsed
    assert got[1]["brand"] == "isom" and got[1]["duration_ms"] == 30000
    assert got[1]["n_tracks"] == 2 and got[1]["parse_error"] is None
    assert got[2]["brand"] is None and got[2]["parse_error"]


def test_wav_container_parse_and_features(spark):
    """A REAL WAV file (written by stdlib `wave`, with an extra LIST
    chunk to exercise word-aligned chunk skipping) unwraps to the same
    features as its raw-PCM twin."""
    import io as _io
    import struct as _s
    import wave

    import numpy as np

    rng = np.random.RandomState(7)
    pcm = (rng.randn(1000) * 3000).astype("<i2")
    bio = _io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(pcm.tobytes())
    wav_bytes = bio.getvalue()
    # splice an odd-sized LIST chunk after the header to test alignment
    list_chunk = b"LIST" + _s.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = wav_bytes[:12] + list_chunk + wav_bytes[12:]
    spliced = spliced[:4] + _s.pack("<I", len(spliced) - 8) + spliced[8:]

    rate, n_ch, got = M.wav_pcm(spliced)
    assert (rate, n_ch) == (16000, 1)
    assert np.array_equal(got, pcm)

    with pytest.raises(ValueError, match="RIFF"):
        M.wav_pcm(b"not audio at all")

    df = spark.createDataFrame(
        [(1, bytearray(spliced), ("audio/wav", len(spliced))),
         (2, bytearray(pcm.tobytes()), ("audio/wav", 2000))],
        "doc_id long, content binary, meta struct<media_type string, n_bytes int>",
    )
    out = {r["doc_id"]: r for r in M.audio_features(df, frame_len=256).collect()}
    assert out[1]["n_samples"] == 1000
    assert out[1]["rms"] == pytest.approx(out[2]["rms"], rel=1e-12)
    assert out[1]["frame_rms"] == out[2]["frame_rms"]


def test_real_image_pipeline_png_and_jpeg(spark):
    """The REAL decode path end-to-end in Spark: PNG and baseline-JPEG
    bytes flow through image_features(fake=False) (decoded dims + real
    per-channel mean/std features) and resize_images(fake=False)
    (actual nearest-neighbor pixel resample digests)."""
    import numpy as np

    from tests.test_jpeg_codec import encode_jpeg_gray

    png_px = np.zeros((16, 8, 3), dtype=np.uint8)
    png_px[:, :, 0] = 200  # red-ish
    png = M.encode_png(png_px)
    jpg_px = np.full((8, 8), 100, dtype=np.uint8)
    jpg = encode_jpeg_gray(jpg_px)
    df = spark.createDataFrame(
        [(1, bytearray(png), ("image/png", len(png))),
         (2, bytearray(jpg), ("image/png", len(jpg)))],
        "doc_id long, content binary, meta struct<media_type string, n_bytes int>",
    )
    out = {r["doc_id"]: r for r in M.image_features(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (8, 16, 3)
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (8, 8, 1)
    assert out[1]["feature"][0] == pytest.approx(200 / 255, abs=1e-6)  # R mean
    assert out[1]["feature"][1] == pytest.approx(0.0, abs=1e-6)        # G mean
    assert out[2]["feature"][0] == pytest.approx(100 / 255, abs=1e-6)

    rz = {r["doc_id"]: r for r in M.resize_images(df, (4, 4), fake=False).collect()}
    import hashlib as _h

    want_png = _h.md5(
        M.resize_pixels(
            M.decode_image(png)[3], 4, 4
        ).tobytes()
    ).hexdigest()
    assert rz[1]["resized_digest"] == want_png
    assert (rz[1]["width"], rz[1]["height"]) == (8, 16)
    assert rz[2]["resized_digest"] == _h.md5(
        M.resize_pixels(M.decode_image(jpg)[3], 4, 4).tobytes()
    ).hexdigest()


def test_arrow_input_width_is_pinned(spark):
    """Each media operator must ship EXACTLY the columns its Python fn
    reads across the Arrow boundary — an unused column (e.g. the meta
    struct, or anything a caller happens to carry) would be serialized
    into every batch because Catalyst cannot prune through
    mapInPandas.  Input carries a decoy 'fat' column to prove callers'
    extra columns are pruned too."""
    df = spark.createDataFrame(
        [(1, bytearray(b"abcd"), ("audio/wav", 4), "x" * 64),
         (2, bytearray(b"efgh"), ("image/png", 4), "y" * 64),
         (3, bytearray(b"ijkl"), ("video/mp4", 4), "z" * 64)],
        "doc_id long, content binary, "
        "meta struct<media_type string, n_bytes int>, fat string",
    )
    assert _arrow_input_cols(M.audio_features(df)) == {"doc_id", "content"}
    assert _arrow_input_cols(M.resize_images(df)) == {"doc_id", "content"}
    assert _arrow_input_cols(M.video_metadata(df)) == {"doc_id", "content"}
    assert _arrow_input_cols(M.sample_frames(df)) == {"doc_id", "content"}
    # image_features genuinely reads meta (media_type/n_bytes passthrough)
    assert _arrow_input_cols(M.image_features(df)) == {"doc_id", "content", "meta"}
