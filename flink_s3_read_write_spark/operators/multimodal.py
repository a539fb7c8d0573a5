"""Multimodal column support: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The decode step itself is STUBBED (this environment has no
PIL/ffmpeg/torchaudio): ``_decode_image_real`` raises
``NotImplementedError`` and the pipeline uses a clearly-marked
deterministic fake instead.  Everything Spark-side is real and tested:
binary column handling, ``mapInPandas`` batch iteration, output
schemas, explode of frame samples, partition sizing.

At 100 TB the pattern is: media bytes stay in parquet/object storage,
``spark.sql.files.maxPartitionBytes`` bounds the bytes a task decodes,
and the UDF processes Arrow record batches (no per-row Python
overhead beyond the decode call itself, which dominates anyway).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoders, absent in this container — gate behind import-try
    from PIL import Image  # type: ignore  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

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


def _decode_image_real(buf: bytes) -> tuple[int, int, int]:
    """Real decode path — requires PIL; not available here."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this container has no imaging libs — "
            "use fake=True (deterministic stub) or install pillow"
        )
    raise NotImplementedError("real decode wiring is deferred until PIL exists")


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

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [decode(b) for b in pdf["content"]]
            feats = [_fake_feature(b) for b in pdf["content"]]
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


def audio_features(df: DataFrame, frame_len: int = 256) -> DataFrame:
    """Audio feature extraction over raw PCM bytes — fully real (no
    codec library needed): the binary column is interpreted as
    little-endian int16 PCM, framed, and reduced with NumPy.

    Per clip: overall RMS/peak/zero-crossing-rate plus per-frame RMS
    (the input shape for VAD/segmentation downstream).  Arrow-batched
    ``mapInPandas``; at 100 TB the audio bytes stream through the scan
    and the DSP is C-speed per batch.
    """
    auds = df.filter(F.col("meta.media_type") == "audio/wav")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "n_samples", "n_frames", "rms",
                                    "peak", "zero_crossing_rate", "frame_rms")}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                buf = bytes(content)
                buf = buf[: len(buf) - (len(buf) % 2)]
                pcm = np.frombuffer(buf, dtype="<i2").astype(np.float64) / 32768.0
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


def resize_images(df: DataFrame, target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Resize plumbing: decode dims → scale to ``target`` → emit a
    deterministic digest standing in for the resized pixel buffer.
    Real resize would swap ``_fake_decode``/digest for PIL ops; the
    Spark-side contract (binary in, fixed-dim record out, Arrow
    batching, image-type filter) is the tested part."""
    tw, th = target
    imgs = df.filter(F.col("meta.media_type") == "image/png")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "target_w", "target_h", "resized_digest")}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                w, h, _c = _fake_decode(content)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["target_w"].append(tw)
                rows["target_h"].append(th)
                rows["resized_digest"].append(
                    hashlib.md5(content + f"{tw}x{th}".encode()).hexdigest()
                )
            yield pd.DataFrame(rows)

    return imgs.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video rows: N frame records per
    media row (explode), each with a deterministic digest standing in
    for decoded frame bytes.  Real decoder would replace the digest
    with pixel tensors; the schema/explode/partition shape is what
    matters for the pipeline."""
    vids = df.filter(F.col("meta.media_type") == "video/mp4")

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
