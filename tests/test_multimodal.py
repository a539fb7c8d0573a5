"""Multimodal plumbing tests (operators/multimodal.py): binary media
columns + mapInPandas decode/feature/frame-sample stubs (q43/q44)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators import multimodal as M
from flink_s3_read_write_spark.sources.io import load_table


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
