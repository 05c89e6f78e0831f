"""Multimodal plumbing tests: binary payload + metadata convention,
Arrow-batched mapInPandas feature extraction, decode stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fitness_data_ingest_spark.ext import multimodal as MM
from fitness_data_ingest_spark.registry_util import t


def test_text_as_media_schema(spark, sf_dir):
    media = MM.text_as_media(t(spark, sf_dir, "documents"), "doc_id", "text")
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    r = media.limit(1).collect()[0]
    assert r["meta"]["kind"] == "text"
    assert isinstance(r["payload"], (bytes, bytearray))


def test_fake_feature_extract_mapinpandas(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").limit(50)
    media = MM.text_as_media(docs, "doc_id", "text")
    feats = MM.fake_feature_extract(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["features"]) == MM.FEATURE_DIM for r in rows)
    # deterministic: same payload → same features
    again = {r["media_id"]: r["features"] for r in MM.fake_feature_extract(media).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)
    # n_bytes agrees with the JVM-side metadata pass
    stats = {r["media_id"]: r["n_bytes"] for r in MM.media_stats(media).collect()}
    assert all(stats[r["media_id"]] == r["n_bytes"] for r in rows)


def test_decode_stub_raises_at_execution(spark, sf_dir):
    media = MM.text_as_media(t(spark, sf_dir, "documents").limit(5), "doc_id", "text")
    decoded = MM.decode_stub(media)  # plan builds fine
    assert decoded.schema.fieldNames() == ["media_id", "kind", "decoded"]
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        decoded.collect()


def test_frame_sample_fan_out(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").limit(50)
    media = MM.text_as_media(docs, "doc_id", "text")
    frames = MM.frame_sample(media, frame_bytes=64, every_k=4)
    rows = frames.collect()
    assert len(rows) > 50  # fan-out happened
    # every k-th frame only, and frame bytes match the payload slice
    by_id = {}
    for r in rows:
        assert r["frame_idx"] % 4 == 0
        by_id.setdefault(r["media_id"], []).append(r)
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, fr in by_id.items():
        for r in fr:
            lo = r["frame_idx"] * 64
            assert bytes(r["frame"]) == src[mid][lo : lo + 64]
    # partitioning preserved: no shuffle in the plan (checked without the
    # test's limit(), which itself adds a SinglePartition exchange)
    import contextlib, io as _io

    full = MM.frame_sample(
        MM.text_as_media(t(spark, sf_dir, "documents"), "doc_id", "text")
    )
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        full.explain()
    assert "Exchange" not in buf.getvalue()


def test_resize_stub_contract(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").limit(5)
    media = MM.text_as_media(docs, "doc_id", "text")
    resized = MM.resize_stub(media, 224, 224)
    # plan + schema build fine
    assert [f.name for f in resized.schema.fields] == [
        "media_id",
        "payload",
        "width",
        "height",
    ]
    with pytest.raises(Exception, match="NotImplementedError|resize"):
        resized.collect()
