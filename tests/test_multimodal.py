"""Multimodal plumbing: mapInPandas decode/resize/frame-sample contracts
(deterministic fake kernels; real codecs absent by design)."""

from __future__ import annotations

import hashlib

import pytest

from snowflake_to_postgres_spark.operators.multimodal import (
    decode_images,
    resize_images,
    sample_frames,
    with_binary_payload,
)
from snowflake_to_postgres_spark.sources import load_table


def _media(spark, sf_dir):
    return with_binary_payload(load_table(spark, sf_dir, "documents"))


def test_decode_schema_and_determinism(spark, sf_dir):
    media = _media(spark, sf_dir)
    out = decode_images(media)
    assert [f.name for f in out.schema] == ["doc_id", "width", "height", "channels", "features"]
    rows = {r["doc_id"]: r for r in out.collect()}
    docs = {r["doc_id"]: r for r in load_table(spark, sf_dir, "documents").collect()}
    assert len(rows) == len(docs)
    # deterministic: recompute one row's fake decode driver-side
    some_id = next(iter(rows))
    d = hashlib.md5(docs[some_id]["text"].encode()).digest()
    assert rows[some_id]["width"] == 64 + d[0] % 64
    assert len(rows[some_id]["features"]) == 8


def test_decode_real_flag_raises(spark, sf_dir):
    media = _media(spark, sf_dir).limit(2)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_images(media, real_decode=True).collect()


def test_resize_contract(spark, sf_dir):
    out = resize_images(_media(spark, sf_dir).limit(10), max_dim=16).collect()
    for r in out:
        assert r["width"] == 16 and r["height"] == 16
        assert len(bytes(r["payload"])) <= 16 * 16


def test_frame_sampling_fanout(spark, sf_dir):
    media = _media(spark, sf_dir).limit(5)
    frames = sample_frames(media, frame_bytes=64, every=2).collect()
    assert frames, "expected at least one frame per doc"
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
    for doc_id, nos in by_doc.items():
        assert nos == sorted(nos)
        assert all(n % 2 == 0 for n in nos)
