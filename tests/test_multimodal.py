"""Multimodal column plumbing (SURVEY §7): binary payload + typed metadata,
Arrow-batched feature extraction, and the explicit decode stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.operators import multimodal as M


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world", "s3://a"), (2, "xyz", None)],
        ["doc_id", "text", "source"],
    )


def test_payload_schema_and_sizes(spark):
    out = M.attach_binary_payload(_docs(spark)).collect()
    by_id = {r.doc_id: r for r in out}
    assert bytes(by_id[1].payload) == b"hello world"
    assert by_id[1].meta.kind == "text/plain"
    assert by_id[1].meta.n_bytes == 11
    assert by_id[2].meta.source is None


def test_extract_features_batch_shape_and_determinism(spark):
    payloads = M.attach_binary_payload(_docs(spark))
    feats = M.extract_features(payloads)
    assert [f.name for f in feats.schema.fields] == [
        "doc_id", "kind", "n_bytes", "feature",
    ]
    rows = {r.doc_id: r for r in feats.collect()}
    # deterministic fake: uint32 LE windows of the payload bytes / 2^32
    assert rows[1].feature == M._fake_feature(b"hello world")
    assert rows[2].feature == M._fake_feature(b"xyz")
    assert len(rows[1].feature) == 4
    # repartitioning must not change per-row results (pure map)
    rows2 = {
        r.doc_id: r.feature
        for r in M.extract_features(payloads.repartition(7)).collect()
    }
    assert rows2 == {k: r.feature for k, r in rows.items()}


@pytest.mark.parametrize("tier", ["sf_small", "sf_med"])
def test_driver_corpus_is_pure_ascii(spark, tier, request):
    """The multimodal_feature_extract hash oracle reads payload bytes as
    ``ascii(substring(text, i, 1))`` — valid ONLY while UTF-8(text) is
    byte-per-char, i.e. pure ASCII. Pin that property on every tier the
    harness runs so a future testdata regeneration with non-ASCII text
    fails HERE with a clear message, not as an opaque hash mismatch."""
    docs = spark.read.parquet(f"{request.getfixturevalue(tier)}/documents.parquet")
    non_ascii = docs.filter(
        F.octet_length(F.encode("text", "UTF-8")) != F.length("text")
    ).count()
    assert non_ascii == 0, (
        "documents.text contains non-ASCII characters; the "
        "multimodal_feature_extract oracle's ascii()-per-byte arithmetic "
        "no longer matches UTF-8 payload bytes"
    )


def test_decode_payload_is_an_explicit_stub():
    with pytest.raises(NotImplementedError, match="kind='image/png'"):
        M.decode_payload(b"\x89PNG", "image/png")


def test_resize_payloads_fixed_budget(spark, sf_small):
    from postgres_etl_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        resize_payloads,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(50)
    out = resize_payloads(attach_binary_payload(docs), target_len=32).collect()
    assert len(out) == 50
    for r in out:
        assert r.n_bytes == 32 and len(r.payload) == 32
        # nearest-neighbor resample keeps first byte for non-empty payloads
        if r.orig_n_bytes:
            assert r.payload[0:1]


def test_sample_frames_expansion_and_sizes(spark):
    from postgres_etl_pipeline_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, b"a" * 130), (2, b"b" * 64), (3, b""), (4, None)],
        "doc_id long, payload binary",
    )
    rows = {(r.doc_id, r.frame_idx): r for r in sample_frames(df, 64, 2).collect()}
    # doc 1: 130 bytes → frames 0,1,2 (sizes 64,64,2); stride 2 keeps 0,2
    assert rows[(1, 0)].frame_n_bytes == 64 and rows[(1, 0)].n_frames_total == 3
    assert rows[(1, 2)].frame_n_bytes == 2
    assert (1, 1) not in rows
    # doc 2: exactly one frame
    assert rows[(2, 0)].frame_n_bytes == 64 and rows[(2, 0)].n_frames_total == 1
    # empty / NULL payloads emit no frames
    assert not [k for k in rows if k[0] in (3, 4)]
