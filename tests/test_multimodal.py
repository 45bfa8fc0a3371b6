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


def test_decode_payload_is_an_explicit_stub():
    with pytest.raises(NotImplementedError, match="kind='image/png'"):
        M.decode_payload(b"\x89PNG", "image/png")
