"""Parity gate: every registry query with an oracle must hash-match DuckDB
at sf0.001 (fast); the driver repeats this at sf0.01."""

from __future__ import annotations

import pytest

from postgres_etl_pipeline_spark.queries import REGISTRY, queries as _load_all

from .oracle_harness import compare

_load_all()  # pull the extension catalog into REGISTRY before parametrize

ORACLE_QUERIES = [n for n, s in REGISTRY.items() if s.oracle]


def test_every_entry_is_oracle_checked():
    """Round 11 retired the rows-only set (the two sketch entries now
    emit invariant-audit relations with constant-SQL oracles) — this
    suite therefore IS the whole catalog; a new oracle-less entry must
    be a deliberate decision, not a forgotten oracle."""
    assert [n for n, s in REGISTRY.items() if not s.oracle] == []


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_small, name):
    spec = REGISTRY[name]
    result = compare(spec.fn(spark, sf_small), spec.oracle, sf_small)
    assert result["ok"], f"{name}: {result}"
