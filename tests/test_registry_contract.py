"""Driver-contract guards over the whole registry:

- every oracle belongs to a registered query, and rows-only entries are a
  known, documented set (a typo'd oracle key would silently weaken the
  correctness gate to rows-only);
- no catalog entry outputs raw DATE/TIMESTAMP columns (pandas reprs differ
  between Spark and DuckDB — the harness convention is format-to-string on
  both sides; a violation passes locally until a tz edge flips the hash).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from postgres_etl_pipeline_spark.queries import REGISTRY, queries as load_all

ROWS_ONLY = {
    "approx_percentiles_by_brand",   # sketch values are engine-specific
    "embedding_ivf_topk",            # KMeans centroids not SQL-expressible
    "grocery_pipeline_mart",         # seeded datagen input, no sf tables
    "retail_pipeline_mart",          # seeded datagen input, no sf tables
    "multimodal_feature_extract",    # mapInPandas fake-decode features
    "hll_daily_users",               # DataSketches estimates
}


@pytest.fixture(scope="module", autouse=True)
def _load():
    load_all()


def test_rows_only_set_is_exactly_the_documented_one():
    actual = {n for n, s in REGISTRY.items() if not s.oracle}
    assert actual == ROWS_ONLY


def test_driver_window_rotation_contract():
    """The driver verifies only ``list(queries())[:50]``; the rotation must
    (a) fill all 50 slots, (b) lead with the sentinel core, (c) give every
    windowed entry an oracle (a rows-only row would waste a slot), and
    (d) reference only registered names (a typo would silently shrink the
    window)."""
    from postgres_etl_pipeline_spark import queries as Q

    names = list(Q.queries())
    oracles = Q.oracle_sql()
    window = names[:50]
    assert len(names) == len(REGISTRY)
    assert len(Q._DRIVER_WINDOW) == 50
    assert window == list(Q._DRIVER_WINDOW)
    assert window[: len(Q._SENTINELS)] == list(Q._SENTINELS)
    assert all(n in oracles for n in window)
    unknown = [n for n in Q._DRIVER_WINDOW if n not in REGISTRY]
    assert not unknown


def test_every_entry_has_survey_citation():
    missing = [n for n, s in REGISTRY.items() if not s.survey.strip()]
    assert not missing


def test_no_catalog_entry_emits_raw_temporal_columns(spark, sf_small):
    bad = {}
    for name, spec in REGISTRY.items():
        if name in ("grocery_pipeline_mart", "retail_pipeline_mart"):
            continue  # pipeline smokes run their own sinks; skip the cost
        if name.startswith("stream_"):
            continue  # drained via memory sink; building them runs the query
        df = spec.fn(spark, sf_small)
        tempora = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.DateType, T.TimestampType, T.TimestampNTZType))
        ]
        if tempora:
            bad[name] = tempora
    assert not bad, f"raw temporal outputs: {bad}"
