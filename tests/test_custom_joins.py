"""Custom join operators (asof_join, range_self_join_pairs) vs naive
reference implementations on seeded random data, plus boundary semantics
the DuckDB-oracle queries can't isolate (exact-tie timestamps, exact
window-boundary gaps, empty sides)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_etl_pipeline_spark.operators.relational import (
    asof_join,
    range_self_join_pairs,
)

T0 = datetime(2024, 1, 1)

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)


def _random_events(seed: int, n: int = 200, users: int = 8):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.randrange(users),
                T0 + timedelta(seconds=rng.randrange(0, 36000)),
                rng.choice(["click", "view"]),
            )
        )
    return rows


def _naive_asof(rows):
    """For each click: max view ts <= click ts for the same user."""
    out = {}
    for cid, cu, cts, ck in rows:
        if ck != "click":
            continue
        best = None
        for _, vu, vts, vk in rows:
            if vk == "view" and vu == cu and vts <= cts:
                if best is None or vts > best:
                    best = vts
        out[cid] = best
    return out


def _naive_range_pairs(rows, window_s):
    pairs = set()
    for a in rows:
        for b in rows:
            if (
                a[1] == b[1]
                and a[0] < b[0]
                and abs((a[2] - b[2]).total_seconds()) <= window_s
            ):
                pairs.add((a[0], b[0]))
    return pairs


def test_asof_join_matches_naive_on_random_data(spark):
    for seed in (7, 42, 1234):
        rows = _random_events(seed)
        df = spark.createDataFrame(rows, EV_SCHEMA)
        clicks = df.filter(F.col("kind") == "click").drop("kind")
        views = df.filter(F.col("kind") == "view").drop("kind")
        got = {
            r.event_id: r.view_ts
            for r in asof_join(
                clicks,
                views,
                on=["user_id"],
                left_ts="ts",
                right_ts="ts",
                right_vals={"ts": "view_ts"},
            ).collect()
        }
        want = _naive_asof(rows)
        assert got == want, f"seed={seed}"


def test_asof_join_tie_and_no_match(spark):
    rows = [
        (1, 1, T0, "view"),
        (2, 1, T0, "click"),                       # tie: view at SAME ts matches
        (3, 2, T0, "click"),                       # user 2 has no views → NULL
        (4, 1, T0 + timedelta(seconds=5), "click"),  # later click reuses view
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        r.event_id: r.view_ts
        for r in asof_join(
            df.filter(F.col("kind") == "click").drop("kind"),
            df.filter(F.col("kind") == "view").drop("kind"),
            on=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_vals={"ts": "view_ts"},
        ).collect()
    }
    assert got == {2: T0, 3: None, 4: T0}


def test_range_pairs_match_naive_on_random_data(spark):
    for seed in (7, 99):
        rows = _random_events(seed, n=120, users=5)
        df = spark.createDataFrame(rows, EV_SCHEMA)
        got = {
            (r.id_a, r.id_b)
            for r in range_self_join_pairs(
                df, key="user_id", ts_col="ts", window_s=600, id_col="event_id"
            ).collect()
        }
        assert got == _naive_range_pairs(rows, 600), f"seed={seed}"


def test_range_pairs_exact_boundary_included_and_excluded(spark):
    rows = [
        (1, 1, T0, "e"),
        (2, 1, T0 + timedelta(seconds=300), "e"),          # exactly 300s → in
        (3, 1, T0 + timedelta(seconds=300, microseconds=1), "e"),  # 300.000001 vs id1 → out
        (4, 2, T0 + timedelta(seconds=100), "e"),          # other user → out
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        (r.id_a, r.id_b)
        for r in range_self_join_pairs(
            df, key="user_id", ts_col="ts", window_s=300, id_col="event_id"
        ).collect()
    }
    assert got == {(1, 2), (2, 3)}


def test_salted_agg_equals_plain_agg(spark):
    # heavy skew: 90% of rows share one key
    rng = random.Random(5)
    rows = [(("hot" if rng.random() < 0.9 else f"k{rng.randrange(20)}"), rng.randrange(1000))
            for _ in range(5000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    from postgres_etl_pipeline_spark.operators.relational import salted_agg

    got = {
        r.k: (r.n, r.total, r.mx)
        for r in salted_agg(
            df, ["k"], {"n": ("count", "v"), "total": ("sum", "v"), "mx": ("max", "v")}
        ).collect()
    }
    want = {
        r.k: (r.n, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_prefix_filter_pairs_equal_full_inverted_index(spark, sf_small):
    """Prefix filtering is EXACT (recall 1 by theorem): the pair set must
    equal the full inverted-index join's, not just approximate it."""
    from pyspark.sql import functions as F

    from postgres_etl_pipeline_spark.operators import dedup as D
    from postgres_etl_pipeline_spark.queries import spread, t

    docs = spread(t(spark, sf_small, "documents"))
    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.jaccard_pairs(docs, threshold=0.5).collect()
    }
    pref = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.prefix_filter_pairs(docs, threshold=0.5).collect()
    }
    assert pref == full and len(full) > 0

    # and the candidate-generation index is genuinely smaller: the prefix
    # keeps floor((1-t)|S|)+1 of each doc's shingles
    sh = D.hashed_shingle_rows(docs)
    n_full = sh.count()
    n_prefix = (
        sh.groupBy("doc_id")
        .agg(F.first("set_size").alias("sz"))
        .select((F.floor(0.5 * F.col("sz")) + 1).alias("p"))
        .agg(F.sum("p"))
        .collect()[0][0]
    )
    assert n_prefix < n_full * 0.6


def test_prefix_filter_ieee_boundary_regression(spark):
    """r06 review finding: floor((1-0.8)*5) evaluates to floor(0.9999...8)
    = 0 in IEEE doubles, which silently shortened the prefix to 1 for
    every |S| divisible by 5 at t=0.8 and broke the recall-1 theorem.

    Concrete killer pair: doc A with exactly 5 distinct shingles, one of
    which is globally unique (A's rarest → its entire too-short prefix);
    doc B = A minus that unique shingle (4 shingles, all shared,
    Jaccard = 4/5 = 0.8 ≥ t). With the buggy 1-element prefix the pair is
    never generated; the corrected bound (slack before floor) must find
    it."""
    from postgres_etl_pipeline_spark.operators.dedup import (
        jaccard_pairs,
        prefix_filter_pairs,
    )

    a = "u1 u2 u3 s1 s2 s3 s4"        # shingles: (u1 u2 u3) + 4 shared
    b = "u2 u3 s1 s2 s3 s4"           # shingles: the 4 shared + (u2 u3 s1)
    # adjust: b's first shingle (u2 u3 s1) is also in a (positions 2-4),
    # so both docs have 5 and 4 distinct shingles respectively with 4 shared
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    full = {
        (r.doc_a, r.doc_b) for r in jaccard_pairs(df, threshold=0.8).collect()
    }
    pref = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_pairs(df, threshold=0.8).collect()
    }
    assert (1, 2) in full
    assert pref == full


def test_containment_pairs_fragment_vs_jaccard(spark):
    """A fragment wholly quoted inside a much longer doc: containment
    from the fragment side is 1.0 (every fragment shingle appears in the
    host) while Jaccard is far below any useful threshold — the case the
    asymmetric measure exists for. Directionality: the host→fragment
    orientation is NOT above threshold."""
    from postgres_etl_pipeline_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    frag = "alpha beta gamma delta epsilon"          # 3 shingles
    host = frag + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, frag), (2, host)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(df, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}
    assert jaccard_pairs(df, threshold=0.5).count() == 0


def test_containment_pairs_size_bound_is_safe(spark):
    """The |B| ≥ t·|A| candidate prune must never drop a true pair at an
    exact-integer boundary: equal-size docs sharing exactly t·|A|
    shingles sit ON the bound (size_b == t*size_a) and must survive."""
    from postgres_etl_pipeline_spark.operators.dedup import containment_pairs

    # 5 shingles each (7 tokens), sharing exactly 4 → containment 0.8
    a = "u1 u2 u3 s1 s2 s3 s4"
    b = "v1 u2 u3 s1 s2 s3 s4"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(df, threshold=0.8).collect()
    }
    assert got == {(1, 2): 0.8, (2, 1): 0.8}
