"""edit_distance_pairs (Ed-Join) vs a brute-force DP reference, plus the
adversarial shapes the sf-oracle can't isolate: repeated-character strings
(distinct-gram starvation), zero-shared-gram short pairs (the vacuous-lemma
band), sub-q and empty documents, the short/long regime boundary, and the
non-ASCII projection contract."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from postgres_etl_pipeline_spark.operators.dedup import (
    ascii_projected,
    edit_distance_pairs,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def _lev(a: str, b: str) -> int:
    """Reference DP levenshtein over codepoints."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _proj(s: str) -> str:
    return "".join(c if ord(c) < 128 else "?" for c in s)


def _brute(texts: list[str], d: int) -> set[tuple[int, int, int]]:
    out = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            dist = _lev(_proj(texts[i]), _proj(texts[j]))
            if dist <= d:
                out.add((i, j, dist))
    return out


def _run(spark, texts: list[str], d: int) -> set[tuple[int, int, int]]:
    df = spark.createDataFrame(list(enumerate(texts)), DOC_SCHEMA)
    return {
        (r.doc_a, r.doc_b, r.edit_distance)
        for r in edit_distance_pairs(df, d=d).collect()
    }


def test_planted_edits_exact(spark):
    """Variants at known distances around the threshold resolve exactly."""
    base = "the quick brown fox jumps over the lazy dog " * 4
    texts = [
        base,
        base.replace("quick", "quack", 1),  # 2 substitutions
        base[:-6],  # 6 deletions
        "x" * 6 + base,  # 6 insertions
        base.replace("o", "0"),  # many substitutions, > d
        "a completely different document with no overlap at all",
    ]
    assert _run(spark, texts, d=8) == _brute(texts, d=8)


def test_repeated_char_strings(spark):
    """Heavy repetition collapses DISTINCT grams to ~1; the multiset
    prefix (occurrences, not values) must still find these pairs."""
    texts = ["a" * 120, "a" * 118, "a" * 60 + "b" + "a" * 59, "b" * 120]
    assert _run(spark, texts, d=4) == _brute(texts, d=4)


def test_short_band_zero_shared_grams(spark):
    """Two short strings with ZERO shared 3-grams but ed <= d — the pair
    the q-gram lemma can never certify; only the length-bucket branch
    finds it."""
    texts = ["abcdef", "ghijkl", "abcdeg"]
    got = _run(spark, texts, d=6)
    assert got == _brute(texts, d=6)
    assert (0, 1, 6) in got  # the zero-shared-gram pair itself


def test_sub_q_and_empty_docs(spark):
    """len < q docs emit no grams at all; they must still pair via the
    short band (including with each other and the empty string)."""
    texts = ["", "a", "ab", "xy", "abcdefgh"]
    assert _run(spark, texts, d=3) == _brute(texts, d=3)


def test_regime_boundary(spark):
    """Docs at exactly short_max = q*d + q - 1 chars and one past it:
    pairs straddling the boundary must come out of the prefix join."""
    d, q = 4, 3
    short_max = q * d + q - 1  # 14
    a = "abcdefghijklmn"  # 14 chars — short regime
    b = a + "o"  # 15 chars — long regime
    c = a[:-1] + "zo"  # 15 chars, 2 edits from b
    texts = [a, b, c]
    assert len(a) == short_max and len(b) == short_max + 1
    assert _run(spark, texts, d=d) == _brute(texts, d=d)


def test_projection_contract(spark):
    """Non-ASCII codepoints (incl. supplementary-plane emoji) each project
    to ONE '?' — distances are over the projection, and Spark's projected
    length matches Python's codepoint count."""
    texts = ["héllo wörld padding text here", "h?llo w?rld padding text here"]
    got = _run(spark, texts, d=2)
    assert got == _brute(texts, d=2)
    assert (0, 1, 0) in got  # identical after projection
    df = spark.createDataFrame([(0, "a😀b¢c")], DOC_SCHEMA)
    row = df.select(ascii_projected("text").alias("p")).head()
    assert row.p == "a?b?c"


def test_threshold_is_exclusive_above(spark):
    """Pairs at exactly d stay; at d+1 they drop (banded verify -1 path)."""
    texts = ["abcdefghij" * 4, "abcdefghij" * 4 + "xxx"]
    assert {p[2] for p in _run(spark, texts, d=3)} == {3}
    assert _run(spark, texts, d=2) == set()


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdef ", min_size=0, max_size=40),
        min_size=2,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_property_matches_dp(shared_spark, texts, d):
    """Randomized agreement with the DP reference over a small alphabet
    (small alphabets maximize accidental near-dups and gram collisions)."""
    assert _run(shared_spark, texts, d=d) == _brute(texts, d=d)


@pytest.fixture(scope="module")
def shared_spark(spark):
    return spark


def test_seeded_random_corpus(spark):
    """Medium randomized corpus: clone-with-edits structure like the
    testdata generator's near-dup planting."""
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = []
    for _ in range(30):
        texts.append(" ".join(rng.choice(words) for _ in range(rng.randint(3, 30))))
    for i in range(10):  # plant near-dups of the first ten
        t = list(texts[i])
        for _ in range(rng.randint(1, 10)):
            pos = rng.randrange(len(t))
            t[pos] = rng.choice("abcxyz ")
        texts.append("".join(t))
    assert _run(spark, texts, d=10) == _brute(texts, d=10)
