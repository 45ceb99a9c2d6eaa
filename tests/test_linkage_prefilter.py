"""Soundness of the pre-levenshtein candidate filters in
blocked_fuzzy_pairs (length gap, char-histogram L1, pigeonhole segment
containment): against an adversarial corpus of planted random edits —
edits concentrated at string heads/tails, indel runs, short strings
(len < t+1 ⇒ empty segments), histogram-preserving transpositions —
the blocked output must equal the brute-force within-block spec
exactly, for the default threshold AND threshold=3 (which flips
W = max(t, 2) onto the t path and grows the segment count)."""

from __future__ import annotations

import random

import pytest

from merl_etl_spark.operators.linkage import blocked_fuzzy_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _mutate(rng: random.Random, s: str, n_edits: int) -> str:
    chars = list(s)
    for _ in range(n_edits):
        op = rng.choice("sid")
        if op == "s" and chars:
            i = rng.randrange(len(chars))
            chars[i] = rng.choice("abcdxyz ")
        elif op == "i":
            i = rng.randrange(len(chars) + 1)
            chars.insert(i, rng.choice("abcdxyz "))
        elif chars:
            del chars[rng.randrange(len(chars))]
    return "".join(chars)


def _corpus(rng: random.Random) -> list[tuple[int, str, str]]:
    words = ["almond", "azure", "beige", "coral", "dim", "drab", "khaki"]
    rows, key = [], 0
    for block in ("B1", "B2"):
        bases = [
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 4)))
            for _ in range(6)
        ]
        bases += ["", "a", "ab"]  # len < t+1 ⇒ empty pigeonhole segments
        for base in bases:
            rows.append((key, base, block)); key += 1
            for n_edits in (1, 2, 3, 4):
                rows.append((key, _mutate(rng, base, n_edits), block)); key += 1
        # histogram-adversarial: transpositions keep every bucket count
        # identical, so only the segment filter / levenshtein can reject
        long = "the quick brown fox jumps"
        rows.append((key, long, block)); key += 1
        rows.append((key, long[2] + long[1] + long[0] + long[3:], block)); key += 1
    return rows


@pytest.mark.parametrize("threshold", [2, 3])
def test_blocked_pairs_equal_brute_force(spark, threshold):
    rng = random.Random(20260814 + threshold)
    rows = _corpus(rng)
    df = spark.createDataFrame(rows, "k long, name string, blk string")
    got = {
        (r.key_a, r.key_b, r.edit_dist)
        for r in blocked_fuzzy_pairs(df, "k", "name", "blk", threshold).collect()
    }
    want = {
        (ka, kb, _lev(na, nb))
        for ka, na, ba in rows
        for kb, nb, bb in rows
        if ka < kb and ba == bb and _lev(na, nb) <= threshold
    }
    assert got == want
