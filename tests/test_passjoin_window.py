"""Soundness of the multi-match-aware PassJoin probe windows
(linkage.blocked_fuzzy_pairs, r15 optimization).

The probe side now emits, per candidate partitioned length L and segment
index i, only start shifts in

    [max(-i, D-(t-i)), min(i, D+(t-i))],   D = len(probe) - L

instead of the full [-t, t] (PassJoin multi-match-aware substring
selection).  This test replicates the SQL segment arithmetic exactly
(CAST(L*i/nseg AS INT)+1 starts, truncating division) in pure Python and
checks EXHAUSTIVELY, over every within-threshold string pair of a binary
alphabet at t in {1, 2} plus a sampled sweep at t=3, that at least one
partitioned segment of `a` is still emitted as a probe key by `b` —
i.e. the narrowed window can never lose a qualifying pair.  The Spark
end-to-end equality is pinned separately by test_linkage_prefilter.
"""

from __future__ import annotations

import itertools
import random


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


def _segments(name: str, t: int) -> list[tuple[int, str]]:
    # replica of linkage._start/_slen: CAST(ln*i/nseg AS INT) + 1
    nseg, ln = t + 1, len(name)
    out = []
    for i in range(nseg):
        start = int(ln * i / nseg) + 1
        slen = int(ln * (i + 1) / nseg) - int(ln * i / nseg)
        out.append((i, name[start - 1 : start - 1 + slen]))
    return out


def _probe_keys(name: str, t: int) -> set[tuple[int, int, str]]:
    nseg, ln = t + 1, len(name)
    keys = set()
    for dL in range(-t, t + 1):
        L = ln + dL
        delta = -dL  # len(probe) - L
        for i in range(nseg):
            lo = max(-i, delta - (t - i))
            hi = min(i, delta + (t - i))
            for shift in range(lo, hi + 1):
                spos = int(L * i / nseg) + 1 + shift
                slen = int(L * (i + 1) / nseg) - int(L * i / nseg)
                if L >= nseg and slen > 0 and spos >= 1 and spos + slen - 1 <= ln:
                    keys.add((L, i, name[spos - 1 : spos - 1 + slen]))
    return keys


def _found(a: str, b: str, t: int) -> bool:
    pk = _probe_keys(b, t)
    return any((len(a), i, seg) in pk for i, seg in _segments(a, t))


def test_window_exhaustive_binary_alphabet():
    for t in (1, 2):
        strs = [
            "".join(p)
            for ln in range(t + 1, t + 7)
            for p in itertools.product("ab", repeat=ln)
        ]
        for a in strs:
            for b in strs:
                if _lev(a, b) <= t:
                    assert _found(a, b, t), (t, a, b)


def test_window_long_mutated_strings():
    rng = random.Random(20260818)
    words = ["almond", "antique", "aquamarine", "azure", "beige", "bisque"]
    for _ in range(1500):
        t = rng.choice((1, 2, 3))
        base = " ".join(rng.choice(words) for _ in range(rng.randint(2, 5)))
        chars = list(base)
        for _ in range(rng.randint(0, t)):
            op = rng.choice("sid")
            if op == "s" and chars:
                chars[rng.randrange(len(chars))] = rng.choice("abcxyz ")
            elif op == "i":
                chars.insert(rng.randrange(len(chars) + 1), rng.choice("abcxyz "))
            elif chars:
                del chars[rng.randrange(len(chars))]
        m = "".join(chars)
        if _lev(base, m) <= t and len(m) >= t + 1:
            assert _found(base, m, t), (t, base, m)
            assert _found(m, base, t), (t, m, base)


def test_window_never_wider_than_old_form():
    # the narrowed window must be a subset of the old [-t, t] emission
    for t in (1, 2, 3):
        for delta in range(-t, t + 1):
            for i in range(t + 1):
                lo = max(-i, delta - (t - i))
                hi = min(i, delta + (t - i))
                assert -t <= lo and hi <= t
