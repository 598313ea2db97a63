"""Property-based tests (hypothesis) for the algorithmic kernels.

These run the *logic* (mirrored in plain Python) against generated
inputs, plus a Spark spot-check — the full Spark round-trip per example
would be minutes per case.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from iris_project_database_refresh_spark.operators.dedup import AB, P, SHINGLE

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _md5_int32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _shingle_hashes(tokens: list[str]) -> set[int]:
    th = [_md5_int32(t) for t in tokens]
    if len(th) < SHINGLE:
        return {th[0] if th else 0}
    return {
        ((th[i] * 31 + th[i + 1]) * 31 + th[i + 2]) % 4294967296
        for i in range(len(th) - SHINGLE + 1)
    }


def _minhash_sig(hashes: set[int]) -> list[int]:
    return [min((a * x + b) % P for x in hashes) for a, b in AB]


def test_minhash_estimates_jaccard():
    """Signature agreement rate approximates true Jaccard *on average*.

    The production permutations (AB) are fixed, so for any tight
    per-example bound there exists an adversarial input pair that breaks
    it — the estimator's guarantee is statistical, not per-pair. Assert
    the mean absolute deviation over a seeded corpus of pairs is within
    what 16 permutations promise (σ ≈ sqrt(j(1-j)/16) ≤ 0.125, so mean
    |est−j| ≈ 0.1), plus a generous per-pair sanity ceiling.
    """
    import random

    rng = random.Random(20260813)
    devs = []
    for _ in range(300):
        n1 = rng.randint(3, 60)
        n2 = rng.randint(3, 60)
        t1 = [rng.choice(WORDS) for _ in range(n1)]
        # overlap: splice a prefix of t1 into t2 with random probability
        keep = rng.random()
        t2 = [
            t1[i % n1] if rng.random() < keep else rng.choice(WORDS)
            for i in range(n2)
        ]
        h1, h2 = _shingle_hashes(t1), _shingle_hashes(t2)
        true_j = len(h1 & h2) / len(h1 | h2)
        s1, s2 = _minhash_sig(h1), _minhash_sig(h2)
        est = sum(a == b for a, b in zip(s1, s2)) / len(AB)
        devs.append(abs(est - true_j))
    devs.sort()
    assert sum(devs) / len(devs) <= 0.15
    assert devs[int(0.95 * len(devs))] <= 0.40


@given(st.lists(st.sampled_from(WORDS), min_size=3, max_size=60))
@settings(max_examples=200, deadline=None)
def test_identical_docs_have_identical_signatures(tokens):
    h = _shingle_hashes(tokens)
    assert _minhash_sig(h) == _minhash_sig(set(h))


@given(st.lists(st.sampled_from(WORDS), min_size=1, max_size=80), st.integers(2, 16))
@settings(max_examples=200, deadline=None)
def test_chunking_covers_and_preserves(tokens, size):
    """Fixed-window chunking: concatenation of chunks == original doc."""
    chunks = [tokens[i : i + size] for i in range(0, len(tokens), size)]
    assert sum(len(c) for c in chunks) == len(tokens)
    flat = [t for c in chunks for t in c]
    assert flat == tokens
    assert all(1 <= len(c) <= size for c in chunks)


# --- breakpoint chunker invariants (mirrors operators/sectioning.py) ---------

import re

from iris_project_database_refresh_spark.operators.sectioning import (
    HARD_MAX_CHUNK,
    MAX_CHUNK,
    MIN_CHUNK,
    PACK_ITERS,
    TARGET_CHUNK,
)


def _pack_bounds(toks: list[str]) -> list[int]:
    """Plain-Python mirror of the chunk_breakpoints bounded fold."""
    n = len(toks)
    zs = [i + 1 for i, t in enumerate(toks) if t == "<!--"]  # 1-based starts

    def forbidden(b: int) -> bool:
        return any(z <= b <= z + 2 for z in zs)

    breaks = []
    for b in range(1, n):  # break after token b (1-based)
        cur, nxt = toks[b - 1], toks[b]
        if nxt.startswith("#"):
            p = 1
        elif re.search(r"[.!?]$", cur) and re.match(r"^[A-Z]", nxt):
            p = 3
        elif re.search(r"[,;]$", cur):
            p = 5
        elif nxt == "<!--":
            p = 9
        else:
            continue
        if not forbidden(b):
            breaks.append((p, b))

    bounds = [0]
    for _ in range(PACK_ITERS):
        pos = bounds[-1]
        if pos >= n:
            break
        if n - pos <= MAX_CHUNK:
            bounds.append(n)
            continue
        cands = [
            (p, abs(b - pos - TARGET_CHUNK), b)
            for p, b in breaks
            if pos + MIN_CHUNK <= b <= pos + HARD_MAX_CHUNK
        ]
        bounds.append(min(cands)[2] if cands else min(pos + HARD_MAX_CHUNK, n))
    return bounds


_token = st.one_of(
    st.sampled_from(WORDS),
    st.sampled_from([w + s for w in WORDS for s in (".", ",", ";", "!")]),
    st.sampled_from([w.capitalize() for w in WORDS]),
    st.sampled_from(["#", "##", "###"]),
)
_piece = st.one_of(
    st.lists(_token, min_size=1, max_size=6),
    st.just(["<!--", "PageNumber", "3", "-->"]),
)


@given(st.lists(_piece, min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_breakpoint_chunker_invariants(pieces):
    """Full coverage, size bounds, and no non-fallback break inside a
    protected zone — the stage_03 contract."""
    toks = [t for p in pieces for t in p]
    n = len(toks)
    bounds = _pack_bounds(toks)

    assert bounds[0] == 0 and bounds[-1] == n  # full coverage
    assert all(b2 > b1 for b1, b2 in zip(bounds, bounds[1:]))  # monotone

    zs = [i + 1 for i, t in enumerate(toks) if t == "<!--"]
    for prev, b in zip(bounds, bounds[1:]):
        size = b - prev
        assert size <= HARD_MAX_CHUNK or b == n and size <= MAX_CHUNK
        if b != n:
            assert size >= MIN_CHUNK
            # a mid-zone boundary only ever comes from the hard fallback
            in_zone = any(z <= b <= z + 2 for z in zs)
            assert not in_zone or size == HARD_MAX_CHUNK


# --- merge-small sectioning invariants (mirrors operators/sectioning.py) -----

from iris_project_database_refresh_spark.operators.sectioning import MIN_EST_TOKENS


def _merge_groups(levels: list[int], est: list[int]) -> list[list[int]]:
    """Plain-Python mirror of the prefix-sum merge grouping."""
    groups: list[list[int]] = []
    for i, (lv, e) in enumerate(zip(levels, est)):
        merge = (
            e < MIN_EST_TOKENS
            and i > 0
            and lv >= levels[i - 1]
        )
        if merge and groups:
            groups[-1].append(i)
        else:
            groups.append([i])
    return groups


@given(
    st.lists(st.tuples(st.integers(1, 3), st.integers(0, 120)), min_size=1, max_size=20)
)
@settings(max_examples=200, deadline=None)
def test_merge_small_invariants(secs):
    """Every section lands in exactly one group; groups are contiguous;
    a group's head is either large enough or blocked from merging by a
    shallower predecessor."""
    levels = [lv for lv, _ in secs]
    est = [e for _, e in secs]
    groups = _merge_groups(levels, est)

    flat = [i for g in groups for i in g]
    assert flat == list(range(len(secs)))  # partition, order-preserving

    for g in groups:
        head = g[0]
        # head didn't merge backwards: first section, large, or level drop
        assert head == 0 or est[head] >= MIN_EST_TOKENS or levels[head] < levels[head - 1]
        # every non-head member merged legally
        for i in g[1:]:
            assert est[i] < MIN_EST_TOKENS and levels[i] >= levels[i - 1]


# --- interval-union coverage (mirrors dedup_substring_stats) -----------------

from iris_project_database_refresh_spark.operators.dedup import SPAN


def _coverage(positions: list[int]) -> int:
    """Plain-Python mirror of the running-max interval-union window."""
    covered = 0
    prev_end = 0
    for p in sorted(positions):
        end = p + SPAN - 1
        covered += max(0, end - max(p - 1, prev_end))
        prev_end = max(prev_end, end)
    return covered


@given(st.lists(st.integers(1, 200), min_size=0, max_size=60))
@settings(max_examples=300, deadline=None)
def test_interval_union_coverage(positions):
    """The window formula must equal the brute-force union size of the
    [p, p+SPAN-1] intervals."""
    brute = len({j for p in positions for j in range(p, p + SPAN)})
    assert _coverage(positions) == brute
