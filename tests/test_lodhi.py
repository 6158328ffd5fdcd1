import numpy as np
import pytest

from barbell_tpu.ops import oracle
from barbell_tpu.ops.lodhi import lodhi_from_columns, lodhi_from_ops, perfect_score


def brute_force(is_match, widths, k=3, lam=0.5):
    """Direct tuple-sum definition of the score."""
    n = len(is_match)
    total = 0.0
    idx = [i for i in range(n) if is_match[i]]
    from itertools import combinations

    for combo in combinations(idx, k):
        span = range(combo[0], combo[-1] + 1)
        total += lam ** sum(widths[c] for c in span)
    return total


def test_all_match_small():
    # L=3 all-match: single triple spanning all columns, weight lam^6.
    assert lodhi_from_columns(np.ones(3, bool), np.full(3, 2)) == pytest.approx(0.5**6)


def test_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    for _ in range(30):
        n = rng.integers(3, 20)
        is_match = rng.random(n) < 0.6
        widths = rng.integers(1, 3, n)
        got = lodhi_from_columns(is_match, widths)
        want = brute_force(is_match, widths)
        assert got == pytest.approx(want, rel=1e-12)


def test_perfect_is_maximal_and_normalizes_to_one():
    L = 44
    p = perfect_score(L)
    assert p > 0
    ops = np.zeros(L, dtype=np.int8)
    assert lodhi_from_ops(ops) == pytest.approx(p)


def test_substitutions_reduce_score():
    L = 30
    clean = np.zeros(L, dtype=np.int8)
    dirty = clean.copy()
    dirty[10] = oracle.OP_X
    dirty[20] = oracle.OP_X
    assert lodhi_from_ops(dirty) < lodhi_from_ops(clean)


def test_scattered_matches_score_near_zero():
    # alternating match / gap — no contiguous runs
    ops = np.tile(np.array([oracle.OP_M, oracle.OP_X], dtype=np.int8), 22)
    norm = lodhi_from_ops(ops) / perfect_score(44)
    assert norm < 0.05


def test_reversal_invariance():
    rng = np.random.default_rng(9)
    for _ in range(10):
        n = rng.integers(5, 25)
        is_match = rng.random(n) < 0.5
        widths = rng.integers(1, 3, n)
        a = lodhi_from_columns(is_match, widths)
        b = lodhi_from_columns(is_match[::-1], widths[::-1])
        assert a == pytest.approx(b, rel=1e-12)
