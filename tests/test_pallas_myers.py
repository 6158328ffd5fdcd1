"""Pallas Myers kernel conformance (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from barbell_tpu.ops import oracle  # noqa: E402
from barbell_tpu.ops.pallas_myers import myers_valleys, pattern_words  # noqa: E402

BASES = np.array([1, 2, 4, 8], dtype=np.uint8)


def expected_valley_map(pattern, row, emit_lo, emit_hi, k_units, L):
    """Oracle: unit-cost ends + plateau-valley rule, bounded emission."""
    C = oracle.dp_table(pattern, row)  # unit costs, scaled
    ends = oracle.end_costs(C) // oracle.COST_SCALE
    out = np.full(L, 255, dtype=np.uint8)
    n = len(row)
    for j in range(min(n + 1, L)):  # kernel decides positions 0..L-1
        if j > n:
            continue
        e = ends[j]
        if e > k_units:
            continue
        prv = ends[j - 1] if j > 0 else 1 << 20
        nxt = ends[j + 1] if j < n else None
        if nxt is None:
            continue  # kernel never decides position == row length L here
        if e <= prv and e < nxt and emit_lo <= j <= emit_hi:
            out[j] = e
    return out


def test_pattern_words():
    pat = np.array([1, 2, 4, 8, 15], dtype=np.uint8)  # A C G T N
    words, W, top_bit = pattern_words(pat)
    assert W == 1
    assert top_bit == 4
    assert words[0, 0] == 0b10001  # A membership: pos 0 and N pos 4
    assert words[1, 0] == 0b10010
    assert words[2, 0] == 0b10100
    assert words[3, 0] == 0b11000


@pytest.mark.parametrize("m", [7, 32, 45, 90])
def test_myers_matches_oracle(m):
    rng = np.random.default_rng(m)
    R, L = 1024, 256
    pattern = BASES[rng.integers(0, 4, m)]
    rows = np.zeros((R, L), dtype=np.uint8)
    # only test a few active lanes (interpret mode is slow)
    active = [0, 1, 511, 1023]
    for r in active:
        rows[r] = BASES[rng.integers(0, 4, L)]
        # plant noisy pattern copies
        for pos in (13, 100, 180):
            seg = pattern[: min(m, L - pos)].copy()
            if len(seg) > 4:
                seg[rng.integers(0, len(seg))] = BASES[rng.integers(0, 4)]
            rows[r, pos : pos + len(seg)] = seg

    k_units = max(3, m // 4)
    emit_lo = np.full(R, 1, dtype=np.int32)
    emit_hi = np.full(R, L - 2, dtype=np.int32)

    got = np.asarray(
        myers_valleys(
            pattern,
            jnp.asarray(rows),
            jnp.asarray(emit_lo),
            jnp.asarray(emit_hi),
            jnp.int32(k_units),
            CL=128,
            interpret=True,
        )
    )
    for r in active:
        want = expected_valley_map(pattern, rows[r], 1, L - 2, k_units, L)
        assert np.array_equal(got[r], want), (m, r, np.nonzero(got[r] != want))


def test_myers_emit_bounds():
    rng = np.random.default_rng(5)
    R, L = 1024, 128
    m = 10
    pattern = BASES[rng.integers(0, 4, m)]
    rows = np.zeros((R, L), dtype=np.uint8)
    rows[0] = BASES[rng.integers(0, 4, L)]
    rows[0, 40 : 40 + m] = pattern  # exact hit ending at 50
    emit_lo = np.full(R, 60, dtype=np.int32)  # excludes the hit
    emit_hi = np.full(R, 120, dtype=np.int32)
    got = np.asarray(
        myers_valleys(
            pattern,
            jnp.asarray(rows),
            jnp.asarray(emit_lo),
            jnp.asarray(emit_hi),
            jnp.int32(2),
            CL=64,
            interpret=True,
        )
    )
    assert (got[0, :60] == 255).all()


def test_myers_topk_matches_map():
    """topk mode (in-kernel key selection) must equal the valley map +
    explicit key construction, including counts."""
    from barbell_tpu.ops.pallas_myers import (
        TOPK,
        myers_topk_from_words,
        myers_valleys_from_words,
    )

    rng = np.random.default_rng(9)
    R, L, m = 1024, 256, 17
    pattern = BASES[rng.integers(0, 4, m)]
    rows = np.zeros((R, L), dtype=np.uint8)
    active = [0, 2, 300, 1023]
    for r in active:
        rows[r] = BASES[rng.integers(0, 4, L)]
        for pos in (5, 60, 61 + m, 200):
            seg = pattern[: min(m, L - pos)].copy()
            if len(seg) > 3:
                seg[rng.integers(0, len(seg))] = BASES[rng.integers(0, 4)]
            rows[r, pos : pos + len(seg)] = seg
    k_units = 6
    emit_lo = np.full(R, 1, dtype=np.int32)
    emit_hi = np.full(R, L - 2, dtype=np.int32)
    patw, W, top_bit = pattern_words(pattern)
    klmul = 1000

    vmap = np.asarray(
        myers_valleys_from_words(
            jnp.asarray(patw), W, top_bit, m, jnp.asarray(rows),
            jnp.asarray(emit_lo), jnp.asarray(emit_hi), jnp.int32(k_units),
            CL=128, interpret=True,
        )
    )
    keys, cnt = myers_topk_from_words(
        jnp.asarray(patw), W, top_bit, m, jnp.asarray(rows),
        jnp.asarray(emit_lo), jnp.asarray(emit_hi), jnp.int32(k_units),
        klmul, CL=128, interpret=True,
    )
    keys, cnt = np.asarray(keys), np.asarray(cnt)

    for r in active + [1]:  # 1 = empty lane
        pos = np.nonzero(vmap[r] < 255)[0]
        want_keys = np.sort(vmap[r][pos].astype(np.int64) * klmul + pos)
        assert cnt[r] == len(pos), r
        got = keys[r][keys[r] < 2**30]
        assert np.array_equal(got, want_keys[: len(got)]), r
        assert len(got) == min(len(want_keys), TOPK), r
