"""Conformance: the fused pallas barcode-rank pass-1 kernel (interpret
mode on CPU) must reproduce the jnp path exactly — best valley cost and
position per (window, pattern), and the Lodhi score at that position."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from barbell_tpu.ops.device import (  # noqa: E402
    UNIT,
    best_valley_per_pattern,
    window_dp_summary,
)
from barbell_tpu.ops.pallas_rank import rank_pass1  # noqa: E402

BASES = np.array([1, 2, 4, 8], dtype=np.uint8)


@pytest.mark.parametrize(
    "H,P,m,W",
    [(10, 12, 9, 21), (5, 3, 14, 40), (130, 17, 20, 33), (2, 8, 9, 9)],
)
def test_rank_pass1_matches_jnp(H, P, m, W):
    rng = np.random.default_rng(H * 1000 + P)
    pats = BASES[rng.integers(0, 4, size=(P, m))]
    wins = np.zeros((H, W), dtype=np.uint8)
    wlen = rng.integers(m, W + 1, H).astype(np.int32)
    for h in range(H):
        content = BASES[rng.integers(0, 4, size=int(wlen[h]))]
        p = pats[rng.integers(0, P)]
        pos = int(rng.integers(0, max(1, int(wlen[h]) - m)))
        content[pos : pos + m] = p[: min(m, int(wlen[h]) - pos)]
        wins[h, : wlen[h]] = content

    key, lod = rank_pass1(
        jnp.asarray(pats), jnp.asarray(wins), jnp.asarray(wlen), interpret=True
    )
    key, lod = np.asarray(key), np.asarray(lod)

    no_edge = jnp.zeros(H, dtype=bool)
    no_right = jnp.full(H, -1, dtype=jnp.int32)
    summ = window_dp_summary(
        jnp.asarray(pats[None]),
        jnp.asarray(wins),
        no_edge,
        no_right,
        jnp.int32(UNIT),
        jnp.int32(0),
        jnp.int32(-1),
        jnp.int32(2),
        jnp.int32(min(7, m - 1)),
        with_lodhi=True,
    )
    best = best_valley_per_pattern(summ.ends, jnp.asarray(wlen))
    want_lod = np.asarray(
        jnp.take_along_axis(summ.lodhi, best.pos[:, :, None], axis=2)[:, :, 0]
    )
    assert np.array_equal(key // 256, np.asarray(best.cost))
    assert np.array_equal(key % 256, np.asarray(best.pos))
    np.testing.assert_allclose(lod, want_lod, rtol=1e-6, atol=1e-8)


def test_rank_pass1_split_matches_full():
    """Strand-split rank == full 2P rank restricted to each lane's own
    strand half (fwd lanes in the first H/2, rc lanes after)."""
    rng = np.random.default_rng(7)
    P, m, W = 12, 10, 24
    H = 512  # multiple of 256
    pats = BASES[rng.integers(0, 4, size=(2 * P, m))]
    wins = np.zeros((H, W), dtype=np.uint8)
    wlen = rng.integers(m, W + 1, H).astype(np.int32)
    for h in range(H):
        c = BASES[rng.integers(0, 4, size=int(wlen[h]))]
        src = pats[rng.integers(0, P) + (P if h >= H // 2 else 0)]
        pos = int(rng.integers(0, max(1, int(wlen[h]) - m)))
        c[pos : pos + m] = src[: min(m, int(wlen[h]) - pos)]
        wins[h, : wlen[h]] = c

    from barbell_tpu.ops.pallas_rank import rank_pass1, rank_pass1_split

    ks, ls = rank_pass1_split(
        jnp.asarray(pats), P, jnp.asarray(wins), jnp.asarray(wlen),
        interpret=True,
    )
    kf, lf = rank_pass1(
        jnp.asarray(pats), jnp.asarray(wins), jnp.asarray(wlen),
        interpret=True,
    )
    ks, ls, kf, lf = map(np.asarray, (ks, ls, kf, lf))
    half = H // 2
    assert np.array_equal(ks[:half], kf[:half, :P])
    assert np.array_equal(ks[half:], kf[half:, P:])
    assert np.array_equal(ls[:half], lf[:half, :P])
    assert np.array_equal(ls[half:], lf[half:, P:])
