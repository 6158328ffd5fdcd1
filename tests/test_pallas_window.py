"""Conformance: the per-lane window-DP pallas kernel (interpret mode)
must match window_dp_summary / device._valley_keys exactly in all three
modes (valley / trace / interval)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from barbell_tpu.ops import oracle  # noqa: E402
from barbell_tpu.ops.composite import _valley_keys  # noqa: E402
from barbell_tpu.ops.device import (  # noqa: E402
    UNIT,
    flank_ends,
    window_dp_summary,
)
from barbell_tpu.ops.pallas_window import (  # noqa: E402
    VTOPK,
    window_interval,
    window_trace,
    window_valleys,
)

BASES = np.array([1, 2, 4, 8], dtype=np.uint8)


def _cases(rng, H, m, W, plant_same=True):
    pats = np.zeros((H, m), dtype=np.uint8)
    wins = np.zeros((H, W), dtype=np.uint8)
    w_len = rng.integers(m, W + 1, H).astype(np.int32)
    for h in range(H):
        pats[h] = BASES[rng.integers(0, 4, m)]
        content = BASES[rng.integers(0, 4, int(w_len[h]))]
        pos = int(rng.integers(0, max(1, int(w_len[h]) - m)))
        src = pats[h] if plant_same else BASES[rng.integers(0, 4, m)]
        noisy = src.copy()
        if m > 4:
            noisy[rng.integers(0, m)] = BASES[rng.integers(0, 4)]
        content[pos : pos + m] = noisy[: min(m, int(w_len[h]) - pos)]
        wins[h, : w_len[h]] = content
    return pats, wins, w_len


def test_window_trace_matches_summary():
    rng = np.random.default_rng(21)
    H, m, W = 12, 11, 26
    pats, wins, w_len = _cases(rng, H, m, W)
    ledge = (rng.integers(0, 2, H) != 0)
    rpos = np.where(rng.integers(0, 2, H) != 0, w_len, -1).astype(np.int32)
    alpha = np.int32(oracle.scale_alpha(0.4))
    ra, rb = np.int32(2), np.int32(m - 3)

    # jnp reference: per-lane pattern via Hp = H
    summ = window_dp_summary(
        jnp.asarray(pats[:, None, :]), jnp.asarray(wins), jnp.asarray(ledge),
        jnp.asarray(rpos), alpha, ra, rb, jnp.int32(0), jnp.int32(0),
        with_region=True, with_start=True,
    )
    end_j = w_len  # capture at the window length

    def at_end(arr):
        return np.asarray(
            jnp.take_along_axis(arr[:, 0, :], jnp.asarray(end_j)[:, None], 1)
        )[:, 0]

    ts, rlo, rhi = window_trace(
        jnp.asarray(pats), jnp.asarray(wins), jnp.asarray(end_j),
        jnp.asarray(ledge), jnp.asarray(rpos), alpha, ra, rb, interpret=True,
    )
    assert np.array_equal(np.asarray(ts), at_end(summ.text_start))
    assert np.array_equal(np.asarray(rlo), at_end(summ.region_lo))
    assert np.array_equal(np.asarray(rhi), at_end(summ.region_hi))


def test_window_interval_matches_summary():
    rng = np.random.default_rng(22)
    H, m, W = 10, 13, 30
    pats, wins, w_len = _cases(rng, H, m, W)
    iv_a, iv_b = np.int32(3), np.int32(m - 2)
    end_j = (w_len - rng.integers(0, 3, H)).clip(0).astype(np.int32)

    summ = window_dp_summary(
        jnp.asarray(pats[:, None, :]), jnp.asarray(wins),
        jnp.zeros(H, dtype=bool), jnp.full(H, -1, jnp.int32),
        jnp.int32(UNIT), jnp.int32(0), jnp.int32(-1), iv_a, iv_b,
        with_interval=True,
    )

    def at_end(arr):
        return np.asarray(
            jnp.take_along_axis(
                arr[:, 0, :].astype(jnp.int32),
                jnp.asarray(end_j)[:, None], 1,
            )
        )[:, 0]

    out = np.asarray(
        window_interval(
            jnp.asarray(pats), jnp.asarray(wins), jnp.asarray(end_j),
            iv_a, iv_b, interpret=True,
        )
    )
    assert np.array_equal(out[:, 0], at_end(summ.iv_pj))
    assert np.array_equal(out[:, 1], at_end(summ.iv_ej))
    assert np.array_equal(out[:, 2], at_end(summ.iv_pi))
    assert np.array_equal(out[:, 3], at_end(summ.iv_ei))
    assert np.array_equal(out[:, 4], at_end(summ.iv_cost))
    assert np.array_equal(out[:, 5], at_end(summ.has_interval))


def test_window_valleys_matches_valley_keys():
    rng = np.random.default_rng(23)
    H, m, W = 14, 9, 40
    pats, wins, w_len = _cases(rng, H, m, W)
    ledge = (rng.integers(0, 2, H) != 0)
    rpos = np.where(rng.integers(0, 2, H) != 0, w_len, -1).astype(np.int32)
    alpha = np.int32(oracle.scale_alpha(0.4))
    k_scaled = np.int32(oracle.scale_k(4))
    emit_lo = rng.integers(0, 3, H).astype(np.int32)
    emit_hi = (w_len - rng.integers(0, 2, H)).astype(np.int32)
    klmul = W + 2

    # jnp reference: flank_ends row conventions — start_col is the
    # row's text start (0) when left_edge, else -1; end_col is the text
    # end when rpos is active, else out of range.
    start_col = np.where(ledge, 0, -1).astype(np.int32)
    end_col = np.where(rpos >= 0, rpos, W + 2).astype(np.int32)
    ends = flank_ends(
        jnp.asarray(pats[0]),  # per-lane patterns unsupported here —
        jnp.asarray(wins),     # use one shared pattern for the check
        jnp.asarray(start_col),
        jnp.asarray(end_col),
        alpha,
    )
    key_want, cnt_want = _valley_keys(
        ends, jnp.asarray(emit_lo), jnp.asarray(emit_hi), k_scaled, klmul
    )
    key_want = np.sort(np.asarray(key_want), axis=1)
    cnt_want = np.asarray(cnt_want)

    shared = np.broadcast_to(pats[0], (H, m)).copy()
    keys, cnt = window_valleys(
        jnp.asarray(shared), jnp.asarray(wins), jnp.asarray(w_len),
        jnp.asarray(ledge), jnp.asarray(rpos), jnp.asarray(emit_lo),
        jnp.asarray(emit_hi), alpha, k_scaled, klmul, interpret=True,
    )
    keys, cnt = np.asarray(keys), np.asarray(cnt)
    assert np.array_equal(cnt, cnt_want)
    for h in range(H):
        want = key_want[h][key_want[h] < 2**30]
        got = keys[h][keys[h] < 2**30]
        assert np.array_equal(got, want[: len(got)]), h
        assert len(got) == min(len(want), VTOPK), h
