"""Fused jitted composites for the demux pipeline.

Under a tunneled/remote TPU every device call AND every fetched output
array costs a ~30-50ms round trip, so the pipeline is organized as
exactly three fused calls per group and batch — covering BOTH strands —
each returning ONE packed int32 array; the padded read-row buffer stays
device-resident between calls:

1. :func:`flank_scan` — synthesize rc rows on device, run the flank
   end-cost scan over all rows, extract top-K valleys.  Returns the
   assembled row buffer (kept on device) + packed hits.
2. :func:`flank_trace` — gather per-hit windows from the row buffer,
   window DP + traceback; packed flank start / mask-region spans.
3. :func:`barcode_rank` — gather barcode windows, run the fwd+rc
   pattern stacks, per-pattern best valley, candidate fallback,
   traceback + Lodhi, min-score selection; packed per-hit records.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .device import (
    BIG,
    UNIT,
    best_valley_per_pattern,
    find_hits,
    flank_ends,
    traceback_reduce,
    window_dp,
)

# 16-entry nibble complement (A<->T, C<->G bit reversal).
_MASK_COMP = jnp.array(
    [0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15], dtype=jnp.uint8
)


def _rc_rows(rows, lens):
    """Reverse-complement each row's first `lens` bases, left-aligned."""
    S, L = rows.shape
    jpos = jnp.arange(L, dtype=jnp.int32)
    src = lens[:, None] - 1 - jpos[None, :]
    valid = src >= 0
    gathered = jnp.take_along_axis(rows, jnp.maximum(src, 0).astype(jnp.int32), axis=1)
    comp = jnp.take(_MASK_COMP, gathered.astype(jnp.int32))
    return jnp.where(valid, comp, 0).astype(jnp.uint8)


class FlankScanOut(NamedTuple):
    rows: jnp.ndarray  # [R_total, L] assembled (host rows + rc simple rows)
    packed: jnp.ndarray  # [R_total, 2K+1] int32: K pos | K cost | count


@functools.partial(jax.jit, static_argnames=("K",))
def flank_scan(
    pattern,
    host_rows,  # [R_host, L] fwd simple rows + fwd/rc chunk rows
    simple_idx,  # [S] indices into host_rows of fwd simple reads
    simple_lens,  # [S]
    end_col,  # [R_total]
    is_first,  # [R_total]
    lo,
    hi,
    k_scaled,
    alpha_scaled,
    K: int,
) -> FlankScanOut:
    rc_simple = _rc_rows(host_rows[simple_idx], simple_lens)
    rows = jnp.concatenate([host_rows, rc_simple], axis=0)
    ends = flank_ends(pattern, rows, end_col, is_first, alpha_scaled)
    hits = find_hits(ends, lo, hi, k_scaled, K)
    packed = jnp.concatenate(
        [
            hits.pos,
            jnp.where(hits.valid, hits.cost, BIG),
            hits.count[:, None],
        ],
        axis=1,
    ).astype(jnp.int32)
    return FlankScanOut(rows=rows, packed=packed)


def unpack_flank_scan(packed, K: int):
    """host-side: (pos [R,K], cost [R,K], valid [R,K], count [R])."""
    pos = packed[:, :K]
    cost = packed[:, K : 2 * K]
    count = packed[:, 2 * K]
    return pos, cost, cost < int(BIG), count


def _gather_windows(rows, row_idx, starts, W: int):
    """windows[h] = rows[row_idx[h], starts[h] : starts[h]+W].

    Column indices are clamped to the row; callers zero out anything
    past their window length, so clamped duplicates are never read."""
    L = rows.shape[1]
    jpos = jnp.arange(W, dtype=jnp.int32)
    cols = jnp.minimum(starts[:, None] + jpos[None, :], L - 1)
    return jnp.take_along_axis(rows[row_idx], cols, axis=1)


@functools.partial(jax.jit, static_argnames=("m", "W"))
def flank_trace(
    pattern,  # [m]
    rows,  # [R_total, L] device-resident
    row_idx,  # [H]
    win_start,  # [H] window start within row
    left_edge,  # [H]
    right_pos,  # [H]
    end_j,  # [H] = window length
    valid,  # [H]
    region_a,
    region_b,
    alpha_scaled,
    m: int,
    W: int,
):
    """Packed [H, 4] int32: text_start, region_lo, region_hi, has_region."""
    windows = _gather_windows(rows, row_idx, win_start, W)
    jpos = jnp.arange(W, dtype=jnp.int32)
    windows = jnp.where(jpos[None, :] < end_j[:, None], windows, 0)
    wdp = window_dp(pattern[None, :], windows, left_edge, right_pos, alpha_scaled)
    tr = traceback_reduce(
        wdp.moves,
        end_j[:, None],
        valid[:, None],
        region_a,
        region_b,
        jnp.int32(0),
        jnp.int32(0),
        m=m,
        W=W,
    )
    return jnp.stack(
        [
            tr.text_start[:, 0],
            tr.region_lo[:, 0],
            tr.region_hi[:, 0],
            tr.has_region[:, 0].astype(jnp.int32),
        ],
        axis=1,
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("m", "W"))
def barcode_rank(
    patterns,  # [2P, m] fwd stack then rc stack
    rows,  # [R_total, L]
    row_idx,  # [H]
    win_start,  # [H]
    w_len,  # [H]
    strand_sel,  # [H] 0 = fwd half, 1 = rc half
    hvalid,  # [H]
    k1_scaled,
    iv_a,
    iv_b,
    perfect,  # f32 scalar
    min_score,
    min_score_diff,
    m: int,
    W: int,
):
    """Packed [H, 8] int32: top_idx (within half), accepted,
    read_bar_start, read_bar_end, bar_start, bar_end, bar_cost,
    has_interval."""
    P2 = patterns.shape[0]
    P = P2 // 2
    windows = _gather_windows(rows, row_idx, win_start, W)
    jpos = jnp.arange(W, dtype=jnp.int32)
    windows = jnp.where(jpos[None, :] < w_len[:, None], windows, 0)

    H = windows.shape[0]
    no_edge = jnp.zeros(H, dtype=bool)
    no_right = jnp.full(H, -1, dtype=jnp.int32)
    bdp = window_dp(patterns, windows, no_edge, no_right, jnp.int32(UNIT))
    best = best_valley_per_pattern(bdp.ends, w_len)

    half = (jnp.arange(P2, dtype=jnp.int32)[None, :] // P) == strand_sel[:, None]
    in_k1 = half & (best.cost <= k1_scaled)
    matched = in_k1.sum(axis=1)
    use_all = matched <= 1
    cand = jnp.where(use_all[:, None], half, in_k1) & hvalid[:, None]

    tr = traceback_reduce(
        bdp.moves,
        best.pos,
        cand,
        jnp.int32(0),
        jnp.int32(-1),
        iv_a,
        iv_b,
        m=m,
        W=W,
    )

    scores = jnp.where(cand, tr.lodhi / perfect, -jnp.inf)
    top = jnp.argmax(scores, axis=1).astype(jnp.int32)
    top_norm = jnp.take_along_axis(scores, top[:, None], axis=1)[:, 0]
    rest = jnp.where(jnp.arange(P2)[None, :] == top[:, None], -jnp.inf, scores)
    second_norm = jnp.max(rest, axis=1)
    n_cand = cand.sum(axis=1)

    accepted = (top_norm >= min_score) & (
        (n_cand <= 1) | ((top_norm - second_norm) >= min_score_diff)
    )
    accepted = accepted & hvalid & (n_cand > 0)

    def pick(arr):
        return jnp.take_along_axis(arr, top[:, None], axis=1)[:, 0]

    return jnp.stack(
        [
            top % P,
            accepted.astype(jnp.int32),
            pick(tr.iv_pj),
            pick(tr.iv_ej) + 1,
            pick(tr.iv_pi),
            pick(tr.iv_ei) + 1,
            pick(tr.iv_cost),
            pick(tr.has_interval.astype(jnp.int32)),
        ],
        axis=1,
    ).astype(jnp.int32)
