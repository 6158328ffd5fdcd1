"""Fused jitted composites for the demux pipeline.

Under a tunneled/remote TPU every device call AND every fetched output
array costs a ~30-50ms round trip, and HBM uploads run ~30MB/s, so the
pipeline is organized as three fused calls per group and batch, each
returning ONE packed int32 array, with the padded read-row buffer
staying device-resident between them:

1. :func:`flank_scan` — unpack nibble-packed host rows, synthesize rc
   rows by pure flip+bit-complement (rc content lands right-aligned; no
   gathers), run the flank scan, extract top-K valleys.  On TPU the
   scan body is the Pallas bit-parallel Myers kernel
   (:mod:`barbell_tpu.ops.pallas_myers`) for the unit-cost interior,
   merged with exact alpha-overhang boundary windows recomputed by the
   jnp row-scan at each read's start/end; on CPU it is the jnp row-scan
   over full rows.  Both produce identical valleys (tested).
2. :func:`flank_trace` — gather per-hit windows from the row buffer,
   window DP + traceback; packed flank start / mask-region spans.
3. :func:`barcode_rank` — gather barcode windows, run the fwd+rc
   pattern stacks, per-pattern best valley, candidate fallback,
   traceback + Lodhi, min-score selection; packed per-hit records.

Row coordinate model: every row holds its text in columns
``[start_col, end_col]`` (forward rows left-aligned at 0; synthesized
rc rows right-aligned ending at L). End positions are column indices;
hosts convert with the per-row text-start column.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

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
    window_dp_summary,
)
from .pallas_myers import myers_valleys_from_words, pattern_words
from .pallas_rank import rank_pass1


def _complement_masks(m):
    """Nibble complement (A<->T, C<->G = bit reversal), elementwise."""
    m = m.astype(jnp.int32)
    c = ((m & 1) << 3) | ((m & 2) << 1) | ((m & 4) >> 1) | ((m & 8) >> 3)
    return c.astype(jnp.uint8)


def unpack_rows(packed):
    """[R, L/2] nibble-packed -> [R, L] mask bytes."""
    lo = (packed & 0xF).astype(jnp.uint8)
    hi = (packed >> 4).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=2).reshape(packed.shape[0], -1)


def pack_rows_np(rows):
    """Host-side nibble packing (numpy)."""
    return (rows[:, 0::2] | (rows[:, 1::2] << 4)).astype(rows.dtype)


class FlankScanOut(NamedTuple):
    rows: jnp.ndarray  # [R_total, L] assembled rows (device-resident)
    packed: jnp.ndarray  # [R_total, 2K+1] int32: K col | K cost | count


def _valley_keys(ends, lo, hi, k_scaled, L_key):
    """Key map (cost*L_key + col) over valley positions, BIG elsewhere."""
    B, N = ends.shape
    jpos = jnp.arange(N, dtype=jnp.int32)
    valid = (jpos[None, :] >= lo[:, None]) & (jpos[None, :] <= hi[:, None])
    e = jnp.where(valid, ends, BIG)
    prv = jnp.concatenate([jnp.full((B, 1), BIG), e[:, :-1]], axis=1)
    nxt = jnp.concatenate([e[:, 1:], jnp.full((B, 1), BIG)], axis=1)
    isv = (e <= k_scaled) & (e < nxt) & (e <= prv)
    key = jnp.where(isv, e * L_key + jpos[None, :], BIG)
    return key, isv.sum(axis=1, dtype=jnp.int32)


def _window_cols(rows, starts, W):
    """Per-row fixed-width slices as ONE flat gather (never materialize
    [R, L] intermediates — row-gather-then-slice is pathologically slow
    on TPU)."""
    R, L = rows.shape
    jpos = jnp.arange(W, dtype=jnp.int32)
    cols = jnp.clip(starts[:, None] + jpos[None, :], 0, L - 1)
    rowbase = jnp.arange(R, dtype=jnp.int32)[:, None] * L
    return jnp.take(rows.reshape(-1), rowbase + cols)


@functools.partial(
    jax.jit,
    static_argnames=("K", "use_pallas", "interpret", "m", "k_units", "W_words", "top_bit"),
)
def flank_scan(
    pattern,  # [m] u8 masks
    patw,  # [4, W_words] u32 pattern membership words (pallas path)
    host_packed,  # [R_host, L/2] nibble-packed fwd simple + fwd/rc chunk rows
    simple_idx,  # [S] host-row indices of fwd simple reads
    start_col,  # [R_total]
    end_col,  # [R_total]
    lo,  # [R_total] valid end-col range
    hi,  # [R_total]
    emit_lo,  # [R_total] kernel emission range (pallas path)
    emit_hi,  # [R_total]
    alpha_scaled,
    K: int,
    use_pallas: bool,
    interpret: bool,
    m: int,
    k_units: int,
    W_words: int,
    top_bit: int,
) -> FlankScanOut:
    host_rows = unpack_rows(host_packed)
    rc_simple = _complement_masks(host_rows[simple_idx][:, ::-1])
    rows = jnp.concatenate([host_rows, rc_simple], axis=0)
    rows = jax.lax.optimization_barrier(rows)
    R, L = rows.shape
    L_key = L + 2
    k_scaled = k_units * UNIT

    if not use_pallas:
        ends = flank_ends(pattern, rows, start_col, end_col, alpha_scaled)
        key, count = _valley_keys(ends, lo, hi, k_scaled, L_key)
        neg, idx = jax.lax.top_k(-key, K)
        key_top = -neg
    else:
        # Interior: unit-cost Myers with in-kernel valley emission.
        vmap_u8 = myers_valleys_from_words(
            patw, W_words, top_bit, m, rows, emit_lo, emit_hi,
            jnp.int32(k_units), interpret=interpret,
        )
        jpos = jnp.arange(L, dtype=jnp.int32)
        kernel_key = jnp.where(
            vmap_u8 < 255,
            vmap_u8.astype(jnp.int32) * UNIT * L_key + jpos[None, :],
            BIG,
        )
        kernel_count = (vmap_u8 < 255).sum(axis=1, dtype=jnp.int32)
        kn, _ = jax.lax.top_k(-kernel_key, K)

        # Left boundary window: exact alpha semantics near the read start.
        Wl = m + k_units + 3
        lw = _window_cols(rows, jnp.maximum(start_col, 0), Wl)
        text_len = end_col - jnp.maximum(start_col, 0)
        lw_start = jnp.where(start_col >= 0, 0, -1)
        lw_end = jnp.where(text_len <= Wl, text_len, Wl + 2)
        ends_l = flank_ends(pattern, lw, lw_start, lw_end, alpha_scaled)
        # decide local j <= min(m+k+1, hi - tsc, text_len); only rows
        # whose true start is in this row participate.
        tsc = jnp.maximum(start_col, 0)
        l_hi = jnp.minimum(jnp.minimum(m + k_units + 1, hi - tsc), text_len)
        l_hi = jnp.where(start_col >= 0, l_hi, -1)
        l_lo = jnp.maximum(lo - tsc, 0)
        lkey, lcount = _valley_keys(ends_l, l_lo, l_hi, k_scaled, L_key)
        # shift local cols to row cols
        lkey = jnp.where(lkey < BIG, lkey + tsc[:, None], BIG)
        ln, _ = jax.lax.top_k(-lkey, K)

        # Right boundary window: alpha verticals at the read-end column
        # decide positions {end-1, end}.
        Wr = m + k_units + 3
        has_end = end_col <= L
        not_short = text_len > m + k_units + 1
        r_active = has_end & not_short
        r_start = jnp.where(r_active, end_col - Wr, 0)
        rw = _window_cols(rows, r_start, Wr)
        ends_r = flank_ends(
            pattern,
            rw,
            jnp.full((R,), -1, dtype=jnp.int32),
            jnp.where(r_active, Wr, Wr + 2),
            alpha_scaled,
        )
        r_lo_local = jnp.where(r_active, Wr - 1, 1)
        # guard against overlap with the left window's zone
        r_lo_local = jnp.maximum(
            r_lo_local,
            jnp.where(start_col >= 0, (tsc + m + k_units + 2) - r_start, 0),
        )
        r_hi_local = jnp.where(r_active, Wr, -1)
        rkey, rcount = _valley_keys(ends_r, r_lo_local, r_hi_local, k_scaled, L_key)
        rkey = jnp.where(rkey < BIG, rkey + r_start[:, None], BIG)
        rn, _ = jax.lax.top_k(-rkey, 4)

        merged = jnp.concatenate([kn, ln, rn], axis=1)
        neg, _ = jax.lax.top_k(merged, K)
        key_top = -neg
        count = kernel_count + lcount + rcount

    pos = jnp.where(key_top < BIG, key_top % L_key, 0)
    cost = jnp.where(key_top < BIG, key_top // L_key, BIG)
    packed = jnp.concatenate([pos, cost, count[:, None]], axis=1).astype(jnp.int32)
    return FlankScanOut(rows=rows, packed=packed)


def unpack_flank_scan(packed, K: int):
    """host-side: (col [R,K], cost [R,K], valid [R,K], count [R])."""
    pos = packed[:, :K]
    cost = packed[:, K : 2 * K]
    count = packed[:, 2 * K]
    return pos, cost, cost < int(BIG), count


def _gather_windows(rows, row_idx, starts, W: int):
    """windows[h] = rows[row_idx[h], starts[h] : starts[h]+W].

    One flat gather of [H, W] elements; column indices are clamped to
    the row, and callers zero out anything past their window length,
    so clamped duplicates are never read."""
    L = rows.shape[1]
    jpos = jnp.arange(W, dtype=jnp.int32)
    cols = jnp.minimum(starts[:, None] + jpos[None, :], L - 1)
    flat = row_idx.astype(jnp.int32)[:, None] * L + cols
    return jnp.take(rows.reshape(-1), flat)


@functools.partial(jax.jit, static_argnames=("m", "W"))
def flank_trace(
    pattern,  # [m]
    rows,  # [R_total, L] device-resident
    row_idx,  # [H]
    win_start,  # [H] window start column within row
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
    """Packed [H, 4] int32: text_start, region_lo, region_hi, has_region
    (all window-relative).  Fused forward-summary DP — no move tables,
    no traceback scan (see :func:`device.window_dp_summary`)."""
    windows = _gather_windows(rows, row_idx, win_start, W)
    jpos = jnp.arange(W, dtype=jnp.int32)
    windows = jnp.where(jpos[None, :] < end_j[:, None], windows, 0)
    summ = window_dp_summary(
        pattern[None, None, :],
        windows,
        left_edge,
        right_pos,
        alpha_scaled,
        region_a,
        region_b,
        jnp.int32(0),
        jnp.int32(0),
        with_region=True,
        with_start=True,
    )

    def at_end(arr):  # [H, 1, W+1] -> value at end_j
        return jnp.take_along_axis(arr[:, 0, :], end_j[:, None], axis=1)[:, 0]

    region_hi = at_end(summ.region_hi)
    return jnp.stack(
        [
            at_end(summ.text_start),
            at_end(summ.region_lo),
            region_hi,
            (region_hi >= 0).astype(jnp.int32),
        ],
        axis=1,
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("m", "W"))
def flank_trace_reference(
    pattern,
    rows,
    row_idx,
    win_start,
    left_edge,
    right_pos,
    end_j,
    valid,
    region_a,
    region_b,
    alpha_scaled,
    m: int,
    W: int,
):
    """Original window_dp + traceback_reduce implementation; kept as the
    conformance anchor for :func:`flank_trace` (tests only)."""
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


@functools.partial(
    jax.jit, static_argnames=("m", "W", "use_pallas", "interpret")
)
def barcode_rank(
    patterns,  # [P, m] one strand's pattern stack
    rows,  # [R_total, L]
    row_idx,  # [H]
    win_start,  # [H]
    w_len,  # [H]
    hvalid,  # [H]
    k1_scaled,
    iv_a,
    iv_b,
    perfect,  # f32 scalar
    min_score,
    min_score_diff,
    m: int,
    W: int,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Packed [H, 8] int32: top_idx, accepted, read_bar_start,
    read_bar_end, bar_start, bar_end, bar_cost, has_interval.

    Two fused passes, no move tables: (1) a forward-summary DP carries
    the Lodhi state for ALL patterns (selection needs every candidate's
    score — on real windows ~90 of 96 barcodes pass the k1 filter, so
    candidate compaction can't help); (2) the interval mapping runs the
    same summary DP for just the winning pattern per window."""
    P = patterns.shape[0]
    windows = _gather_windows(rows, row_idx, win_start, W)
    jpos = jnp.arange(W, dtype=jnp.int32)
    windows = jnp.where(jpos[None, :] < w_len[:, None], windows, 0)

    H = windows.shape[0]
    no_edge = jnp.zeros(H, dtype=bool)
    no_right = jnp.full(H, -1, dtype=jnp.int32)
    if use_pallas and W <= 255:
        key, lodhi_best = rank_pass1(
            patterns, windows, w_len, interpret=interpret
        )
        best_cost = key // 256
        best_pos = key % 256
    else:
        summ = window_dp_summary(
            patterns[None, :, :],
            windows,
            no_edge,
            no_right,
            jnp.int32(UNIT),
            jnp.int32(0),
            jnp.int32(-1),
            iv_a,
            iv_b,
            with_lodhi=True,
        )
        best = best_valley_per_pattern(summ.ends, w_len)
        best_cost, best_pos = best.cost, best.pos
        lodhi_best = jnp.take_along_axis(
            summ.lodhi, best_pos[:, :, None], axis=2
        )[:, :, 0]

    in_k1 = best_cost <= k1_scaled
    matched = in_k1.sum(axis=1)
    use_all = matched <= 1
    cand = (use_all[:, None] | in_k1) & hvalid[:, None]

    scores = jnp.where(cand, lodhi_best / perfect, -jnp.inf)
    top = jnp.argmax(scores, axis=1).astype(jnp.int32)
    top_norm = jnp.take_along_axis(scores, top[:, None], axis=1)[:, 0]
    rest = jnp.where(jnp.arange(P)[None, :] == top[:, None], -jnp.inf, scores)
    second_norm = jnp.max(rest, axis=1)
    n_cand = cand.sum(axis=1)

    accepted = (top_norm >= min_score) & (
        (n_cand <= 1) | ((top_norm - second_norm) >= min_score_diff)
    )
    accepted = accepted & hvalid & (n_cand > 0)

    # Pass 2: interval mapping for the winning pattern only ([H, 1]).
    pat_top = jnp.take(patterns, top, axis=0)  # [H, m]
    summ2 = window_dp_summary(
        pat_top[:, None, :],
        windows,
        no_edge,
        no_right,
        jnp.int32(UNIT),
        jnp.int32(0),
        jnp.int32(-1),
        iv_a,
        iv_b,
        with_interval=True,
    )
    end_top = jnp.take_along_axis(best_pos, top[:, None], axis=1)  # [H, 1]

    def pick(arr):  # [H, 1, W+1] -> value at the top pattern's end pos
        return jnp.take_along_axis(arr[:, 0, :], end_top, axis=1)[:, 0]

    return jnp.stack(
        [
            top,
            accepted.astype(jnp.int32),
            pick(summ2.iv_pj),
            pick(summ2.iv_ej) + 1,
            pick(summ2.iv_pi),
            pick(summ2.iv_ei) + 1,
            pick(summ2.iv_cost),
            pick(summ2.has_interval.astype(jnp.int32)),
        ],
        axis=1,
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("m", "W"))
def barcode_rank_reference(
    patterns,
    rows,
    row_idx,
    win_start,
    w_len,
    hvalid,
    k1_scaled,
    iv_a,
    iv_b,
    perfect,
    min_score,
    min_score_diff,
    m: int,
    W: int,
):
    """Original all-lanes window_dp + traceback_reduce implementation;
    kept as the conformance anchor for :func:`barcode_rank` (tests
    only).  For lanes outside ``cand`` the traceback is masked, so
    interval fields there hold init values — compare only rows/lanes
    where ``hvalid`` (and interval fields only where accepted)."""
    P = patterns.shape[0]
    windows = _gather_windows(rows, row_idx, win_start, W)
    jpos = jnp.arange(W, dtype=jnp.int32)
    windows = jnp.where(jpos[None, :] < w_len[:, None], windows, 0)

    H = windows.shape[0]
    no_edge = jnp.zeros(H, dtype=bool)
    no_right = jnp.full(H, -1, dtype=jnp.int32)
    bdp = window_dp(patterns, windows, no_edge, no_right, jnp.int32(UNIT))
    best = best_valley_per_pattern(bdp.ends, w_len)

    in_k1 = best.cost <= k1_scaled
    matched = in_k1.sum(axis=1)
    use_all = matched <= 1
    cand = (use_all[:, None] | in_k1) & hvalid[:, None]

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
    rest = jnp.where(jnp.arange(P)[None, :] == top[:, None], -jnp.inf, scores)
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
            top,
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
