"""Batched JAX kernels for the demux pipeline (TPU-first, CPU-testable).

Four device stages, all in the scaled-integer cost domain of
:mod:`barbell_tpu.ops.oracle` (exact agreement with the oracle is a
test invariant):

1. :func:`flank_ends` — semiglobal DP end-cost curve of one flank
   pattern over a batch of padded reads.  Row-scan over pattern
   positions; the in-row horizontal (text-gap) closure is a min-plus
   prefix scan, so each of the ~90 rows is a handful of vectorized
   [B, L] ops + one associative scan.  Overhang alpha applies at
   column 0 (read start) and at each read's own end column.
2. :func:`find_hits` — plateau-valley extraction + top-K compaction.
3. :func:`window_dp` — windowed multi-pattern DP that also records
   per-cell traceback moves (2-bit move + match bit).
4. :func:`traceback_reduce` — fixed-length backward scan over the move
   tables computing, per lane: alignment start, the text window covered
   by a pattern sub-range (mask region), the mapped barcode interval +
   its sub-cost, and the Lodhi gap-weighted score — all as scan
   carries, no materialized paths.

Everything is pure jnp (XLA fuses the elementwise work); the flank scan
has a Pallas fast path in :mod:`barbell_tpu.ops.pallas_myers`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .oracle import COST_SCALE

UNIT = COST_SCALE
# Plain int so importing this module never initializes a jax backend.
BIG = 2**30

LAM = 0.5  # Lodhi decay
A_DIAG = LAM * LAM  # width-2 column factor
A_GAP = LAM  # width-1 column factor


# ---------------------------------------------------------------------------
# Stage 1: flank end-cost curve
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=())
def flank_ends(pattern, text, start_col, end_col, alpha_scaled):
    """End-cost curve of `pattern` over each (chunked) text row.

    pattern:   [m]  uint8 IUPAC masks
    text:      [B, L] uint8 IUPAC masks (0 outside each row's text span)
    start_col: [B] int32 — column of the read's *true start* within the
               row (overhang boundary: vertical steps there cost alpha),
               or -1 when the row does not contain the read start.
    end_col:   [B] int32 — column of the read's true end, or out of
               range when absent.
    alpha_scaled: int32 — scaled overhang cost
    returns:   ends [B, L+1] int32 (garbage outside each row's valid
               end range; mask downstream)

    Rows may carry their text anywhere within [start, end] columns —
    bytes outside match nothing, and any ≤k end-cost within the valid
    range is unaffected by them (a path crossing them pays a unit per
    crossed column).
    """
    B, L = text.shape
    m = pattern.shape[0]
    jpos = jnp.arange(L + 1, dtype=jnp.int32)
    boundary_col = (jpos[None, :] == start_col[:, None]) | (
        jpos[None, :] == end_col[:, None]
    )
    vert = jnp.where(boundary_col, alpha_scaled, UNIT)  # [B, L+1]
    unit_j = UNIT * jpos

    # Derive the initial carry from `text` so it inherits the same
    # varying-axes type under shard_map (a plain zeros() is "replicated"
    # and scan would reject the carry type mismatch).
    C0 = jnp.zeros((B, L + 1), dtype=jnp.int32) + (text[:, :1].astype(jnp.int32) * 0)
    rows = (pattern.astype(jnp.int32), jnp.arange(1, m + 1, dtype=jnp.int32))
    boundary_step = jnp.where(start_col == 0, alpha_scaled, UNIT)  # [B]

    def row_step(C_prev, xs):
        pat_i, i = xs
        eq = (text.astype(jnp.int32) & pat_i) != 0
        sub = jnp.where(eq, 0, UNIT)
        boundary = boundary_step * i  # [B] — column-0 init
        v = jnp.minimum(C_prev[:, :-1] + sub, C_prev[:, 1:] + vert[:, 1:])
        w = jnp.concatenate([boundary[:, None], v], axis=1)
        u = w - unit_j[None, :]
        u = jax.lax.associative_scan(jnp.minimum, u, axis=1)
        return u + unit_j[None, :], None

    ends, _ = jax.lax.scan(row_step, C0, rows)
    return ends


# ---------------------------------------------------------------------------
# Stage 2: valley extraction
# ---------------------------------------------------------------------------


class Hits(NamedTuple):
    pos: jnp.ndarray  # [B, K] int32 end positions (within row)
    cost: jnp.ndarray  # [B, K] int32 scaled costs
    valid: jnp.ndarray  # [B, K] bool
    count: jnp.ndarray  # [B] int32 total valleys (for overflow detection)


@functools.partial(jax.jit, static_argnames=("K",))
def find_hits(ends, lo, hi, k_scaled, K: int) -> Hits:
    """Plateau-valley minima with cost <= k, compacted to K per row.

    Valid end positions are lo[b] <= j <= hi[b].  A valley is
    ``e[j] <= k and e[j] < e[j+1] and e[j] <= e[j-1]`` with +inf outside
    the valid range (the rightmost point of each plateau).  Returns the
    K lowest-cost valleys (ties -> smallest j).
    """
    B, N = ends.shape
    jpos = jnp.arange(N, dtype=jnp.int32)
    valid = (jpos[None, :] >= lo[:, None]) & (jpos[None, :] <= hi[:, None])
    e = jnp.where(valid, ends, BIG)
    prv = jnp.concatenate([jnp.full((B, 1), BIG), e[:, :-1]], axis=1)
    nxt = jnp.concatenate([e[:, 1:], jnp.full((B, 1), BIG)], axis=1)
    isv = (e <= k_scaled) & (e < nxt) & (e <= prv)
    count = isv.sum(axis=1, dtype=jnp.int32)
    neg = jnp.where(isv, -e, -BIG)
    vals, idxs = jax.lax.top_k(neg, K)  # ties -> lowest index = smallest j
    return Hits(
        pos=idxs.astype(jnp.int32),
        cost=-vals,
        valid=vals > -BIG,
        count=count,
    )


# ---------------------------------------------------------------------------
# Stage 3: windowed multi-pattern DP with move recording
# ---------------------------------------------------------------------------


class WindowDP(NamedTuple):
    ends: jnp.ndarray  # [H, P, W+1] int32
    moves: jnp.ndarray  # [m, H, P, W+1] uint8 (bits 0-1 move, bit 2 eq)


@functools.partial(jax.jit, static_argnames=())
def window_dp(patterns, windows, left_edge, right_pos, alpha_scaled) -> WindowDP:
    """Semiglobal DP of every pattern against every window.

    patterns: [P, m] uint8
    windows:  [H, W] uint8 (left-aligned content, 0-padded tail)
    left_edge: [H] bool — column 0 is the read's true start (alpha
              boundary); otherwise the boundary is unreachable.
    right_pos: [H] int32 — window column equal to the read's true end
              (alpha verticals), or -1.
    alpha_scaled: scaled overhang cost; pass UNIT for plain semiglobal.

    Move encoding per cell (i, j): 0 diagonal, 1 up, 2 left; bit 2 set
    when the diagonal characters match.
    """
    P, m = patterns.shape
    H, W = windows.shape
    jpos = jnp.arange(W + 1, dtype=jnp.int32)
    unit_j = UNIT * jpos
    vert = jnp.where(jpos[None, :] == right_pos[:, None], alpha_scaled, UNIT)  # [H, W+1]
    win = windows.astype(jnp.int32)

    C0 = jnp.zeros((H, P, W + 1), dtype=jnp.int32)
    rows = (patterns.T.astype(jnp.int32), jnp.arange(1, m + 1, dtype=jnp.int32))

    def row_step(C_prev, xs):
        pat_row, i = xs  # pat_row [P]
        eq = (win[:, None, :] & pat_row[None, :, None]) != 0  # [H, P, W]
        sub = jnp.where(eq, 0, UNIT)
        boundary = jnp.where(left_edge, alpha_scaled * i, UNIT * i)  # [H]
        v = jnp.minimum(
            C_prev[:, :, :-1] + sub, C_prev[:, :, 1:] + vert[:, None, 1:]
        )
        w = jnp.concatenate(
            [jnp.broadcast_to(boundary[:, None, None], (H, P, 1)), v], axis=2
        )
        u = w - unit_j[None, None, :]
        u = jax.lax.associative_scan(jnp.minimum, u, axis=2)
        C = u + unit_j[None, None, :]

        diag_ok = C[:, :, 1:] == C_prev[:, :, :-1] + sub
        up_ok = C == C_prev + vert[:, None, :]
        move_tail = jnp.where(diag_ok, 0, jnp.where(up_ok[:, :, 1:], 1, 2))
        move = jnp.concatenate(
            [jnp.ones((H, P, 1), dtype=jnp.int32), move_tail], axis=2
        )
        eq_bits = jnp.concatenate(
            [jnp.zeros((H, P, 1), dtype=jnp.int32), eq.astype(jnp.int32)], axis=2
        )
        moves_row = (move | (eq_bits << 2)).astype(jnp.uint8)
        return C, moves_row

    ends, moves = jax.lax.scan(row_step, C0, rows)
    return WindowDP(ends=ends, moves=moves)  # moves: [m, H, P, W+1]


# ---------------------------------------------------------------------------
# Stage 4: traceback with fused reductions
# ---------------------------------------------------------------------------


class TraceResult(NamedTuple):
    text_start: jnp.ndarray  # [H, P] int32 window col where the match starts
    region_lo: jnp.ndarray  # [H, P] int32 min col-start j over region cols
    region_hi: jnp.ndarray  # [H, P] int32 max col-start j over region cols
    has_region: jnp.ndarray  # [H, P] bool
    iv_pi: jnp.ndarray  # [H, P] first in-interval column (pattern pos)
    iv_pj: jnp.ndarray  # [H, P] first in-interval column (text pos)
    iv_ei: jnp.ndarray  # [H, P] last in-interval column (pattern pos)
    iv_ej: jnp.ndarray  # [H, P] last in-interval column (text pos)
    iv_cost: jnp.ndarray  # [H, P] int32 sub-cost in edit units
    has_interval: jnp.ndarray  # [H, P] bool
    lodhi: jnp.ndarray  # [H, P] float32 gap-weighted score


@functools.partial(jax.jit, static_argnames=("m", "W"))
def traceback_reduce(
    moves,  # [m, H, P, W+1] uint8
    end_j,  # [H, P] int32
    valid,  # [H, P] bool
    region_a,  # int32 inclusive pattern-range start (mask region)
    region_b,  # int32 inclusive pattern-range end
    iv_a,  # int32 interval start (inclusive)
    iv_b,  # int32 interval end (EXCLUSIVE)
    m: int,
    W: int,
) -> TraceResult:
    """Backward walk over the move tables with fused reductions.

    Columns are visited last-to-first; every reduction is either
    order-independent (min/max/sum, Lodhi is reversal-invariant) or
    handles the reversal explicitly (first/last column tracking).
    """
    H, P = end_j.shape
    HP = H * P
    moves_flat = moves.reshape(-1)
    lane = (jnp.arange(H, dtype=jnp.int32)[:, None] * P) + jnp.arange(
        P, dtype=jnp.int32
    )[None, :]

    init = dict(
        i=jnp.full((H, P), m, dtype=jnp.int32),
        j=end_j.astype(jnp.int32),
        done=~valid,
        text_start=jnp.zeros((H, P), dtype=jnp.int32),
        region_lo=jnp.full((H, P), BIG, dtype=jnp.int32),
        region_hi=jnp.full((H, P), -1, dtype=jnp.int32),
        iv_pi=jnp.zeros((H, P), dtype=jnp.int32),
        iv_pj=jnp.zeros((H, P), dtype=jnp.int32),
        iv_ei=jnp.full((H, P), -1, dtype=jnp.int32),
        iv_ej=jnp.full((H, P), -1, dtype=jnp.int32),
        iv_cost=jnp.zeros((H, P), dtype=jnp.int32),
        has_interval=jnp.zeros((H, P), dtype=bool),
        T1=jnp.zeros((H, P), dtype=jnp.float32),
        T2=jnp.zeros((H, P), dtype=jnp.float32),
        S=jnp.zeros((H, P), dtype=jnp.float32),
    )

    def step(state, _):
        i, j, done = state["i"], state["j"], state["done"]
        active = ~done
        # move for cell (i, j) lives at moves[i-1, h, p, j]
        safe_i = jnp.maximum(i, 1)
        idx = ((safe_i - 1) * HP + lane) * (W + 1) + j
        mv = jnp.take(moves_flat, idx.reshape(-1)).reshape(H, P).astype(jnp.int32)
        move = mv & 3
        eqb = (mv >> 2) & 1

        ni = jnp.where(move == 2, i, i - 1)
        nj = jnp.where(move == 1, j, j - 1)

        is_match = active & (move == 0) & (eqb == 1)
        a_c = jnp.where(move == 0, A_DIAG, A_GAP).astype(jnp.float32)
        a_c = jnp.where(active, a_c, 1.0)
        mf = is_match.astype(jnp.float32)

        S = state["S"] + mf * a_c * state["T2"]
        T2 = jnp.where(active, a_c * (state["T2"] + mf * state["T1"]), state["T2"])
        T1 = jnp.where(active, a_c * (state["T1"] + mf), state["T1"])

        # column coordinates = state after the step
        col_i, col_j = ni, nj
        in_region = active & (col_i >= region_a) & (col_i <= region_b)
        region_lo = jnp.where(
            in_region, jnp.minimum(state["region_lo"], col_j), state["region_lo"]
        )
        region_hi = jnp.where(
            in_region, jnp.maximum(state["region_hi"], col_j), state["region_hi"]
        )

        in_iv = active & (col_i >= iv_a) & (col_i < iv_b)
        # visited backward: overwrite start every time, set end only once
        iv_pi = jnp.where(in_iv, col_i, state["iv_pi"])
        iv_pj = jnp.where(in_iv, col_j, state["iv_pj"])
        first_iv = in_iv & ~state["has_interval"]
        iv_ei = jnp.where(first_iv, col_i, state["iv_ei"])
        iv_ej = jnp.where(first_iv, col_j, state["iv_ej"])
        iv_cost = state["iv_cost"] + jnp.where(in_iv & ~is_match, 1, 0)
        has_interval = state["has_interval"] | in_iv

        newly_done = active & (ni == 0)
        text_start = jnp.where(newly_done, nj, state["text_start"])
        done = done | newly_done
        i = jnp.where(active, ni, i)
        j = jnp.where(active, nj, j)

        return (
            dict(
                i=i,
                j=j,
                done=done,
                text_start=text_start,
                region_lo=region_lo,
                region_hi=region_hi,
                iv_pi=iv_pi,
                iv_pj=iv_pj,
                iv_ei=iv_ei,
                iv_ej=iv_ej,
                iv_cost=iv_cost,
                has_interval=has_interval,
                T1=T1,
                T2=T2,
                S=S,
            ),
            None,
        )

    state, _ = jax.lax.scan(step, init, None, length=m + W, unroll=8)
    return TraceResult(
        text_start=state["text_start"],
        region_lo=state["region_lo"],
        region_hi=state["region_hi"],
        has_region=state["region_hi"] >= 0,
        iv_pi=state["iv_pi"],
        iv_pj=state["iv_pj"],
        iv_ei=state["iv_ei"],
        iv_ej=state["iv_ej"],
        iv_cost=state["iv_cost"],
        has_interval=state["has_interval"],
        lodhi=state["S"],
    )


# ---------------------------------------------------------------------------
# Stage 3a helper: best valley per pattern
# ---------------------------------------------------------------------------


class BestPerPattern(NamedTuple):
    cost: jnp.ndarray  # [H, P] int32
    pos: jnp.ndarray  # [H, P] int32
    has: jnp.ndarray  # [H, P] bool


@functools.partial(jax.jit, static_argnames=())
def best_valley_per_pattern(ends, w_len) -> BestPerPattern:
    """Lowest-cost valley per (window, pattern); ties -> smallest j.

    ends: [H, P, W+1]; w_len: [H] valid window length.
    """
    H, P, N = ends.shape
    jpos = jnp.arange(N, dtype=jnp.int32)
    valid = jpos[None, None, :] <= w_len[:, None, None]
    e = jnp.where(valid, ends, BIG)
    prv = jnp.concatenate([jnp.full((H, P, 1), BIG), e[:, :, :-1]], axis=2)
    nxt = jnp.concatenate([e[:, :, 1:], jnp.full((H, P, 1), BIG)], axis=2)
    isv = (e < nxt) & (e <= prv)
    # key favours low cost then low j; costs bounded by m*UNIT << 2^24
    key = jnp.where(isv, e * 256 + jpos[None, None, :], BIG)
    best = jnp.argmin(key, axis=2).astype(jnp.int32)
    best_cost = jnp.take_along_axis(e, best[:, :, None], axis=2)[:, :, 0]
    return BestPerPattern(cost=best_cost, pos=best, has=best_cost < BIG)
