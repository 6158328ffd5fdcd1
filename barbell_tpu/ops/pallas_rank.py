"""Pallas TPU kernel: fused barcode-rank pass 1.

For every (window h, pattern p) lane this computes, in one kernel with
no HBM intermediates:

- the semiglobal edit DP of pattern p over window h (integer costs,
  scaled domain of :mod:`barbell_tpu.ops.oracle`),
- the Lodhi gap-weighted score carried forward along each cell's
  optimal path (same move tie-breaking as
  :func:`barbell_tpu.ops.device.window_dp` / ``traceback_reduce``:
  diag > up(pattern gap) > left(text gap)),
- the best plateau-valley end position (same key order as
  :func:`barbell_tpu.ops.device.best_valley_per_pattern`:
  cost*256 + j, minimized), and the Lodhi score at that position.

Output per lane: ``key = cost*256 + j`` (int32) and ``S`` (float32).

Why a kernel: the equivalent XLA formulation needs either a [m, H, P,
W+1] move table + an (m+W)-step gather traceback (~200ms at production
shapes; gathers along the minor axis cost ~140ms each on TPU) or
per-row segmented scans (~230ms).  Here the column state (C, T1, T2, S
over pattern positions) lives in VMEM scratch, the in-column "up"
chain is an ordinary sequential loop, and lanes are (8 patterns x 128
windows) vector tiles.

Layout: grid (H/128, P/8); per cell the window text is [W, 128] (one
text char broadcast over 8 sublanes) and the pattern chunk is
pre-broadcast host-side to [m, 8, 128] masks.

Reference semantics: sassy candidate search + cigar-lodhi rescoring
(`/root/reference/src/annotate/searcher.rs:267-426`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .oracle import COST_SCALE

LANES = 128  # windows per tile
SUBS = 8  # patterns per tile

UNIT = COST_SCALE
BIGK = 2**30  # plain int: jnp scalars would be captured kernel consts
A_DIAG = 0.25  # lambda**2, lambda = 0.5
A_GAP = 0.5


def _kernel(pat_ref, win_ref, wlen_ref, key_ref, s_ref,
            c_ref, t1_ref, t2_ref, s_col_ref, vi_ref, vf_ref,
            *, m: int, W: int):
    """All cross-column state lives in VMEM scratch (vi/vf hold the
    valley tracker: prv, e_c, best_key / s_c, best_s) — fori carries of
    vector values trip Mosaic relayout errors on this toolchain.

    The column loop advances TWO columns per step (W is padded even by
    the callers): the mid column's per-row state chains through
    registers, halving the scratch loads/stores per DP cell — the
    scratch traffic, not the arithmetic, bounded the single-column
    form."""
    assert W % 2 == 0, W
    shape = (SUBS, LANES)
    unit = jnp.int32(UNIT)

    # column j = 0: C[i] = i*UNIT, Lodhi state all zero
    c_ref[...] = (
        jax.lax.broadcasted_iota(jnp.int32, (m + 1, SUBS, LANES), 0) * unit
    )
    t1_ref[...] = jnp.zeros(t1_ref.shape, dtype=jnp.float32)
    t2_ref[...] = jnp.zeros(t2_ref.shape, dtype=jnp.float32)
    s_col_ref[...] = jnp.zeros(s_col_ref.shape, dtype=jnp.float32)
    vi_ref[0] = jnp.full(shape, BIGK, dtype=jnp.int32)  # prv = e[-1]
    vi_ref[1] = jnp.full(shape, m * UNIT, dtype=jnp.int32)  # e_c = e[0]
    vi_ref[2] = jnp.full(shape, BIGK, dtype=jnp.int32)  # best_key
    vf_ref[...] = jnp.zeros(vf_ref.shape, dtype=jnp.float32)  # s_c, best_s

    wlen_b = jnp.broadcast_to(wlen_ref[0, 0][None, :], shape)

    def cell(pchar, tchar, dm1, left, up):
        """One DP cell; dm1/left/up/return are (C, T1, T2, S) tuples."""
        dm1_c, dm1_t1, dm1_t2, dm1_s = dm1
        old_c, old_t1, old_t2, old_s = left
        n_c, n_t1, n_t2, n_s = up
        eq = (pchar & tchar) > 0
        diag = dm1_c + jnp.where(eq, 0, unit)
        lft = old_c + unit
        up_c = n_c + unit
        c = jnp.minimum(jnp.minimum(diag, lft), up_c)
        diag_ok = c == diag
        up_ok = c == up_c
        mf = jnp.where(diag_ok & eq, 1.0, 0.0)
        a = jnp.where(diag_ok, A_DIAG, A_GAP)
        src_t1 = jnp.where(diag_ok, dm1_t1, jnp.where(up_ok, n_t1, old_t1))
        src_t2 = jnp.where(diag_ok, dm1_t2, jnp.where(up_ok, n_t2, old_t2))
        src_s = jnp.where(diag_ok, dm1_s, jnp.where(up_ok, n_s, old_s))
        return (c, a * (src_t1 + mf), a * (src_t2 + mf * src_t1),
                src_s + mf * a * src_t2)

    def col_step(jj, _):
        j = 2 * jj + 1  # columns j and j + 1 this step
        tch_a = jnp.broadcast_to(win_ref[j - 1, 0], shape).astype(jnp.int32)
        tch_b = jnp.broadcast_to(win_ref[j, 0], shape).astype(jnp.int32)

        zi = tch_a * 0
        zf = zi.astype(jnp.float32)
        z4 = (zi, zf, zf, zf)  # pattern row 0 state (always zero)
        dm1a = z4    # row i-1 @ col j-1
        prev_a = z4  # row i-1 @ col j
        prev_b = z4  # row i-1 @ col j+1

        for i in range(1, m + 1):  # static unroll over pattern rows
            pchar = pat_ref[i - 1, 0].astype(jnp.int32)
            old = (c_ref[i], t1_ref[i], t2_ref[i], s_col_ref[i])
            cell_a = cell(pchar, tch_a, dm1a, old, prev_a)
            cell_b = cell(pchar, tch_b, prev_a, cell_a, prev_b)
            c_ref[i] = cell_b[0]
            t1_ref[i] = cell_b[1]
            t2_ref[i] = cell_b[2]
            s_col_ref[i] = cell_b[3]
            dm1a, prev_a, prev_b = old, cell_a, cell_b

        e_a = jnp.where(j <= wlen_b, prev_a[0], BIGK)
        e_b = jnp.where(j + 1 <= wlen_b, prev_b[0], BIGK)

        # decide valley at position j-1 (needs its right neighbour)
        prv, e_c, best_key = vi_ref[0], vi_ref[1], vi_ref[2]
        s_c, best_s = vf_ref[0], vf_ref[1]
        isv = (e_c <= prv) & (e_c < e_a)
        key = e_c * 256 + (j - 1)
        better = isv & (key < best_key)
        bk = jnp.where(better, key, best_key)
        bs = jnp.where(better, s_c, best_s)
        # and at position j (right neighbour is column j+1)
        isv2 = (e_a <= e_c) & (e_a < e_b)
        key2 = e_a * 256 + j
        better2 = isv2 & (key2 < bk)
        vi_ref[2] = jnp.where(better2, key2, bk)
        vf_ref[1] = jnp.where(better2, prev_a[3], bs)
        vi_ref[0] = e_a
        vi_ref[1] = e_b
        vf_ref[0] = prev_b[3]
        return 0

    jax.lax.fori_loop(0, W // 2, col_step, 0)

    # final position j = W (right neighbour is +inf); exclude masked
    # positions — their e is BIGK and key would overflow int32
    prv, e_c, best_key = vi_ref[0], vi_ref[1], vi_ref[2]
    s_c, best_s = vf_ref[0], vf_ref[1]
    isv = (e_c <= prv) & (e_c < BIGK)
    key = e_c * 256 + W
    better = isv & (key < best_key)
    key_ref[0, 0] = jnp.where(better, key, best_key)
    s_ref[0, 0] = jnp.where(better, s_c, best_s)


@functools.partial(
    jax.jit, static_argnames=("m", "W", "interpret", "split_hc")
)
def _rank_call(pat_bcast, win_t, wlen_t, *, m, W, interpret, split_hc=0):
    """split_hc > 0: lanes in h-tiles [0, split_hc) use the first half
    of the pattern chunks, tiles >= split_hc the second half — one
    kernel ranks fwd hits against fwd patterns and rc hits against rc
    patterns without doubling the grid."""
    PC = pat_bcast.shape[1]
    HC = win_t.shape[1]
    if split_hc:
        PCH = PC // 2
        grid = (HC, PCH)
        pat_index = lambda h, p: (0, p + (h >= split_hc) * PCH, 0, 0)
    else:
        PCH = PC
        grid = (HC, PC)
        pat_index = lambda h, p: (0, p, 0, 0)
    key, s = pl.pallas_call(
        functools.partial(_kernel, m=m, W=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (m, 1, SUBS, LANES), pat_index, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (W, 1, 1, LANES), lambda h, p: (0, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, LANES), lambda h, p: (h, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, SUBS, LANES), lambda h, p: (p, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, SUBS, LANES), lambda h, p: (p, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PCH, HC, SUBS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((PCH, HC, SUBS, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m + 1, SUBS, LANES), jnp.int32),
            pltpu.VMEM((m + 1, SUBS, LANES), jnp.float32),
            pltpu.VMEM((m + 1, SUBS, LANES), jnp.float32),
            pltpu.VMEM((m + 1, SUBS, LANES), jnp.float32),
            pltpu.VMEM((3, SUBS, LANES), jnp.int32),
            pltpu.VMEM((2, SUBS, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(pat_bcast, win_t, wlen_t)
    return key, s


def rank_pass1_split(patterns_all, P: int, windows, w_len,
                     interpret: bool = False):
    """Strand-split rank: lanes [0, H/2) are fwd hits ranked against
    patterns_all[:P], lanes [H/2, H) rc hits against patterns_all[P:].
    Halves the kernel grid versus ranking every lane against both
    stacks.  Requires H % 256 == 0 (the strand boundary must fall on a
    lane-tile boundary).  Returns key/lodhi [H, P] in strand-local
    pattern indices."""
    Pa, m = patterns_all.shape
    H, W = windows.shape
    assert Pa == 2 * P
    assert H % (2 * LANES) == 0, H
    assert W <= 255
    if W % 2:  # kernel advances two columns per step
        windows = jnp.pad(windows, ((0, 0), (0, 1)))
        W += 1

    Pp = ((P + SUBS - 1) // SUBS) * SUBS
    if Pp != P:
        pad = jnp.zeros((Pp - P, m), dtype=patterns_all.dtype)
        pats = jnp.concatenate(
            [patterns_all[:P], pad, patterns_all[P:], pad], axis=0
        )
    else:
        pats = patterns_all
    PCH = Pp // SUBS

    pat_bcast = jnp.broadcast_to(
        jnp.transpose(pats.reshape(2 * PCH, SUBS, m), (2, 0, 1))[:, :, :, None],
        (m, 2 * PCH, SUBS, LANES),
    )
    win_t = jnp.transpose(windows, (1, 0)).reshape(W, H // LANES, 1, LANES)
    wlen_t = w_len.astype(jnp.int32).reshape(H // LANES, 1, LANES)

    key, s = _rank_call(
        pat_bcast, win_t, wlen_t, m=m, W=W, interpret=interpret,
        split_hc=(H // 2) // LANES,
    )
    key = jnp.transpose(key, (1, 3, 0, 2)).reshape(H, Pp)[:, :P]
    s = jnp.transpose(s, (1, 3, 0, 2)).reshape(H, Pp)[:, :P]
    return key, s


def rank_pass1(patterns, windows, w_len, interpret: bool = False):
    """Best-valley key (cost*256 + pos) and Lodhi score per (h, p).

    patterns: [P, m] uint8 IUPAC masks (device array)
    windows:  [H, W] uint8 (content left-aligned, zero tail)
    w_len:    [H] int32 valid window length
    returns:  key [H, P] int32, lodhi [H, P] float32

    Requires W <= 255 (key packing).  H and P are padded internally to
    multiples of 128 / 8; padded lanes produce garbage the caller must
    mask (pad patterns are all-zero masks, pad windows have w_len = 0).
    """
    P, m = patterns.shape
    H, W = windows.shape
    assert W <= 255, "valley key packs position into 8 bits"
    if W % 2:  # kernel advances two columns per step
        windows = jnp.pad(windows, ((0, 0), (0, 1)))
        W += 1

    Pp = ((P + SUBS - 1) // SUBS) * SUBS
    Hp = ((H + LANES - 1) // LANES) * LANES
    if Pp != P:
        patterns = jnp.concatenate(
            [patterns, jnp.zeros((Pp - P, m), dtype=patterns.dtype)], axis=0
        )
    if Hp != H:
        windows = jnp.concatenate(
            [windows, jnp.zeros((Hp - H, W), dtype=windows.dtype)], axis=0
        )
        w_len = jnp.concatenate(
            [w_len, jnp.zeros(Hp - H, dtype=w_len.dtype)], axis=0
        )

    # [m, PC, 8, 128]: pattern masks broadcast over the lane dim
    pat_bcast = jnp.broadcast_to(
        jnp.transpose(patterns.reshape(Pp // SUBS, SUBS, m), (2, 0, 1))[
            :, :, :, None
        ],
        (m, Pp // SUBS, SUBS, LANES),
    )
    win_t = jnp.transpose(windows, (1, 0)).reshape(W, Hp // LANES, 1, LANES)
    wlen_t = w_len.astype(jnp.int32).reshape(Hp // LANES, 1, LANES)

    key, s = _rank_call(pat_bcast, win_t, wlen_t, m=m, W=W, interpret=interpret)
    # [PC, HC, 8, 128] -> [H, P]
    key = jnp.transpose(key, (1, 3, 0, 2)).reshape(Hp, Pp)[:H, :P]
    s = jnp.transpose(s, (1, 3, 0, 2)).reshape(Hp, Pp)[:H, :P]
    return key, s
