"""Pallas TPU kernel: bit-parallel Myers flank scan with in-kernel
valley emission.

The flank end-cost scan is the pipeline's dominant compute.  The jnp
row-scan (ops/device.flank_ends) costs ~15 vector passes per pattern
row over [rows, L]; this kernel instead runs Myers' bit-parallel
recurrence — the whole pattern lives in ``W = ceil(m/32)`` u32 words
per lane, and each text position costs ~30 bit-ops per word on fully
packed (8, 128) VPU tiles with reads as lanes.

Semantics: unit-cost semiglobal search (column-0 boundary = ``i``,
i.e. no overhang alpha).  The alpha-aware boundary windows (first
``m+k+1`` positions and the read-end position) are recomputed exactly
by the caller with the jnp scan and merged — overhang never influences
end-cost values ≤ k outside those windows (see docs/SEMANTICS.md).

Emission: the kernel writes, for every text position j within the
per-lane ``[emit_lo, emit_hi]`` range, the end cost (in edit units) if
position j is a plateau-valley minimum with cost <= k, else 255.
Position 0 is never emitted (requires k < m, true for all flanks).
Valley status is only decided for j in [0, L-1]: a caller passing
``emit_hi == L`` would silently lose a valley ending exactly at the
last row column (every production caller clamps emit_hi <= L-1-PADDING
/ tec-2 for alpha-boundary reasons, so this is unreachable today —
but a new caller must respect the bound).

Layout: text transposed to [L, R/128, 128]; grid (R/1024, L/CL) with
the L dimension innermost so the per-lane state (Pv/Mv words, running
score, trailing cost window) persists across L blocks in scratch.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES  # reads per grid row-block

# Tuning knobs (fixed at import; changing them recompiles).  Swept on
# the v5e bench: UNROLL 16 beats 4/8 by ~25% end-to-end (the fori_loop
# body is overhead-bound); CL 512-2048 within noise.  Both must stay
# powers of two (CL is clamped to L and must stay divisible by UNROLL).
DEFAULT_CL = int(os.environ.get("BARBELL_MYERS_CL", "1024"))
UNROLL = int(os.environ.get("BARBELL_MYERS_UNROLL", "16"))


def pattern_words(pattern_masks: np.ndarray):
    """(words [4, W] uint32, W, top_bit) — per-base membership bitvectors."""
    m = len(pattern_masks)
    W = (m + 31) // 32
    words = np.zeros((4, W), dtype=np.uint32)
    for i, mask in enumerate(pattern_masks):
        w, b = divmod(i, 32)
        for base in range(4):
            if mask & (1 << base):
                words[base, w] |= np.uint32(1 << b)
    return words, W, (m - 1) % 32


TOPK = 8  # in-kernel valley slots per row (topk mode)


def _kernel(patw_ref, k_ref, m_ref, klmul_ref, text_ref, lo_ref, hi_ref,
            *rest, W: int, top_bit: int, CL: int, topk: bool):
    """Myers scan; two output modes:

    - map mode (``topk=False``): per-position valley-cost map (uint8).
    - topk mode: the TOPK lowest (cost*klmul + j) valley keys per row,
      sorted ascending, plus the exact valley count — the XLA-side
      [R, L] key materialization + top_k pass this replaces costs more
      than the whole scan.
    """
    if topk:
        keys_ref, cnt_ref, pv_ref, mv_ref, st_ref, tk_ref = rest
    else:
        out_ref, pv_ref, mv_ref, st_ref = rest
    l_blk = pl.program_id(1)
    n_lblk = pl.num_programs(1)

    @pl.when(l_blk == 0)
    def _init():
        pv_ref[...] = jnp.full(pv_ref.shape, 0xFFFFFFFF, dtype=jnp.uint32)
        mv_ref[...] = jnp.zeros(mv_ref.shape, dtype=jnp.uint32)
        m = m_ref[0]
        st_ref[0] = jnp.full((SUBLANES, LANES), m, dtype=jnp.int32)  # ends[j]
        st_ref[1] = jnp.full((SUBLANES, LANES), 2**20, dtype=jnp.int32)  # ends[j-1]
        if topk:
            st_ref[2] = jnp.zeros((SUBLANES, LANES), dtype=jnp.int32)  # count
            tk_ref[...] = jnp.full(tk_ref.shape, 2**30, dtype=jnp.int32)

    k = k_ref[0]
    klmul = klmul_ref[0]
    emit_lo = lo_ref[...]
    emit_hi = hi_ref[...]
    j0 = l_blk * CL
    # manual unroll (Mosaic fori_loop only supports full/no unroll)
    U = min(UNROLL, CL)
    assert CL % U == 0, (CL, U)

    def step(tu, _):
      for du in range(U):
        t = tu * U + du
        tvec = text_ref[t].astype(jnp.int32)  # (8, 128)
        ta = (tvec & 1) > 0
        tc = (tvec & 2) > 0
        tg = (tvec & 4) > 0
        tt = (tvec & 8) > 0

        sc = jnp.zeros((SUBLANES, LANES), dtype=jnp.uint32)
        ph_in = jnp.zeros((SUBLANES, LANES), dtype=jnp.uint32)
        mh_in = jnp.zeros((SUBLANES, LANES), dtype=jnp.uint32)
        zero = jnp.zeros((SUBLANES, LANES), dtype=jnp.uint32)
        ph_top = zero
        mh_top = zero

        for w in range(W):
            eq = (
                jnp.where(ta, patw_ref[0, w], zero)
                | jnp.where(tc, patw_ref[1, w], zero)
                | jnp.where(tg, patw_ref[2, w], zero)
                | jnp.where(tt, patw_ref[3, w], zero)
            )
            pv = pv_ref[w]
            mv = mv_ref[w]
            xv = eq | mv
            t1 = eq & pv
            s1 = t1 + pv
            c1 = (s1 < t1).astype(jnp.uint32)
            s2 = s1 + sc
            c2 = (s2 < s1).astype(jnp.uint32)
            sc = c1 | c2
            xh = (s2 ^ pv) | eq
            ph = mv | ~(xh | pv)
            mh = pv & xh
            if w == W - 1:
                ph_top = (ph >> top_bit) & 1
                mh_top = (mh >> top_bit) & 1
            ph_s = (ph << 1) | ph_in
            ph_in = ph >> 31
            mh_s = (mh << 1) | mh_in
            mh_in = mh >> 31
            pv_ref[w] = mh_s | ~(xv | ph_s)
            mv_ref[w] = ph_s & xv

        e_cur = st_ref[0]
        e_prev = st_ref[1]
        e_next = e_cur + ph_top.astype(jnp.int32) - mh_top.astype(jnp.int32)

        j = j0 + t  # deciding position j with (e_prev, e_cur, e_next)
        valley = (
            (e_cur <= k)
            & (e_cur <= e_prev)
            & (e_cur < e_next)
            & (j >= emit_lo)
            & (j <= emit_hi)
        )
        if topk:
            # insertion chain: slots stay sorted ascending, spill the max
            x = jnp.where(valley, e_cur * klmul + j, 2**30)
            for s in range(TOPK):
                cur = tk_ref[s]
                tk_ref[s] = jnp.minimum(x, cur)
                x = jnp.maximum(x, cur)
            st_ref[2] = st_ref[2] + valley.astype(jnp.int32)
        else:
            out_ref[t] = jnp.where(valley, e_cur, 255).astype(jnp.uint8)

        st_ref[1] = e_cur
        st_ref[0] = e_next
      return 0

    jax.lax.fori_loop(0, CL // U, step, 0)
    if topk:

        @pl.when(l_blk == n_lblk - 1)
        def _emit():
            keys_ref[0] = tk_ref[...]
            cnt_ref[0] = st_ref[2]


@functools.partial(
    jax.jit, static_argnames=("W", "top_bit", "CL", "interpret", "topk")
)
def _myers_call(patw, k_units, m, klmul, text_t, emit_lo, emit_hi, *, W,
                top_bit, CL, interpret, topk=False):
    L, G, _ = text_t.shape
    R = G * LANES
    grid = (R // TILE, L // CL)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # patw [4, W]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # k [1]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # m [1]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # klmul [1]
        pl.BlockSpec(
            (CL, SUBLANES, LANES), lambda r, l: (l, r, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (SUBLANES, LANES), lambda r, l: (r, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (SUBLANES, LANES), lambda r, l: (r, 0), memory_space=pltpu.VMEM
        ),
    ]
    scratch = [
        pltpu.VMEM((W, SUBLANES, LANES), jnp.uint32),
        pltpu.VMEM((W, SUBLANES, LANES), jnp.uint32),
        pltpu.VMEM((3 if topk else 2, SUBLANES, LANES), jnp.int32),
    ]
    if topk:
        scratch.append(pltpu.VMEM((TOPK, SUBLANES, LANES), jnp.int32))
        out_specs = [
            pl.BlockSpec(
                (1, TOPK, SUBLANES, LANES), lambda r, l: (r, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda r, l: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((R // TILE, TOPK, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((R // TILE, SUBLANES, LANES), jnp.int32),
        ]
    else:
        out_specs = pl.BlockSpec(
            (CL, SUBLANES, LANES), lambda r, l: (l, r, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((L, G, LANES), jnp.uint8)

    return pl.pallas_call(
        functools.partial(_kernel, W=W, top_bit=top_bit, CL=CL, topk=topk),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(patw, k_units, m, klmul, text_t, emit_lo, emit_hi)


def myers_valleys(
    pattern_masks,  # np.uint8 [m] (host constant)
    rows,  # jnp [R, L] uint8
    emit_lo,  # jnp [R] int32
    emit_hi,  # jnp [R] int32
    k_units: "jnp.ndarray",  # int32 scalar array
    CL: int = DEFAULT_CL,
    interpret: bool = False,
):
    """Valley-cost map [R, L] uint8 (cost in edit units, 255 = none)."""
    patw_np, W, top_bit = pattern_words(np.asarray(pattern_masks))
    return myers_valleys_from_words(
        jnp.asarray(patw_np), W, top_bit, len(pattern_masks), rows,
        emit_lo, emit_hi, k_units, CL=CL, interpret=interpret,
    )


def myers_valleys_from_words(
    patw,  # [4, W] uint32 (array; may be traced)
    W: int,
    top_bit: int,
    m: int,
    rows,
    emit_lo,
    emit_hi,
    k_units,
    CL: int = DEFAULT_CL,
    interpret: bool = False,
):
    """As :func:`myers_valleys` but with precomputed pattern words
    (jit-traceable)."""
    R0, L = rows.shape
    R = ((R0 + TILE - 1) // TILE) * TILE
    if R != R0:  # pad with dead lanes (emission range empty)
        rows = jnp.concatenate(
            [rows, jnp.zeros((R - R0, L), dtype=rows.dtype)], axis=0
        )
        emit_lo = jnp.concatenate(
            [emit_lo, jnp.ones(R - R0, dtype=emit_lo.dtype)], axis=0
        )
        emit_hi = jnp.concatenate(
            [emit_hi, jnp.zeros(R - R0, dtype=emit_hi.dtype)], axis=0
        )
    CL = min(CL, L)
    assert L % CL == 0, (L, CL)

    text_t = jnp.transpose(rows, (1, 0)).reshape(L, R // LANES, LANES)
    lo2 = emit_lo.reshape(R // LANES, LANES)
    hi2 = emit_hi.reshape(R // LANES, LANES)
    out = _myers_call(
        patw,
        jnp.asarray(k_units, dtype=jnp.int32).reshape(1),
        jnp.full((1,), m, dtype=jnp.int32),
        jnp.zeros(1, dtype=jnp.int32),  # klmul unused in map mode
        text_t,
        lo2.astype(jnp.int32),
        hi2.astype(jnp.int32),
        W=W,
        top_bit=top_bit,
        CL=CL,
        interpret=interpret,
    )
    return jnp.transpose(out.reshape(L, R), (1, 0))[:R0]


def myers_topk_from_words(
    patw,  # [4, W] uint32
    W: int,
    top_bit: int,
    m: int,
    rows,  # [R, L] uint8
    emit_lo,
    emit_hi,
    k_units,
    klmul: int,  # key multiplier: key = cost_units * klmul + position
    CL: int = DEFAULT_CL,
    interpret: bool = False,
):
    """In-kernel top-K: (keys [R, TOPK] int32 sorted ascending with
    2**30 sentinels, count [R] int32 exact valley count).  Rows with
    more than TOPK valleys keep only the best TOPK — callers must treat
    ``count > TOPK`` as overflow."""
    R0, L = rows.shape
    R = ((R0 + TILE - 1) // TILE) * TILE
    if R != R0:
        rows = jnp.concatenate(
            [rows, jnp.zeros((R - R0, L), dtype=rows.dtype)], axis=0
        )
        emit_lo = jnp.concatenate(
            [emit_lo, jnp.ones(R - R0, dtype=emit_lo.dtype)], axis=0
        )
        emit_hi = jnp.concatenate(
            [emit_hi, jnp.zeros(R - R0, dtype=emit_hi.dtype)], axis=0
        )
    CL = min(CL, L)
    assert L % CL == 0, (L, CL)

    text_t = jnp.transpose(rows, (1, 0)).reshape(L, R // LANES, LANES)
    lo2 = emit_lo.reshape(R // LANES, LANES)
    hi2 = emit_hi.reshape(R // LANES, LANES)
    keys, cnt = _myers_call(
        patw,
        jnp.asarray(k_units, dtype=jnp.int32).reshape(1),
        jnp.full((1,), m, dtype=jnp.int32),
        jnp.full((1,), klmul, dtype=jnp.int32),
        text_t,
        lo2.astype(jnp.int32),
        hi2.astype(jnp.int32),
        W=W,
        top_bit=top_bit,
        CL=CL,
        interpret=interpret,
        topk=True,
    )
    # [R/TILE, TOPK, 8, 128] -> [R, TOPK]; lane r = blk*1024 + sub*128 + lane
    keys = jnp.transpose(keys, (0, 2, 3, 1)).reshape(R, TOPK)[:R0]
    cnt = cnt.reshape(R)[:R0]
    return keys, cnt