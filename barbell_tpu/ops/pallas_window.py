"""Pallas TPU kernel: per-lane window DP with path summaries.

One kernel family covers the three remaining jnp hot spots of the fused
demux call, all of which are "one pattern against one small window per
lane" DPs:

- ``valley`` mode — alpha-aware end-cost curve + in-kernel top-K valley
  keys and exact counts (the read-boundary windows the bit-parallel
  Myers kernel cannot cover because overhang costs are non-unit).
- ``trace`` mode — flank traceback summaries (alignment start column,
  mask-region text span) captured at each lane's end position.
- ``interval`` mode — barcode-interval mapping (pattern/text span +
  sub-cost) for the winning pattern, captured at the lane's best valley.

Semantics are exactly :func:`barbell_tpu.ops.device.window_dp_summary`
(same move tie-breaking diag > up > left, same edge-inclusion rules) —
enforced by conformance tests in interpret mode.  The whole DP column
state lives in VMEM scratch with a parity ping-pong over text columns;
there are no vector loop carries (Mosaic rejects replicated/varying
relayouts) and no HBM intermediates.

Layout: lanes are (8 sublanes x 128 lanes) = 1024 windows per grid
cell; per-lane pattern bytes and window text ship pre-transposed as
[m, HC, 8, 128] / [W, HC, 8, 128].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .oracle import COST_SCALE

LANES = 128
SUBS = 8
TILE = LANES * SUBS

UNIT = COST_SCALE
BIGK = 2**30
VTOPK = 8  # valley slots per lane in valley mode

MODE_VALLEY = 0
MODE_TRACE = 1
MODE_INTERVAL = 2


def _kernel(pat_ref, win_ref, lane_ref, sc_ref, *rest, m: int, W: int,
            mode: int, ru: int = 8):
    """lane_ref packs per-lane int32 controls [6, HC-block, 8, 128]:
    0 end_j (trace/interval) | emit_lo (valley)
    1 left_edge (0/1)
    2 right_pos (-1 if none)
    3 emit_hi (valley)
    4 w_len (valley: positions past this are invalid)
    sc_ref scalars: [alpha, a_or_iv_lo, b_or_iv_hi, k_scaled, klmul]
    """
    if mode == MODE_VALLEY:
        keys_ref, cnt_ref, c_ref, vk_ref, vs_ref = rest
    elif mode == MODE_TRACE:
        out_ref, c_ref, s0_ref, s1_ref, s2_ref, cap_ref = rest
    else:
        out_ref, c_ref, s0_ref, s1_ref, s2_ref, s3_ref, s4_ref, s5_ref, \
            cap_ref = rest

    shape = (SUBS, LANES)
    unit = jnp.int32(UNIT)
    alpha = sc_ref[0]
    ra = sc_ref[1]  # region_a / iv_a
    rb = sc_ref[2]  # region_b / iv_b (iv_b EXCLUSIVE)
    k_scaled = sc_ref[3]
    klmul = sc_ref[4]

    ledge = lane_ref[1, 0] != 0
    rpos = lane_ref[2, 0]
    step0 = jnp.where(ledge, alpha, unit)

    # ---- column j = 0 ------------------------------------------------
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (m + 1, SUBS, LANES), 0)
    c_ref[0] = iota_i * step0[None]  # boundary: (left_edge ? alpha : 1)*i
    if mode == MODE_TRACE:
        # path to (i, 0) is the up-chain through u = (0,0)..(i-1,0)
        in_r0 = iota_i - 1 >= ra  # any u-row in [ra, rb] iff i-1 >= ra
        s0_ref[0] = jnp.where(in_r0, 0, BIGK)  # region_lo
        s1_ref[0] = jnp.where(in_r0, 0, -1)  # region_hi
        s2_ref[0] = jnp.zeros((m + 1, SUBS, LANES), jnp.int32)  # ts
        cap_ref[...] = jnp.zeros(cap_ref.shape, jnp.int32)
    elif mode == MODE_INTERVAL:
        has0 = (iota_i - 1 >= ra) & (rb > ra)
        ei0 = jnp.minimum(iota_i - 1, rb - 1)
        s0_ref[0] = jnp.where(has0, ra, 0)  # iv_pi
        s1_ref[0] = jnp.zeros((m + 1, SUBS, LANES), jnp.int32)  # iv_pj
        s2_ref[0] = jnp.where(has0, ei0, -1)  # iv_ei
        s3_ref[0] = jnp.where(has0, 0, -1)  # iv_ej
        s4_ref[0] = jnp.where(has0, ei0 - ra + 1, 0)  # iv_cost (ups = nonmatch)
        s5_ref[0] = has0.astype(jnp.int32)  # has_iv
        cap_ref[...] = jnp.zeros(cap_ref.shape, jnp.int32)
    else:
        vk_ref[...] = jnp.full(vk_ref.shape, BIGK, dtype=jnp.int32)
        vs_ref[0] = jnp.full(shape, BIGK, dtype=jnp.int32)  # prv = e[-1]
        elo = lane_ref[0, 0]
        ehi = lane_ref[3, 0]
        e0_raw = c_ref[0][m]
        e0 = jnp.where(
            (0 >= elo) & (0 <= ehi) & (e0_raw <= k_scaled), e0_raw, BIGK
        )
        vs_ref[1] = e0  # e_cur
        vs_ref[2] = jnp.zeros(shape, dtype=jnp.int32)  # count

    if mode in (MODE_TRACE, MODE_INTERVAL):
        # capture lanes whose end position is 0 from the init column
        endj = lane_ref[0, 0]
        hit0 = endj == 0
        if mode == MODE_TRACE:
            srcs0 = (s2_ref, s0_ref, s1_ref)  # ts, rlo, rhi
        else:
            srcs0 = (s1_ref, s3_ref, s0_ref, s2_ref, s4_ref, s5_ref)
        for o, ref in enumerate(srcs0):
            cap_ref[o] = jnp.where(hit0, ref[0][m], cap_ref[o])

    def col_step(j, _):
        parity = j & 1
        prev = 1 - parity
        tchar = win_ref[j - 1, 0].astype(jnp.int32)  # (8, 128)
        vertj = jnp.where(j == rpos, alpha, unit)

        def row_step(i):
            pchar = pat_ref[i - 1, 0].astype(jnp.int32)
            eq = (pchar & tchar) > 0
            cp_im1 = c_ref[prev, i - 1]
            cp_i = c_ref[prev, i]
            cc_im1 = c_ref[parity, i - 1]
            diag = cp_im1 + jnp.where(eq, 0, unit)
            left = cp_i + unit
            up = cc_im1 + vertj
            c = jnp.minimum(jnp.minimum(diag, left), up)
            diag_ok = c == diag
            up_ok = (c == up) & ~diag_ok
            c_ref[parity, i] = c
            if mode == MODE_VALLEY:
                return 0
            # summary sources: diag <- prev[i-1], up <- cur[i-1],
            # left <- prev[i]; then include edge predecessor u.
            u_i = jnp.where(diag_ok | up_ok, i - 1, i)
            u_j = jnp.where(up_ok, j, j - 1)
            if mode == MODE_TRACE:
                refs = (s0_ref, s1_ref, s2_ref)
            else:
                refs = (s0_ref, s1_ref, s2_ref, s3_ref, s4_ref, s5_ref)
            vals = []
            for ref in refs:
                vd = ref[prev, i - 1]
                vu = ref[parity, i - 1]
                vl = ref[prev, i]
                vals.append(
                    jnp.where(diag_ok, vd, jnp.where(up_ok, vu, vl))
                )
            if mode == MODE_TRACE:
                rlo, rhi, ts = vals
                in_r = (u_i >= ra) & (u_i <= rb)
                s0_ref[parity, i] = jnp.minimum(
                    rlo, jnp.where(in_r, u_j, BIGK)
                )
                s1_ref[parity, i] = jnp.maximum(rhi, jnp.where(in_r, u_j, -1))
                s2_ref[parity, i] = jnp.where(u_i == 0, u_j, ts)
            else:
                pi, pj, ei, ej, co, ha = vals
                in_iv = (u_i >= ra) & (u_i < rb)
                first = in_iv & (ha == 0)
                is_match = diag_ok & eq
                s0_ref[parity, i] = jnp.where(first, u_i, pi)
                s1_ref[parity, i] = jnp.where(first, u_j, pj)
                s2_ref[parity, i] = jnp.where(in_iv, u_i, ei)
                s3_ref[parity, i] = jnp.where(in_iv, u_j, ej)
                s4_ref[parity, i] = co + jnp.where(in_iv & ~is_match, 1, 0)
                s5_ref[parity, i] = ha | in_iv.astype(jnp.int32)

        # column boundary cell (0, j): free start, zero state
        c_ref[parity, 0] = tchar * 0
        if mode == MODE_TRACE:
            s0_ref[parity, 0] = tchar * 0 + BIGK
            s1_ref[parity, 0] = tchar * 0 - 1
            s2_ref[parity, 0] = tchar * 0
        elif mode == MODE_INTERVAL:
            z = tchar * 0
            s0_ref[parity, 0] = z
            s1_ref[parity, 0] = z
            s2_ref[parity, 0] = z - 1
            s3_ref[parity, 0] = z - 1
            s4_ref[parity, 0] = z
            s5_ref[parity, 0] = z
        # The row chain is overhead-bound as a plain fori_loop on TPU
        # — each step is a handful of (8, 128) vector ops and the
        # up-dependency forbids vectorizing over i — so unroll it in
        # blocks of ru rows (Mosaic fori_loop itself only supports
        # full/no unroll; full unroll bloats code size, and interpret
        # mode compiles the unrolled body so slowly that callers pass
        # ru=1 there — the row_step sequence is identical either way).
        nb = m // ru

        def row_block(b, _):
            for du in range(ru):
                row_step(b * ru + du + 1)
            return 0

        if nb > 0:
            jax.lax.fori_loop(0, nb, row_block, 0)
        for i in range(nb * ru + 1, m + 1):  # static remainder rows
            row_step(i)

        if mode == MODE_VALLEY:
            elo = lane_ref[0, 0]
            ehi = lane_ref[3, 0]
            wlen = lane_ref[4, 0]
            e_raw = c_ref[parity, m]
            e_next = jnp.where(
                (j <= wlen) & (j >= elo) & (j <= ehi) & (e_raw <= k_scaled),
                e_raw,
                BIGK,
            )
            prv = vs_ref[0]
            e_c = vs_ref[1]
            # valley at j-1: e <= prv and e < next (masked like
            # device._valley_keys; the k filter is folded into masking)
            isv = (e_c < BIGK) & (e_c <= prv) & (e_c < e_next)
            x = jnp.where(isv, e_c * klmul + (j - 1), BIGK)
            for s in range(VTOPK):
                cur = vk_ref[s]
                vk_ref[s] = jnp.minimum(x, cur)
                x = jnp.maximum(x, cur)
            vs_ref[2] = vs_ref[2] + isv.astype(jnp.int32)
            vs_ref[0] = e_c
            vs_ref[1] = e_next
        else:
            endj = lane_ref[0, 0]
            hit = endj == j
            if mode == MODE_TRACE:
                srcs = (s2_ref, s0_ref, s1_ref)
            else:
                srcs = (s1_ref, s3_ref, s0_ref, s2_ref, s4_ref, s5_ref)
            for o, ref in enumerate(srcs):
                cap_ref[o] = jnp.where(hit, ref[parity, m], cap_ref[o])
        return 0

    jax.lax.fori_loop(1, W + 1, col_step, 0)

    if mode == MODE_VALLEY:
        # final valley at j = W (right neighbour +inf)
        prv = vs_ref[0]
        e_c = vs_ref[1]
        isv = (e_c < BIGK) & (e_c <= prv)
        x = jnp.where(isv, e_c * klmul + W, BIGK)
        for s in range(VTOPK):
            cur = vk_ref[s]
            vk_ref[s] = jnp.minimum(x, cur)
            x = jnp.maximum(x, cur)
        cnt = vs_ref[2] + isv.astype(jnp.int32)
        keys_ref[0] = vk_ref[...]
        cnt_ref[0] = cnt
    else:
        out_ref[0] = cap_ref[...]


def _lane_pack(arrs, H):
    """[6?, H] int32 -> [n, HC, 8, 128] control block."""
    n = len(arrs)
    out = jnp.stack([a.astype(jnp.int32) for a in arrs], axis=0)
    return out.reshape(n, H // TILE, SUBS, LANES)


@functools.partial(
    jax.jit, static_argnames=("m", "W", "mode", "interpret")
)
def _window_call(pat_t, win_t, lane_t, scalars, *, m, W, mode, interpret):
    HC = win_t.shape[1]
    grid = (HC,)
    n_sum = {MODE_VALLEY: 0, MODE_TRACE: 3, MODE_INTERVAL: 6}[mode]

    in_specs = [
        pl.BlockSpec((m, 1, SUBS, LANES), lambda h: (0, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((W, 1, SUBS, LANES), lambda h: (0, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((5, 1, SUBS, LANES), lambda h: (0, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    scratch = [pltpu.VMEM((2, m + 1, SUBS, LANES), jnp.int32)]
    if mode == MODE_VALLEY:
        out_specs = [
            pl.BlockSpec((1, VTOPK, SUBS, LANES), lambda h: (h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBS, LANES), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((HC, VTOPK, SUBS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((HC, SUBS, LANES), jnp.int32),
        ]
        scratch += [
            pltpu.VMEM((VTOPK, SUBS, LANES), jnp.int32),
            pltpu.VMEM((3, SUBS, LANES), jnp.int32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((1, n_sum, SUBS, LANES), lambda h: (h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((HC, n_sum, SUBS, LANES), jnp.int32),
        ]
        scratch += [
            pltpu.VMEM((2, m + 1, SUBS, LANES), jnp.int32)
            for _ in range(n_sum)
        ]
        scratch.append(pltpu.VMEM((n_sum, SUBS, LANES), jnp.int32))

    outs = pl.pallas_call(
        functools.partial(_kernel, m=m, W=W, mode=mode,
                          ru=1 if interpret else 8),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(pat_t, win_t, lane_t, scalars)
    return outs


def _to_lane_major(arr2d, H):
    """[H, X] -> [X, HC, 8, 128] (lane h = blk*1024 + sub*128 + lane)."""
    X = arr2d.shape[1]
    return jnp.transpose(arr2d, (1, 0)).reshape(X, H // TILE, SUBS, LANES)


def _from_lane_major(arr, H):
    """[HC, X, 8, 128] -> [H, X]."""
    X = arr.shape[1]
    return jnp.transpose(arr, (0, 2, 3, 1)).reshape(H, X)


def _pad_lanes(H, *arrs2d):
    Hp = ((H + TILE - 1) // TILE) * TILE
    if Hp == H:
        return H, arrs2d
    out = []
    for a in arrs2d:
        pad = jnp.zeros((Hp - H,) + a.shape[1:], dtype=a.dtype)
        out.append(jnp.concatenate([a, pad], axis=0))
    return Hp, tuple(out)


def window_valleys(patterns_h, windows, w_len, left_edge, right_pos,
                   emit_lo, emit_hi, alpha_scaled, k_scaled, klmul,
                   interpret: bool = False):
    """Alpha-aware valley scan per lane: top-VTOPK keys + exact count.

    patterns_h: [H, m] u8 (per-lane pattern); windows: [H, W] u8.
    Key = scaled_cost * klmul + end_position, matching
    device._valley_keys; valleys outside [emit_lo, emit_hi] or past
    w_len are excluded.  Count > VTOPK means dropped valleys.
    """
    H0, m = patterns_h.shape
    _, W = windows.shape
    H, (patterns_h, windows) = _pad_lanes(H0, patterns_h, windows)
    _, (w_len, left_edge, right_pos, emit_lo, emit_hi) = _pad_lanes(
        H0, w_len, left_edge, right_pos, emit_lo, emit_hi
    )
    # padded lanes: empty emit range
    if H != H0:
        sel = jnp.arange(H) < H0
        emit_lo = jnp.where(sel, emit_lo, 1)
        emit_hi = jnp.where(sel, emit_hi, 0)

    pat_t = _to_lane_major(patterns_h, H)
    win_t = _to_lane_major(windows, H)
    lane_t = _lane_pack(
        [emit_lo, left_edge.astype(jnp.int32), right_pos, emit_hi, w_len], H
    )
    scalars = jnp.stack(
        [
            jnp.asarray(alpha_scaled, jnp.int32),
            jnp.int32(0),
            jnp.int32(0),
            jnp.asarray(k_scaled, jnp.int32),
            jnp.asarray(klmul, jnp.int32),
        ]
    )
    keys, cnt = _window_call(
        pat_t, win_t, lane_t, scalars, m=m, W=W, mode=MODE_VALLEY,
        interpret=interpret,
    )
    keys = _from_lane_major(keys, H)[:H0]
    cnt = cnt.reshape(H)[:H0]
    return keys, cnt


def window_trace(patterns_h, windows, end_j, left_edge, right_pos,
                 alpha_scaled, region_a, region_b, interpret: bool = False):
    """(text_start, region_lo, region_hi) at each lane's end position."""
    H0, m = patterns_h.shape
    _, W = windows.shape
    H, (patterns_h, windows) = _pad_lanes(H0, patterns_h, windows)
    _, (end_j, left_edge, right_pos) = _pad_lanes(
        H0, end_j, left_edge, right_pos
    )
    pat_t = _to_lane_major(patterns_h, H)
    win_t = _to_lane_major(windows, H)
    z = jnp.zeros(H, jnp.int32)
    lane_t = _lane_pack(
        [end_j, left_edge.astype(jnp.int32), right_pos, z, z], H
    )
    scalars = jnp.stack(
        [
            jnp.asarray(alpha_scaled, jnp.int32),
            jnp.asarray(region_a, jnp.int32),
            jnp.asarray(region_b, jnp.int32),
            jnp.int32(0),
            jnp.int32(0),
        ]
    )
    (out,) = _window_call(
        pat_t, win_t, lane_t, scalars, m=m, W=W, mode=MODE_TRACE,
        interpret=interpret,
    )
    out = _from_lane_major(out, H)[:H0]  # [H, 3]: ts, rlo, rhi
    return out[:, 0], out[:, 1], out[:, 2]


def window_interval(patterns_h, windows, end_j, iv_a, iv_b,
                    interpret: bool = False):
    """Barcode interval mapping at each lane's end position (plain
    unit-cost semiglobal; no alpha boundaries on barcode windows).
    Returns [H, 6]: iv_pj, iv_ej, iv_pi, iv_ei, iv_cost, has_iv."""
    H0, m = patterns_h.shape
    _, W = windows.shape
    H, (patterns_h, windows) = _pad_lanes(H0, patterns_h, windows)
    _, (end_j,) = _pad_lanes(H0, end_j)
    pat_t = _to_lane_major(patterns_h, H)
    win_t = _to_lane_major(windows, H)
    z = jnp.zeros(H, jnp.int32)
    lane_t = _lane_pack([end_j, z, z - 1, z, z], H)
    scalars = jnp.stack(
        [
            jnp.int32(UNIT),
            jnp.asarray(iv_a, jnp.int32),
            jnp.asarray(iv_b, jnp.int32),
            jnp.int32(0),
            jnp.int32(0),
        ]
    )
    (out,) = _window_call(
        pat_t, win_t, lane_t, scalars, m=m, W=W, mode=MODE_INTERVAL,
        interpret=interpret,
    )
    return _from_lane_major(out, H)[:H0]
