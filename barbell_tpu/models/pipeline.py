"""Batched TPU demux engine.

Orchestrates the fused device composites in
:mod:`barbell_tpu.ops.composite` over batches of reads and assembles
:class:`BarbellMatch` rows identical to the scalar oracle engine
(:mod:`barbell_tpu.models.demux`) — that equivalence is enforced by
tests.

Per batch the engine issues a handful of fused device calls per
(group, strand) with the padded row buffer staying device-resident
throughout (critical under a ~30ms-round-trip remote TPU):

1. ``flank_scan`` — rc rows are synthesized on device, the flank
   end-cost scan runs over all rows, valleys are compacted to top-K.
2. ``flank_trace`` — per-hit windows are gathered from the row buffer
   on device; the traceback maps the barcode mask region to read
   coordinates.
3. ``barcode_rank`` — barcode windows gathered on device, 96-pattern
   DP, candidate fallback, Lodhi rescoring, min-score selection.

Long reads are split into fixed-width chunk rows with a halo overlap
(``max flank span + PADDING + 2``) so every within-threshold flank
match — and its padded barcode window — lives entirely inside one
chunk row; chunk valid-ranges partition the read's end positions
exactly, so chunked results equal whole-read results.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import PADDING
from ..ops import composite as comp
from ..ops import oracle
from ..ops.lodhi import perfect_score
from ..utils import dna
from .barcodes import BarcodeGroup
from .collapse import collapse_overlapping_matches
from .demux import BARCODE_K_FRAC, COLLAPSE_OVERLAP, Demuxer
from .records import BarbellMatch, Strand, rel_dist_to_end

MAX_ROW_LEN = 8192  # chunk width for long reads
MAX_HITS_PER_ROW = 16  # K for valley compaction


def _pow2_at_least(x: int, lo: int = 8) -> int:
    n = lo
    while n < x:
        n *= 2
    return n


@dataclass
class _Hit:
    read_idx: int
    strand: Strand
    end_abs: int  # absolute end position in strand-space text
    cost: int  # scaled
    row: int  # row index in the device buffer
    row_offset: int  # the row's offset within the strand-space text


class _GroupPlan:
    """Per-group compiled constants."""

    def __init__(self, group: BarcodeGroup):
        if group.k_cutoff is None:
            raise ValueError("BarcodeGroup needs a flank threshold before demuxing")
        self.group = group
        self.flank = np.asarray(group.flank_masks, dtype=np.uint8)
        self.m = len(self.flank)
        self.k_units = int(group.k_cutoff)
        self.k_scaled = oracle.scale_k(self.k_units)
        self.span = oracle.flank_window_span(self.m, self.k_units)
        self.plen = group.pattern_len
        self.k1_scaled = oracle.scale_k(int(self.plen * BARCODE_K_FRAC))
        self.mask_start, self.mask_end = group.bar_region
        pad_start, _ = group.pad_region
        self.rel_bar_start = self.mask_start - pad_start
        self.rel_bar_end = self.mask_end - pad_start
        mask_len = self.mask_end - self.mask_start + 1
        self.barcode_window = mask_len + self.k_units + 2 * PADDING + 2
        self.perfect = perfect_score(group.pad_region[1] - group.pad_region[0])
        self.patterns = {
            Strand.Fwd: np.asarray(group.patterns_fwd, dtype=np.uint8),
            Strand.Rc: np.asarray(group.patterns_rc, dtype=np.uint8),
        }


class _RowPlan:
    """Host bookkeeping for one batch's device row buffer."""

    def __init__(self):
        # per device row: (strand, read_idx, offset, end_col, is_first, lo, hi)
        self.meta: List[Tuple[Strand, int, int, int, bool, int, int]] = []
        # fwd chunk coverage per long read: read_idx -> [(offset, row)]
        self.fwd_cover: Dict[int, List[Tuple[int, int]]] = {}
        # fwd simple row per read
        self.fwd_simple_row: Dict[int, int] = {}


class JaxDemuxEngine:
    def __init__(
        self,
        groups: Sequence[BarcodeGroup],
        alpha: float = 0.4,
        min_score: float = 0.2,
        min_score_diff: float = 0.1,
        max_row_len: int = MAX_ROW_LEN,
        max_hits_per_row: int = MAX_HITS_PER_ROW,
    ):
        import jax  # deferred so the oracle path works without jax

        self._jax = jax
        self._jnp = jax.numpy
        self.groups = list(groups)
        self.alpha = float(alpha)
        self.alpha_scaled = oracle.scale_alpha(alpha)
        self.min_score = float(min_score)
        self.min_score_diff = float(min_score_diff)
        self.max_row_len = max_row_len
        self.K = max_hits_per_row
        self.plans = [_GroupPlan(g) for g in self.groups]
        self.halo = max(p.span for p in self.plans) + PADDING + 2
        self._fallback: Optional[Demuxer] = None

    # ------------------------------------------------------------------

    def _scalar_fallback(self) -> Demuxer:
        if self._fallback is None:
            d = Demuxer(
                alpha=self.alpha,
                min_score=self.min_score,
                min_score_diff=self.min_score_diff,
            )
            for g in self.groups:
                d.add_query_group(g)
            self._fallback = d
        return self._fallback

    # ------------------------------------------------------------------

    def demux_batch(
        self, read_ids: List[str], seqs: List[bytes]
    ) -> List[List[BarbellMatch]]:
        jnp = self._jnp
        B = len(seqs)
        fwd = [dna.encode(s) for s in seqs]
        lens = np.array([len(f) for f in fwd], dtype=np.int64)
        if B == 0 or lens.max(initial=0) == 0:
            return [[] for _ in seqs]

        row_len = int(min(self.max_row_len, max(int(lens.max()), self.halo + 2)))
        row_len = min(_pow2_at_least(row_len, lo=256), self.max_row_len)
        if row_len <= self.halo + PADDING + 2:
            row_len = min(
                _pow2_at_least(self.halo + PADDING + 3, lo=256), self.max_row_len
            )
        step = row_len - PADDING - self.halo
        assert step > 0

        plan = _RowPlan()
        simple_reads: List[int] = []  # read idx per simple row (order)
        host_rows_list: List[Tuple[int, Strand, int, np.ndarray]] = []
        # host rows: fwd simple rows first, then fwd+rc chunk rows of long reads

        def add_meta(strand, ridx, offset, end_col, is_first, lo, hi):
            plan.meta.append((strand, ridx, offset, end_col, is_first, lo, hi))

        # --- simple reads (fit one row) --------------------------------
        for ridx, arr in enumerate(fwd):
            n = len(arr)
            if n == 0 or n > row_len:
                continue
            plan.fwd_simple_row[ridx] = len(plan.meta)
            simple_reads.append(ridx)
            host_rows_list.append((ridx, Strand.Fwd, 0, arr))
            add_meta(Strand.Fwd, ridx, 0, n, True, 0, n)

        # --- long reads: host-built fwd + rc chunk rows ----------------
        def chunk_spans(n: int) -> List[Tuple[int, int, bool, bool]]:
            """(offset, length, is_first, is_last) covering [0, n]."""
            out = []
            offset = 0
            while True:
                if offset + row_len >= n:
                    out.append((offset, n - offset, offset == 0, True))
                    return out
                out.append((offset, row_len, offset == 0, False))
                offset += step

        long_reads = [r for r, arr in enumerate(fwd) if len(arr) > row_len]
        for ridx in long_reads:
            arr = fwd[ridx]
            n = len(arr)
            rc_arr = dna.reverse_complement_masks(arr)
            cover = []
            for strand, text in ((Strand.Fwd, arr), (Strand.Rc, rc_arr)):
                for offset, length, is_first, is_last in chunk_spans(n):
                    row = len(plan.meta)
                    if strand is Strand.Fwd:
                        cover.append((offset, row))
                    host_rows_list.append(
                        (ridx, strand, offset, text[offset : offset + length])
                    )
                    end_col = length if is_last else row_len + 2
                    lo = 0 if is_first else self.halo + 1
                    hi = length if is_last else row_len - 1 - PADDING
                    add_meta(strand, ridx, offset, end_col, is_first, lo, hi)
            plan.fwd_cover[ridx] = cover

        R_host = len(host_rows_list)
        S = len(simple_reads)
        R_host_pad = _pow2_at_least(max(R_host, 1), lo=8)
        S_pad = _pow2_at_least(max(S, 1), lo=8)
        R_total_pad = R_host_pad + S_pad

        host_rows = np.zeros((R_host_pad, row_len), dtype=np.uint8)
        for r, (_ridx, _strand, _off, content) in enumerate(host_rows_list):
            host_rows[r, : len(content)] = content

        simple_idx = np.zeros(S_pad, dtype=np.int32)
        simple_lens = np.zeros(S_pad, dtype=np.int32)
        # rc simple rows appended after host rows, in simple_reads order
        for i, ridx in enumerate(simple_reads):
            simple_idx[i] = plan.fwd_simple_row[ridx]
            simple_lens[i] = lens[ridx]
            add_meta(
                Strand.Rc, ridx, 0, int(lens[ridx]), True, 0, int(lens[ridx])
            )
        # NOTE: rc simple row i sits at device row R_host_pad + i; meta rows
        # for them were appended in order — build a row->meta map:
        row_to_meta: Dict[int, int] = {}
        mi = 0
        for r in range(R_host):
            row_to_meta[r] = mi
            mi += 1
        for i in range(S):
            row_to_meta[R_host_pad + i] = mi
            mi += 1

        end_col = np.full(R_total_pad, row_len + 2, dtype=np.int32)
        is_first = np.zeros(R_total_pad, dtype=bool)
        lo_arr = np.zeros(R_total_pad, dtype=np.int32)
        hi_arr = np.full(R_total_pad, -1, dtype=np.int32)
        for row, mi in row_to_meta.items():
            _strand, _ridx, _off, ecol, first, lo, hi = plan.meta[mi]
            end_col[row] = ecol
            is_first[row] = first
            lo_arr[row] = lo
            hi_arr[row] = hi

        dev_args = dict(
            host_rows=jnp.asarray(host_rows),
            simple_idx=jnp.asarray(simple_idx),
            simple_lens=jnp.asarray(simple_lens),
            end_col=jnp.asarray(end_col),
            is_first=jnp.asarray(is_first),
            lo=jnp.asarray(lo_arr),
            hi=jnp.asarray(hi_arr),
        )

        results: List[List[BarbellMatch]] = [[] for _ in seqs]
        overflow_reads: set = set()

        for gplan in self.plans:
            scan = comp.flank_scan(
                jnp.asarray(gplan.flank),
                dev_args["host_rows"],
                dev_args["simple_idx"],
                dev_args["simple_lens"],
                dev_args["end_col"],
                dev_args["is_first"],
                dev_args["lo"],
                dev_args["hi"],
                jnp.int32(gplan.k_scaled),
                jnp.int32(self.alpha_scaled),
                self.K,
            )
            rows_dev = scan.rows
            pos, cost, valid, count = comp.unpack_flank_scan(
                np.asarray(scan.packed), self.K
            )

            hits: Dict[Strand, List[_Hit]] = {Strand.Fwd: [], Strand.Rc: []}
            for row, mi in row_to_meta.items():
                strand, ridx, offset, _e, _f, _lo, _hi = plan.meta[mi]
                if count[row] > self.K:
                    overflow_reads.add(ridx)
                    continue
                for k in range(self.K):
                    if not valid[row, k]:
                        continue
                    hits[strand].append(
                        _Hit(
                            read_idx=ridx,
                            strand=strand,
                            end_abs=int(offset + pos[row, k]),
                            cost=int(cost[row, k]),
                            row=row,
                            row_offset=offset,
                        )
                    )

            # Forward hits first, then rc — preserves the scalar engine's
            # per-read row order after assembly.
            live = [
                h
                for strand in (Strand.Fwd, Strand.Rc)
                for h in sorted(
                    hits[strand], key=lambda h: (h.read_idx, h.end_abs)
                )
                if h.read_idx not in overflow_reads
            ]
            if live:
                self._process_hits(
                    gplan, live, rows_dev, plan, lens, results, read_ids
                )

        for ridx in overflow_reads:
            results[ridx] = self._scalar_fallback().demux(read_ids[ridx], seqs[ridx])

        out = []
        for ridx in range(B):
            if ridx in overflow_reads:
                out.append(results[ridx])
            else:
                out.append(collapse_overlapping_matches(results[ridx], COLLAPSE_OVERLAP))
        return out

    # ------------------------------------------------------------------

    def _fwd_row_for_window(
        self, plan: _RowPlan, ridx: int, bstart: int, bend: int, row_len: int
    ) -> Tuple[int, int]:
        """(row, offset) of a fwd row fully covering [bstart, bend)."""
        simple = plan.fwd_simple_row.get(ridx)
        if simple is not None:
            return simple, 0
        cover = plan.fwd_cover[ridx]
        best = cover[0]
        for offset, row in cover:
            if offset <= bstart:
                best = (offset, row)
            else:
                break
        offset, row = best
        assert bend <= offset + row_len, "barcode window escapes its chunk row"
        return row, offset

    def _process_hits(
        self,
        gplan: _GroupPlan,
        hits: List[_Hit],
        rows_dev,
        rplan: _RowPlan,
        lens: np.ndarray,
        results: List[List[BarbellMatch]],
        read_ids: List[str],
    ) -> None:
        jnp = self._jnp
        row_len = int(rows_dev.shape[1])
        H = len(hits)
        H_pad = _pow2_at_least(H, lo=8)
        Wf = gplan.span

        # ---- Stage 2: flank traceback ---------------------------------
        row_idx = np.zeros(H_pad, dtype=np.int32)
        win_start = np.zeros(H_pad, dtype=np.int32)
        left_edge = np.zeros(H_pad, dtype=bool)
        right_pos = np.full(H_pad, -1, dtype=np.int32)
        end_j = np.zeros(H_pad, dtype=np.int32)
        hvalid = np.zeros(H_pad, dtype=bool)
        for h, hit in enumerate(hits):
            n = int(lens[hit.read_idx])
            j_local = hit.end_abs - hit.row_offset
            s_local = max(0, j_local - Wf)
            s_abs = hit.row_offset + s_local
            row_idx[h] = hit.row
            win_start[h] = s_local
            left_edge[h] = s_abs == 0
            end_j[h] = j_local - s_local
            right_pos[h] = end_j[h] if hit.end_abs == n else -1
            hvalid[h] = True

        tr = np.asarray(
            comp.flank_trace(
                jnp.asarray(gplan.flank),
                rows_dev,
                jnp.asarray(row_idx),
                jnp.asarray(win_start),
                jnp.asarray(left_edge),
                jnp.asarray(right_pos),
                jnp.asarray(end_j),
                jnp.asarray(hvalid),
                jnp.int32(gplan.mask_start),
                jnp.int32(gplan.mask_end),
                jnp.int32(self.alpha_scaled),
                m=gplan.m,
                W=Wf,
            )
        )
        flank_start_w = tr[:, 0]
        region_lo = tr[:, 1]
        region_hi = tr[:, 2]
        has_region = tr[:, 3] != 0

        # ---- Host: regions -> fwd barcode windows ---------------------
        sub = []  # (hit, flank_start_abs, bstart, bend, fwd_row, fwd_off)
        for h, hit in enumerate(hits):
            if not has_region[h]:
                continue
            n = int(lens[hit.read_idx])
            s_abs = hit.row_offset + int(win_start[h])
            lo = s_abs + int(region_lo[h])
            hi = s_abs + int(region_hi[h])
            if hit.strand is Strand.Rc:
                lo, hi = n - hi, n - lo
            bstart = max(0, lo - PADDING)
            bend = min(hi + PADDING, n)
            if bend <= bstart:
                continue
            frow, foff = self._fwd_row_for_window(
                rplan, hit.read_idx, bstart, bend, row_len
            )
            sub.append((hit, s_abs + int(flank_start_w[h]), bstart, bend, frow, foff))

        if not sub:
            return
        H2 = len(sub)
        H2_pad = _pow2_at_least(H2, lo=8)
        Wb = gplan.barcode_window

        b_row = np.zeros(H2_pad, dtype=np.int32)
        b_start = np.zeros(H2_pad, dtype=np.int32)
        b_len = np.zeros(H2_pad, dtype=np.int32)
        b_valid = np.zeros(H2_pad, dtype=bool)
        strand_sel = np.zeros(H2_pad, dtype=np.int32)
        for h, (hit, _fs, bstart, bend, frow, foff) in enumerate(sub):
            b_row[h] = frow
            b_start[h] = bstart - foff
            b_len[h] = bend - bstart
            b_valid[h] = True
            strand_sel[h] = 0 if hit.strand is Strand.Fwd else 1

        patterns2 = np.concatenate(
            [gplan.patterns[Strand.Fwd], gplan.patterns[Strand.Rc]], axis=0
        )
        rank = np.asarray(
            comp.barcode_rank(
                jnp.asarray(patterns2),
                rows_dev,
                jnp.asarray(b_row),
                jnp.asarray(b_start),
                jnp.asarray(b_len),
                jnp.asarray(strand_sel),
                jnp.asarray(b_valid),
                jnp.int32(gplan.k1_scaled),
                jnp.int32(gplan.rel_bar_start),
                jnp.int32(gplan.rel_bar_end),
                jnp.float32(gplan.perfect),
                jnp.float32(self.min_score),
                jnp.float32(self.min_score_diff),
                m=gplan.plen,
                W=Wb,
            )
        )
        top_idx = rank[:, 0]
        accepted = rank[:, 1] != 0
        rb_start = rank[:, 2]
        rb_end = rank[:, 3]
        p_start = rank[:, 4]
        p_end = rank[:, 5]
        b_cost = rank[:, 6]
        has_iv = rank[:, 7] != 0

        # ---- Row assembly ----------------------------------------------
        group = gplan.group
        for h, (hit, flank_start_abs, bstart, _bend, _frow, _foff) in enumerate(sub):
            n = int(lens[hit.read_idx])
            if hit.strand is Strand.Fwd:
                fs, fe = flank_start_abs, hit.end_abs
            else:
                fs, fe = oracle.rc_span_to_fwd(flank_start_abs, hit.end_abs, n)

            if accepted[h]:
                if not has_iv[h]:
                    raise RuntimeError("No barcode match region found; unusual")
                barcode = group.barcodes[int(top_idx[h])]
                results[hit.read_idx].append(
                    BarbellMatch(
                        read_id=read_ids[hit.read_idx],
                        read_len=n,
                        rel_dist_to_end=rel_dist_to_end(fs, n),
                        read_start_bar=bstart + int(rb_start[h]),
                        read_end_bar=bstart + int(rb_end[h]),
                        read_start_flank=fs,
                        read_end_flank=fe,
                        bar_start=bstart + int(p_start[h]),
                        bar_end=bstart + int(p_end[h]),
                        match_type=barcode.match_type,
                        flank_cost=oracle.cost_to_int(hit.cost),
                        barcode_cost=int(b_cost[h]),
                        label=barcode.label,
                        strand=hit.strand,
                        cuts=None,
                    )
                )
            else:
                results[hit.read_idx].append(
                    BarbellMatch(
                        read_id=read_ids[hit.read_idx],
                        read_len=n,
                        rel_dist_to_end=rel_dist_to_end(fs, n),
                        read_start_bar=fs,
                        read_end_bar=fe,
                        read_start_flank=fs,
                        read_end_flank=fe,
                        bar_start=0,
                        bar_end=0,
                        match_type=group.barcodes[0].match_type.as_flank(),
                        flank_cost=oracle.cost_to_int(hit.cost),
                        barcode_cost=len(group.barcodes[0].seq),
                        label="flank",
                        strand=hit.strand,
                        cuts=None,
                    )
                )
