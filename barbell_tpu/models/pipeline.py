"""Batched TPU demux engine.

Orchestrates the device kernels in :mod:`barbell_tpu.ops.device` over
batches of reads and assembles :class:`BarbellMatch` rows identical to
the scalar oracle engine (:mod:`barbell_tpu.models.demux`) — that
equivalence is enforced by tests.

Data flow per batch:

1. Encode reads to IUPAC masks; build forward and reverse-complement
   views.  Long reads are split into fixed-width chunk rows with a
   ``halo`` overlap of ``m + k + 1`` so every within-threshold flank
   match is found in exactly one chunk's valid end-position range.
2. Per group: one ``flank_ends`` scan over all (fwd+rc) chunk rows, then
   ``find_hits`` valley extraction (top-K per row; K-overflow reads
   fall back to the scalar engine).
3. Per (group, strand): windowed flank traceback (``window_dp`` +
   ``traceback_reduce``) maps the barcode mask region to read
   coordinates; the padded barcode window then goes through the
   96-pattern DP, per-pattern best valley, candidate fallback, a second
   traceback pass fused with Lodhi scoring, and min-score selection.
4. Host: assemble rows in deterministic order (group, then fwd hits by
   end position, then rc hits), collapse overlaps per read.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import PADDING
from ..ops import device as dev
from ..ops import oracle
from ..ops.lodhi import perfect_score
from ..utils import dna
from .barcodes import BarcodeGroup
from .collapse import collapse_overlapping_matches
from .demux import BARCODE_K_FRAC, COLLAPSE_OVERLAP, Demuxer
from .records import BarbellMatch, BarcodeType, Strand, rel_dist_to_end

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
    end: int  # absolute end position in strand-space text
    cost: int  # scaled


class _GroupPlan:
    """Per-group compiled constants."""

    def __init__(self, group: BarcodeGroup, alpha: float):
        if group.k_cutoff is None:
            raise ValueError("BarcodeGroup needs a flank threshold before demuxing")
        self.group = group
        self.flank = np.asarray(group.flank_masks, dtype=np.uint8)
        self.m = len(self.flank)
        self.k_units = int(group.k_cutoff)
        self.k_scaled = oracle.scale_k(self.k_units)
        self.span = oracle.flank_window_span(self.m, self.k_units)
        self.plen = group.pattern_len
        self.k1_units = int(self.plen * BARCODE_K_FRAC)
        self.k1_scaled = oracle.scale_k(self.k1_units)
        mask_start, mask_end = group.bar_region
        self.mask_start = mask_start
        self.mask_end = mask_end
        pad_start, _ = group.pad_region
        self.rel_bar_start = mask_start - pad_start
        self.rel_bar_end = mask_end - pad_start
        mask_len = mask_end - mask_start + 1
        self.barcode_window = mask_len + self.k_units + 2 * PADDING + 2
        self.perfect = perfect_score(group.pad_region[1] - group.pad_region[0])
        self.patterns = {
            Strand.Fwd: np.asarray(group.patterns_fwd, dtype=np.uint8),
            Strand.Rc: np.asarray(group.patterns_rc, dtype=np.uint8),
        }


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
        self.groups = list(groups)
        self.alpha = float(alpha)
        self.alpha_scaled = oracle.scale_alpha(alpha)
        self.min_score = float(min_score)
        self.min_score_diff = float(min_score_diff)
        self.max_row_len = max_row_len
        self.K = max_hits_per_row
        self.plans = [_GroupPlan(g, alpha) for g in self.groups]
        self.halo = max(p.span for p in self.plans)
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
    # Row building (chunking)
    # ------------------------------------------------------------------

    def _build_rows(self, texts: List[np.ndarray], row_len: int):
        """Split texts into chunk rows; returns row metadata arrays."""
        halo = self.halo
        step = row_len - halo - 1
        meta = []  # (text_idx, offset, length, is_first, end_col, lo, hi)
        for tidx, arr in enumerate(texts):
            n = len(arr)
            if n == 0:
                continue
            if n <= row_len:
                meta.append((tidx, 0, n, True, n, 0, n))
                continue
            offset = 0
            while True:
                is_first = offset == 0
                lo = 0 if is_first else halo + 1
                if offset + row_len >= n:
                    length = n - offset
                    meta.append((tidx, offset, length, is_first, length, lo, length))
                    break
                meta.append(
                    (tidx, offset, row_len, is_first, row_len + 2, lo, row_len - 1)
                )
                offset += step
        return meta

    # ------------------------------------------------------------------

    def demux_batch(
        self, read_ids: List[str], seqs: List[bytes]
    ) -> List[List[BarbellMatch]]:
        jnp = self._jax.numpy
        B = len(seqs)
        fwd = [dna.encode(s) for s in seqs]
        rc = [dna.reverse_complement_masks(f) for f in fwd]
        lens = [len(f) for f in fwd]

        texts: Dict[Strand, List[np.ndarray]] = {Strand.Fwd: fwd, Strand.Rc: rc}

        max_len = max(lens) if lens else 0
        if max_len == 0:
            return [[] for _ in seqs]
        row_len = min(self.max_row_len, max(max_len, self.halo + 2))
        row_len = _pow2_at_least(row_len, lo=128)
        row_len = min(row_len, self.max_row_len)
        if row_len <= self.halo + 1:
            row_len = _pow2_at_least(self.halo + 2, lo=128)

        # One row set shared by both strands: rows 0..R-1 fwd, R..2R-1 rc.
        meta_fwd = self._build_rows(fwd, row_len)
        meta_rc = self._build_rows(rc, row_len)
        meta = [(Strand.Fwd, *m) for m in meta_fwd] + [
            (Strand.Rc, *m) for m in meta_rc
        ]
        R = len(meta)
        R_pad = _pow2_at_least(R, lo=8)

        rows_buf = np.zeros((R_pad, row_len), dtype=np.uint8)
        end_col = np.full(R_pad, row_len + 2, dtype=np.int32)
        is_first = np.zeros(R_pad, dtype=bool)
        lo_arr = np.zeros(R_pad, dtype=np.int32)
        hi_arr = np.full(R_pad, -1, dtype=np.int32)
        for r, (strand, tidx, offset, length, first, ecol, lo, hi) in enumerate(meta):
            rows_buf[r, :length] = texts[strand][tidx][offset : offset + length]
            end_col[r] = ecol
            is_first[r] = first
            lo_arr[r] = lo
            hi_arr[r] = hi

        rows_dev = jnp.asarray(rows_buf)
        end_col_dev = jnp.asarray(end_col)
        is_first_dev = jnp.asarray(is_first)
        lo_dev = jnp.asarray(lo_arr)
        hi_dev = jnp.asarray(hi_arr)

        results: List[List[BarbellMatch]] = [[] for _ in seqs]
        overflow_reads: set = set()

        for plan in self.plans:
            ends = dev.flank_ends(
                jnp.asarray(plan.flank),
                rows_dev,
                end_col_dev,
                is_first_dev,
                np.int32(self.alpha_scaled),
            )
            hits_dev = dev.find_hits(
                ends, lo_dev, hi_dev, np.int32(plan.k_scaled), self.K
            )
            pos = np.asarray(hits_dev.pos)
            cost = np.asarray(hits_dev.cost)
            valid = np.asarray(hits_dev.valid)
            count = np.asarray(hits_dev.count)

            hits: Dict[Strand, List[_Hit]] = {Strand.Fwd: [], Strand.Rc: []}
            for r, (strand, tidx, offset, length, first, ecol, lo, hi) in enumerate(
                meta
            ):
                if count[r] > self.K:
                    overflow_reads.add(tidx)
                    continue
                for k in range(self.K):
                    if not valid[r, k]:
                        continue
                    hits[strand].append(
                        _Hit(
                            read_idx=tidx,
                            strand=strand,
                            end=int(offset + pos[r, k]),
                            cost=int(cost[r, k]),
                        )
                    )

            for strand in (Strand.Fwd, Strand.Rc):
                strand_hits = sorted(hits[strand], key=lambda h: (h.read_idx, h.end))
                strand_hits = [
                    h for h in strand_hits if h.read_idx not in overflow_reads
                ]
                if strand_hits:
                    self._process_hits(plan, strand, strand_hits, texts, lens, results, read_ids)

        # Scalar fallback for overflow reads (rare: >K flank valleys).
        for tidx in overflow_reads:
            results[tidx] = self._scalar_fallback().demux(read_ids[tidx], seqs[tidx])

        out = []
        for tidx in range(B):
            if tidx in overflow_reads:
                out.append(results[tidx])
            else:
                out.append(
                    collapse_overlapping_matches(results[tidx], COLLAPSE_OVERLAP)
                )
        return out

    # ------------------------------------------------------------------

    def _process_hits(
        self,
        plan: _GroupPlan,
        strand: Strand,
        hits: List[_Hit],
        texts: Dict[Strand, List[np.ndarray]],
        lens: List[int],
        results: List[List[BarbellMatch]],
        read_ids: List[str],
    ) -> None:
        jnp = self._jax.numpy
        H = len(hits)
        H_pad = _pow2_at_least(H, lo=8)
        Wf = plan.span

        # ---- Stage 2: flank traceback windows -------------------------
        windows = np.zeros((H_pad, Wf), dtype=np.uint8)
        left_edge = np.zeros(H_pad, dtype=bool)
        right_pos = np.full(H_pad, -1, dtype=np.int32)
        end_j = np.zeros((H_pad, 1), dtype=np.int32)
        valid = np.zeros((H_pad, 1), dtype=bool)
        win_start = np.zeros(H_pad, dtype=np.int32)
        for h, hit in enumerate(hits):
            text = texts[strand][hit.read_idx]
            n = len(text)
            s = max(0, hit.end - Wf)
            w_len = hit.end - s
            windows[h, :w_len] = text[s : hit.end]
            left_edge[h] = s == 0
            right_pos[h] = w_len if hit.end == n else -1
            end_j[h, 0] = w_len
            valid[h, 0] = True
            win_start[h] = s

        wdp = dev.window_dp(
            jnp.asarray(plan.flank[None, :]),
            jnp.asarray(windows),
            jnp.asarray(left_edge),
            jnp.asarray(right_pos),
            np.int32(self.alpha_scaled),
        )
        tr = dev.traceback_reduce(
            wdp.moves,
            jnp.asarray(end_j),
            jnp.asarray(valid),
            np.int32(plan.mask_start),
            np.int32(plan.mask_end),
            np.int32(0),
            np.int32(0),
            m=plan.m,
            W=Wf,
        )
        flank_start_w = np.asarray(tr.text_start)[:, 0]
        region_lo = np.asarray(tr.region_lo)[:, 0]
        region_hi = np.asarray(tr.region_hi)[:, 0]
        has_region = np.asarray(tr.has_region)[:, 0]

        # ---- Host: map regions to forward-read barcode windows --------
        sub_hits = []  # (hit, flank_start_abs, bar_win_start, bar_win_len)
        for h, hit in enumerate(hits):
            if not has_region[h]:
                continue
            n = lens[hit.read_idx]
            lo = int(win_start[h] + region_lo[h])
            hi = int(win_start[h] + region_hi[h])
            if strand is Strand.Rc:
                lo, hi = n - hi, n - lo
            bstart = max(0, lo - PADDING)
            bend = min(hi + PADDING, n)
            if bend <= bstart:
                continue
            sub_hits.append((hit, int(win_start[h] + flank_start_w[h]), bstart, bend))

        if not sub_hits:
            return
        H2 = len(sub_hits)
        H2_pad = _pow2_at_least(H2, lo=8)
        Wb = plan.barcode_window

        bwin = np.zeros((H2_pad, Wb), dtype=np.uint8)
        w_len3 = np.zeros(H2_pad, dtype=np.int32)
        for h, (hit, _fs, bstart, bend) in enumerate(sub_hits):
            text = texts[Strand.Fwd][hit.read_idx]
            seg = text[bstart:bend]
            if len(seg) > Wb:
                seg = seg[:Wb]  # defensive; should not happen by construction
            bwin[h, : len(seg)] = seg
            w_len3[h] = len(seg)

        # ---- Stage 3: barcode rank -------------------------------------
        patterns = plan.patterns[strand]
        P = patterns.shape[0]
        bdp = dev.window_dp(
            jnp.asarray(patterns),
            jnp.asarray(bwin),
            jnp.zeros(H2_pad, dtype=bool),
            jnp.full(H2_pad, -1, dtype=np.int32),
            np.int32(dev.UNIT),
        )
        best = dev.best_valley_per_pattern(bdp.ends, jnp.asarray(w_len3))
        bcost = np.asarray(best.cost)
        bpos = np.asarray(best.pos)

        matched = (bcost[:H2] <= plan.k1_scaled).sum(axis=1)
        use_all = matched <= 1
        cand = np.zeros((H2_pad, P), dtype=bool)
        cand[:H2] = np.where(
            use_all[:, None], True, bcost[:H2] <= plan.k1_scaled
        )

        btr = dev.traceback_reduce(
            bdp.moves,
            jnp.asarray(bpos),
            jnp.asarray(cand),
            np.int32(0),
            np.int32(-1),
            np.int32(plan.rel_bar_start),
            np.int32(plan.rel_bar_end),
            m=plan.plen,
            W=Wb,
        )
        lodhi = np.asarray(btr.lodhi)
        iv_pi = np.asarray(btr.iv_pi)
        iv_pj = np.asarray(btr.iv_pj)
        iv_ei = np.asarray(btr.iv_ei)
        iv_ej = np.asarray(btr.iv_ej)
        iv_cost = np.asarray(btr.iv_cost)
        has_iv = np.asarray(btr.has_interval)

        # ---- Selection + row assembly ----------------------------------
        group = plan.group
        for h, (hit, flank_start_abs, bstart, _bend) in enumerate(sub_hits):
            n = lens[hit.read_idx]
            if strand is Strand.Fwd:
                fs, fe = flank_start_abs, hit.end
            else:
                fs, fe = oracle.rc_span_to_fwd(flank_start_abs, hit.end, n)

            scores = np.where(cand[h], lodhi[h] / plan.perfect, -np.inf)
            top = int(np.argmax(scores))
            n_cand = int(cand[h].sum())
            top_norm = float(scores[top])
            if n_cand > 1:
                rest = scores.copy()
                rest[top] = -np.inf
                second_norm = float(rest[int(np.argmax(rest))])
            else:
                second_norm = None

            is_valid = top_norm >= self.min_score
            if second_norm is not None:
                is_valid = is_valid and (top_norm - second_norm) >= self.min_score_diff

            if is_valid:
                if not has_iv[h, top]:
                    raise RuntimeError("No barcode match region found; unusual")
                barcode = group.barcodes[top]
                results[hit.read_idx].append(
                    BarbellMatch(
                        read_id=read_ids[hit.read_idx],
                        read_len=n,
                        rel_dist_to_end=rel_dist_to_end(fs, n),
                        read_start_bar=bstart + int(iv_pj[h, top]),
                        read_end_bar=bstart + int(iv_ej[h, top]) + 1,
                        read_start_flank=fs,
                        read_end_flank=fe,
                        bar_start=bstart + int(iv_pi[h, top]),
                        bar_end=bstart + int(iv_ei[h, top]) + 1,
                        match_type=barcode.match_type,
                        flank_cost=oracle.cost_to_int(hit.cost),
                        barcode_cost=int(iv_cost[h, top]),
                        label=barcode.label,
                        strand=strand,
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
                        strand=strand,
                        cuts=None,
                    )
                )
