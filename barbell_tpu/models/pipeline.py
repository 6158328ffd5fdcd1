"""Batched TPU demux engine.

Orchestrates the fused device composites in
:mod:`barbell_tpu.ops.composite` over batches of reads and assembles
:class:`BarbellMatch` rows identical to the scalar oracle engine
(:mod:`barbell_tpu.models.demux`) — that equivalence is enforced by
tests.

Per batch the engine issues a handful of fused device calls per group —
one flank scan (Pallas Myers interior + exact alpha boundary windows on
TPU), one flank traceback over both strands' hits, and one barcode-rank
call per strand (dispatched together, fetched together).  Each call
returns a single packed int32 array; the padded row buffer stays
device-resident throughout; input rows ship nibble-packed (2 bases per
byte).

Row coordinate model: a device row holds text in columns
``[tsc, tec]``.  Forward rows are left-aligned (tsc=0); rc rows are
synthesized on device by flip+complement, so their content is
right-aligned (tsc = L - n).  Long reads are split into fixed-width
chunk rows with a halo overlap (``max flank span + PADDING + 2``) so
every within-threshold flank match — and its padded barcode window —
lives entirely inside one chunk row; chunk valid-ranges partition the
read's end positions exactly, so chunked results equal whole-read
results.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import PADDING
from ..ops import composite as comp
from ..ops import oracle
from ..ops.pallas_myers import pattern_words
from ..ops.lodhi import perfect_score
from ..utils import dna
from .barcodes import BarcodeGroup
from .collapse import collapse_overlapping_matches
from .demux import BARCODE_K_FRAC, COLLAPSE_OVERLAP, Demuxer
from .records import BarbellMatch, Strand, rel_dist_to_end

MAX_ROW_LEN = 8192  # chunk width for long reads
MAX_HITS_PER_ROW = 16  # K for valley compaction

# Env-gated phase timing (BARBELL_TIMING=1): accumulates wall-clock per
# pipeline phase into TIMINGS {name: [seconds, calls]}.  Device fetches
# are synchronous at np.asarray, so phases bracketing a fetch include
# device + transfer time.  See CLAUDE.md: profile with this, not with
# repeated-input microbenchmarks.
import contextlib
import os as _os
import time as _time

TIMINGS: Dict[str, List[float]] = {}
_TIMING = _os.environ.get("BARBELL_TIMING", "") not in ("", "0")


@contextlib.contextmanager
def _phase(name: str):
    if not _TIMING:
        yield
        return
    t0 = _time.perf_counter()
    try:
        yield
    finally:
        acc = TIMINGS.setdefault(name, [0.0, 0])
        acc[0] += _time.perf_counter() - t0
        acc[1] += 1


def timing_report() -> str:
    lines = [
        f"  {name:24s} {acc[0]:8.3f}s  n={acc[1]}"
        for name, acc in sorted(TIMINGS.items())
    ]
    return "\n".join(lines)


def engine_map_batches(engine, batches, depth: int = 2):
    """Run ``engine.demux_batch`` over an iterator of (ids, seqs) batches
    with ``depth`` batches in flight on a worker thread.

    Device fetches release the GIL, so one batch's device round trips
    overlap another batch's host work (and each other, with two
    workers) — a simple software pipeline that hides most device
    latency.  Yields (ids, seqs, per_read_matches) in order.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=depth) as pool:
        inflight = deque()
        for ids, seqs in batches:
            inflight.append((ids, seqs, pool.submit(engine.demux_batch, ids, seqs)))
            while len(inflight) > depth:
                bids, bseqs, fut = inflight.popleft()
                yield bids, bseqs, fut.result()
        while inflight:
            bids, bseqs, fut = inflight.popleft()
            yield bids, bseqs, fut.result()


def _pow2_at_least(x: int, lo: int = 8) -> int:
    n = lo
    while n < x:
        n *= 2
    return n


def _ladder_pad(x: int, base: int) -> int:
    """Pad x to a sparse ladder anchored off pow2 boundaries.

    Hit counts hover right at 1/2 and 1x of the batch size, so pow2
    padding flip-flops between sizes batch-to-batch and every flip is a
    fresh XLA compilation (expensive under remote compile).  The ladder
    {5*base/8 * 2^k} sits away from those attractors."""
    n = max((5 * base) // 8, 8)
    while n < x:
        n *= 2
    return n


@dataclass
class _Row:
    strand: Strand
    read_idx: int
    offset: int  # text offset of this row's content within the read
    tsc: int  # text start column within the row
    tec: int  # text end column within the row
    true_start: bool  # row contains the read's true start (at tsc)
    true_end: bool  # row contains the read's true end (at tec)
    lo: int  # valid end-position range, column coords
    hi: int


@dataclass
class _Hit:
    read_idx: int
    strand: Strand
    end_abs: int  # end position in strand-space text coords
    end_col: int  # end position in row column coords
    cost: int  # scaled
    row: int
    row_offset: int
    row_tsc: int
    true_start: bool
    true_end: bool
    tec: int


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
        self.patw, self.W_words, self.top_bit = pattern_words(self.flank)
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
        use_pallas: Optional[bool] = None,
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

        self._on_cpu = jax.devices()[0].platform == "cpu"
        if use_pallas is None:
            # Interpret-mode pallas on CPU is only for targeted tests.
            use_pallas = not self._on_cpu
        # Valley keys must fit int32: cost*UNIT*(L+2)+col.
        max_k = max(p.k_units for p in self.plans)
        if max_k * oracle.COST_SCALE * (max_row_len + 2) >= 2**31:
            use_pallas = False
        self.use_pallas = bool(use_pallas)

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
        self._pad_base = max(B, 8)
        with _phase("encode"):
            fwd = [dna.encode(s) for s in seqs]
        lens = np.array([len(f) for f in fwd], dtype=np.int64)
        if B == 0 or lens.max(initial=0) == 0:
            return [[] for _ in seqs]

        L = int(min(self.max_row_len, max(int(lens.max()), self.halo + 2)))
        L = min(_pow2_at_least(L, lo=256), self.max_row_len)
        if L <= self.halo + PADDING + 2:
            L = min(_pow2_at_least(self.halo + PADDING + 3, lo=256), self.max_row_len)
        step = L - PADDING - self.halo
        assert step > 0

        rows_meta: List[_Row] = []
        host_content: List[np.ndarray] = []
        simple_reads: List[int] = []
        fwd_simple_row: Dict[int, int] = {}
        fwd_cover: Dict[int, List[Tuple[int, int]]] = {}

        # --- simple reads (fit one row) --------------------------------
        for ridx, arr in enumerate(fwd):
            n = len(arr)
            if n == 0 or n > L:
                continue
            fwd_simple_row[ridx] = len(rows_meta)
            simple_reads.append(ridx)
            host_content.append(arr)
            rows_meta.append(_Row(Strand.Fwd, ridx, 0, 0, n, True, True, 0, n))

        # --- long reads: host-built fwd + rc chunk rows ----------------
        def chunk_spans(n: int):
            out = []
            offset = 0
            while True:
                if offset + L >= n:
                    out.append((offset, n - offset, offset == 0, True))
                    return out
                out.append((offset, L, offset == 0, False))
                offset += step

        long_reads = [r for r, arr in enumerate(fwd) if len(arr) > L]
        for ridx in long_reads:
            arr = fwd[ridx]
            n = len(arr)
            rc_arr = dna.reverse_complement_masks(arr)
            cover = []
            for strand, text in ((Strand.Fwd, arr), (Strand.Rc, rc_arr)):
                for offset, length, is_first, is_last in chunk_spans(n):
                    if strand is Strand.Fwd:
                        cover.append((offset, len(rows_meta)))
                    host_content.append(text[offset : offset + length])
                    lo = 0 if is_first else self.halo + 1
                    hi = length if is_last else L - 1 - PADDING
                    rows_meta.append(
                        _Row(strand, ridx, offset, 0, length, is_first, is_last, lo, hi)
                    )
            fwd_cover[ridx] = cover

        R_host = len(rows_meta)
        S = len(simple_reads)
        R_host_pad = _pow2_at_least(max(R_host, 1), lo=8)
        S_pad = _pow2_at_least(max(S, 1), lo=8)
        R_total_pad = R_host_pad + S_pad

        host_rows = np.zeros((R_host_pad, L), dtype=np.uint8)
        for r, content in enumerate(host_content):
            host_rows[r, : len(content)] = content

        simple_idx = np.zeros(S_pad, dtype=np.int32)
        # rc simple rows occupy device rows [R_host_pad, R_host_pad + S)
        row_of_meta: List[int] = list(range(R_host))
        for i, ridx in enumerate(simple_reads):
            simple_idx[i] = fwd_simple_row[ridx]
            n = int(lens[ridx])
            tsc = L - n
            rows_meta.append(_Row(Strand.Rc, ridx, 0, tsc, L, True, True, tsc, L))
            row_of_meta.append(R_host_pad + i)

        start_col = np.full(R_total_pad, -1, dtype=np.int32)
        end_col = np.full(R_total_pad, L + 2, dtype=np.int32)
        lo_arr = np.zeros(R_total_pad, dtype=np.int32)
        hi_arr = np.full(R_total_pad, -1, dtype=np.int32)
        for mi, rowm in enumerate(rows_meta):
            r = row_of_meta[mi]
            start_col[r] = rowm.tsc if rowm.true_start else -1
            end_col[r] = rowm.tec if rowm.true_end else L + 2
            lo_arr[r] = rowm.lo
            hi_arr[r] = rowm.hi

        with _phase("pack_upload"):
            host_packed_dev = jnp.asarray(comp.pack_rows_np(host_rows))

        results: List[List[BarbellMatch]] = [[] for _ in seqs]
        overflow_reads: set = set()

        for gplan in self.plans:
            mk = gplan.m + gplan.k_units
            emit_lo = np.zeros(R_total_pad, dtype=np.int32)
            emit_hi = np.full(R_total_pad, -1, dtype=np.int32)
            for mi, rowm in enumerate(rows_meta):
                r = row_of_meta[mi]
                emit_lo[r] = rowm.tsc + mk + 2 if rowm.true_start else rowm.lo
                emit_hi[r] = min(rowm.hi, rowm.tec - 2) if rowm.true_end else rowm.hi

            with _phase("flank_scan.dispatch"):
                scan = comp.flank_scan(
                jnp.asarray(gplan.flank),
                jnp.asarray(gplan.patw),
                host_packed_dev,
                jnp.asarray(simple_idx),
                jnp.asarray(start_col),
                jnp.asarray(end_col),
                jnp.asarray(lo_arr),
                jnp.asarray(hi_arr),
                jnp.asarray(emit_lo),
                jnp.asarray(emit_hi),
                jnp.int32(self.alpha_scaled),
                K=self.K,
                use_pallas=self.use_pallas,
                interpret=self._on_cpu,
                m=gplan.m,
                k_units=gplan.k_units,
                W_words=gplan.W_words,
                top_bit=gplan.top_bit,
            )
            rows_dev = scan.rows
            with _phase("flank_scan.fetch"):
                packed_np = np.asarray(scan.packed)
            col, cost, valid, count = comp.unpack_flank_scan(packed_np, self.K)

            hits: Dict[Strand, List[_Hit]] = {Strand.Fwd: [], Strand.Rc: []}
            _t_hits = _time.perf_counter() if _TIMING else 0.0
            for mi, rowm in enumerate(rows_meta):
                r = row_of_meta[mi]
                if count[r] > self.K:
                    overflow_reads.add(rowm.read_idx)
                    continue
                for k in range(self.K):
                    if not valid[r, k]:
                        continue
                    c = int(col[r, k])
                    hits[rowm.strand].append(
                        _Hit(
                            read_idx=rowm.read_idx,
                            strand=rowm.strand,
                            end_abs=rowm.offset + (c - rowm.tsc),
                            end_col=c,
                            cost=int(cost[r, k]),
                            row=r,
                            row_offset=rowm.offset,
                            row_tsc=rowm.tsc,
                            true_start=rowm.true_start,
                            true_end=rowm.true_end,
                            tec=rowm.tec,
                        )
                    )

            if _TIMING:
                acc = TIMINGS.setdefault("hit_extract.host", [0.0, 0])
                acc[0] += _time.perf_counter() - _t_hits
                acc[1] += 1
            # Forward hits first, then rc — preserves the scalar engine's
            # per-read row order after assembly.
            live = [
                h
                for strand in (Strand.Fwd, Strand.Rc)
                for h in sorted(hits[strand], key=lambda h: (h.read_idx, h.end_abs))
                if h.read_idx not in overflow_reads
            ]
            if live:
                self._process_hits(
                    gplan,
                    live,
                    rows_dev,
                    fwd_simple_row,
                    fwd_cover,
                    lens,
                    results,
                    read_ids,
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
        self, fwd_simple_row, fwd_cover, ridx: int, bstart: int, bend: int, L: int
    ) -> Tuple[int, int]:
        """(row, offset) of a fwd row fully covering [bstart, bend)."""
        simple = fwd_simple_row.get(ridx)
        if simple is not None:
            return simple, 0
        best = fwd_cover[ridx][0]
        for offset, row in fwd_cover[ridx]:
            if offset <= bstart:
                best = (offset, row)
            else:
                break
        offset, row = best
        assert bend <= offset + L, "barcode window escapes its chunk row"
        return row, offset

    def _process_hits(
        self,
        gplan: _GroupPlan,
        hits: List[_Hit],
        rows_dev,
        fwd_simple_row,
        fwd_cover,
        lens: np.ndarray,
        results: List[List[BarbellMatch]],
        read_ids: List[str],
    ) -> None:
        jnp = self._jnp
        L = int(rows_dev.shape[1])
        H = len(hits)
        H_pad = _ladder_pad(H, 2 * self._pad_base)
        Wf = gplan.span

        # ---- Stage 2: flank traceback (both strands, one call) --------
        row_idx = np.zeros(H_pad, dtype=np.int32)
        win_start = np.zeros(H_pad, dtype=np.int32)
        left_edge = np.zeros(H_pad, dtype=bool)
        right_pos = np.full(H_pad, -1, dtype=np.int32)
        end_j = np.zeros(H_pad, dtype=np.int32)
        hvalid = np.zeros(H_pad, dtype=bool)
        for h, hit in enumerate(hits):
            s_col = max(hit.row_tsc, hit.end_col - Wf)
            row_idx[h] = hit.row
            win_start[h] = s_col
            w_len = hit.end_col - s_col
            end_j[h] = w_len
            left_edge[h] = hit.true_start and s_col == hit.row_tsc
            right_pos[h] = w_len if (hit.true_end and hit.end_col == hit.tec) else -1
            hvalid[h] = True

        with _phase("flank_trace"):
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
        sub: Dict[Strand, List[Tuple[_Hit, int, int, int, int, int]]] = {
            Strand.Fwd: [],
            Strand.Rc: [],
        }
        for h, hit in enumerate(hits):
            if not has_region[h]:
                continue
            n = int(lens[hit.read_idx])
            # window-relative -> strand text coords
            s_text = hit.row_offset + (int(win_start[h]) - hit.row_tsc)
            lo = s_text + int(region_lo[h])
            hi = s_text + int(region_hi[h])
            if hit.strand is Strand.Rc:
                lo, hi = n - hi, n - lo
            bstart = max(0, lo - PADDING)
            bend = min(hi + PADDING, n)
            if bend <= bstart:
                continue
            frow, foff = self._fwd_row_for_window(
                fwd_simple_row, fwd_cover, hit.read_idx, bstart, bend, L
            )
            sub[hit.strand].append(
                (hit, s_text + int(flank_start_w[h]), bstart, bend, frow, foff)
            )

        # ---- Stage 3: barcode rank, one call per strand (async) -------
        pending = []
        for strand in (Strand.Fwd, Strand.Rc):
            entries = sub[strand]
            if not entries:
                continue
            H2_pad = _ladder_pad(len(entries), self._pad_base)
            Wb = gplan.barcode_window
            b_row = np.zeros(H2_pad, dtype=np.int32)
            b_start = np.zeros(H2_pad, dtype=np.int32)
            b_len = np.zeros(H2_pad, dtype=np.int32)
            b_valid = np.zeros(H2_pad, dtype=bool)
            for h, (hit, _fs, bstart, bend, frow, foff) in enumerate(entries):
                b_row[h] = frow
                b_start[h] = bstart - foff  # fwd rows have tsc == 0
                b_len[h] = bend - bstart
                b_valid[h] = True
            with _phase("barcode_rank.dispatch"):
                rank_dev = comp.barcode_rank(
                jnp.asarray(gplan.patterns[strand]),
                rows_dev,
                jnp.asarray(b_row),
                jnp.asarray(b_start),
                jnp.asarray(b_len),
                jnp.asarray(b_valid),
                jnp.int32(gplan.k1_scaled),
                jnp.int32(gplan.rel_bar_start),
                jnp.int32(gplan.rel_bar_end),
                jnp.float32(gplan.perfect),
                jnp.float32(self.min_score),
                jnp.float32(self.min_score_diff),
                m=gplan.plen,
                W=Wb,
                use_pallas=self.use_pallas,
                interpret=self._on_cpu,
            )
            pending.append((strand, entries, rank_dev))

        # ---- Row assembly (fetch both strands' results) ----------------
        # NOTE: assembly must preserve [all fwd hits..., all rc hits...]
        # order per read, which `pending` iteration provides.
        group = gplan.group
        for _strand, entries, rank_dev in pending:
            with _phase("barcode_rank.fetch"):
                rank = np.asarray(rank_dev)
            for h, (hit, flank_start_text, bstart, _bend, _frow, _foff) in enumerate(
                entries
            ):
                n = int(lens[hit.read_idx])
                if hit.strand is Strand.Fwd:
                    fs, fe = flank_start_text, hit.end_abs
                else:
                    fs, fe = oracle.rc_span_to_fwd(flank_start_text, hit.end_abs, n)

                if rank[h, 1] != 0:
                    if rank[h, 7] == 0:
                        raise RuntimeError("No barcode match region found; unusual")
                    barcode = group.barcodes[int(rank[h, 0])]
                    results[hit.read_idx].append(
                        BarbellMatch(
                            read_id=read_ids[hit.read_idx],
                            read_len=n,
                            rel_dist_to_end=rel_dist_to_end(fs, n),
                            read_start_bar=bstart + int(rank[h, 2]),
                            read_end_bar=bstart + int(rank[h, 3]),
                            read_start_flank=fs,
                            read_end_flank=fe,
                            bar_start=bstart + int(rank[h, 4]),
                            bar_end=bstart + int(rank[h, 5]),
                            match_type=barcode.match_type,
                            flank_cost=oracle.cost_to_int(hit.cost),
                            barcode_cost=int(rank[h, 6]),
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
