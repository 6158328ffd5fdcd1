"""One-shot kit pipeline: annotate -> inspect -> filter -> trim.

Mirrors the reference runner (`src/kits/use_kit.rs:11-109`): writes
``annotation.tsv``, ``pattern_per_read.tsv``, ``filtered.tsv`` and
per-label trimmed FASTQs into the output folder, using the kit's
safe or maximize filter preset.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence

from ..kits.database import get_kit_info
from ..kits.presets import preset_patterns
from .annotate import AnnotateConfig, annotate_with_kit
from .filter import filter_annotations
from .inspect import inspect
from .pattern import pattern_from_str
from .trim import LabelConfig, trim_matches


@dataclass
class KitRunConfig:
    kit_name: str
    output_folder: str
    threads: int = 10
    maximize: bool = False
    verbose: bool = False
    min_score: float = 0.2
    min_score_diff: float = 0.1
    max_flank_errors: Optional[int] = None
    failed_out: Optional[str] = None
    use_extended: bool = False
    alpha: float = 0.4
    gzip: bool = False
    backend: str = "auto"
    batch_size: int = 2048
    # Fused one-pass pipeline (annotate+inspect+filter+trim per batch,
    # byte-identical stage files).  Verbose runs use the staged path so
    # the per-stage `{step}.{ms}.log` files keep their contract.
    stream: bool = True
    # Kit presets position-bound every element (@left/@right/@prev_left
    # windows, kits.rs:175-236), so by default long reads ship only
    # their end windows to the device (SURVEY §5.7 fast path; W derived
    # from the active patterns by ends_window_for_patterns).  Mid-read
    # flank hits — which the presets reject positionally — then never
    # reach annotation.tsv, so a read carrying one can pass the filter
    # where the full scan's all-rows-covered rule would drop it (see
    # docs/SEMANTICS.md).  full_scan=True (--full-scan) restores the
    # reference's whole-read scan; --use-extended implies it (fusion
    # templates exist to FIND mid-read constructs).
    full_scan: bool = False


def _ends_bounds(patterns, groups):
    """Positional end-depth bounds of the given filter patterns, or
    ``None`` when some element is not positionally bounded (full scan
    required).

    Returns ``(first, right, deep, chain_hi, ext, halo)``:

    * ``first`` — max flank-end depth of any chain's FIRST link (an
      ``@left(a..b)`` element: read_start_bar <= b, so its flank ends
      by ``b + ext`` where ``ext = flank_len + k`` bounds one match's
      on-read extent)
    * ``right`` — max flank-end depth from the read's RIGHT end of any
      ``@right(a..b)`` element (depth ``b + ext`` covers its start too)
    * ``deep`` — max flank-end depth of any FULL ``@prev_left`` chain
      (each link chains off the previous element's end bound)
    * ``chain_hi`` — max ``@prev_left`` upper bound (the two-tier
      rescue trigger's reach)
    * ``ext``/``halo`` — the engine extent/halo constants

    Matches the positional semantics of
    :func:`barbell_tpu.stages.pattern.match_pattern` (reference
    `src/filter/pattern.rs:205-240`); preset windows at
    `src/kits/kits.rs:175-236`."""
    from .. import PADDING
    from ..ops import oracle

    if not groups or any(g.k_cutoff is None for g in groups):
        return None
    ext = max(len(g.flank_masks) + int(g.k_cutoff) for g in groups)
    halo = max(
        oracle.flank_window_span(len(g.flank_masks), int(g.k_cutoff))
        for g in groups
    ) + PADDING + 2
    first = right = deep = chain_hi = 0
    for pat in patterns:
        prev = None  # end-position bound of the previous element
        for el in pat.elements:
            if el.relative_to == "left":
                prev = el.range[1] + ext
                first = max(first, prev)
            elif el.relative_to == "prev_left":
                if prev is None:
                    # unanchored prev_left auto-matches (match_pattern),
                    # so the element is unbounded
                    return None
                chain_hi = max(chain_hi, el.range[1])
                prev = prev + el.range[1] + ext
            elif el.relative_to == "right":
                right = max(right, el.range[1] + ext)
                prev = None  # a prev_left after @right would be unbounded
                continue
            else:
                return None  # positionally unconstrained element
            deep = max(deep, prev)
    return first, right, deep, chain_hi, ext, halo


def _round_w(depth: int, halo: int) -> int:
    """Window for an end-depth bound: + halo + 1 (rc-strand claims are
    ``halo`` shallower than forward claims — see twotier module doc),
    rounded to 128-base granularity: every base of W is shipped per
    long read over the ~30MB/s tunnel (the binding resource — round-4
    A/Bs), so W hugs the derived depth, while the compiled-shape
    universe stays bounded because the engine's row width is pow2(W)
    and the W values themselves are preset-derived constants.

    Tightness (round-5 analysis): ``depth`` is an END bound (b + ext)
    while the binding rc-claim condition is START-based (flank start <=
    b suffices), so the pure DISCOVERY bound would be ``b + halo + 1``
    — ~ext (~110 bases for RBK) shallower.  That slack is NOT shaved:
    the two-tier rescue trigger fires when a visible flank end is
    within ``chain_hi + halo + 1`` of W1, so W1 needs ext-sized
    headroom above the typical first-link flank end (~130 for RBK) or
    EVERY read rescues (measured 0/96 triggers at W1=512, every read
    at 384).  For no-chain presets (NBD safe) the tight and current
    values round to the same 128-granule.  tests/test_ends.py
    ``test_claim_boundary_exact`` pins the exact claim edges on both
    strands/sides."""
    return -(-(depth + halo + 1) // 128) * 128


def ends_window_for_patterns(patterns, groups) -> Optional[int]:
    """Single-tier symmetric ends window W covering every hit the
    patterns can accept (incl. full ``@prev_left`` chains), or ``None``
    when a pattern is not positionally bounded.  The kit runner now
    uses :func:`ends_plan_for_patterns` (per-side + two-tier); this is
    the conservative one-window form (``annotate --ends-window`` docs,
    tests)."""
    b = _ends_bounds(patterns, groups)
    if b is None:
        return None
    first, right, deep, _chain_hi, _ext, halo = b
    W = _round_w(max(first, right, deep), halo)
    if W > 8192:  # exceeds the engine row-width ceiling: no benefit
        return None
    return W


def ends_plan_for_patterns(patterns, groups):
    """Per-side, two-tier ends-scan plan (round 5): every read scans at
    the shallow symmetric window W1 (first-link + ``@right`` bounds);
    if some pattern chains deeper via ``@prev_left``, triggered reads
    re-scan at ``(W_deep, W1)`` — only the PREFIX side carries chain
    depth (chains anchor left; a ``@prev_left`` after ``@right`` is
    unbounded and returns None = full scan).  See
    :class:`barbell_tpu.models.twotier.EndsPlan` for the contract.
    Returns ``None`` when positionally unbounded."""
    from ..models.twotier import EndsPlan

    b = _ends_bounds(patterns, groups)
    if b is None:
        return None
    first, right, deep, chain_hi, _ext, halo = b
    W1 = _round_w(max(first, right), halo)
    W2 = _round_w(deep, halo)
    if max(W1, W2) > 8192:
        return None
    if W2 > W1:
        return EndsPlan(
            shallow=(W1, W1),
            deep=(W2, W1),
            trigger_margin=chain_hi + halo + 1,
        )
    return EndsPlan(shallow=(W1, W1))


def demux_using_kit(fastq_files: Sequence[str], config: KitRunConfig) -> None:
    out = config.output_folder
    os.makedirs(out, exist_ok=True)

    kit_info = get_kit_info(config.kit_name)

    print("\nKit info")
    print(f"Kit name: {kit_info.name}")
    print(f"Kit type: {'Maximize' if config.maximize else 'Safe'}")
    for tmpl in kit_info.templates:
        print(f"Barcodes: {tmpl.barcodes.from_label} - {tmpl.barcodes.to_label}")

    annotate_config = AnnotateConfig(
        max_flank_errors=config.max_flank_errors,
        alpha=config.alpha,
        n_threads=config.threads,
        verbose=config.verbose,
        min_score=config.min_score,
        min_score_diff=config.min_score_diff,
        use_extended=config.use_extended,
        backend=config.backend,
        batch_size=config.batch_size,
    )

    if not config.full_scan and not config.use_extended:
        from ..models.barcodes import BarcodeGroup
        from ..ops.edit_model import get_edit_cut_off
        from .pattern import pattern_from_str as _pfs

        wgroups = BarcodeGroup.from_kit(config.kit_name, False)
        for g in wgroups:
            g.set_flank_threshold(
                config.max_flank_errors
                if config.max_flank_errors is not None
                else get_edit_cut_off(g.get_effective_len())
            )
        wpats = [
            _pfs(s)
            for s in preset_patterns(kit_info.pattern_class, config.maximize)
        ]
        plan = ends_plan_for_patterns(wpats, wgroups)
        annotate_config.ends_window = plan
        if plan is not None:
            msg = (
                f"Ends-only scan: long reads ship their first/last "
                f"{plan.shallow[0]} bases"
            )
            if plan.deep:
                msg += (
                    f" (+ deep {plan.deep[0]}-base left rescan for "
                    f"chain-boundary reads)"
                )
            print(
                msg + " (preset windows are positional; --full-scan "
                "restores whole-read scanning)"
            )

    if config.stream and not config.verbose:
        _demux_using_kit_streaming(fastq_files, config, kit_info, annotate_config)
        return

    print("\nAnnotating reads...")
    annotation_tsv = os.path.join(out, "annotation.tsv")
    annotate_with_kit(fastq_files, annotation_tsv, config.kit_name, annotate_config)

    print("\nTop 10 most common patterns")
    inspect(
        annotation_tsv,
        top_n=10,
        read_pattern_out=os.path.join(out, "pattern_per_read.tsv"),
        bucket_size=250,
    )
    print(
        f"Want to see more patterns? Run: `barbell-tpu inspect -i {annotation_tsv} -n 100`"
    )

    print("\nFiltering reads...")
    pattern_strs = preset_patterns(kit_info.pattern_class, config.maximize)
    patterns = [pattern_from_str(p) for p in pattern_strs]
    filtered_tsv = os.path.join(out, "filtered.tsv")
    filter_annotations(
        annotation_tsv, filtered_tsv, patterns, None, verbose=config.verbose
    )

    print("\nTrimming reads...")
    label_config = LabelConfig(
        include_label=True,
        include_orientation=False,
        include_flank=False,
        sort_labels=False,
        only_side="left",
    )
    trim_matches(
        filtered_tsv,
        fastq_files,
        out,
        label_config=label_config,
        failed_out=config.failed_out,
        write_full_header=True,
        skip_trim=False,
        flip=False,
        verbose=config.verbose,
        use_gzip=config.gzip,
        # Threaded writers only pay off when gzip is the bottleneck;
        # plain writes are raw-I/O bound and the queue hop just adds cost.
        threads=config.threads if config.gzip else 1,
    )

    print("\nDone!")


def _demux_using_kit_streaming(
    fastq_files: Sequence[str],
    config: KitRunConfig,
    kit_info,
    annotate_config: AnnotateConfig,
) -> None:
    """Fused one-pass kit pipeline.

    The staged runner mirrors the reference's four serial file passes
    (`src/kits/use_kit.rs:11-109`): annotate writes annotation.tsv, then
    inspect/filter re-read it, then trim re-reads the raw FASTQs.  On a
    device backend that wastes the pipeline's idle host time: while a
    batch's device calls are in flight, the host could already be
    inspecting/filtering/trimming earlier batches.  This runner streams
    every stage per batch — inspect renders BEFORE filter mutates cuts
    (inspect reads annotation.tsv pre-cuts in the staged path), trim
    slices the in-memory seq/qual instead of re-reading ~2x the input
    bytes — and still writes byte-identical annotation.tsv,
    pattern_per_read.tsv, filtered.tsv, and per-label FASTQs
    (enforced by tests/test_stages.py).

    Grouping: a "run" merges annotation rows of same-id reads delimited
    only by a DIFFERENT-id read that itself has rows — exactly the
    consecutive-read_id row grouping the staged inspect/filter see in
    annotation.tsv (zero-match reads contribute no rows there, so they
    never split a staged group and must not split a run).  inspect and
    filter outputs are therefore byte-identical for every input.  Trim
    hands a record the live run's annotations iff its id matches; the
    staged trim instead keys a whole-file map, so trim output can
    differ only for (malformed) inputs whose read ids recur outside
    their own run — see docs/SEMANTICS.md deviations.

    Round 5: the per-batch work is COLUMNAR (kit_columnar helpers) —
    structure labels, filter matching, cut slicing and TSV lines come
    straight from the engine's HitTable with no per-hit objects; only
    runs that actually merge multiple reads' rows (duplicate ids,
    outside the parity contract's common case) fall back to the object
    path.  Byte-identity streamed == staged enforced by
    tests/test_stages.py either way.
    """
    from collections import Counter, deque

    from ..models.barcodes import BarcodeGroup
    from ..models.hittable import emit_tsv_lines
    from ..models.pipeline import engine_map_batches
    from ..models.records import AnnotationWriter
    from ..utils.fastx import split_fastq_header, validate_fastq_paths
    from ..utils.fastx_native import iter_fastq_batches_auto
    from ..utils.progress import TRIM_METRICS, ProgressTracker
    from .annotate import _apply_flank_threshold, _make_engine
    from .inspect import get_group_structure, print_pattern_summary
    from .filter import check_filter_pass
    from .kit_columnar import (
        CompiledPatterns,
        StructureLabeler,
        TableAdapter,
        batch_trim_plan,
        cut_strings,
        kit_slice_label,
        matches_for_rows,
        segment_table,
        trim_slices,
    )
    from .trim import _ThreadedWriterPool, _WriterPool, process_read_and_anno

    out = config.output_folder
    groups = BarcodeGroup.from_kit(config.kit_name, config.use_extended)
    for i, group in enumerate(groups):
        print(f"{group.barcode_type.as_str()}: {i}")
        group.display(5)
    groups = _apply_flank_threshold(groups, annotate_config)
    engine = _make_engine(groups, annotate_config)
    if not hasattr(engine, "demux_batch_table"):
        engine = TableAdapter(engine, groups)

    pattern_strs = preset_patterns(kit_info.pattern_class, config.maximize)
    patterns = [pattern_from_str(p) for p in pattern_strs]
    label_config = LabelConfig(
        include_label=True,
        include_orientation=False,
        include_flank=False,
        sort_labels=False,
        only_side="left",
    )

    print("\nProcessing reads (fused annotate+inspect+filter+trim)...")
    validate_fastq_paths(fastq_files)

    meta_queue: deque = deque()  # per-batch (descs, quals)

    def batches():
        for batch in iter_fastq_batches_auto(fastq_files, config.batch_size):
            ids, descs, seqs, quals = [], [], [], []
            for h, s, q in batch:
                rid, desc = split_fastq_header(h)
                ids.append(rid)
                descs.append(desc)
                seqs.append(s)
                quals.append(q)
            meta_queue.append((descs, quals))
            yield ids, seqs

    progress = ProgressTracker(TRIM_METRICS)
    TOTAL, KEPT, SPLIT, FAILED = 0, 1, 2, 3
    pattern_count: Counter = Counter()
    bucket_size = 250
    labeler = StructureLabeler(bucket_size)
    cpats = CompiledPatterns(patterns, engine.labels)

    anno_fh = open(os.path.join(out, "annotation.tsv"), "w")
    anno_writer = AnnotationWriter(anno_fh)
    ppr_fh = open(os.path.join(out, "pattern_per_read.tsv"), "w")
    filt_fh = open(os.path.join(out, "filtered.tsv"), "w")
    filt_writer = AnnotationWriter(filt_fh)
    failed_fh = open(config.failed_out, "w") if config.failed_out else None
    n_threads = config.threads if config.gzip else 1
    if n_threads > 1:
        writers = _ThreadedWriterPool(out, config.gzip, n_threads)
    else:
        writers = _WriterPool(out, config.gzip)

    # One run in flight.  members holds per member read-with-rows a
    # (table, seg_start, seg_len, label, win, passed, lines, rsf, ref,
    # row_labels, trim_plan) context; recs the run's FASTQ records
    # (including same-id records that contributed no rows — the staged
    # trim's id map hands those the run's annotations too).
    # Single-member runs (unique read ids — every well-formed input)
    # flush columnar; multi-member runs merge rows and fall back to
    # the object path.
    pend_id: Optional[str] = None
    pend_members: list = []
    pend_recs: list = []
    # Per-batch output buffers: the profiled runner spent ~35% of its
    # host time in per-read TSV writes (16k write_lines calls/run);
    # buffering them to one write per batch is byte-identical (order
    # preserved; the dirty-run object path flushes first).
    ppr_buf: list = []
    filt_buf: list = []
    # winning-pattern cut strings depend only on (pattern, row count)
    cut_str_cache: dict = {}

    def drain_bufs() -> None:
        if ppr_buf:
            ppr_fh.write("".join(ppr_buf))
            ppr_buf.clear()
        if filt_buf:
            filt_writer.write_lines(filt_buf)
            filt_buf.clear()
    # A run's records stay buffered until the run closes; bound the
    # buffer so a (malformed) file of millions of same-id records
    # cannot exhaust memory — the forced flush only affects grouping
    # for inputs already outside the parity contract.
    _RUN_CAP = 100_000

    def write_trimmed(results, desc) -> None:
        if results:
            progress.inc(KEPT)
        else:
            progress.inc(FAILED)
            if failed_fh is not None:
                failed_fh.write(pend_id + "\n")
        if len(results) > 1:
            progress.inc(SPLIT)
        for tseq, tqual, grp, suffix in results:
            w = writers.get(grp)
            header = f"{pend_id}{suffix} {desc}" if desc else f"{pend_id}{suffix}"
            w.write_record(header.encode("ascii"), bytes(tseq), bytes(tqual))

    def flush_run() -> None:
        if pend_id is None or not pend_members:
            return
        if len(pend_members) > 1:
            # duplicate-id run: merge rows, object path (parity)
            drain_bufs()  # keep file order ahead of direct writes
            rows = []
            for member in pend_members:
                table, s, l = member[0], member[1], member[2]
                rows.extend(matches_for_rows(table, s, l))
            label = get_group_structure(rows, bucket_size)
            ppr_fh.write(f"{pend_id}\t{label}\n")
            pattern_count[label] += 1
            if not check_filter_pass(rows, patterns):
                return
            filt_writer.write_rows(rows)
            for desc, seq, qual in pend_recs:
                write_trimmed(
                    process_read_and_anno(
                        seq, qual, rows, label_config,
                        skip_trim=False, flip=False,
                    ),
                    desc,
                )
            return
        (table, s, l, label, win, passed, lines, rsf, ref_,
         row_labels, trim) = pend_members[0]
        ppr_buf.append(f"{pend_id}\t{label}\n")
        pattern_count[label] += 1
        if not passed:
            return
        cuts = cpats.cuts[win]
        cstrs = cut_str_cache.get((win, l))
        if cstrs is None:
            cstrs = cut_str_cache[(win, l)] = cut_strings(cuts, l)
        filt_buf.extend(line + cs for line, cs in zip(lines, cstrs))
        if trim is not None:
            # preset cut shape: bounds/label precomputed vectorized for
            # the whole batch (batch_trim_plan); en -1 = to record end
            st, en, lab = trim
            for desc, seq, qual in pend_recs:
                e = len(seq) if en < 0 else en
                if st >= e:
                    write_trimmed([], desc)
                else:
                    write_trimmed(
                        [(seq[st:e], qual[st:e], lab, "")], desc
                    )
            return
        for desc, seq, qual in pend_recs:
            results = []
            for slice_count, (st, en, rows_idx) in enumerate(
                trim_slices(cuts, rsf, ref_, len(seq))
            ):
                if st >= en:
                    continue
                suffix = "" if slice_count == 0 else f"_{slice_count}"
                results.append(
                    (
                        seq[st:en],
                        qual[st:en],
                        kit_slice_label(rows_idx, row_labels),
                        suffix,
                    )
                )
            write_trimmed(results, desc)

    try:
        for ids, seqs, table in engine_map_batches(
            engine, batches(), method="demux_batch_table"
        ):
            descs, quals = meta_queue.popleft()
            lines = emit_tsv_lines(table)
            anno_writer.write_lines(lines)
            seg_start, seg_len = segment_table(table)
            slabels = labeler.labels(table, seg_start, seg_len)
            win, passed = cpats.match(table, seg_start, seg_len)
            seg_start_l = seg_start.tolist()
            seg_len_l = seg_len.tolist()
            win_l = win.tolist()
            passed_l = passed.tolist()
            # batch-level Python lists: per-read numpy slicing in the
            # flush path was ~10us/read of pure overhead on the 1-core
            # host (profiled bench_r05/profile_kit.txt)
            tcols = table.cols
            rsf_l = tcols["rsf"].tolist()
            ref_l = tcols["ref"].tolist()
            tlabels = table.labels
            rowlab_l = [tlabels[k] for k in tcols["label"].tolist()]
            tplan = batch_trim_plan(cpats, table, seg_start, win, passed)
            progress.add(TOTAL, len(ids))
            for i, rid in enumerate(ids):
                l = seg_len_l[i]
                if l:
                    s = seg_start_l[i]
                    e = s + l
                    trim = (
                        (tplan[1][i], tplan[2][i], tplan[3][i])
                        if tplan is not None and tplan[0][i]
                        else None
                    )
                    member = (
                        table, s, l, slabels[i], win_l[i], passed_l[i],
                        lines[s:e], rsf_l[s:e], ref_l[s:e], rowlab_l[s:e],
                        trim,
                    )
                    if rid != pend_id:
                        flush_run()
                        pend_id = rid
                        pend_members = [member]
                        pend_recs = [(descs[i], seqs[i], quals[i])]
                    else:
                        pend_members.append(member)
                        pend_recs.append((descs[i], seqs[i], quals[i]))
                elif rid == pend_id:
                    # row-less record of the live run's id: trimmed with
                    # the run's annotations (the staged trim map does)
                    pend_recs.append((descs[i], seqs[i], quals[i]))
                # else: zero-match read — it has no annotation rows, so
                # it neither splits the run (it is invisible to the
                # staged inspect/filter grouping) nor gets trimmed
                if len(pend_recs) >= _RUN_CAP:
                    progress.print_error(
                        f"warning: read id {pend_id!r} repeats over "
                        f"{_RUN_CAP} consecutive records; flushing early"
                    )
                    flush_run()
                    pend_id, pend_members, pend_recs = None, [], []
            drain_bufs()
            progress.refresh()
        flush_run()
        drain_bufs()
        anno_writer.finish()
        filt_writer.finish()
    finally:
        writers.close_all()
        for fh in (anno_fh, ppr_fh, filt_fh):
            fh.close()
        if failed_fh is not None:
            failed_fh.close()
    progress.finish("reads")

    print()
    print_pattern_summary(pattern_count, top_n=10)
    anno_path = os.path.join(out, "annotation.tsv")
    print(
        f"Want to see more patterns? Run: `barbell-tpu inspect -i {anno_path} -n 100`"
    )

    print("\nDone!")
