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


def ends_window_for_patterns(patterns, groups) -> Optional[int]:
    """Minimal ends-scan window W (bases) that discovers every hit the
    given filter patterns can accept, or ``None`` when a pattern is not
    positionally bounded (full scan required).

    Bounding: an element anchored ``@left(a..b)`` has read_start_bar <=
    b, so its flank ends by ``b + EXT`` where ``EXT = flank_len + k``
    bounds one match's on-read extent; ``@prev_left(a..b)`` chains off
    the previous element's end bound; ``@right(a..b)`` has its end
    within ``b`` of the read end (depth ``b + EXT`` covers its start
    too).  Strand symmetry (rc-sequenced reads mirror every construct)
    makes one depth D cover both read ends, and the suffix row's halo
    exclusion adds ``halo + 1``.  W is rounded up to a 128-base
    granularity: every base of W is shipped twice per long read over
    the ~30MB/s tunnel (the binding resource — round-4 A/Bs), so W
    hugs the derived depth, while the compiled-shape universe stays
    bounded because the engine's row width is pow2(W) and the W values
    themselves are preset-derived constants.

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
    depth = 0
    for pat in patterns:
        prev = None  # end-position bound of the previous element
        for el in pat.elements:
            if el.relative_to == "left":
                prev = el.range[1] + ext
            elif el.relative_to == "prev_left":
                if prev is None:
                    # unanchored prev_left auto-matches (match_pattern),
                    # so the element is unbounded
                    return None
                prev = prev + el.range[1] + ext
            elif el.relative_to == "right":
                depth = max(depth, el.range[1] + ext)
                prev = None  # a prev_left after @right would be unbounded
                continue
            else:
                return None  # positionally unconstrained element
            depth = max(depth, prev)
    W = depth + halo + 1
    W = -(-W // 128) * 128
    if W > 8192:  # exceeds the engine row-width ceiling: no benefit
        return None
    return W


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
        annotate_config.ends_window = ends_window_for_patterns(wpats, wgroups)
        if annotate_config.ends_window:
            print(
                f"Ends-only scan: long reads ship their first/last "
                f"{annotate_config.ends_window} bases (preset windows are "
                f"positional; --full-scan restores whole-read scanning)"
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
    """
    from collections import Counter, deque

    from ..models.barcodes import BarcodeGroup
    from ..models.pipeline import engine_map_batches
    from ..models.records import AnnotationWriter
    from ..utils.fastx import split_fastq_header, validate_fastq_paths
    from ..utils.fastx_native import iter_fastq_batches_auto
    from ..utils.progress import TRIM_METRICS, ProgressTracker
    from .annotate import _apply_flank_threshold, _make_engine
    from .inspect import get_group_structure, print_pattern_summary
    from .filter import check_filter_pass
    from .trim import _ThreadedWriterPool, _WriterPool, process_read_and_anno

    out = config.output_folder
    groups = BarcodeGroup.from_kit(config.kit_name, config.use_extended)
    for i, group in enumerate(groups):
        print(f"{group.barcode_type.as_str()}: {i}")
        group.display(5)
    groups = _apply_flank_threshold(groups, annotate_config)
    engine = _make_engine(groups, annotate_config)

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

    # One run in flight: rows are the run's merged annotation rows
    # (pre-cut until flushed), recs its FASTQ records (including
    # same-id records that contributed no rows — the staged trim's id
    # map hands those the run's annotations too).
    pend_id: Optional[str] = None
    pend_rows: list = []
    pend_recs: list = []
    # A run's records stay buffered until the run closes; bound the
    # buffer so a (malformed) file of millions of same-id records
    # cannot exhaust memory — the forced flush only affects grouping
    # for inputs already outside the parity contract.
    _RUN_CAP = 100_000

    def flush_run() -> None:
        if pend_id is None or not pend_rows:
            return
        label = get_group_structure(pend_rows, bucket_size)
        ppr_fh.write(f"{pend_id}\t{label}\n")
        pattern_count[label] += 1
        if not check_filter_pass(pend_rows, patterns):
            return
        filt_writer.write_rows(pend_rows)
        for desc, seq, qual in pend_recs:
            results = process_read_and_anno(
                seq, qual, pend_rows, label_config, skip_trim=False, flip=False
            )
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

    try:
        for ids, seqs, per_read in engine_map_batches(engine, batches()):
            descs, quals = meta_queue.popleft()
            anno_writer.write_rows([m for ms in per_read for m in ms])
            for rid, desc, seq, qual, matches in zip(ids, descs, seqs, quals, per_read):
                progress.inc(TOTAL)
                if matches:
                    if rid != pend_id:
                        flush_run()
                        pend_id, pend_rows, pend_recs = rid, [], []
                    pend_rows.extend(matches)
                    pend_recs.append((desc, seq, qual))
                elif rid == pend_id:
                    # row-less record of the live run's id: trimmed with
                    # the run's annotations (the staged trim map does)
                    pend_recs.append((desc, seq, qual))
                # else: zero-match read — it has no annotation rows, so
                # it neither splits the run (it is invisible to the
                # staged inspect/filter grouping) nor gets trimmed
                if len(pend_recs) >= _RUN_CAP:
                    progress.print_error(
                        f"warning: read id {pend_id!r} repeats over "
                        f"{_RUN_CAP} consecutive records; flushing early"
                    )
                    flush_run()
                    pend_id, pend_rows, pend_recs = None, [], []
            progress.refresh()
        flush_run()
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
