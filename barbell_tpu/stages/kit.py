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


def demux_using_kit(fastq_files: Sequence[str], config: KitRunConfig) -> None:
    out = config.output_folder
    os.makedirs(out, exist_ok=True)

    kit_info = get_kit_info(config.kit_name)

    print("\nKit info")
    print(f"Kit name: {kit_info.name}")
    print(f"Kit type: {'Maximize' if config.maximize else 'Safe'}")
    for tmpl in kit_info.templates:
        print(f"Barcodes: {tmpl.barcodes.from_label} - {tmpl.barcodes.to_label}")

    print("\nAnnotating reads...")
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
