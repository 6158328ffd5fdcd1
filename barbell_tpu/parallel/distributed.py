"""Multi-host execution: per-host input sharding + deterministic merge.

Reads are embarrassingly parallel, so multi-host demux is file/offset
sharding plus a final deterministic merge:

* every host processes its own slice of the input (round-robin by file,
  or by record stripes within a file) through the normal single-host
  pipeline, writing per-host stage outputs
  (``annotation.shard-{r}.tsv``);
* the stage-file contract is preserved by merging shards in shard order
  (host 0 first), which keeps each read's rows contiguous and the
  overall order deterministic and independent of host count;
* global counters/histograms (progress, inspect) ride `psum` on the
  device mesh — see :mod:`barbell_tpu.parallel.mesh`.

`initialize()` wires `jax.distributed` when the standard coordinator
environment is present; on a single host everything degrades to
process_index 0 / process_count 1.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed if configured; returns (rank, world)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "BARBELL_COORDINATOR"
    )
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        return jax.process_index(), jax.process_count()
    except RuntimeError:
        return 0, 1


def shard_paths(paths: Sequence[str], rank: int, world: int) -> List[str]:
    """Round-robin file assignment (stable, size-agnostic)."""
    return [p for i, p in enumerate(paths) if i % world == rank]


def shard_record_range(
    n_records_hint: Optional[int], rank: int, world: int
) -> Tuple[int, int]:
    """Record-stripe assignment when there are fewer files than hosts:
    host r processes records with index % world == r (streaming filter).
    Returns (rank, world) for the caller's modulo filter."""
    return rank, world


def shard_output_path(base: str, rank: int, world: int) -> str:
    if world <= 1:
        return base
    root, ext = os.path.splitext(base)
    return f"{root}.shard-{rank}{ext}"


def merge_annotation_shards(base: str, world: int, delete: bool = True) -> None:
    """Concatenate per-host annotation shards deterministically (rank
    order), writing the header once.  Run on rank 0 after a barrier."""
    if world <= 1:
        return
    from ..models.records import TSV_COLUMNS

    header = "\t".join(TSV_COLUMNS)
    with open(base, "w") as out:
        wrote_header = False
        for rank in range(world):
            shard = shard_output_path(base, rank, world)
            if not os.path.exists(shard):
                continue
            with open(shard) as fh:
                first = fh.readline()
                if not first:
                    continue
                if first.rstrip("\n") != header:
                    raise ValueError(f"Bad shard header in {shard}")
                if not wrote_header:
                    out.write(first)
                    wrote_header = True
                for line in fh:
                    out.write(line)
            if delete:
                os.remove(shard)


def write_completion_marker(out_dir: str, stage: str, rank: int) -> None:
    """Per-shard completion marker — the restart/checkpoint contract for
    multi-host streaming (a stage re-run skips shards whose marker
    exists)."""
    os.makedirs(os.path.join(out_dir, ".markers"), exist_ok=True)
    with open(os.path.join(out_dir, ".markers", f"{stage}.{rank}.done"), "w") as fh:
        fh.write("done\n")


def has_completion_marker(out_dir: str, stage: str, rank: int) -> bool:
    return os.path.exists(os.path.join(out_dir, ".markers", f"{stage}.{rank}.done"))
