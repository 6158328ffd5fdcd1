"""Multi-host sharding: N shard runs merge to the single-host output."""

import os

from barbell_tpu import cli
from barbell_tpu.parallel.distributed import (
    has_completion_marker,
    merge_annotation_shards,
    shard_output_path,
    write_completion_marker,
)
from barbell_tpu.sim.simulate import create_testdata, default_barcodes
from barbell_tpu.stages.annotate import AnnotateConfig, annotate_with_kit


def test_record_striped_shards_merge_to_single_run(tmp_path):
    create_testdata(
        10, str(tmp_path / "sim"), barcodes=default_barcodes(4), rc_frac=0.0,
        seed=11, groups=("GroupII",),
    )
    fastq = str(tmp_path / "sim" / "GroupII.fastq")

    # single-host reference run
    single = str(tmp_path / "single.tsv")
    annotate_with_kit(
        [fastq], single, "SQK-RBK110-96", AnnotateConfig(backend="oracle", batch_size=4)
    )

    # two record-striped shard runs + deterministic merge
    base = str(tmp_path / "sharded.tsv")
    world = 2
    for rank in range(world):
        annotate_with_kit(
            [fastq],
            shard_output_path(base, rank, world),
            "SQK-RBK110-96",
            AnnotateConfig(backend="oracle", batch_size=4, shard=(rank, world)),
        )
        write_completion_marker(str(tmp_path), "annotate", rank)

    assert all(has_completion_marker(str(tmp_path), "annotate", r) for r in range(world))
    merge_annotation_shards(base, world)

    # the sidecar-driven merge restores original stream order: the
    # merged output is BYTE-IDENTICAL to the single-host run
    with open(single) as fh:
        want = fh.read()
    with open(base) as fh:
        got = fh.read()
    assert got == want
    # shard files and sidecars were cleaned up
    assert not os.path.exists(shard_output_path(base, 0, world))
    assert not os.path.exists(shard_output_path(base, 0, world) + ".idx")


def test_record_striped_jax_engine_merges_byte_identical(tmp_path):
    """The SAME scenario through the jax device engine (sharded over
    the CPU mesh) + the native 2-bit upload path: N-host merged output
    must be byte-identical to the single-host jax run AND to the oracle
    run."""
    import pytest

    pytest.importorskip("jax")
    create_testdata(
        8, str(tmp_path / "sim"), barcodes=default_barcodes(4), rc_frac=0.5,
        seed=17, groups=("GroupII", "GroupI"),
    )
    fastqs = [
        str(tmp_path / "sim" / "GroupII.fastq"),
        str(tmp_path / "sim" / "GroupI.fastq"),
    ]

    single = str(tmp_path / "single.tsv")
    annotate_with_kit(
        [*fastqs], single, "SQK-RBK110-96",
        AnnotateConfig(backend="jax", batch_size=4),
    )
    oracle = str(tmp_path / "oracle.tsv")
    annotate_with_kit(
        [*fastqs], oracle, "SQK-RBK110-96",
        AnnotateConfig(backend="oracle", batch_size=4),
    )

    base = str(tmp_path / "sharded.tsv")
    world = 3
    for rank in range(world):
        annotate_with_kit(
            [*fastqs],
            shard_output_path(base, rank, world),
            "SQK-RBK110-96",
            AnnotateConfig(backend="jax", batch_size=4, shard=(rank, world)),
        )
    merge_annotation_shards(base, world)

    with open(single) as fh:
        want = fh.read()
    with open(base) as fh:
        got = fh.read()
    with open(oracle) as fh:
        oracle_out = fh.read()
    assert got == want
    assert want == oracle_out


def test_cli_shard_flags(tmp_path):
    create_testdata(
        6, str(tmp_path / "sim"), barcodes=default_barcodes(4), rc_frac=0.0,
        seed=13, groups=("GroupII",),
    )
    fastq = str(tmp_path / "sim" / "GroupII.fastq")
    out = str(tmp_path / "ann.tsv")
    for rank in range(2):
        assert cli.main(
            ["annotate", "-i", fastq, "-o", out, "--kit", "SQK-RBK110-96",
             "--backend", "oracle", "--batch-size", "4",
             "--shard-rank", str(rank), "--shard-world", "2"]
        ) == 0
    merge_annotation_shards(out, 2)
    with open(out) as fh:
        lines = [ln for ln in fh.read().splitlines() if ln.strip()]
    reads = {ln.split("\t", 1)[0] for ln in lines[1:]}
    assert len(reads) == 6

def test_merge_missing_shard_raises(tmp_path):
    """A missing shard means a rank never finished: merging (and
    deleting) the survivors would silently lose reads — fail loudly."""
    import pytest

    base = str(tmp_path / "anno.tsv")
    shard0 = shard_output_path(base, 0, 2)
    open(shard0, "w").close()
    with open(shard0 + ".idx", "w") as fh:
        fh.write("0\t0\n")
    with pytest.raises(FileNotFoundError, match="missing"):
        merge_annotation_shards(base, 2)
    assert os.path.exists(shard0)  # survivors untouched


def test_merge_truncated_shard_raises(tmp_path):
    """A shard whose .idx promises more rows than the TSV holds is a
    truncated write — raise instead of silently dropping rows."""
    import pytest

    from barbell_tpu.models.records import TSV_COLUMNS

    base = str(tmp_path / "anno.tsv")
    header = "\t".join(TSV_COLUMNS)
    for rank in range(2):
        shard = shard_output_path(base, rank, 2)
        with open(shard, "w") as fh:
            fh.write(header + "\n")  # header but NO rows
        with open(shard + ".idx", "w") as fh:
            fh.write(f"{rank}\t1\n")  # claims one row
    with pytest.raises(ValueError, match="truncated"):
        merge_annotation_shards(base, 2)


def test_merge_all_empty_shards_stays_empty(tmp_path):
    """A zero-row single-host annotate writes a 0-byte file (lazy
    header); the sidecar merge of all-empty shards must match byte-for-byte."""
    base = str(tmp_path / "anno.tsv")
    world = 2
    for rank in range(world):
        shard = shard_output_path(base, rank, world)
        open(shard, "w").close()  # lazy header: no rows -> empty file
        with open(shard + ".idx", "w") as fh:
            fh.write(f"{rank}\t0\n")  # reads processed, zero rows each
    merge_annotation_shards(base, world)
    assert os.path.getsize(base) == 0
