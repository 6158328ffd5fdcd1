"""Tool-output ingestion tests (the importer half of the reference's
comparison harness, `benchmarks/src/compare/compare.rs:51-73,97-421`).

Each layout normalizer is exercised on a synthetic "foreign tool"
output, and `run_import_compare` is driven end-to-end against simulated
ground truth.
"""

import os
import random

import pytest

from barbell_tpu.sim import ingest
from barbell_tpu.sim.compare import run_import_compare
from barbell_tpu.sim.simulate import (
    create_testdata,
    default_barcodes,
    rapid_adapter,
    random_sequence,
)


def _write_fastq(path, records):
    with open(path, "w") as fh:
        for rid, seq in records:
            fh.write(f"@{rid}\n{seq.decode()}\n+\n{'I' * len(seq)}\n")


# ---------------------------------------------------------------- layouts


def test_dorado_folder_layout(tmp_path):
    """Label = last ``_`` part of the stem; ``unclassified`` skipped
    (reference `compare.rs:176-212`)."""
    folder = tmp_path / "dorado"
    folder.mkdir()
    _write_fastq(folder / "run1_pass_BC01.fastq", [("r1", b"ACGT"), ("r2", b"GGGG")])
    _write_fastq(folder / "run1_pass_BC02.fastq", [("r3", b"TTTT")])
    _write_fastq(folder / "run1_pass_unclassified.fastq", [("r4", b"CCCC")])
    recs = sorted(ingest.iter_dorado_folder(str(folder)))
    assert [(r[0], r[1]) for r in recs] == [
        ("r1", "BC01"),
        ("r2", "BC01"),
        ("r3", "BC02"),
    ]
    assert recs[0][2] == b"ACGT"


def test_barbell_folder_layout(tmp_path):
    """Label = first ``_`` part of the stem (reference `compare.rs:275-303`)."""
    folder = tmp_path / "barbell"
    folder.mkdir()
    _write_fastq(folder / "BC05_trimmed.fastq", [("r1", b"ACGT")])
    _write_fastq(folder / "BC06_trimmed.fastq", [("r2", b"TTTT")])
    recs = sorted(ingest.iter_barbell_folder(str(folder)))
    assert [(r[0], r[1]) for r in recs] == [("r1", "BC05"), ("r2", "BC06")]


def test_flexiplex_layout(tmp_path):
    """``<barseq>_#<read_id>_-1of1`` headers + seq->label map
    (reference `compare.rs:352-421`)."""
    out = tmp_path / "flexiplex"
    out.mkdir()
    _write_fastq(
        out / "classified_reads.fastq",
        [("AAAACCCC_#readX_-1of1", b"ACGT"), ("GGGGTTTT_#readY_-1of1", b"TTTT")],
    )
    bar_file = tmp_path / "bars.tsv"
    bar_file.write_text("AAAACCCC\tBC01\nGGGGTTTT\tBC02\n")
    # Accepts either the folder or the file path.
    recs = sorted(
        ingest.iter_flexiplex_output(
            str(out), ingest.read_barcode_map(str(bar_file))
        )
    )
    assert [(r[0], r[1]) for r in recs] == [("readX", "BC01"), ("readY", "BC02")]

    with pytest.raises(ValueError, match="not in the barcode map"):
        list(
            ingest.iter_flexiplex_output(
                str(out / "classified_reads.fastq"), {"AAAACCCC": "BC01"}
            )
        )


def test_generic_tsv_layout(tmp_path):
    path = tmp_path / "table.tsv"
    path.write_text(
        "read_id\tbarcode\textra\n"  # header skipped
        "r1\tBC01\tjunk\n"
        "r2\tBC02\n"
    )
    recs = list(ingest.iter_generic_tsv(str(path), reads={"r1": b"ACGT"}))
    assert recs == [("r1", "BC01", b"ACGT"), ("r2", "BC02", None)]

    bad = tmp_path / "bad.tsv"
    bad.write_text("only-one-field\n")
    with pytest.raises(ValueError, match="expected >=2"):
        list(ingest.iter_generic_tsv(str(bad)))


def test_iter_tool_output_unknown_tool(tmp_path):
    with pytest.raises(ValueError, match="Unknown import tool"):
        list(ingest.iter_tool_output("nanoplexer", str(tmp_path)))
    with pytest.raises(ValueError, match="--bar-file"):
        list(ingest.iter_tool_output("flexiplex", str(tmp_path)))


# ------------------------------------------------- construct re-counting


def test_construct_counter():
    """Reads with an intact flank+barcode construct count >=1; random
    reads and barcode-less reads count 0 (reference
    ``check_flanks_and_bars``, `compare.rs:51-73`)."""
    rng = random.Random(7)
    bars = default_barcodes(8)
    counter = ingest.ConstructCounter([seq for _l, seq in bars])
    body = bytes(random_sequence(rng, 500))

    construct = rapid_adapter(bars[3][1]) + body
    assert counter.count(construct) >= 1
    # The counter is strand-independent (searches both orientations).
    from barbell_tpu.utils import dna

    assert counter.count(dna.reverse_complement_bytes(construct)) >= 1
    assert counter.count(body) == 0


# ------------------------------------------------------------ end-to-end


def test_run_import_compare_end_to_end(tmp_path):
    """A synthetic foreign-tool folder (dorado layout) with one known
    mis-assignment and one dropped read scores correctly."""
    sim_dir = tmp_path / "sim"
    create_testdata(
        8,
        str(sim_dir),
        barcodes=default_barcodes(8),
        rc_frac=0.0,
        seed=11,
        groups=("GroupII",),
    )
    truth_path = sim_dir / "GroupII_truth.txt"
    truth = dict(
        line.split("\t") for line in truth_path.read_text().splitlines()
    )
    reads = {}
    lines = (sim_dir / "GroupII.fastq").read_text().splitlines()
    for i in range(0, len(lines), 4):
        reads[lines[i][1:].split()[0]] = lines[i + 1].encode()

    folder = tmp_path / "foreign"
    folder.mkdir()
    by_label = {}
    rids = sorted(truth)
    for n, rid in enumerate(rids):
        if n == 0:
            continue  # dropped by the "tool"
        label = truth[rid] if n != 1 else "BC08"  # one mis-assignment
        by_label.setdefault(label, []).append((rid, reads[rid]))
    for label, recs in by_label.items():
        _write_fastq(folder / f"pass_{label}.fastq", recs)

    norm = tmp_path / "normalized.tsv"
    report = run_import_compare(
        "dorado",
        str(folder),
        str(truth_path),
        reads_path=str(sim_dir / "GroupII.fastq"),
        normalized_out=str(norm),
    )
    assert report.total_reads == 8
    assert report.assigned == 7
    assert report.correct == 6

    rows = [l.split("\t") for l in norm.read_text().splitlines()]
    assert len(rows) == 7
    # Untrimmed GroupII reads still hold their construct: the
    # independent re-count must find >=1 in every row.
    assert all(int(r[3]) >= 1 for r in rows)
    assert all(int(r[2]) == len(reads[r[0]]) for r in rows)


def test_run_import_compare_tsv_without_reads(tmp_path):
    """Generic TSV import without sequences: the truth table defines the
    read universe and len/n_flank are explicitly unknown (-1)."""
    truth_path = tmp_path / "truth.tsv"
    truth_path.write_text("r1\tBC01\nr2\tBC02\nr3\tBC03\n")
    table = tmp_path / "tool.tsv"
    table.write_text("r1\tBC01\nr2\tBC07\n")
    norm = tmp_path / "norm.tsv"
    report = run_import_compare(
        "tsv", str(table), str(truth_path), normalized_out=str(norm)
    )
    assert (report.total_reads, report.assigned, report.correct) == (3, 2, 1)
    assert all(l.endswith("\t-1\t-1") for l in norm.read_text().splitlines())

    with pytest.raises(ValueError, match="--reads"):
        run_import_compare("tsv", str(table), str(truth_path), verify=True)
