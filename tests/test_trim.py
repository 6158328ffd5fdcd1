"""Trim-stage tests mirroring reference `src/trim/trim.rs:532-803`."""

from barbell_tpu.models.records import (
    BarbellMatch,
    BarcodeType,
    Cut,
    CutDirection,
    Strand,
)
from barbell_tpu.stages.trim import LabelConfig, process_read_and_anno


def mk(
    read_start_bar,
    read_end_bar,
    read_start_flank,
    read_end_flank,
    bar_start,
    bar_end,
    match_type,
    label,
    strand,
    read_len,
    cuts,
):
    return BarbellMatch(
        read_id="read1",
        read_len=read_len,
        rel_dist_to_end=0,
        read_start_bar=read_start_bar,
        read_end_bar=read_end_bar,
        read_start_flank=read_start_flank,
        read_end_flank=read_end_flank,
        bar_start=bar_start,
        bar_end=bar_end,
        match_type=match_type,
        flank_cost=0,
        barcode_cost=0,
        label=label,
        strand=strand,
        cuts=cuts,
    )


def test_single_cut_pair():
    seq = b"CCCCCCCCAAAACCCCCCCCCCCC"
    qual = b"________IIII____________"
    annotations = [
        mk(4, 8, 4, 8, 0, 4, BarcodeType.Ftag, "Fbar", Strand.Fwd, len(seq),
           [(Cut(0, CutDirection.After), 8)]),
        mk(12, 16, 12, 16, 0, 4, BarcodeType.Rtag, "Rbar", Strand.Fwd, len(seq),
           [(Cut(0, CutDirection.Before), 12)]),
    ]
    lc = LabelConfig(True, True, True, True, None)
    results = process_read_and_anno(seq, qual, annotations, lc, False, False)
    assert len(results) == 1
    trimmed_seq, trimmed_qual, label, _ = results[0]
    assert trimmed_seq == b"AAAA"
    assert trimmed_qual == b"IIII"
    assert label == "Fbar_fw__Rbar_fw"


def test_two_cut_groups_two_slices():
    seq = b"CCCCCCCCAAAAAAAAAAAACCCCCCGGCC"
    qual = b"________IIIIIIIIIIII______II__"
    n = len(seq)
    annotations = [
        mk(4, 8, 4, 8, 0, 4, BarcodeType.Ftag, "F1", Strand.Fwd, n,
           [(Cut(1, CutDirection.After), 8)]),
        mk(20, 24, 20, 24, 0, 4, BarcodeType.Rtag, "R1", Strand.Fwd, n,
           [(Cut(1, CutDirection.Before), 20)]),
        mk(24, 26, 24, 26, 0, 2, BarcodeType.Ftag, "F2", Strand.Fwd, n,
           [(Cut(2, CutDirection.After), 26)]),
        mk(28, 30, 28, 30, 0, 2, BarcodeType.Rtag, "R2", Strand.Fwd, n,
           [(Cut(2, CutDirection.Before), 28)]),
    ]
    lc = LabelConfig(True, True, True, True, None)
    results = process_read_and_anno(seq, qual, annotations, lc, False, False)
    assert len(results) == 2
    assert results[0][:3] == (b"AAAAAAAAAAAA", b"IIIIIIIIIIII", "F1_fw__R1_fw")
    assert results[1][:3] == (b"GG", b"II", "F2_fw__R2_fw")
    # second slice carries the _1 suffix
    assert results[0][3] == ""
    assert results[1][3] == "_1"


def test_skip_trim():
    seq = b"CCCCCCCCAAAACCCCCCCCCCCC"
    qual = b"________IIII____________"
    annotations = [
        mk(4, 8, 4, 8, 0, 4, BarcodeType.Ftag, "Fbar", Strand.Fwd, len(seq),
           [(Cut(0, CutDirection.After), 8)]),
        mk(12, 16, 12, 16, 0, 4, BarcodeType.Rtag, "Rbar", Strand.Fwd, len(seq),
           [(Cut(0, CutDirection.Before), 12)]),
    ]
    lc = LabelConfig(True, True, True, True, None)
    results = process_read_and_anno(seq, qual, annotations, lc, True, False)
    assert len(results) == 1
    assert results[0][0] == seq
    assert results[0][1] == qual


def test_flip():
    seq = b"CCCCCCCCAGGCCCCCCCCCCCCC"
    qual = b"________IIIA____________"
    annotations = [
        mk(4, 8, 4, 8, 0, 4, BarcodeType.Ftag, "Fbar", Strand.Rc, len(seq),
           [(Cut(0, CutDirection.After), 8)]),
        mk(12, 16, 12, 16, 0, 4, BarcodeType.Rtag, "Rbar", Strand.Fwd, len(seq),
           [(Cut(0, CutDirection.Before), 12)]),
    ]
    lc = LabelConfig(True, True, True, True, None)
    results = process_read_and_anno(seq, qual, annotations, lc, False, True)
    trimmed_seq, trimmed_qual, label, _ = results[0]
    assert trimmed_seq == b"GCCT"
    assert trimmed_qual == b"AIII"
    assert label == "Fbar_rc__Rbar_fw"

    annotations[0].strand = Strand.Fwd
    results = process_read_and_anno(seq, qual, annotations, lc, False, True)
    trimmed_seq, trimmed_qual, label, _ = results[0]
    assert trimmed_seq == b"AGGC"
    assert trimmed_qual == b"IIIA"
    assert label == "Fbar_fw__Rbar_fw"


def test_single_cut_after_extends_to_read_end():
    seq = b"CCCCAAAAAAAA"
    qual = b"____IIIIIIII"
    annotations = [
        mk(0, 4, 0, 4, 0, 4, BarcodeType.Ftag, "F1", Strand.Fwd, len(seq),
           [(Cut(0, CutDirection.After), 4)]),
    ]
    lc = LabelConfig(True, False, True, False, None)
    results = process_read_and_anno(seq, qual, annotations, lc, False, False)
    assert len(results) == 1
    assert results[0][0] == b"AAAAAAAA"
    assert results[0][2] == "F1"


def test_single_cut_before_extends_to_read_start():
    seq = b"AAAAAAAACCCC"
    qual = b"IIIIIIII____"
    annotations = [
        mk(8, 12, 8, 12, 0, 4, BarcodeType.Rtag, "R1", Strand.Fwd, len(seq),
           [(Cut(0, CutDirection.Before), 8)]),
    ]
    lc = LabelConfig(True, False, True, False, None)
    results = process_read_and_anno(seq, qual, annotations, lc, False, False)
    assert len(results) == 1
    assert results[0][0] == b"AAAAAAAA"


def test_label_config_modes():
    annotations = [
        mk(0, 4, 0, 4, 0, 4, BarcodeType.Ftag, "B", Strand.Fwd, 100, None),
        mk(8, 12, 8, 12, 0, 4, BarcodeType.Rtag, "A", Strand.Rc, 100, None),
    ]
    assert LabelConfig(False, True, True, False, None).create_label(annotations) == "none"
    assert LabelConfig(True, True, True, False, None).create_label(annotations) == "B_fw__A_rc"
    assert LabelConfig(True, False, True, True, None).create_label(annotations) == "A__B"
    assert LabelConfig(True, False, True, False, "left").create_label(annotations) == "B"
    assert LabelConfig(True, False, True, False, "right").create_label(annotations) == "A"


def test_label_config_flank_exclusion():
    annotations = [
        mk(0, 4, 0, 4, 0, 4, BarcodeType.Fflank, "flank", Strand.Fwd, 100, None),
        mk(8, 12, 8, 12, 0, 4, BarcodeType.Ftag, "BC01", Strand.Fwd, 100, None),
    ]
    assert (
        LabelConfig(True, False, False, False, "left").create_label(annotations)
        == "BC01"
    )


def test_threaded_writer_pool_outputs_identical(tmp_path):
    """trim with a writer thread pool must produce byte-identical
    per-label FASTQ files (gzip: identical decompressed content)."""
    import gzip as _gzip
    import random

    from barbell_tpu.stages.trim import trim_matches, LabelConfig
    from barbell_tpu.models.records import (
        AnnotationWriter, BarbellMatch, BarcodeType, Strand,
    )

    rng = random.Random(8)
    reads = []
    rows = []
    for i in range(120):
        rid = f"r{i}"
        seq = "".join(rng.choice("ACGT") for _ in range(300))
        reads.append((rid, seq))
        label = f"BC{(i % 7) + 1:02d}"
        rows.append(BarbellMatch(
            read_id=rid, read_len=300, rel_dist_to_end=1,
            read_start_bar=10, read_end_bar=34, read_start_flank=0,
            read_end_flank=44, bar_start=0, bar_end=24,
            match_type=BarcodeType.Ftag, flank_cost=0, barcode_cost=0,
            label=label, strand=Strand.Fwd,
            cuts=[("After(1)", i % 3)],
        ))
    fastq = tmp_path / "in.fastq"
    with open(fastq, "w") as fh:
        for rid, seq in reads:
            fh.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    filt = tmp_path / "filtered.tsv"
    with open(filt, "w") as fh:
        w = AnnotationWriter(fh)
        w.write_rows(rows)

    def run(out, threads, use_gzip):
        trim_matches(
            str(filt), [str(fastq)], str(out),
            label_config=LabelConfig(), threads=threads, use_gzip=use_gzip,
        )
        data = {}
        for f in sorted(out.iterdir()):
            raw = f.read_bytes()
            if f.name.endswith(".gz"):
                raw = _gzip.decompress(raw)
            data[f.name.replace(".gz", "")] = raw
        return data

    assert run(tmp_path / "plain1", 1, False) == run(tmp_path / "plain4", 4, False)
    assert run(tmp_path / "gz1", 1, True) == run(tmp_path / "gz4", 4, True)


def test_threaded_pool_dead_worker_does_not_deadlock(tmp_path):
    """A worker that dies on a write error must drain its queue so
    producers (and close_all's sentinel put) never block; the error
    re-raises on the next write or on close."""
    import pytest

    from barbell_tpu.stages.trim import _ThreadedWriterPool

    pool = _ThreadedWriterPool(str(tmp_path), use_gzip=False, n_threads=1)

    def _boom(group):
        raise OSError("disk full")

    # patch the instance the worker thread already holds a reference to
    pool._pools[0].get = _boom
    handle = pool.get("bc01")
    with pytest.raises(OSError, match="disk full"):
        # More writes than the queue holds (maxsize 4096): pre-fix this
        # deadlocked on a full queue once the worker died.
        for _ in range(5000):
            handle.write_record(b"@r", b"ACGT", b"!!!!")
        pool.close_all()
