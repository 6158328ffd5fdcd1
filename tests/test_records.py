import io

from barbell_tpu.models.records import (
    AnnotationWriter,
    BarbellMatch,
    BarcodeType,
    Cut,
    CutDirection,
    Strand,
    TSV_HEADER,
    rel_dist_to_end,
)


def sample_match(**kw):
    base = dict(
        read_id="read1",
        read_len=500,
        rel_dist_to_end=12,
        read_start_bar=12,
        read_end_bar=36,
        read_start_flank=2,
        read_end_flank=90,
        bar_start=10,
        bar_end=34,
        match_type=BarcodeType.Ftag,
        flank_cost=3,
        barcode_cost=1,
        label="BC01",
        strand=Strand.Fwd,
        cuts=None,
    )
    base.update(kw)
    return BarbellMatch(**base)


def test_tsv_roundtrip_no_cuts():
    m = sample_match()
    row = m.to_tsv_row()
    assert row.split("\t")[9] == "Ftag"
    assert row.split("\t")[13] == "Fwd"
    assert row.split("\t")[14] == ""
    back = BarbellMatch.from_tsv_line(row)
    assert back == m


def test_tsv_roundtrip_with_cuts():
    cuts = [
        (Cut(1, CutDirection.After), 0),
        (Cut(1, CutDirection.Before), 1),
    ]
    m = sample_match(cuts=cuts, strand=Strand.Rc)
    row = m.to_tsv_row()
    assert row.split("\t")[14] == "After(1):0,Before(1):1"
    back = BarbellMatch.from_tsv_line(row)
    assert back == m


def test_header_layout():
    assert TSV_HEADER.startswith("read_id\tread_len\trel_dist_to_end")
    assert TSV_HEADER.endswith("label\tstrand\tcuts")


def test_writer_lazy_header():
    buf = io.StringIO()
    w = AnnotationWriter(buf)
    w.finish()
    assert buf.getvalue() == ""  # empty output stays empty

    # empty batches must not trigger the header either: annotate calls
    # write_rows once per batch even when no read in the batch matched,
    # and a zero-match run must produce a 0-byte file (reference
    # csv::Writer emits the header with the first ROW)
    buf = io.StringIO()
    w = AnnotationWriter(buf)
    w.write_rows([])
    w.write_rows([])
    w.finish()
    assert buf.getvalue() == ""

    buf = io.StringIO()
    w = AnnotationWriter(buf)
    w.write_rows([sample_match()])
    lines = buf.getvalue().splitlines()
    assert lines[0] == TSV_HEADER
    assert len(lines) == 2


def test_cut_string_forms():
    assert Cut.from_string("After(1)") == Cut(1, CutDirection.After)
    assert Cut.from_string("Before(2)") == Cut(2, CutDirection.Before)
    assert Cut.from_string("Invalid") is None
    assert Cut.from_string("After(abc)") is None
    assert Cut.from_pattern_string(">>") == Cut(0, CutDirection.After)
    assert Cut.from_pattern_string("<<3") == Cut(3, CutDirection.Before)
    assert Cut.from_pattern_string("xx") is None


def test_rel_dist_to_end():
    # reference convention `src/annotate/searcher.rs:183-199`
    assert rel_dist_to_end(-5, 100) == 1
    assert rel_dist_to_end(0, 100) == 1
    assert rel_dist_to_end(10, 100) == 10
    assert rel_dist_to_end(50, 100) == 50
    assert rel_dist_to_end(51, 100) == -49
    assert rel_dist_to_end(100, 100) == -1
    assert rel_dist_to_end(99, 100) == -1 * 1
