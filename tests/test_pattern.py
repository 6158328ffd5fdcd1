"""Pattern grammar tests mirroring reference `src/filter/pattern.rs:385-937`."""

import pytest

from barbell_tpu.models.records import (
    BarbellMatch,
    BarcodeType,
    Cut,
    CutDirection,
    Strand,
)
from barbell_tpu.stages.pattern import (
    PatternParseError,
    match_pattern,
    pattern_from_str,
)


def mk(
    read_start_bar=0,
    read_end_bar=100,
    read_start_flank=0,
    read_end_flank=100,
    match_type=BarcodeType.Ftag,
    label="XXX",
    strand=Strand.Fwd,
    read_len=500,
):
    return BarbellMatch(
        read_id="test",
        read_len=read_len,
        rel_dist_to_end=0,
        read_start_bar=read_start_bar,
        read_end_bar=read_end_bar,
        read_start_flank=read_start_flank,
        read_end_flank=read_end_flank,
        bar_start=0,
        bar_end=24,
        match_type=match_type,
        flank_cost=0,
        barcode_cost=0,
        label=label,
        strand=strand,
        cuts=None,
    )


def test_parse_three_elements():
    p = pattern_from_str(
        "Ftag[fw, *, @left(0..250)]__Fflank[fw, @prev_left(5..100)]__Rtag[?1, fw, @right(0..20)]"
    )
    assert len(p.elements) == 3
    e0, e1, e2 = p.elements
    assert e0.match_type == BarcodeType.Ftag
    assert e0.orientation == Strand.Fwd
    assert e0.label is None
    assert e0.range == (0, 250)
    assert e0.relative_to == "left"
    assert e1.match_type == BarcodeType.Fflank
    assert e1.relative_to == "prev_left"
    assert e1.range == (5, 100)
    assert e2.placeholder == 1
    assert e2.relative_to == "right"


def test_parse_rejects_bare_flank():
    with pytest.raises(PatternParseError):
        pattern_from_str("Flank[fw, *]")


def test_parse_rejects_garbage():
    with pytest.raises(PatternParseError):
        pattern_from_str("Ftag[fw]__NOPE")


def test_distance_to_left_end():
    p = pattern_from_str("Ftag[fw, *, @left(0..250)]")
    for start, expect in [(0, True), (100, True), (250, True), (251, False)]:
        m = mk(read_start_bar=start)
        assert match_pattern([m], p)[0] is expect


def test_distance_to_right_end():
    p = pattern_from_str("Ftag[fw, *, @right(0..250)]")
    for end, expect in [(500, True), (450, True), (250, True), (249, False)]:
        m = mk(read_end_bar=end)
        assert match_pattern([m], p)[0] is expect


def test_distance_to_prev_left():
    p = pattern_from_str("Ftag[fw, *, @left(0..250)]__Fflank[fw, @prev_left(5..100)]")
    first = mk(read_end_bar=100)
    for start, expect in [(50, False), (100, False), (105, True), (200, True), (201, False)]:
        second = mk(
            read_start_bar=start,
            read_end_bar=start + 100,
            match_type=BarcodeType.Fflank,
        )
        assert match_pattern([first, second], p)[0] is expect, start


def test_placeholder_same_label():
    p = pattern_from_str("Ftag[fw, ?1, @left(0..250)]__Rtag[fw, ?1, @right(0..250)]")
    matches = [
        mk(read_len=250),
        mk(
            read_start_bar=100,
            read_end_bar=200,
            match_type=BarcodeType.Rtag,
            read_len=250,
        ),
    ]
    assert match_pattern(matches, p)[0]
    matches[1].label = "yyyy"
    assert not match_pattern(matches, p)[0]


def test_placeholder_mixed_keys():
    p = pattern_from_str("Ftag[fw, ?1, @left(0..250)]__Rtag[fw, ?2, @right(0..250)]")
    matches = [
        mk(read_len=250),
        mk(
            read_start_bar=100,
            read_end_bar=200,
            match_type=BarcodeType.Rtag,
            label="other",
            read_len=250,
        ),
    ]
    assert match_pattern(matches, p)[0]


def test_placeholder_not_ordered():
    p = pattern_from_str(
        "Ftag[fw, ?1, @left(0..250)]__Ftag[fw, ?2, @prev_left(0..250)]__Ftag[fw, ?1, @left(0..250)]"
    )
    matches = [
        mk(read_len=600, label="XXX"),
        mk(read_start_bar=100, read_end_bar=200, read_len=600, label="YYY"),
        mk(
            read_start_bar=100,
            read_end_bar=200,
            read_start_flank=550,
            read_end_flank=600,
            read_len=600,
            label="XXX",
        ),
    ]
    assert match_pattern(matches, p)[0]


def test_cuts_default_group():
    p = pattern_from_str("Ftag[fw, *, >>, @left(0..250)]__Fflank[fw, <<, @prev_left(5..100)]")
    matches = [
        mk(read_start_bar=0, read_end_bar=10, read_end_flank=10, read_len=250),
        mk(
            read_start_bar=15,
            read_end_bar=20,
            read_start_flank=15,
            read_end_flank=20,
            match_type=BarcodeType.Fflank,
            label="@Nothing",
            read_len=250,
        ),
    ]
    is_match, cuts = match_pattern(matches, p)
    assert is_match
    assert cuts == [
        (0, Cut(0, CutDirection.After)),
        (1, Cut(0, CutDirection.Before)),
    ]


def test_cuts_explicit_groups():
    p = pattern_from_str(
        "Ftag[fw, *, >>1, @left(0..250)]__Fflank[fw, <<1, @prev_left(5..100)]__Rtag[fw, *, <<2, @right(0..20)]"
    )
    matches = [
        mk(read_start_bar=0, read_end_bar=10, read_end_flank=10, read_len=50),
        mk(
            read_start_bar=15,
            read_end_bar=20,
            read_start_flank=15,
            read_end_flank=20,
            match_type=BarcodeType.Fflank,
            label="@Nothing",
            read_len=50,
        ),
        mk(
            read_start_bar=30,
            read_end_bar=40,
            read_start_flank=30,
            read_end_flank=40,
            match_type=BarcodeType.Rtag,
            label="YYY",
            read_len=50,
        ),
    ]
    is_match, cuts = match_pattern(matches, p)
    assert is_match
    assert cuts == [
        (0, Cut(1, CutDirection.After)),
        (1, Cut(1, CutDirection.Before)),
        (2, Cut(2, CutDirection.Before)),
    ]


def test_substring_label():
    p = pattern_from_str("Ftag[fw, ~BC0, @left(0..250)]")
    assert match_pattern([mk(label="BC01")], p)[0]
    assert not match_pattern([mk(label="BC11")], p)[0]


def test_orientation_gate():
    p = pattern_from_str("Ftag[rc, *, @left(0..250)]")
    assert not match_pattern([mk(strand=Strand.Fwd)], p)[0]
    assert match_pattern([mk(strand=Strand.Rc)], p)[0]


def test_too_few_annotations():
    p = pattern_from_str("Ftag[fw, *]__Ftag[fw, *]")
    assert not match_pattern([mk()], p)[0]
