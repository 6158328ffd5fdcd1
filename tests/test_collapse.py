"""Overlap-collapse tests mirroring reference `src/annotate/interval.rs:81-257`."""

import random

from barbell_tpu.models.collapse import collapse_overlapping_matches
from barbell_tpu.models.records import BarbellMatch, BarcodeType, Strand


def mk(start, end, match_type=BarcodeType.Ftag, barcode_cost=0, label="x"):
    return BarbellMatch(
        read_id="test",
        read_len=100,
        rel_dist_to_end=0,
        read_start_bar=start,
        read_end_bar=end,
        read_start_flank=start,
        read_end_flank=end,
        bar_start=0,
        bar_end=10,
        match_type=match_type,
        flank_cost=0,
        barcode_cost=barcode_cost,
        label=label,
        strand=Strand.Fwd,
        cuts=None,
    )


def test_empty_input():
    assert collapse_overlapping_matches([], 0.5) == []


def test_single_match():
    out = collapse_overlapping_matches([mk(0, 10, label="t1")], 0.5)
    assert [m.label for m in out] == ["t1"]


def test_double_no_overlap():
    out = collapse_overlapping_matches(
        [mk(0, 10, label="t1"), mk(10, 20, label="t2")], 0.5
    )
    assert [m.label for m in out] == ["t1", "t2"]


def test_collapse_overlapping():
    out = collapse_overlapping_matches(
        [mk(0, 20, barcode_cost=0, label="t1"), mk(15, 20, barcode_cost=3, label="t2")],
        0.5,
    )
    assert [m.label for m in out] == ["t1"]


def test_overlap_threshold_boundary():
    matches = [
        mk(0, 20, barcode_cost=0, label="t1"),
        mk(10, 35, barcode_cost=3, label="t2"),
    ]
    # overlap 10 = 50% of the smaller interval (20)
    assert [m.label for m in collapse_overlapping_matches(matches, 0.5)] == ["t1"]
    assert [m.label for m in collapse_overlapping_matches(matches, 0.6)] == ["t1", "t2"]


def test_shuffle_stability():
    matches = [
        mk(0, 10, barcode_cost=0, label="t1"),
        mk(10, 20, barcode_cost=3, label="t2"),
        mk(0, 15, barcode_cost=3, label="t2"),
        mk(100, 110, barcode_cost=3, label="t3"),
    ]
    rng = random.Random(0)
    for _ in range(10):
        rng.shuffle(matches)
        out = collapse_overlapping_matches(matches, 0.5)
        assert [m.label for m in out] == ["t1", "t3"]


def test_small_overlap_walk():
    # Mirror reference test_small_ovlerap: slide the second interval left
    # until overlap crosses the 50% threshold.
    matches = [
        mk(0, 10, barcode_cost=3, label="t1"),
        mk(10, 20, barcode_cost=1, label="t2"),
    ]
    for _ in range(4):
        matches[1].read_start_flank -= 1
        matches[1].read_end_flank -= 1
        out = collapse_overlapping_matches(matches, 0.5)
        assert [m.label for m in out] == ["t1", "t2"]
    matches[1].read_start_flank -= 1
    matches[1].read_end_flank -= 1
    out = collapse_overlapping_matches(matches, 0.5)
    assert [m.label for m in out] == ["t2"]


def test_flank_only_loses_to_barcode():
    out = collapse_overlapping_matches(
        [
            mk(0, 20, match_type=BarcodeType.Fflank, label="flank"),
            mk(0, 20, match_type=BarcodeType.Ftag, barcode_cost=5, label="bc"),
        ],
        0.5,
    )
    assert [m.label for m in out] == ["bc"]


def test_flank_only_longer_wins():
    out = collapse_overlapping_matches(
        [
            mk(0, 20, match_type=BarcodeType.Fflank, label="short"),
            mk(0, 28, match_type=BarcodeType.Fflank, label="long"),
        ],
        0.5,
    )
    assert [m.label for m in out] == ["long"]
