"""End-to-end demux tests for the scalar (oracle) engine."""

import random

import numpy as np
import pytest

from barbell_tpu.kits import database as db
from barbell_tpu.models.barcodes import BarcodeGroup
from barbell_tpu.models.demux import Demuxer
from barbell_tpu.models.records import BarcodeType, Strand
from barbell_tpu.ops.edit_model import get_edit_cut_off
from barbell_tpu.utils import dna


def rapid_construct(bc_idx: int) -> bytes:
    return (db.RBK4_FRONT + db.BC_SEQS[bc_idx] + db.RBK4_REAR).encode()


def random_seq(rng, n) -> bytes:
    return bytes(rng.choice(b"ACGT") for _ in range(n))


@pytest.fixture(scope="module")
def rapid_demuxer():
    group = BarcodeGroup.from_kit("SQK-RBK110-96")[0]
    group.set_flank_threshold(get_edit_cut_off(group.get_effective_len()))
    d = Demuxer(alpha=0.4, min_score=0.2, min_score_diff=0.1)
    d.add_query_group(group)
    return d


def mutate(rng, seq: bytes, n_edits: int) -> bytes:
    s = bytearray(seq)
    for _ in range(n_edits):
        idx = rng.randrange(len(s))
        op = rng.randrange(3)
        if op == 0:
            cur = s[idx]
            choices = [b for b in b"ACGT" if b != cur]
            s[idx] = rng.choice(choices)
        elif op == 1 and len(s) > 1:
            del s[idx]
        else:
            s.insert(idx, rng.choice(b"ACGT"))
    return bytes(s)


def test_clean_construct_front(rapid_demuxer):
    rng = random.Random(0)
    read = rapid_construct(4) + random_seq(rng, 400)
    matches = rapid_demuxer.demux("r1", read)
    assert len(matches) == 1
    m = matches[0]
    assert m.match_type == BarcodeType.Ftag
    assert m.label == "BC05"
    assert m.strand == Strand.Fwd
    assert m.flank_cost == 0
    assert m.barcode_cost == 0
    assert m.read_start_flank == 0
    assert m.read_end_flank == 90
    # barcode occupies [16, 40) in the read
    assert abs(m.read_start_bar - 16) <= 1
    assert abs(m.read_end_bar - 40) <= 1
    assert m.rel_dist_to_end == 1


def test_clean_construct_rc(rapid_demuxer):
    rng = random.Random(1)
    fwd_read = rapid_construct(9) + random_seq(rng, 400)
    rc_read = dna.reverse_complement_bytes(fwd_read)
    matches = rapid_demuxer.demux("r2", rc_read)
    assert len(matches) == 1
    m = matches[0]
    assert m.label == "BC10"
    assert m.strand == Strand.Rc
    # construct now sits at the read's right end
    assert m.read_end_flank == len(rc_read)
    assert m.read_start_flank == len(rc_read) - 90
    assert m.rel_dist_to_end == -1 * (len(rc_read) - m.read_start_bar) or m.rel_dist_to_end < 0


def test_mutated_construct_still_assigned(rapid_demuxer):
    rng = random.Random(2)
    hits = 0
    for trial in range(10):
        bc = rng.randrange(96)
        read = mutate(rng, rapid_construct(bc) + random_seq(rng, 300), 6)
        matches = rapid_demuxer.demux(f"m{trial}", read)
        tags = [m for m in matches if m.match_type == BarcodeType.Ftag]
        if tags and tags[0].label == db.get_barcodes("RBK01", "RBK96", False)[bc]:
            hits += 1
    assert hits >= 8  # ~all mildly-mutated reads should be recovered


def test_random_read_no_matches(rapid_demuxer):
    rng = random.Random(3)
    read = random_seq(rng, 800)
    assert rapid_demuxer.demux("rand", read) == []


def test_wrong_barcode_right_flank_gives_flank_only(rapid_demuxer):
    # A construct whose barcode region is random garbage: the flank
    # matches but no barcode should win => flank-only row.
    rng = random.Random(4)
    garbage = random_seq(rng, 24)
    read = (
        db.RBK4_FRONT.encode() + garbage + db.RBK4_REAR.encode() + random_seq(rng, 300)
    )
    matches = rapid_demuxer.demux("g1", read)
    assert len(matches) == 1
    assert matches[0].match_type == BarcodeType.Fflank
    assert matches[0].label == "flank"
    assert matches[0].barcode_cost == 44  # pattern length sentinel


def test_double_construct_two_matches(rapid_demuxer):
    rng = random.Random(5)
    read = (
        rapid_construct(0)
        + random_seq(rng, 10)
        + rapid_construct(1)
        + random_seq(rng, 300)
    )
    matches = rapid_demuxer.demux("d1", read)
    labels = [m.label for m in matches if m.match_type == BarcodeType.Ftag]
    assert labels == ["BC01", "BC02"]


def test_construct_both_ends(rapid_demuxer):
    rng = random.Random(6)
    read = (
        rapid_construct(2)
        + random_seq(rng, 400)
        + dna.reverse_complement_bytes(rapid_construct(3))
    )
    matches = rapid_demuxer.demux("b1", read)
    assert len(matches) == 2
    assert {m.label for m in matches} == {"BC03", "BC04"}
    strands = {m.label: m.strand for m in matches}
    assert strands["BC03"] == Strand.Fwd
    assert strands["BC04"] == Strand.Rc


def test_left_trimmed_construct_overhang(rapid_demuxer):
    # Drop the first 12 bases of the construct (overhang at read start):
    # alpha=0.4 makes the flank still reachable within k=20.
    rng = random.Random(7)
    read = rapid_construct(7)[12:] + random_seq(rng, 300)
    matches = rapid_demuxer.demux("t1", read)
    tags = [m for m in matches if m.match_type == BarcodeType.Ftag]
    assert len(tags) == 1
    assert tags[0].label == "BC08"
    assert tags[0].read_start_flank == 0


def test_nbd_kit_demux_clean():
    group = BarcodeGroup.from_kit("SQK-NBD114-24")[0]
    group.set_flank_threshold(get_edit_cut_off(group.get_effective_len()))
    d = Demuxer(alpha=0.4)
    d.add_query_group(group)
    rng = random.Random(8)
    construct = (db.NB_1ST_FRONT + db.NB_SEQS[5] + db.NB_1ST_REAR).encode()
    read = construct + random_seq(rng, 200)
    matches = d.demux("nb1", read)
    tags = [m for m in matches if m.match_type == BarcodeType.Ftag]
    assert len(tags) == 1
    assert tags[0].label == "NB06"
