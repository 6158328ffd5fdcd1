"""Golden conformance tests on the reference's OWN example fixtures.

``tests/fixtures/*.fasta`` are byte-for-byte mirrors of
``examples/*.fasta`` in the reference repo — the same files its inline
tests load (`src/annotate/barcodes.rs:532-546`).  Expected values here
are transcribed from the reference's test expectations
(`barcodes.rs:443-555`) and from its documented construct layouts, so
drift from the reference's behavior on real kit data fails loudly.
"""

import os

import pytest

from barbell_tpu.models.barcodes import BarcodeGroup
from barbell_tpu.models.records import BarcodeType, Strand

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def fx(name):
    return os.path.join(FIXTURES, name)


def test_rapid_bars_group_matches_reference_expectations():
    """Port of `barcodes.rs::test_fasta_read` on the real 96-plex
    rapid_bars.fasta fixture, with its exact expected values."""
    group = BarcodeGroup.from_fasta(fx("rapid_bars.fasta"), BarcodeType.Ftag)
    expected_flank = (
        b"GCTTGGGTGTTTAACC"
        + b"N" * 24
        + b"GTTTTCGCATTTATCGTGAAACGCTTTCGCGTTTTTCGTGCGCCGCTTCA"
    )
    assert group.flank == expected_flank
    assert group.bar_region == (16, 39)
    assert group.flank[16:40] == b"N" * 24
    assert len(group.barcodes) == 96
    # NB01 fwd barcode bases inside the padded slice
    assert group.barcodes[0].seq[10 : 10 + 24] == b"AAGAAAGTTGTCGGTGTCTTTGTG"
    assert group.barcodes[0].label == "BC01"
    assert group.barcodes[95].label == "BC96"


def test_native_bars_group_structure():
    group = BarcodeGroup.from_fasta(fx("native_bars.fasta"), BarcodeType.Ftag)
    assert len(group.barcodes) == 96
    assert group.bar_region[1] - group.bar_region[0] + 1 == 24


@pytest.mark.parametrize(
    "name,n_expected",
    [("native_left.fasta", 96), ("native_right.fasta", 96),
     ("ald_left.fasta", 2), ("ald_right.fasta", 14)],
)
def test_fixture_groups_build(name, n_expected):
    """Every reference example file must build a valid group (equal
    lengths, shared prefix/suffix flank extraction, IUPAC-clean)."""
    group = BarcodeGroup.from_fasta(fx(name), BarcodeType.Ftag)
    assert len(group.barcodes) == n_expected
    a, b = group.bar_region
    assert 0 <= a <= b < len(group.flank)
    assert set(group.flank[a : b + 1]) == {ord("N")}


def _read_fasta_dict(path):
    from barbell_tpu.utils.fastx import read_fasta

    return {name.split()[0]: bytes(seq).upper() for name, seq in read_fasta(path)}


def _demuxer_for(path, barcode_type=BarcodeType.Ftag):
    from barbell_tpu.models.demux import Demuxer
    from barbell_tpu.ops.edit_model import get_edit_cut_off

    group = BarcodeGroup.from_fasta(path, barcode_type)
    group.set_flank_threshold(get_edit_cut_off(group.get_effective_len()))
    d = Demuxer(alpha=0.4)
    d.add_query_group(group)
    return d


def test_annotate_rapid_bars_fixture_reads():
    """Exact construct + noisy-body reads built from the fixture's own
    sequences must annotate to their labels, fwd and rc."""
    import random

    from barbell_tpu.sim.simulate import mutate_sequence
    from barbell_tpu.utils import dna

    seqs = _read_fasta_dict(fx("rapid_bars.fasta"))
    d = _demuxer_for(fx("rapid_bars.fasta"))
    rng = random.Random(2)
    for label in ("BC01", "BC37", "BC96"):
        body = bytes(rng.choice(b"ACGT") for _ in range(400))
        read = seqs[label] + body
        for strand, s in (
            (Strand.Fwd, read),
            (Strand.Rc, dna.reverse_complement_bytes(read)),
        ):
            noisy = mutate_sequence(rng, s, 0, 4)
            rows = d.demux(label, noisy)
            tags = [m for m in rows if m.match_type == BarcodeType.Ftag]
            assert tags, (label, strand)
            assert tags[0].label == label
            assert tags[0].strand == strand


def test_annotate_dual_native_left_right():
    """native_left as Ftag + native_right as Rtag on a double-ended
    read — the reference README's custom dual-barcode workflow."""
    import random

    from barbell_tpu.models.demux import Demuxer
    from barbell_tpu.ops.edit_model import get_edit_cut_off

    left = _read_fasta_dict(fx("native_left.fasta"))
    right = _read_fasta_dict(fx("native_right.fasta"))
    gl = BarcodeGroup.from_fasta(fx("native_left.fasta"), BarcodeType.Ftag)
    gr = BarcodeGroup.from_fasta(fx("native_right.fasta"), BarcodeType.Rtag)
    for g in (gl, gr):
        g.set_flank_threshold(get_edit_cut_off(g.get_effective_len()))
    d = Demuxer(alpha=0.4)
    d.add_query_group(gl)
    d.add_query_group(gr)

    rng = random.Random(9)
    # left labels are Native_top_N, right labels Native_bottom_N
    l_label, r_label = "Native_top_5", "Native_bottom_5"
    body = bytes(rng.choice(b"ACGT") for _ in range(500))
    read = left[l_label] + body + right[r_label]
    rows = d.demux("dual", read)
    types = {m.match_type for m in rows}
    assert BarcodeType.Ftag in types and BarcodeType.Rtag in types
    for m in rows:
        if m.match_type == BarcodeType.Ftag:
            assert m.label == l_label
        elif m.match_type == BarcodeType.Rtag:
            assert m.label == r_label


def test_ald_right_asymmetric_fixture_annotates():
    """ald_right.fasta (14 amplicon barcodes) — small real fixture with
    a long shared suffix; flank-only rows must not be emitted for clean
    construct reads."""
    import random

    seqs = _read_fasta_dict(fx("ald_right.fasta"))
    d = _demuxer_for(fx("ald_right.fasta"), BarcodeType.Rtag)
    rng = random.Random(4)
    label = sorted(seqs)[3]
    read = bytes(rng.choice(b"ACGT") for _ in range(300)) + seqs[label]
    rows = d.demux("ald", read)
    tags = [m for m in rows if m.match_type == BarcodeType.Rtag]
    assert tags and tags[0].label == label


def test_engine_matches_oracle_on_rapid_bars_fixture():
    """The device engine must stay row-identical to the oracle on
    queries built from the REAL fixture file (not synthetic kit
    tables)."""
    pytest.importorskip("jax")
    import random

    from barbell_tpu.models.demux import Demuxer
    from barbell_tpu.models.pipeline import JaxDemuxEngine
    from barbell_tpu.ops.edit_model import get_edit_cut_off
    from barbell_tpu.sim.simulate import mutate_sequence
    from barbell_tpu.utils import dna

    seqs = _read_fasta_dict(fx("rapid_bars.fasta"))

    def group():
        g = BarcodeGroup.from_fasta(fx("rapid_bars.fasta"), BarcodeType.Ftag)
        g.set_flank_threshold(get_edit_cut_off(g.get_effective_len()))
        return g

    d = Demuxer(alpha=0.4)
    d.add_query_group(group())
    engine = JaxDemuxEngine([group()])

    rng = random.Random(6)
    ids, reads = [], []
    for i, label in enumerate(("BC01", "BC08", "BC44", "BC70", "BC96")):
        body = bytes(rng.choice(b"ACGT") for _ in range(rng.randrange(200, 600)))
        read = seqs[label] + body
        if i % 2:
            read = dna.reverse_complement_bytes(read)
        ids.append(label)
        reads.append(mutate_sequence(rng, read, 0, 5))

    got = engine.demux_batch(ids, reads)
    for rid, read, rows in zip(ids, reads, got):
        assert rows == d.demux(rid, read), rid
