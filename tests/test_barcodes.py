"""BarcodeGroup construction tests (reference `src/annotate/barcodes.rs:443-555`)."""

import numpy as np
import pytest

from barbell_tpu.kits import database as db
from barbell_tpu.models.barcodes import BarcodeGroup
from barbell_tpu.models.records import BarcodeType, Strand


def test_barcode_group_basic():
    group = BarcodeGroup.from_seqs(
        [b"AAATTTGGG", b"AAACCCGGG"], ["s1", "s2"], BarcodeType.Ftag
    )
    assert group.flank == b"AAANNNGGG"
    assert group.bar_region == (3, 5)
    assert len(group.barcodes) == 2
    # padding maxes out to the full construct here
    assert group.barcodes[0].seq == b"AAATTTGGG"
    assert group.barcodes[1].seq == b"AAACCCGGG"


def test_barcode_group_invalid_seq():
    with pytest.raises(ValueError):
        BarcodeGroup.from_seqs([b"@@@@@@@@@", b"AAACCCGGG"], ["s1", "s2"], BarcodeType.Ftag)


def test_barcode_group_unequal_length():
    with pytest.raises(ValueError):
        BarcodeGroup.from_seqs(
            [b"AAATTTGGG", b"AAAAAAACCCGGG"], ["s1", "s2"], BarcodeType.Ftag
        )


def test_barcode_group_single_seq_rejected():
    with pytest.raises(ValueError):
        BarcodeGroup.from_seqs([b"AAATTTGGG"], ["s1"], BarcodeType.Ftag)


def test_longest_common_prefix_suffix():
    from barbell_tpu.models.barcodes import (
        _longest_common_prefix,
        _longest_common_suffix,
    )

    assert _longest_common_prefix([b"ACGTAGAGAG", b"ACGTAGACTA", b"ACGAGCAGGA"]) == b"ACG"
    assert (
        _longest_common_suffix([b"ACGTAGAGAGGGA", b"ACGTTAGACTAGA", b"ACGAGCAGGAGAA"])
        == b"A"
    )


def test_rapid_kit_group_structure():
    """The RBK96 rapid-kit construct set — mirrors the reference's
    `test_fasta_read` on examples/rapid_bars.fasta (which is exactly the
    RBK96 template expansion)."""
    groups = BarcodeGroup.from_kit("SQK-RBK110-96")
    assert len(groups) == 1
    g = groups[0]
    expected_flank = (
        b"GCTTGGGTGTTTAACC"
        + b"N" * 24
        + b"GTTTTCGCATTTATCGTGAAACGCTTTCGCGTTTTTCGTGCGCCGCTTCA"
    )
    assert g.flank == expected_flank
    assert g.bar_region == (16, 39)
    assert g.flank[16:40] == b"N" * 24
    assert len(g.barcodes) == 96
    # pad_start = 16-10 = 6; barcode BC01 at offset 10 within the slice
    assert g.barcodes[0].seq[10 : 10 + 24] == b"AAGAAAGTTGTCGGTGTCTTTGTG"
    assert g.pad_region == (6, 50)
    assert g.pattern_len == 44


def test_nbd_kit_group():
    groups = BarcodeGroup.from_kit("SQK-NBD114-96")
    assert len(groups) == 1
    g = groups[0]
    assert g.barcode_type == BarcodeType.Ftag
    assert g.flank_prefix == b"ATTGCTAAGGTTAA"
    assert g.flank_suffix == b"CAGCACCT"
    assert len(g.barcodes) == 96
    assert g.barcodes[0].label == "NB01"


def test_extended_templates_gated():
    default = BarcodeGroup.from_kit("SQK-RBK114-96", use_extended=False)
    extended = BarcodeGroup.from_kit("SQK-RBK114-96", use_extended=True)
    assert len(default) == 1
    assert len(extended) == 2


def test_compiled_tensors():
    groups = BarcodeGroup.from_kit("SQK-RBK110-96")
    g = groups[0]
    assert g.patterns_fwd.shape == (96, 44)
    assert g.patterns_rc.shape == (96, 44)
    assert g.flank_masks.shape == (90,)
    # rc patterns really are reverse complements
    from barbell_tpu.utils import dna

    want = dna.encode(dna.reverse_complement_bytes(g.barcodes[3].seq))
    assert np.array_equal(g.patterns_rc[3], want)
    assert g.patterns_for_strand(Strand.Fwd) is g.patterns_fwd
    assert g.patterns_for_strand(Strand.Rc) is g.patterns_rc


def test_effective_len_and_threshold():
    g = BarcodeGroup.from_kit("SQK-RBK110-96")[0]
    assert g.get_effective_len() == 16 + 50
    from barbell_tpu.ops.edit_model import get_edit_cut_off

    k = get_edit_cut_off(g.get_effective_len())
    assert k == 20  # ceil(0.51*66 - 1.7312*sqrt(66))
