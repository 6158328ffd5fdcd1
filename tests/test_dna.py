import numpy as np

from barbell_tpu.utils import dna


def test_encode_basic():
    masks = dna.encode("ACGT")
    assert list(masks) == [1, 2, 4, 8]
    assert list(dna.encode("acgt")) == [1, 2, 4, 8]


def test_encode_iupac_degenerate():
    assert dna.encode("N")[0] == 15
    assert dna.encode("R")[0] == 5  # A|G
    assert dna.encode("Y")[0] == 10  # C|T


def test_match_semantics():
    # N matches everything; R matches A and G but not C/T.
    n = dna.encode("N")[0]
    for b in "ACGT":
        assert n & dna.encode(b)[0]
    r = dna.encode("R")[0]
    assert r & dna.encode("A")[0]
    assert r & dna.encode("G")[0]
    assert not (r & dna.encode("C")[0])
    assert not (r & dna.encode("T")[0])


def test_validity():
    assert dna.is_valid_iupac(b"ACGTRYSWKMBDHVNacgtn")
    assert not dna.is_valid_iupac(b"@@@@")
    assert not dna.is_valid_iupac(b"ACG-T")


def test_reverse_complement_bytes():
    assert dna.reverse_complement_bytes(b"ACGT") == b"ACGT"
    assert dna.reverse_complement_bytes(b"AACC") == b"GGTT"
    assert dna.reverse_complement_bytes(b"RYSWKM") == b"KMWSRY"
    assert dna.reverse_complement_bytes(b"N") == b"N"


def test_mask_complement_consistency():
    # Complement-then-encode == encode-then-mask-complement for all codes.
    seq = b"ACGTRYSWKMBDHVN"
    via_bytes = dna.encode(dna.reverse_complement_bytes(seq))
    via_masks = dna.reverse_complement_masks(dna.encode(seq))
    assert np.array_equal(via_bytes, via_masks)


def test_upper_bytes():
    assert dna.upper_bytes(b"acgTn") == b"ACGTN"
