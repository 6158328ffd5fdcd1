"""Kit database tests mirroring reference `src/kits/kits.rs:1105-1183`."""

import pytest

from barbell_tpu.kits import database as db


def test_get_barcodes_bc_1_to_12():
    assert db.get_barcodes("BC01", "BC12", False) == [f"BC{i:02d}" for i in range(1, 13)]


def test_get_barcodes_with_12a_boundary_suffix():
    got = db.get_barcodes("BC1A", "BC12A", False)
    assert got[:11] == [f"BC{i:02d}" for i in range(1, 12)]
    assert got[11] == "BC12A"


def test_get_barcodes_bc_1_to_13_with_12a():
    got = db.get_barcodes("BC1A", "BC13A", False)
    assert got[11] == "BC12A"
    assert got[12] == "BC13"


def test_get_barcodes_nb():
    assert db.get_barcodes("NB01", "NB12", False) == [f"NB{i:02d}" for i in range(1, 13)]


def test_get_barcodes_rbk_special_relabel():
    assert db.get_barcodes("RBK24", "RBK28", False) == [
        "BC24",
        "BC25",
        "RBK26",
        "BC27",
        "BC28",
    ]


def test_get_barcodes_rpb24_kit14_12a_flag():
    got = db.get_barcodes("BC01", "BC24", True)
    assert len(got) == 24
    assert got[10] == "BC11"
    assert got[11] == "BC12A"
    assert got[12] == "BC13"


def test_get_barcodes_rlb_12a_flag():
    got = db.get_barcodes("BC01", "BC12", True)
    assert got[-1] == "BC12A"


def test_lookup_bc12a():
    assert db.lookup_barcode_seq("BC12A") == "GTTGAGTTACAAAGCACCGATCAG"


def test_lookup_nb_vs_bc():
    assert db.lookup_barcode_seq("NB01") == "CACAAAGACACCGACAACTTTCTT"
    assert db.lookup_barcode_seq("BC01") == "AAGAAAGTTGTCGGTGTCTTTGTG"
    # NB13+ falls back to BC table
    assert db.lookup_barcode_seq("NB13") == db.lookup_barcode_seq("BC13")


def test_lookup_rbk_special():
    assert db.lookup_barcode_seq("RBK26") == "ACTATGCCTTTCCGTGAAACAGTT"
    assert db.lookup_barcode_seq("RBK01") == db.lookup_barcode_seq("BC01")


def test_get_kit_info_aliases():
    a = db.get_kit_info("SQK-RBK114-96")
    assert a.name == "RBK096_kit14"
    assert db.get_kit_info("SQK-NBD114-96").name == "NB96"
    # '.' name fixup
    assert db.get_kit_info("SQK.RBK114.96").name == "RBK096_kit14"


def test_get_kit_info_unknown():
    with pytest.raises(KeyError):
        db.get_kit_info("SQK-NOPE")


def test_expand_template_rbk114():
    spec = db.get_kit_info("SQK-RBK114-96")
    default_templates = [t for t in spec.templates if not t.extended]
    assert len(default_templates) == 1
    labels, seqs = db.expand_template(default_templates[0])
    assert len(labels) == 96
    assert labels[0] == "BC01"
    assert labels[25] == "RBK26"
    assert seqs[0] == db.RBK4_KIT14_FRONT + db.BC_SEQS[0] + db.RBK4_KIT14_REAR
    # extended fusion template exists
    assert any(t.extended for t in spec.templates)


def test_all_kits_expand():
    seen = set()
    for alias in db.supported_kits():
        spec = db.get_kit_info(alias)
        if spec.name in seen:
            continue
        seen.add(spec.name)
        for tmpl in spec.templates:
            labels, seqs = db.expand_template(tmpl)
            assert len(labels) == len(seqs) > 0
            assert len({len(s) for s in seqs}) == 1, f"unequal lengths in {spec.name}"


def test_get_barcodes_out_of_range_raises():
    """Reference parity: kits.rs's label-range slice panics out of range
    (`src/kits/kits.rs:761-770`) — never clip silently."""
    import pytest

    from barbell_tpu.kits.database import get_barcodes

    with pytest.raises(ValueError, match="outside"):
        get_barcodes("BC01", "BC97", False)
    with pytest.raises(ValueError, match="outside"):
        get_barcodes("AB01", "AB25", False)
