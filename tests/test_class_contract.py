"""Per-class accuracy contract for the simulated evaluation groups.

The reference documents the expected outcome per class
(`benchmarks/data/README.md:1-13`, `sim_data.rs:403-411`):

* GroupI   (random)            — nothing assigned
* GroupII  (perfect construct) — everything assigned, all correct
* GroupIII (edge-trimmed)      — best effort, assigned reads correct
* GroupIV  (double barcode)    — invalid, nothing assigned
* GroupV   (mid-read barcode)  — invalid, nothing assigned
* GroupVI  (barcode both ends) — invalid, nothing assigned

This test pins the whole contract so a regression that starts accepting
chimeric reads (IV/V/VI) or random data (I) fails the suite, not just
one that breaks GroupII recovery.
"""

import pytest

from barbell_tpu.sim.compare import run_compare
from barbell_tpu.sim.simulate import GROUPS, create_testdata, default_barcodes

N = 12

# GroupIII floor: reads lose up to 10nt off the adapter's outer edge;
# with the kit's 15-edit flank budget most still match. Measured on
# seeds 0..4: 12/12 assigned each time — the floor leaves slack for
# future simulator tweaks without letting recovery collapse.
GROUP_III_FLOOR = int(0.75 * N)


@pytest.mark.slow
def test_per_class_accuracy_contract(tmp_path):
    sim_dir = tmp_path / "sim"
    create_testdata(
        N,
        str(sim_dir),
        barcodes=default_barcodes(8),
        rc_frac=0.0,
        seed=0,
        groups=GROUPS,
    )
    reports = {
        r.group: r
        for r in run_compare(
            str(sim_dir), str(tmp_path / "work"), backend="oracle"
        )
    }
    assert set(reports) == set(GROUPS)
    for r in reports.values():
        assert r.total_reads == N, r

    # Valid reads: full recovery, no mis-assignments.
    g2 = reports["GroupII"]
    assert g2.assigned == N and g2.correct == N, g2

    # Trimmed reads: best-effort recovery, everything assigned correct.
    g3 = reports["GroupIII"]
    assert g3.assigned >= GROUP_III_FLOOR, g3
    assert g3.correct == g3.assigned, g3

    # Random + chimeric reads: rejected outright.
    for group in ("GroupI", "GroupIV", "GroupV", "GroupVI"):
        r = reports[group]
        assert r.assigned == 0, (group, r)
