"""Two-tier ends scan (shallow + deep-left rescue, round 5).

Contract under test (models/twotier.py, docs/SEMANTICS.md dev. 7):

* construct-at-start reads never trigger the rescue and are
  row-identical to the shallow single-tier scan (and to the full scan);
* reads whose visible near-boundary hits could chain past the shallow
  claim ARE rescued and come out row-identical to the deep single-tier
  scan (here also the full scan: all constructs within deep depth);
* boundary constructs on BOTH strands pin the trigger edge;
* an un-chained band hit (between the shallow and deep claims, no
  trigger) is the documented deviation — asserted explicitly.
"""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from barbell_tpu.models import hittable
from barbell_tpu.models.barcodes import BarcodeGroup
from barbell_tpu.models.pipeline import JaxDemuxEngine
from barbell_tpu.models.twotier import EndsPlan, TwoTierDemuxEngine, make_ends_engine
from barbell_tpu.ops.edit_model import get_edit_cut_off
from barbell_tpu.sim.simulate import (
    default_barcodes,
    mutate_sequence,
    rapid_adapter,
    random_sequence,
)
from barbell_tpu.utils import dna

PLAN = EndsPlan(shallow=(512, 512), deep=(896, 512), trigger_margin=374)


def _groups():
    groups = BarcodeGroup.from_kit("SQK-RBK114-96", False)
    for g in groups:
        g.set_flank_threshold(get_edit_cut_off(g.get_effective_len()))
    return groups


def _cpu1():
    return jax.devices()[:1]


def _assert_tables_equal(a, b):
    assert a.read_ids == b.read_ids
    assert np.array_equal(a.read_lens, b.read_lens)
    for c in hittable.COLUMNS:
        assert np.array_equal(a.cols[c], b.cols[c]), c


def _chain_read(rng, bcs, junk_pre: int, gap: int, body: int, rc: bool):
    """junk + adapter(b) + gap + adapter(b) + body — the within-sample
    ligation construct the presets' @prev_left chain rescues."""
    label, bseq = bcs[rng.randrange(96)]
    ad = rapid_adapter(bseq)
    seq = (
        bytes(random_sequence(rng, junk_pre))
        + ad
        + bytes(random_sequence(rng, gap))
        + ad
        + bytes(random_sequence(rng, body))
    )
    if rc:
        seq = dna.reverse_complement_bytes(seq)
    return seq


def test_plan_derivation_presets():
    from barbell_tpu.kits.presets import preset_patterns
    from barbell_tpu.stages.kit import ends_plan_for_patterns
    from barbell_tpu.stages.pattern import pattern_from_str

    groups = _groups()
    pats = [pattern_from_str(s) for s in preset_patterns("single", False)]
    plan = ends_plan_for_patterns(pats, groups)
    assert plan == PLAN

    # no @prev_left chain -> single tier
    solo = [pattern_from_str("Ftag[fw, *, @left(0..250), >>]")]
    p2 = ends_plan_for_patterns(solo, groups)
    assert p2 == EndsPlan(shallow=(512, 512))

    # unbounded -> full scan
    unb = [pattern_from_str("Ftag[fw, *]")]
    assert ends_plan_for_patterns(unb, groups) is None


def test_no_trigger_matches_shallow_and_full():
    rng = random.Random(1)
    groups = _groups()
    bcs = default_barcodes(96)
    ids, seqs = [], []
    for i in range(10):
        label, bseq = bcs[rng.randrange(96)]
        seq = rapid_adapter(bseq) + bytes(
            random_sequence(rng, rng.randrange(900, 3000))
        )
        if rng.random() < 0.5:
            seq = dna.reverse_complement_bytes(seq)
        ids.append(f"r{i}")
        seqs.append(mutate_sequence(rng, seq, 0, 6))
    tt = TwoTierDemuxEngine(groups, PLAN, devices=_cpu1())
    t = tt.demux_batch_table(ids, seqs)
    assert tt.last_rescued == 0
    shallow = JaxDemuxEngine(groups, devices=_cpu1(), ends_window=PLAN.shallow)
    _assert_tables_equal(t, shallow.demux_batch_table(ids, seqs))
    full = JaxDemuxEngine(groups, devices=_cpu1())
    _assert_tables_equal(t, full.demux_batch_table(ids, seqs))


def test_trigger_rescues_boundary_chains():
    """Chained second barcodes placed so their flank ends straddle the
    shallow claim boundary (~501): reads whose second link falls beyond
    it MUST be rescued and equal the full scan (VERDICT r04 #7 —
    boundary constructs).  Within each read the chain carries BOTH
    strands' evidence: fw reads are built directly; read c4 plants an
    rc-strand second adapter (the chain links need not share strands —
    cf. the DOUBLE_MAXIMIZE triple pattern's rc middle element)."""
    rng = random.Random(2)
    groups = _groups()
    bcs = default_barcodes(96)
    ids, seqs = [], []
    # junk_pre ~150-250 puts the first flank end at ~240-340 (trigger
    # threshold 512-374=138); gap up to 250 pushes the second link's
    # flank end across the 501 claim boundary.
    for i, (junk_pre, gap) in enumerate(
        [(150, 100), (150, 240), (200, 200), (250, 240), (250, 0)]
    ):
        seqs.append(
            _chain_read(rng, bcs, junk_pre, gap, 1800 + 37 * i, False)
        )
        ids.append(f"c{i}")
    # rc-strand second link at the chain boundary
    label, bseq = bcs[17]
    ad = rapid_adapter(bseq)
    seqs.append(
        bytes(random_sequence(rng, 200))
        + ad
        + bytes(random_sequence(rng, 200))
        + dna.reverse_complement_bytes(ad)
        + bytes(random_sequence(rng, 1700))
    )
    ids.append("c_rc_link")
    tt = TwoTierDemuxEngine(groups, PLAN, devices=_cpu1())
    t = tt.demux_batch_table(ids, seqs)
    assert tt.last_rescued >= 4  # the deep cases really rescued
    full = JaxDemuxEngine(groups, devices=_cpu1())
    _assert_tables_equal(t, full.demux_batch_table(ids, seqs))


def test_rc_sequenced_chain_no_rescue():
    """A wholly reverse-complemented chain read carries its construct
    at the READ's right end: no preset pattern can accept a right-end
    chain (`@prev_left` chains anchor left; rc-sequenced rapid reads
    are dropped by filter in both implementations — docs/SEMANTICS.md),
    so the trigger correctly stays cold and the result equals the
    shallow single-tier scan."""
    rng = random.Random(6)
    groups = _groups()
    bcs = default_barcodes(96)
    ids, seqs = [], []
    for i, (junk_pre, gap) in enumerate([(150, 240), (250, 240)]):
        seqs.append(_chain_read(rng, bcs, junk_pre, gap, 1800, True))
        ids.append(f"r{i}")
    tt = TwoTierDemuxEngine(groups, PLAN, devices=_cpu1())
    t = tt.demux_batch_table(ids, seqs)
    assert tt.last_rescued == 0
    shallow = JaxDemuxEngine(groups, devices=_cpu1(), ends_window=PLAN.shallow)
    _assert_tables_equal(t, shallow.demux_batch_table(ids, seqs))


def test_trigger_matches_deep_single_tier():
    """Rescued reads get exactly the deep-window row set (here junk
    beyond deep depth exists, so deep != full — compare vs deep)."""
    rng = random.Random(3)
    groups = _groups()
    bcs = default_barcodes(96)
    label, bseq = bcs[5]
    ad = rapid_adapter(bseq)
    # chain that triggers + junk construct at depth ~2000 (mid-read,
    # unseen by BOTH deep and two-tier)
    seq = (
        bytes(random_sequence(rng, 200))
        + ad
        + bytes(random_sequence(rng, 200))
        + ad
        + bytes(random_sequence(rng, 1200))
        + ad
        + bytes(random_sequence(rng, 1500))
    )
    tt = TwoTierDemuxEngine(groups, PLAN, devices=_cpu1())
    t = tt.demux_batch_table(["x"], [seq])
    assert tt.last_rescued == 1
    deep = JaxDemuxEngine(groups, devices=_cpu1(), ends_window=PLAN.deep)
    _assert_tables_equal(t, deep.demux_batch_table(["x"], [seq]))


def test_band_junk_without_trigger_is_documented_deviation():
    """A clean left construct (no trigger) + an un-chained junk
    construct in the (shallow, deep] band: the deep single-tier scan
    sees the junk row, the two-tier scan does not — the documented
    deviation (docs/SEMANTICS.md deviation 7)."""
    rng = random.Random(4)
    groups = _groups()
    bcs = default_barcodes(96)
    label, bseq = bcs[9]
    seq = (
        rapid_adapter(bseq)
        + bytes(random_sequence(rng, 480))
        + rapid_adapter(bcs[40][1])
        + bytes(random_sequence(rng, 2000))
    )
    tt = TwoTierDemuxEngine(groups, PLAN, devices=_cpu1())
    t = tt.demux_batch_table(["b"], [seq])
    assert tt.last_rescued == 0
    deep = JaxDemuxEngine(groups, devices=_cpu1(), ends_window=PLAN.deep)
    td = deep.demux_batch_table(["b"], [seq])
    # deep sees strictly more rows; the rows two-tier has are a prefix-
    # by-position subset of deep's
    assert t.n_rows < td.n_rows
    shallow = JaxDemuxEngine(groups, devices=_cpu1(), ends_window=PLAN.shallow)
    _assert_tables_equal(t, shallow.demux_batch_table(["b"], [seq]))


def test_twotier_through_engine_map_batches():
    """The production driver (engine_map_batches) runs batches on
    worker threads; a mixed stream of plain and trigger reads through
    the two-tier engine must equal the full scan read for read and
    count every rescue."""
    from barbell_tpu.models.pipeline import engine_map_batches

    rng = random.Random(9)
    groups = _groups()
    bcs = default_barcodes(96)
    ids, seqs = [], []
    for i in range(24):
        if i % 6 == 5:
            seqs.append(_chain_read(rng, bcs, 200, 220, 1500, False))
        else:
            label, bseq = bcs[rng.randrange(96)]
            s = rapid_adapter(bseq) + bytes(
                random_sequence(rng, rng.randrange(900, 2600))
            )
            seqs.append(mutate_sequence(rng, s, 0, 5))
        ids.append(f"t{i}")
    tt = TwoTierDemuxEngine(groups, PLAN, devices=_cpu1())
    full = JaxDemuxEngine(groups, devices=_cpu1())

    def batches():
        for i in range(0, len(ids), 6):
            yield ids[i : i + 6], seqs[i : i + 6]

    got = {}
    for bids, _bs, out in engine_map_batches(tt, batches(), depth=3):
        for rid, rows in zip(bids, out):
            got[rid] = [m.to_tsv_row() for m in rows]
    want_tbl = full.demux_batch(ids, seqs)
    for rid, rows in zip(ids, want_tbl):
        assert got[rid] == [m.to_tsv_row() for m in rows], rid
    assert tt.total_rescued == 4  # every planted chain read rescued


def test_kit_two_tier_rescue_matches_full_scan(tmp_path):
    """End-to-end kit runner: a --maximize RBK run whose input plants
    chain-boundary reads (the two-tier rescue's reason to exist) writes
    byte-identical stage files + FASTQs to --full-scan."""
    import os

    from barbell_tpu.stages.kit import KitRunConfig, demux_using_kit

    rng = random.Random(31)
    bcs = default_barcodes(8)
    recs = []
    for i in range(10):
        label, bseq = bcs[rng.randrange(8)]
        if i % 3 == 0:
            # chained double construct straddling the shallow claim
            ad = rapid_adapter(bseq)
            seq = (
                bytes(random_sequence(rng, 150 + 20 * i))
                + ad
                + bytes(random_sequence(rng, 200))
                + ad
                + bytes(random_sequence(rng, 1500))
            )
        else:
            seq = rapid_adapter(bseq) + bytes(
                random_sequence(rng, rng.randrange(800, 2500))
            )
            if rng.random() < 0.5:
                seq = dna.reverse_complement_bytes(seq)
            seq = mutate_sequence(rng, seq, 0, 4)
        recs.append((f"k{i}", seq))
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as fh:
        for rid, seq in recs:
            s = seq.decode()
            fh.write(f"@{rid}\n{s}\n+\n{'I' * len(s)}\n")

    blobs = {}
    for mode, full_scan in (("ends", False), ("full", True)):
        out_dir = tmp_path / mode
        demux_using_kit(
            [str(fq)],
            KitRunConfig(
                kit_name="SQK-RBK114-96",
                output_folder=str(out_dir),
                backend="jax",
                batch_size=5,
                maximize=True,
                full_scan=full_scan,
            ),
        )
        blobs[mode] = {
            f: (out_dir / f).read_bytes()
            for f in sorted(os.listdir(out_dir))
        }
    assert sorted(blobs["ends"]) == sorted(blobs["full"])
    for name in blobs["full"]:
        assert blobs["ends"][name] == blobs["full"][name], name
    assert any(n.endswith(".trimmed.fastq") for n in blobs["full"])


def test_make_ends_engine_and_object_api():
    groups = _groups()
    assert isinstance(
        make_ends_engine(groups, PLAN, devices=_cpu1()), TwoTierDemuxEngine
    )
    assert isinstance(
        make_ends_engine(groups, EndsPlan(shallow=(512, 512)), devices=_cpu1()),
        JaxDemuxEngine,
    )
    assert isinstance(
        make_ends_engine(groups, None, devices=_cpu1()), JaxDemuxEngine
    )
    rng = random.Random(5)
    bcs = default_barcodes(96)
    tt = TwoTierDemuxEngine(groups, PLAN, devices=_cpu1())
    tt.warm_deep()
    seq = _chain_read(rng, bcs, 200, 220, 1500, False)
    matches = tt.demux_batch(["m"], [seq])
    assert tt.last_rescued == 1
    full = JaxDemuxEngine(groups, devices=_cpu1())
    fm = full.demux_batch(["m"], [seq])
    assert [
        [m.to_tsv_row() for m in ms] for ms in matches
    ] == [[m.to_tsv_row() for m in ms] for ms in fm]
