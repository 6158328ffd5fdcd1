"""End-to-end coverage beyond the kit preset: custom dual-end queries,
extended templates, gzip output, CLI surface."""

import gzip
import os
import random

import pytest

from barbell_tpu import cli
from barbell_tpu.kits import database as db
from barbell_tpu.models.records import BarcodeType, read_annotations
from barbell_tpu.stages.annotate import AnnotateConfig, annotate_with_files
from barbell_tpu.stages.filter import filter_from_pattern_str
from barbell_tpu.stages.trim import LabelConfig, trim_matches
from barbell_tpu.utils import dna


def _rand(rng, n):
    return bytes(rng.choice(b"ACGT") for _ in range(n))


LEFT_FLANK_PRE = b"CCGTGAC"
LEFT_FLANK_SUF = b"AGAGTTTGATCATGGCTCAG"
RIGHT_FLANK_PRE = b"CCGTGAC"
RIGHT_FLANK_SUF = b"CGGTTACCTTGTTACGACTT"


def _write_queries(tmp_path, rng, n=4):
    """Two query FASTAs: left (Ftag) and right (Rtag) constructs."""
    bars = [_rand(rng, 24) for _ in range(n)]
    left = tmp_path / "left.fasta"
    right = tmp_path / "right.fasta"
    with open(left, "w") as fh:
        for i, b in enumerate(bars):
            fh.write(f">L{i+1:02d}\n{(LEFT_FLANK_PRE + b + LEFT_FLANK_SUF).decode()}\n")
    with open(right, "w") as fh:
        for i, b in enumerate(bars):
            fh.write(
                f">R{i+1:02d}\n{(RIGHT_FLANK_PRE + b + RIGHT_FLANK_SUF).decode()}\n"
            )
    return left, right, bars


def test_custom_dual_end_annotate_filter_trim(tmp_path):
    rng = random.Random(0)
    left, right, bars = _write_queries(tmp_path, rng)

    # reads: left construct + insert + rc(right construct)
    fastq = tmp_path / "reads.fastq"
    with open(fastq, "w") as fh:
        for i in range(6):
            b = i % len(bars)
            lcon = LEFT_FLANK_PRE + bars[b] + LEFT_FLANK_SUF
            rcon = RIGHT_FLANK_PRE + bars[b] + RIGHT_FLANK_SUF
            seq = lcon + _rand(rng, 300) + dna.reverse_complement_bytes(rcon)
            fh.write(f"@dual_{i}\n{seq.decode()}\n+\n{'I' * len(seq)}\n")

    ann = tmp_path / "ann.tsv"
    annotate_with_files(
        [str(fastq)],
        [str(left), str(right)],
        [BarcodeType.Ftag, BarcodeType.Rtag],
        str(ann),
        AnnotateConfig(backend="oracle", batch_size=8),
    )
    rows = list(read_annotations(str(ann)))
    by_read = {}
    for r in rows:
        by_read.setdefault(r.read_id, []).append(r)
    assert len(by_read) == 6
    for rid, rr in by_read.items():
        types = {r.match_type for r in rr}
        assert BarcodeType.Ftag in types, rid
        assert BarcodeType.Rtag in types, rid

    filtered = tmp_path / "filtered.tsv"
    filter_from_pattern_str(
        str(ann),
        "Ftag[fw, *, @left(0..250), >>]__Rtag[<<, rc, *, @right(0..250)]",
        str(filtered),
    )
    kept = {r.read_id for r in read_annotations(str(filtered))}
    assert len(kept) == 6

    out_dir = tmp_path / "trimmed"
    trim_matches(
        str(filtered),
        [str(fastq)],
        str(out_dir),
        label_config=LabelConfig(True, False, False, False, "left"),
    )
    outs = sorted(os.listdir(out_dir))
    assert outs and all(o.endswith(".trimmed.fastq") for o in outs)
    # trimmed inserts should be the 300bp middles
    for o in outs:
        with open(out_dir / o) as fh:
            lines = fh.read().splitlines()
        for i in range(0, len(lines), 4):
            assert len(lines[i + 1]) == 300


def test_use_extended_adds_fusion_group(tmp_path):
    rng = random.Random(1)
    # fusion construct: FRONT_FUSION + bar + REAR (extended template)
    bar = db.BC_SEQS[0]
    fusion = (db.RBK4_FRONT_FUSION + bar + db.RBK4_REAR).encode()
    fastq = tmp_path / "fusion.fastq"
    with open(fastq, "w") as fh:
        seq = _rand(rng, 200) + fusion + _rand(rng, 200)
        fh.write(f"@fus_0\n{seq.decode()}\n+\n{'I' * len(seq)}\n")

    from barbell_tpu.stages.annotate import annotate_with_kit

    ann_plain = tmp_path / "plain.tsv"
    annotate_with_kit(
        [str(fastq)], str(ann_plain), "SQK-RBK114-96",
        AnnotateConfig(backend="oracle", batch_size=4),
    )
    ann_ext = tmp_path / "ext.tsv"
    annotate_with_kit(
        [str(fastq)], str(ann_ext), "SQK-RBK114-96",
        AnnotateConfig(backend="oracle", batch_size=4, use_extended=True),
    )
    plain_tags = [
        r for r in read_annotations(str(ann_plain)) if r.match_type == BarcodeType.Ftag
    ]
    ext_tags = [
        r for r in read_annotations(str(ann_ext)) if r.match_type == BarcodeType.Ftag
    ]
    # the fusion construct is only confidently assigned with --use-extended
    assert any(r.label == "BC01" for r in ext_tags)
    assert len(ext_tags) >= len(plain_tags)


def test_trim_gzip_roundtrip(tmp_path):
    rng = random.Random(2)
    from barbell_tpu.stages.kit import KitRunConfig, demux_using_kit
    from barbell_tpu.sim.simulate import create_testdata, default_barcodes

    create_testdata(
        4, str(tmp_path / "sim"), barcodes=default_barcodes(4), rc_frac=0.0,
        seed=5, groups=("GroupII",),
    )
    out = tmp_path / "out"
    demux_using_kit(
        [str(tmp_path / "sim" / "GroupII.fastq")],
        KitRunConfig(
            kit_name="SQK-RBK110-96",
            output_folder=str(out),
            backend="oracle",
            gzip=True,
        ),
    )
    gz = [f for f in os.listdir(out) if f.endswith(".trimmed.fastq.gz")]
    assert gz
    with gzip.open(out / gz[0], "rt") as fh:
        lines = fh.read().splitlines()
    assert lines[0].startswith("@")
    assert set(lines[1]) <= set("ACGT")


def test_cli_filter_trim_inspect(tmp_path, capsys):
    rng = random.Random(3)
    from barbell_tpu.sim.simulate import create_testdata, default_barcodes

    create_testdata(
        4, str(tmp_path / "sim"), barcodes=default_barcodes(4), rc_frac=0.0,
        seed=7, groups=("GroupII",),
    )
    fastq = str(tmp_path / "sim" / "GroupII.fastq")
    ann = str(tmp_path / "ann.tsv")
    assert cli.main(
        ["annotate", "-i", fastq, "-o", ann, "--kit", "SQK-RBK110-96",
         "--backend", "oracle", "--batch-size", "4"]
    ) == 0

    pat_file = tmp_path / "patterns.txt"
    pat_file.write_text("Ftag[fw, *, @left(0..250), >>]\n")
    filt = str(tmp_path / "filtered.tsv")
    assert cli.main(["filter", "-i", ann, "-o", filt, "-f", str(pat_file)]) == 0

    assert cli.main(["inspect", "-i", ann, "-n", "5"]) == 0

    outdir = str(tmp_path / "trim_out")
    assert cli.main(
        ["trim", "-i", filt, "-r", fastq, "-o", outdir, "--only-side", "left",
         "--no-orientation", "--no-flanks"]
    ) == 0
    assert any(f.endswith(".trimmed.fastq") for f in os.listdir(outdir))


def test_cli_kits_listing_available():
    from barbell_tpu.kits.database import supported_kits

    kits = supported_kits()
    assert "SQK-RBK114-96" in kits
    assert len(kits) >= 37


def test_engine_matches_oracle_all_sim_classes(tmp_path):
    """Batched engine vs scalar oracle on every simulator read class —
    exercises no-construct reads, truncated constructs, mid-read
    artefacts and double-ended reads through the fused device path
    (multi-hit rows, flank-only rows, hit compaction)."""
    import pytest as _pytest

    _pytest.importorskip("jax")
    from barbell_tpu.models.barcodes import BarcodeGroup
    from barbell_tpu.models.demux import Demuxer
    from barbell_tpu.models.pipeline import JaxDemuxEngine
    from barbell_tpu.ops.edit_model import get_edit_cut_off
    from barbell_tpu.sim.simulate import GROUPS, create_testdata
    from barbell_tpu.utils.fastx import iter_fastq

    create_testdata(3, str(tmp_path), rc_frac=0.5, seed=11)

    groups = BarcodeGroup.from_kit("SQK-RBK114-96")
    for g in groups:
        g.set_flank_threshold(get_edit_cut_off(g.get_effective_len()))
    engine = JaxDemuxEngine(groups)
    d = Demuxer(alpha=0.4)
    for g in groups:
        d.add_query_group(g)

    ids, seqs = [], []
    for cls in GROUPS:
        for rid, seq, _qual in iter_fastq([str(tmp_path / f"{cls}.fastq")]):
            ids.append(f"{cls}:{rid}")
            seqs.append(seq)
    assert len(ids) == 3 * len(GROUPS)

    got = engine.demux_batch(ids, seqs)
    for rid, seq, rows in zip(ids, seqs, got):
        want = d.demux(rid, seq)
        assert rows == want, rid


def test_engine_matches_oracle_with_n_and_invalid_bytes(tmp_path):
    """Reads containing N / lowercase / non-IUPAC bytes must demux
    identically on the device path (invalid bytes degrade to the
    match-anything mask in both paths)."""
    import pytest as _pytest

    _pytest.importorskip("jax")
    import random

    from barbell_tpu.kits.database import BC_SEQS, RBK4_KIT14_FRONT, RBK4_KIT14_REAR
    from barbell_tpu.models.barcodes import BarcodeGroup
    from barbell_tpu.models.demux import Demuxer
    from barbell_tpu.models.pipeline import JaxDemuxEngine
    from barbell_tpu.ops.edit_model import get_edit_cut_off

    rng = random.Random(3)
    groups = BarcodeGroup.from_kit("SQK-RBK114-96")
    for g in groups:
        g.set_flank_threshold(get_edit_cut_off(g.get_effective_len()))
    engine = JaxDemuxEngine(groups)
    d = Demuxer(alpha=0.4)
    for g in groups:
        d.add_query_group(g)

    ids, seqs = [], []
    for i in range(6):
        construct = (
            RBK4_KIT14_FRONT + BC_SEQS[rng.randrange(96)] + RBK4_KIT14_REAR
        ).encode()
        body = bytes(rng.choice(b"ACGTacgtNn") for _ in range(rng.randrange(300, 900)))
        seq = bytearray(construct + body)
        # sprinkle N and junk bytes, including inside the construct
        for _ in range(8):
            seq[rng.randrange(len(seq))] = ord(rng.choice("NnXx?"))
        ids.append(f"r{i}")
        seqs.append(bytes(seq))

    got = engine.demux_batch(ids, seqs)
    for rid, seq, rows in zip(ids, seqs, got):
        assert rows == d.demux(rid, seq), rid


def test_engine_matches_oracle_nbd_kit(tmp_path):
    """SQK-NBD114-96 (native-barcode, double-ended) through the batched
    engine vs the scalar oracle — BASELINE.md names this kit as a
    bit-identical-output target alongside RBK114-96."""
    import pytest as _pytest

    _pytest.importorskip("jax")
    import random

    from barbell_tpu.kits.database import NB_1ST_FRONT, NB_1ST_REAR, NB_SEQS
    from barbell_tpu.models.barcodes import BarcodeGroup
    from barbell_tpu.models.demux import Demuxer
    from barbell_tpu.models.pipeline import JaxDemuxEngine
    from barbell_tpu.ops.edit_model import get_edit_cut_off
    from barbell_tpu.sim.simulate import mutate_sequence

    rng = random.Random(5)
    groups = BarcodeGroup.from_kit("SQK-NBD114-96")
    for g in groups:
        g.set_flank_threshold(get_edit_cut_off(g.get_effective_len()))
    engine = JaxDemuxEngine(groups)
    d = Demuxer(alpha=0.4)
    for g in groups:
        d.add_query_group(g)

    ids, seqs = [], []
    for i in range(8):
        bc = rng.randrange(96)
        construct = (NB_1ST_FRONT + NB_SEQS[bc] + NB_1ST_REAR).encode()
        body = bytes(rng.choice(b"ACGT") for _ in range(rng.randrange(250, 700)))
        seq = construct + body + dna.reverse_complement_bytes(construct)
        seq = mutate_sequence(rng, seq, 0, 4)
        ids.append(f"nb{i}")
        seqs.append(seq)

    got = engine.demux_batch(ids, seqs)
    n_tags = 0
    for rid, seq, rows in zip(ids, seqs, got):
        want = d.demux(rid, seq)
        assert rows == want, rid
        n_tags += sum(1 for r in rows if r.match_type == BarcodeType.Ftag)
    assert n_tags >= 8  # constructs at both ends should be found


def test_engine_matches_oracle_use_extended(tmp_path):
    """--use-extended adds the fusion/artefact template as a second
    group; the fused device path must stay row-identical to the oracle
    with multiple groups per batch (mid-read fusion constructs)."""
    import pytest as _pytest

    _pytest.importorskip("jax")
    import random

    from barbell_tpu.models.barcodes import BarcodeGroup
    from barbell_tpu.models.demux import Demuxer
    from barbell_tpu.models.pipeline import JaxDemuxEngine
    from barbell_tpu.ops.edit_model import get_edit_cut_off
    from barbell_tpu.sim.simulate import mutate_sequence

    rng = random.Random(8)
    groups = BarcodeGroup.from_kit("SQK-RBK114-96", use_extended=True)
    assert len(groups) >= 2  # default + fusion template
    for g in groups:
        g.set_flank_threshold(get_edit_cut_off(g.get_effective_len()))
    engine = JaxDemuxEngine(groups)
    d = Demuxer(alpha=0.4)
    for g in groups:
        d.add_query_group(g)

    ids, seqs = [], []
    for i in range(6):
        bc = rng.randrange(96)
        front = (db.RBK4_KIT14_FRONT + db.BC_SEQS[bc] + db.RBK4_KIT14_REAR).encode()
        fusion = (db.RBK4_FRONT_FUSION + db.BC_SEQS[(bc + 7) % 96] + db.RBK4_REAR).encode()
        body1 = bytes(rng.choice(b"ACGT") for _ in range(rng.randrange(200, 500)))
        body2 = bytes(rng.choice(b"ACGT") for _ in range(rng.randrange(200, 500)))
        seq = mutate_sequence(rng, front + body1 + fusion + body2, 0, 4)
        ids.append(f"x{i}")
        seqs.append(seq)

    got = engine.demux_batch(ids, seqs)
    for rid, seq, rows in zip(ids, seqs, got):
        assert rows == d.demux(rid, seq), rid

    # On a single device, multi-group + mono upload must take the
    # one-call-per-batch fused dispatch (demux_call_fused) and stay
    # row-identical to both the per-group dispatch and the mesh run.
    import jax

    e1 = JaxDemuxEngine(groups, devices=jax.devices()[:1])
    got_fused = e1.demux_batch(ids, seqs)
    assert e1.last_dispatch == "single-fused"
    assert got_fused == got
    e1.mono_upload = False
    got_sep = e1.demux_batch(ids, seqs)
    assert e1.last_dispatch == "single"
    assert got_sep == got
