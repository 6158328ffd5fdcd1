"""Filter/inspect stage tests and the end-to-end kit pipeline test."""

import os

import pytest

from barbell_tpu.models.records import (
    BarbellMatch,
    BarcodeType,
    Strand,
    read_annotations,
)
from barbell_tpu.stages.filter import check_filter_pass, filter_annotations
from barbell_tpu.stages.inspect import bucket_position, get_group_structure, inspect
from barbell_tpu.stages.kit import KitRunConfig, demux_using_kit
from barbell_tpu.stages.pattern import pattern_from_str
from barbell_tpu.sim.simulate import create_testdata, default_barcodes


def mk(read_id="r1", start=0, end=100, match_type=BarcodeType.Ftag, label="BC01",
       strand=Strand.Fwd, read_len=500, rel=1):
    return BarbellMatch(
        read_id=read_id,
        read_len=read_len,
        rel_dist_to_end=rel,
        read_start_bar=start,
        read_end_bar=end,
        read_start_flank=start,
        read_end_flank=end,
        bar_start=0,
        bar_end=24,
        match_type=match_type,
        flank_cost=0,
        barcode_cost=0,
        label=label,
        strand=strand,
        cuts=None,
    )


def test_check_filter_pass_longest_pattern_wins():
    patterns = [
        pattern_from_str("Ftag[fw, *, @left(0..250), >>]"),
        pattern_from_str("Ftag[fw, *, @left(0..250)]__Ftag[fw, *, @prev_left(0..400), >>2]"),
    ]
    group = [mk(start=0, end=90), mk(start=100, end=190)]
    assert check_filter_pass(group, patterns)
    # the longer pattern's cut (group 2) must have been applied, on row 1
    assert group[1].cuts is not None
    assert group[1].cuts[0][0].group_id == 2


def test_check_filter_pass_requires_full_coverage():
    patterns = [pattern_from_str("Ftag[fw, *, @left(0..250), >>]")]
    # two annotations but the longest matching pattern has length 1 -> fail
    group = [mk(start=0, end=90), mk(start=100, end=190)]
    assert not check_filter_pass(group, patterns)


def test_filter_file_roundtrip(tmp_path):
    ann = tmp_path / "ann.tsv"
    rows = [
        mk(read_id="keep", start=0, end=90),
        mk(read_id="drop1", start=300, end=390, rel=300),
        mk(read_id="drop2", start=0, end=90),
        mk(read_id="drop2", start=100, end=190),
    ]
    with open(ann, "w") as fh:
        from barbell_tpu.models.records import AnnotationWriter

        w = AnnotationWriter(fh)
        w.write_rows(rows)
    out = tmp_path / "filtered.tsv"
    dropped = tmp_path / "dropped.tsv"
    filter_annotations(
        str(ann),
        str(out),
        [pattern_from_str("Ftag[fw, *, @left(0..250), >>]")],
        str(dropped),
    )
    kept = list(read_annotations(str(out)))
    assert [r.read_id for r in kept] == ["keep"]
    assert kept[0].cuts is not None  # cut was assigned
    dropped_rows = list(read_annotations(str(dropped)))
    assert {r.read_id for r in dropped_rows} == {"drop1", "drop2"}


def test_bucket_position():
    assert bucket_position(0, 250) == 0
    assert bucket_position(1, 250) == 0
    assert bucket_position(250, 250) == 0
    assert bucket_position(251, 250) == 250
    assert bucket_position(500, 250) == 250
    assert bucket_position(501, 250) == 500


def test_group_structure_left_then_prev():
    group = [
        mk(start=5, end=95, rel=5),
        mk(start=120, end=210, rel=120),
    ]
    s = get_group_structure(group, 250)
    assert s == "Ftag[fw, *, @left(0..250)]__Ftag[fw, *, @prev_left(0..250)]"


def test_group_structure_right_end():
    group = [mk(start=420, end=495, read_len=500, rel=-5)]
    s = get_group_structure(group, 250)
    assert s.startswith("Ftag[fw, *, @right(")


def test_inspect_counts(tmp_path):
    ann = tmp_path / "ann.tsv"
    rows = [
        mk(read_id="a", start=0, end=90),
        mk(read_id="b", start=3, end=93),
        mk(read_id="c", start=400, end=490, rel=-10),
    ]
    from barbell_tpu.models.records import AnnotationWriter

    with open(ann, "w") as fh:
        w = AnnotationWriter(fh)
        w.write_rows(rows)
    out = tmp_path / "per_read.tsv"
    counts = inspect(str(ann), top_n=5, read_pattern_out=str(out))
    assert sum(counts.values()) == 3
    assert len(counts) == 2
    assert len(open(out).readlines()) == 3


@pytest.mark.slow
def test_kit_pipeline_end_to_end(tmp_path):
    """Full annotate->inspect->filter->trim run on simulated rapid reads."""
    sim_dir = tmp_path / "sim"
    barcodes = default_barcodes(8)
    # rc_frac=0: the single-label kit presets (like the reference's) only
    # accept fw@left constructs — rapid-kit reads always start with the
    # adapter in forward orientation.
    create_testdata(
        6, str(sim_dir), barcodes=barcodes, rc_frac=0.0, seed=3, groups=("GroupII",)
    )
    out_dir = tmp_path / "out"
    config = KitRunConfig(
        kit_name="SQK-RBK110-96",
        output_folder=str(out_dir),
        backend="oracle",
        batch_size=16,
    )
    demux_using_kit([str(sim_dir / "GroupII.fastq")], config)

    assert (out_dir / "annotation.tsv").exists()
    assert (out_dir / "pattern_per_read.tsv").exists()
    assert (out_dir / "filtered.tsv").exists()

    truth = dict(
        line.strip().split("\t")
        for line in open(sim_dir / "GroupII_truth.txt")
    )
    # Check per-label FASTQ outputs contain the right reads.
    assigned = {}
    for fname in os.listdir(out_dir):
        if fname.endswith(".trimmed.fastq"):
            label = fname[: -len(".trimmed.fastq")]
            with open(out_dir / fname) as fh:
                lines = fh.read().splitlines()
            for i in range(0, len(lines), 4):
                read_id = lines[i][1:].split()[0]
                # strip _N split suffixes
                assigned[read_id] = label

    correct = sum(
        1 for read_id, label in assigned.items() if truth.get(read_id) == label
    )
    # Clean GroupII reads must be overwhelmingly recovered and correct.
    assert len(assigned) >= 5
    assert correct == len(assigned)


@pytest.mark.slow
def test_kit_streaming_matches_staged(tmp_path):
    """The fused one-pass kit runner must produce byte-identical stage
    files (annotation.tsv, pattern_per_read.tsv, filtered.tsv, per-label
    FASTQs, failed list) to the four-pass staged runner."""
    sim_dir = tmp_path / "sim"
    barcodes = default_barcodes(6)
    create_testdata(
        8,
        str(sim_dir),
        barcodes=barcodes,
        rc_frac=0.5,
        seed=11,
        groups=("GroupII", "GroupIII", "GroupVI"),
    )
    fastq = tmp_path / "mixed.fastq"
    with open(fastq, "w") as out:
        for g in ("GroupII", "GroupIII", "GroupVI"):
            out.write(open(sim_dir / f"{g}.fastq").read())
        # adjacent duplicate read ids: the one duplicate layout whose
        # staged/streamed behavior must still agree (a NON-adjacent
        # recurring id is the documented divergence — the staged trim's
        # whole-file HashMap merges those, the streamed run keeps them
        # per consecutive run)
        lines = open(sim_dir / "GroupII.fastq").read().splitlines()
        rec = "@dup_read\n" + "\n".join(lines[1:4]) + "\n"
        out.write(rec)
        out.write(rec)
        # same-id reads separated by a ZERO-MATCH read still form ONE
        # staged group (the junk read adds no annotation rows, so the
        # rows stay adjacent in annotation.tsv) — the streamed runner
        # must not let the row-less read split the run
        rec2 = "@dup2\n" + "\n".join(lines[1:4]) + "\n"
        junk = "@junk_read\n" + "T" * 400 + "\n+\n" + "I" * 400 + "\n"
        out.write(rec2)
        out.write(junk)
        out.write(rec2)

    outputs = {}
    for mode, stream in (("staged", False), ("streamed", True)):
        out_dir = tmp_path / mode
        config = KitRunConfig(
            kit_name="SQK-RBK110-96",
            output_folder=str(out_dir),
            backend="oracle",
            batch_size=8,
            maximize=True,
            failed_out=str(out_dir / "failed.txt"),
            stream=stream,
        )
        demux_using_kit([str(fastq)], config)
        files = {
            f: (out_dir / f).read_bytes()
            for f in sorted(os.listdir(out_dir))
            if f != "failed.txt"
        }
        files["failed.txt"] = (
            (out_dir / "failed.txt").read_bytes()
            if (out_dir / "failed.txt").exists()
            else b""
        )
        outputs[mode] = files

    assert sorted(outputs["staged"]) == sorted(outputs["streamed"])
    for name, blob in outputs["staged"].items():
        assert outputs["streamed"][name] == blob, f"{name} differs"
    assert any(n.endswith(".trimmed.fastq") for n in outputs["staged"])


@pytest.mark.slow
def test_kit_streaming_matches_staged_jax_mesh(tmp_path):
    """Streaming kit runner on the jax backend: the engine auto-shards
    over the conftest's 8-device CPU mesh, and the fused runner's files
    must still match the staged runner byte for byte."""
    sim_dir = tmp_path / "sim"
    create_testdata(
        6, str(sim_dir), barcodes=default_barcodes(4), rc_frac=0.0, seed=7,
        groups=("GroupII",),
    )
    blobs = {}
    for mode, stream in (("staged", False), ("streamed", True)):
        out_dir = tmp_path / mode
        demux_using_kit(
            [str(sim_dir / "GroupII.fastq")],
            KitRunConfig(
                kit_name="SQK-RBK110-96",
                output_folder=str(out_dir),
                backend="jax",
                batch_size=6,
                stream=stream,
            ),
        )
        blobs[mode] = {
            f: (out_dir / f).read_bytes() for f in sorted(os.listdir(out_dir))
        }
    assert blobs["staged"] == blobs["streamed"]
    assert any(n.endswith(".trimmed.fastq") for n in blobs["staged"])


@pytest.mark.slow
def test_kit_streaming_matches_staged_gzip(tmp_path):
    """Gzip trim outputs stay byte-identical across the two runners."""
    import gzip as _gzip

    sim_dir = tmp_path / "sim"
    create_testdata(
        6, str(sim_dir), barcodes=default_barcodes(4), rc_frac=0.0, seed=5,
        groups=("GroupII",),
    )
    blobs = {}
    for mode, stream in (("staged", False), ("streamed", True)):
        out_dir = tmp_path / mode
        config = KitRunConfig(
            kit_name="SQK-RBK110-96",
            output_folder=str(out_dir),
            backend="oracle",
            batch_size=4,
            gzip=True,
            threads=3,
            stream=stream,
        )
        demux_using_kit([str(sim_dir / "GroupII.fastq")], config)
        blobs[mode] = {
            f: _gzip.decompress((out_dir / f).read_bytes())
            for f in sorted(os.listdir(out_dir))
            if f.endswith(".trimmed.fastq.gz")
        }
    assert blobs["staged"] == blobs["streamed"]
    assert blobs["staged"]


@pytest.mark.slow
def test_kit_streaming_fuzz_matches_staged(tmp_path):
    """Randomized streamed-vs-staged identity: shuffled construct /
    zero-match / duplicate-id reads over multi-file inputs.  The
    inspect/filter files must match on EVERY input; trimmed FASTQs must
    match whenever ids recur only within their own run (adjacent here)."""
    import random

    from barbell_tpu.sim.simulate import mutate_sequence, rapid_adapter

    bars = default_barcodes(8)
    rng = random.Random(99)

    def construct(label_idx, body_len):
        body = bytes(rng.choice(b"ACGT") for _ in range(body_len))
        read = rapid_adapter(bars[label_idx][1]) + body
        return mutate_sequence(rng, read, 0, 3)

    for trial in range(3):
        # record GROUPS (duplicate pairs stay together — splitting a
        # pair across files would make the ids non-adjacent in the read
        # stream, the documented staged/streamed trim divergence)
        rec_groups = []
        for i in range(14):
            kind = rng.random()
            rid = f"t{trial}_r{i}"
            if kind < 0.55:
                rec_groups.append([(rid, construct(rng.randrange(8), 300))])
            elif kind < 0.8:
                rec_groups.append(
                    [(rid, bytes(rng.choice(b"ACGT") for _ in range(400)))]
                )
            else:  # adjacent duplicate pair, construct + zero-match mix
                rec_groups.append([
                    (rid, construct(rng.randrange(8), 250)),
                    (rid, bytes(rng.choice(b"ACGT") for _ in range(200))),
                ])
        files = []
        for fi in range(2):
            p = tmp_path / f"in_{trial}_{fi}.fastq"
            with open(p, "w") as fh:
                for grp in rec_groups[fi::2]:
                    for rid, seq in grp:
                        s = seq.decode()
                        fh.write(f"@{rid} d{fi}\n{s}\n+\n{'I' * len(s)}\n")
            files.append(str(p))

        blobs = {}
        for mode, stream in (("staged", False), ("streamed", True)):
            out_dir = tmp_path / f"{mode}_{trial}"
            demux_using_kit(
                files,
                KitRunConfig(
                    kit_name="SQK-RBK110-96",
                    output_folder=str(out_dir),
                    backend="oracle",
                    batch_size=5,
                    maximize=True,
                    stream=stream,
                ),
            )
            blobs[mode] = {
                f: (out_dir / f).read_bytes()
                for f in sorted(os.listdir(out_dir))
            }
        assert blobs["staged"].keys() == blobs["streamed"].keys(), trial
        for name, blob in blobs["staged"].items():
            assert blobs["streamed"][name] == blob, (trial, name)


def test_kit_streaming_empty_input(tmp_path):
    """Zero-read input: both runners produce the same (empty) files."""
    empty = tmp_path / "empty.fastq"
    empty.write_text("")
    blobs = {}
    for mode, stream in (("staged", False), ("streamed", True)):
        out_dir = tmp_path / mode
        demux_using_kit(
            [str(empty)],
            KitRunConfig(
                kit_name="SQK-RBK110-96",
                output_folder=str(out_dir),
                backend="oracle",
                stream=stream,
            ),
        )
        blobs[mode] = {
            f: (out_dir / f).read_bytes() for f in sorted(os.listdir(out_dir))
        }
    assert blobs["staged"] == blobs["streamed"]
    assert blobs["streamed"]["annotation.tsv"] == b""


def test_independent_check_kit_aware():
    """compare --verify must search with the kit under test's flanks:
    an NBD assignment verifies with the NBD context and would falsely
    fail with the default rapid-kit flanks."""
    import random

    from barbell_tpu.kits.database import expand_template, get_kit_info
    from barbell_tpu.sim.compare import independent_check, verify_context

    labels, seqs = expand_template(get_kit_info("SQK-NBD114-96").templates[0])
    rng = random.Random(0)
    body = "".join(rng.choice("ACGT") for _ in range(300))
    read = (seqs[4] + body).encode()

    assert independent_check(read, labels[4], verify_context("SQK-NBD114-96"))
    assert not independent_check(read, labels[4], None)  # rapid flanks


def test_inspect_colorize_pattern():
    from barbell_tpu.stages.inspect import colorize_pattern

    s = "Ftag[fw, BC01]__Rflank[rc]"
    colored = colorize_pattern(s, force=True)
    assert "\x1b[38;2;231;84;128mFtag\x1b[0m" in colored
    assert "\x1b[38;2;173;216;230mRflank\x1b[0m" in colored
    # non-tty output stays clean
    assert colorize_pattern(s) == s


def test_compare_time_mode(tmp_path):
    """--time adds wall clock + reads/s columns to the compare report."""
    from barbell_tpu.sim.compare import print_reports, run_compare
    from barbell_tpu.sim.simulate import create_testdata, default_barcodes

    create_testdata(
        4, str(tmp_path / "sim"), barcodes=default_barcodes(4), rc_frac=0.0,
        seed=3, groups=("GroupII",),
    )
    reports = run_compare(
        str(tmp_path / "sim"), str(tmp_path / "work"), kit="SQK-RBK110-96",
        groups=["GroupII"], backend="oracle", time_runs=True,
    )
    assert reports[0].wall_s is not None and reports[0].wall_s > 0
    assert reports[0].reads_per_sec > 0
    print_reports(reports)


def test_compare_multislice_counts_read_once(tmp_path):
    """Multi-slice outputs (``_N`` read-id suffixes) collapse onto the
    base read: assigned can never exceed total_reads."""
    from barbell_tpu.sim.compare import evaluate_group

    fastq = tmp_path / "g.fastq"
    fastq.write_text("@r1\nACGTACGT\n+\n!!!!!!!!\n")
    truth = tmp_path / "g_truth.txt"
    truth.write_text("r1\tbarcode01\n")
    out = tmp_path / "out"
    out.mkdir()
    with open(out / "barcode01.trimmed.fastq", "w") as fh:
        fh.write("@r1\nACGT\n+\n!!!!\n@r1_1\nACGT\n+\n!!!!\n")

    report = evaluate_group("g", str(fastq), str(truth), str(out))
    assert report.total_reads == 1
    assert report.assigned == 1
    assert report.correct == 1
    assert report.assign_rate <= 1.0


def test_compare_verify_reported_and_label_safe(tmp_path, capsys):
    """--verify results appear in the printed report, and labels with no
    numeric part (flank-only outputs) don't crash the checker."""
    from barbell_tpu.sim.compare import (
        GroupReport,
        evaluate_group,
        independent_check,
        print_reports,
    )

    # digitless label: must return False, not raise
    assert independent_check(b"ACGT" * 30, "none") is False

    fastq = tmp_path / "g.fastq"
    fastq.write_text("@r1\nACGTACGT\n+\n!!!!!!!!\n")
    truth = tmp_path / "g_truth.txt"
    truth.write_text("r1\tnone\n")
    out = tmp_path / "out"
    out.mkdir()
    with open(out / "none.trimmed.fastq", "w") as fh:
        fh.write("@r1\nACGT\n+\n!!!!\n")
    report = evaluate_group("g", str(fastq), str(truth), str(out), verify=True)
    assert report.checked == 1

    print_reports([report, GroupReport(group="empty")])
    shown = capsys.readouterr().out
    assert "verified" in shown
    assert "0/1" in shown


def test_sim_pair_groups_need_two_barcodes(tmp_path):
    import pytest

    from barbell_tpu.sim.simulate import create_testdata, default_barcodes

    with pytest.raises(ValueError, match=">= 2 barcodes"):
        create_testdata(
            2, str(tmp_path / "sim"), barcodes=default_barcodes(1), rc_frac=0.0,
            seed=1, groups=("GroupIV",),
        )


def test_pattern_malformed_param_warns(capsys):
    """Malformed params drop (reference parity) but warn on stderr."""
    from barbell_tpu.stages.pattern import pattern_from_str

    p = pattern_from_str("Ftag[fw, *, @left(0-250), >>x]")
    assert p.elements[0].relative_to is None
    assert p.elements[0].cuts is None
    err = capsys.readouterr().err
    assert "malformed position" in err
    assert "malformed cut" in err
