"""Columnar kit helpers == object path, on fuzzed synthetic tables.

The streamed kit runner's byte-identity to the staged runner is pinned
end-to-end by tests/test_stages.py; these tests pin each columnar
helper against the object implementation it replaces, on adversarial
synthetic row sets (no engine needed, so they cover shapes the
simulator rarely produces: flank-only rows, rc strands, mid-read
positions, multi-row reads, every preset pattern)."""

import random

import numpy as np

from barbell_tpu.models import hittable
from barbell_tpu.models.hittable import HitTable, MTYPE_CODE
from barbell_tpu.models.records import BarcodeType
from barbell_tpu.stages.filter import check_filter_pass
from barbell_tpu.stages.inspect import get_group_structure
from barbell_tpu.stages.kit_columnar import (
    CompiledPatterns,
    StructureLabeler,
    batch_trim_plan,
    cut_strings,
    kit_slice_label,
    matches_for_rows,
    segment_table,
    trim_slices,
)
from barbell_tpu.stages.pattern import pattern_from_str
from barbell_tpu.stages.trim import LabelConfig, process_read_and_anno
from barbell_tpu.kits.presets import DOUBLE_MAXIMIZE, SINGLE_MAXIMIZE

LABELS = [f"RBK{i:02d}" for i in range(1, 13)] + ["flank"]

PATTERNS = [
    pattern_from_str(s)
    for s in SINGLE_MAXIMIZE
    + DOUBLE_MAXIMIZE
    + [
        "Ftag[fw, RBK03, @left(0..250), >>]",
        "Ftag[fw, ~BK0, @left(0..250), >>1]__Ftag[<<1, rc, *, @right(0..300)]",
        "Fflank[*]__Ftag[rc, ?2, @prev_left(10..400)]__Ftag[fw, ?2]",
    ]
]


def _rand_table(rng: random.Random, n_reads: int) -> HitTable:
    """Random but structurally consistent batch table: rows grouped by
    read, ascending flank start within a read."""
    read_ids = [f"r{i}" for i in range(n_reads)]
    lens = np.array([rng.randrange(300, 5000) for _ in range(n_reads)])
    rows = {c: [] for c in hittable.COLUMNS}
    for r in range(n_reads):
        n_rows = rng.choice([0, 1, 1, 1, 2, 2, 3, 4])
        pos = 0
        for _ in range(n_rows):
            flank_len = rng.randrange(60, 120)
            rsf = min(pos + rng.randrange(0, 400), int(lens[r]) - 1)
            ref_ = min(rsf + flank_len, int(lens[r]))
            pos = ref_ + rng.randrange(0, 60)
            is_tag = rng.random() < 0.75
            mt = (
                MTYPE_CODE[BarcodeType.Ftag]
                if is_tag
                else MTYPE_CODE[BarcodeType.Fflank]
            )
            lab = rng.randrange(12) if is_tag else 12
            rsb = rsf + rng.randrange(0, 10)
            reb = max(rsb + 1, ref_ - rng.randrange(0, 10))
            rows["reads"].append(r)
            rows["rel"].append(
                int(hittable.rel_dist_vec(np.array([rsf]), lens[r : r + 1])[0])
            )
            rows["rsb"].append(rsb)
            rows["reb"].append(reb)
            rows["rsf"].append(rsf)
            rows["ref"].append(ref_)
            rows["bs"].append(rng.randrange(0, 30))
            rows["be"].append(rng.randrange(30, 60))
            rows["mtype"].append(mt)
            rows["fcost"].append(rng.randrange(0, 20))
            rows["bcost"].append(rng.randrange(0, 12))
            rows["label"].append(lab)
            rows["strand"].append(rng.randrange(2))
    cols = {c: np.array(v, dtype=np.int64) for c, v in rows.items()}
    return HitTable(read_ids=read_ids, read_lens=lens, cols=cols, labels=LABELS)


def test_structure_labels_match_object_path():
    rng = random.Random(1)
    labeler = StructureLabeler(250)
    for trial in range(6):
        table = _rand_table(rng, 40)
        seg_start, seg_len = segment_table(table)
        got = labeler.labels(table, seg_start, seg_len)
        for r in range(len(table.read_ids)):
            if seg_len[r] == 0:
                assert got[r] is None
                continue
            rows = matches_for_rows(table, int(seg_start[r]), int(seg_len[r]))
            assert got[r] == get_group_structure(rows, 250), (trial, r)


def test_pattern_match_and_cuts_match_object_path():
    rng = random.Random(2)
    cpats = CompiledPatterns(PATTERNS, LABELS)
    for trial in range(6):
        table = _rand_table(rng, 50)
        seg_start, seg_len = segment_table(table)
        win, passed = cpats.match(table, seg_start, seg_len)
        for r in range(len(table.read_ids)):
            if seg_len[r] == 0:
                assert win[r] == -1 and not passed[r]
                continue
            rows = matches_for_rows(table, int(seg_start[r]), int(seg_len[r]))
            want_pass = check_filter_pass(rows, PATTERNS)
            assert bool(passed[r]) == want_pass, (trial, r)
            # object path wrote the winner's cuts into the rows; the
            # columnar cuts must serialize identically
            if win[r] >= 0:
                cstrs = cut_strings(cpats.cuts[int(win[r])], int(seg_len[r]))
                for j, m in enumerate(rows):
                    want = (
                        ",".join(f"{cut}:{pos}" for cut, pos in m.cuts)
                        if m.cuts
                        else ""
                    )
                    assert cstrs[j] == want, (trial, r, j)
            else:
                assert all(not m.cuts for m in rows)


def test_trim_slices_and_labels_match_object_path():
    rng = random.Random(3)
    cpats = CompiledPatterns(PATTERNS, LABELS)
    label_config = LabelConfig(
        include_label=True,
        include_orientation=False,
        include_flank=False,
        sort_labels=False,
        only_side="left",
    )
    checked = 0
    for trial in range(8):
        table = _rand_table(rng, 50)
        seg_start, seg_len = segment_table(table)
        win, passed = cpats.match(table, seg_start, seg_len)
        c = table.cols
        for r in np.nonzero(passed)[0]:
            s, l = int(seg_start[r]), int(seg_len[r])
            rows = matches_for_rows(table, s, l)
            assert check_filter_pass(rows, PATTERNS)
            n = int(table.read_lens[r])
            seq = bytes(rng.choice(b"ACGT") for _ in range(n))
            qual = bytes(rng.randrange(33, 73) for _ in range(n))
            want = process_read_and_anno(
                seq, qual, rows, label_config, skip_trim=False, flip=False
            )
            cuts = cpats.cuts[int(win[r])]
            rsf = c["rsf"][s : s + l].tolist()
            ref_ = c["ref"][s : s + l].tolist()
            row_labels = [
                table.labels[k] for k in c["label"][s : s + l].tolist()
            ]
            got = []
            for slice_count, (st, en, rows_idx) in enumerate(
                trim_slices(cuts, rsf, ref_, n)
            ):
                if st >= en:
                    continue
                suffix = "" if slice_count == 0 else f"_{slice_count}"
                got.append(
                    (
                        seq[st:en],
                        qual[st:en],
                        kit_slice_label(rows_idx, row_labels),
                        suffix,
                    )
                )
            want_cmp = [(bytes(a), bytes(b), g, x) for a, b, g, x in want]
            assert got == want_cmp, (trial, int(r))
            checked += 1
    assert checked > 30  # the fuzz really produced passing reads


def test_batch_trim_plan_matches_general_path():
    """The vectorized preset-shape trim plan equals trim_slices +
    kit_slice_label for every read it claims (simple=True), and only
    skips reads whose winning pattern is outside the preset shape."""
    rng = random.Random(7)
    cpats = CompiledPatterns(PATTERNS, LABELS)
    planned = 0
    for trial in range(8):
        table = _rand_table(rng, 60)
        seg_start, seg_len = segment_table(table)
        win, passed = cpats.match(table, seg_start, seg_len)
        tplan = batch_trim_plan(cpats, table, seg_start, win, passed)
        c = table.cols
        for r in np.nonzero(passed)[0]:
            cuts = cpats.cuts[int(win[r])]
            shape_ok = 1 <= len(cuts) <= 2 and (
                len(cuts) == 1
                or cuts[0][1].group_id == cuts[1][1].group_id
            )
            simple = bool(tplan and tplan[0][r])
            assert simple == shape_ok, (trial, int(r))
            if not simple:
                continue
            planned += 1
            s, l = int(seg_start[r]), int(seg_len[r])
            rsf = c["rsf"][s : s + l].tolist()
            ref_ = c["ref"][s : s + l].tolist()
            row_labels = [
                table.labels[k] for k in c["label"][s : s + l].tolist()
            ]
            n = int(table.read_lens[r])
            st, en, lab = tplan[1][r], tplan[2][r], tplan[3][r]
            e = n if en < 0 else en
            want = [
                (ws, we, kit_slice_label(rows_idx, row_labels))
                for ws, we, rows_idx in trim_slices(cuts, rsf, ref_, n)
                if ws < we
            ]
            got = [(st, e, lab)] if st < e else []
            assert got == want, (trial, int(r), got, want)
    assert planned > 40
