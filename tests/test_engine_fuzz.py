"""Property-style fuzz: the batched engine must equal the scalar
oracle row-for-row across randomized query groups, read shapes and
engine parameters — odd barcode counts, short/long flanks, extreme
alpha and score thresholds, empty and tiny reads."""

import random

import pytest

jax = pytest.importorskip("jax")

from barbell_tpu.models.barcodes import BarcodeGroup  # noqa: E402
from barbell_tpu.models.demux import Demuxer  # noqa: E402
from barbell_tpu.models.pipeline import JaxDemuxEngine  # noqa: E402
from barbell_tpu.models.records import BarcodeType  # noqa: E402
from barbell_tpu.ops.edit_model import get_edit_cut_off  # noqa: E402
from barbell_tpu.utils import dna  # noqa: E402


def _rand_seq(rng, n):
    return bytes(rng.choice(b"ACGT") for _ in range(n))


def _make_group(rng, n_bars, bar_len, pre_len, suf_len, btype):
    pre = _rand_seq(rng, pre_len)
    suf = _rand_seq(rng, suf_len)
    seqs = [pre + _rand_seq(rng, bar_len) + suf for i in range(n_bars)]
    labels = [f"B{i:02d}" for i in range(n_bars)]
    return BarcodeGroup.from_seqs(seqs, labels, btype)


@pytest.mark.parametrize("trial", range(6))
def test_engine_fuzz_matches_oracle(trial):
    rng = random.Random(100 + trial)
    n_bars = rng.choice([2, 3, 7, 13])
    bar_len = rng.choice([12, 20, 31])
    pre_len = rng.choice([5, 9, 16])
    suf_len = rng.choice([8, 21, 40])
    btype = rng.choice([BarcodeType.Ftag, BarcodeType.Rtag])
    alpha = rng.choice([0.0, 0.2, 0.4, 0.9, 1.0])
    min_score = rng.choice([0.0, 0.2, 0.5])
    min_score_diff = rng.choice([0.0, 0.1, 0.3])

    group = _make_group(rng, n_bars, bar_len, pre_len, suf_len, btype)
    group.set_flank_threshold(
        max(1, get_edit_cut_off(group.get_effective_len()))
    )

    engine = JaxDemuxEngine(
        [group], alpha=alpha, min_score=min_score,
        min_score_diff=min_score_diff,
    )
    # fuzz the wire/shape paths too: mono vs per-array uploads and
    # pow2 vs 1/8-octave row buckets must all be row-identical
    engine.mono_upload = rng.random() < 0.5
    engine.fine_rows = rng.random() < 0.5
    d = Demuxer(alpha=alpha, min_score=min_score, min_score_diff=min_score_diff)
    d.add_query_group(group)

    ids, seqs = [], []
    for i in range(10):
        kind = rng.randrange(6)
        # the padded barcode slice is a true subsequence of its query —
        # a realistic "construct" for the scan to find
        q = group.barcodes[rng.randrange(n_bars)].seq
        body = _rand_seq(rng, rng.randrange(0, 400))
        if kind == 0:
            seq = b""  # empty read
        elif kind == 1:
            seq = _rand_seq(rng, rng.randrange(1, 30))  # tiny random
        elif kind == 2:
            seq = q + body  # construct-ish at start
        elif kind == 3:
            seq = dna.reverse_complement_bytes(q) + body
        elif kind == 4:
            seq = body[: len(body) // 2] + q + body[len(body) // 2 :]
        else:
            seq = q[rng.randrange(0, max(1, len(q) // 2)) :] + body  # truncated
        ids.append(f"t{trial}_{i}")
        seqs.append(seq)

    got = engine.demux_batch(ids, seqs)
    for rid, seq, rows in zip(ids, seqs, got):
        want = d.demux(rid, seq)
        assert rows == want, (trial, rid, rows, want)


@pytest.mark.parametrize("sharded", [False, True])
def test_hit_overflow_retry_is_sticky(sharded):
    """Reads with MANY constructs overflow the initial hit capacity
    (H_cap = padded row count): the first batch must retry once at a
    bigger static cap and stay row-identical to the oracle, and the
    bigger cap must STICK — the next batch dispatches at it directly
    (the NBD two-hits-per-read workload sat just over the old cap and
    paid a serialized retry round trip on EVERY batch)."""
    rng = random.Random(7)
    group = _make_group(rng, 3, 16, 8, 12, BarcodeType.Ftag)
    group.set_flank_threshold(
        max(1, get_edit_cut_off(group.get_effective_len()))
    )
    devices = jax.devices() if sharded else jax.devices()[:1]
    # sharded: hit capacity is PER SHARD, so each shard needs several
    # hit-dense reads to overflow its own cap
    n_reads = 4 * len(devices)
    engine = JaxDemuxEngine([group], devices=devices)
    d = Demuxer(alpha=0.4, min_score=0.2, min_score_diff=0.1)
    d.add_query_group(group)

    calls = []
    name = "_dispatch_group_sharded" if sharded else "_dispatch_group"
    orig = getattr(engine, name)

    def counting(gplan, dev_in, pack_mode, L, step, H_cap, extra=None):
        calls.append(H_cap)
        return orig(gplan, dev_in, pack_mode, L, step, H_cap, extra)

    setattr(engine, name, counting)

    def make_batch(seed):
        r = random.Random(seed)
        ids, seqs = [], []
        for i in range(n_reads):
            parts = []
            for _ in range(12):  # 12 constructs per read >> rows/read
                q = group.barcodes[r.randrange(3)].seq
                parts.append(q + _rand_seq(r, 30))
            ids.append(f"s{seed}_{i}")
            seqs.append(b"".join(parts))
        return ids, seqs

    ids1, seqs1 = make_batch(1)
    got1 = engine.demux_batch(ids1, seqs1)
    assert engine._h_cap_hint > 0, "overflow retry did not set the hint"
    assert len(calls) == 2 and calls[1] > calls[0], calls

    ids2, seqs2 = make_batch(2)
    got2 = engine.demux_batch(ids2, seqs2)
    assert len(calls) == 3 and calls[2] == engine._h_cap_hint, calls

    for rid, seq, rows in zip(ids1 + ids2, seqs1 + seqs2, got1 + got2):
        assert rows == d.demux(rid, seq), rid
