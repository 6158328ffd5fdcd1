"""Real-TPU smoke tests (SKIPPED on the CPU test mesh).

The CI suite forces the CPU backend, where the Pallas kernels run in
interpret mode with row-unroll factor 1; the real-TPU codegen path
(Mosaic, ru=8 unroll, non-interpret Myers) is exercised here instead.
Run manually on a chip with:

    JAX_PLATFORMS=axon python -m pytest tests/test_tpu_smoke.py -q --no-header -p no:cacheprovider

(These assertions were also run ad hoc on 2026-08-17: 24 reads of
9-25kb with chunked rows, mid-read constructs, IUPAC bytes and rc all
row-identical to the oracle on hardware.)
"""

import os
import random

import pytest

jax = pytest.importorskip("jax")

_on_accelerator = False
try:
    _on_accelerator = jax.devices()[0].platform not in ("cpu",)
except Exception:
    pass

pytestmark = pytest.mark.skipif(
    not _on_accelerator, reason="requires a real accelerator backend"
)


def test_pallas_engine_matches_oracle_on_hardware():
    from barbell_tpu.models.barcodes import BarcodeGroup
    from barbell_tpu.models.demux import Demuxer
    from barbell_tpu.models.pipeline import JaxDemuxEngine
    from barbell_tpu.ops.edit_model import get_edit_cut_off
    from barbell_tpu.sim.simulate import (
        default_barcodes,
        mutate_sequence,
        rapid_adapter,
        random_sequence,
    )
    from barbell_tpu.utils import dna

    rng = random.Random(7)
    groups = BarcodeGroup.from_kit("SQK-RBK114-96")
    for g in groups:
        g.set_flank_threshold(get_edit_cut_off(g.get_effective_len()))
    engine = JaxDemuxEngine(groups)
    d = Demuxer(alpha=0.4)
    for g in groups:
        d.add_query_group(g)

    bars = default_barcodes(96)
    ids, seqs = [], []
    for i in range(16):
        label, bseq = bars[rng.randrange(96)]
        n = 12000 if i in (3, 9) else rng.randrange(400, 3000)
        body = bytes(random_sequence(rng, n))
        seq = rapid_adapter(bseq) + body
        if i == 5:
            seq = seq[:30] + b"NNRY" + seq[34:]
        if i % 2:
            seq = dna.reverse_complement_bytes(seq)
        ids.append(f"t{i}")
        seqs.append(mutate_sequence(rng, seq, 0, 5))

    got = engine.demux_batch(ids, seqs)
    for rid, s, rows in zip(ids, seqs, got):
        assert rows == d.demux(rid, s), rid
