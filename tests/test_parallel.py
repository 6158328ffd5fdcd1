"""Sharded execution tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.pos.shape[0] == args[1].shape[0]
    # every example read carries a construct -> at least one valley each
    assert bool(np.asarray(out.valid)[:, 0].all())


def test_sharded_step_matches_single_device():
    """Sharded flank step == unsharded kernels on the same inputs."""
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from barbell_tpu.models.barcodes import BarcodeGroup
    from barbell_tpu.ops import device as dev
    from barbell_tpu.ops.edit_model import get_edit_cut_off
    from barbell_tpu.ops.oracle import scale_alpha, scale_k
    from barbell_tpu.parallel.mesh import make_mesh, shard_rows, sharded_flank_step

    group = BarcodeGroup.from_kit("SQK-RBK114-24")[0]
    k = get_edit_cut_off(group.get_effective_len())
    B = 16
    rows, lens = _example_batch(B=B, L=256, seed=3)
    start = np.zeros(B, dtype=np.int32)
    lo = np.zeros(B, dtype=np.int32)

    pattern = jnp.asarray(group.flank_masks)
    k_scaled = np.int32(scale_k(k))
    alpha_scaled = np.int32(scale_alpha(0.4))

    ends = dev.flank_ends(pattern, jnp.asarray(rows), jnp.asarray(start),
                          jnp.asarray(lens), alpha_scaled)
    want = dev.find_hits(ends, jnp.asarray(lo), jnp.asarray(lens), k_scaled, 8)

    mesh = make_mesh()
    rows_s, start_s, lens_s, lo_s, hi_s = shard_rows(
        mesh, rows, start, lens, lo, lens.astype(np.int32)
    )
    step = sharded_flank_step(mesh, K=8)
    got, global_found = step(
        pattern, rows_s, start_s, lens_s, lo_s, hi_s, k_scaled, alpha_scaled
    )

    assert np.array_equal(np.asarray(got.pos), np.asarray(want.pos))
    assert np.array_equal(np.asarray(got.cost), np.asarray(want.cost))
    assert np.array_equal(np.asarray(got.valid), np.asarray(want.valid))
    assert int(global_found) == int(
        np.asarray(want.valid).any(axis=1).sum()
    )
