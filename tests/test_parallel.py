"""Throughput-mode tests: batched VIO step sharded over the 8-device
virtual CPU mesh; vmapped tracker over distinct sequences."""

import numpy as np
import jax
import jax.numpy as jnp

from vins_rgbd_fast_tpu.parallel import throughput as tp
from vins_rgbd_fast_tpu.backend import estimator as est


def _example(cfg, batch, seed=0):
    import __graft_entry__ as g

    return g._example_inputs(cfg, dtype=jnp.float64, batch=batch, seed=seed)


def _cfg():
    import __graft_entry__ as g

    return g._example_cfg(maxf=16, maxi=8)


def test_batched_step_runs_on_mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = tp.make_mesh(8)
    cfg = _cfg()
    states, feats, imus, keys = _example(cfg, batch=8)
    # make each sequence distinct (axon-style caching + vmap correctness)
    feats = feats._replace(
        pts=feats.pts + jnp.arange(8)[:, None, None] * 1e-3
    )
    states = tp.batch_shard(mesh, states)
    feats = tp.batch_shard(mesh, feats)
    imus = tp.batch_shard(mesh, imus)
    keys = tp.batch_shard(mesh, keys)
    step = tp.make_batched_step(cfg, mesh)
    new_states, outs = step(states, feats, imus, keys)
    assert outs.P.shape == (8, 3)
    assert bool(jnp.isfinite(outs.cost).all())
    # outputs are sharded across the mesh
    assert len(outs.P.sharding.device_set) == 8


def test_batched_step_matches_single():
    cfg = _cfg()
    states, feats, imus, keys = _example(cfg, batch=4)
    feats = feats._replace(pts=feats.pts + jnp.arange(4)[:, None, None] * 2e-3)
    batched = jax.vmap(lambda s, f, i, k: est.vio_step(cfg, s, f, i, k))(
        states, feats, imus, keys
    )
    single_states, single_feats, single_imu, single_key = _example(cfg, batch=None)
    f2 = single_feats._replace(pts=single_feats.pts + 2 * 2e-3)
    _, out2 = est.vio_step(cfg, single_states, f2, single_imu, single_key)
    np.testing.assert_allclose(
        np.asarray(batched[1].P[2]), np.asarray(out2.P), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(batched[1].cost[2]), np.asarray(out2.cost), atol=1e-10
    )
