"""Multi-device sharding tests on the virtual 8-device CPU mesh, plus the
driver entry points."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from e2_tts_tpu.parallel.mesh import (
    make_mesh, shard_batch, batch_sharding, replicated, replicate_module,
)


def test_make_mesh():
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)
    mesh4 = make_mesh(4)
    assert mesh4.devices.shape == (4,)


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = dict(x=jnp.zeros((16, 10)), y=jnp.zeros((16,)))
    sharded = shard_batch(batch, mesh)
    assert sharded['x'].sharding == batch_sharding(mesh)
    # each device holds 16/8 = 2 rows
    shard_shapes = {s.data.shape for s in sharded['x'].addressable_shards}
    assert shard_shapes == {(2, 10)}


def test_data_parallel_grads_match_single_device():
    """Replicated params + sharded batch must give identical grads to a
    single-device run (the all-reduce XLA inserts is exact up to fp assoc)."""
    mesh = make_mesh()

    w = jnp.asarray(np.random.default_rng(0).standard_normal((10, 1)).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 10)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(2).standard_normal((16, 1)).astype(np.float32))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, x, y)

    w_r = jax.device_put(w, replicated(mesh))
    x_s = jax.device_put(x, batch_sharding(mesh))
    y_s = jax.device_put(y, batch_sharding(mesh))
    g_multi = jax.jit(jax.grad(loss))(w_r, x_s, y_s)

    np.testing.assert_allclose(np.asarray(g_multi), np.asarray(g_single), atol=1e-5)


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_graft_entry_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
