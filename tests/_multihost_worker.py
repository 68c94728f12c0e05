"""Worker for tests/test_multihost.py: one of two `jax.distributed`
processes, each contributing 4 virtual CPU devices to a global 8-device
mesh (the jax-native analog of the reference's torch.distributed/Accelerate
multi-node launch, SURVEY.md §2d / trainer.py:155-162).

Run: python tests/_multihost_worker.py <port> <process_id>
Prints sentinel lines the parent asserts on; exits non-zero on failure.
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + ' --xla_force_host_platform_device_count=4').strip()

import jax
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from e2_tts_tpu.parallel.multihost import (
    maybe_initialize_distributed, is_main_process)
from e2_tts_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from e2_tts_tpu.training.adopt import adopt

# -- 1. distributed init (must precede any device access) --------------------
assert maybe_initialize_distributed(f'localhost:{port}', 2, pid)
assert maybe_initialize_distributed()   # idempotent second call
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4
assert is_main_process() == (pid == 0)
print(f'MULTIHOST INIT OK pid={pid}', flush=True)

# -- 2. one train step (grad + clip + ADOPT) over the GLOBAL mesh ------------
# batch sharded over all 8 devices (4 per process), params replicated; the
# gradient all-reduce XLA inserts crosses the process boundary.
mesh = make_mesh()
assert mesh.devices.shape == (8,)

rng = np.random.default_rng(0)          # identical on both processes
X = rng.normal(size=(16, 32)).astype(np.float32)
Y = rng.normal(size=(16, 1)).astype(np.float32)
W = rng.normal(size=(32, 1)).astype(np.float32) * 0.1

sh, rep = batch_sharding(mesh), replicated(mesh)
local_rows = slice(pid * 8, (pid + 1) * 8)
Xg = jax.make_array_from_process_local_data(sh, X[local_rows])
Yg = jax.make_array_from_process_local_data(sh, Y[local_rows])
Wg = jax.make_array_from_process_local_data(rep, W)

tx = optax.chain(optax.clip_by_global_norm(1.0), adopt(1e-3))
opt_state = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x))
    if np.ndim(x) else x,
    tx.init(jnp.asarray(W)))

loss_fn = lambda w, x, y: jnp.mean((x @ w - y) ** 2)


@jax.jit
def train_step(w, opt_state, x, y):
    loss, g = jax.value_and_grad(loss_fn)(w, x, y)
    updates, opt_state = tx.update(g, opt_state, w)
    return optax.apply_updates(w, updates), opt_state, loss


w_new, _, loss = train_step(Wg, opt_state, Xg, Yg)

# single-process oracle on the full batch (pure local compute)
w_ref, _, loss_ref = jax.jit(train_step)(
    jnp.asarray(W), tx.init(jnp.asarray(W)), jnp.asarray(X), jnp.asarray(Y))

np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)
np.testing.assert_allclose(np.asarray(jax.device_get(w_new)),
                           np.asarray(w_ref), atol=1e-6, rtol=1e-6)
print(f'MULTIHOST STEP OK pid={pid} loss={float(loss):.6f}', flush=True)

# -- 3. a cross-process collective through the public sharding path ----------
ones = jax.make_array_from_process_local_data(
    sh, np.full((8,), 1.0 + pid, np.float32))   # global: 8x1.0 + 8x2.0
total = jax.jit(jnp.sum, out_shardings=rep)(ones)
np.testing.assert_allclose(float(total), 8 * 1.0 + 8 * 2.0)
print(f'MULTIHOST PSUM OK pid={pid}', flush=True)
