"""Isolate the scan-mode TPU abort: small configs, XLA vs Pallas attention."""
import sys
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
import numpy as np
from flax import nnx
from e2_tts_tpu.models.transformer import Transformer

which = sys.argv[1]
cfgs = {
  'small_xla':    dict(dim=128, depth=4, heads=4, dim_head=32, num_registers=4,
                       max_seq_len=512, kernel_size=15, dropout=0.1,
                       attn_backend='xla'),
  'small_pallas': dict(dim=128, depth=4, heads=4, dim_head=32, num_registers=4,
                       max_seq_len=512, kernel_size=15, dropout=0.1,
                       attn_backend='pallas'),
  'big_xla':      dict(dim=512, depth=8, heads=8, dim_head=64, num_registers=32,
                       max_seq_len=2048, kernel_size=31, dropout=0.1,
                       attn_backend='xla'),
  'big_pallas':   dict(dim=512, depth=8, heads=8, dim_head=64, num_registers=32,
                       max_seq_len=2048, kernel_size=31, dropout=0.1,
                       attn_backend='pallas'),
}
cfg = cfgs[which]
n = 256 if which.startswith('small') else 1024
b = 2 if which.startswith('small') else 16

m = Transformer(**cfg, scan_layers=True, rngs=nnx.Rngs(0),
                dtype=jnp.bfloat16 if which.startswith('big') else None)
m.train()
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(b, n, cfg['dim'])), dtype=jnp.float32)
te = jnp.asarray(rng.normal(size=(b, n, cfg['dim'] // 2)), dtype=jnp.float32)
times = jnp.linspace(0.1, 0.9, b)

@nnx.jit
def step(m, x):
    return nnx.value_and_grad(lambda m: (m(x, times=times, text_embed=te)
                                         .astype(jnp.float32) ** 2).sum())(m)

loss, grads = step(m, x)
jax.block_until_ready(loss)
print(which, 'OK loss', float(loss))
