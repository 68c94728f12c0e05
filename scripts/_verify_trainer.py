"""Verify-drive trainer leg: E2Trainer.train on a toy ArrayDataset + resume."""
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import numpy as np
from flax import nnx
from e2_tts_tpu import E2TTS, E2Trainer
from e2_tts_tpu.training.data import ArrayDataset

CFG = dict(dim=128, depth=4, heads=4, dim_head=32, num_registers=4,
           max_seq_len=512, kernel_size=15, dropout=0.0)
rng = np.random.default_rng(0)
ds = ArrayDataset(
    [rng.normal(size=(100, 48 + 8 * i)).astype(np.float32) for i in range(8)],
    ['sample text %d' % i for i in range(8)])
model = E2TTS(transformer=dict(CFG), rngs=nnx.Rngs(0))
tr = E2Trainer(model, checkpoint_path='/tmp/verify_ckpt', log_file=None,
               tensorboard_log_dir='/tmp/verify_tb')
tr.train(ds, epochs=2, batch_size=4, save_step=2)
step, _key = tr.load_checkpoint()
print('resumed at step:', step)
assert step > 0
print('TRAINER DRIVE OK')
