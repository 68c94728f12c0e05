"""scan_layers mode: numerics must match the unrolled backbone exactly.

The two heterogeneous layers (first: no value-residual mix; last: no
audio->text cross-condition) stay unrolled; the homogeneous middle halves run
under nnx.scan over nnx.vmap-stacked params (models/transformer.py:_run_scan).
Parity is checked by copying the unrolled model's params into the stacked
layout leaf-for-leaf.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from e2_tts_tpu.models.transformer import Transformer

CFG = dict(dim=64, depth=4, heads=2, dim_head=16, num_registers=4,
           max_seq_len=128, kernel_size=7, dropout=0.0)


def _layer_state(m, i):
    return {'speech': nnx.state(m.speech_layers[i], nnx.Param),
            'text': nnx.state(m.text_layers[i], nnx.Param),
            'speech_hcs': nnx.state(m.speech_hcs[i], nnx.Param),
            'text_hcs': nnx.state(m.text_hcs[i], nnx.Param)}


def _set_single(dst, st):
    nnx.update(dst.speech, st['speech'])
    nnx.update(dst.text, st['text'])
    nnx.update(dst.speech_hcs, st['speech_hcs'])
    nnx.update(dst.text_hcs, st['text_hcs'])


def copy_unrolled_into_scan(um, sm, depth):
    _set_single(sm.layer_first, _layer_state(um, 0))
    _set_single(sm.layer_last, _layer_state(um, depth - 1))
    for group, inds in ((sm.mid_first, range(1, depth // 2)),
                       (sm.mid_second, range(depth // 2, depth - 1))):
        states = [_layer_state(um, i) for i in inds]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        _set_single(group, stacked)
    nnx.update(sm.final_norm, nnx.state(um.final_norm, nnx.Param))
    for attr in ('abs_pos_emb', 'time_fourier', 'time_mlp'):
        nnx.update(getattr(sm, attr), nnx.state(getattr(um, attr), nnx.Param))
    for attr in ('registers', 'text_registers'):
        getattr(sm, attr)[...] = getattr(um, attr)[...]


@pytest.fixture(scope='module')
def pair():
    um = Transformer(**CFG, rngs=nnx.Rngs(0))
    sm = Transformer(**CFG, scan_layers=True, rngs=nnx.Rngs(1))
    um.eval(), sm.eval()
    copy_unrolled_into_scan(um, sm, CFG['depth'])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 64)), dtype=jnp.float32)
    te = jnp.asarray(rng.normal(size=(2, 32, 32)), dtype=jnp.float32)
    times = jnp.asarray([0.3, 0.7])
    mask = jnp.ones((2, 32), dtype=bool).at[1, 20:].set(False)
    return um, sm, x, te, times, mask


def test_scan_matches_unrolled_forward(pair):
    um, sm, x, te, times, mask = pair
    out_u = um(x, times=times, mask=mask, text_embed=te)
    out_s = sm(x, times=times, mask=mask, text_embed=te)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s),
                               atol=3e-6, rtol=1e-5)


def test_scan_matches_unrolled_grads(pair):
    um, sm, x, te, times, mask = pair
    rng = np.random.default_rng(1)
    # weighted sum: plain sum-of-squares is constant after the final RMSNorm
    w = jnp.asarray(rng.normal(size=(2, 32, 64)), dtype=jnp.float32)

    def loss(m, x):
        return (m(x, times=times, mask=mask, text_embed=te) * w).sum()

    gu = nnx.grad(loss, argnums=1)(um, x)
    gs = nnx.grad(loss, argnums=1)(sm, x)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gs),
                               atol=2e-4, rtol=2e-4)


def test_scan_param_grads_match(pair):
    """Stacked param grads equal the per-layer grads of the unrolled model."""
    um, sm, x, te, times, mask = pair
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(2, 32, 64)), dtype=jnp.float32)

    def loss(m):
        return (m(x, times=times, mask=mask, text_embed=te) * w).sum()

    gu = nnx.grad(loss)(um)
    gs = nnx.grad(loss)(sm)

    # compare one deep leaf: attention out-proj kernels of middle layers
    d = CFG['depth']
    un = [gu['speech_layers'][i]['attn']['to_out']['kernel'][...]
          for i in range(1, d // 2)]
    st = gs['mid_first']['speech']['attn']['to_out']['kernel'][...]
    np.testing.assert_allclose(np.asarray(jnp.stack(un)), np.asarray(st),
                               atol=2e-4, rtol=2e-4)


def test_scan_dropout_training_step():
    """Dropout-active scan model: per-layer keys split, draws advance."""
    sm = Transformer(**{**CFG, 'dropout': 0.1}, scan_layers=True,
                     rngs=nnx.Rngs(2))
    sm.train()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 64)), dtype=jnp.float32)
    te = jnp.asarray(rng.normal(size=(2, 32, 32)), dtype=jnp.float32)
    times = jnp.asarray([0.3, 0.7])
    w = jnp.asarray(rng.normal(size=(2, 32, 64)), dtype=jnp.float32)

    @nnx.jit
    def step(m, x):
        return nnx.value_and_grad(
            lambda m: (m(x, times=times, text_embed=te) * w).sum())(m)

    l1, g1 = step(sm, x)
    l2, _ = step(sm, x)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2), 'dropout keys must advance between steps'
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g1))


def test_scan_requires_homogeneous_text_depth():
    with pytest.raises(AssertionError):
        Transformer(**{**CFG, 'text_depth': 2}, scan_layers=True,
                    rngs=nnx.Rngs(0))


def test_scan_through_e2tts():
    """scan_layers threads through the E2TTS constructor dict."""
    from e2_tts_tpu.models.e2tts import E2TTS
    model = E2TTS(transformer=dict(dim=64, depth=4, heads=2, dim_head=16,
                                   num_registers=4, max_seq_len=256,
                                   kernel_size=7, dropout=0.0,
                                   scan_layers=True),
                  num_channels=20, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, 48, 20)), dtype=jnp.float32)
    out = model(mel, text=['ab c', 'defg'], key=jax.random.key(0))
    assert np.isfinite(float(out.loss))
