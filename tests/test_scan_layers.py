"""scan_layers mode: numerics must match the unrolled backbone exactly.

The heterogeneous layers (first: no value-residual mix; the unique last-text
layer: no audio->text cross-condition; last) stay unrolled; homogeneous
middle runs go under nnx.scan over nnx.vmap-stacked params, with segment
boundaries wherever a per-layer flag changes — which also covers the
reference's shallow-text configs `1 <= text_depth <= depth` (e2_tts.py:574).
Parity is checked by copying the unrolled model's params into the stacked
layout leaf-for-leaf (models/transformer.py:_run_scan).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from e2_tts_tpu.models.transformer import Transformer

# depth 6 so both middle halves are real (multi-layer) scan groups
CFG = dict(dim=64, depth=6, heads=2, dim_head=16, num_registers=4,
           max_seq_len=128, kernel_size=7, dropout=0.0)


def _layer_state(m, i):
    st = {'speech': nnx.state(m.speech_layers[i], nnx.Param),
          'speech_hcs': nnx.state(m.speech_hcs[i], nnx.Param)}
    if m.text_layers[i] is not None:
        st['text'] = nnx.state(m.text_layers[i], nnx.Param)
        st['text_hcs'] = nnx.state(m.text_hcs[i], nnx.Param)
    return st


def _set_single(dst, st):
    nnx.update(dst.speech, st['speech'])
    nnx.update(dst.speech_hcs, st['speech_hcs'])
    if 'text' in st:
        nnx.update(dst.text, st['text'])
        nnx.update(dst.text_hcs, st['text_hcs'])


def copy_unrolled_into_scan(um, sm, depth):
    _set_single(sm.layer_first, _layer_state(um, 0))
    _set_single(sm.layer_last, _layer_state(um, depth - 1))
    for (kind, start, count, _push), mod in zip(sm.scan_plan, sm.scan_mid):
        if kind == 'single':
            _set_single(mod, _layer_state(um, start))
            continue
        states = [_layer_state(um, i) for i in range(start, start + count)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        _set_single(mod, stacked)
    nnx.update(sm.final_norm, nnx.state(um.final_norm, nnx.Param))
    for attr in ('abs_pos_emb', 'time_fourier', 'time_mlp'):
        nnx.update(getattr(sm, attr), nnx.state(getattr(um, attr), nnx.Param))
    for attr in ('registers', 'text_registers'):
        getattr(sm, attr)[...] = getattr(um, attr)[...]


def _make_pair(cfg):
    um = Transformer(**cfg, rngs=nnx.Rngs(0))
    sm = Transformer(**cfg, scan_layers=True, rngs=nnx.Rngs(1))
    um.eval(), sm.eval()
    copy_unrolled_into_scan(um, sm, cfg['depth'])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 64)), dtype=jnp.float32)
    te = jnp.asarray(rng.normal(size=(2, 32, 32)), dtype=jnp.float32)
    times = jnp.asarray([0.3, 0.7])
    mask = jnp.ones((2, 32), dtype=bool).at[1, 20:].set(False)
    return um, sm, x, te, times, mask


@pytest.fixture(scope='module')
def pair():
    return _make_pair(CFG)


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

    # compare one deep leaf per scanned group: the attention out-proj kernels
    checked = 0
    for gi, (kind, start, count, _push) in enumerate(sm.scan_plan):
        if kind != 'scan':
            continue
        un = [gu['speech_layers'][i]['attn']['to_out']['kernel'][...]
              for i in range(start, start + count)]
        st = gs['scan_mid'][gi]['speech']['attn']['to_out']['kernel'][...]
        np.testing.assert_allclose(np.asarray(jnp.stack(un)), np.asarray(st),
                                   atol=2e-4, rtol=2e-4)
        checked += 1
    assert checked >= 2, sm.scan_plan


@pytest.mark.parametrize('text_depth', [1, 2, 3, 5])
def test_scan_matches_unrolled_shallow_text(text_depth):
    """The reference supports 1 <= text_depth <= depth everywhere
    (e2_tts.py:574); scan mode must reproduce the unrolled numerics for
    every segmentation the text boundary induces."""
    cfg = {**CFG, 'text_depth': text_depth}
    um, sm, x, te, times, mask = _make_pair(cfg)
    out_u = um(x, times=times, mask=mask, text_embed=te)
    out_s = sm(x, times=times, mask=mask, text_embed=te)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s),
                               atol=3e-6, rtol=1e-5)


def test_scan_shallow_text_grads():
    cfg = {**CFG, 'text_depth': 2}
    um, sm, x, te, times, mask = _make_pair(cfg)
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(2, 32, 64)), dtype=jnp.float32)

    def loss(m, x):
        return (m(x, times=times, mask=mask, text_embed=te) * w).sum()

    gu = nnx.grad(loss, argnums=1)(um, x)
    gs = nnx.grad(loss, argnums=1)(sm, x)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gs),
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
