"""Backbone tests: shapes, masking, jit compile, freq axis, config variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from e2_tts_tpu.models.transformer import Transformer


def small_transformer(**kwargs):
    defaults = dict(
        dim=64, depth=4, heads=2, dim_head=16, ff_mult=2, num_registers=4,
        max_seq_len=64, kernel_size=7, dropout=0.0, num_residual_streams=2,
        attn_backend='xla', rngs=nnx.Rngs(0),
    )
    defaults.update(kwargs)
    return Transformer(**defaults)


def test_forward_shapes_cond_on_time():
    model = small_transformer()
    model.eval()
    x = jax.random.normal(jax.random.key(0), (2, 12, 64))
    times = jnp.array([0.3, 0.8])
    mask = jnp.array([[True] * 9 + [False] * 3, [True] * 12])
    text = jax.random.normal(jax.random.key(1), (2, 12, 32))
    out = model(x, times=times, mask=mask, text_embed=text)
    assert out.shape == (2, 12, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_no_time_no_text():
    model = small_transformer(cond_on_time=False)
    model.eval()
    x = jax.random.normal(jax.random.key(0), (2, 12, 64))
    out = model(x)
    assert out.shape == (2, 12, 64)


def test_times_scalar_broadcast():
    model = small_transformer()
    model.eval()
    x = jax.random.normal(jax.random.key(0), (2, 12, 64))
    out_scalar = model(x, times=jnp.asarray(0.5))
    out_vec = model(x, times=jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(out_scalar), np.asarray(out_vec), atol=1e-5)


def test_times_required_iff_cond_on_time():
    model = small_transformer()
    model.eval()
    x = jnp.zeros((1, 8, 64))
    with pytest.raises(AssertionError):
        model(x)  # cond_on_time=True but no times
    model2 = small_transformer(cond_on_time=False)
    model2.eval()
    with pytest.raises(AssertionError):
        model2(x, times=jnp.array([0.5]))


def test_depth_must_be_even():
    with pytest.raises(AssertionError):
        small_transformer(depth=3)


def test_jit_compiles():
    model = small_transformer()
    model.eval()

    @nnx.jit
    def run(m, x, times, mask, text):
        return m(x, times=times, mask=mask, text_embed=text)

    x = jax.random.normal(jax.random.key(0), (2, 12, 64))
    times = jnp.array([0.3, 0.8])
    mask = jnp.ones((2, 12), dtype=bool)
    text = jax.random.normal(jax.random.key(1), (2, 12, 32))
    out = run(model, x, times, mask, text)
    ref = model(x, times=times, mask=mask, text_embed=text)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mask_isolation():
    """Padding positions must not influence valid outputs."""
    model = small_transformer(num_residual_streams=1)
    model.eval()
    x = jax.random.normal(jax.random.key(0), (1, 10, 64))
    mask = jnp.array([[True] * 6 + [False] * 4])
    out1 = model(x, times=jnp.array([0.5]), mask=mask)
    x2 = x.at[0, 6:].set(123.0)
    out2 = model(x2, times=jnp.array([0.5]), mask=mask)
    np.testing.assert_allclose(
        np.asarray(out1[0, :6]), np.asarray(out2[0, :6]), atol=2e-4)


def test_text_depth_shallower_than_depth():
    model = small_transformer(text_depth=2)
    model.eval()
    x = jax.random.normal(jax.random.key(0), (2, 8, 64))
    text = jax.random.normal(jax.random.key(1), (2, 8, 32))
    out = model(x, times=jnp.array([0.1, 0.9]), text_embed=text)
    assert out.shape == (2, 8, 64)
    assert model.text_layers[2] is None and model.text_layers[3] is None


def test_freq_axis():
    model = small_transformer(has_freq_axis=True, freq_heads=2, freq_dim_head=8)
    model.eval()
    x = jax.random.normal(jax.random.key(0), (2, 3, 8, 64))  # (b, f, n, d)
    text = jax.random.normal(jax.random.key(1), (2, 8, 32))
    mask = jnp.ones((2, 8), dtype=bool)
    out = model(x, times=jnp.array([0.2, 0.6]), mask=mask, text_embed=text)
    assert out.shape == (2, 3, 8, 64)
    assert np.isfinite(np.asarray(out)).all()
    # 3-dim input must be rejected when has_freq_axis
    with pytest.raises(AssertionError):
        model(x[:, 0], times=jnp.array([0.2, 0.6]))


def test_config_variants_compile():
    model = small_transformer(
        attn_laser=True, attn_fourier_embed_input=True,
        num_residual_streams=1, abs_pos_emb=False)
    model.eval()
    x = jax.random.normal(jax.random.key(0), (1, 8, 64))
    out = model(x, times=jnp.array([0.5]))
    assert out.shape == (1, 8, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_bfloat16_compute():
    model = small_transformer(dtype=jnp.bfloat16)
    model.eval()
    x = jax.random.normal(jax.random.key(0), (2, 12, 64), dtype=jnp.bfloat16)
    text = jax.random.normal(jax.random.key(1), (2, 12, 32), dtype=jnp.bfloat16)
    out = model(x, times=jnp.array([0.3, 0.8]), text_embed=text)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_dropout_stochastic_in_train_mode():
    model = small_transformer(dropout=0.3)
    x = jax.random.normal(jax.random.key(0), (1, 8, 64))
    model.train()
    out1 = model(x, times=jnp.array([0.5]))
    out2 = model(x, times=jnp.array([0.5]))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    model.eval()
    out3 = model(x, times=jnp.array([0.5]))
    out4 = model(x, times=jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out4), atol=1e-7)


def test_remat_matches_no_remat():
    kwargs = dict(dim=64, depth=4, heads=2, dim_head=16, ff_mult=2,
                  num_registers=4, max_seq_len=64, kernel_size=7, dropout=0.0,
                  num_residual_streams=2, attn_backend='xla')
    a = Transformer(**kwargs, remat=False, rngs=nnx.Rngs(0))
    b = Transformer(**kwargs, remat=True, rngs=nnx.Rngs(0))
    a.eval(); b.eval()
    x = jax.random.normal(jax.random.key(0), (2, 12, 64))
    times = jnp.array([0.3, 0.8])
    text = jax.random.normal(jax.random.key(1), (2, 12, 32))
    out_a = a(x, times=times, text_embed=text)
    out_b = b(x, times=times, text_embed=text)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)

    # gradients flow through the remat path under jit
    @nnx.jit
    def loss(m, x):
        return (m(x, times=times, text_embed=text) ** 2).sum()
    g = nnx.grad(loss)(b, x)
    assert np.isfinite(sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g)))


def test_selective_remat_policy():
    """remat accepts a jax.checkpoint_policies name (selective remat: save
    dots, recompute elementwise) and matches the no-remat forward + grads."""
    import pytest
    kwargs = dict(dim=64, depth=4, heads=2, dim_head=16, ff_mult=2,
                  num_registers=4, max_seq_len=64, kernel_size=7, dropout=0.0,
                  num_residual_streams=2, attn_backend='xla')
    a = Transformer(**kwargs, remat=False, rngs=nnx.Rngs(0))
    b = Transformer(**kwargs, remat='dots_with_no_batch_dims_saveable',
                    rngs=nnx.Rngs(0))
    a.eval(); b.eval()
    x = jax.random.normal(jax.random.key(0), (2, 12, 64))
    times = jnp.array([0.3, 0.8])
    text = jax.random.normal(jax.random.key(1), (2, 12, 32))
    np.testing.assert_allclose(np.asarray(a(x, times=times, text_embed=text)),
                               np.asarray(b(x, times=times, text_embed=text)),
                               atol=1e-5)

    @nnx.jit
    def loss(m, x):
        return (m(x, times=times, text_embed=text) ** 2).sum()
    ga = nnx.grad(loss)(a, x)
    gb = nnx.grad(loss)(b, x)
    for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-4, rtol=2e-4)

    with pytest.raises(ValueError, match='checkpoint_policies'):
        Transformer(**kwargs, remat='not_a_policy', rngs=nnx.Rngs(1))
