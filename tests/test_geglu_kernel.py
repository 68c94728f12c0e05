"""Fused GEGLU+dropout Pallas kernel vs the XLA reference (interpret mode on
CPU; the compiled path is exercised on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import e2_tts_tpu.ops.geglu_kernel as gk


@pytest.fixture(autouse=True)
def interpret_mode():
    gk._INTERPRET = True
    yield
    gk._INTERPRET = False


def make_h2(b=2, n=96, inner=128, dtype=jnp.float32, seed=0):
    h2 = jax.random.normal(jax.random.key(seed), (b, n, 2 * inner),
                           dtype=dtype) * 2.0
    return h2, jnp.uint32(0xDEADBEEF)


@pytest.mark.parametrize('dtype,tol', [(jnp.float32, 5e-5), (jnp.bfloat16, 3e-2)])
@pytest.mark.parametrize('rate', [0.0, 0.3])
def test_fwd_matches_reference(dtype, rate, tol):
    # bf16: intermediate roundings differ (kernel computes in f32, casting
    # once; the XLA path rounds each op) -> compare with rtol at 1-2 ulp
    h2, seed = make_h2(dtype=dtype)
    assert gk._use_pallas(h2, rate)
    out_k = gk.geglu_dropout(h2, seed, rate)
    out_r = gk._geglu_dropout_reference(h2, seed, rate)
    assert out_k.shape == out_r.shape == (2, 96, 128)
    np.testing.assert_allclose(np.asarray(out_k, np.float32),
                               np.asarray(out_r, np.float32),
                               atol=tol, rtol=tol)


def test_dropout_mask_bit_exact():
    """The kernel regenerates ops.dropout.hash_keep's exact mask from
    block-local coordinates (several row tiles: n=96 -> blocks of 96/192).
    Inputs stay in [0.5, 1.5] so the gated activation is never a natural
    zero — every output zero is a dropped element."""
    seed = jnp.uint32(0xDEADBEEF)
    h2 = jax.random.uniform(jax.random.key(5), (3, 96, 256),
                            minval=0.5, maxval=1.5)
    out_k = np.asarray(gk.geglu_dropout(h2, seed, 0.5))
    out_r = np.asarray(gk._geglu_dropout_reference(h2, seed, 0.5))
    np.testing.assert_array_equal(out_k == 0.0, out_r == 0.0)
    assert 0.3 < (out_r == 0.0).mean() < 0.7


def test_erf_approximation_accuracy():
    # A&S 7.1.26 nominal |err| <= 1.5e-7; f32 evaluation adds ~2 ulp
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(gk._erf_f32(x)),
                               np.asarray(jax.lax.erf(x)), atol=6e-7)


@pytest.mark.parametrize('rate', [0.0, 0.25])
def test_grads_match_reference(rate):
    h2, seed = make_h2(n=32, inner=128, seed=2)

    def loss_k(a):
        return (gk.geglu_dropout(a, seed, rate) ** 2).sum()

    def loss_r(a):
        return (gk._geglu_dropout_reference(a, seed, rate) ** 2).sum()

    g_k = jax.grad(loss_k)(h2)
    g_r = jax.grad(loss_r)(h2)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               atol=1e-4, rtol=1e-4)


def test_routing_fallback_odd_shapes():
    """n with no multiple-of-8 divisor routes to the reference path and
    still differentiates."""
    h2, seed = make_h2(n=10, inner=128)
    assert not gk._use_pallas(h2, 0.1)
    out = gk.geglu_dropout(h2, seed, 0.1)
    assert out.shape == (2, 10, 128)
    g = jax.grad(lambda a: gk.geglu_dropout(a, seed, 0.1).sum())(h2)
    assert np.isfinite(np.asarray(g)).all()


def test_routing_fallback_non_128_inner():
    """inner NOT a multiple of 128 (text FF: 704) must take the XLA path:
    Mosaic rejects a (.., inner) block at lane-block offset 1 unless inner is
    128-divisible (round-3 hardware lesson — interpret mode does not enforce
    this, so the assert on _use_pallas is the real regression guard)."""
    for inner in (88, 704):
        h2, seed = make_h2(n=32, inner=inner, seed=7)
        assert not gk._use_pallas(h2, 0.2)
        out_k = gk.geglu_dropout(h2, seed, 0.2)
        out_r = gk._geglu_dropout_reference(h2, seed, 0.2)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   atol=2e-6)


def test_feedforward_uses_kernel_in_interpret_mode():
    """End-to-end through FeedForward: kernel path == reference path with the
    same rngs stream (bit-identical masks), fwd and grads."""
    from flax import nnx
    from e2_tts_tpu.models.blocks import FeedForward

    def run(backend_off):
        import e2_tts_tpu.ops.geglu_kernel as g2
        g2._INTERPRET = not backend_off
        ff = FeedForward(dim=64, mult=2.0, dropout=0.3, rngs=nnx.Rngs(0))
        ff.train()
        x = jax.random.normal(jax.random.key(1), (2, 24, 64))

        def loss(m, x):
            return (m(x) ** 2).mean()

        l, grads = nnx.value_and_grad(loss)(ff, x)
        return float(l), grads

    l_k, g_k = run(backend_off=False)
    l_r, g_r = run(backend_off=True)
    assert np.isclose(l_k, l_r, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4), g_k, g_r)
