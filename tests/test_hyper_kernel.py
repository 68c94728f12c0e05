"""Pallas hyper-connections width kernel vs the XLA reference (interpret
mode on CPU; compiled path exercised on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import e2_tts_tpu.ops.hyper_conn_kernel as hck


@pytest.fixture(autouse=True)
def interpret_mode():
    hck._INTERPRET = True
    yield
    hck._INTERPRET = False


def make_inputs(s=4, m=100, d=64, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    residuals = jax.random.normal(ks[0], (s, m, d), dtype=dtype)
    init_alpha0 = jnp.zeros((s, 1)).at[1, 0].set(1.0)
    static_alpha = jnp.concatenate([init_alpha0, jnp.eye(s)], axis=1)
    static_beta = jnp.ones((s,))
    dyn_alpha_w = jax.random.normal(ks[1], (d, s + 1)) * 0.02
    dyn_beta_w = jax.random.normal(ks[2], (d,)) * 0.02
    return (residuals, static_alpha, static_beta, dyn_alpha_w,
            jnp.asarray(0.01), dyn_beta_w, jnp.asarray(0.01))


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_width_kernel_matches_reference(dtype):
    args = make_inputs(dtype=dtype)
    b_k, c_k, beta_k = hck.width_connection(*args)
    mixed_k = jnp.concatenate([b_k[None], c_k], axis=0)
    mixed_r, beta_r = hck._width_reference(*args)
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(mixed_k, dtype=np.float32),
                               np.asarray(mixed_r, dtype=np.float32), atol=atol)
    np.testing.assert_allclose(np.asarray(beta_k, dtype=np.float32),
                               np.asarray(beta_r, dtype=np.float32), atol=atol)


def test_width_kernel_row_padding():
    # m not a multiple of the block: padded internally, output trimmed
    args = make_inputs(m=37)
    b_k, c_k, beta_k = hck.width_connection(*args)
    mixed_k = jnp.concatenate([b_k[None], c_k], axis=0)
    assert mixed_k.shape == (5, 37, 64)
    assert beta_k.shape == (4, 37)
    mixed_r, beta_r = hck._width_reference(*args)
    np.testing.assert_allclose(np.asarray(mixed_k), np.asarray(mixed_r), atol=1e-5)


def test_width_kernel_gradients_match_reference():
    args = make_inputs(m=32, d=32)

    def loss_k(*a):
        b, c, beta = hck.width_connection(*a)
        return (b ** 2).sum() + (c ** 2).sum() + (beta ** 2).sum()

    def loss_r(*a):
        mixed, beta = hck._width_reference(*a)
        return (mixed ** 2).sum() + (beta ** 2).sum()

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize('dtype,rtol', [(jnp.float32, 1e-4), (jnp.bfloat16, 6e-2)])
def test_width_kernel_bwd_multitile(dtype, rtol):
    """Hand-derived backward kernel vs autodiff-through-reference across
    multiple row tiles (m=600 -> 3 blocks of 256 with padded rows): checks
    the fp32 accumulator blocks survive the sequential grid and padded rows
    contribute nothing."""
    args = make_inputs(s=4, m=600, d=64, dtype=dtype, seed=3)

    def loss_k(*a):
        b, c, beta = hck.width_connection(*a)
        mixed = jnp.concatenate([b[None], c], axis=0)
        return (mixed.astype(jnp.float32) ** 2).mean() + \
            (beta.astype(jnp.float32) ** 2).mean()

    def loss_r(*a):
        mixed, beta = hck._width_reference(*a)
        return (mixed.astype(jnp.float32) ** 2).mean() + \
            (beta.astype(jnp.float32) ** 2).mean()

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for a, b in zip(gk, gr):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b32).max(), 1e-6)
        np.testing.assert_allclose(a32, b32, atol=rtol * scale, rtol=rtol)


def test_transformer_uses_kernel_in_interpret_mode():
    """End-to-end through the backbone with the kernel path active."""
    from flax import nnx
    from e2_tts_tpu.models.transformer import Transformer
    model = Transformer(dim=64, depth=2, heads=2, dim_head=16, ff_mult=2,
                        num_registers=2, max_seq_len=64, kernel_size=7,
                        dropout=0.0, num_residual_streams=4,
                        attn_backend='xla', rngs=nnx.Rngs(0))
    model.eval()
    x = jax.random.normal(jax.random.key(0), (2, 12, 64))
    out_kernel = model(x, times=jnp.array([0.3, 0.8]))

    hck._INTERPRET = False   # back to the XLA reference path on CPU
    out_ref = model(x, times=jnp.array([0.3, 0.8]))
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               atol=2e-4)


def make_fused_inputs(s=4, m=100, d=64, dtype=jnp.float32, seed=3):
    ks = jax.random.split(jax.random.key(seed), 3)
    base = make_inputs(s=s, m=m, d=d, dtype=dtype, seed=seed)
    carried = jax.random.normal(ks[0], (s, m, d), dtype=dtype)
    branch = jax.random.normal(ks[1], (m, d), dtype=dtype)
    betaT = jax.random.normal(ks[2], (m, s), dtype=dtype) * 0.5 + 1.0
    return (carried, branch, betaT) + base[1:]


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_fused_kernel_matches_materialized(dtype):
    """Depth-fused width == materialize-then-width, bit-for-math."""
    args = make_fused_inputs(dtype=dtype)
    carried, branch, betaT = args[:3]
    b_f, c_f, beta_f = hck.width_connection_fused(*args)
    mixed_f = jnp.concatenate([b_f[None], c_f], axis=0)
    r = carried + branch[None].astype(dtype) \
        * jnp.transpose(betaT)[..., None].astype(dtype)
    b_p, c_p, beta_p = hck.width_connection(r, *args[3:])
    mixed_p = jnp.concatenate([b_p[None], c_p], axis=0)
    atol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(mixed_f, np.float32),
                               np.asarray(mixed_p, np.float32), atol=atol)
    np.testing.assert_allclose(np.asarray(beta_f, np.float32),
                               np.asarray(beta_p, np.float32), atol=atol)


def test_fused_kernel_grads_match_reference():
    """Hand-derived fused adjoint vs jax.vjp over the reference composition,
    for ALL nine inputs (carried/branch/betaT + the six params)."""
    args = make_fused_inputs(m=96)

    def loss_k(*a):
        b, c, beta = hck.width_connection_fused(*a)
        mixed = jnp.concatenate([b[None], c], axis=0)
        return (mixed.astype(jnp.float32) ** 2).mean() + \
            (beta.astype(jnp.float32) ** 2).mean()

    def loss_r(*a):
        mixed, beta = hck._width_fused_reference(*a)
        return (mixed.astype(jnp.float32) ** 2).mean() + \
            (beta.astype(jnp.float32) ** 2).mean()

    gk = jax.grad(loss_k, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(9)))(*args)
    for a, b in zip(gk, gr):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b32).max(), 1e-6)
        np.testing.assert_allclose(a32, b32, atol=2e-4 * scale, rtol=2e-4)


def test_lazy_streams_through_backbone():
    """The LazyStreams chain (depth fused into the next width kernel) must
    match... itself is exercised by the backbone parity test above; here
    check materialize()/reduce_stream algebra directly."""
    from e2_tts_tpu.models.hyper_connections import LazyStreams, reduce_stream
    ks = jax.random.split(jax.random.key(0), 3)
    carried = jax.random.normal(ks[0], (4, 2, 8, 16))
    branch = jax.random.normal(ks[1], (2, 8, 16))
    beta = jax.random.normal(ks[2], (4, 2, 8))
    lazy = LazyStreams(carried, branch, beta)
    np.testing.assert_allclose(
        np.asarray(reduce_stream(lazy)),
        np.asarray(lazy.materialize().sum(axis=0)), atol=1e-5)
