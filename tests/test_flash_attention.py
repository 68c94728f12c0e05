"""Flash attention kernel parity vs the XLA reference path (interpreter mode
on CPU; the same kernel compiles on TPU — exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import e2_tts_tpu.ops.flash_attention as fa
from e2_tts_tpu.ops.attention import _xla_attention, attention


@pytest.fixture(autouse=True)
def interpret_mode():
    fa._INTERPRET = True
    yield
    fa._INTERPRET = False


def make_qkv(b=2, h=2, n=100, dh=32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (b, h, n, dh))
    k = jax.random.normal(ks[1], (b, h, n, dh))
    v = jax.random.normal(ks[2], (b, h, n, dh))
    return q, k, v


@pytest.mark.parametrize('softclamp', [None, 50.0])
def test_flash_matches_xla(softclamp):
    q, k, v = make_qkv()
    mask = jnp.asarray(np.random.default_rng(0).random((2, 100)) > 0.3)
    mask = mask.at[:, 0].set(True)   # at least one valid key per row

    ours = fa.flash_attention(q, k, v, mask, softclamp_value=softclamp)
    ref = _xla_attention(q, k, v, mask, scale=q.shape[-1] ** -0.5,
                         softclamp_value=softclamp, dropout_rate=0.0,
                         dropout_rng=None)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_flash_no_mask():
    q, k, v = make_qkv(n=64)
    ours = fa.flash_attention(q, k, v, None, softclamp_value=50.0)
    ref = _xla_attention(q, k, v, None, scale=q.shape[-1] ** -0.5,
                         softclamp_value=50.0, dropout_rate=0.0, dropout_rng=None)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_flash_gradients_match_xla():
    q, k, v = make_qkv(b=1, h=2, n=40, dh=16)
    mask = jnp.ones((1, 40), dtype=bool).at[0, 30:].set(False)

    def loss_flash(q, k, v):
        return (fa.flash_attention(q, k, v, mask, softclamp_value=50.0) ** 2).sum()

    def loss_xla(q, k, v):
        out = _xla_attention(q, k, v, mask, scale=q.shape[-1] ** -0.5,
                             softclamp_value=50.0, dropout_rate=0.0,
                             dropout_rng=None)
        return (out ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_flash_gradients_ragged_multitile():
    """n=600 -> 5 blocks of 128 with an 88-row ragged tail: exercises the
    lax.cond tail cleaning in all three kernels (fwd kv-tail, dq kv-tail,
    dkv q-tail). Interpret mode fills out-of-bounds block rows with NaN
    (measured), so any missed sanitisation poisons these grads."""
    q, k, v = make_qkv(b=1, h=2, n=600, dh=32, seed=7)
    mask = jnp.ones((1, 600), dtype=bool).at[0, 570:].set(False)

    def loss_flash(q, k, v):
        return (fa.flash_attention(q, k, v, mask, softclamp_value=50.0) ** 2).sum()

    def loss_xla(q, k, v):
        out = _xla_attention(q, k, v, mask, scale=q.shape[-1] ** -0.5,
                             softclamp_value=50.0, dropout_rate=0.0,
                             dropout_rng=None)
        return (out ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert bool(jnp.isfinite(a).all())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)


def test_attention_op_backend_dispatch():
    """'pallas' backend via the public op matches 'xla', incl. LASER compose."""
    q, k, v = make_qkv(n=48)
    mask = jnp.ones((2, 48), dtype=bool)
    for laser in (False, True):
        out_p = attention(q, k, v, mask, softclamp_value=50.0, laser=laser,
                          backend='pallas')
        out_x = attention(q, k, v, mask, softclamp_value=50.0, laser=laser,
                          backend='xla')
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=3e-5, rtol=1e-4)


def _oracle_dropout_attention(q, k, v, mask, seed, rate, softclamp=None):
    """Plain-JAX attention applying the exact keep mask the kernel draws
    (fa.dropout_keep_mask reproduces the in-kernel counter-based RNG)."""
    b, h, n, dh = q.shape
    logits = jnp.einsum('bhid,bhjd->bhij', q, k) * dh ** -0.5
    if softclamp is not None:
        logits = jnp.tanh(logits / softclamp) * softclamp
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    keep = fa.dropout_keep_mask(seed, b * h, n, rate).reshape(b, h, n, n)
    probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
    return jnp.einsum('bhij,bhjd->bhid', probs, v)


@pytest.mark.parametrize('rate', [0.1, 0.5])
def test_flash_dropout_matches_oracle(rate):
    q, k, v = make_qkv()
    mask = jnp.asarray(np.random.default_rng(1).random((2, 100)) > 0.3)
    mask = mask.at[:, 0].set(True)
    seed = 1234

    ours = fa.flash_attention(q, k, v, mask, softclamp_value=50.0,
                              dropout_rate=rate, dropout_seed=seed)
    ref = _oracle_dropout_attention(q, k, v, mask, seed, rate, softclamp=50.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=3e-5)


def test_flash_dropout_multiblock_deterministic():
    """n=600 pads to 640 -> 5x5 key/query blocks: the keep mask must be
    consistent across tiles and across repeated calls."""
    q, k, v = make_qkv(b=1, h=1, n=600, dh=32)
    out1 = fa.flash_attention(q, k, v, None, dropout_rate=0.2, dropout_seed=7)
    out2 = fa.flash_attention(q, k, v, None, dropout_rate=0.2, dropout_seed=7)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    ref = _oracle_dropout_attention(q, k, v, None, 7, 0.2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref), atol=3e-5)

    out3 = fa.flash_attention(q, k, v, None, dropout_rate=0.2, dropout_seed=8)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_flash_dropout_grads_match_oracle():
    """The block-wise backward regenerates the forward's exact keep mask:
    custom-VJP grads == autodiff through the oracle with the same mask."""
    q, k, v = make_qkv(b=1, h=2, n=40, dh=16, seed=3)
    mask = jnp.ones((1, 40), dtype=bool).at[0, 30:].set(False)
    seed, rate = 99, 0.3

    def loss_flash(q, k, v):
        out = fa.flash_attention(q, k, v, mask, softclamp_value=50.0,
                                 dropout_rate=rate, dropout_seed=seed)
        return (out ** 2).sum()

    def loss_oracle(q, k, v):
        out = _oracle_dropout_attention(q, k, v, mask, seed, rate, softclamp=50.0)
        return (out ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)


def test_flash_dropout_keep_rate():
    keep = fa.dropout_keep_mask(42, 4, 256, 0.1)
    rate = 1.0 - float(keep.mean())
    assert abs(rate - 0.1) < 0.005


def test_attention_op_pallas_dropout():
    """The public op routes dropout through the kernel when backend='pallas';
    the derived seed reproduces through the same randint draw."""
    q, k, v = make_qkv(n=64)
    mask = jnp.ones((2, 64), dtype=bool)
    rng = jax.random.key(5)

    out = attention(q, k, v, mask, softclamp_value=50.0, dropout_rate=0.25,
                    dropout_rng=rng, backend='pallas')
    seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    ref = _oracle_dropout_attention(q, k, v, mask, seed[0], 0.25, softclamp=50.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_bf16():
    q, k, v = (t.astype(jnp.bfloat16) for t in make_qkv(n=64))
    out = fa.flash_attention(q, k, v, None, softclamp_value=50.0)
    assert out.dtype == jnp.bfloat16
    ref = _xla_attention(q, k, v, None, scale=q.shape[-1] ** -0.5,
                         softclamp_value=50.0, dropout_rate=0.0, dropout_rng=None)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32), atol=3e-2)


# -- lane-packed (transpose-free) kernels -------------------------------------

def make_packed(b=2, h=8, n=256, dh=64, seed=0):
    D = h * dh
    ks = jax.random.split(jax.random.key(seed), 3)
    return (jax.random.normal(ks[0], (b, n, D)),
            jax.random.normal(ks[1], (b, n, D)),
            jax.random.normal(ks[2], (b, n, D)))


@pytest.mark.parametrize('b,h,n,dh,rate,softclamp', [
    (2, 8, 256, 64, 0.0, 50.0),     # flagship head geometry
    (2, 8, 256, 64, 0.3, 50.0),     # in-kernel dropout: same bits per head
    (2, 8, 200, 64, 0.0, 50.0),     # ragged tail (no divisor block >= 128)
    (1, 4, 256, 32, 0.0, 50.0),     # 4 heads per lane tile, D=128
    (2, 4, 256, 64, 0.0, None),     # D=256, no softclamp
    (1, 16, 256, 64, 0.3, 50.0),    # D=1024 -> NL=2 lane blocks (legacy
                                    # sublane delta layout fallback)
])
def test_packed_matches_bhnd_kernel(b, h, n, dh, rate, softclamp):
    """The packed kernel must match the (b, h, n, dh) kernel bit-for-bit in
    semantics — INCLUDING the dropout mask, which is a pure function of the
    global head index that both layouts share."""
    D = h * dh
    qp, kp, vp = make_packed(b, h, n, dh)
    mask = jnp.asarray(np.random.default_rng(1).random((b, n)) > 0.2)
    mask = mask.at[:, 0].set(True)
    to_bhnd = lambda t: t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    kw = dict(softclamp_value=softclamp, dropout_rate=rate,
              dropout_seed=42 if rate else None)

    def loss_packed(q, k, v):
        o = fa.flash_attention_packed(q, k, v, mask, heads=h, **kw)
        return (o.astype(jnp.float32) ** 2).sum(), o

    def loss_ref(q, k, v):
        o = fa.flash_attention(to_bhnd(q), to_bhnd(k), to_bhnd(v), mask, **kw)
        return ((o.astype(jnp.float32) ** 2).sum(),
                o.transpose(0, 2, 1, 3).reshape(b, n, D))

    (_, op), gp = jax.value_and_grad(loss_packed, argnums=(0, 1, 2),
                                     has_aux=True)(qp, kp, vp)
    (_, oref), gref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2),
                                         has_aux=True)(qp, kp, vp)
    np.testing.assert_allclose(np.asarray(op), np.asarray(oref), atol=1e-5)
    for a, r in zip(gp, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


@pytest.mark.parametrize('b,h,n,dh,rate', [
    (2, 8, 256, 64, 0.0),    # flagship head geometry
    (2, 8, 256, 64, 0.3),    # with in-kernel dropout
    (2, 8, 200, 64, 0.0),    # ragged tail
    (1, 16, 256, 64, 0.0),   # D=1024 -> NL=2 (legacy sublane gate layout)
])
def test_packed_gated_matches_outside_gate(b, h, n, dh, rate):
    """The in-kernel per-head value gate (x-transformers gate_value_heads,
    e2_tts.py:548-551) must match gating the ungated kernel's output
    outside — values AND grads, including the gate-logit grad."""
    D = h * dh
    qp, kp, vp = make_packed(b, h, n, dh)
    logits = jax.random.normal(jax.random.key(7), (b, n, h))
    mask = jnp.asarray(np.random.default_rng(1).random((b, n)) > 0.2)
    mask = mask.at[:, 0].set(True)
    kw = dict(softclamp_value=50.0, dropout_rate=rate,
              dropout_seed=42 if rate else None)

    seg = np.kron(np.eye(h, dtype=np.float32),
                  np.ones((dh, 1), dtype=np.float32))   # (D, h)

    def loss_gated(q, k, v, z):
        o = fa.flash_attention_packed(q, k, v, mask, heads=h,
                                      gate_logits=z, **kw)
        return (o.astype(jnp.float32) ** 2).sum(), o

    def loss_ref(q, k, v, z):
        o = fa.flash_attention_packed(q, k, v, mask, heads=h, **kw)
        gate = jax.nn.sigmoid(z) @ jnp.asarray(seg).T   # lane expand
        o = o * gate.astype(o.dtype)
        return (o.astype(jnp.float32) ** 2).sum(), o

    (_, og), gg = jax.value_and_grad(loss_gated, argnums=(0, 1, 2, 3),
                                     has_aux=True)(qp, kp, vp, logits)
    (_, oref), gref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3),
                                         has_aux=True)(qp, kp, vp, logits)
    np.testing.assert_allclose(np.asarray(og), np.asarray(oref), atol=1e-5)
    for a, r in zip(gg, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


def test_packed_eligibility():
    assert fa.packed_eligible(8, 64)     # flagship speech attention
    assert fa.packed_eligible(4, 32)
    assert not fa.packed_eligible(2, 32)     # D=64 < 128
    assert not fa.packed_eligible(8, 48)     # 48 does not divide 128
    assert fa.packed_eligible(2, 64)


def test_attention_packed_fallback_matches_attention():
    """On CPU (no TPU backend) attention_packed transposes internally and
    must equal the bhnd op exactly, laser included."""
    from e2_tts_tpu.ops.attention import attention_packed
    b, h, n, dh = 2, 2, 64, 32
    D = h * dh
    qp, kp, vp = make_packed(b, h, n, dh)
    to_bhnd = lambda t: t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    for laser in (False, True):
        ref = attention(to_bhnd(qp), to_bhnd(kp), to_bhnd(vp), None,
                        laser=laser)
        ref = ref.transpose(0, 2, 1, 3).reshape(b, n, D)
        out = attention_packed(qp, kp, vp, None, heads=h, laser=laser)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_apply_rotary_packed_matches_bhnd():
    from e2_tts_tpu.ops.rotary import (apply_rotary, apply_rotary_packed,
                                       rotary_freqs)
    b, h, n, dh = 2, 4, 64, 32
    D = h * dh
    t = jax.random.normal(jax.random.key(0), (b, n, D))
    fr = rotary_freqs(n, dh)
    ref = apply_rotary(t.reshape(b, n, h, dh).transpose(0, 2, 1, 3), fr)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, n, D)
    np.testing.assert_allclose(np.asarray(apply_rotary_packed(t, fr)),
                               np.asarray(ref), atol=0)


@pytest.mark.parametrize('b,h,n,dh', [
    (2, 8, 256, 64),     # flagship head geometry, divisor blocks
    (1, 8, 200, 64),     # ragged tail block (200 = 128 + 72)
    (1, 16, 128, 64),    # D = 1024
])
def test_delta_pallas_matches_xla(b, h, n, dh):
    """The fused Pallas delta pre-kernel (E2TTS_FLASH_DELTA=pallas) must
    reproduce the XLA segment-matmul pre-pass: rowsum(do * o) per packed
    head, f32, (b, n, h)."""
    D = h * dh
    ks = jax.random.split(jax.random.key(3), 2)
    o = jax.random.normal(ks[0], (b, n, D), dtype=jnp.bfloat16)
    do = jax.random.normal(ks[1], (b, n, D), dtype=jnp.bfloat16)
    ours = fa._delta_bnh_pallas(o, do, h)
    assert ours.shape == (b, n, h) and ours.dtype == jnp.float32
    ref = fa._delta_bnh_xla(o, do, h)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_delta_backend_dispatch_end_to_end(monkeypatch):
    """Gated packed bwd (the delta consumer AND the gate-logit grad source)
    is invariant to the delta backend knob."""
    b, h, n, dh = 1, 8, 200, 16
    qp, kp, vp = make_packed(b, h, n, dh, seed=5)
    logits = jax.random.normal(jax.random.key(9), (b, n, h))
    mask = jnp.ones((b, n), dtype=bool).at[0, 180:].set(False)

    def loss(q, k, v, z):
        o = fa.flash_attention_packed(q, k, v, mask, heads=h, gate_logits=z,
                                      softclamp_value=50.0)
        return (o.astype(jnp.float32) ** 2).sum()

    monkeypatch.setenv('E2TTS_FLASH_DELTA', 'xla')
    g_xla = jax.grad(loss, argnums=(0, 1, 2, 3))(qp, kp, vp, logits)
    monkeypatch.setenv('E2TTS_FLASH_DELTA', 'pallas')
    g_pal = jax.grad(loss, argnums=(0, 1, 2, 3))(qp, kp, vp, logits)
    for a, r in zip(g_pal, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)
