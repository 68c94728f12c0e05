"""Unit tests for L3 blocks: norms, embeds, conv, FF, attention, hyper-
connections, HL-Gauss head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from e2_tts_tpu.models.blocks import (
    RMSNorm, AdaptiveRMSNorm, AdaLNZero, RandomFourierEmbed, LinearFourierEmbed,
    CharacterEmbed, InterpolatedCharacterEmbed, TextAudioCrossCondition,
    DepthwiseConv, FeedForward, Attention,
)
from e2_tts_tpu.models.hyper_connections import (
    get_init_and_expand_reduce_stream_functions,
)
from e2_tts_tpu.models.hl_gauss import HLGaussLayer, HLGaussLoss
from e2_tts_tpu.ops.rotary import RotaryEmbedding
from e2_tts_tpu.ops.attention import softclamp


def rngs():
    return nnx.Rngs(0)


def test_rmsnorm():
    norm = RMSNorm(8)
    x = jax.random.normal(jax.random.key(0), (2, 3, 8))
    out = norm(x)
    # unit-rms rows scaled by gamma=1
    np.testing.assert_allclose(
        np.asarray((out ** 2).mean(-1)), np.ones((2, 3)), rtol=1e-5)


def test_adaptive_rmsnorm_starts_as_rmsnorm():
    ad = AdaptiveRMSNorm(8, rngs=rngs())
    base = RMSNorm(8)
    x = jax.random.normal(jax.random.key(0), (2, 3, 8))
    cond = jax.random.normal(jax.random.key(1), (2, 8))
    # zero-init gamma projection => identical to plain RMSNorm at init
    np.testing.assert_allclose(np.asarray(ad(x, condition=cond)), np.asarray(base(x)), rtol=1e-5)


def test_adaln_zero_initial_gate():
    gate = AdaLNZero(8, rngs=rngs())
    x = jnp.ones((2, 3, 8))
    cond = jnp.ones((2, 8))
    out = gate(x, condition=cond)
    # sigmoid(-2) ~ 0.1192 (reference: e2_tts.py:337, 344)
    np.testing.assert_allclose(np.asarray(out), 0.11920292 * np.ones((2, 3, 8)), rtol=1e-5)


def test_random_fourier_embed():
    emb = RandomFourierEmbed(16, rngs=rngs())
    x = jnp.array([0.1, 0.7])
    out = emb(x)
    assert out.shape == (2, 17)   # packs (x, sin, cos) -> dim + 1
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x), rtol=1e-6)


def test_linear_fourier_embed():
    emb = LinearFourierEmbed(16, p=0.25, rngs=rngs())
    out = emb(jnp.ones((2, 5, 16)))
    assert out.shape == (2, 5, 16)


def test_character_embed():
    emb = CharacterEmbed(8, num_embeds=10, rngs=rngs())
    text = jnp.array([[3, 5, -1], [1, -1, -1]])
    out = emb(text, max_seq_len=5)
    assert out.shape == (2, 5, 8)
    # padding positions use embedding id 0 (filler)
    filler = np.asarray(emb.embed(jnp.array(0)))
    np.testing.assert_allclose(np.asarray(out[0, 3]), filler, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1, 1]), filler, rtol=1e-6)
    # truncation: text longer than mel length is curtailed
    out_short = emb(text, max_seq_len=2)
    assert out_short.shape == (2, 2, 8)


def test_interpolated_character_embed():
    emb = InterpolatedCharacterEmbed(8, num_embeds=10, rngs=rngs())
    text = jnp.array([[3, 5, 2, -1], [1, -1, -1, -1]])
    mask = jnp.array([[True] * 6 + [False] * 2, [True] * 3 + [False] * 5])
    out = emb(text, max_seq_len=8, mask=mask)
    assert out.shape == (2, 8, 8)
    # masked positions are zero
    np.testing.assert_array_equal(np.asarray(out[0, 6:]), np.zeros((2, 8)))
    np.testing.assert_array_equal(np.asarray(out[1, 3:]), np.zeros((5, 8)))
    # jit with static seq len compiles
    @nnx.jit(static_argnums=2)
    def run(m, t, n, mask):
        return m(t, n, mask)
    np.testing.assert_allclose(np.asarray(run(emb, text, 8, mask)), np.asarray(out), atol=1e-6)


def test_cross_condition_zero_init_is_identity():
    cc = TextAudioCrossCondition(8, 4, rngs=rngs())
    audio = jax.random.normal(jax.random.key(0), (2, 5, 8))
    text = jax.random.normal(jax.random.key(1), (2, 5, 4))
    a, t = cc(audio, text)
    np.testing.assert_allclose(np.asarray(a), np.asarray(audio), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(text), atol=1e-6)
    # last text layer: audio->text conditioning disabled
    cc_last = TextAudioCrossCondition(8, 4, cond_audio_to_text=False, rngs=rngs())
    _, t2 = cc_last(audio, text)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(text), atol=1e-6)


def test_depthwise_conv_masking():
    conv = DepthwiseConv(8, kernel_size=5, rngs=rngs())
    x = jax.random.normal(jax.random.key(0), (2, 10, 8))
    mask = jnp.array([[True] * 6 + [False] * 4, [True] * 10])
    out = conv(x, mask=mask)
    assert out.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out[0, 6:]), np.zeros((4, 8)))
    # masked inputs do not leak into valid outputs: changing masked region is a no-op
    x2 = x.at[0, 6:].set(99.0)
    out2 = conv(x2, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_feedforward():
    ff = FeedForward(16, mult=4, rngs=rngs())
    out = ff(jnp.ones((2, 5, 16)))
    assert out.shape == (2, 5, 16)
    # GLU inner dim uses the 2/3 rule rounded to 64
    assert ff.proj_out.kernel.shape[0] == 64  # int(16*4*2/3)=42 -> 64


def test_feedforward_hash_dropout():
    """Counter-hash dropout (ops/dropout.py): right keep statistics, fresh
    masks per call, off in eval mode, zero entries exactly zeroed."""
    from e2_tts_tpu.ops.dropout import hash_dropout

    x = jnp.ones((64, 512))
    key = jax.random.key(0)
    out = hash_dropout(x, 0.25, key)
    kept = np.asarray(out) != 0
    assert abs(kept.mean() - 0.75) < 0.02
    np.testing.assert_allclose(np.asarray(out)[kept], 1.0 / 0.75, rtol=1e-6)
    # deterministic given the key, different across keys
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(hash_dropout(x, 0.25, key)))
    assert not np.array_equal(np.asarray(out),
                              np.asarray(hash_dropout(x, 0.25, jax.random.key(1))))

    ff = FeedForward(16, mult=4, dropout=0.5, rngs=rngs())
    xin = jnp.ones((2, 5, 16))
    a, b = ff(xin), ff(xin)
    assert not np.allclose(np.asarray(a), np.asarray(b))  # fresh stream draws
    ff.eval()
    a, b = ff(xin), ff(xin)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_softclamp():
    x = jnp.array([0.0, 100.0, -1000.0])
    out = softclamp(x, 50.0)
    assert abs(out[0]) < 1e-6 and out[1] < 50.0 and out[2] >= -50.0


@pytest.mark.parametrize('laser', [False, True])
def test_attention_basic(laser):
    attn = Attention(32, heads=4, dim_head=8, gate_value_heads=True,
                     softclamp_logits=True, laser=laser, backend='xla', rngs=rngs())
    attn.eval()
    x = jax.random.normal(jax.random.key(0), (2, 6, 32))
    mask = jnp.array([[True] * 4 + [False] * 2, [True] * 6])
    out, values = attn(x, mask=mask)
    assert out.shape == (2, 6, 32)
    assert values.shape == (2, 6, 32)   # packed (b, n, h*dh) value residual
    assert np.isfinite(np.asarray(out)).all()
    # masked keys do not affect unmasked query outputs
    x2 = x.at[0, 4:].set(7.0)
    out2, _ = attn(x2, mask=mask)
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.asarray(out2[0, :4]), atol=1e-5)


def test_attention_value_residual_mix():
    attn = Attention(32, heads=4, dim_head=8, learned_value_residual_mix=True,
                     backend='xla', rngs=rngs())
    attn.eval()
    x = jax.random.normal(jax.random.key(0), (2, 6, 32))
    v_res = jax.random.normal(jax.random.key(1), (2, 6, 32))   # packed layout
    out, values = attn(x, value_residual=v_res)
    assert out.shape == (2, 6, 32)
    # returned values are the raw ones (pre-mix): independent of v_res
    out_b, values_b = attn(x, value_residual=jnp.zeros_like(v_res))
    np.testing.assert_allclose(np.asarray(values), np.asarray(values_b), atol=1e-6)
    assert not np.allclose(np.asarray(out), np.asarray(out_b))


def test_attention_with_rotary():
    attn = Attention(32, heads=4, dim_head=8, backend='xla', rngs=rngs())
    attn.eval()
    rot = RotaryEmbedding(8)
    x = jax.random.normal(jax.random.key(0), (1, 6, 32))
    out, _ = attn(x, rotary_pos_emb=rot.forward_from_seq_len(6))
    assert out.shape == (1, 6, 32)


def test_attention_dropout_train_vs_eval():
    attn = Attention(32, heads=2, dim_head=8, dropout=0.5, backend='xla', rngs=rngs())
    x = jax.random.normal(jax.random.key(0), (1, 6, 32))
    attn.train()
    out1, _ = attn(x)
    out2, _ = attn(x)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))  # fresh dropout keys
    attn.eval()
    out3, _ = attn(x)
    out4, _ = attn(x)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out4), atol=1e-7)


def test_hyper_connections_single_stream_is_plain_residual():
    init, expand, reduce = get_init_and_expand_reduce_stream_functions(1, disable=True)
    hc = init(8)
    x = jax.random.normal(jax.random.key(0), (2, 5, 8))
    ex = expand(x)
    branch_in, add_residual = hc(ex)
    np.testing.assert_allclose(np.asarray(branch_in), np.asarray(x), atol=1e-7)
    out = reduce(add_residual(jnp.ones_like(x)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x + 1.0), atol=1e-7)


def test_hyper_connections_multi_stream():
    init, expand, reduce = get_init_and_expand_reduce_stream_functions(4)
    hcs = [init(8, rngs=rngs()) for _ in range(3)]
    x = jax.random.normal(jax.random.key(0), (2, 5, 8))
    h = expand(x)
    assert h.shape == (4, 2, 5, 8)
    for hc in hcs:
        branch_in, add_residual = hc(h)
        assert branch_in.shape == (2, 5, 8)
        h = add_residual(branch_in * 0.1)
        assert h.shape == (4, 2, 5, 8)
    out = reduce(h)
    assert out.shape == (2, 5, 8)
    assert np.isfinite(np.asarray(out)).all()
    # at init (zero dynamic weights), layer-0 branch input equals stream 0 = x
    branch_in0, _ = hcs[0](expand(x))
    np.testing.assert_allclose(np.asarray(branch_in0), np.asarray(x), atol=1e-5)


def test_hl_gauss_regression_default():
    layer = HLGaussLayer(16, use_regression=True, rngs=rngs())
    embed = jax.random.normal(jax.random.key(0), (4, 16))
    pred = layer(embed)
    assert pred.shape == (4,)
    assert (np.asarray(pred) >= 0).all()   # softplus output
    loss = layer(embed, jnp.array([1.0, 2.0, 3.0, 4.0]))
    assert loss.shape == ()
    assert float(loss) >= 0


def test_hl_gauss_classification():
    layer = HLGaussLayer(
        16, hl_gauss_loss=dict(min_value=0.0, max_value=100.0, num_bins=20),
        use_regression=False, rngs=rngs())
    embed = jax.random.normal(jax.random.key(0), (4, 16))
    pred = layer(embed)
    assert pred.shape == (4,)
    assert ((np.asarray(pred) >= 0) & (np.asarray(pred) <= 100)).all()
    loss = layer(embed, jnp.array([10.0, 20.0, 30.0, 90.0]))
    assert np.isfinite(float(loss))


def test_hl_gauss_target_probs():
    hl = HLGaussLoss(0.0, 10.0, 10, sigma=1.0)
    probs = hl.target_probs(jnp.array([5.0]))
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), [1.0], rtol=1e-5)
    # mass concentrated near the target bin
    assert np.asarray(probs)[0, 4:6].sum() > 0.5


def test_attention_no_softclamp_config():
    """attn_kwargs={} (softclamp off) — the reference default has it on, but
    the flag must be independently controllable."""
    attn = Attention(32, heads=2, dim_head=8, backend='xla', rngs=rngs())
    attn.eval()
    assert attn.softclamp_value is None
    x = jax.random.normal(jax.random.key(0), (1, 6, 32))
    out, _ = attn(x)
    assert np.isfinite(np.asarray(out)).all()


def test_attention_auto_routing_guards():
    """'auto' must not route tiny sequences (freq-axis attention) to the
    flash kernel — it pads seq to 128 and would mostly compute padding."""
    import e2_tts_tpu.ops.attention as att

    routed = {}
    real_flash = {}

    def fake_flash(q, k, v, mask, *, scale, softclamp_value, **kw):
        routed['pallas'] = True
        return att._xla_attention(q, k, v, mask, scale=scale,
                                  softclamp_value=softclamp_value,
                                  dropout_rate=0.0, dropout_rng=None)

    import e2_tts_tpu.ops.flash_attention as fa
    orig, orig_backend = fa.flash_attention, jax.default_backend
    fa.flash_attention = fake_flash
    try:
        import unittest.mock as mock
        with mock.patch.object(jax, 'default_backend', return_value='tpu'):
            q = jnp.zeros((32, 8, 4, 16))     # b*h large but seq=4 (freq axis)
            att.attention(q, q, q, None, backend='auto')
            assert 'pallas' not in routed
            q2 = jnp.zeros((16, 8, 256, 16))  # training shape
            att.attention(q2, q2, q2, None, backend='auto')
            assert routed.get('pallas')
    finally:
        fa.flash_attention = orig
