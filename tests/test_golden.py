"""Golden-value regression tests.

Fixed PRNG keys on CPU fp32: these values pin the math of every
numerically-sensitive component. A deliberate semantic change must update
them (with justification); an accidental one fails loudly. (SURVEY.md §4.)

Provenance: the goldens are REGRESSION pins only — CORRECTNESS of the
underlying math is established by independent oracles, not by these
numbers: mel vs torch.stft (test_mel.py), ADOPT / EMA ramp / HL-Gauss /
hyper-connections vs inline torch mirrors of the published algorithms
(test_oracles.py), Vocos vs a torch mirror + the real checkpoint schema
(test_vocoder.py), ODE solvers vs closed-form solutions (test_models.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

def _mel_fingerprint():
    from e2_tts_tpu.ops.mel import MelSpec
    wave = jnp.sin(jnp.linspace(0, 200 * jnp.pi, 4096))[None, :]
    mel = MelSpec()(wave)
    return float(mel.mean()), float(mel.max())


def test_mel_golden():
    mean, mx = _mel_fingerprint()
    # 440-ish Hz tone: deterministic constants (no PRNG involved)
    np.testing.assert_allclose(mean, -5.384503, atol=1e-3)
    np.testing.assert_allclose(mx, 5.703155, atol=1e-3)


# NB: model-loss pins encode the param-init draw order. Re-pinned when
# FeedForward stopped constructing nnx.Dropout (its rng fork at init shifted
# every subsequent param draw); semantics unchanged (eval, dropout=0).
# Re-pinned again for the x-transformers gate_value_heads init (zero weight,
# bias 10: gates start open — e2tts 3.120961 -> 3.120085, duration
# 454.513367 -> 455.073242).
# Re-pinned for the fused (dim, 3, inner) qkv parameter (one lecun-normal
# draw replaces three; same per-column distribution, different bits —
# e2tts 3.120085 -> 3.099416, duration 455.073242 -> 460.112396).
def test_e2tts_loss_golden():
    from e2_tts_tpu.models.e2tts import E2TTS
    model = E2TTS(
        transformer=dict(dim=64, depth=2, heads=2, dim_head=16, ff_mult=2,
                         num_registers=2, max_seq_len=64, kernel_size=7,
                         dropout=0.0, num_residual_streams=2,
                         attn_backend='xla'),
        rngs=nnx.Rngs(0))
    model.eval()
    mel = jax.random.normal(jax.random.key(11), (2, 24, 100))
    loss = model(mel, text=['golden', 'values'], key=jax.random.key(12),
                 drop_text_cond=False).loss
    np.testing.assert_allclose(float(loss), 3.099416, atol=2e-3)


def test_duration_loss_golden():
    from e2_tts_tpu.models.duration import DurationPredictor
    dp = DurationPredictor(
        transformer=dict(dim=64, depth=2, heads=2, dim_head=16, ff_mult=2,
                         num_registers=2, max_seq_len=64, kernel_size=7,
                         dropout=0.0, num_residual_streams=2,
                         attn_backend='xla'),
        rngs=nnx.Rngs(0))
    dp.eval()
    mel = jax.random.normal(jax.random.key(21), (2, 24, 100))
    loss = dp(mel, text=['golden', 'values'], lens=jnp.array([20, 24]),
              key=jax.random.key(22))
    np.testing.assert_allclose(float(loss), 460.112396, rtol=1e-4)


def test_rotary_golden():
    from e2_tts_tpu.ops.rotary import rotary_freqs, apply_rotary
    freqs = rotary_freqs(8, 16)
    t = jnp.ones((1, 1, 8, 16))
    out = apply_rotary(t, freqs)
    np.testing.assert_allclose(float(out.sum()), 102.860405, rtol=1e-5)


def test_adopt_golden():
    from e2_tts_tpu.training.adopt import adopt
    import optax
    tx = adopt(0.1)
    params = jnp.array([1.0, -2.0, 3.0])
    state = tx.init(params)
    for i in range(5):
        g = params * 0.5 + i * 0.1
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params), [0.914592, -1.939841, 2.923391], rtol=1e-4)
