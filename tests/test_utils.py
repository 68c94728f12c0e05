"""Unit tests for L1 utilities (masks, pooling, interpolation, projection).

Property-tested against the reference semantics (SURVEY.md §7 step 1) —
torch is used only as an oracle for interpolate parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2_tts_tpu.utils import (
    lens_to_mask,
    mask_from_start_end_indices,
    mask_from_frac_lengths,
    maybe_masked_mean,
    pad_to_length,
    project,
    interpolate_1d,
    masked_interpolate_1d,
)


def test_lens_to_mask():
    lens = jnp.array([2, 5, 0])
    mask = lens_to_mask(lens, length=6)
    assert mask.shape == (3, 6)
    np.testing.assert_array_equal(
        np.asarray(mask),
        np.array([
            [1, 1, 0, 0, 0, 0],
            [1, 1, 1, 1, 1, 0],
            [0, 0, 0, 0, 0, 0],
        ], dtype=bool),
    )
    # default length = max len (eager only)
    assert lens_to_mask(lens).shape == (3, 5)

    # under jit the default is data-dependent: explicit, actionable error
    with pytest.raises(ValueError, match='static `length='):
        jax.jit(lens_to_mask)(lens)


def test_mask_from_start_end_indices():
    start = jnp.array([1, 0])
    end = jnp.array([3, 2])
    mask = mask_from_start_end_indices(start, end, length=4)
    np.testing.assert_array_equal(
        np.asarray(mask),
        np.array([[0, 1, 1, 0], [1, 1, 0, 0]], dtype=bool),
    )


def test_mask_from_frac_lengths():
    key = jax.random.key(0)
    seq_len = jnp.array([10, 7, 4])
    frac = jnp.array([0.7, 1.0, 0.5])
    mask = mask_from_frac_lengths(key, seq_len, frac, max_length=12)
    assert mask.shape == (3, 12)
    counts = np.asarray(mask.sum(axis=-1))
    # span length is floor(frac * len)
    np.testing.assert_array_equal(counts, [7, 7, 2])
    # span must lie within the valid region
    valid = np.asarray(lens_to_mask(seq_len, 12))
    assert (np.asarray(mask) <= valid).all()
    # jit-compatible with static max_length
    jitted = jax.jit(mask_from_frac_lengths, static_argnums=3)
    np.testing.assert_array_equal(np.asarray(jitted(key, seq_len, frac, 12)), np.asarray(mask))


def test_maybe_masked_mean():
    t = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    mask = jnp.array([[True, True, False], [True, False, False]])
    out = maybe_masked_mean(t, mask)
    expected0 = np.asarray(t)[0, :2].mean(axis=0)
    expected1 = np.asarray(t)[1, :1].mean(axis=0)
    np.testing.assert_allclose(np.asarray(out[0]), expected0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), expected1, rtol=1e-6)
    # no mask = plain mean
    np.testing.assert_allclose(np.asarray(maybe_masked_mean(t)), np.asarray(t.mean(axis=1)), rtol=1e-6)
    # all-False mask: denominator clamped to 1, result zeros
    zero_mask = jnp.zeros((2, 3), dtype=bool)
    np.testing.assert_array_equal(np.asarray(maybe_masked_mean(t, zero_mask)), np.zeros((2, 4)))


def test_pad_to_length():
    t = jnp.ones((2, 3))
    assert pad_to_length(t, 5).shape == (2, 5)
    assert pad_to_length(t, 2).shape == (2, 2)
    padded = pad_to_length(t, 5, value=-1)
    np.testing.assert_array_equal(np.asarray(padded[:, 3:]), -np.ones((2, 2)))


def test_project():
    key = jax.random.key(1)
    x = jax.random.normal(key, (2, 5, 3))
    y = jax.random.normal(jax.random.key(2), (2, 5, 3))
    parallel, orthogonal = project(x, y)
    # parallel + orthogonal reconstructs x
    np.testing.assert_allclose(np.asarray(parallel + orthogonal), np.asarray(x), atol=1e-5)
    # orthogonal ⟂ y (flattened per batch)
    dots = (orthogonal.reshape(2, -1) * y.reshape(2, -1)).sum(-1)
    np.testing.assert_allclose(np.asarray(dots), np.zeros(2), atol=1e-4)


def _torch_interpolate_1d(x_np, length):
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(x_np)[None].permute(0, 2, 1)[..., None]  # 1 d n 1
    out = F.interpolate(t, (length, 1), mode='bilinear')
    return out[..., 0].permute(0, 2, 1)[0].numpy()


@pytest.mark.parametrize('n,length', [(7, 20), (20, 7), (5, 5), (1, 8)])
def test_interpolate_1d_matches_torch(n, length):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 4)).astype(np.float32)
    ours = np.asarray(interpolate_1d(jnp.asarray(x), length))
    theirs = _torch_interpolate_1d(x, length)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_masked_interpolate_1d_matches_per_sample():
    rng = np.random.default_rng(1)
    b, n_src, d, out_len = 3, 12, 4, 16
    x = rng.standard_normal((b, n_src, d)).astype(np.float32)
    src_lens = np.array([5, 12, 1])
    tgt_lens = np.array([16, 9, 4])

    out = np.asarray(masked_interpolate_1d(
        jnp.asarray(x), jnp.asarray(src_lens), jnp.asarray(tgt_lens), out_len))

    for i in range(b):
        expected = _torch_interpolate_1d(x[i, :src_lens[i]], int(tgt_lens[i]))
        np.testing.assert_allclose(out[i, :tgt_lens[i]], expected, atol=1e-5)


def test_multi_device_visible():
    assert len(jax.devices()) == 8
