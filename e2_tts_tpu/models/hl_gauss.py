"""HL-Gauss regression/classification head (arXiv 2403.03950).

Capability imported by the reference from `hl-gauss-pytorch`
(e2_tts.py:50, 1035-1040): the duration predictor's output head is either a
plain regression (Linear -> activation, MSE loss; the default, with Softplus)
or a histogram-loss classification over Gaussian-smeared two-hot targets.
One call does both prediction (no target) and loss (with target).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from e2_tts_tpu.utils.helpers import exists, default


class HLGaussLoss:
    """Histogram loss with Gaussian-smeared targets over [min_value, max_value]."""

    def __init__(self, min_value: float, max_value: float, num_bins: int,
                 sigma: float | None = None):
        self.min_value = float(min_value)
        self.max_value = float(max_value)
        self.num_bins = num_bins
        # default smoothing ratio: sigma/bin_width = 2, per the paper's advice
        bin_width = (self.max_value - self.min_value) / num_bins
        self.sigma = default(sigma, 2.0 * bin_width)
        self.support = jnp.linspace(self.min_value, self.max_value, num_bins + 1)
        self.centers = (self.support[:-1] + self.support[1:]) / 2

    def target_probs(self, target: jax.Array) -> jax.Array:
        """(b,) -> (b, num_bins) Gaussian-smeared two-hot distribution."""
        z = (self.support[None, :] - target[:, None]) / (jnp.sqrt(2.0) * self.sigma)
        cdf = 0.5 * (1.0 + jax.lax.erf(z))
        probs = cdf[:, 1:] - cdf[:, :-1]
        total = jnp.clip(cdf[:, -1] - cdf[:, 0], min=1e-12)
        return probs / total[:, None]

    def loss(self, logits: jax.Array, target: jax.Array) -> jax.Array:
        probs = self.target_probs(target)
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -(probs * logprobs).sum(-1).mean()

    def pred(self, logits: jax.Array) -> jax.Array:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return (probs * self.centers[None, :]).sum(-1)


class HLGaussLayer(nnx.Module):
    """Reference-parity head (hl-gauss-pytorch HLGaussLayer):

    - regression mode (default): Linear(dim, 1, no bias) -> activation;
      loss = MSE vs target.
    - classification mode (``hl_gauss_loss`` dict given, ``use_regression``
      False): Linear(dim, num_bins); loss = smeared cross-entropy; prediction
      = expectation over bin centers.
    """

    def __init__(self, dim: int, hl_gauss_loss: dict | None = None,
                 use_regression: bool = True, regress_activation=jax.nn.softplus, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        use_classification = exists(hl_gauss_loss) and not use_regression
        self.use_regression = not use_classification

        if self.use_regression:
            self.to_pred = nnx.Linear(dim, 1, use_bias=False, dtype=dtype,
                                      param_dtype=param_dtype, rngs=rngs)
            self.activation = regress_activation
            self.hl_gauss = None
        else:
            self.hl_gauss = HLGaussLoss(**hl_gauss_loss)
            self.to_logits = nnx.Linear(dim, self.hl_gauss.num_bins, dtype=dtype,
                                        param_dtype=param_dtype, rngs=rngs)

    def __call__(self, embed: jax.Array, target: jax.Array | None = None):
        if self.use_regression:
            pred = self.activation(self.to_pred(embed)[..., 0].astype(jnp.float32))
            if not exists(target):
                return pred
            return jnp.mean((pred - target.astype(jnp.float32)) ** 2)

        logits = self.to_logits(embed)
        if not exists(target):
            return self.hl_gauss.pred(logits)
        return self.hl_gauss.loss(logits, target)
