"""Output heads for the AR model: distribution -> loss / sample.

Equivalent to the reference
(/root/reference/music_spectrogram_diffusion/models/autoregressive/
output_functions.py) but without the tensorflow_probability dependency —
the Gaussian-mixture log-prob and sampling are a few lines of jnp.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class OutputFunction(nn.Module):
  """Base: maps raw network outputs to losses and samples."""

  @property
  def expected_num_dims(self) -> int:
    raise NotImplementedError

  def get_loss(self, outputs: Array, targets: Array) -> Array:
    raise NotImplementedError

  def get_sample(self, outputs: Array, seed: jax.Array,
                 sample_shape=()) -> Array:
    raise NotImplementedError


class GaussianMixture(OutputFunction):
  """Mixture of diagonal Gaussians over each output frame.

  Network output layout per frame:
    [n_components mixture logits,
     n_components * dims mu,
     n_components * dims raw sigma] (sigma squashed to [min, max]).
  """
  n_components: int = 10
  dims_per_component: int = 128
  min_sigma: float = 0.1
  max_sigma: float = 1.0

  @property
  def expected_num_dims(self) -> int:
    return self.n_components + 2 * self.n_components * self.dims_per_component

  def _unpack(self, outputs: Array):
    n_dims = outputs.shape[-1]
    if n_dims != self.expected_num_dims:
      raise ValueError(
          f"GaussianMixture expects {self.expected_num_dims} dims, got "
          f"{n_dims} (shape {outputs.shape})")
    logits = outputs[..., :self.n_components]
    rest = outputs[..., self.n_components:]
    half = rest.shape[-1] // 2
    mu = rest[..., :half]
    sigma_raw = rest[..., half:]
    comp_shape = mu.shape[:-1] + (self.n_components,
                                  self.dims_per_component)
    mu = jnp.reshape(mu, comp_shape)
    sigma = jnp.reshape(sigma_raw, comp_shape)
    sigma = jax.nn.sigmoid(sigma)
    sigma = (self.max_sigma - self.min_sigma) * sigma + self.min_sigma
    return logits, mu, sigma

  def get_loss(self, outputs: Array, targets: Array) -> Array:
    """-log p(target) under the mixture, per frame."""
    logits, mu, sigma = self._unpack(outputs)
    log_mix = jax.nn.log_softmax(logits, axis=-1)
    x = targets[..., None, :]  # broadcast over components
    log_norm = -0.5 * (jnp.square((x - mu) / sigma)
                       + 2.0 * jnp.log(sigma)
                       + np.log(2.0 * np.pi))
    comp_logprob = jnp.sum(log_norm, axis=-1)  # [..., n_components]
    return -jax.nn.logsumexp(log_mix + comp_logprob, axis=-1)

  def get_sample(self, outputs: Array, seed: jax.Array,
                 sample_shape=()) -> Array:
    del sample_shape
    logits, mu, sigma = self._unpack(outputs)
    k_comp, k_noise = jax.random.split(seed)
    comp = jax.random.categorical(k_comp, logits, axis=-1)
    one_hot = jax.nn.one_hot(comp, self.n_components)[..., None]
    mu_sel = jnp.sum(mu * one_hot, axis=-2)
    sigma_sel = jnp.sum(sigma * one_hot, axis=-2)
    noise = jax.random.normal(k_noise, mu_sel.shape)
    return mu_sel + sigma_sel * noise


class Deterministic(OutputFunction):
  """Point-estimate head: per-frame mean MSE; optional sampling dither."""
  sampling_dither_amount: float = 0.0

  @property
  def expected_num_dims(self) -> int:
    return 0  # natural output size

  def get_loss(self, outputs: Array, targets: Array) -> Array:
    # Mean across the frame, sum over batch/time happens in the model —
    # keeps per-frame contributions equal under Adafactor.
    return jnp.mean(jnp.square(outputs - targets), axis=-1)

  def get_sample(self, outputs: Array, seed: jax.Array,
                 sample_shape=()) -> Array:
    del sample_shape
    if self.sampling_dither_amount > 0:
      outputs = outputs + jax.random.normal(
          seed, outputs.shape) * self.sampling_dither_amount
    return outputs
