"""DPM-Solver++(2M) sampler tests (deterministic + SDE variants).

The reference repo ships only DDPM/DDIM
(/root/reference/music_spectrogram_diffusion/models/diffusion/diffusion_utils.py:
382-476); the multistep samplers are an extension, validated here against
analytic ground truth: a Gaussian data distribution, for which the optimal
denoiser E[x0 | z_t] is closed-form, so the probability-flow ODE solution
and the terminal sample distribution are both known.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.ops import diffusion as d

DATA_STD = 0.5


def _cfg(name, num_steps, guidance_weight=1.0):
  return d.DiffusionConfig(
      model_output="x0",
      guidance=d.GuidanceConfig(eval_condition_weight=guidance_weight),
      sampler=d.SamplerConfig(name=name, num_steps=num_steps, clip_x0=False))


def _gaussian_denoise(z, time, include_conditioning):
  """Optimal x0 prediction for x0 ~ N(0, DATA_STD^2): posterior mean."""
  logsnr = d.bcast_left(d.logsnr_at(time, d.Schedule(name="cosine")), z.shape)
  a2 = jax.nn.sigmoid(logsnr)
  s2 = jax.nn.sigmoid(-logsnr)
  return jnp.sqrt(a2) * DATA_STD**2 * z / (a2 * DATA_STD**2 + s2)


def test_first_order_det_step_equals_ddim():
  """With no history (first step), deterministic DPM++ IS the DDIM update."""
  rng = np.random.RandomState(0)
  z_t = jnp.asarray(rng.randn(3, 4, 2).astype(np.float32))
  pred_x0 = jnp.asarray(rng.randn(3, 4, 2).astype(np.float32) * 0.5)
  logsnr_t = jnp.asarray([-1.3, 0.2, 2.0])
  logsnr_s = jnp.asarray([0.7, 1.5, 3.1])
  pred_eps = d.eps_from_x0(z_t, pred_x0, logsnr_t)

  i = jnp.asarray(7)  # first step of an 8-step sampler, i != 0
  ddim = d.ddim_update(i, logsnr_s, pred_x0, pred_eps)
  dpm = d.dpm_update(
      i, None, logsnr_s, logsnr_t, logsnr_t, pred_x0,
      jnp.zeros_like(pred_x0), z_t, num_steps=8, stochastic=False)
  np.testing.assert_allclose(np.asarray(dpm), np.asarray(ddim),
                             rtol=1e-5, atol=1e-6)


def test_dpm_is_second_order_accurate():
  """dpm++ at n steps lands far closer to the ODE solution than ddim at n.

  Ground truth: ddim at 2048 steps (both solve the same probability-flow
  ODE from the same initial noise). Measured ratios are 0.02-0.16 over
  n in {16, 32, 64}; assert < 0.5 with headroom for platform jitter.
  """
  key = jax.random.PRNGKey(0)
  shape = (8, 2, 2)
  ref = d.sample(key, shape, _cfg("ddim", 2048), denoise_fn=_gaussian_denoise)
  for n in (16, 32):
    e_ddim = float(jnp.max(jnp.abs(
        d.sample(key, shape, _cfg("ddim", n),
                 denoise_fn=_gaussian_denoise) - ref)))
    e_dpm = float(jnp.max(jnp.abs(
        d.sample(key, shape, _cfg("dpm++", n),
                 denoise_fn=_gaussian_denoise) - ref)))
    assert e_dpm < 0.5 * e_ddim, (n, e_dpm, e_ddim)
  # And in absolute terms the 16-step solve is already tight.
  e16 = float(jnp.max(jnp.abs(
      d.sample(key, shape, _cfg("dpm++", 16),
               denoise_fn=_gaussian_denoise) - ref)))
  assert e16 < 0.02, e16


def test_sde_dpm_matches_data_distribution():
  """The SDE sampler's terminal samples are the data law N(0, DATA_STD^2)."""
  shape = (4096, 1, 1)
  x = d.sample(jax.random.PRNGKey(1), shape, _cfg("sde-dpm++", 64),
               denoise_fn=_gaussian_denoise)
  assert abs(float(x.mean())) < 0.05
  np.testing.assert_allclose(float(x.std()), DATA_STD, rtol=0.05)


def test_sde_dpm_seeded_and_batched_key_independence():
  """Same key -> same output; per-example keys -> batch row == solo run."""
  cfg = _cfg("sde-dpm++", 12, guidance_weight=2.0)
  shape = (3, 4, 2)

  def denoise(z, time, include_conditioning):
    scale = 0.9 if include_conditioning else 0.45
    return scale * z * 0.3

  a = d.sample(jax.random.PRNGKey(5), shape, cfg, denoise_fn=denoise)
  b = d.sample(jax.random.PRNGKey(5), shape, cfg, denoise_fn=denoise)
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  keys = jax.random.split(jax.random.PRNGKey(9), shape[0])
  batched = d.sample(keys, shape, cfg, denoise_fn=denoise)
  solo = d.sample(keys[1:2], (1,) + shape[1:], cfg, denoise_fn=denoise)
  np.testing.assert_allclose(np.asarray(batched[1:2]), np.asarray(solo),
                             rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["dpm++", "sde-dpm++"])
def test_sampler_under_jit_and_guidance(name):
  """Multistep samplers compile under jit with the fused-CFG pair path."""
  cfg = _cfg(name, 8, guidance_weight=5.0)

  def pair_fn(z, time):
    return 0.3 * z + 0.05, 0.15 * z + 0.05

  fn = jax.jit(lambda key: d.sample(key, (2, 8, 4), cfg,
                                    denoise_pair_fn=pair_fn))
  out = fn(jax.random.PRNGKey(0))
  assert out.shape == (2, 8, 4)
  assert bool(jnp.all(jnp.isfinite(out)))
