"""Guidance-interval tests (CFG restricted to a noise-time window).

Extension beyond the reference (which always guides: reference
diffusion_utils.py eval_scan); semantics follow Kynkaanniemi et al. 2024.
Pinned here: full interval == no interval, empty interval == conditional-
only sampling, partial interval == a time-gated reference implementation,
and the end-to-end model path (where the lax.cond branches run batch-2B
vs batch-B decoder forwards).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.ops import diffusion as d

from test_network import make_batch, make_model


def _cfg(name, num_steps, weight=4.0, interval=None):
  return d.DiffusionConfig(
      model_output="x0",
      guidance=d.GuidanceConfig(eval_condition_weight=weight,
                                interval=interval),
      sampler=d.SamplerConfig(name=name, num_steps=num_steps,
                              clip_x0=False))


def _pair_fn(z, time):
  t = d.bcast_left(time, z.shape)
  cond = 0.4 * z + 0.1 * t
  uncond = 0.15 * z - 0.05 * t
  return cond, uncond


def _cond_fn(z, time):
  return _pair_fn(z, time)[0]


@pytest.mark.parametrize("name", ["ddpm", "ddim", "dpm++", "sde-dpm++"])
def test_full_interval_equals_none(name):
  """interval=(0,1) guides every step -> identical to interval=None."""
  key = jax.random.PRNGKey(0)
  shape = (2, 6, 4)
  base = d.sample(key, shape, _cfg(name, 8), denoise_pair_fn=_pair_fn)
  gated = d.sample(key, shape, _cfg(name, 8, interval=(0.0, 1.0)),
                   denoise_pair_fn=_pair_fn, denoise_cond_fn=_cond_fn)
  np.testing.assert_array_equal(np.asarray(base), np.asarray(gated))


def test_empty_interval_equals_cond_only():
  """A never-true interval samples with the conditional prediction alone."""
  key = jax.random.PRNGKey(1)
  shape = (2, 6, 4)

  def cond_as_pair(z, time):
    c = _cond_fn(z, time)
    return c, c

  want = d.sample(key, shape, _cfg("ddpm", 8),
                  denoise_pair_fn=cond_as_pair)
  got = d.sample(key, shape, _cfg("ddpm", 8, interval=(1.5, 2.0)),
                 denoise_pair_fn=_pair_fn, denoise_cond_fn=_cond_fn)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("name", ["ddpm", "dpm++"])
@pytest.mark.parametrize("batch", [2, 4])
def test_partial_interval_matches_time_gated_reference(name, batch):
  """interval=(lo,hi) == an always-paired sampler whose uncond output is
  replaced by cond outside the window (same math, no compute saving).

  batch=2 exercises the gated-mix strategy (below CHEAP_BRANCH_MIN_BATCH),
  batch=4 the scan-split strategy with real single-forward segments."""
  key = jax.random.PRNGKey(2)
  shape = (batch, 6, 4)
  lo, hi = 0.3, 0.8

  def gated_pair(z, time):
    cond, uncond = _pair_fn(z, time)
    inside = d.bcast_left(
        jnp.logical_and(time >= lo, time <= hi), z.shape)
    return cond, jnp.where(inside, uncond, cond)

  want = d.sample(key, shape, _cfg(name, 10),
                  denoise_pair_fn=gated_pair)
  got = d.sample(key, shape, _cfg(name, 10, interval=(lo, hi)),
                 denoise_pair_fn=_pair_fn, denoise_cond_fn=_cond_fn)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-6, atol=1e-7)


def test_interval_under_jit():
  cfg = _cfg("sde-dpm++", 8, interval=(0.2, 0.9))
  fn = jax.jit(lambda k: d.sample(k, (2, 8, 4), cfg,
                                  denoise_pair_fn=_pair_fn,
                                  denoise_cond_fn=_cond_fn))
  out = fn(jax.random.PRNGKey(3))
  assert out.shape == (2, 8, 4)
  assert bool(jnp.all(jnp.isfinite(out)))


def test_model_predict_interval_full_equals_none():
  """End-to-end ContextDiffusionModel.predict: the lax.cond branches mix
  batch-2B (fused CFG) and batch-B (cond-only) decoder forwards; a full
  window must reproduce the ungated fast path exactly."""
  m = make_model()
  batch = make_batch()
  variables = m.init_variables(
      jax.random.PRNGKey(0),
      {k: v.shape for k, v in batch.items()},
      {k: v.dtype for k, v in batch.items()})
  params = variables["params"]

  base, _ = m.predict(params, batch, jax.random.PRNGKey(7))

  def with_interval(interval):
    dcfg = dataclasses.replace(
        m.diffusion_config,
        guidance=dataclasses.replace(
            m.diffusion_config.guidance, interval=interval))
    return type(m)(m.module, dcfg, m.audio_codec)

  gated, _ = with_interval((0.0, 1.0)).predict(
      params, batch, jax.random.PRNGKey(7))
  np.testing.assert_allclose(np.asarray(gated), np.asarray(base),
                             rtol=1e-5, atol=1e-6)

  # And a partial window still produces finite, different output.
  part, _ = jax.jit(with_interval((0.2, 0.8)).predict)(
      params, batch, jax.random.PRNGKey(7))
  assert bool(jnp.all(jnp.isfinite(part)))
  assert not np.allclose(np.asarray(part), np.asarray(base))


def test_config_json_roundtrip_interval():
  exp = cfg_lib.preset("context_tiny")
  exp = dataclasses.replace(
      exp, diffusion=dataclasses.replace(
          exp.diffusion, guidance=dataclasses.replace(
              exp.diffusion.guidance, interval=(0.1, 0.75))))
  back = cfg_lib.ExperimentConfig.from_json(exp.to_json())
  assert back.diffusion.guidance.interval == (0.1, 0.75)
  assert back == exp
