"""Golden-value tests pinning ops/diffusion to the reference math."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.ops import diffusion as d

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "diffusion.npz")


@pytest.fixture(scope="module")
def g():
  assert os.path.exists(GOLDEN_PATH), (
      "goldens missing — run tests/make_goldens.py")
  return dict(np.load(GOLDEN_PATH))


def test_logsnr_cosine(g):
  got = d.logsnr_at(jnp.asarray(g["t"]), d.Schedule(name="cosine"))
  np.testing.assert_allclose(got, g["logsnr_cosine"], rtol=1e-5, atol=1e-5)
  # Endpoints pinned to the clip range.
  assert abs(float(got[0]) - 20.0) < 5e-3
  assert abs(float(got[-1]) + 20.0) < 5e-3


def test_logsnr_linear(g):
  sched = d.Schedule(name="linear", start=1e-4, stop=0.02, num_steps=1000)
  got = d.logsnr_at(jnp.asarray(g["t"]), sched)
  np.testing.assert_allclose(got, g["logsnr_linear"], rtol=1e-5, atol=1e-5)


def test_forward_process(g):
  fwd = d.forward_process(jnp.asarray(g["x0"]),
                          jnp.full(g["x0"].shape, -1.3))
  np.testing.assert_allclose(fwd["mean"], g["fwd_mean"], rtol=1e-6)
  np.testing.assert_allclose(fwd["std"], g["fwd_std"], rtol=1e-6)


@pytest.mark.parametrize("lv,key", [("small", "small"), ("large", "large"),
                                    ("medium:0.3", "medium_03")])
def test_reverse_process(g, lv, key):
  rev = d.reverse_process(
      jnp.asarray(g["x0"]), jnp.asarray(g["z_t"]),
      jnp.full(g["x0"].shape, 0.7), jnp.full(g["x0"].shape, -1.3), lv)
  np.testing.assert_allclose(rev["mean"], g[f"rev_mean_{key}"], rtol=1e-5)
  np.testing.assert_allclose(rev["std"], g[f"rev_std_{key}"], rtol=1e-5)


def test_parameterisation_conversions(g):
  z, x0 = jnp.asarray(g["z_t"]), jnp.asarray(g["x0"])
  logsnr = jnp.asarray(g["logsnr_vec"])
  np.testing.assert_allclose(
      d.eps_from_x0(z, x0, logsnr), g["eps_from_x0"], rtol=1e-5)
  np.testing.assert_allclose(
      d.x0_from_eps(z, x0, logsnr), g["x0_from_eps"], rtol=1e-5)
  np.testing.assert_allclose(
      d.x0_from_v(z, x0, logsnr), g["x0_from_v"], rtol=1e-5)


def test_conversion_roundtrip():
  rng = np.random.RandomState(0)
  z = jnp.asarray(rng.randn(2, 4, 3).astype(np.float32))
  x0 = jnp.asarray(rng.randn(2, 4, 3).astype(np.float32))
  logsnr = jnp.asarray([0.5, -1.0])
  eps = d.eps_from_x0(z, x0, logsnr)
  np.testing.assert_allclose(d.x0_from_eps(z, eps, logsnr), x0,
                             rtol=1e-4, atol=1e-5)


def test_training_input_rng_parity(g):
  cfg = d.DiffusionConfig()
  z, eps, time, cond = d.training_input(
      jax.random.PRNGKey(7), jnp.asarray(g["x0"]), cfg)
  np.testing.assert_allclose(z, g["train_z"], rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(eps, g["train_eps"], rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(time, g["train_time"], rtol=1e-6)
  np.testing.assert_array_equal(np.asarray(cond), g["train_cond"])


@pytest.mark.parametrize("loss_type",
                         ["eps", "x0", "max_x0_eps", "x0_and_eps"])
def test_training_loss(g, loss_type):
  cfg = d.DiffusionConfig(loss_type=loss_type)
  loss = d.training_loss(
      jnp.asarray(g["x0"]), jnp.asarray(g["x0"] * 0.5 + 0.1),
      jnp.asarray(g["z_t"]), jnp.asarray(g["time2"]),
      jnp.asarray(g["model_output"]), cfg)
  np.testing.assert_allclose(loss, g[f"loss_{loss_type}"],
                             rtol=1e-5, atol=1e-6)


def _toy_cfg(name):
  return d.DiffusionConfig(
      sampler=d.SamplerConfig(
          name=name, schedule=d.Schedule(name="cosine"), num_steps=8))


def _toy_denoise(z, time, include_conditioning):
  scale = 0.9 if include_conditioning else 0.45
  return scale * z + 0.05


@pytest.mark.parametrize("name", ["ddpm", "ddim"])
def test_sampler_matches_reference(g, name):
  got = d.sample(jax.random.PRNGKey(3), (2, 8, 4), _toy_cfg(name),
                 denoise_fn=_toy_denoise)
  np.testing.assert_allclose(got, g[f"sample_{name}"], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["ddpm", "ddim"])
def test_fused_cfg_matches_two_pass(g, name):
  """The batched cond/uncond path must equal two sequential forwards."""
  def pair_fn(z, time):
    # One "batched forward": stack along batch, single evaluation.
    z2 = jnp.concatenate([z, z], axis=0)
    flag = jnp.concatenate(
        [jnp.ones(z.shape[0]), jnp.zeros(z.shape[0])])
    scale = jnp.where(d.bcast_left(flag, z2.shape) > 0, 0.9, 0.45)
    out = scale * z2 + 0.05
    return out[:z.shape[0]], out[z.shape[0]:]

  got = d.sample(jax.random.PRNGKey(3), (2, 8, 4), _toy_cfg(name),
                 denoise_pair_fn=pair_fn)
  np.testing.assert_allclose(got, g[f"sample_{name}"], rtol=1e-4, atol=1e-5)


def test_timing_embedding(g):
  got = d.timing_embedding(jnp.asarray(g["timing_pos"]), 16,
                           max_timescale=2.0e4)
  np.testing.assert_allclose(got, g["timing"], rtol=1e-5, atol=1e-6)


def test_sample_under_jit():
  fn = jax.jit(lambda key: d.sample(
      key, (1, 8, 4), _toy_cfg("ddpm"), denoise_fn=_toy_denoise))
  out = fn(jax.random.PRNGKey(0))
  assert out.shape == (1, 8, 4)
  assert bool(jnp.all(jnp.isfinite(out)))
