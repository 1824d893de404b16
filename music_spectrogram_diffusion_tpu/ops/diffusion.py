"""Diffusion process math: schedules, posteriors, samplers.

Semantics-compatible with the reference implementation
(/root/reference/music_spectrogram_diffusion/models/diffusion/diffusion_utils.py),
re-designed for TPU:

* Configs are immutable, hashable plain dataclasses so they can be closed
  over by `jax.jit` as static values (no tracing overhead, full constant
  folding of schedule constants into the compiled program).
* The reverse-process loop is a single `jax.lax.scan`, so the entire
  1000-step sampler is one XLA program resident on device.
* Classifier-free guidance supports a *fused* path: the conditional and
  unconditional branches run as one batched forward (2B batch) instead of
  two sequential module calls per step (reference: diffusion_utils.py:424-436
  does two calls). Same math, ~half the kernel launches, bigger matmuls.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

LOGSNR_MIN = -20.0
LOGSNR_MAX = 20.0


# ---------------------------------------------------------------------------
# Configs (static, hashable).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Schedule:
  """A noise schedule mapping t in [0, 1] to log-SNR.

  name: 'cosine' (closed form) or 'linear' (beta-linear, tabulated).
  start/stop/num_steps: only used by the 'linear' schedule.
  """
  name: str = "cosine"
  start: Optional[float] = None
  stop: Optional[float] = None
  num_steps: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
  """Classifier-free guidance (Ho & Salimans 2021).

  interval: optional (t_lo, t_hi). When set, the CFG mix (and its
    unconditional forward) runs only at noise times t_lo <= t <= t_hi;
    outside the window the sampler uses the conditional prediction alone
    (Kynkäänniemi et al. 2024, "Applying guidance in a limited interval").
    Steps outside the window cost ONE network forward instead of the
    fused two-row CFG forward, which matters for batched serving where
    the sampler is compute-bound. None (default) = guidance everywhere,
    matching the reference (diffusion_utils.py eval_scan).
  """
  drop_condition_prob: float = 0.1
  eval_condition_weight: float = 5.0
  interval: Optional[Tuple[float, float]] = None


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
  """Reverse-process sampler selection.

  name:
    'ddpm'      — ancestral sampling (reference default).
    'ddim'      — deterministic first-order probability-flow update.
    'dpm++'     — DPM-Solver++(2M): deterministic second-order multistep
                  in the data (x0) parameterisation (Lu et al. 2022).
    'sde-dpm++' — SDE-DPM-Solver++(2M), midpoint variant: the stochastic
                  counterpart; reduces to ancestral-style noise injection
                  with a second-order mean update.
  The multistep samplers reuse the previous step's x0 prediction, so they
  cost the same number of network evaluations per step as ddpm/ddim.
  """
  name: str = "ddpm"  # 'ddpm' | 'ddim' | 'dpm++' | 'sde-dpm++'
  schedule: Schedule = Schedule(name="cosine")
  num_steps: int = 1000
  clip_x0: bool = True
  logvar_type: str = "large"  # 'small' | 'large' | 'medium:<frac>'


MULTISTEP_SAMPLERS = ("dpm++", "sde-dpm++")

# Below this sampler batch size the fused 2B CFG forward is HBM-bandwidth-
# bound on TPU (a single-row forward costs the same wall time), so the
# guidance interval is applied as a zero-overhead gated mix inside one
# scan; at or above it, compute dominates and the interval's out-of-window
# steps run a genuine single conditional forward (scan split). Measured
# crossover on v5e: batch 2-4 (BENCH.md round 3). A platform constant,
# not a law — override with $MSD_CHEAP_BRANCH_MIN_BATCH when re-tuning
# on another TPU generation (re-measure with bench.py
# --guidance_interval across batch sizes).
CHEAP_BRANCH_MIN_BATCH = int(os.environ.get(
    "MSD_CHEAP_BRANCH_MIN_BATCH", 4))


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
  """Top-level diffusion hyperparameters (reference diffusion_utils.py:49-59)."""
  time_sampling: str = "continuous"  # 'continuous' | 'discrete'
  train_schedule: Schedule = Schedule(name="cosine")
  loss_norm: str = "l1"  # 'l1' | 'l2'
  loss_type: str = "eps"  # 'eps' | 'x0' | 'max_x0_eps' | 'x0_and_eps'
  model_output: str = "eps"  # 'eps' | 'x0' | 'x0_and_eps' | 'v'
  guidance: GuidanceConfig = GuidanceConfig()
  sampler: SamplerConfig = SamplerConfig()


# ---------------------------------------------------------------------------
# Schedules.
# ---------------------------------------------------------------------------


def _linear_schedule_table(schedule: Schedule) -> Tuple[np.ndarray, np.ndarray]:
  """Tabulated logSNR for a beta-linear schedule, computed host-side once."""
  assert schedule.num_steps and schedule.num_steps > 0
  betas = np.linspace(
      schedule.start, schedule.stop, schedule.num_steps, dtype=np.float64)
  alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
  logsnr = np.log(alphas_cumprod) - np.log1p(-alphas_cumprod)
  logsnr = np.clip(logsnr, LOGSNR_MIN, LOGSNR_MAX)
  ts = np.linspace(0.0, 1.0, schedule.num_steps)
  return ts, logsnr


def logsnr_at(t: Array, schedule: Schedule) -> Array:
  """log-SNR(t) for t in [0, 1]; clipped to [-20, 20].

  Matches reference get_logsnr_t (diffusion_utils.py:166-202): the cosine
  schedule is the shifted-arctan parameterisation of
  alpha_cumprod_t = cos(t*pi/2)^2 with endpoints pinned to the clip range.
  """
  if schedule.name == "cosine":
    b = np.arctan(np.exp(-0.5 * LOGSNR_MAX))
    a = np.arctan(np.exp(-0.5 * LOGSNR_MIN)) - b
    return -2.0 * jnp.log(jnp.tan(a * t + b))
  elif schedule.name == "linear":
    ts, table = _linear_schedule_table(schedule)
    return jnp.interp(t, ts, table)
  else:
    raise ValueError(f"Unknown schedule: {schedule.name}")


# ---------------------------------------------------------------------------
# Forward / reverse processes and parameterisation conversions.
# ---------------------------------------------------------------------------


def bcast_left(x: Array, shape: Tuple[int, ...]) -> Array:
  """Broadcast a (possibly scalar/batch) array against trailing dims."""
  assert len(shape) >= x.ndim
  return jnp.broadcast_to(x.reshape(x.shape + (1,) * (len(shape) - x.ndim)),
                          shape)


def log1mexp(x: Array) -> Array:
  """log(1 - exp(-x)) for x > 0, numerically stable on both branches."""
  return jnp.where(x > np.log(2.0), jnp.log1p(-jnp.exp(-x)),
                   jnp.log(-jnp.expm1(-x)))


def forward_process(x0: Array, logsnr: Array) -> Dict[str, Array]:
  """q(z_t | x0): mean/std/var/logvar in the logSNR parameterisation."""
  return {
      "mean": x0 * jnp.sqrt(jax.nn.sigmoid(logsnr)),
      "std": jnp.sqrt(jax.nn.sigmoid(-logsnr)),
      "var": jax.nn.sigmoid(-logsnr),
      "logvar": jax.nn.log_sigmoid(-logsnr),
  }


def reverse_process(x0: Array, z_t: Array, logsnr_s: Array, logsnr_t: Array,
                    logvar_type: str) -> Dict[str, Array]:
  """q(z_s | z_t, x0) for s < t (logsnr_s > logsnr_t), fixed variance."""
  alpha_st = jnp.sqrt((1.0 + jnp.exp(-logsnr_t)) / (1.0 + jnp.exp(-logsnr_s)))
  alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))

  r = jnp.exp(logsnr_t - logsnr_s)           # SNR(t)/SNR(s)
  one_minus_r = -jnp.expm1(logsnr_t - logsnr_s)
  log_one_minus_r = log1mexp(logsnr_s - logsnr_t)

  mean = r * alpha_st * z_t + one_minus_r * alpha_s * x0

  if logvar_type == "small":
    var = one_minus_r * jax.nn.sigmoid(-logsnr_s)
    logvar = log_one_minus_r + jax.nn.log_sigmoid(-logsnr_s)
  elif logvar_type == "large":
    var = one_minus_r * jax.nn.sigmoid(-logsnr_t)
    logvar = log_one_minus_r + jax.nn.log_sigmoid(-logsnr_t)
  elif logvar_type.startswith("medium:"):
    frac = float(logvar_type.split(":")[1])
    assert 0.0 <= frac <= 1.0
    min_logvar = log_one_minus_r + jax.nn.log_sigmoid(-logsnr_s)
    max_logvar = log_one_minus_r + jax.nn.log_sigmoid(-logsnr_t)
    logvar = frac * max_logvar + (1.0 - frac) * min_logvar
    var = jnp.exp(logvar)
  else:
    raise ValueError(f"Unknown logvar_type: {logvar_type}")

  return {"mean": mean, "std": jnp.sqrt(var), "var": var, "logvar": logvar}


def eps_from_x0(z: Array, x0: Array, logsnr: Array) -> Array:
  """eps = (z - alpha*x0) / sigma."""
  logsnr = bcast_left(logsnr, z.shape)
  return jnp.sqrt(1.0 + jnp.exp(logsnr)) * (
      z - x0 * jax.lax.rsqrt(1.0 + jnp.exp(-logsnr)))


def x0_from_eps(z: Array, eps: Array, logsnr: Array) -> Array:
  """x0 = (z - sigma*eps) / alpha."""
  logsnr = bcast_left(logsnr, z.shape)
  return jnp.sqrt(1.0 + jnp.exp(-logsnr)) * (
      z - eps * jax.lax.rsqrt(1.0 + jnp.exp(logsnr)))


def x0_from_v(z: Array, v: Array, logsnr: Array) -> Array:
  """x0 = alpha*z - sigma*v."""
  logsnr = bcast_left(logsnr, z.shape)
  alpha_t = jnp.sqrt(jax.nn.sigmoid(logsnr))
  sigma_t = jnp.sqrt(jax.nn.sigmoid(-logsnr))
  return alpha_t * z - sigma_t * v


def x0_eps_from_model_output(z: Array, time: Array, model_output: Array,
                             config: DiffusionConfig) -> Dict[str, Array]:
  """Convert the network's output to both x0 and eps parameterisations."""
  logsnr = logsnr_at(time, config.train_schedule)

  if config.model_output == "eps":
    return {"eps": model_output,
            "x0": x0_from_eps(z, model_output, logsnr)}
  elif config.model_output == "x0":
    return {"eps": eps_from_x0(z, model_output, logsnr),
            "x0": model_output}
  elif config.model_output == "x0_and_eps":
    x0_direct, eps_direct = jnp.split(model_output, 2, axis=-1)
    x0_indirect = x0_from_eps(z, eps_direct, logsnr)
    wx = bcast_left(jax.nn.sigmoid(-logsnr), z.shape)
    x0_out = wx * x0_direct + (1.0 - wx) * x0_indirect
    return {"x0": x0_out, "eps": eps_from_x0(z, x0_out, logsnr)}
  elif config.model_output == "v":
    x0_out = x0_from_v(z, model_output, logsnr)
    return {"x0": x0_out, "eps": eps_from_x0(z, x0_out, logsnr)}
  else:
    raise ValueError(f"Unknown model_output: {config.model_output}")


# ---------------------------------------------------------------------------
# Training.
# ---------------------------------------------------------------------------


def training_input(
    rng: jax.Array, x0: Array, config: DiffusionConfig
) -> Tuple[Array, Array, Array, Array]:
  """Sample (z_t, eps, time, include_conditioning) for a training step.

  RNG splitting order matches the reference
  (diffusion_utils.py:236-285: eps, t, cond) for reproducibility.
  """
  rng_eps, rng_t, rng_cond = jax.random.split(rng, 3)

  eps = jax.random.normal(rng_eps, shape=x0.shape)
  batch_size = x0.shape[0]

  if config.time_sampling == "continuous":
    time = jax.random.uniform(rng_t, (batch_size,))
  elif config.time_sampling == "discrete":
    n = config.train_schedule.num_steps
    time = jax.random.randint(rng_t, (batch_size,), 0, n)
    time = time.astype(jnp.float32) / float(n)
  else:
    raise ValueError(f"Invalid time_sampling: {config.time_sampling}")

  logsnr = logsnr_at(time, config.train_schedule)
  dist = forward_process(x0, bcast_left(logsnr, x0.shape))
  z_t = dist["mean"] + dist["std"] * eps

  include_conditioning = jax.random.bernoulli(
      rng_cond, shape=(batch_size,),
      p=1.0 - config.guidance.drop_condition_prob)

  return z_t, eps, time, include_conditioning


def training_loss(x0: Array, eps: Array, z: Array, time: Array,
                  model_output: Array, config: DiffusionConfig) -> Array:
  """Per-element diffusion loss (unreduced)."""
  outputs = x0_eps_from_model_output(z, time, model_output, config)

  def norm(a, b):
    if config.loss_norm == "l1":
      return jnp.abs(a - b)
    elif config.loss_norm == "l2":
      return jnp.square(a - b)
    raise ValueError(f"Unknown loss_norm: {config.loss_norm}")

  x0_loss = norm(outputs["x0"], x0)
  eps_loss = norm(outputs["eps"], eps)

  if config.loss_type == "x0":
    return x0_loss
  elif config.loss_type == "eps":
    return eps_loss
  elif config.loss_type == "max_x0_eps":
    return jnp.maximum(x0_loss, eps_loss)
  elif config.loss_type == "x0_and_eps":
    return eps_loss + x0_loss
  raise ValueError(f"Unknown loss_type: {config.loss_type}")


# ---------------------------------------------------------------------------
# Sampling.
# ---------------------------------------------------------------------------


def ddim_update(i: Array, logsnr_s: Array, pred_x0: Array,
                pred_eps: Array) -> Array:
  """One DDIM step: deterministic update to z_s (returns x0 at i == 0)."""
  logsnr_s = bcast_left(logsnr_s, pred_x0.shape)
  std_s = jnp.sqrt(jax.nn.sigmoid(-logsnr_s))
  alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))
  z_s = alpha_s * pred_x0 + std_s * pred_eps
  return jnp.where(i == 0, pred_x0, z_s)


def is_batched_key(rng: jax.Array) -> bool:
  """True when `rng` is a [batch] array of per-example PRNG keys."""
  if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
    return rng.ndim == 1
  return rng.ndim == 2


def _normal_from_keys(rng: jax.Array, i: Optional[Array],
                      shape: Tuple[int, ...], dtype) -> Array:
  """Draw noise from one key (whole batch) or [batch] per-example keys.

  Per-example keys make the draw for each example independent of its
  batch neighbours, so batched sampling equals one-at-a-time sampling;
  the single-key path matches the reference RNG structure exactly
  (reference diffusion_utils.py:382-395)."""
  if is_batched_key(rng):
    def draw(k):
      k = k if i is None else jax.random.fold_in(k, i)
      return jax.random.normal(k, shape=shape[1:], dtype=dtype)
    return jax.vmap(draw)(rng)
  rng = rng if i is None else jax.random.fold_in(rng, i)
  return jax.random.normal(rng, shape=shape, dtype=dtype)


def ddpm_update(i: Array, rng: jax.Array, logsnr_s: Array, logsnr_t: Array,
                pred_x0: Array, z_t: Array, logvar_type: str) -> Array:
  """One ancestral DDPM step (returns x0 at i == 0).

  RNG is folded with the step index, matching reference ddpm_step
  (diffusion_utils.py:382-395) so seeded samples are reproducible.
  """
  logsnr_s_b = bcast_left(logsnr_s, pred_x0.shape)
  logsnr_t_b = bcast_left(logsnr_t, pred_x0.shape)
  noise = _normal_from_keys(rng, i, pred_x0.shape, pred_x0.dtype)
  dist = reverse_process(pred_x0, z_t, logsnr_s_b, logsnr_t_b, logvar_type)
  return jnp.where(i == 0, pred_x0, dist["mean"] + dist["std"] * noise)


def dpm_update(i: Array, rng: Optional[jax.Array], logsnr_s: Array,
               logsnr_t: Array, logsnr_t_prev: Array, pred_x0: Array,
               prev_x0: Array, z_t: Array, *, num_steps: int,
               stochastic: bool) -> Array:
  """One DPM-Solver++(2M) step in the data parameterisation.

  Exponential-integrator update over half-logSNR lambda = logsnr/2
  (Lu et al. 2022, "DPM-Solver++"; SDE variant = the midpoint
  'sde-dpmsolver++' scheme). The second-order term extrapolates from the
  *previous* step's x0 prediction (multistep — no extra network evals):

      D    = x0_t + (x0_t - x0_prev) / (2 r),   r = h_prev / h
      det:  z_s = (sigma_s/sigma_t) z_t - alpha_s expm1(-h) D
      sde:  z_s = (sigma_s/sigma_t) e^{-h} z_t - alpha_s expm1(-2h) D
                  + sigma_s sqrt(-expm1(-2h)) xi

  First-order fallback (D = x0_t) at the first step i == num_steps-1,
  where no previous prediction exists; the deterministic first-order
  update is exactly DDIM. Returns pred_x0 at i == 0, matching
  ddpm/ddim_update.
  """
  shape = pred_x0.shape
  lam_s = bcast_left(logsnr_s, shape) * 0.5
  lam_t = bcast_left(logsnr_t, shape) * 0.5
  lam_p = bcast_left(logsnr_t_prev, shape) * 0.5
  h = lam_s - lam_t           # > 0: logSNR increases as noise is removed
  h_prev = lam_t - lam_p

  first_order = i >= num_steps - 1
  # Guard the unused branch: at the first step h_prev == 0 (t_prev is
  # clamped to t), which would otherwise put inf/nan into the where().
  r = jnp.where(first_order, 1.0, h_prev / jnp.maximum(h, 1e-12))
  coeff = jnp.where(first_order, 0.0, 1.0 / (2.0 * r))
  d = pred_x0 + coeff * (pred_x0 - prev_x0)

  logsnr_s_b = bcast_left(logsnr_s, shape)
  logsnr_t_b = bcast_left(logsnr_t, shape)
  alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s_b))
  # sigma_s / sigma_t, computed in log space for stability at the ends.
  sigma_ratio = jnp.exp(0.5 * (jax.nn.log_sigmoid(-logsnr_s_b)
                               - jax.nn.log_sigmoid(-logsnr_t_b)))

  if stochastic:
    sigma_s = jnp.sqrt(jax.nn.sigmoid(-logsnr_s_b))
    one_minus_e2h = -jnp.expm1(-2.0 * h)
    noise = _normal_from_keys(rng, i, shape, pred_x0.dtype)
    z_s = (sigma_ratio * jnp.exp(-h) * z_t + alpha_s * one_minus_e2h * d
           + sigma_s * jnp.sqrt(one_minus_e2h) * noise)
  else:
    z_s = sigma_ratio * z_t - alpha_s * jnp.expm1(-h) * d

  return jnp.where(i == 0, pred_x0, z_s)


# A denoiser: (z_t, time) -> model_output; `guided` flavours return a pair.
DenoiseFn = Callable[[Array, Array], Array]
# Fused CFG denoiser: (z_t, time) -> (cond_output, uncond_output), evaluated
# as ONE batched network forward by the caller.
DenoisePairFn = Callable[[Array, Array], Tuple[Array, Array]]
# Conditional-only denoiser: (z_t, time) -> cond_output in a single
# batch-B forward. Used for steps outside GuidanceConfig.interval.
DenoiseCondFn = Callable[[Array, Array], Array]


def _predict_x0_eps(
    z_t: Array,
    i: Array,
    *,
    config: DiffusionConfig,
    denoise_fn: Optional[DenoiseFn],
    denoise_pair_fn: Optional[DenoisePairFn],
    denoise_cond_fn: Optional[DenoiseCondFn] = None,
) -> Tuple[Array, Array, Array, Array]:
  """Network eval + guidance + clipping shared by every sampler family.

  Returns (pred_x0, pred_eps, logsnr_s, logsnr_t) at scan index i
  (t=(i+1)/N, s=i/N).
  """
  sampler = config.sampler
  num_steps = sampler.num_steps
  batch_size = z_t.shape[0]

  t = (i + 1.0).astype(jnp.float32) / num_steps
  s = i.astype(jnp.float32) / num_steps
  logsnr_t = jnp.full((batch_size,), logsnr_at(t, sampler.schedule))
  logsnr_s = jnp.full((batch_size,), logsnr_at(s, sampler.schedule))
  time = jnp.full((batch_size,), t)

  cond_wt = config.guidance.eval_condition_weight
  use_guidance = cond_wt != 1.0

  if use_guidance:
    def _pair(z, tm):
      if denoise_pair_fn is not None:
        return denoise_pair_fn(z, tm)
      return (denoise_fn(z, tm, True),  # pytype: disable=wrong-arg-count
              denoise_fn(z, tm, False))  # pytype: disable=wrong-arg-count

    interval = config.guidance.interval
    if interval is None:
      cond_out, uncond_out = _pair(z_t, time)
    else:
      # Guidance interval: outside [t_lo, t_hi] skip the unconditional
      # forward entirely. Both lax.cond branches return a (cond, uncond)
      # pair of identical shapes; the cheap branch duplicates the
      # conditional output, which the weighted mix below reduces to the
      # conditional prediction exactly (w*c + (1-w)*c == c). lax.cond
      # executes only the taken branch per step, so steps outside the
      # window run ONE batch-B forward instead of the 2B CFG forward.
      def _cond_only(z, tm):
        if denoise_cond_fn is not None:
          out = denoise_cond_fn(z, tm)
        elif denoise_fn is not None:
          out = denoise_fn(z, tm, True)  # pytype: disable=wrong-arg-count
        else:
          # No single-forward callable available: fall back to the pair
          # (correct semantics, no compute savings).
          out, _ = denoise_pair_fn(z, tm)
        return out, out

      t_lo, t_hi = float(interval[0]), float(interval[1])
      in_window = jnp.logical_and(t >= t_lo, t <= t_hi)
      cond_out, uncond_out = jax.lax.cond(in_window, _pair, _cond_only,
                                          z_t, time)
    cond = x0_eps_from_model_output(z_t, time, cond_out, config)
    uncond = x0_eps_from_model_output(z_t, time, uncond_out, config)
    pred_eps = cond_wt * cond["eps"] + (1.0 - cond_wt) * uncond["eps"]
    pred_x0 = x0_from_eps(z_t, pred_eps, logsnr_t)
  else:
    if denoise_pair_fn is not None:
      out, _ = denoise_pair_fn(z_t, time)
    else:
      out = denoise_fn(z_t, time, True)  # pytype: disable=wrong-arg-count
    outputs = x0_eps_from_model_output(z_t, time, out, config)
    pred_eps, pred_x0 = outputs["eps"], outputs["x0"]

  if sampler.clip_x0:
    pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
    pred_eps = eps_from_x0(z_t, pred_x0, logsnr_t)

  return pred_x0, pred_eps, logsnr_s, logsnr_t


def sampler_step(
    z_t: Array,
    i: Array,
    *,
    rng: jax.Array,
    config: DiffusionConfig,
    denoise_fn: Optional[DenoiseFn] = None,
    denoise_pair_fn: Optional[DenoisePairFn] = None,
    denoise_cond_fn: Optional[DenoiseCondFn] = None,
) -> Array:
  """One reverse step z_t -> z_s at scan index i (t=(i+1)/N, s=i/N)."""
  sampler = config.sampler
  pred_x0, pred_eps, logsnr_s, logsnr_t = _predict_x0_eps(
      z_t, i, config=config, denoise_fn=denoise_fn,
      denoise_pair_fn=denoise_pair_fn, denoise_cond_fn=denoise_cond_fn)

  if sampler.name == "ddim":
    return ddim_update(i, logsnr_s, pred_x0, pred_eps)
  elif sampler.name == "ddpm":
    return ddpm_update(i, rng, logsnr_s, logsnr_t, pred_x0, z_t,
                       sampler.logvar_type)
  raise ValueError(f"Unknown sampler: {sampler.name}")


def multistep_sampler_step(
    z_t: Array,
    prev_x0: Array,
    i: Array,
    *,
    rng: jax.Array,
    config: DiffusionConfig,
    denoise_fn: Optional[DenoiseFn] = None,
    denoise_pair_fn: Optional[DenoisePairFn] = None,
    denoise_cond_fn: Optional[DenoiseCondFn] = None,
) -> Tuple[Array, Array]:
  """One DPM-Solver++(2M) step; returns (z_s, pred_x0) for the next step."""
  sampler = config.sampler
  num_steps = sampler.num_steps
  batch_size = z_t.shape[0]
  pred_x0, _, logsnr_s, logsnr_t = _predict_x0_eps(
      z_t, i, config=config, denoise_fn=denoise_fn,
      denoise_pair_fn=denoise_pair_fn, denoise_cond_fn=denoise_cond_fn)

  # Noise level of the PREVIOUS network eval, clamped at t=1 so the first
  # step (which takes the first-order branch anyway) stays finite.
  t_prev = jnp.minimum((i + 2.0).astype(jnp.float32) / num_steps, 1.0)
  logsnr_t_prev = jnp.full((batch_size,), logsnr_at(t_prev, sampler.schedule))

  z_s = dpm_update(
      i, rng, logsnr_s, logsnr_t, logsnr_t_prev, pred_x0, prev_x0, z_t,
      num_steps=num_steps, stochastic=(sampler.name == "sde-dpm++"))
  return z_s, pred_x0


def sample(
    rng: jax.Array,
    target_shape: Tuple[int, ...],
    config: DiffusionConfig,
    *,
    denoise_fn: Optional[DenoiseFn] = None,
    denoise_pair_fn: Optional[DenoisePairFn] = None,
    denoise_cond_fn: Optional[DenoiseCondFn] = None,
) -> Array:
  """Full reverse diffusion as one on-device `lax.scan`.

  Args:
    rng: PRNG key; both the initial noise draw and the per-step DDPM noise
      derive from it (key structure matches reference eval_scan so seeded
      outputs are comparable). May also be a [batch] array of per-example
      keys, which makes each example's sample independent of its batch
      neighbours (batched == single).
    target_shape: [batch, frames, dims] of the sample to draw.
    config: diffusion hyperparameters.
    denoise_fn: (z, time, include_conditioning) -> model_output. Two calls
      per step under guidance (reference-compatible path).
    denoise_pair_fn: (z, time) -> (cond_output, uncond_output) in one
      batched forward (fast path). Exactly one of the two must be given.
    denoise_cond_fn: optional (z, time) -> cond_output single-forward
      callable, used for steps outside `config.guidance.interval` so they
      skip the unconditional work (ignored when interval is None).

  Returns:
    pred_x0 in [-1, 1] (network output space), float32.
  """
  assert (denoise_fn is None) != (denoise_pair_fn is None), (
      "provide exactly one of denoise_fn / denoise_pair_fn")
  # Keep sampler state in float32: bf16 state accumulates rounding error
  # over ~1000 steps and audibly degrades output (reference note at
  # diffusion_utils.py:461).
  init_z = _normal_from_keys(rng, None, target_shape, jnp.float32)

  # The guidance interval is STATIC, so it never needs a per-step
  # lax.cond (measured ~0.2 ms/step of dispatch at batch 1). Two
  # trace-time strategies, picked by batch size:
  #
  # * batch < CHEAP_BRANCH_MIN_BATCH: the 2B CFG forward is HBM-
  #   bandwidth-bound, so a single conditional forward costs the SAME
  #   as the fused pair (BENCH.md round 2/3) — skipping the uncond row
  #   buys nothing. Run ONE scan with the fused pair everywhere and
  #   gate the MIX: outside the window the uncond output is replaced by
  #   the cond output (w*c + (1-w)*c == c). Zero overhead.
  # * batch >= CHEAP_BRANCH_MIN_BATCH: compute-bound; split the reverse
  #   scan into up to three consecutive scans over contiguous index
  #   ranges — [t > hi] -> [hi >= t >= lo] -> [t < lo] — where the
  #   outside segments run the single batch-B conditional forward.
  #
  # Both strategies are numerically identical to each other and to the
  # per-step lax.cond in _predict_x0_eps (pinned by tests).
  segments = None  # list of (indices ascending, use_guidance_pair)
  interval = config.guidance.interval
  if interval is not None and config.guidance.eval_condition_weight != 1.0:
    t_lo, t_hi = float(interval[0]), float(interval[1])
    config = dataclasses.replace(
        config, guidance=dataclasses.replace(config.guidance, interval=None))
    # Capture the caller's callables before any rebinding below.
    orig_pair_fn, orig_fn = denoise_pair_fn, denoise_fn

    def _guided_pair(z, tm):
      if orig_pair_fn is not None:
        return orig_pair_fn(z, tm)
      return (orig_fn(z, tm, True),  # pytype: disable=wrong-arg-count
              orig_fn(z, tm, False))  # pytype: disable=wrong-arg-count

    if target_shape[0] < CHEAP_BRANCH_MIN_BATCH:
      def gated_pair(z, tm):
        cond_out, uncond_out = _guided_pair(z, tm)
        in_window = jnp.logical_and(tm >= t_lo, tm <= t_hi)
        return cond_out, jnp.where(
            bcast_left(in_window, uncond_out.shape), uncond_out, cond_out)

      denoise_pair_fn, denoise_fn = gated_pair, None
    else:
      n = config.sampler.num_steps
      ts = (np.arange(n) + 1.0) / n
      inside = (ts >= t_lo) & (ts <= t_hi)
      segments = []
      start = 0
      for i in range(1, n + 1):
        if i == n or inside[i] != inside[start]:
          segments.append((np.arange(start, i), bool(inside[start])))
          start = i

      def _cond_pair(z, tm):
        if denoise_cond_fn is not None:
          out = denoise_cond_fn(z, tm)
        elif orig_fn is not None:
          out = orig_fn(z, tm, True)  # pytype: disable=wrong-arg-count
        else:
          out, _ = orig_pair_fn(z, tm)
        return out, out

      def segment_pair_fn(use_pair):
        return _guided_pair if use_pair else _cond_pair

  if config.sampler.name in MULTISTEP_SAMPLERS:
    def multistep_body(pair_fn):
      def body(carry, i):
        z_t, prev_x0 = carry
        z_s, pred_x0 = multistep_sampler_step(
            z_t, prev_x0, i, rng=rng, config=config,
            denoise_fn=None if pair_fn else denoise_fn,
            denoise_pair_fn=pair_fn or denoise_pair_fn,
            denoise_cond_fn=denoise_cond_fn)
        return (z_s, pred_x0), None
      return body

    carry = (init_z, jnp.zeros_like(init_z))
    if segments is None:
      carry, _ = jax.lax.scan(
          multistep_body(None), init=carry,
          xs=jnp.arange(config.sampler.num_steps), reverse=True)
    else:
      for idx, use_pair in reversed(segments):  # highest t first
        carry, _ = jax.lax.scan(
            multistep_body(segment_pair_fn(use_pair)), init=carry,
            xs=jnp.asarray(idx), reverse=True)
    return carry[0]

  def plain_body(pair_fn):
    def body(z_t, i):
      z_s = sampler_step(
          z_t, i, rng=rng, config=config,
          denoise_fn=None if pair_fn else denoise_fn,
          denoise_pair_fn=pair_fn or denoise_pair_fn,
          denoise_cond_fn=denoise_cond_fn)
      return z_s, None
    return body

  z = init_z
  if segments is None:
    z, _ = jax.lax.scan(
        plain_body(None), init=z,
        xs=jnp.arange(config.sampler.num_steps), reverse=True)
  else:
    for idx, use_pair in reversed(segments):  # highest t first
      z, _ = jax.lax.scan(
          plain_body(segment_pair_fn(use_pair)), init=z,
          xs=jnp.asarray(idx), reverse=True)
  return z


# ---------------------------------------------------------------------------
# Time-conditioning embedding.
# ---------------------------------------------------------------------------


def timing_embedding(position: Array, num_channels: int,
                     min_timescale: float = 1.0,
                     max_timescale: float = 2.0e4) -> Array:
  """Tensor2Tensor-style sinusoidal timing signal, [batch, num_channels]."""
  assert position.ndim == 1
  assert num_channels % 2 == 0
  num_timescales = num_channels // 2
  log_increment = np.log(max_timescale / min_timescale) / (num_timescales - 1.0)
  inv_timescales = min_timescale * jnp.exp(
      jnp.arange(num_timescales, dtype=jnp.float32) * -log_increment)
  scaled = position[:, None] * inv_timescales[None, :]
  return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)
