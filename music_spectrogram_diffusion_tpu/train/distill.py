"""Progressive distillation: halve the sampler step count per round.

Salimans & Ho 2022 ("Progressive Distillation for Fast Sampling of
Diffusion Models") + guided distillation (Meng et al. 2023): a student
initialized from the teacher learns, in one forward, the x0 that makes a
single student DDIM step land where TWO teacher DDIM steps land — and
the teacher's prediction already folds in classifier-free guidance, so
the distilled student samples with NO unconditional branch (another 2x).

Each round halves num_steps: 1000 -> 500 -> ... -> 62; the reference's
headline cost (1000 steps x 2 CFG forwards per 5.12 s segment,
reference diffusion_utils.py:42-44,424-436) drops by the product.

This is the trainer scaffold: the distillation loss + round driver are
complete and tested on tiny models; production distillation needs the
published teacher weights (import via train/checkpoints.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from music_spectrogram_diffusion_tpu.ops import diffusion as dops

Array = jnp.ndarray
PyTree = Any


def _alpha_sigma(t: Array, schedule: dops.Schedule,
                 shape) -> Tuple[Array, Array]:
  logsnr = dops.bcast_left(dops.logsnr_at(t, schedule), shape)
  return (jnp.sqrt(jax.nn.sigmoid(logsnr)),
          jnp.sqrt(jax.nn.sigmoid(-logsnr)))


def two_step_teacher_target(
    denoise_x0_fn: Callable[[Array, Array], Array],
    z_t: Array,
    t: Array,
    num_student_steps: int,
    schedule: dops.Schedule,
    clip_x0: bool = True,
) -> Array:
  """x0 target such that ONE student DDIM step from (z_t, t) equals TWO
  teacher DDIM half-steps.

  Args:
    denoise_x0_fn: (z, time) -> predicted x0 with the TEACHER (guidance
      already applied).
    z_t: noisy sample at time t.
    t: [batch] times on the student grid (multiples of 1/num_student_steps).
    num_student_steps: N/2 where the teacher ran N steps.

  Returns the per-example x̃ the student should output at (z_t, t).
  """
  dt = 1.0 / num_student_steps
  t1 = t - 0.5 * dt  # teacher midpoint
  t2 = t - dt        # student target time

  alpha_t, sigma_t = _alpha_sigma(t, schedule, z_t.shape)
  alpha_1, sigma_1 = _alpha_sigma(t1, schedule, z_t.shape)
  alpha_2, sigma_2 = _alpha_sigma(t2, schedule, z_t.shape)

  def clip(x):
    return jnp.clip(x, -1.0, 1.0) if clip_x0 else x

  # Teacher DDIM half-step 1: t -> t1.
  x0_a = clip(denoise_x0_fn(z_t, t))
  eps_a = (z_t - alpha_t * x0_a) / jnp.maximum(sigma_t, 1e-12)
  z_1 = alpha_1 * x0_a + sigma_1 * eps_a
  # Teacher DDIM half-step 2: t1 -> t2.
  x0_b = clip(denoise_x0_fn(z_1, t1))
  eps_b = (z_1 - alpha_1 * x0_b) / jnp.maximum(sigma_1, 1e-12)
  z_2 = alpha_2 * x0_b + sigma_2 * eps_b

  # Solve one student DDIM step z_t -> z_2 for its implied x0:
  #   z_2 = alpha_2 x̃ + (sigma_2 / sigma_t) (z_t - alpha_t x̃)
  ratio = sigma_2 / jnp.maximum(sigma_t, 1e-12)
  denom = alpha_2 - ratio * alpha_t
  # Near t=0 the denominator vanishes; fall back to the teacher's x0.
  safe = jnp.abs(denom) > 1e-6
  x_tilde = jnp.where(
      safe, (z_2 - ratio * z_t) / jnp.where(safe, denom, 1.0), x0_b)
  return x_tilde


def make_distill_loss_fn(
    student_model: Any,
    teacher_model: Any,
    num_student_steps: int,
    guidance_weight: Optional[float] = None,
) -> Callable:
  """Build loss_fn(params, batch, rng, teacher_params) for
  train.Trainer.

  The teacher params ride as a RUNTIME ARGUMENT (Trainer's aux_params
  hook), not a closure capture: closed-over trees become literal
  constants in the jitted HLO, and a real-size teacher (~400 MB f32)
  overflows serialized-program limits (the axon remote-compile endpoint
  rejects it with HTTP 413).

  The teacher prediction folds in classifier-free guidance at
  `guidance_weight` (default: the teacher's eval_condition_weight), so
  the student learns the GUIDED denoiser and samples condition-only.
  Loss: truncated-SNR-weighted MSE in x0 space (paper's w(λ)).
  """
  dconfig = teacher_model.diffusion_config
  # Use the train schedule for all alpha/sigma conversions — it is what
  # x0_eps_from_model_output uses, and it matches the sampler schedule
  # in every reference configuration (both cosine).
  schedule = dconfig.train_schedule
  if guidance_weight is None:
    guidance_weight = dconfig.guidance.eval_condition_weight

  def loss_fn(params: PyTree, batch: Mapping[str, Array],
              rng: Optional[jax.Array],
              teacher_params: PyTree) -> Tuple[Array, Dict[str, Array]]:
    if rng is None:
      rng = jax.random.PRNGKey(0)
    targets = student_model.audio_codec.scale_features(
        batch["decoder_target_tokens"], output_range=(-1.0, 1.0),
        clip=True)
    batch_size = targets.shape[0]
    rng_t, rng_eps, rng_drop = jax.random.split(rng, 3)

    # Sample a student grid time t in {1/N, 2/N, ..., 1}.
    idx = jax.random.randint(rng_t, (batch_size,), 1,
                             num_student_steps + 1)
    t = idx.astype(jnp.float32) / num_student_steps
    alpha_t, sigma_t = _alpha_sigma(t, schedule, targets.shape)
    eps = jax.random.normal(rng_eps, targets.shape)
    z_t = alpha_t * targets + sigma_t * eps

    # Teacher x0 prediction with CFG folded in (frozen params).
    t_enc = teacher_model._encode(teacher_params, batch)
    t_kv = teacher_model.module.apply(
        {"params": teacher_params}, t_enc,
        method=teacher_model.module.precompute_cross_kv)

    def teacher_x0(z, time):
      if guidance_weight == 1.0:
        # Later rounds distill an already-guided teacher: the
        # unconditional branch would be multiplied by zero, so skip the
        # doubled forward entirely (same condition ops/diffusion.py
        # uses to pick its sampler path).
        out = teacher_model.module.apply(
            {"params": teacher_params}, t_enc, z, time,
            enable_dropout=False, cross_kv=t_kv,
            method=teacher_model.module.decode)
        c = dops.x0_eps_from_model_output(z, time, out, dconfig)
        eps_g = c["eps"]
      else:
        z2 = jnp.concatenate([z, z], axis=0)
        time2 = jnp.concatenate([time, time], axis=0)
        out = teacher_model.module.apply(
            {"params": teacher_params}, t_enc, z2, time2,
            enable_dropout=False, cross_kv=t_kv, cond_rows=z.shape[0],
            method=teacher_model.module.decode)
        cond, uncond = out[:z.shape[0]], out[z.shape[0]:]
        c = dops.x0_eps_from_model_output(z, time, cond, dconfig)
        u = dops.x0_eps_from_model_output(z, time, uncond, dconfig)
        eps_g = (guidance_weight * c["eps"]
                 + (1 - guidance_weight) * u["eps"])
      logsnr = dops.bcast_left(dops.logsnr_at(time, schedule), z.shape)
      return dops.x0_from_eps(z, eps_g, logsnr)

    x_tilde = jax.lax.stop_gradient(two_step_teacher_target(
        teacher_x0, z_t, t, num_student_steps, schedule,
        clip_x0=dconfig.sampler.clip_x0))

    # Student forward (condition-only: the guided target needs no
    # unconditional branch at sampling time).
    s_out = student_model._apply_train(
        params, batch, z_t, t,
        include_conditioning=jnp.ones((batch_size,)), dropout_rng=rng_drop)
    s = dops.x0_eps_from_model_output(z_t, t, s_out, dconfig)

    # Truncated SNR weighting: w = max(alpha^2 / sigma^2, 1).
    snr = (alpha_t / jnp.maximum(sigma_t, 1e-12)) ** 2
    w = jnp.maximum(snr, 1.0)
    per = w * (s["x0"] - x_tilde) ** 2
    mask = batch["decoder_target_mask"][..., None]
    loss = jnp.sum(per * mask)
    n_frames = jnp.sum(batch["decoder_target_mask"])
    return loss, {
        "loss": loss,
        "loss_per_frame": loss / jnp.maximum(n_frames, 1),
        "n_frames": n_frames,
        "n_seqs": jnp.asarray(batch_size, jnp.float32),
    }

  return loss_fn


class DistillModel:
  """Adapter exposing the Trainer's model interface (loss_fn +
  init_variables) for one distillation round."""

  def __init__(self, student_model: Any, teacher_model: Any,
               teacher_params: PyTree, num_student_steps: int,
               guidance_weight: Optional[float] = None):
    self.student = student_model
    self.audio_codec = student_model.audio_codec
    self.num_student_steps = num_student_steps
    # The student is initialized FROM these same arrays and the train
    # step donates its state — copy so donation can't delete the
    # teacher's buffers out from under the aux tree. Exposed as
    # `aux_params`: the Trainer threads it through the jit as a real
    # argument (constants of this size overflow program serialization).
    teacher_params = jax.tree.map(jnp.copy, teacher_params)
    self.teacher_params = teacher_params
    self.aux_params = teacher_params
    self.loss_fn = make_distill_loss_fn(
        student_model, teacher_model,
        num_student_steps, guidance_weight=guidance_weight)

  def init_variables(self, rng, input_shapes, input_types=None):
    return self.student.init_variables(rng, input_shapes, input_types)


@dataclasses.dataclass
class DistillRound:
  """One halving round: teacher at N steps -> student at N//2."""
  teacher_steps: int

  @property
  def student_steps(self) -> int:
    return self.teacher_steps // 2


def student_experiment(teacher_experiment, student_steps: int):
  """Teacher config -> student config: half the steps, DDIM sampler,
  guidance folded in (weight 1 at sampling)."""
  d = teacher_experiment.diffusion
  return dataclasses.replace(
      teacher_experiment,
      diffusion=dataclasses.replace(
          d,
          guidance=dataclasses.replace(d.guidance,
                                       eval_condition_weight=1.0),
          sampler=dataclasses.replace(d.sampler, name="ddim",
                                      num_steps=student_steps)))
