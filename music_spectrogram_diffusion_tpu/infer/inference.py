"""Checkpoint -> ready-to-predict model wrapper.

Equivalent of the reference InferenceModel
(/root/reference/music_spectrogram_diffusion/inference.py): where the
reference re-parses the training gin serialized into the checkpoint dir,
here the checkpoint carries its ExperimentConfig as JSON, so restoring is
config = JSON, model = factory(config), params = orbax restore.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from music_spectrogram_diffusion_tpu import config as cfg_lib
from music_spectrogram_diffusion_tpu.audio import codecs
from music_spectrogram_diffusion_tpu.models.diffusion import (
    model as diffusion_model, network as diffusion_network)
from music_spectrogram_diffusion_tpu.ops import diffusion as dops
from music_spectrogram_diffusion_tpu.train import checkpoints


def build_model(experiment: cfg_lib.ExperimentConfig):
  """Construct the (module, model) pair an ExperimentConfig describes."""
  net_cfg = experiment.network()
  codec = codecs.get_codec(experiment.codec_name)
  if experiment.model_family == "autoregressive":
    from music_spectrogram_diffusion_tpu.models.autoregressive import (
        model as ar_model, network as ar_network, output_functions)
    if experiment.ar_output == "deterministic":
      output_fn = output_functions.Deterministic()
      output_dim = 0
    elif experiment.ar_output == "gaussian_mixture":
      output_fn = output_functions.GaussianMixture(
          n_components=10, dims_per_component=codec.n_dims)
      output_dim = output_fn.expected_num_dims
    else:
      raise ValueError(f"unknown ar_output: {experiment.ar_output}")
    ar_cfg = ar_network.ARConfig(
        vocab_size=net_cfg.vocab_size, dtype=net_cfg.dtype,
        emb_dim=net_cfg.emb_dim, num_heads=net_cfg.num_heads,
        num_encoder_layers=net_cfg.num_encoder_layers,
        num_decoder_layers=net_cfg.num_decoder_layers,
        head_dim=net_cfg.head_dim, mlp_dim=net_cfg.mlp_dim,
        output_dim=output_dim, audio_dim=codec.n_dims,
        mlp_activations=net_cfg.mlp_activations,
        dropout_rate=net_cfg.dropout_rate)
    module = ar_network.ARTransformer(config=ar_cfg)
    return ar_model.AutoregressiveModel(module, output_fn, codec)
  if experiment.with_context:
    module = diffusion_network.ContextTransformer(config=net_cfg)
    model = diffusion_model.ContextDiffusionModel(
        module, experiment.diffusion, codec)
  else:
    module = diffusion_network.Transformer(config=net_cfg)
    model = diffusion_model.DiffusionModel(
        module, experiment.diffusion, codec)
  return model


def cast_params_bf16(params):
  """Cast float32 params to bfloat16 for serving.

  Halves the serving param footprint and per-step weight traffic (the
  sampler is MXU-bound at this geometry, so wall time is unchanged;
  measured neutral at 1000 steps). The float32-sensitive pieces keep
  full precision: the
  final spectrogram projection's weights (`spec_out_dense`, which the
  network also *computes* in f32 — reference network.py:452-456) and
  all non-float leaves.
  """
  def cast(path, x):
    if any(getattr(k, "key", None) == "spec_out_dense" for k in path):
      return x
    return x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
  return jax.tree_util.tree_map_with_path(cast, params)


class InferenceModel:
  """Restores a trained model and exposes a partitioned predict()."""

  def __init__(self, checkpoint_path: str,
               experiment: Optional[cfg_lib.ExperimentConfig] = None,
               sampler_steps: Optional[int] = None,
               sampler_name: Optional[str] = None,
               guidance_interval: Optional[Tuple[float, float]] = None,
               mesh: Optional[jax.sharding.Mesh] = None,
               compute_dtype: Optional[str] = None):
    """Args:
      checkpoint_path: step_<N> dir (or parent; picks latest).
      experiment: override config (otherwise read from the checkpoint).
      sampler_steps: optionally override the sampler step count (e.g. 50
        for fast drafts vs the reference's 1000).
      sampler_name: optionally override the sampler family
        ('ddpm' | 'ddim' | 'dpm++' | 'sde-dpm++') — reduced-step quality
        (reference SamplerConfig, diffusion_utils.py:40-47).
      guidance_interval: optionally restrict CFG to noise times
        t in [lo, hi]; steps outside run a single conditional forward
        (see ops.diffusion.GuidanceConfig.interval).
      mesh: optional ('data','model') mesh — params are sharded by the
        logical-axis rules and the batch over 'data' (multi-chip serve).
      compute_dtype: 'bfloat16' runs the network (activations AND stored
        params) in bf16 regardless of the training dtype — the sampler's
        z/x0 state and the output projection stay float32 (the precision
        split the reference found necessary: diffusion_utils.py:461,
        network.py:452-456). Measured perf-neutral at 1000 steps on v5e
        (the sampler is MXU-bound and XLA's f32 matmuls already run as
        bf16 passes); the win is halved param HBM for serving. 'int8'
        additionally quantizes every large kernel to int8 with
        per-output-channel scales (ops/quantize.py) — halves weight HBM
        traffic again, which is the batch-1 sampler bound. None keeps
        the checkpoint's dtype.
    """
    restored = checkpoints.restore_checkpoint(checkpoint_path)
    if experiment is None:
      if "config_json" not in restored:
        raise ValueError(
            f"{checkpoint_path} has no config.json; pass `experiment`")
      experiment = cfg_lib.ExperimentConfig.from_json(
          restored["config_json"])
    if sampler_steps is not None or sampler_name is not None:
      import dataclasses
      overrides = {}
      if sampler_steps is not None:
        overrides["num_steps"] = sampler_steps
      if sampler_name is not None:
        overrides["name"] = sampler_name
      experiment = dataclasses.replace(
          experiment,
          diffusion=dataclasses.replace(
              experiment.diffusion,
              sampler=dataclasses.replace(
                  experiment.diffusion.sampler, **overrides)))
    if guidance_interval is not None:
      import dataclasses
      experiment = dataclasses.replace(
          experiment,
          diffusion=dataclasses.replace(
              experiment.diffusion,
              guidance=dataclasses.replace(
                  experiment.diffusion.guidance,
                  interval=tuple(guidance_interval))))
    if compute_dtype is not None:
      import dataclasses
      # int8 quantizes the weights; the network's compute dtype is bf16.
      net_dtype = "bfloat16" if compute_dtype == "int8" else compute_dtype
      experiment = dataclasses.replace(experiment, dtype=net_dtype)
    self.experiment = experiment
    self.model = build_model(experiment)
    self.params = restored["params"]
    if compute_dtype == "bfloat16":
      self.params = cast_params_bf16(self.params)
    elif compute_dtype == "int8":
      # Weight-only int8 serving (ops/quantize.py): large kernels become
      # int8 + per-column scales (halved HBM weight traffic — the batch-1
      # sampler bound); everything else takes the bf16 cast.
      from music_spectrogram_diffusion_tpu.ops import quantize as qops
      self.params = qops.quantize_params(cast_params_bf16(self.params))
    self.step = restored.get("step", -1)
    self.mesh = mesh
    if mesh is not None:
      # int8 trees shard too: quantized kernels keep the float kernel's
      # layout, scales follow the output dim, and the Pallas matmul's
      # custom_partitioning rules (ops/quantize.py:_qmm_partitioned)
      # keep those layouts through the jit.
      self.params = self._shard_params(mesh)
    self._predict = jax.jit(
        lambda p, b, k: self.model.predict(p, b, k))

  def _shard_params(self, mesh):
    """Lay the restored params out on the mesh via logical-axis rules."""
    from music_spectrogram_diffusion_tpu.parallel import mesh as mesh_lib
    tl = self.task_lengths
    shapes = {
        "encoder_input_tokens": (1, tl["inputs"]),
        "decoder_target_tokens": (1, tl["targets"],
                                  self.model.audio_codec.n_dims),
    }
    if self.experiment.with_context:
      shapes["encoder_continuous_inputs"] = (
          1, tl["targets_context"], self.model.audio_codec.n_dims)
      shapes["encoder_continuous_mask"] = (1, tl["targets_context"])
    with mesh, mesh_lib.axis_rules():
      variables = jax.eval_shape(
          lambda r: self.model.init_variables(r, shapes),
          jax.random.PRNGKey(0))
    shardings = mesh_lib.param_shardings(variables, mesh)
    flat_params = jax.tree_util.tree_flatten_with_path(self.params)[0]
    if any(k[-1].key == "kernel_scale" for k, _ in flat_params):
      from music_spectrogram_diffusion_tpu.ops import quantize as qops
      shardings = qops.quantized_param_shardings(
          self.params, shardings, mesh)
    return jax.tree.map(
        lambda p, s: jax.device_put(np.asarray(p), s),
        self.params, shardings)

  @property
  def task_lengths(self) -> Dict[str, int]:
    tl = self.experiment.task_lengths
    out = {"inputs": tl.inputs, "targets": tl.targets}
    if self.experiment.with_context:
      out["targets_context"] = tl.targets_context
    return out

  @property
  def audio_codec(self) -> codecs.AudioCodec:
    return self.model.audio_codec

  def predict(self, batch: Mapping[str, np.ndarray],
              seed: int = 0) -> np.ndarray:
    """Run one batched segment prediction; returns mel features."""
    features, _ = self._predict(
        self.params, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(seed))
    return np.asarray(features)

  def synthesizer(self, vocoder=None):
    from music_spectrogram_diffusion_tpu.infer import synthesize
    return synthesize.Synthesizer(
        self.model, self.params, self.task_lengths, vocoder=vocoder)
