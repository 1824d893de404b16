"""evaluate CLI end to end over a real-dataset-shaped TFRecord source.

The synthetic path is covered elsewhere; this drives the --dataset
branch (registry task -> full-song split -> take_while song limit ->
chained render -> metrics JSON) the way a user with a local MAESTRO
mirror would run it."""

import pytest

pytestmark = pytest.mark.slow

import dataclasses
import json
import os
import sys

import numpy as np

from music_spectrogram_diffusion_tpu.audio import wav_io
from music_spectrogram_diffusion_tpu.data import datasets, synthetic
from music_spectrogram_diffusion_tpu.midi import proto


def _write_maestro_shard(path, n=3):
  records = []
  for i in range(n):
    rng = np.random.RandomState(i)
    ns = synthetic.random_note_sequence(rng, duration=3.0)
    audio = synthetic.render_note_sequence(ns, 16000, duration=3.0)
    records.append(datasets.serialize_example({
        "sequence": proto.serialize_note_sequence(ns),
        "audio": wav_io.encode_wav(audio, 16000),
        "id": f"m-{i}",
    }))
  datasets.write_tfrecord(path, records)


def test_evaluate_cli_real_dataset_path(tmp_path, monkeypatch):
  from music_spectrogram_diffusion_tpu.cli import evaluate as evaluate_cli

  shard = os.path.join(tmp_path, "maestro-validation.tfrecord")
  _write_maestro_shard(shard)
  config = dataclasses.replace(
      datasets.MAESTROV3_CONFIG, paths={"validation": shard})
  monkeypatch.setitem(datasets.ALL_DATASET_CONFIGS, "maestrov3", config)

  out_dir = str(tmp_path / "eval_out")
  monkeypatch.setattr(sys, "argv", [
      "evaluate", "--dataset", "maestrov3", "--split", "validation",
      "--preset", "context_tiny", "--steps", "2", "--songs", "2",
      "--output_dir", out_dir, "--seed", "0"])
  evaluate_cli.main()

  with open(os.path.join(out_dir, "metrics.json")) as f:
    metrics = json.load(f)["aggregate"]
  # --songs 2 must bound the run (take_while) even though 3 songs exist.
  assert metrics["num_songs"] == 2
  assert np.isfinite(metrics["mel_l2"])
  assert metrics["timing/audio_seconds"] > 0


def test_evaluate_cli_checkpoint_int8(tmp_path, monkeypatch):
  """--checkpoint + --compute_dtype int8 runs the quantized serving tree
  through the full synthetic eval (tiny kernels sit below the 512 gate,
  so the tree loads via the float path — the flag plumbing and the
  quantized-tree predict dispatch are what this covers; int8 numerics
  are pinned in test_quantize.py)."""
  import jax

  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.cli import evaluate as evaluate_cli
  from music_spectrogram_diffusion_tpu.infer import inference
  from music_spectrogram_diffusion_tpu.train import checkpoints

  exp = dataclasses.replace(
      cfg_lib.preset("context_tiny"), dropout_rate=0.0,
      task_lengths=cfg_lib.TaskLengths(inputs=64, targets=16,
                                       targets_context=16))
  model = inference.build_model(exp)
  tl = exp.task_lengths
  variables = model.init_variables(jax.random.PRNGKey(0), {
      "encoder_input_tokens": (1, tl.inputs),
      "encoder_continuous_inputs": (1, tl.targets_context, 128),
      "encoder_continuous_mask": (1, tl.targets_context),
      "decoder_target_tokens": (1, tl.targets, 128),
  })
  ckpt = str(tmp_path / "ckpt")
  checkpoints.save_checkpoint(ckpt, step=0, params=variables["params"],
                              config_json=exp.to_json())

  out_dir = str(tmp_path / "eval_int8")
  monkeypatch.setattr(sys, "argv", [
      "evaluate", "--checkpoint", ckpt, "--synthetic", "--steps", "2",
      "--songs", "1", "--output_dir", out_dir,
      "--compute_dtype", "int8", "--seed", "0"])
  evaluate_cli.main()
  with open(os.path.join(out_dir, "metrics.json")) as f:
    metrics = json.load(f)["aggregate"]
  assert metrics["num_songs"] == 1
  assert np.isfinite(metrics["mel_l2"])


def test_gt_raw_differs_from_gt_encoded():
  """The two metric-ceiling sources must take distinct paths (reference
  beam/evaluation.py:211-240): gt_raw's predicted AUDIO is the raw
  segment audio itself (audio-space FAD ~ 0, the perfect-prediction
  ceiling) while gt_encoded's is the vocoded target mel (audio-space
  FAD > 0, the vocoder-roundtrip ceiling). In mel space both equal the
  target: gt_raw's fresh re-encode of the raw audio must reproduce the
  pipeline's targets bit-near-exactly — that pins the
  additional_frames_for_encoding clean-framing invariant.
  """
  import jax
  import jax.numpy as jnp

  from music_spectrogram_diffusion_tpu import config as cfg_lib
  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.audio import vocoder as vocoder_lib
  from music_spectrogram_diffusion_tpu.data import synthetic, tasks
  from music_spectrogram_diffusion_tpu.infer import evaluation, synthesize
  from music_spectrogram_diffusion_tpu.midi import vocabularies
  from music_spectrogram_diffusion_tpu.models.diffusion import (
      model as model_lib, network)
  from music_spectrogram_diffusion_tpu.ops import diffusion as dops

  lengths = {"inputs": 256, "targets": 32, "targets_context": 32}
  net_cfg = cfg_lib.network_config("tiny", with_context=True,
                                   vocab_size=256, dropout_rate=0.0)
  module = network.ContextTransformer(config=net_cfg)
  dcfg = dops.DiffusionConfig(sampler=dops.SamplerConfig(num_steps=2))
  model = model_lib.ContextDiffusionModel(module, dcfg, codecs.MelGan())
  shapes = {
      "encoder_input_tokens": (1, lengths["inputs"]),
      "encoder_continuous_inputs": (1, lengths["targets_context"], 128),
      "encoder_continuous_mask": (1, lengths["targets_context"]),
      "decoder_target_tokens": (1, lengths["targets"], 128),
  }
  types = {"encoder_input_tokens": jnp.int32,
           "encoder_continuous_mask": jnp.bool_}
  params = model.init_variables(
      jax.random.PRNGKey(0), shapes, types)["params"]
  synth = synthesize.Synthesizer(
      model, params, lengths,
      vocoder=vocoder_lib.GriffinLimVocoder(num_iters=2))

  task = tasks.Task(
      name="eval_gt",
      source_fn=lambda: synthetic.synthetic_source(1, duration=1.5),
      audio_codec=model.audio_codec,
      vocab_config=vocabularies.VocabularyConfig(num_velocity_bins=1),
      note_rep=tasks.NoteRepresentationConfig(include_ties=True),
      with_context=True)
  songs = evaluation.group_songs(task.full_song_dataset(lengths))
  assert songs and "raw_targets" in next(iter(songs.values()))[0]

  r_enc = evaluation.evaluate_songs(
      synth, songs, vocode=True, prediction_source="gt_encoded")
  r_raw = evaluation.evaluate_songs(
      synth, songs, vocode=True, prediction_source="gt_raw")

  # Transcription plumbing (reference TranscribeAudio stage): with a
  # transcriber registered, rendered audio is transcribed and scored
  # against the song's true NoteSequence — both the model row and the
  # GT-audio ceiling row must appear. The fake transcriber returns the
  # true sequence, so every F1 pins to 1.
  from music_spectrogram_diffusion_tpu.infer import transcription
  ns_true = next(iter(songs.values()))[0]["sequence"]
  transcription.register_transcriber(lambda audio: ns_true)
  try:
    r_t = evaluation.evaluate_songs(
        synth, songs, vocode=True, prediction_source="gt_raw")
  finally:
    transcription.register_transcriber(None)
  key = "Model Onset + program precision/recall/F1 (flat) F1"
  gt_key = "GT Onset + program precision/recall/F1 (flat) F1"
  assert r_t[0].metrics[key] == 1.0
  assert r_t[0].metrics[gt_key] == 1.0
  assert key not in r_raw[0].metrics  # no transcriber -> no metric
  # Mel space: gt_encoded is exact by definition; gt_raw's re-encode
  # reproduces the pipeline targets (clean-framing invariant).
  assert r_enc[0].metrics["mel_l2"] == 0.0
  assert r_raw[0].metrics["mel_l2"] < 1e-9
  # Audio space: gt_raw's prediction IS the target audio -> FAD ~ 0;
  # gt_encoded's is the Griffin-Lim roundtrip -> strictly worse.
  key = "frechet_audio_distance/mel"
  agg_enc = evaluation.aggregate(r_enc)
  agg_raw = evaluation.aggregate(r_raw)
  assert agg_raw[key] < 1e-6
  assert agg_enc[key] > 1e-3


def test_aggregate_bootstrap_ci():
  """95% bootstrap CIs over songs: brackets the point estimate, and the
  moments-based population FAD matches a direct two-population compute."""
  from music_spectrogram_diffusion_tpu.infer import evaluation
  from music_spectrogram_diffusion_tpu.train import metrics as metrics_lib

  r = np.random.RandomState(0)
  results = []
  for i in range(8):
    et = r.randn(30, 16) * 1.0
    ep = r.randn(30, 16) * 1.2 + 0.3
    results.append(evaluation.SongEval(
        song_id=f"s{i}", metrics={"mel_l2": float(1.0 + 0.1 * i)},
        embeddings_target={"mel": et}, embeddings_pred={"mel": ep}))
  agg = evaluation.aggregate(results, bootstrap=100, seed=0)

  key = "frechet_audio_distance/mel"
  # Point estimate == direct full-population Fréchet.
  all_t = np.concatenate([np.asarray(x.embeddings_target["mel"])
                          for x in results])
  all_p = np.concatenate([np.asarray(x.embeddings_pred["mel"])
                          for x in results])
  direct = metrics_lib.frechet_distance(
      all_t.mean(0), np.cov(all_t.T, bias=True),
      all_p.mean(0), np.cov(all_p.T, bias=True))
  np.testing.assert_allclose(agg[key], direct, rtol=1e-6)

  for k in ("mel_l2", key):
    lo, hi = agg[f"{k}_ci95_low"], agg[f"{k}_ci95_high"]
    assert lo <= agg[k] <= hi
    assert hi > lo  # non-degenerate interval

  # Few songs -> CIs are suppressed, point estimates stay.
  agg2 = evaluation.aggregate(results[:2], bootstrap=100)
  assert key in agg2 and f"{key}_ci95_low" not in agg2


def test_sharded_eval_merge(tmp_path):
  """Two-shard eval + merge_eval == the Beam shard/combine semantics.

  The merged population FAD must EXACTLY equal the FAD of a single
  unsharded run over the same songs (moments are additive), and the
  per-song metric means must match too.
  """
  from music_spectrogram_diffusion_tpu.infer import evaluation

  r = np.random.RandomState(3)

  def song(i):
    et = r.randn(20, 8) * 1.0
    ep = r.randn(20, 8) * 1.3 + 0.2
    return evaluation.SongEval(
        song_id=f"song{i}", metrics={"mel_l2": float(i)},
        embeddings_target={"mel": et}, embeddings_pred={"mel": ep})

  songs = [song(i) for i in range(8)]
  d0, d1 = str(tmp_path / "s0"), str(tmp_path / "s1")
  evaluation.write_outputs(songs[0::2], d0)
  evaluation.write_outputs(songs[1::2], d1)

  import sys

  from music_spectrogram_diffusion_tpu.cli import merge_eval
  out_path = str(tmp_path / "merged.json")
  old_argv = sys.argv
  sys.argv = ["merge_eval", "--shards", d0, d1, "--output", out_path]
  try:
    merge_eval.main()
  finally:
    sys.argv = old_argv
  merged = json.load(open(out_path))["aggregate"]

  full = evaluation.aggregate(songs)
  key = "frechet_audio_distance/mel"
  np.testing.assert_allclose(merged[key], full[key], rtol=1e-9)
  np.testing.assert_allclose(merged["embedding_distance/mel"],
                             full["embedding_distance/mel"], rtol=1e-9)
  np.testing.assert_allclose(merged["mel_l2"], full["mel_l2"])
  assert merged["num_songs"] == 8
  assert merged[f"{key}_ci95_low"] <= merged[key] <= (
      merged[f"{key}_ci95_high"])
