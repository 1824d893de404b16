"""VGGish port: frontend geometry, module shapes, weight loading, FAD."""

import numpy as np
import pytest

from music_spectrogram_diffusion_tpu.infer import postprocessors, vggish


def test_log_mel_patches_geometry():
  # 2 seconds -> 197 frames -> 2 patches of 96 (5 frames dropped).
  audio = np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1
  patches = vggish.log_mel_patches(audio)
  assert patches.shape == (2, 96, 64)
  assert np.all(np.isfinite(patches))
  # Too-short audio -> zero patches, not an error.
  assert vggish.log_mel_patches(np.zeros(1000)).shape == (0, 96, 64)


def test_log_mel_frontend_values():
  """Pin the frontend against a direct transcription of audioset
  mel_features.py (symmetric Hann, |rfft| 512, HTK mel 125-7500,
  log + 0.01)."""
  rng = np.random.RandomState(1)
  audio = rng.randn(16000).astype(np.float32) * 0.2
  got = vggish.log_mel_patches(audio)

  n_frames = (len(audio) - 400) // 160 + 1
  idx = np.arange(400)[None, :] + 160 * np.arange(n_frames)[:, None]
  frames = audio[idx] * np.hanning(400)
  mag = np.abs(np.fft.rfft(frames, n=512, axis=-1))
  from music_spectrogram_diffusion_tpu.ops import stft as stft_ops
  mel = mag @ stft_ops.linear_to_mel_matrix(64, 257, 16000, 125.0, 7500.0)
  want = np.log(mel + 0.01)[:96][None]
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _random_weights(rng):
  shapes = {
      "conv1/kernel": (3, 3, 1, 64), "conv1/bias": (64,),
      "conv2/kernel": (3, 3, 64, 128), "conv2/bias": (128,),
      "conv3_1/kernel": (3, 3, 128, 256), "conv3_1/bias": (256,),
      "conv3_2/kernel": (3, 3, 256, 256), "conv3_2/bias": (256,),
      "conv4_1/kernel": (3, 3, 256, 512), "conv4_1/bias": (512,),
      "conv4_2/kernel": (3, 3, 512, 512), "conv4_2/bias": (512,),
      "fc1_1/kernel": (12288, 4096), "fc1_1/bias": (4096,),
      "fc1_2/kernel": (4096, 4096), "fc1_2/bias": (4096,),
      "fc2/kernel": (4096, 128), "fc2/bias": (128,),
  }
  return {k: rng.randn(*s).astype(np.float32) * 0.01
          for k, s in shapes.items()}


def test_module_accepts_converted_layout(tmp_path):
  """A converter-format npz loads into the module and runs end to end;
  the param tree must match init_variables structurally."""
  import jax
  rng = np.random.RandomState(2)
  npz = tmp_path / "vggish.npz"
  np.savez(npz, **_random_weights(rng))

  variables = vggish.load_params(str(npz))
  module = vggish.VGGish()
  init_vars = module.init(jax.random.PRNGKey(0),
                          np.zeros((1, 96, 64), np.float32))
  init_flat = jax.tree_util.tree_leaves_with_path(init_vars)
  load_flat = jax.tree_util.tree_leaves_with_path(variables)
  assert ([jax.tree_util.keystr(p) for p, _ in init_flat]
          == [jax.tree_util.keystr(p) for p, _ in load_flat])
  for (pa, a), (_, b) in zip(init_flat, load_flat):
    assert a.shape == b.shape, jax.tree_util.keystr(pa)

  emb = module.apply(variables, np.zeros((3, 96, 64), np.float32))
  assert emb.shape == (3, 128)
  assert np.all(np.asarray(emb) >= 0)  # post-ReLU embeddings


def test_embedder_and_fad_wiring(tmp_path):
  rng = np.random.RandomState(3)
  npz = tmp_path / "vggish.npz"
  np.savez(npz, **_random_weights(rng))
  assert vggish.register(str(npz))
  try:
    assert "vggish" in postprocessors.EMBEDDING_MODELS
    audio = rng.randn(32000).astype(np.float32) * 0.1
    embs = postprocessors.get_embeddings(audio)
    assert embs["vggish"].shape == (2, 128)

    # Population FAD over SongEval embeddings.
    from music_spectrogram_diffusion_tpu.infer import evaluation
    results = []
    for i in range(3):
      a_t = rng.randn(32000).astype(np.float32) * 0.1
      a_p = a_t + rng.randn(32000).astype(np.float32) * 0.02
      results.append(evaluation.SongEval(
          song_id=f"s{i}", metrics={"x": 1.0},
          embeddings_target=postprocessors.get_embeddings(a_t),
          embeddings_pred=postprocessors.get_embeddings(a_p)))
    agg = evaluation.aggregate(results)
    assert "frechet_audio_distance/vggish" in agg
    assert "frechet_audio_distance/mel" in agg
    assert np.isfinite(agg["frechet_audio_distance/vggish"])
    assert agg["frechet_audio_distance/vggish"] >= 0
  finally:
    postprocessors.EMBEDDING_MODELS.pop("vggish", None)


def test_register_without_weights_returns_false(monkeypatch):
  monkeypatch.delenv("MSD_VGGISH_WEIGHTS", raising=False)
  assert not vggish.register(None)
  assert not vggish.register("/nonexistent/path.npz")
