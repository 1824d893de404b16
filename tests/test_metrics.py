"""Metrics tests: streaming Gaussian vs numpy oracle, Fréchet distance."""

import numpy as np

from music_spectrogram_diffusion_tpu.train import metrics


def test_streaming_gaussian_matches_numpy():
  rng = np.random.RandomState(0)
  x = rng.randn(500, 16)
  g = metrics.StreamingMultivariateGaussian()
  for chunk in np.array_split(x, 7):
    g.update(chunk)
  np.testing.assert_allclose(g.mu, x.mean(axis=0), atol=1e-8)
  # Reference normalizes by n (biased), like np.cov(..., bias=True).
  np.testing.assert_allclose(g.sigma, np.cov(x.T, bias=True), atol=1e-8)


def test_streaming_gaussian_diagonal_fallback():
  rng = np.random.RandomState(1)
  x = rng.randn(100, 2048)
  g = metrics.StreamingMultivariateGaussian()
  for chunk in np.array_split(x, 3):
    g.update(chunk)
  assert g.sigma.ndim == 1
  np.testing.assert_allclose(g.sigma, x.var(axis=0), atol=1e-8)


def test_frechet_distance_zero_for_identical():
  rng = np.random.RandomState(2)
  x = rng.randn(200, 8)
  mu, sigma = x.mean(0), np.cov(x.T, bias=True)
  d = metrics.frechet_distance(mu, sigma, mu.copy(), sigma.copy())
  assert abs(d) < 1e-6


def test_frechet_distance_mean_shift():
  mu1, mu2 = np.zeros(4), np.ones(4) * 2.0
  sigma = np.eye(4)
  d = metrics.frechet_distance(mu1, sigma, mu2, sigma)
  # For equal covariance, FD = ||mu1-mu2||^2.
  np.testing.assert_allclose(d, 16.0, atol=1e-6)


def test_frechet_distance_diagonal():
  mu = np.zeros(2048)
  s1 = np.ones(2048)
  s2 = np.ones(2048) * 4.0
  d = metrics.frechet_distance(mu, s1, mu, s2)
  # sum(1) + sum(4) - 2*sum(2) = 2048 + 8192 - 8192 = 1024... check:
  np.testing.assert_allclose(d, 2048 + 4 * 2048 - 2 * 2 * 2048, atol=1e-6)


def test_embedding_distance():
  e1 = np.zeros((10, 3))
  e2 = np.ones((12, 3))
  d = metrics.embedding_distance(e1, e2)
  np.testing.assert_allclose(d, np.sqrt(3.0), atol=1e-9)


def test_reconstruction_metrics():
  rng = np.random.RandomState(3)
  targets, preds = [], []
  for _ in range(4):
    targets.append({"embeddings": {"vggish": rng.randn(20, 8)}})
    preds.append({"embeddings": {"vggish": rng.randn(20, 8)}})
  out = metrics.reconstruction_metrics(targets, preds)
  assert "vggish_distance" in out and "vggish_frechet" in out
  assert out["vggish_frechet"] > 0


def test_mel_spectral_metrics():
  rng = np.random.RandomState(4)
  t = rng.randn(100, 128)
  out = metrics.mel_spectral_metrics(t, t)
  assert out["mel_l1"] == 0.0
  assert abs(out["mel_frechet"]) < 1e-4
  out2 = metrics.mel_spectral_metrics(t, t + 1.0)
  assert out2["mel_l1"] == 1.0
  assert out2["mel_frechet"] > 0


def test_model_timing():
  preds = [{"timings": {"prediction_seconds_per_audio_second": 0.5}},
           {"timings": {"prediction_seconds_per_audio_second": 1.5}}]
  out = metrics.model_timing([{}, {}], preds)
  np.testing.assert_allclose(
      out["prediction_seconds_per_audio_second"], 1.0)


def test_summary_writer(tmp_path):
  from music_spectrogram_diffusion_tpu.audio import codecs
  from music_spectrogram_diffusion_tpu.train import summaries
  import os, json
  w = summaries.SummaryWriter(str(tmp_path), codecs.MelGan())
  feats = np.random.RandomState(0).uniform(-11, 4, (64, 128))
  p = w.add_spectrogram_image("pred/0", 10, feats)
  assert p and os.path.exists(p)
  audio = np.random.RandomState(1).randn(16000).astype(np.float32) * 0.1
  a = w.add_audio("pred/0", 10, audio)
  assert a and os.path.exists(a)
  w.add_scalars(10, {"loss": 1.5})
  idx = json.load(open(os.path.join(tmp_path, "index.json")))
  assert idx["images"] and idx["audio"] and idx["scalars"]


def test_summary_audio_cap(tmp_path):
  from music_spectrogram_diffusion_tpu.train import summaries
  w = summaries.SummaryWriter(str(tmp_path))
  big = np.zeros(summaries.MAX_AUDIO_BYTES // 2 - 100, np.float32)
  assert w.add_audio("a", 0, big) is not None
  assert w.add_audio("b", 0, big) is None  # over the cap


def test_transcription_note_scores():
  from music_spectrogram_diffusion_tpu.infer import transcription
  from music_spectrogram_diffusion_tpu.midi import sequences

  ref = sequences.NoteSequence()
  ref.add(start_time=0.1, end_time=0.5, pitch=60, velocity=100, program=0)
  ref.add(start_time=0.5, end_time=0.9, pitch=64, velocity=100, program=0)
  ref.add(start_time=1.0, end_time=1.4, pitch=67, velocity=100, program=9)

  # Perfect transcription -> F1 = 1 at every granularity.
  out = transcription.note_onset_scores(ref, ref, "full")
  assert out["Onset + program precision/recall/F1 (full) F1"] == 1.0

  # One onset off by 30ms (within tolerance), one note missing.
  est = sequences.NoteSequence()
  est.add(start_time=0.13, end_time=0.5, pitch=60, velocity=100, program=0)
  est.add(start_time=1.0, end_time=1.4, pitch=67, velocity=100, program=9)
  out = transcription.note_onset_scores(ref, est, "full")
  key = "Onset + program precision/recall/F1 (full)"
  assert out[f"{key} precision"] == 1.0
  np.testing.assert_allclose(out[f"{key} recall"], 2 / 3)

  # 'flat' granularity forgives the wrong program.
  est2 = sequences.NoteSequence()
  est2.add(start_time=0.1, end_time=0.5, pitch=60, velocity=100,
           program=40)
  out_full = transcription.note_onset_scores(ref, est2, "full")
  out_flat = transcription.note_onset_scores(ref, est2, "flat")
  assert out_full["Onset + program precision/recall/F1 (full) F1"] == 0.0
  assert out_flat["Onset + program precision/recall/F1 (flat) F1"] > 0

  # Aggregation shape with GT ceiling.
  agg = transcription.transcription_metrics(
      [{"sequence": ref, "transcribed_audio": ref}],
      [{"transcribed_audio": est}])
  assert any(k.startswith("Model ") for k in agg)
  assert any(k.startswith("GT ") for k in agg)
