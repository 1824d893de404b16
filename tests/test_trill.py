"""TRILL port: frontend hop geometry, ResNetish-50 shapes, registration."""

import numpy as np

from music_spectrogram_diffusion_tpu.infer import postprocessors, trill


def test_log_mel_patches_hop_geometry():
  # 2 s -> 198 frames -> windows at 17-frame hop: floor((198-96)/17)+1 = 7.
  audio = np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1
  patches = trill.log_mel_patches(audio)
  assert patches.shape == (7, 96, 64)
  assert np.all(np.isfinite(patches))
  assert trill.log_mel_patches(np.zeros(1000)).shape == (0, 96, 64)
  # Same frame math as the VGGish frontend: window 0 must match.
  from music_spectrogram_diffusion_tpu.infer import vggish
  np.testing.assert_allclose(patches[0], vggish.log_mel_patches(audio)[0],
                             rtol=1e-5, atol=1e-6)


def _random_weights():
  """init the module, then re-serialize in the converter's npz layout."""
  import jax
  module = trill.ResNetish50()
  variables = module.init(jax.random.PRNGKey(0),
                          np.zeros((1, 96, 64), np.float32))
  flat = {}
  def walk(node, prefix):
    for k, v in node.items():
      if isinstance(v, dict):
        walk(v, prefix + [k])
      else:
        flat["/".join(prefix + [k])] = np.asarray(v)
  walk(jax.tree_util.tree_map(np.asarray, variables["params"]), [])
  return flat


def test_module_accepts_converted_layout(tmp_path):
  import jax
  npz = tmp_path / "trill.npz"
  np.savez(npz, **_random_weights())

  variables = trill.load_params(str(npz))
  module = trill.ResNetish50()
  init_vars = module.init(jax.random.PRNGKey(1),
                          np.zeros((1, 96, 64), np.float32))
  init_flat = jax.tree_util.tree_leaves_with_path(init_vars)
  load_flat = jax.tree_util.tree_leaves_with_path(variables)
  assert ([jax.tree_util.keystr(p) for p, _ in init_flat]
          == [jax.tree_util.keystr(p) for p, _ in load_flat])
  for (pa, a), (_, b) in zip(init_flat, load_flat):
    assert a.shape == b.shape, jax.tree_util.keystr(pa)

  emb = module.apply(variables, np.zeros((2, 96, 64), np.float32))
  assert emb.shape == (2, 512)


def test_converter_layer_names_match_module():
  """tools/convert_trill.py's trunk-order mapping must enumerate exactly
  this module's conv layers."""
  import sys
  sys.path.insert(0, "tools")
  try:
    import convert_trill
  finally:
    sys.path.pop(0)
  names = convert_trill.expected_layer_names()
  weights = _random_weights()
  conv_layers = sorted({k.rsplit("/", 1)[0][:-len("/conv")]
                        for k in weights if k.endswith("/conv/kernel")})
  assert sorted(names) == conv_layers
  # 1 stem + 4 projections + 3*(3+4+6+3) convs = 53 (ResNet-50).
  assert len(names) == 53


def test_register_and_embed(tmp_path):
  npz = tmp_path / "trill.npz"
  np.savez(npz, **_random_weights())
  assert trill.register(str(npz))
  try:
    assert "trill" in postprocessors.EMBEDDING_MODELS
    audio = np.random.RandomState(3).randn(32000).astype(np.float32) * 0.1
    embs = postprocessors.get_embeddings(audio)
    assert embs["trill"].shape == (7, 512)
    assert np.all(np.isfinite(embs["trill"]))
  finally:
    postprocessors.EMBEDDING_MODELS.pop("trill", None)


def test_register_without_weights_returns_false(monkeypatch):
  monkeypatch.delenv("MSD_TRILL_WEIGHTS", raising=False)
  assert not trill.register(None)
  assert not trill.register("/nonexistent/path.npz")
