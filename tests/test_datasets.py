"""TFRecord reader/writer round trip + dataset config sanity."""

import os

import numpy as np

from music_spectrogram_diffusion_tpu.data import datasets


def test_example_serialize_parse_roundtrip(tmp_path):
  examples = [
      {
          "audio": np.sin(np.arange(100) / 10).astype(np.float32),
          "sequence": b"\x01\x02proto-bytes",
          "id": "song-1",
          "lengths": np.asarray([3, 5, 700], np.int64),
      },
      {
          "audio": np.zeros(7, np.float32),
          "sequence": b"",
          "id": "song-2",
          "lengths": np.asarray([0], np.int64),
      },
  ]
  path = os.path.join(tmp_path, "test.tfrecord")
  datasets.write_tfrecord(
      path, [datasets.serialize_example(ex) for ex in examples])

  features = {
      "audio": datasets.float_seq_feature(),
      "sequence": datasets.bytes_feature(),
      "id": datasets.bytes_feature(),
      "lengths": datasets.int64_seq_feature(),
  }
  got = datasets.tfrecord_source(path, features).as_list()
  assert len(got) == 2
  np.testing.assert_allclose(got[0]["audio"], examples[0]["audio"])
  assert got[0]["sequence"] == examples[0]["sequence"]
  assert got[0]["id"] == b"song-1"
  np.testing.assert_array_equal(got[0]["lengths"], examples[0]["lengths"])
  assert got[1]["id"] == b"song-2"
  np.testing.assert_array_equal(got[1]["lengths"], [0])


def test_tfrecord_parse_matches_tensorflow_format(tmp_path):
  """If torch's TFRecord-compatible reader existed we'd cross-check; at
  minimum verify the framing: 8-byte length + masked CRCs."""
  path = os.path.join(tmp_path, "x.tfrecord")
  record = b"hello world"
  datasets.write_tfrecord(path, [record])
  raw = open(path, "rb").read()
  assert len(raw) == 8 + 4 + len(record) + 4
  import struct
  (length,) = struct.unpack("<Q", raw[:8])
  assert length == len(record)
  assert raw[12:12 + length] == record


def test_all_dataset_configs_complete():
  assert set(datasets.ALL_DATASET_CONFIGS) == {
      "maestrov1", "maestrov3", "guitarset", "urmp", "musicnet",
      "cerberus4", "slakh"}
  for cfg in datasets.ALL_DATASET_CONFIGS.values():
    assert cfg.train_split in cfg.paths
    assert cfg.train_eval_split in cfg.paths
    for split in cfg.infer_eval_splits:
      assert split.name in cfg.paths, (cfg.name, split.name)
  # Cerberus4 has the 4 instrument tracks (reference datasets.py:240-245).
  assert [t.name for t in datasets.CERBERUS4_CONFIG.track_specs] == [
      "bass", "drums", "guitar", "piano"]
  assert len(datasets.SYNTH_MIXTURE_DATASET_CONFIGS) == 6


def test_remote_io_local_and_custom_scheme(tmp_path):
  """Filesystem registry: local passthrough + custom scheme handler."""
  from music_spectrogram_diffusion_tpu.data import remote_io

  (tmp_path / "a.txt").write_bytes(b"hello")
  assert remote_io.glob(str(tmp_path / "*.txt")) == [str(tmp_path / "a.txt")]
  with remote_io.open_file(str(tmp_path / "a.txt")) as f:
    assert f.read() == b"hello"

  class FakeFs:
    def glob(self, pattern):
      return ["fake://x/1", "fake://x/2"]

    def open(self, path, mode="rb"):
      import io
      return io.BytesIO(path.encode())

  remote_io.register_filesystem("fake", FakeFs)
  try:
    assert remote_io.glob("fake://x/*") == ["fake://x/1", "fake://x/2"]
    assert remote_io.open_file("fake://x/1").read() == b"fake://x/1"
  finally:
    remote_io._FACTORIES.pop("fake", None)
    remote_io._INSTANCES.pop("fake", None)


def test_remote_io_gs_raises_not_silent():
  """gs:// access must raise (backend missing or network down), never
  silently return an empty listing. In network-enabled environments the
  gcsfs backend serves the published dataset paths directly."""
  from music_spectrogram_diffusion_tpu.data import remote_io
  remote_io._INSTANCES.pop("gs", None)
  import pytest
  with pytest.raises(Exception):
    remote_io.glob("gs://magentadata/does/not/matter*")


def test_gcsfs_auth_error_classifier():
  """Only auth-shaped failures trigger the anonymous retry; transient or
  missing-file errors surface as-is (no permanent anon downgrade)."""
  from music_spectrogram_diffusion_tpu.data import remote_io

  is_auth = remote_io.GcsFsFilesystem._is_auth_error
  assert is_auth(Exception("HTTP 403: Forbidden"))
  assert is_auth(PermissionError("access denied on bucket"))
  assert is_auth(Exception("invalid_grant: bad credentials"))
  assert is_auth(Exception("Anonymous caller does not have access"))
  assert not is_auth(FileNotFoundError("gs://b/missing.tfrecord"))
  assert not is_auth(Exception("HTTP 500: backend error"))
  assert not is_auth(TimeoutError("read timed out"))
