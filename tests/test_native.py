"""Native extension: build, and parity with the pure-Python paths."""

import numpy as np
import pytest

from music_spectrogram_diffusion_tpu import native
from music_spectrogram_diffusion_tpu.data import datasets


@pytest.fixture(scope="module")
def native_mod():
  mod = native.get()
  if mod is None:
    pytest.skip("no C++ toolchain available")
  return mod


def test_masked_crc32c_matches_python(native_mod):
  for payload in [b"", b"hello world", bytes(range(256)) * 7]:
    assert native_mod.masked_crc32c(payload) == datasets._masked_crc32c(
        payload)


def test_split_tfrecords_matches_python(native_mod, tmp_path):
  import os
  records = [b"first", b"", b"x" * 1000]
  path = os.path.join(tmp_path, "t.tfrecord")
  datasets.write_tfrecord(path, records)
  with open(path, "rb") as f:
    data = f.read()
  got = native_mod.split_tfrecords(data, True)  # with CRC verification
  assert got == records
  # The high-level reader (which routes through native when available).
  assert list(datasets.iter_tfrecords(path)) == records


def test_split_tfrecords_detects_corruption(native_mod, tmp_path):
  import os
  path = os.path.join(tmp_path, "bad.tfrecord")
  datasets.write_tfrecord(path, [b"payload"])
  data = bytearray(open(path, "rb").read())
  data[14] ^= 0xFF  # flip a payload byte
  with pytest.raises(IOError):
    native_mod.split_tfrecords(bytes(data), True)


def test_decode_varints(native_mod):
  import io
  values = [0, 1, 127, 128, 300, 2 ** 40, 2 ** 63]
  buf = b"".join(datasets._encode_varint(v) for v in values)
  assert native_mod.decode_varints(buf) == values
