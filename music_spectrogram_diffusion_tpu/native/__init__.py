"""Native (C++) host data-path kernels with build-on-demand loading.

`get()` returns the compiled _msd_native module, building it with the
system compiler on first use (cached next to the source). Returns None
when no toolchain is available — callers fall back to pure Python.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
from typing import Optional

_CACHED = None
_TRIED = False


def _build(src_dir: str) -> Optional[str]:
  """Compile msd_native.cc into a shared object; returns its path."""
  src = os.path.join(src_dir, "msd_native.cc")
  suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
  out = os.path.join(src_dir, f"_msd_native{suffix}")
  if (os.path.exists(out) and
      os.path.getmtime(out) >= os.path.getmtime(src)):
    return out
  include = sysconfig.get_paths()["include"]
  # Compile to a process-unique temp name and rename into place:
  # concurrent processes (evaluate --num_shards, multi-host training)
  # racing on one output path could dlopen a half-written ELF.
  tmp = f"{out}.{os.getpid()}.tmp"
  cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
         f"-I{include}", src, "-o", tmp]
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    os.replace(tmp, out)  # atomic on POSIX
  except (subprocess.CalledProcessError, FileNotFoundError,
          subprocess.TimeoutExpired, OSError):
    if os.path.exists(tmp):
      try:
        os.remove(tmp)
      except OSError:
        pass
    return None
  return out


def get():
  """The native module, or None if it can't be built here."""
  global _CACHED, _TRIED
  if _TRIED:
    return _CACHED
  _TRIED = True
  src_dir = os.path.dirname(os.path.abspath(__file__))
  so_path = _build(src_dir)
  if so_path is None:
    return None
  import importlib.util
  spec = importlib.util.spec_from_file_location("_msd_native", so_path)
  try:
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _CACHED = mod
  except ImportError:
    _CACHED = None
  return _CACHED
