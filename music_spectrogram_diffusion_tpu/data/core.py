"""Minimal lazy dataset abstraction (replaces tf.data + seqio plumbing).

Examples are plain dicts of numpy arrays; a Dataset is a re-iterable lazy
pipeline over them. Heavyweight parallelism lives in `prefetch` (a
background thread pool) — everything else is simple composition, which
keeps the pipeline picklable, debuggable, and free of TF.
"""

from __future__ import annotations

import itertools
import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

Example = Dict[str, Any]


class Dataset:
  """A re-iterable stream of example dicts."""

  def __init__(self, gen_fn: Callable[[], Iterator[Example]]):
    self._gen_fn = gen_fn

  def __iter__(self) -> Iterator[Example]:
    return self._gen_fn()

  # -- constructors ---------------------------------------------------------

  @staticmethod
  def from_list(examples) -> "Dataset":
    return Dataset(lambda: iter(list(examples)))

  @staticmethod
  def from_generator(gen_fn: Callable[[], Iterable[Example]]) -> "Dataset":
    return Dataset(lambda: iter(gen_fn()))

  # -- transforms -----------------------------------------------------------

  def map(self, fn: Callable[[Example], Example]) -> "Dataset":
    return Dataset(lambda: (fn(ex) for ex in self))

  def map_with_seed(self, fn: Callable[[Example, int], Example],
                    base_seed: int = 0) -> "Dataset":
    """Map with a per-example deterministic seed (position-based)."""
    def gen():
      for i, ex in enumerate(self):
        yield fn(ex, base_seed + i)
    return Dataset(gen)

  def filter(self, pred: Callable[[Example], bool]) -> "Dataset":
    return Dataset(lambda: (ex for ex in self if pred(ex)))

  def flat_map(self,
               fn: Callable[[Example], Iterable[Example]]) -> "Dataset":
    def gen():
      for ex in self:
        yield from fn(ex)
    return Dataset(gen)

  def repeat(self, count: Optional[int] = None) -> "Dataset":
    def gen():
      it = range(count) if count is not None else itertools.count()
      for _ in it:
        yield from self
    return Dataset(gen)

  def take(self, n: int) -> "Dataset":
    return Dataset(lambda: itertools.islice(iter(self), n))

  def shuffle(self, buffer_size: int, seed: int = 0) -> "Dataset":
    """Streaming shuffle with a fixed-size reservoir (tf.data semantics)."""
    def gen():
      import random
      rng = random.Random(seed)
      buf = []
      for ex in self:
        buf.append(ex)
        if len(buf) >= buffer_size:
          idx = rng.randrange(len(buf))
          buf[idx], buf[-1] = buf[-1], buf[idx]
          yield buf.pop()
      rng.shuffle(buf)
      yield from buf
    return Dataset(gen)

  def batch(self, batch_size: int, drop_remainder: bool = True) -> "Dataset":
    """Stack examples into batched arrays."""
    import numpy as np

    def gen():
      buf = []
      for ex in self:
        buf.append(ex)
        if len(buf) == batch_size:
          yield {k: np.stack([b[k] for b in buf]) for k in buf[0]}
          buf = []
      if buf and not drop_remainder:
        yield {k: np.stack([b[k] for b in buf]) for k in buf[0]}
    return Dataset(gen)

  def prefetch(self, buffer_size: int = 2,
               num_threads: int = 1) -> "Dataset":
    """Run the upstream pipeline in background threads.

    With num_threads > 1, upstream examples are processed out of order
    (each thread pulls from a shared iterator); ordering is not
    guaranteed, matching tf.data's parallel map semantics.
    """
    def gen():
      q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
      src = iter(self)
      src_lock = threading.Lock()
      _END = object()
      n_done = [0]
      done_lock = threading.Lock()

      def worker():
        while True:
          with src_lock:
            try:
              ex = next(src)
            except StopIteration:
              break
            except Exception as e:  # surface pipeline errors to consumer
              q.put(("error", e))
              break
          q.put(("ok", ex))
        with done_lock:
          n_done[0] += 1
          if n_done[0] == num_threads:
            q.put(("end", _END))

      threads = [threading.Thread(target=worker, daemon=True)
                 for _ in range(num_threads)]
      for t in threads:
        t.start()
      while True:
        kind, item = q.get()
        if kind == "end":
          break
        if kind == "error":
          raise item
        yield item
    return Dataset(gen)

  # -- materialisation ------------------------------------------------------

  def as_list(self):
    return list(self)

  def first(self) -> Example:
    return next(iter(self))
