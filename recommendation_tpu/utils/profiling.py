"""Tracing / profiling utilities (SURVEY.md §5 — absent in the reference).

* ``enable_compilation_cache()`` — persistent XLA compilation cache so tuner
  restarts and repeat CLI runs skip the (tunnel-expensive) compile.
* ``profile_trace(dir)`` — context manager around ``jax.profiler`` for
  TensorBoard-viewable device traces.
* ``Throughput`` — examples/s/chip counter used by the trainer's epoch log
  (the BASELINE.json metric).
"""

from __future__ import annotations

import contextlib
import os
import time


def enable_compilation_cache(path: str | None = None) -> None:
    """OPT-IN persistent XLA compilation cache (set RECTPU_COMPILE_CACHE).

    Not enabled by default: on remote-compile PJRT backends (e.g. a
    tunneled TPU that compiles server-side) the persistent cache forces
    executable serialization through the tunnel and measured 5-6× SLOWER
    first-compiles. On local backends it is a straight win for tuner
    restarts."""
    import jax

    path = path or os.environ.get("RECTPU_COMPILE_CACHE")
    if not path:
        return
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs


@contextlib.contextmanager
def profile_trace(log_dir: str = "./profile"):
    """``with profile_trace('./profile'): step()`` → TensorBoard trace."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Examples/s (per chip) over a window of steps/epochs."""

    def __init__(self, n_devices: int = 1):
        self.n_devices = max(1, n_devices)
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._examples = 0

    def add(self, n_examples: int):
        self._examples += n_examples

    @property
    def examples_per_s(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._examples / dt if dt > 0 else 0.0

    @property
    def examples_per_s_per_chip(self) -> float:
        return self.examples_per_s / self.n_devices
