"""Lightweight profiling helpers.

The reference has no tracing or timing at all (SURVEY.md §5); these are
the TPU-era equivalents: a wall-clock timer with a trustworthy device
fence, and a context manager around ``jax.profiler`` traces viewable in
TensorBoard/Perfetto.
"""

import contextlib
import time

import jax


class Timer:
    """Wall-clock timer that fences device work.

    ``block_until_ready`` on a tunneled TPU is not always a reliable
    fence; materializing a scalar reduction to host is. ``stop(x)``
    therefore accepts an optional array to fence on.
    """

    def __init__(self):
        self.laps = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, fence_on=None):
        if fence_on is not None:
            jax.block_until_ready(fence_on)
            try:  # scalar materialization: the only guaranteed fence
                float(jax.numpy.asarray(fence_on).ravel()[0])
            except (TypeError, IndexError):
                pass
        lap = time.perf_counter() - self._t0
        self.laps.append(lap)
        return lap

    @property
    def best(self):
        return min(self.laps) if self.laps else float("nan")

    @property
    def mean(self):
        return sum(self.laps) / len(self.laps) if self.laps else float("nan")


@contextlib.contextmanager
def trace(log_dir: str):
    """Record a jax.profiler trace of the enclosed block.

    View with ``tensorboard --logdir <log_dir>`` or upload the contained
    .trace.json.gz to Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
