"""Tracing / profiling utilities (SURVEY §5: absent in the reference,
first-class here).

* :class:`StepTimer` — cheap wall-clock step statistics for the train loop.
* :func:`trace` — context manager around ``jax.profiler`` producing a
  Perfetto/TensorBoard trace directory.
* :func:`device_memory_stats` — best-effort HBM usage snapshot.
"""

import contextlib
import logging
import time

import jax

log = logging.getLogger(__name__)


class StepTimer:
    """Rolling step-time statistics, logged every ``log_every`` steps."""

    def __init__(self, log_every=50, name="train"):
        self.log_every = int(log_every)
        self.name = name
        self.reset()

    def reset(self):
        self._count = 0
        self._window_start = time.time()
        self.last_rate = None

    def step(self):
        """Record one step; returns steps/sec when a window closes."""
        self._count += 1
        if self._count % self.log_every == 0:
            now = time.time()
            rate = self.log_every / (now - self._window_start)
            self._window_start = now
            self.last_rate = rate
            log.info("%s: %.2f steps/s (%.1f ms/step)", self.name, rate,
                     1000.0 / rate)
            return rate
        return None


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    """Capture a ``jax.profiler`` trace into ``log_dir``.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def device_memory_stats(device=None):
    """Best-effort device memory stats dict ({} when unsupported)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


def annotate(name):
    """Named profiler span for host-side phases."""
    return jax.profiler.TraceAnnotation(name)


class TensorBoardLogger:
    """Optional TensorBoard scalar stream next to the csv/yaml artifacts.

    The reference logs only to text files / csv (pipeline/pipeline.py:
    442-447,472-475); SURVEY §5 plans the same artifact set "+ optional
    TensorBoard scalars".  Disabled (all no-ops) unless ``enabled`` and
    ``torch.utils.tensorboard`` import cleanly — never a hard dependency.
    """

    def __init__(self, enabled, log_dir):
        self._w = None
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter
            import os
            self._w = SummaryWriter(os.path.join(str(log_dir), "tb"))
            log.info("TensorBoard scalars in %s/tb", log_dir)
        except Exception as e:  # noqa: BLE001 — optional dependency
            log.warning("tensorboard requested but unavailable (%s); "
                        "scalar stream disabled", e)

    def scalar(self, tag, value, step):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), int(step))

    def scalars(self, prefix, values, step):
        for k, v in values.items():
            self.scalar(f"{prefix}/{k}", v, step)

    def close(self):
        if self._w is not None:
            self._w.flush()
            self._w.close()
            self._w = None
