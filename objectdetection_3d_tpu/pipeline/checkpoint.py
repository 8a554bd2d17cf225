"""Checkpoint serialization for JAX pytrees.

The reference pickles ``{epoch, model_state_dict, optimizer_state_dict}``
into ``ckpt_{epoch:05d}.pth`` / ``ckpt_best.pth`` (pipeline/pipeline.py:36-50).
This build keeps the same file-naming policy with two interchangeable
backends behind one API:

* ``pickle`` (default): flax pytrees in ``.pkl`` files —
  ``{epoch, params, batch_stats, opt_state}``.
* ``orbax``: ``ckpt_*.orbax`` directories written through
  ``orbax.checkpoint`` (async-capable, multi-host-safe); selected with
  ``ckpt_backend: orbax`` in the pipeline config.
"""

import os
import pickle
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np


def _to_host(tree):
    # np.array (not asarray): host numpy leaves must be COPIED so the
    # async writer's snapshot is immune to later in-place updates
    return jax.tree_util.tree_map(lambda x: np.array(x), tree)


def _snapshot(epoch, state):
    return {
        "epoch": int(epoch),
        "params": _to_host(state["params"]),
        "batch_stats": _to_host(state["batch_stats"]),
        "opt_state": _to_host(state["opt_state"]),
    }


def _write(path, payload, backend):
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), payload, force=True)
        return
    # temp-file + rename: a preemption mid-write never leaves a truncated
    # checkpoint under the final name
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def save_ckpt(path, epoch, state, backend="pickle"):
    """Write a training-state checkpoint.

    Args:
        path: destination file (pickle) / directory (orbax).
        epoch: int epoch number.
        state: dict with 'params', 'batch_stats', 'opt_state'.
        backend: 'pickle' or 'orbax'.
    """
    _write(path, _snapshot(epoch, state), backend)


class AsyncSaver:
    """Background checkpoint writer (the survey's orbax-async analog,
    uniform over both backends).

    ``save`` snapshots the state to host memory synchronously — after it
    returns the caller may freely mutate or donate the device buffers —
    and hands serialization + file IO to a single worker thread so the
    train loop never blocks on disk.  ``wait`` drains pending writes and
    re-raises the first write error.
    """

    def __init__(self):
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer")
        self._pending = []

    def save(self, path, epoch, state, backend="pickle"):
        payload = _snapshot(epoch, state)
        self._pending = [f for f in self._pending if not f.done()]
        self._pending.append(
            self._executor.submit(_write, path, payload, backend))

    def wait(self):
        pending, self._pending = self._pending, []
        for f in pending:
            f.result()


def load_ckpt(path, backend=None):
    """Read a checkpoint; returns the payload dict (host numpy pytrees).

    ``backend=None`` infers from the path (directory -> orbax).
    """
    if backend is None:
        backend = "orbax" if os.path.isdir(path) else "pickle"
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return pickle.load(f)
