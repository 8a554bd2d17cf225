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

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_ckpt(path, epoch, state, backend="pickle"):
    """Write a training-state checkpoint.

    Args:
        path: destination file (pickle) / directory (orbax).
        epoch: int epoch number.
        state: dict with 'params', 'batch_stats', 'opt_state'.
        backend: 'pickle' or 'orbax'.
    """
    payload = {
        "epoch": int(epoch),
        "params": _to_host(state["params"]),
        "batch_stats": _to_host(state["batch_stats"]),
        "opt_state": _to_host(state["opt_state"]),
    }
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), payload, force=True)
        return
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


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
