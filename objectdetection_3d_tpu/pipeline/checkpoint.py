"""Checkpoint serialization for JAX pytrees.

The reference pickles ``{epoch, model_state_dict, optimizer_state_dict}``
into ``ckpt_{epoch:05d}.pth`` / ``ckpt_best.pth`` (pipeline/pipeline.py:36-50).
This build keeps the same file-naming policy with flax-serialized pytrees in
``.pkl`` files: ``{epoch, params, batch_stats, opt_state}``.
"""

import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_ckpt(path, epoch, state):
    """Write a training-state checkpoint.

    Args:
        path: destination file.
        epoch: int epoch number.
        state: dict with 'params', 'batch_stats', 'opt_state'.
    """
    payload = {
        "epoch": int(epoch),
        "params": _to_host(state["params"]),
        "batch_stats": _to_host(state["batch_stats"]),
        "opt_state": _to_host(state["opt_state"]),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_ckpt(path):
    """Read a checkpoint; returns the payload dict (host numpy pytrees)."""
    with open(path, "rb") as f:
        return pickle.load(f)
