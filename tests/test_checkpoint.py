"""Checkpoint IO: async writer, atomicity, roundtrip."""

import os
import pickle

import numpy as np
import pytest

pytest.importorskip("jax")

from objectdetection_3d_tpu.pipeline import checkpoint as ckpt_io  # noqa


def _state():
    return {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "batch_stats": {"mean": np.zeros(3, np.float32)},
        "opt_state": {"mu": {"w": np.ones((2, 3), np.float32)}},
    }


def test_async_saver_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt_00003.pkl")
    saver = ckpt_io.AsyncSaver()
    state = _state()
    saver.save(path, 3, state, backend="pickle")
    # the snapshot is taken before save() returns: mutating afterwards
    # must not leak into the file
    state["params"]["w"] += 100.0
    saver.wait()

    payload = ckpt_io.load_ckpt(path)
    assert payload["epoch"] == 3
    np.testing.assert_array_equal(
        payload["params"]["w"],
        np.arange(6, dtype=np.float32).reshape(2, 3))
    assert not os.path.exists(path + ".tmp")


def test_async_saver_error_propagates(tmp_path):
    saver = ckpt_io.AsyncSaver()
    saver.save(str(tmp_path / "no_such_dir" / "x.pkl"), 0, _state())
    with pytest.raises(OSError):
        saver.wait()
    # a failed write leaves the saver reusable
    ok = str(tmp_path / "ok.pkl")
    saver.save(ok, 1, _state())
    saver.wait()
    assert ckpt_io.load_ckpt(ok)["epoch"] == 1


def test_sync_write_is_atomic(tmp_path):
    """A pre-existing checkpoint survives a failed overwrite."""
    path = str(tmp_path / "ckpt.pkl")
    ckpt_io.save_ckpt(path, 1, _state())

    class Boom:
        def __reduce__(self):
            raise RuntimeError("not picklable")

    bad = _state()
    bad["params"]["w"] = Boom()
    with pytest.raises(Exception):
        ckpt_io.save_ckpt(path, 2, bad)
    assert ckpt_io.load_ckpt(path)["epoch"] == 1
