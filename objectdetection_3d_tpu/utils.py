"""Small host-side helpers (mirrors reference utils.py:1-35 surface)."""

import os


def make_dir(folder_name):
    """Create a directory, doing nothing if it already exists."""
    os.makedirs(folder_name, exist_ok=True)


def convert_device_name(device):
    """Normalize a device string to 'cpu' / 'tpu'.

    The reference normalizes to cpu/cuda (utils.py:6-16); the TPU build
    accepts its historical names too and maps accelerators to 'tpu'.
    """
    accel_names = ["gpu", "cuda", "tpu", "accelerator"]
    cpu_names = ["cpu"]
    name = device.split(":")[0]
    if name not in cpu_names + accel_names:
        raise KeyError(
            "the device should be one of {} but got {}".format(
                cpu_names + accel_names, device))
    return "cpu" if name in cpu_names else "tpu"


def convert_framework_name(framework):
    """Normalize framework name; this build is JAX-only."""
    jax_names = ["jax", "JAX", "tpu", "torch", "pytorch", "PyTorch", "tf",
                 "tensorflow", "TF"]
    if framework not in jax_names:
        raise KeyError("unknown framework {}".format(framework))
    return "jax"
