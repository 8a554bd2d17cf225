"""Ahead-of-time export of the inference program for serving.

The reference has no deployment story beyond "run the torch module in
Python" (its inference entry is pipeline/pipeline.py:132-158 re-loading
a pickle per call).  Here the whole jitted predict program — voxelize ->
PFN -> vertical encoder -> RPN -> head -> decode -> NMS, weights and
anchors baked in as constants — is serialized with ``jax.export`` to a
self-contained StableHLO artifact that a serving process can reload and
call WITHOUT this package, its config system, or the checkpoint format:
only jax is needed on the serving side, and the artifact pins the
calling convention (static padded shapes) at export time.

Artifact layout (a directory):
    model.jaxexport   serialized StableHLO + calling convention
    manifest.json     input/output shapes, budgets, platform, versions
"""

import json
import os

import numpy as np

import jax
from jax import export as jax_export
import jax.numpy as jnp

_MANIFEST = "manifest.json"
_PAYLOAD = "model.jaxexport"


def export_predict(model, variables, batch_size=1, platforms=None):
    """Export the model's full jitted predict program.

    Args:
        model: a constructed ``PointPillars`` detector.
        variables: {"params", "batch_stats"} to bake into the program.
        batch_size: static serving batch size.
        platforms: lowering platform list, e.g. ["tpu"] or ["cpu"];
            defaults to the current backend.
    Returns:
        (payload_bytes, manifest_dict).
    """
    p = int(model.tpu_cfg["max_points_static"])
    c = len(model.input_features)
    b = int(batch_size)
    spec = {
        "points": jax.ShapeDtypeStruct((b, p, c), jnp.float32),
        "num_points": jax.ShapeDtypeStruct((b,), jnp.int32),
    }
    frozen = jax.tree.map(jnp.asarray, variables)
    anchors = model.anchors
    platforms = list(platforms or [jax.default_backend()])
    # Pallas kernels lower only for the TPU platform; the in-model gates
    # check the PROCESS backend, which may differ from the export target
    # (e.g. exporting a cpu artifact from a TPU session) — route them
    # explicitly by the target platform set
    pallas = ("auto" if platforms == ["tpu"]
              and jax.default_backend() == "tpu" else "off")

    def serve(batch):
        return model.predict(
            {"params": frozen["params"],
             "batch_stats": frozen["batch_stats"]}, batch, anchors,
            pallas=pallas)
    exported = jax_export.export(jax.jit(serve), platforms=platforms)(spec)
    out_shapes = {
        k: (list(v.shape), str(np.dtype(v.dtype)))
        for k, v in jax.eval_shape(serve, spec).items()}
    manifest = {
        "framework": "objectdetection_3d_tpu",
        "jax_version": jax.__version__,
        "platforms": platforms,
        "batch_size": b,
        "inputs": {k: (list(v.shape), str(np.dtype(v.dtype)))
                   for k, v in spec.items()},
        "outputs": out_shapes,
        "max_points_static": p,
        "input_features": list(model.input_features),
        "classes": list(getattr(model, "classes", [])) or None,
    }
    return exported.serialize(), manifest


def save_exported(payload, manifest, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PAYLOAD), "wb") as f:
        f.write(payload)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)


def load_serving(path):
    """Reload an exported artifact directory.

    Returns:
        (serve_fn, manifest): ``serve_fn(batch_dict) -> detections`` with
        the static shapes recorded in the manifest.
    """
    with open(os.path.join(path, _PAYLOAD), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)

    def serve(batch):
        return exported.call(batch)

    return serve, manifest
