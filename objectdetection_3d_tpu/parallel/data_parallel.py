"""Multi-chip data parallelism via `jax.sharding.Mesh` + jit partitioning.

The reference is strictly single-device (no torch.distributed / NCCL
anywhere; see SURVEY §2.9).  The TPU build scales the same training step
over an ICI mesh the idiomatic way: parameters replicated, the batch
dimension sharded over the ``data`` axis, and XLA inserting the gradient
``psum`` and the cross-device batch-norm reductions automatically from the
sharding annotations — no hand-written communication backend.

Masked batch norm composes correctly under this partitioning: its
statistics are global sums over the batch, which the partitioner lowers to
``all-reduce`` over ICI, so sharded training is numerically identical to
single-chip large-batch training.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """1-D device mesh over the first ``n_devices`` devices.

    Raises if fewer than ``n_devices`` devices exist: a mesh that silently
    shrinks to the available device count would make every multi-chip test
    pass while testing nothing.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} JAX device(s) exist "
                f"(backend={jax.default_backend()!r}); for virtual CPU "
                "devices set XLA_FLAGS=--xla_force_host_platform_device_"
                f"count={n_devices} and jax_platforms=cpu BEFORE first use")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicate(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, axis_name="data"):
    """Sharding that splits the leading (batch) dim of every leaf."""
    return NamedSharding(mesh, P(axis_name))


def make_sharded_train_step(model, tx, mesh, axis_name="data",
                            donate=True):
    """Data-parallel train step: state replicated, batch sharded.

    The per-device batch slice is ``batch_size / mesh.size``; batch_size
    must divide evenly.  Loss semantics are identical to single-device
    because every reduction in the loss (masked sums / avg_factor) is a
    global sum the partitioner turns into a psum.
    """
    repl = replicate(mesh)
    bsh = shard_batch(mesh, axis_name)

    def step(state, batch, anchors, anchor_aabb):
        import optax

        def loss_closure(params):
            variables = {"params": params,
                         "batch_stats": state["batch_stats"]}
            outs, new_bs = model.apply(variables, batch, train=True)
            losses = model.loss(outs, batch, anchors, anchor_aabb)
            total = sum(losses.values())
            return total, (losses, new_bs)

        grads, (losses, new_bs) = jax.grad(
            loss_closure, has_aux=True)(state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return ({"params": new_params, "batch_stats": new_bs,
                 "opt_state": new_opt}, losses)

    jitted = jax.jit(
        step,
        in_shardings=(repl, bsh, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )

    def run(state, batch):
        # anchors ride as replicated arguments, not baked-in constants
        return jitted(state, batch, model.anchors, model.anchor_aabb)

    return run


def make_spatial_predict_fn(model, mesh, data_axis="data",
                            space_axis="space"):
    """2-D parallel inference: batch over ``data`` AND the pseudo-image's
    H dimension over ``space``.

    Spatial sharding is this workload's sequence-parallelism analog
    (SURVEY §2.9): the SPMD partitioner splits the dense grid and every
    conv over the ``space`` axis, inserting halo exchanges over ICI
    automatically — the in-XLA version of pipeline/tiled_inference.py.
    """
    from jax.sharding import PartitionSpec

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(data_axis))

    def predict(variables, batch, anchors):
        # voxelization + PFN run data-parallel; the grid scatter + convs
        # run with H sharded over `space` from the output constraint below
        outs, _ = model.apply(variables, batch, train=False)
        cls, reg, dirs = outs
        spec = PartitionSpec(data_axis, space_axis, None, None)
        cls = jax.lax.with_sharding_constraint(
            cls, NamedSharding(mesh, spec))
        reg = jax.lax.with_sharding_constraint(
            reg, NamedSharding(mesh, spec))
        dirs = jax.lax.with_sharding_constraint(
            dirs, NamedSharding(mesh, spec))
        return jax.vmap(model._predict_single,
                        in_axes=(0, 0, 0, None))(cls, reg, dirs, anchors)

    jitted = jax.jit(predict, in_shardings=(repl, bsh, repl),
                     out_shardings=bsh)

    def run(variables, batch):
        return jitted(variables, batch, model.anchors)

    return run


def make_sharded_predict_fn(model, mesh, axis_name="data"):
    """Data-parallel inference: variables replicated, batch + detections
    sharded over the batch dimension."""
    repl = replicate(mesh)
    bsh = shard_batch(mesh, axis_name)

    def predict(variables, batch, anchors):
        return model.predict(variables, batch, anchors)

    jitted = jax.jit(predict, in_shardings=(repl, bsh, repl),
                     out_shardings=bsh)

    def run(variables, batch):
        return jitted(variables, batch, model.anchors)

    return run
