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


def make_mesh_2d(n_data, n_space, devices=None,
                 data_axis="data", space_axis="space"):
    """2-D (data x space) mesh: batch over ``data``, the pseudo-image's H
    dimension over ``space`` (this workload's sequence-parallelism analog,
    SURVEY §2.9)."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_space
    if len(devices) < need:
        raise ValueError(
            f"requested a {n_data}x{n_space} mesh but only "
            f"{len(devices)} JAX device(s) exist "
            f"(backend={jax.default_backend()!r})")
    grid = np.array(devices[:need]).reshape(n_data, n_space)
    return Mesh(grid, (data_axis, space_axis))


def _space_constraint(mesh, data_axis, space_axis):
    """Sharding hint on the (B, H, W, C) head outputs: H over ``space``.
    XLA's SPMD partitioner propagates it backward through the whole conv
    stack (grid scatter, vertical encoder, RPN) inserting halo exchanges
    over ICI — so the big grid activations are split per chip and per-chip
    HBM stops capping the batch size."""
    sh = NamedSharding(mesh, P(data_axis, space_axis, None, None))

    def constrain(outs):
        return tuple(jax.lax.with_sharding_constraint(o, sh) for o in outs)

    return constrain


def make_sharded_train_step(model, tx, mesh, axis_name="data",
                            space_axis=None, donate=True,
                            microbatch=None):
    """Mesh-parallel train step: state replicated, batch sharded over
    ``axis_name``; with ``space_axis`` set (2-D mesh) the pseudo-image's H
    dimension is additionally sharded over it.

    Delegates to ``model.train_step_fn`` — the SAME closure the
    single-chip path jits — so on-device augmentation (``device_augment``
    rng threading) and loss semantics are identical by construction.  The
    per-device batch slice is ``batch_size / mesh.shape[axis_name]``;
    batch_size must divide evenly.  Loss reductions (masked sums /
    avg_factor) are global sums the partitioner turns into psums, so
    sharded training matches single-device large-batch training.

    ``microbatch`` (global chunk size, must be divisible by the data-axis
    size) runs the gradient-accumulation step instead — ``lax.scan`` over
    ``batch/microbatch`` chunks, each chunk itself batch-sharded over the
    mesh, with exact pooled avg_factor normalization
    (detector.train_step_accum_fn): the formulation for global batches
    whose monolithic activations exceed per-chip HBM.
    """
    repl = replicate(mesh)
    bsh = shard_batch(mesh, axis_name)
    constraint = None
    if space_axis is not None:
        if space_axis not in mesh.axis_names:
            raise ValueError(f"mesh has no {space_axis!r} axis: "
                             f"{mesh.axis_names}")
        constraint = _space_constraint(mesh, axis_name, space_axis)

    # pallas="off": GSPMD has no partitioning rule for Mosaic custom
    # calls — inside a mesh-jitted program they would be replicated per
    # chip (full-size grid build / 1.9M-anchor assignment on EVERY
    # device), defeating the sharding; the XLA formulations of the same
    # math partition cleanly and are numerically identical.  The
    # assignment — the expensive piece (~250 ms/step single-chip saved
    # by its fused Pallas geometry) — gets its Pallas path back through
    # a shard_map island over the data axis: each device runs the
    # kernels on its LOCAL batch items, so Mosaic never meets GSPMD.
    if microbatch is None:
        step = model.train_step_fn(tx, out_constraint=constraint,
                                   pallas="off",
                                   assign_shard=(mesh, axis_name))
    else:
        if int(microbatch) % mesh.shape[axis_name]:
            raise ValueError(
                f"microbatch {microbatch} not divisible by the "
                f"{axis_name!r} axis size {mesh.shape[axis_name]}")
        step = model.train_step_accum_fn(tx, int(microbatch),
                                         pallas="off",
                                         out_constraint=constraint,
                                         assign_shard=(mesh, axis_name))
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
        # (pallas="off": Mosaic custom calls have no GSPMD rule)
        outs, _ = model.apply(variables, batch, train=False, pallas="off")
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


def _island_forward(model, mesh, axis_name, pallas):
    """Eval-mode forward (voxelize -> head outputs) as a ``shard_map``
    island over the batch axis.

    Eval forward is per-item independent — batch norm reads running stats,
    so no cross-device reduction exists anywhere in it.  Running it inside
    ``shard_map`` (each device traces a LOCAL-batch program) instead of
    under GSPMD keeps every Pallas kernel live on the mesh path: Mosaic
    custom calls never reach the partitioner, which has no rule for them.
    This is the same island technique round 4 proved for the training
    assignment (models/detector.py loss(assign_shard=...)); round-4 left
    mesh inference paying the XLA lowerings (grid scatter alone: 45.7 ms
    XLA vs 20.3 ms Pallas, ROADMAP.md).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fwd(variables, points, num_points):
        outs, _ = model.apply(
            variables, {"points": points, "num_points": num_points},
            train=False, pallas=pallas)
        return outs

    def forward(variables, batch):
        # check_vma=False: replicated variables mix with sharded batch
        # operands inside the voxelizer's scans (same waiver as the
        # assignment island, models/detector.py)
        return shard_map(
            fwd, mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name)),
            out_specs=P(axis_name), check_vma=False,
        )(variables, batch["points"], batch["num_points"])

    return forward


def make_sharded_eval_fn(model, mesh, axis_name="data", pallas="auto"):
    """Data-parallel eval: losses + decoded detections, batch sharded.

    The forward runs in a per-device ``shard_map`` island (Pallas kernels
    stay live, see :func:`_island_forward`); the losses — whose
    ``avg_factor`` reductions are GLOBAL batch sums — stay under GSPMD,
    which lowers them to psums, and the assignment reopens its own island
    via ``assign_shard`` exactly as mesh training does.
    """
    repl = replicate(mesh)
    bsh = shard_batch(mesh, axis_name)
    forward = _island_forward(model, mesh, axis_name, pallas)

    def eval_step(variables, batch, anchors, anchor_aabb):
        outs = forward(variables, batch)
        losses = model.loss(outs, batch, anchors, anchor_aabb,
                            pallas="off",
                            assign_shard=(mesh, axis_name))
        cls, reg, dirs = outs
        preds = jax.vmap(model._predict_single,
                         in_axes=(0, 0, 0, None))(cls, reg, dirs, anchors)
        return losses, preds

    jitted = jax.jit(eval_step,
                     in_shardings=(repl, bsh, repl, repl),
                     out_shardings=(repl, bsh))

    def run(variables, batch):
        return jitted(variables, batch, model.anchors, model.anchor_aabb)

    return run


def make_sharded_predict_fn(model, mesh, axis_name="data", pallas="auto"):
    """Data-parallel inference: variables replicated, batch + detections
    sharded over the batch dimension.

    The voxelize->head forward runs inside a ``shard_map`` island so the
    Pallas kernels (voxel scan, grid scatter, fused stages) stay live per
    device (see :func:`_island_forward`); decode + NMS are plain XLA and
    partition over the batch under GSPMD as before.
    """
    repl = replicate(mesh)
    bsh = shard_batch(mesh, axis_name)
    forward = _island_forward(model, mesh, axis_name, pallas)

    def predict(variables, batch, anchors):
        cls, reg, dirs = forward(variables, batch)
        return jax.vmap(model._predict_single,
                        in_axes=(0, 0, 0, None))(cls, reg, dirs, anchors)

    jitted = jax.jit(predict, in_shardings=(repl, bsh, repl),
                     out_shardings=bsh)

    def run(variables, batch):
        return jitted(variables, batch, model.anchors)

    return run
