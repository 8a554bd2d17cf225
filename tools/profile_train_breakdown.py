"""One-off: where does the flagship train step's time go?

Isolates, on the real chip (each its own jit program, pipelined timing
with one final readback):
  1. the full default train step (the bench number)
  2. network forward+backward alone (sum-of-outputs loss)
  3. loss given head outputs: forward value only
  4. loss given head outputs: value + grads wrt outputs
  5. assignment alone (vmapped exactly as the loss calls it)
  6. AdamW update alone

    python tools/profile_train_breakdown.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(jax.device_get(leaves[0])).sum())


def timeit(name, fn, *args, iters=6, warmup=1):
    t0 = time.time()
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    first = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    med = (time.time() - t0) / iters * 1000
    print(f"{name:48s} {med:9.1f} ms  (first {first:.1f}s)", flush=True)
    return med


def main():
    sys.path.insert(0, ".")
    import __graft_entry__ as g
    from objectdetection_3d_tpu.models import PointPillars
    from objectdetection_3d_tpu.models.assign import assign_targets

    model = PointPillars(**g._flagship_cfg())
    variables = model.init_variables(jax.random.PRNGKey(0))
    batch = g._synth_batch(1, model.tpu_cfg["max_points_static"],
                           model.tpu_cfg["max_gt_static"],
                           model.point_cloud_range, n_points=100_000)
    anchors = jnp.asarray(model.anchors)
    aabb = model.anchor_aabb
    n = anchors.shape[0]
    c = max(model.num_classes, 1)

    # 1. full train step
    tx = model.get_optimizer(dict(lr=1e-4, betas=[0.95, 0.99],
                                  weight_decay=0.01), grad_clip_value=2.0)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": tx.init(variables["params"])}
    step = model.make_train_step(tx, donate=False)
    timeit("train step (full default)", step, state, batch)

    # 2. network fwd+bwd alone (dummy scalar loss over outputs).
    # NOTE the grads must feed the returned value or XLA dead-code
    # eliminates the whole backward pass.
    pvars = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}

    def _grad_sum(grads):
        return sum(jnp.sum(gr.astype(jnp.float32))
                   for gr in jax.tree_util.tree_leaves(grads))

    def make_net_fwd_bwd(m):
        @jax.jit
        def net_fwd_bwd(v, b):
            def f(params):
                outs, _ = m.apply({"params": params,
                                   "batch_stats": v["batch_stats"]},
                                  b, train=True)
                cls, reg, dirs = outs
                return (jnp.sum(cls.astype(jnp.float32))
                        + jnp.sum(reg.astype(jnp.float32))
                        + jnp.sum(dirs.astype(jnp.float32)))
            val, grads = jax.value_and_grad(f)(v["params"])
            return val + _grad_sum(grads)
        return net_fwd_bwd

    timeit("network fwd+bwd (grads consumed, remat)",
           make_net_fwd_bwd(model), pvars, batch)

    model_noremat = None
    try:
        from objectdetection_3d_tpu.models import PointPillars as _PP
        model_noremat = _PP(**g._flagship_cfg({"remat": False}))
        timeit("network fwd+bwd (grads consumed, NO remat)",
               make_net_fwd_bwd(model_noremat), pvars, batch)
    except Exception as e:  # noqa: BLE001 — OOM expected at flagship scale
        print(f"no-remat fwd+bwd failed: {type(e).__name__}: {e}",
              flush=True)

    @jax.jit
    def net_fwd(v, b):
        outs, _ = model.apply(v, b, train=True)
        return outs[0]
    timeit("network fwd only", net_fwd, pvars, batch)

    # head-output-shaped dummies for the loss-only programs
    key = jax.random.PRNGKey(1)
    cls = jax.random.normal(key, (1, n, c), jnp.float32) * 0.1
    reg = jax.random.normal(key, (1, n, 9), jnp.float32) * 0.1
    dirs = jax.random.normal(key, (1, n, 6), jnp.float32) * 0.1
    outs = (cls, reg, dirs)

    @jax.jit
    def loss_fwd(outs, b):
        return sum(model.loss(outs, b, anchors, aabb).values())
    timeit("loss fwd (incl assignment)", loss_fwd, outs, batch)

    @jax.jit
    def loss_fwd_bwd(outs, b):
        def f(o):
            return sum(model.loss(o, b, anchors, aabb).values())
        val, grads = jax.value_and_grad(f)(outs)
        return val + _grad_sum(grads)
    timeit("loss fwd+bwd wrt outputs (incl assignment)",
           loss_fwd_bwd, outs, batch)

    # no-remat full train step, if it fits
    if model_noremat is not None:
        try:
            tx2 = model_noremat.get_optimizer(
                dict(lr=1e-4, betas=[0.95, 0.99], weight_decay=0.01),
                grad_clip_value=2.0)
            state2 = {"params": variables["params"],
                      "batch_stats": variables["batch_stats"],
                      "opt_state": tx2.init(variables["params"])}
            step2 = model_noremat.make_train_step(tx2, donate=False)
            timeit("train step (NO remat)", step2, state2, batch)
        except Exception as e:  # noqa: BLE001
            print(f"no-remat train step failed: {type(e).__name__}: {e}",
                  flush=True)

    # 5. assignment alone, exactly as the loss invokes it (anchors as a
    # jit ARGUMENT — baking the 1.9M-row constant changes layouts and
    # measured 2.2x slower)
    @jax.jit
    def assign_only(b, anchors, aabb):
        return jax.vmap(
            lambda gt, lbl, msk: assign_targets(
                anchors, gt, lbl, msk,
                pos_thr=model._pos_thr, neg_thr=model._neg_thr,
                candidates_per_gt=int(
                    model.tpu_cfg["assign_candidates_per_gt"]),
                num_classes=model.num_classes, anchor_aabb=aabb,
                prefilter=str(
                    model.tpu_cfg.get("assign_prefilter", "approx")),
                prefilter_block=int(
                    model.tpu_cfg.get("assign_prefilter_block", 128)),
                layout=model.anchor_layout,
                exact_anchor_tier=bool(
                    model.tpu_cfg.get("assign_exact_anchor_tier", True)))
        )(b["bboxes"], b["labels"], b["gt_mask"])["target_deltas"]
    timeit("assignment alone (vmapped)", assign_only, batch, anchors, aabb)

    # 6. optimizer update alone
    grads = jax.tree_util.tree_map(jnp.ones_like, variables["params"])

    @jax.jit
    def opt_only(st, gr):
        updates, new_opt = tx.update(gr, st["opt_state"], st["params"])
        import optax
        new_params = optax.apply_updates(st["params"], updates)
        return new_params
    timeit("AdamW update alone", opt_only, state, grads)


if __name__ == "__main__":
    main()
