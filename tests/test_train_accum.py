"""Gradient-accumulation train step (detector.train_step_accum_fn).

BASELINE config #3 names batch 8; the monolithic B=8 program exhausts
this chip's HBM (tools/bisect_b8.py: the dense-grid scatter + encoder
stages RESOURCE_EXHAUST), so large batches run as ``lax.scan`` over
microbatches inside one jit.  These tests pin its spec:

* microbatch == batch (one chunk) is bit-equivalent to the monolithic
  step — same forward, same pooled normalization, same AdamW update;
* multi-chunk accumulation matches a hand-rolled oracle that runs each
  microbatch forward sequentially (threading BN stats), scales each
  gradient back to its un-normalized sum by ``max(n_pos_i, 1)``, and
  divides the total by the POOLED ``max(sum n_pos_i, 1)`` — the
  reference's batch-wide avg_factor semantics
  (reference model/PointPillars.py:213-218), not mean-of-means;
* a microbatch with zero GT boxes (where mean-of-means diverges
  hardest) stays finite and still matches the oracle.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from tiny import tiny_batch, tiny_model_cfg  # noqa: E402


@pytest.fixture(scope="module")
def model_and_vars():
    model = PointPillars(**tiny_model_cfg())
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def to_device(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def fresh_state(model, variables, tx):
    return {"params": jax.tree_util.tree_map(jnp.array,
                                             variables["params"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.array, variables["batch_stats"]),
            "opt_state": tx.init(variables["params"])}


def make_tx(model):
    return model.get_optimizer(dict(lr=3e-3, betas=[0.95, 0.99],
                                    weight_decay=0.01),
                               grad_clip_value=2.0)


def oracle_accum_step(model, tx, state, batch, microbatch):
    """Sequential-microbatch pooled-normalization reference (plain
    Python loop, no scan)."""
    import optax

    b = batch["points"].shape[0]
    n_micro = b // microbatch
    bs = state["batch_stats"]
    g_acc = jax.tree_util.tree_map(jnp.zeros_like, state["params"])
    l_acc = None
    n_total = 0.0
    for i in range(n_micro):
        mb = {k: v[i * microbatch:(i + 1) * microbatch]
              for k, v in batch.items()}

        def closure(params, bs=bs, mb=mb):
            variables = {"params": params, "batch_stats": bs}
            outs, new_bs = model.apply(variables, mb, train=True)
            losses, n_pos = model.loss(outs, mb, with_num_pos=True)
            return sum(losses.values()), (losses, n_pos, new_bs)

        grads, (losses, n_pos, bs) = jax.grad(
            closure, has_aux=True)(state["params"])
        avg_i = jnp.maximum(n_pos, 1.0)
        g_acc = jax.tree_util.tree_map(
            lambda a, g: a + g * avg_i.astype(g.dtype), g_acc, grads)
        sums = {k: v * avg_i for k, v in losses.items()}
        l_acc = sums if l_acc is None else {
            k: l_acc[k] + v for k, v in sums.items()}
        n_total = n_total + n_pos
    af = jnp.maximum(n_total, 1.0)
    grads = jax.tree_util.tree_map(lambda g: g / af.astype(g.dtype), g_acc)
    losses = {k: v / af for k, v in l_acc.items()}
    updates, new_opt = tx.update(grads, state["opt_state"],
                                 state["params"])
    new_params = optax.apply_updates(state["params"], updates)
    return {"params": new_params, "batch_stats": bs,
            "opt_state": new_opt}, losses


def assert_trees_close(a, b, rtol, atol):
    fa, treedef_a = jax.tree_util.tree_flatten(a)
    fb, treedef_b = jax.tree_util.tree_flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(la, np.float64),
                                   np.asarray(lb, np.float64),
                                   rtol=rtol, atol=atol)


def test_single_chunk_matches_monolithic_step(model_and_vars):
    model, variables = model_and_vars
    batch = to_device(tiny_batch(batch_size=4, seed=3))
    tx = make_tx(model)

    mono = model.make_train_step(tx, donate=False)
    s_mono, l_mono = mono(fresh_state(model, variables, tx), batch)

    accum = model.make_train_step(tx, donate=False, microbatch=4)
    s_acc, l_acc = accum(fresh_state(model, variables, tx), batch)

    # identical forward + normalization; only op scheduling differs.
    # Losses are bit-close; params pass through AdamW's m/sqrt(v) which
    # amplifies last-ulp reorder noise (the grad*avg/avg roundtrip), so
    # they get fp headroom (measured worst deviation 5e-6 abs).
    assert_trees_close(l_mono, l_acc, rtol=1e-6, atol=1e-8)
    assert_trees_close(s_mono["params"], s_acc["params"],
                       rtol=1e-3, atol=2e-5)
    assert_trees_close(s_mono["batch_stats"], s_acc["batch_stats"],
                       rtol=1e-5, atol=1e-7)


def test_multi_chunk_matches_sequential_oracle(model_and_vars):
    model, variables = model_and_vars
    batch = to_device(tiny_batch(batch_size=4, seed=5))
    tx = make_tx(model)

    accum = model.make_train_step(tx, donate=False, microbatch=2)
    s_acc, l_acc = accum(fresh_state(model, variables, tx), batch)

    s_ref, l_ref = oracle_accum_step(
        model, tx, fresh_state(model, variables, tx), batch, microbatch=2)

    assert_trees_close(l_ref, l_acc, rtol=1e-5, atol=1e-7)
    assert_trees_close(s_ref["params"], s_acc["params"],
                       rtol=1e-3, atol=2e-5)
    assert_trees_close(s_ref["batch_stats"], s_acc["batch_stats"],
                       rtol=1e-5, atol=1e-7)


def test_zero_gt_microbatch_pooled_normalization(model_and_vars):
    """One microbatch carries no GT boxes: its positive count is 0 and
    mean-of-means would divide that chunk's classification sum by 1
    instead of the pooled count.  The accum step must stay finite and
    match the pooled oracle."""
    model, variables = model_and_vars
    raw = tiny_batch(batch_size=4, seed=9)
    raw["gt_mask"][2:] = False          # second chunk: zero positives
    raw["bboxes"][2:] = 0.0
    batch = to_device(raw)
    tx = make_tx(model)

    accum = model.make_train_step(tx, donate=False, microbatch=2)
    s_acc, l_acc = accum(fresh_state(model, variables, tx), batch)
    for k, v in l_acc.items():
        assert np.isfinite(float(v)), k

    s_ref, l_ref = oracle_accum_step(
        model, tx, fresh_state(model, variables, tx), batch, microbatch=2)
    assert_trees_close(l_ref, l_acc, rtol=1e-5, atol=1e-7)
    assert_trees_close(s_ref["params"], s_acc["params"],
                       rtol=1e-3, atol=2e-5)


def test_indivisible_batch_rejected(model_and_vars):
    model, variables = model_and_vars
    batch = to_device(tiny_batch(batch_size=4, seed=1))
    tx = make_tx(model)
    accum = model.make_train_step(tx, donate=False, microbatch=3)
    with pytest.raises(ValueError, match="not divisible"):
        accum(fresh_state(model, variables, tx), batch)
