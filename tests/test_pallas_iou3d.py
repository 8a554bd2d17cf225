"""Parity of the Pallas clipper kernel arithmetic vs the XLA clipper.

The TPU assignment tier runs these kernels (models/assign.py tier 4);
CPU tests elsewhere exercise only the XLA fallback path.  Here the
kernel COMPUTE BODIES (`_clip_volumes`, `_gathered_iou`) run eagerly on
the same SoA layout the kernels see, against the XLA Sutherland-Hodgman
clipper (ops/iou3d.py), including adversarial degenerate pairs
(identical boxes, exactly touching faces, containment).  Eager
evaluation is deliberate: pallas interpret mode internally jits the
~8k-op clipper graph, whose CPU compile takes tens of minutes under the
suite's 8-virtual-device config; the pallas_call dispatch itself is
exercised on real TPU (tools/profile_assign.py, bench.py).
Reference being replaced: pytorch3d ``_C.iou_box3d``
(ops/ops_torch.py:692-755).
"""

import numpy as np
import jax
import jax.numpy as jnp

from objectdetection_3d_tpu.ops.iou3d import intersection_volume_3d_aligned
from objectdetection_3d_tpu.ops.pallas_iou3d import (
    _clip_volumes,
    _gathered_iou,
)


def _soa(boxes):
    """(P, 9) -> list of 9 (P,) float32 fields (the kernel layout)."""
    b = jnp.asarray(boxes, jnp.float32)
    return [b[:, i] for i in range(9)]


def _random_pairs(rng, p):
    b1 = np.zeros((p, 9), np.float32)
    b1[:, :3] = rng.uniform(-5, 5, (p, 3))
    b1[:, 3:6] = rng.uniform(0.3, 4.0, (p, 3))
    b1[:, 6:9] = rng.uniform(-0.6, 0.6, (p, 3))
    b2 = (b1 + rng.normal(0, 0.8, (p, 9))).astype(np.float32)
    b2[:, 3:6] = np.abs(b2[:, 3:6]) + 0.2
    # adversarial: identical, exactly touching in x, contained
    b2[:32] = b1[:32]
    b2[32:64] = b1[32:64]
    b2[32:64, 0] += b1[32:64, 3]
    b2[64:96] = b1[64:96]
    b2[64:96, 3:6] *= 0.5
    return b1, b2


def test_clip_volumes_matches_xla_clipper():
    rng = np.random.default_rng(0)
    b1, b2 = _random_pairs(rng, 512)
    ref = np.asarray(
        intersection_volume_3d_aligned(jnp.asarray(b1), jnp.asarray(b2)))
    with jax.disable_jit():
        out = np.asarray(_clip_volumes(_soa(b1), _soa(b2)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-4)


def test_gathered_iou_matches_xla_clipper():
    rng = np.random.default_rng(1)
    g, p = 37, 512
    tab = np.zeros((g, 9), np.float32)
    tab[:, :3] = rng.uniform(-5, 5, (g, 3))
    tab[:, 3:6] = rng.uniform(0.5, 4, (g, 3))
    tab[:, 6:9] = rng.uniform(-0.5, 0.5, (g, 3))
    valid = rng.random(g) > 0.2
    ids = rng.integers(0, g, p).astype(np.int32)
    b2 = (tab[ids] + rng.normal(0, 0.5, (p, 9))).astype(np.float32)
    b2[:, 3:6] = np.abs(b2[:, 3:6]) + 0.2

    inter = np.maximum(np.asarray(intersection_volume_3d_aligned(
        jnp.asarray(tab)[ids], jnp.asarray(b2))), 0.0)
    v1 = tab[ids, 3:6].prod(-1)
    v2 = b2[:, 3:6].prod(-1)
    union = v1 + v2 - inter
    ref = np.where(union > 1e-6, inter / np.maximum(union, 1e-6), 0.0)
    ref = ref * valid[ids]

    # padded (10, G) table exactly as iou_gathered_pallas builds it
    gp = -(-g // 128) * 128
    table = np.zeros((10, gp), np.float32)
    table[:9, :g] = tab.T
    table[9, :g] = valid.astype(np.float32)
    with jax.disable_jit():
        out = np.asarray(_gathered_iou(
            jnp.asarray(table), jnp.asarray(ids), _soa(b2)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-4)


def test_gathered_iou_pair_matches_single():
    """The fused 24-row two-pair ring == two independent 12-row rings."""
    from objectdetection_3d_tpu.ops.pallas_iou3d import _gathered_iou_multi

    rng = np.random.default_rng(2)
    g, p = 16, 256
    tab = np.zeros((g, 9), np.float32)
    tab[:, :3] = rng.uniform(-4, 4, (g, 3))
    tab[:, 3:6] = rng.uniform(0.5, 3, (g, 3))
    tab[:, 6:9] = rng.uniform(-0.5, 0.5, (g, 3))
    valid = rng.random(g) > 0.25
    ids_a = rng.integers(0, g, p).astype(np.int32)
    ids_b = rng.integers(0, g, p).astype(np.int32)
    b2 = (tab[ids_a] + rng.normal(0, 0.6, (p, 9))).astype(np.float32)
    b2[:, 3:6] = np.abs(b2[:, 3:6]) + 0.2

    gp = -(-g // 128) * 128
    table = np.zeros((10, gp), np.float32)
    table[:9, :g] = tab.T
    table[9, :g] = valid.astype(np.float32)
    with jax.disable_jit():
        pair = _gathered_iou_multi(
            jnp.asarray(table), [jnp.asarray(ids_a), jnp.asarray(ids_b)],
            _soa(b2))
        lone_a = _gathered_iou_multi(
            jnp.asarray(table), [jnp.asarray(ids_a)], _soa(b2))[0]
        lone_b = _gathered_iou_multi(
            jnp.asarray(table), [jnp.asarray(ids_b)], _soa(b2))[0]
    np.testing.assert_array_equal(np.asarray(pair[0]), np.asarray(lone_a))
    np.testing.assert_array_equal(np.asarray(pair[1]), np.asarray(lone_b))
