"""Exact IoU of arbitrarily rotated 3D boxes, jittable with static shapes.

Replaces the pytorch3d ``_C.iou_box3d`` C++/CUDA extension used by the
reference (ops/ops_torch.py:692-755) with a TPU-friendly formulation:

The boundary of the intersection of two convex boxes A, B is
``(faces of A clipped into B)  union  (faces of B clipped into A)``.
Each quad face is clipped by the 6 half-spaces of the other box with a
static-buffer Sutherland-Hodgman pass (a convex polygon gains at most one
vertex per clip, so 4 + 6 = 10 <= 12 slots), and the enclosed volume follows
from the divergence theorem over the outward-oriented clipped polygons.

Everything is fixed-shape, mask-based, and vectorized over box pairs — no
data-dependent control flow, so XLA maps it straight onto the VPU.
"""

from functools import partial

import jax
import jax.numpy as jnp

# TPU matmuls default to bf16; clipping decisions need full f32.
_HI = jax.lax.Precision.HIGHEST

from objectdetection_3d_tpu.ops.boxes import (
    FACES_OUTWARD,
    box_corners_3d,
    box_planes,
)

# max vertices a clipped face polygon can reach: 4 initial + 6 clips
_MAX_VERTS = 12
_EPS = 1e-6


def _clip_poly_one_plane(verts, count, normal, offset):
    """Clip one convex polygon by the half-space ``normal . x <= offset``.

    Args:
        verts: (M, 3) padded vertex ring, first ``count`` valid.
        count: scalar int32 number of valid vertices.
        normal: (3,), offset: scalar.
    Returns:
        (new_verts (M, 3), new_count).
    """
    m = verts.shape[0]
    idx = jnp.arange(m)
    s = jnp.matmul(verts, normal, precision=_HI) - offset
    inside = s <= _EPS
    safe_count = jnp.maximum(count, 1)
    nxt = jnp.where(idx + 1 < safe_count, idx + 1, 0)
    v_next = verts[nxt]
    s_next = s[nxt]
    inside_next = inside[nxt]

    denom = s - s_next
    denom = jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
    t = jnp.clip(s / denom, 0.0, 1.0)
    ip = verts + t[:, None] * (v_next - verts)

    edge_valid = idx < count
    emit_vertex = edge_valid & inside
    emit_inter = edge_valid & (inside != inside_next)

    # edge-major interleave keeps the ring order of the output polygon
    cand = jnp.stack([verts, ip], axis=1).reshape(2 * m, 3)
    valid = jnp.stack([emit_vertex, emit_inter], axis=1).reshape(2 * m)
    pos = jnp.cumsum(valid) - 1
    pos = jnp.where(valid, pos, 2 * m)  # out-of-range -> dropped
    new_verts = jnp.zeros_like(verts).at[pos].set(cand, mode="drop")
    new_count = jnp.sum(valid).astype(jnp.int32)
    return new_verts, new_count


def _polygon_volume_term(verts, count):
    """Divergence-theorem contribution of one outward-oriented polygon.

    Fan-triangulates from vertex 0; each triangle (v0, vi, vi+1) contributes
    ``det(v0, vi, vi+1) / 6`` of signed volume.
    """
    m = verts.shape[0]
    i = jnp.arange(m)
    valid_tri = (i >= 1) & (i + 1 < count)
    nxt = jnp.where(i + 1 < m, i + 1, 0)
    cross = jnp.cross(verts, verts[nxt])
    contrib = jnp.matmul(cross, verts[0], precision=_HI)
    return jnp.sum(jnp.where(valid_tri, contrib, 0.0)) / 6.0


def _clipped_faces_volume(face_verts, normals, offsets):
    """Volume bounded by quad faces of one box, clipped inside the other.

    Args:
        face_verts: (6, 4, 3) outward-wound quad faces.
        normals: (6, 3), offsets: (6,) half-spaces of the clipping box.
    Returns:
        scalar signed-volume contribution.
    """
    pad = jnp.zeros((6, _MAX_VERTS - 4, 3), face_verts.dtype)
    verts = jnp.concatenate([face_verts, pad], axis=1)
    counts = jnp.full((6,), 4, jnp.int32)
    clip = jax.vmap(_clip_poly_one_plane, in_axes=(0, 0, None, None))
    for j in range(6):
        verts, counts = clip(verts, counts, normals[j], offsets[j])
    return jnp.sum(jax.vmap(_polygon_volume_term)(verts, counts))


_SHRINK = 1e-5


def _pair_intersection_volume(c1, n1, d1, c2, n2, d2):
    """Intersection volume of two boxes given corners + half-spaces.

    The two boundary pieces are clipped with asymmetric epsilons (B shrunk
    when clipping A's faces, A expanded when clipping B's) so that a face
    plane shared by both boxes — the identical-boxes / touching-faces case —
    is counted exactly once instead of twice.
    """
    f1 = c1[FACES_OUTWARD]
    f2 = c2[FACES_OUTWARD]
    return (_clipped_faces_volume(f1, n2, d2 - _SHRINK)
            + _clipped_faces_volume(f2, n1, d1 + _SHRINK))


def intersection_volume_3d(boxes1, boxes2):
    """Pairwise intersection volumes.

    Args:
        boxes1: (N, 9), boxes2: (K, 9).
    Returns:
        (N, K) volumes.
    """
    c1 = box_corners_3d(boxes1)
    n1, d1 = box_planes(boxes1)
    c2 = box_corners_3d(boxes2)
    n2, d2 = box_planes(boxes2)
    pair = jax.vmap(
        jax.vmap(_pair_intersection_volume,
                 in_axes=(None, None, None, 0, 0, 0)),
        in_axes=(0, 0, 0, None, None, None),
    )
    return pair(c1, n1, d1, c2, n2, d2)


@partial(jax.jit, static_argnames=("row_chunk",))
def iou3d(boxes1, boxes2, row_chunk=None):
    """Exact pairwise IoU of rotated 3D boxes (reference ops_torch.py:711-755).

    ``iou = inter / (vol1 + vol2 - inter)``.  Degenerate (zero-volume padded)
    boxes get IoU 0 instead of raising like the reference's runtime
    validators (ops/ops_torch.py:610-690) — padding rows are a fact of life
    under jit and are masked downstream.

    Args:
        boxes1: (N, 9), boxes2: (K, 9).
        row_chunk: optional static chunk size over N to bound the (N*K)
            clipping buffers; required for large N*K.
    Returns:
        (N, K) IoU matrix.
    """
    vol1 = jnp.prod(boxes1[:, 3:6], axis=-1)
    vol2 = jnp.prod(boxes2[:, 3:6], axis=-1)

    if row_chunk is None or boxes1.shape[0] <= row_chunk:
        inter = intersection_volume_3d(boxes1, boxes2)
    else:
        n = boxes1.shape[0]
        chunk = row_chunk
        pad = (-n) % chunk
        padded = jnp.concatenate(
            [boxes1, jnp.zeros((pad, boxes1.shape[1]), boxes1.dtype)], 0)
        rows = padded.reshape(n // chunk + (1 if pad else 0), chunk, -1)
        inter = jax.lax.map(
            lambda b: intersection_volume_3d(b, boxes2), rows)
        inter = inter.reshape(-1, boxes2.shape[0])[:n]

    inter = jnp.clip(inter, 0.0)
    union = vol1[:, None] + vol2[None, :] - inter
    return jnp.where(union > _EPS, inter / jnp.maximum(union, _EPS), 0.0)


@jax.jit
def iou3d_aligned(boxes1, boxes2):
    """Elementwise IoU of aligned box arrays (N, 9) x (N, 9) -> (N,)."""
    c1 = box_corners_3d(boxes1)
    n1, d1 = box_planes(boxes1)
    c2 = box_corners_3d(boxes2)
    n2, d2 = box_planes(boxes2)
    inter = jax.vmap(_pair_intersection_volume)(c1, n1, d1, c2, n2, d2)
    inter = jnp.clip(inter, 0.0)
    vol1 = jnp.prod(boxes1[:, 3:6], axis=-1)
    vol2 = jnp.prod(boxes2[:, 3:6], axis=-1)
    union = vol1 + vol2 - inter
    return jnp.where(union > _EPS, inter / jnp.maximum(union, _EPS), 0.0)


def iou3d_upper_bound(boxes1, boxes2):
    """Cheap provable upper bound on the exact 3D IoU.

    Uses the AABB envelopes of the rotated corners: the AABB intersection
    volume bounds the true intersection from above, and
    ``f(I) = I / (v1 + v2 - I)`` is increasing in I, so
    ``iou <= I_aabb / (v1 + v2 - I_aabb)`` with exact box volumes.
    Used to pre-filter the 1.9M-anchor assignment before exact clipping.

    Args:
        boxes1: (N, 9), boxes2: (K, 9).
    Returns:
        (N, K) upper bounds.
    """
    c1 = box_corners_3d(boxes1)
    c2 = box_corners_3d(boxes2)
    lo1, hi1 = jnp.min(c1, axis=-2), jnp.max(c1, axis=-2)
    lo2, hi2 = jnp.min(c2, axis=-2), jnp.max(c2, axis=-2)
    lo = jnp.maximum(lo1[:, None], lo2[None, :])
    hi = jnp.minimum(hi1[:, None], hi2[None, :])
    inter = jnp.prod(jnp.clip(hi - lo, 0.0), axis=-1)
    vol1 = jnp.prod(boxes1[:, 3:6], axis=-1)
    vol2 = jnp.prod(boxes2[:, 3:6], axis=-1)
    denom = vol1[:, None] + vol2[None, :] - inter
    return jnp.where(denom > _EPS, inter / jnp.maximum(denom, _EPS), 0.0)
