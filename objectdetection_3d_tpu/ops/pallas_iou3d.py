"""Pallas TPU kernel: exact aligned-pair box intersection volumes.

The XLA lowering of the Sutherland-Hodgman clipper (ops/iou3d.py) measures
~1.2 M pairs/s on v5e: its ring-compaction one-hot intermediates
(6 faces x 24 candidates x 12 slots per pair) spill to HBM between fusion
boundaries, so the op is bandwidth-bound at ~20 KB of traffic per pair.
This kernel runs the IDENTICAL algorithm with every intermediate resident
in VMEM — HBM traffic is 18 floats in / 1 float out per pair — which is
what makes the exact per-anchor assignment tier affordable
(models/assign.py: ~2-4M clipped pairs per training step).

Layout: pairs ride in the minor (lane) dimension throughout; the slot
axis (12-vertex ring, 24 candidates) is the sublane axis; the 6 faces of
both clip directions are folded into the pair batch (every face of box A
is clipped by box B's 6 planes and vice versa — 12 independent polygons
per pair, all sharing the pair's plane set).

Same semantics as ops/iou3d.py `intersection_volume_3d_aligned`
(replacing reference pytorch3d `_C.iou_box3d`, ops/ops_torch.py:692-755),
including the asymmetric _SHRINK handling of shared faces.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from objectdetection_3d_tpu.ops.boxes import _CORNER_SIGNS, FACES_OUTWARD

_MAX_VERTS = 12
_EPS = 1e-6
_SHRINK = 1e-5
#: union guard of the IoU ratio (matches models/assign.py)
_UNION_EPS = 1e-6
#: pairs per kernel program (lane-dim width of every ring buffer)
_TILE = 512


def _rot_entries(rx, ry, rz):
    """Rz@Ry@Rx entries as a 3x3 nested list of (T,) arrays."""
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    return [
        [cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx],
        [sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx],
        [-sy, cy * sx, cy * cx],
    ]


def _corners(fields):
    """8 box corners from 9 (T,) field arrays -> (8, T) x/y/z arrays."""
    x, y, z, dx, dy, dz, rx, ry, rz = fields
    r = _rot_entries(rx, ry, rz)
    cs = []
    for sx_, sy_, sz_ in np.asarray(_CORNER_SIGNS):
        lx = sx_ * dx / 2
        ly = sy_ * dy / 2
        lz = sz_ * dz  # z sign is 0/1: bottom-anchored boxes
        cs.append((x + r[0][0] * lx + r[0][1] * ly + r[0][2] * lz,
                   y + r[1][0] * lx + r[1][1] * ly + r[1][2] * lz,
                   z + r[2][0] * lx + r[2][1] * ly + r[2][2] * lz))
    return cs


def _planes(fields):
    """6 outward half-spaces (n . p <= off): list of (nx, ny, nz, off)."""
    x, y, z, dx, dy, dz, rx, ry, rz = fields
    r = _rot_entries(rx, ry, rz)
    # volumetric center
    cxm = x + r[0][2] * dz / 2
    cym = y + r[1][2] * dz / 2
    czm = z + r[2][2] * dz / 2
    out = []
    for axis, half in ((0, dx / 2), (1, dy / 2), (2, dz / 2)):
        nx, ny, nz = r[0][axis], r[1][axis], r[2][axis]
        base = nx * cxm + ny * cym + nz * czm
        out.append((nx, ny, nz, base + half))
        out.append((-nx, -ny, -nz, -(base - half)))
    return out


#: allocated ring slots entering clip plane p (geometric max is 4+p; two
#: slack slots absorb numerically degenerate rings, matching the original
#: fixed-12 layout's slack over its theoretical max of 10)
_RING_SLOTS = (4, 7, 8, 9, 10, 11)
#: slots allocated for the ring EMITTED by plane p (= next plane's input)
_RING_CAPS = (7, 8, 9, 10, 11, 12)


def _clip_volumes(f1, f2):
    """Intersection volumes of aligned box pairs: 9+9 (T,) fields -> (T,).

    Single-pair wrapper of :func:`_clip_volumes_blocks` (12 ring rows).
    """
    return _clip_volumes_blocks([(f1, f2)])[0]


def _clip_volumes_blocks(pairs):
    """Intersection volumes of K aligned pair streams in ONE ring.

    All 12 face-polygons of a pair (6 faces of box A clipped by B's
    planes, 6 of B clipped by A's) ride the SUBLANE axis as one
    (12K, T) ring — one wide VPU op where the per-polygon formulation
    issued narrow (T,) ops — and the ring storage grows per plane (a
    convex n-gon clipped by a half-space has at most n+1 vertices),
    shrinking the O(candidates x slots) compaction from 24x12 to the
    progressive schedule above.  Stacking K pairs keeps the sublane
    count a multiple of 8 (12 rows pad to 16 = 25% waste; 24 rows fill
    exactly 3 native f32 tiles).  Algorithm and epsilons are identical
    to ops/iou3d.py (reference being replaced: pytorch3d
    ``_C.iou_box3d``, ops/ops_torch.py:692-755).

    Args:
        pairs: list of (f1, f2) — each a list of 9 (T,) SoA box fields.
    Returns:
        list of (T,) float32 intersection volumes, one per pair.
    """
    t = pairs[0][0][0].shape[0]
    nrows = 12 * len(pairs)

    faces = np.asarray(FACES_OUTWARD)
    corner_blocks = [(_corners(f1), _corners(f2)) for f1, f2 in pairs]
    plane_blocks = [(_planes(f1), _planes(f2)) for f1, f2 in pairs]

    # per block: rows 0-5 faces of box1 clipped into box2 (offsets -
    # SHRINK); rows 6-11 faces of box2 clipped into box1 (offsets +
    # SHRINK)
    vx, vy, vz = [], [], []
    for i in range(4):
        rows = []
        for corners1, corners2 in corner_blocks:
            rows += [corners1[faces[f][i]] for f in range(6)]
            rows += [corners2[faces[f][i]] for f in range(6)]
        vx.append(jnp.stack([r[0] for r in rows]))
        vy.append(jnp.stack([r[1] for r in rows]))
        vz.append(jnp.stack([r[2] for r in rows]))
    cnt = jnp.full((nrows, t), 4, jnp.int32)

    plane_rows = []
    for k in range(6):
        nx, ny, nz, off = [], [], [], []
        for planes1, planes2 in plane_blocks:
            n1, n2 = planes1[k], planes2[k]
            nx += [n2[0]] * 6 + [n1[0]] * 6
            ny += [n2[1]] * 6 + [n1[1]] * 6
            nz += [n2[2]] * 6 + [n1[2]] * 6
            off += [n2[3] - _SHRINK] * 6 + [n1[3] + _SHRINK] * 6
        plane_rows.append((jnp.stack(nx), jnp.stack(ny), jnp.stack(nz),
                           jnp.stack(off)))

    for p, (nx, ny, nz, off) in enumerate(plane_rows):
        slots, cap = _RING_SLOTS[p], _RING_CAPS[p]
        s = [nx * vx[i] + ny * vy[i] + nz * vz[i] - off
             for i in range(slots)]
        inside = [si <= _EPS for si in s]

        # ring-next with dynamic count
        def nxt(arr, i):
            nxt_i = arr[(i + 1) % slots]
            return jnp.where(cnt == i + 1, arr[0], nxt_i)

        cand_x, cand_y, cand_z, cand_ok = [], [], [], []
        for i in range(slots):
            sn = nxt(s, i)
            vxn, vyn, vzn = nxt(vx, i), nxt(vy, i), nxt(vz, i)
            denom = s[i] - sn
            denom = jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
            tt = jnp.clip(s[i] / denom, 0.0, 1.0)
            edge_valid = i < cnt
            # kept vertex then possible intersection point
            cand_x.append(vx[i])
            cand_y.append(vy[i])
            cand_z.append(vz[i])
            cand_ok.append(edge_valid & inside[i])
            cand_x.append(vx[i] + tt * (vxn - vx[i]))
            cand_y.append(vy[i] + tt * (vyn - vy[i]))
            cand_z.append(vz[i] + tt * (vzn - vz[i]))
            cand_ok.append(edge_valid & (inside[i] != (sn <= _EPS)))

        # compact: position of each emitted candidate
        pos = []
        run = jnp.zeros((nrows, t), jnp.int32)
        for e in range(2 * slots):
            pos.append(run)  # position BEFORE counting e
            run = run + cand_ok[e].astype(jnp.int32)
        new_vx = [jnp.zeros((nrows, t), jnp.float32) for _ in range(cap)]
        new_vy = [jnp.zeros((nrows, t), jnp.float32) for _ in range(cap)]
        new_vz = [jnp.zeros((nrows, t), jnp.float32) for _ in range(cap)]
        for e in range(2 * slots):
            take = cand_ok[e]
            pe = pos[e]
            # an emitted candidate at position j: j < min(e+1, cap)
            for j in range(min(e + 1, cap)):
                m = take & (pe == j)
                new_vx[j] = jnp.where(m, cand_x[e], new_vx[j])
                new_vy[j] = jnp.where(m, cand_y[e], new_vy[j])
                new_vz[j] = jnp.where(m, cand_z[e], new_vz[j])
        vx, vy, vz = new_vx, new_vy, new_vz
        cnt = jnp.minimum(run, cap)

    # divergence-theorem fan over each clipped polygon, summed over the
    # 12 polygon rows of each pair block
    final = _RING_CAPS[-1]
    total = jnp.zeros((nrows, t), jnp.float32)
    for i in range(1, final - 1):
        crx = vy[i] * vz[i + 1] - vz[i] * vy[i + 1]
        cry = vz[i] * vx[i + 1] - vx[i] * vz[i + 1]
        crz = vx[i] * vy[i + 1] - vy[i] * vx[i + 1]
        contrib = vx[0] * crx + vy[0] * cry + vz[0] * crz
        total = total + jnp.where(i + 1 < cnt, contrib, 0.0) / 6.0

    return [jnp.sum(total[12 * b:12 * (b + 1)], axis=0)
            for b in range(len(pairs))]


def _kernel(b1_ref, b2_ref, out_ref):
    """One tile: T pairs -> T intersection volumes.

    b1_ref/b2_ref: (9, T) SoA box fields in VMEM; out_ref: (1, T).
    """
    f1 = [b1_ref[i, :] for i in range(9)]
    f2 = [b2_ref[i, :] for i in range(9)]
    out_ref[0, :] = _clip_volumes(f1, f2)


def _gathered_iou(table, ids, f2):
    """T masked IoUs of (table row, box) pairs: the gathered-kernel body.

    The GT side is gathered IN-KERNEL from a small table via a one-hot
    MXU matmul — a (N,)-row XLA gather from the (G, 9) GT table costs
    ~35 ns/row on this chip (~67 ms at N=1.92M, CLAUDE.md), while the
    (10, G) @ (G, T) one-hot contraction is MXU noise.  The one-hot
    product is exact in HIGHEST precision (bf16x3 decomposition is exact
    for f32, and each output column selects exactly one table column).

    Pure function of arrays so CPU parity tests can evaluate it eagerly
    (pallas interpret mode's internal jit of the ~8k-op clipper graph
    compiles for tens of minutes under the 8-virtual-device suite).

    Args:
        table: (10, G) — 9 SoA box fields + validity row.
        ids: (T,) int32 per-pair table column.
        f2: 9 (T,) SoA box fields.
    Returns:
        (T,) IoU, 0 where the table validity row is 0.
    """
    return _gathered_iou_multi(table, [ids], f2)[0]


def _gathered_iou_multi(table, ids_list, f2):
    """K id streams against one box stream, clipped in a single ring.

    See `_gathered_iou`; the K pair blocks share one
    :func:`_clip_volumes_blocks` ring so the sublane count is 12K
    (K=2 fills exactly 3 native f32 tiles — no padding waste — and the
    shared f2 stream is loaded once).
    """
    gp = table.shape[1]
    f1s, valids = [], []
    for ids in ids_list:
        onehot = (jax.lax.broadcasted_iota(
            jnp.int32, (gp, ids.shape[0]), 0)
            == ids[None, :]).astype(jnp.float32)
        gathered = jax.lax.dot_general(
            table, onehot, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        f1s.append([gathered[i, :] for i in range(9)])
        valids.append(gathered[9, :])
    inters = _clip_volumes_blocks([(f1, f2) for f1 in f1s])
    vol2 = f2[3] * f2[4] * f2[5]
    out = []
    for f1, valid, inter in zip(f1s, valids, inters):
        inter = jnp.maximum(inter, 0.0)
        vol1 = f1[3] * f1[4] * f1[5]
        union = vol1 + vol2 - inter
        iou = jnp.where(union > _UNION_EPS,
                        inter / jnp.maximum(union, _UNION_EPS), 0.0)
        out.append(iou * valid)
    return out


def _gathered_kernel(table_ref, ids_ref, b2_ref, out_ref):
    """One tile: T (gt_id, box) pairs -> T masked IoUs.

    table_ref: (10, G) VMEM; ids_ref: (1, T) int32; b2_ref: (9, T) SoA
    box fields; out_ref: (1, T).  See `_gathered_iou`.
    """
    f2 = [b2_ref[i, :] for i in range(9)]
    out_ref[0, :] = _gathered_iou(table_ref[...], ids_ref[0, :], f2)


def intersection_volume_aligned(boxes1, boxes2, pallas="auto"):
    """Elementwise intersection volumes, backend-dispatched.

    Pallas kernel on TPU (9.6x the XLA clipper, measured on v5e); the
    XLA `intersection_volume_3d_aligned` elsewhere (CPU tests, dryrun).
    Both run the identical clipping algorithm.  ``pallas="off"`` forces
    the XLA path even on TPU — required inside mesh-sharded (pjit)
    programs, where GSPMD has no partitioning rule for Mosaic custom
    calls and would replicate the full computation per chip.
    """
    if pallas != "off" and jax.default_backend() == "tpu":
        return intersection_volume_aligned_pallas(boxes1, boxes2)
    from objectdetection_3d_tpu.ops.iou3d import (
        intersection_volume_3d_aligned,
    )
    return intersection_volume_3d_aligned(boxes1, boxes2)


@partial(jax.jit, static_argnames=("interpret",))
def intersection_volume_aligned_pallas(boxes1, boxes2, interpret=False):
    """Elementwise intersection volumes of aligned (P, 9) box arrays.

    Numerically identical to ops.iou3d.intersection_volume_3d_aligned
    (same clipping algorithm, same epsilons); ~25x faster on v5e because
    the ring buffers never leave VMEM.

    Args:
        boxes1, boxes2: (P, 9) float32; P is padded to the tile size
            internally.
        interpret: run in interpreter mode (CPU tests).
    Returns:
        (P,) float32 volumes.
    """
    p = boxes1.shape[0]
    pad = (-p) % _TILE
    if pad:
        boxes1 = jnp.concatenate(
            [boxes1, jnp.zeros((pad, 9), boxes1.dtype)], 0)
        boxes2 = jnp.concatenate(
            [boxes2, jnp.zeros((pad, 9), boxes2.dtype)], 0)
    pt = boxes1.shape[0]
    b1 = boxes1.astype(jnp.float32).T  # (9, P) SoA
    b2 = boxes2.astype(jnp.float32).T

    out = pl.pallas_call(
        _kernel,
        grid=(pt // _TILE,),
        in_specs=[
            pl.BlockSpec((9, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, pt), jnp.float32),
        interpret=interpret,
    )(b1, b2)
    return out[0, :p]


def iou_gathered(table, valid, ids, boxes2, pallas="auto"):
    """Masked IoU of ``(table[ids[p]], boxes2[p])`` pairs, dispatched.

    Pallas kernel with an in-kernel one-hot MXU gather on TPU (a plain
    XLA row gather from the table costs ~35 ns/row — ~67 ms at
    N=1.92M); the XLA clipper elsewhere (CPU tests, dryrun).

    Args:
        table: (G, 9) box table (e.g. padded GT boxes).
        valid: (G,) row validity (bool or float).
        ids: (P,) int32 table rows in [0, G).
        boxes2: (P, 9) aligned counterpart boxes.
        pallas: "off" forces the XLA path even on TPU (mesh-sharded
            callers — see :func:`intersection_volume_aligned`).
    Returns:
        (P,) float32 IoU; 0 wherever ``valid[ids[p]]`` is falsy.
    """
    if pallas != "off" and jax.default_backend() == "tpu":
        return iou_gathered_pallas(table, valid, ids, boxes2)
    from objectdetection_3d_tpu.ops.iou3d import (
        intersection_volume_3d_aligned,
    )
    b1 = table[ids]
    inter = jnp.maximum(intersection_volume_3d_aligned(b1, boxes2), 0.0)
    vol1 = jnp.prod(b1[:, 3:6], axis=-1)
    vol2 = jnp.prod(boxes2[:, 3:6], axis=-1)
    union = vol1 + vol2 - inter
    iou = jnp.where(union > _UNION_EPS,
                    inter / jnp.maximum(union, _UNION_EPS), 0.0)
    return iou * valid[ids].astype(iou.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def iou_gathered_pallas(table, valid, ids, boxes2, interpret=False):
    """Pallas path of :func:`iou_gathered` (see `_gathered_kernel`)."""
    g = table.shape[0]
    gp = -(-g // 128) * 128
    tab = jnp.zeros((10, gp), jnp.float32)
    tab = tab.at[:9, :g].set(table.astype(jnp.float32).T)
    tab = tab.at[9, :g].set(valid.astype(jnp.float32))
    p = ids.shape[0]
    pad = (-p) % _TILE
    if pad:
        ids = jnp.concatenate(
            [ids, jnp.zeros((pad,), ids.dtype)])
        boxes2 = jnp.concatenate(
            [boxes2, jnp.zeros((pad, 9), boxes2.dtype)], 0)
    pt = ids.shape[0]
    b2 = boxes2.astype(jnp.float32).T

    out = pl.pallas_call(
        _gathered_kernel,
        grid=(pt // _TILE,),
        in_specs=[
            pl.BlockSpec((10, gp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, pt), jnp.float32),
        interpret=interpret,
    )(tab, ids.astype(jnp.int32).reshape(1, pt), b2)
    return out[0, :p]


def _gathered_pair_kernel(table_ref, ids_ref, b2_ref, out_ref):
    """One tile: T (gt_id_a, gt_id_b, box) triples -> (2, T) masked IoUs.

    Both gathered GT streams clip against the SAME box stream in one
    24-sublane ring (exactly 3 native f32 tiles — the single-pair 12-row
    ring pads to 16, wasting 25% of the VPU — and the shared box stream
    is read once instead of twice).

    table_ref: (10, G) VMEM; ids_ref: (2, T) int32; b2_ref: (9, T) SoA
    box fields; out_ref: (2, T).  See `_gathered_iou_multi`.
    """
    f2 = [b2_ref[i, :] for i in range(9)]
    iou_a, iou_b = _gathered_iou_multi(
        table_ref[...], [ids_ref[0, :], ids_ref[1, :]], f2)
    out_ref[0, :] = iou_a
    out_ref[1, :] = iou_b


def iou_gathered_pair(table, valid, ids_a, ids_b, boxes2, pallas="auto"):
    """Masked IoUs of ``(table[ids_a[p]], boxes2[p])`` AND
    ``(table[ids_b[p]], boxes2[p])``, dispatched.

    Fused two-stream variant of :func:`iou_gathered` for the exact
    anchor tier (models/assign.py tier 4), which clips every anchor
    against its top-2 candidate GTs: one kernel pass at full sublane
    utilization instead of two at 75%.

    Returns:
        ((P,), (P,)) float32 IoUs; 0 where the table row is invalid.
    """
    if pallas != "off" and jax.default_backend() == "tpu":
        out = iou_gathered_pair_pallas(table, valid, ids_a, ids_b, boxes2)
        return out[0], out[1]
    return (iou_gathered(table, valid, ids_a, boxes2, pallas=pallas),
            iou_gathered(table, valid, ids_b, boxes2, pallas=pallas))


@partial(jax.jit, static_argnames=("interpret",))
def iou_gathered_pair_pallas(table, valid, ids_a, ids_b, boxes2,
                             interpret=False):
    """Pallas path of :func:`iou_gathered_pair`; returns (2, P)."""
    g = table.shape[0]
    gp = -(-g // 128) * 128
    tab = jnp.zeros((10, gp), jnp.float32)
    tab = tab.at[:9, :g].set(table.astype(jnp.float32).T)
    tab = tab.at[9, :g].set(valid.astype(jnp.float32))
    p = ids_a.shape[0]
    pad = (-p) % _TILE
    if pad:
        zid = jnp.zeros((pad,), ids_a.dtype)
        ids_a = jnp.concatenate([ids_a, zid])
        ids_b = jnp.concatenate([ids_b, zid])
        boxes2 = jnp.concatenate(
            [boxes2, jnp.zeros((pad, 9), boxes2.dtype)], 0)
    pt = ids_a.shape[0]
    ids = jnp.stack([ids_a.astype(jnp.int32), ids_b.astype(jnp.int32)])
    b2 = boxes2.astype(jnp.float32).T

    out = pl.pallas_call(
        _gathered_pair_kernel,
        grid=(pt // _TILE,),
        in_specs=[
            pl.BlockSpec((10, gp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, pt), jnp.float32),
        interpret=interpret,
    )(tab, ids, b2)
    return out[:, :p]
