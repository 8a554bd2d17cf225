"""Pallas TPU kernel: fused per-chunk assignment geometry.

The XLA lowering of ``models/assign._chunk_geometry`` + its per-chunk
reductions materializes several (gch, Nc, M[, 3]) intermediates per GT
chunk (~123-368 MB each at flagship scale) and re-reads them for the
containment/top-3 reductions — measured ~250 ms of the assignment's
~480 ms on v5e, all HBM-bandwidth-bound at this chip's realized
~80 GB/s.  This kernel computes the identical interval geometry per
(GT, cell, combo) entirely in VMEM/registers and writes only:

* the candidate ranking key (gch, M, Nc) — consumed by the per-GT
  top-K prefilter (``approx_max_k``),
* per-anchor chunk reductions (M, Nc): containment max/best-GT,
  SAT-possible flag, top-3 (key, GT id) slots,
* per-GT containment row maxima (gch, Nc), reduced over combos.

Anchor axes here are M-MAJOR (combo, cell) — the transpose of the flat
anchor order ``n = cell*M + m`` (models/anchors.py); the caller
transposes the handful of (M, Nc) reduction outputs back to flat
cell-major order (a few MB each) instead of relayouting the 123 MB key
tensor.

All small per-GT / per-combo tables ride in SMEM (scalars) or VMEM
lane-vectors (rows of 12 combos); the GT loop is unrolled so every
index is static.  Semantics mirror ``models/assign._chunk_geometry``
(reference behavior being replaced: the all-pair exact-IoU assignment
loop, model/PointPillars.py:886-1000).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tiebreak weight (must match models/assign._TIEBREAK_EPS)
_TIEBREAK_EPS = 1e-6


def top3_merge(c1, g1, c2, g2, c3, g3, w, gw):
    """Fold candidate (w, gw) into a running per-anchor top-3 by key.

    Ties keep the incumbent (strict ``>``), so earlier-merged (lower-id)
    GTs win equal keys.  The ONE shared implementation for both
    assignment paths — the Pallas geometry kernel body and the XLA scan
    in models/assign.py — so their tie ordering can never drift apart.
    """
    b1 = w > c1
    n1 = jnp.where(b1, w, c1)
    m1 = jnp.where(b1, gw, g1)
    w2 = jnp.where(b1, c1, w)
    gw2 = jnp.where(b1, g1, gw)
    b2 = w2 > c2
    n2 = jnp.where(b2, w2, c2)
    m2 = jnp.where(b2, gw2, g2)
    w3 = jnp.where(b2, c2, w2)
    gw3 = jnp.where(b2, g2, gw2)
    b3 = w3 > c3
    n3 = jnp.where(b3, w3, c3)
    m3 = jnp.where(b3, gw3, g3)
    return n1, m1, n2, m2, n3, m3
#: cells per kernel program (lane width); multiple of 128
_TC = 1280


def _combo_table(layout):
    """(16, M) numpy table of per-combo constants (see kernel body)."""
    cellc, crot, chalf, cvol, coff = [np.asarray(a) for a in layout]
    m = crot.shape[0]
    coff_on_v = np.einsum("mc,mcj->mj", coff, crot)
    tab = np.zeros((16, m), np.float32)
    for c in range(3):
        for j in range(3):
            tab[c * 3 + j] = crot[:, c, j]
    for i in range(3):
        tab[9 + i] = chalf[:, i]
    tab[12] = cvol
    for j in range(3):
        tab[13 + j] = coff_on_v[:, j]
    return tab


def combo_table_jnp(layout):
    """Traced (16, M) combo-constant table (layout of `_combo_table`)."""
    _, crot, chalf, cvol, coff = [jnp.asarray(a) for a in layout]
    coff_on_v = jnp.einsum("mc,mcj->mj", coff, crot)
    rows = [crot[:, c, j] for c in range(3) for j in range(3)]
    rows += [chalf[:, i] for i in range(3)]
    rows += [cvol]
    rows += [coff_on_v[:, j] for j in range(3)]
    return jnp.stack(rows).astype(jnp.float32)


def pad_cells_jnp(cellc):
    """Traced (3, Ncp) padded SoA cell centers (see `_pad_cells`)."""
    cellc = jnp.asarray(cellc).astype(jnp.float32)
    nc = cellc.shape[0]
    tc = _TC if nc >= _TC else 128
    ncp = -(-nc // tc) * tc
    return jnp.pad(cellc.T, ((0, 0), (0, ncp - nc)),
                   constant_values=1e9)


def _geometry_kernel(ftab_ref, gid_ref, hap_ref, hgp_ref, corr_ref,
                     cgv_ref, combo_ref, cell_ref,
                     key_ref, cm_ref, cb_ref, v1_ref, a1_ref, v2_ref,
                     a2_ref, v3_ref, a3_ref, mb_ref, rmax_ref,
                     *, gch, m, g_sentinel):
    """One program: TC cells x M combos x gch GTs.

    ftab_ref: (gch, 17) SMEM f32 — u (9, row-major), hg (3), cg.u (3),
        volg, mask.
    gid_ref: (gch,) SMEM int32 global GT ids.
    hap_ref/hgp_ref/corr_ref/cgv_ref: (gch*3, M) VMEM f32 per-(GT, axis)
        combo rows: ha_proj / hg_proj (cross-projected half-extents),
        corr (combo offset on GT axes), cg_on_v (GT center on combo axes).
    combo_ref: (16, M) VMEM f32 per-combo constants (_combo_table).
    cell_ref: (3, TC) VMEM f32 cell centers (SoA).
    Outputs: key (gch, M, TC); cm/v1/v2/v3/mb (M, TC) f32;
        cb/a1/a2/a3 (M, TC) int32; rmax (gch, TC) f32.
    """
    tc = cell_ref.shape[1]
    cell = [cell_ref[c, :] for c in range(3)]
    crot = [[combo_ref[c * 3 + j, :] for j in range(3)] for c in range(3)]
    chalf = [combo_ref[9 + i, :][:, None] for i in range(3)]   # (M, 1)
    cvol = combo_ref[12, :][:, None]                            # (M, 1)
    coffv = [combo_ref[13 + j, :][:, None] for j in range(3)]   # (M, 1)

    # combo-frame cell projections, GT-independent: (M, TC) per axis
    cell_on_v = [
        crot[0][j][:, None] * cell[0][None, :]
        + crot[1][j][:, None] * cell[1][None, :]
        + crot[2][j][:, None] * cell[2][None, :]
        for j in range(3)
    ]

    cm = jnp.zeros((m, tc), jnp.float32)
    cb = jnp.full((m, tc), g_sentinel, jnp.int32)
    v1 = jnp.full((m, tc), -jnp.inf, jnp.float32)
    v2 = jnp.full((m, tc), -jnp.inf, jnp.float32)
    v3 = jnp.full((m, tc), -jnp.inf, jnp.float32)
    a1 = jnp.full((m, tc), g_sentinel, jnp.int32)
    a2 = jnp.full((m, tc), g_sentinel, jnp.int32)
    a3 = jnp.full((m, tc), g_sentinel, jnp.int32)
    mb = jnp.zeros((m, tc), jnp.bool_)
    rmax_rows = []

    for g in range(gch):
        u = [[ftab_ref[g, c * 3 + i] for i in range(3)] for c in range(3)]
        hg = [ftab_ref[g, 9 + i] for i in range(3)]
        cgu = [ftab_ref[g, 12 + i] for i in range(3)]
        volg = ftab_ref[g, 15]
        gmask = ftab_ref[g, 16]
        gid = gid_ref[g]

        pa = None
        in_a = None
        sep_a = None
        d2 = None
        for i in range(3):
            base = (u[0][i] * cell[0] + u[1][i] * cell[1]
                    + u[2][i] * cell[2] - cgu[i])          # (TC,)
            corr_i = corr_ref[g * 3 + i, :][:, None]       # (M, 1)
            hap_i = hap_ref[g * 3 + i, :][:, None]         # (M, 1)
            aa = jnp.abs(base[None, :] + corr_i)           # (M, TC)
            ina_i = aa <= hg[i] - hap_i
            sepa_i = aa > hg[i] + hap_i
            wa = jnp.maximum(jnp.minimum(jnp.minimum(
                hg[i] + hap_i - aa, 2.0 * hg[i]), 2.0 * hap_i), 0.0)
            pa = wa if pa is None else pa * wa
            in_a = ina_i if in_a is None else in_a & ina_i
            sep_a = sepa_i if sep_a is None else sep_a | sepa_i
            if i == 0:
                d2 = aa * aa
            elif i == 1:
                d2 = d2 + aa * aa
        d_axis = jnp.sqrt(d2)

        pb = None
        in_b = None
        sep_b = None
        for j in range(3):
            cgv_j = cgv_ref[g * 3 + j, :][:, None]         # (M, 1)
            ab = jnp.abs(cgv_j - cell_on_v[j] - coffv[j])  # (M, TC)
            hgp_j = hgp_ref[g * 3 + j, :][:, None]         # (M, 1)
            inb_j = ab <= chalf[j] - hgp_j
            sepb_j = ab > chalf[j] + hgp_j
            wb = jnp.maximum(jnp.minimum(jnp.minimum(
                chalf[j] + hgp_j - ab, 2.0 * chalf[j]), 2.0 * hgp_j), 0.0)
            pb = wb if pb is None else pb * wb
            in_b = inb_j if in_b is None else in_b & inb_j
            sep_b = sepb_j if sep_b is None else sep_b | sepb_j

        ratio_a = cvol / jnp.maximum(volg, 1e-6)           # (M, 1)
        ratio_b = volg / jnp.maximum(cvol, 1e-6)           # (M, 1)
        iou = jnp.where(in_a, ratio_a,
                        jnp.where(in_b, ratio_b, 0.0)) * gmask

        inter = jnp.minimum(jnp.minimum(pa, pb),
                            jnp.minimum(volg, cvol))
        denom = volg + cvol - inter
        ub = jnp.where(denom > 1e-6,
                       inter / jnp.maximum(denom, 1e-6), 0.0)
        key = jnp.where(gmask > 0.0,
                        ub - _TIEBREAK_EPS * d_axis,
                        jnp.float32(-1e9))
        maybe = (~(sep_a | sep_b)) & (gmask > 0.0)

        key_ref[g, :, :] = key
        rmax_rows.append(jnp.max(iou, axis=0))

        # containment running max; iou > cm keeps the FIRST (lowest-gid)
        # achiever because gids ascend across the unrolled loop
        better = iou > cm
        cm = jnp.where(better, iou, cm)
        cb = jnp.where(better, gid, cb)
        mb = mb | maybe

        # top-3 by key (the one shared implementation — models/assign.py
        # folds per-chunk candidates through the same function, and the
        # tie ordering MUST stay identical between the XLA and Pallas
        # assignment paths)
        v1, a1, v2, a2, v3, a3 = top3_merge(
            v1, a1, v2, a2, v3, a3, key, gid)

    cm_ref[...] = cm
    cb_ref[...] = cb
    v1_ref[...] = v1
    a1_ref[...] = a1
    v2_ref[...] = v2
    a2_ref[...] = a2
    v3_ref[...] = v3
    a3_ref[...] = a3
    mb_ref[...] = mb.astype(jnp.int32)
    rmax_ref[...] = jnp.stack(rmax_rows)


def _rescue_kernel(ftab_ref, rthr_ref, hap_ref, hgp_ref, corr_ref,
                   cgv_ref, combo_ref, cell_ref, out_ref, *, gch, m):
    """Containment-rescue pass: does any GT's row max land on this anchor.

    rthr_ref: (gch, 2) SMEM f32 — row_max and rescue_ok (0/1) per GT.
    out_ref: (M, TC) int32 — 1 where some GT's containment IoU reaches
        its row max with rescue enabled.
    """
    tc = cell_ref.shape[1]
    cell = [cell_ref[c, :] for c in range(3)]
    crot = [[combo_ref[c * 3 + j, :] for j in range(3)] for c in range(3)]
    chalf = [combo_ref[9 + i, :][:, None] for i in range(3)]
    cvol = combo_ref[12, :][:, None]
    coffv = [combo_ref[13 + j, :][:, None] for j in range(3)]
    cell_on_v = [
        crot[0][j][:, None] * cell[0][None, :]
        + crot[1][j][:, None] * cell[1][None, :]
        + crot[2][j][:, None] * cell[2][None, :]
        for j in range(3)
    ]

    hit = jnp.zeros((m, tc), jnp.bool_)
    for g in range(gch):
        u = [[ftab_ref[g, c * 3 + i] for i in range(3)] for c in range(3)]
        hg = [ftab_ref[g, 9 + i] for i in range(3)]
        cgu = [ftab_ref[g, 12 + i] for i in range(3)]
        volg = ftab_ref[g, 15]
        gmask = ftab_ref[g, 16]
        rmax = rthr_ref[g, 0]
        rok = rthr_ref[g, 1]

        in_a = None
        for i in range(3):
            base = (u[0][i] * cell[0] + u[1][i] * cell[1]
                    + u[2][i] * cell[2] - cgu[i])
            aa = jnp.abs(base[None, :] + corr_ref[g * 3 + i, :][:, None])
            ina_i = aa <= hg[i] - hap_ref[g * 3 + i, :][:, None]
            in_a = ina_i if in_a is None else in_a & ina_i
        in_b = None
        for j in range(3):
            ab = jnp.abs(cgv_ref[g * 3 + j, :][:, None]
                         - cell_on_v[j] - coffv[j])
            inb_j = ab <= chalf[j] - hgp_ref[g * 3 + j, :][:, None]
            in_b = inb_j if in_b is None else in_b & inb_j

        ratio_a = cvol / jnp.maximum(volg, 1e-6)
        ratio_b = volg / jnp.maximum(cvol, 1e-6)
        iou = jnp.where(in_a, ratio_a,
                        jnp.where(in_b, ratio_b, 0.0)) * gmask
        hit = hit | ((iou >= rmax) & (rok > 0.0) & (iou > 0.0))

    out_ref[...] = hit.astype(jnp.int32)


def _chunk_tables(gt_boxes, gt_mask, layout):
    """XLA-side per-chunk tables for the kernels (all tiny).

    Returns (ftab (gch, 17), hap/hgp/corr/cgv (gch*3, M)).
    """
    from objectdetection_3d_tpu.ops.boxes import rotation_matrices

    cellc, crot, chalf, cvol, coff = layout
    crot = jnp.asarray(crot)
    chalf_j = jnp.asarray(chalf)
    coff_j = jnp.asarray(coff)

    gch = gt_boxes.shape[0]
    u = rotation_matrices(gt_boxes[:, 6], gt_boxes[:, 7], gt_boxes[:, 8])
    hg = gt_boxes[:, 3:6] / 2
    cg = gt_boxes[:, :3] + u[:, :, 2] * hg[:, 2:3]
    volg = jnp.prod(gt_boxes[:, 3:6], axis=-1)
    cgu = jnp.einsum("gc,gci->gi", cg, u)

    cross = jnp.abs(jnp.einsum("gki,mkj->gmij", u, crot))
    ha_proj = jnp.einsum("gmij,mj->gmi", cross, chalf_j)   # on gt axes
    hg_proj = jnp.einsum("gmij,gi->gmj", cross, hg)        # on combo axes
    corr = jnp.einsum("mc,gci->gmi", coff_j, u)
    cg_on_v = jnp.einsum("gc,mcj->gmj", cg, crot)

    m = crot.shape[0]
    ftab = jnp.concatenate([
        u.reshape(gch, 9), hg, cgu, volg[:, None],
        gt_mask.astype(jnp.float32)[:, None]], axis=1)
    hap = ha_proj.transpose(0, 2, 1).reshape(gch * 3, m)
    hgp = hg_proj.transpose(0, 2, 1).reshape(gch * 3, m)
    corr_t = corr.transpose(0, 2, 1).reshape(gch * 3, m)
    cgv = cg_on_v.transpose(0, 2, 1).reshape(gch * 3, m)
    return ftab, hap, hgp, corr_t, cgv


def _pad_cells(cellc):
    """(Nc, 3) -> SoA (3, Ncp) with far-away padding cells.

    Padding cells sit at 1e9: separated from every GT (containment and
    SAT flags false, IoU 0) with ranking key ~ -1e-6 * 1.4e9 ≈ -1.4e3 —
    below any real anchor's key (>= -1e-6 * scene diagonal) by orders of
    magnitude, so they can never enter a GT's top-K before real anchors.
    """
    nc = cellc.shape[0]
    tc = _TC if nc >= _TC else 128
    ncp = -(-nc // tc) * tc
    out = np.full((3, ncp), 1e9, np.float32)
    out[:, :nc] = np.asarray(cellc, np.float32).T
    return out, tc


@partial(jax.jit, static_argnames=("g_sentinel", "interpret"))
def _run_geometry(gid, ftabs, cellc_pad, combo_tab,
                  g_sentinel, interpret=False):
    ftab, hap, hgp, corr_t, cgv = ftabs
    gch = ftab.shape[0]
    m = combo_tab.shape[1]
    ncp = cellc_pad.shape[1]
    tc = _TC if ncp % _TC == 0 and ncp >= _TC else 128
    grid = (ncp // tc,)

    small = lambda r: pl.BlockSpec(  # noqa: E731
        (r, m), lambda i: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_geometry_kernel, gch=gch, m=m,
                g_sentinel=int(g_sentinel)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # ftab
            pl.BlockSpec(memory_space=pltpu.SMEM),       # gid
            small(gch * 3), small(gch * 3), small(gch * 3), small(gch * 3),
            small(16),
            pl.BlockSpec((3, tc), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # cells
        ],
        out_specs=[
            pl.BlockSpec((gch, m, tc), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((m, tc), lambda i: (0, i),
                          memory_space=pltpu.VMEM)] * 9
        + [pl.BlockSpec((gch, tc), lambda i: (0, i),
                        memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((gch, m, ncp), jnp.float32),
        ] + [
            jax.ShapeDtypeStruct((m, ncp), d) for d in
            (jnp.float32, jnp.int32, jnp.float32, jnp.int32, jnp.float32,
             jnp.int32, jnp.float32, jnp.int32, jnp.int32)
        ] + [jax.ShapeDtypeStruct((gch, ncp), jnp.float32)],
        interpret=interpret,
    )(ftab, gid.astype(jnp.int32), hap, hgp, corr_t, cgv,
      combo_tab, cellc_pad)
    names = ("key", "cm", "cb", "v1", "a1", "v2", "a2", "v3", "a3",
             "mb", "rmax")
    return dict(zip(names, outs))


def chunk_geometry(gt_boxes, gt_mask, gid, layout, cellc_pad, combo_tab,
                   g_sentinel, interpret=False):
    """Fused chunk geometry (see module docstring).

    Args:
        gt_boxes: (gch, 9) GT chunk; gt_mask: (gch,); gid: (gch,) int32
            global GT ids.
        layout: the (numpy or jnp) anchor layout tuple.
        cellc_pad: (3, Ncp) padded SoA cell centers (from
            :func:`_pad_cells`).
        combo_tab: (16, M) combo constants (from :func:`_combo_table`).
        g_sentinel: python int stored for "no GT" slots.
    Returns:
        dict: key (gch, M, Ncp); cm/v1/v2/v3/rmax f32, cb/a1/a2/a3 int32,
        mb int32 — per-anchor arrays in M-MAJOR (M, Ncp) layout.
    """
    ftabs = _chunk_tables(gt_boxes, gt_mask, layout)
    return _run_geometry(gid, ftabs, cellc_pad, combo_tab,
                         int(g_sentinel), interpret=interpret)


@partial(jax.jit, static_argnames=("interpret",))
def _run_rescue(ftab4, rthr, cellc_pad, combo_tab, interpret=False):
    ftab, hap, hgp, corr_t, cgv = ftab4
    gch = ftab.shape[0]
    m = combo_tab.shape[1]
    ncp = cellc_pad.shape[1]
    tc = _TC if ncp % _TC == 0 and ncp >= _TC else 128

    small = lambda r: pl.BlockSpec(  # noqa: E731
        (r, m), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_rescue_kernel, gch=gch, m=m),
        grid=(ncp // tc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            small(gch * 3), small(gch * 3), small(gch * 3), small(gch * 3),
            small(16),
            pl.BlockSpec((3, tc), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tc), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, ncp), jnp.int32),
        interpret=interpret,
    )(ftab, rthr, hap, hgp, corr_t, cgv, combo_tab, cellc_pad)
    return out


def containment_rescue(gt_boxes, gt_mask, row_max, rescue_ok, layout,
                       cellc_pad, combo_tab, interpret=False):
    """(M, Ncp) int32: anchors achieving some GT's containment row max."""
    ftabs = _chunk_tables(gt_boxes, gt_mask, layout)
    rthr = jnp.stack(
        [row_max, rescue_ok.astype(jnp.float32)], axis=1)
    return _run_rescue(ftabs, rthr, cellc_pad, combo_tab,
                       interpret=interpret)
