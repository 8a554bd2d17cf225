"""Fused encoder-stage Pallas kernel: subm conv + BN/ReLU/mask + z-down
conv + BN/ReLU/mask in one VMEM pass.

On this chip the realizable HBM bandwidth is ~75-90 GB/s (ROADMAP
"platform reality"), so the encoder is bytes-bound: the unfused z-fold
stage chain moves ~4-5 GB per stage-0 pass (fold, conv, unfold,
elementwise, re-fold, down conv, elementwise).  This kernel reads the
folded input once (plus one halo block row), keeps every intermediate in
VMEM, and writes only the z-halved stage output: ~1.6 GB for stage 0.

Layout and semantics (mirrors models/layers.py stages, eval mode):

* folded input xo: block row k packs z slices [k*zb-1, k*zb+zb+1) into
  channels ((zb+2)*C <= 128 lanes); one extra zero block row terminates
  the array (the halo DMA of the last row reads it).
* subm 3x3 conv as 9 accumulating (TH*Wb, 128)@(128, 128) MXU dots with
  the banded z-fold weights; taps dx via sublane rolls (wrap lands in
  zero columns), dy via halo-row slices.
* the same 9 dots on block row k+1 produce the halo slice z=k*zb+zb the
  down conv needs (block k+1's first output group).
* masks ride in a small side array (N, Hp, 8, Wm) — slice-level activity
  bits — and are expanded to per-channel multipliers with tiny selector
  matmuls (m @ S); the down mask (z-window max of input activity) is
  max over three selector products.
* BatchNorms are eval-mode affines a*x + b with a = scale*rsqrt(var+eps),
  b = bias - mean*a, tiled per z group.

The down conv consumes subm outputs for z in [k*zb, k*zb+zb+1): its
input channels split across the y0 (own block) and y1 (halo) registers,
hence two weight matrices wd[0], wd[1].

Training falls back to the unfused path (batch statistics need global
reductions).  Reference semantics: model/PointPillars.py:529-573.

STATUS (v5e, 2026-08-17): numerically exact vs the unfused stages
(max rel err ~1e-4 across shapes) but measured 162 vs 154 ms for the
full flagship encoder — XLA's conv + fused epilogues already sit near
this chip's ~75 GB/s bandwidth floor, and the kernel's extra halo-row
GEMMs + per-program mask relayout eat the saved elementwise passes.
Kept behind `tpu: fused_stages` (off) as groundwork: on silicon with
spec-sheet bandwidth the traffic argument (~4x fewer bytes per stage)
should hold.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 8
_LANES = 128
_MSLOTS = 8  # mask slice slots (>= zb + 2)


def _kernel(x_hbm, m_hbm, w9_ref, wd_ref, vec_ref, sel_ref, o_ref,
            xbuf, mbuf, sems, *, th, wb, wm):
    ni = pl.program_id(0)
    hi = pl.program_id(1)
    nh = pl.num_programs(1)
    step = ni * nh + hi
    slot = jax.lax.rem(step, 2)

    # block rows ni, ni+1 are contiguous: one DMA brings both; both
    # row bands and masks double-buffer across grid steps
    def dmas(s, n_i, h_i):
        return (
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(n_i, 2), pl.ds(h_i * th, th + 2)],
                xbuf.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(
                m_hbm.at[n_i, pl.ds(h_i * th, th)],
                mbuf.at[s], sems.at[s, 1]),
        )

    @pl.when(step == 0)
    def _():
        for cp in dmas(slot, ni, hi):
            cp.start()

    last = pl.num_programs(0) * nh - 1

    @pl.when(step < last)
    def _():
        ns = step + 1
        for cp in dmas(jax.lax.rem(ns, 2), ns // nh,
                       jax.lax.rem(ns, nh)):
            cp.start()

    for cp in dmas(slot, ni, hi):
        cp.wait()

    def subm(xb):
        acc = jnp.zeros((th * wb, _LANES), jnp.float32)
        for dx in range(3):
            if dx == 1:
                xr = xb
            else:
                x32 = xb.astype(jnp.float32)
                xr = pltpu.roll(x32, (1 - dx) % wb, axis=1).astype(
                    xb.dtype)
            for dy in range(3):
                a = xr[dy:dy + th].reshape(th * wb, _LANES)
                acc += jnp.dot(a, w9_ref[dy * 3 + dx],
                               preferred_element_type=jnp.float32)
        return acc

    acc0 = subm(xbuf[slot, 0])
    acc1 = subm(xbuf[slot, 1])

    # (th, 8, wm) -> (th*wb, 8) slice-activity rows
    m = jnp.transpose(mbuf[slot], (0, 2, 1))[:, :wb].reshape(
        th * wb, _MSLOTS)

    a_s = vec_ref[0]
    b_s = vec_ref[1]
    m0 = jnp.dot(m, sel_ref[0], preferred_element_type=jnp.float32)
    m1 = jnp.dot(m, sel_ref[1], preferred_element_type=jnp.float32)
    y0 = jnp.maximum(acc0 * a_s + b_s, 0.0) * m0
    y1 = jnp.maximum(acc1 * a_s + b_s, 0.0) * m1

    dd = jnp.dot(y0.astype(o_ref.dtype), wd_ref[0],
                 preferred_element_type=jnp.float32)
    dd += jnp.dot(y1.astype(o_ref.dtype), wd_ref[1],
                  preferred_element_type=jnp.float32)

    md = jnp.maximum(
        jnp.dot(m, sel_ref[2], preferred_element_type=jnp.float32),
        jnp.maximum(
            jnp.dot(m, sel_ref[3], preferred_element_type=jnp.float32),
            jnp.dot(m, sel_ref[4], preferred_element_type=jnp.float32)))
    out = jnp.maximum(dd * vec_ref[2] + vec_ref[3], 0.0) * md
    o_ref[0] = out.reshape(th, wb, _LANES).astype(o_ref.dtype)


def fused_stage_call(xo, mask_f, w9, wd, vecs, sel):
    """Run the fused stage kernel.

    Args:
        xo: (N+1, Hp+2, Wb, 128) folded input; last block row zero.
        mask_f: (N, Hp, 8, Wm) slice-activity bits (bf16 0/1).
        w9: (9, 128, 128) banded subm weights.
        wd: (2, 128, 128) down weights (own-block rows, halo rows).
        vecs: (4, 128) f32 — a_subm, b_subm, a_down, b_down.
        sel: (5, 8, 128) bf16 — S_subm, S_halo, Sd0, Sd1, Sd2.
    Returns:
        (N, Hp, Wb, 128) down outputs (2 z' groups x C' in lanes).
    """
    np1, hp2, wb, _ = xo.shape
    n = np1 - 1
    hp = hp2 - 2
    wm = mask_f.shape[-1]
    assert hp % _TH == 0 and wb % 16 == 0
    kern = functools.partial(_kernel, th=_TH, wb=wb, wm=wm)
    return pl.pallas_call(
        kern,
        grid=(n, hp // _TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TH, wb, _LANES),
            lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, wb, _LANES), xo.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, _TH + 2, wb, _LANES), xo.dtype),
            pltpu.VMEM((2, _TH, _MSLOTS, wm), mask_f.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 20 * n * hp * wb * _LANES * _LANES,
            bytes_accessed=3 * n * hp * wb * _LANES * 2,
            transcendentals=0,
        ),
    )(xo, mask_f, w9, wd, vecs, sel)
