"""Pallas TPU kernel for 3x3 2D convs on the z-folded encoder layout.

The z-fold lowering (models/layers.py ``_subm_conv3d_zfold``) turns the
vertical encoder's narrow 3x3x3 convs into 3x3 2D convs whose channel
dims are ~128 wide — but XLA's conv emitter still runs them at ~15% MXU
(measured 23 ms for stage 1's 0.7 TFLOP on v5e, vs ~4 ms at the roofline).
This kernel computes the same conv as 9 accumulating 128-wide MXU GEMMs:

* layout NHWC with C (128, zero-padded) in lanes and W in sublanes;
* W is padded so ``pltpu.roll`` wrap-around lands in zero columns — the
  dx = 0/2 taps are sublane rolls (legal at any shift; routed through
  f32, Mosaic rejects bf16 rolls), dy taps are slices of the H halo;
* each program DMA-loads a (TH+2, Wb, 128) row band and accumulates
  ``(TH*Wb, 128) @ (128, 128)`` per tap into an f32 scratch.

A custom VJP keeps training on the kernel: dx is the same kernel with
the taps flipped and the per-tap weight blocks transposed; dw (a small
(9, 128, 128) output) is a plain XLA contraction.

Reference: the conv stack this accelerates is the spconv middle encoder
at model/PointPillars.py:529-573.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 8      # output rows per program
_LANES = 128


def _kernel(x_hbm, w_ref, o_ref, xbuf, sems, *, th, wb):
    """One (n, h-band) program: 9-tap accumulated GEMM.

    Input row bands are double-buffered across grid steps: while band i
    computes, band i+1's DMA is in flight — without this the per-program
    issue+wait latency serializes against compute (~25% measured)."""
    ni = pl.program_id(0)
    hi = pl.program_id(1)
    nh = pl.num_programs(1)
    step = ni * nh + hi
    slot = jax.lax.rem(step, 2)

    def dma(slot_idx, n_idx, h_idx):
        return pltpu.make_async_copy(
            x_hbm.at[n_idx, pl.ds(h_idx * th, th + 2)],
            xbuf.at[slot_idx], sems.at[slot_idx])

    @pl.when(step == 0)
    def _():
        dma(slot, ni, hi).start()

    last = pl.num_programs(0) * nh - 1

    @pl.when(step < last)
    def _():
        nstep = step + 1
        dma(jax.lax.rem(nstep, 2), nstep // nh,
            jax.lax.rem(nstep, nh)).start()

    dma(slot, ni, hi).wait()

    acc = jnp.zeros((th * wb, _LANES), jnp.float32)
    for dx in range(3):
        if dx == 1:
            xr = xbuf[slot]
        else:
            # output col w reads input col w + dx - 1; wrap-around
            # columns are zero padding
            x32 = xbuf[slot].astype(jnp.float32)
            xr = pltpu.roll(x32, (1 - dx) % wb, axis=1).astype(
                x_hbm.dtype)
        for dy in range(3):
            a = xr[dy:dy + th].reshape(th * wb, _LANES)
            acc += jnp.dot(a, w_ref[dy * 3 + dx],
                           preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(th, wb, _LANES).astype(o_ref.dtype)


def _conv2d_3x3_raw(xp, w9, h):
    """(N, H+2, Wb, 128) x (9, 128, 128) -> (N, H, Wb, 128).

    ``xp`` carries one halo row top/bottom and >= 2 zero columns at the
    right edge (roll wrap lands there); channels are zero-padded to 128.
    """
    n, hp2, wb, _ = xp.shape
    assert hp2 == h + 2 and h % _TH == 0 and wb % 16 == 0
    kern = functools.partial(_kernel, th=_TH, wb=wb)
    return pl.pallas_call(
        kern,
        grid=(n, h // _TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TH, wb, _LANES),
            lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wb, _LANES), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, _TH + 2, wb, _LANES), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * wb * _LANES * _LANES,
            bytes_accessed=2 * n * h * wb * _LANES * 2,
            transcendentals=0,
        ),
    )(xp, w9)


def _pad_input(x, h_mult=_TH):
    """(N, H, W, C) -> (N, Hp+2, Wb, 128) with halos/zero padding; returns
    (padded, hp) with hp the padded (working) H."""
    n, h, w, c = x.shape
    hp = -(-h // h_mult) * h_mult
    wb = max(-(-(w + 2) // 16) * 16, 32)
    return jnp.pad(x, ((0, 0), (1, hp - h + 1), (0, wb - w),
                       (0, _LANES - c))), hp


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv2d_3x3_pallas(x, w):
    """3x3 SAME 2D conv via the Pallas folded-GEMM kernel.

    Args:
        x: (N, H, W, C) input, C <= 128.
        w: (3, 3, C, Co) weights, Co <= 128.
    Returns:
        (N, H, W, Co) in x.dtype.
    """
    return _conv_fwd_impl(x, w)


def _conv_fwd_impl(x, w):
    n, h, width, c = x.shape
    co = w.shape[-1]
    xp, hp = _pad_input(x)
    w9 = jnp.pad(w.astype(x.dtype).reshape(9, c, co),
                 ((0, 0), (0, _LANES - c), (0, _LANES - co)))
    y = _conv2d_3x3_raw(xp, w9, hp)
    return y[:, :h, :width, :co]


def _conv_fwd(x, w):
    return _conv_fwd_impl(x, w), (x, w)


def _conv_bwd(res, g):
    x, w = res
    n, h, width, c = x.shape
    co = w.shape[-1]
    g = g.astype(x.dtype)

    # dx = conv2d(g, w_flipped^T): tap (dy, dx) of the gradient conv is
    # tap (2-dy, 2-dx) of w with in/out channels swapped
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # (3, 3, Co, C)
    gp, hp = _pad_input(g)
    w9 = jnp.pad(wt.astype(x.dtype).reshape(9, co, c),
                 ((0, 0), (0, _LANES - co), (0, _LANES - c)))
    dx = _conv2d_3x3_raw(gp, w9, hp)[:, :h, :width, :c]

    # dw[dy, dx, i, o] = sum_nhw x[n, h+dy-1, w+dx-1, i] g[n, h, w, o]
    # — 9 GEMMs with a (C, Co) output each; the contraction dim is the
    # N*H*W rows, which XLA tiles onto the MXU well
    xz = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g2 = g.reshape(-1, co)
    taps = []
    for dy in range(3):
        for dx_ in range(3):
            xs = jax.lax.dynamic_slice(
                xz, (0, dy, dx_, 0), (n, h, width, c)).reshape(-1, c)
            taps.append(jax.lax.dot_general(
                xs, g2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).reshape(3, 3, c, co).astype(w.dtype)
    return dx.astype(x.dtype), dw


conv2d_3x3_pallas.defvjp(_conv_fwd, _conv_bwd)


def zfold_conv_supported(c_fold, co_fold, h, w):
    """Whether the kernel covers this folded conv's shapes."""
    return (c_fold <= _LANES and co_fold <= _LANES
            and jax.default_backend() == "tpu")
