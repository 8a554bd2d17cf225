"""Pallas TPU kernel for the small-channel 3x3x3 submanifold conv.

XLA's conv3d on the (D, 400, 400, C=20) vertical-encoder grid runs at ~2%
MXU utilization (measured 96 ms for 346 GFLOP on v5e): the 20-channel minor
dim wastes 108/128 lanes of every tile.  This kernel restructures the
computation around Mosaic's alignment rules:

* the input is pre-transposed (in XLA, once) to ``(D+2, C, Hp, Wp)`` with
  the lane dim = W padded to a 128 multiple, so DMAs slice only aligned
  dims;
* the 27 taps are materialized with ``pltpu.roll`` (sublane/lane rolls are
  legal at any shift, unlike offset slices);
* each tap writes a 24-row (8-aligned) block of an im2col scratch of shape
  ``(27*24, TH*Wp)``, and one MXU GEMM per program computes
  ``(C_out, 27*24) @ (27*24, TH*Wp)``.

The output is produced as ``(D, C_out, H, Wp)`` and transposed/cropped back
by XLA.  C_out = 20 still caps MXU output-tile occupancy at 20/128 — the
remaining headroom needs channel fusion across stages (see ROADMAP.md).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 8          # output rows per program (sublane-aligned)
_HALO_ROWS = 16  # DMA'd rows per program (8-aligned over-fetch of TH+2)
_CPAD = 24       # per-tap channel rows, 8-aligned (C <= 24)


def _kernel(x_hbm, w_ref, o_ref, *, c_in, c_out, wp, th):
    """One (z, h-tile) program."""
    zi = pl.program_id(0)
    hi = pl.program_id(1)

    def inner(xbuf, cols, sem):
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(zi, 3), :, pl.ds(hi * th, _HALO_ROWS)],
            xbuf, sem)
        cp.start()
        cp.wait()

        tap = 0
        for dz in range(3):
            plane = xbuf[dz]                      # (C, HALO, Wp)
            for dy in range(3):
                for dx in range(3):
                    val = plane
                    needs_roll = dy or dx != 1
                    if needs_roll and val.dtype == jnp.bfloat16:
                        # Mosaic's dynamic_rotate rejects bf16 vectors
                        val = val.astype(jnp.float32)
                    if dy:  # negative shifts expressed as size - shift
                        val = pltpu.roll(val, _HALO_ROWS - dy, 1)
                    # output lane L holds original w = L-1 (cropped later),
                    # so tap dx needs xpad[L + dx - 1]
                    if dx != 1:
                        val = pltpu.roll(val, (1 - dx) % wp, 2)
                    cols[pl.ds(tap * _CPAD, c_in)] = val[
                        :, :th, :].astype(cols.dtype)
                    tap += 1

        mat = cols[...].reshape(27 * _CPAD, th * wp)
        out = jnp.dot(w_ref[...], mat,
                      preferred_element_type=jnp.float32)
        o_ref[0] = out.reshape(c_out, th, wp).astype(o_ref.dtype)

    pl.run_scoped(
        inner,
        xbuf=pltpu.VMEM((3, c_in, _HALO_ROWS, wp), x_hbm.dtype),
        cols=pltpu.VMEM((27 * _CPAD, th, wp), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA,
    )


def subm_conv3d_pallas(x, kernel):
    """3x3x3 SAME conv via the Pallas im2col kernel.

    Args:
        x: (B, D, H, W, C) input grid, C <= 24, H % 8 == 0.
        kernel: (3, 3, 3, C, C_out) weights ([dz, dy, dx] taps).
    Returns:
        (B, D, H, W, C_out), dtype of x.
    """
    b, d, h, w, c = x.shape
    c_out = kernel.shape[-1]
    assert c <= _CPAD and h % _TH == 0
    wp = int(np.ceil((w + 2) / 128)) * 128

    # weights -> (C_out, 27*24) with 24-padded per-tap channel blocks
    wk = jnp.transpose(kernel.astype(x.dtype), (0, 1, 2, 4, 3))
    wk = wk.reshape(27, c_out, c)
    wk = jnp.pad(wk, ((0, 0), (0, 0), (0, _CPAD - c)))
    wmat = jnp.transpose(wk, (1, 0, 2)).reshape(c_out, 27 * _CPAD)

    # input -> (D+2, C, H + halo, Wp): z/h/w halos zero, lane data at [1..w]
    xt = jnp.transpose(x, (0, 1, 4, 2, 3))           # (B, D, C, H, W)
    xt = jnp.pad(xt, ((0, 0), (1, 1), (0, 0),
                      (1, _HALO_ROWS - _TH - 1 + 1),
                      (1, wp - w - 1)))

    kern = functools.partial(_kernel, c_in=c, c_out=c_out, wp=wp, th=_TH)
    call = pl.pallas_call(
        kern,
        grid=(d, h // _TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c_out, _TH, wp),
            lambda zi, hi: (zi, 0, hi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, c_out, h, wp), x.dtype),
    )

    outs = []
    for i in range(b):
        y = call(xt[i], wmat)                        # (D, Co, H, Wp)
        outs.append(jnp.transpose(y[..., 1:w + 1], (0, 2, 3, 1)))
    return jnp.stack(outs)
