"""Does unrolling the grid-scatter insert loop cut its loop overhead?

The single-pass Pallas grid build (ops/grid_scatter.py) measures ~20 ms
for a 640 MB zero-fill + 102400 sequential row inserts — roughly 12 ms
above its bytes floor, consistent with ~100 cycles/iteration of fori
overhead.  This probes unroll factors on the real chip.

Usage: python tools/profile_grid_scatter_unroll.py
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, ".")

from objectdetection_3d_tpu.ops import grid_scatter as gs  # noqa: E402

D, H, W = 100, 400, 400
V, C = 102_400, 20
BF = jnp.bfloat16


def make_kernel(unroll):
    def _kernel(bounds_ref, cell_ref, feats_ref, grid_ref):
        chunk = grid_ref.shape[1]
        win = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        grid_ref[...] = jnp.zeros_like(grid_ref)
        k0 = bounds_ref[win]
        k1 = bounds_ref[win + 1]
        base = win * chunk
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

        def body(j, _):
            r = cell_ref[j] - base
            j8 = pl.multiple_of((j // 8) * 8, 8)
            fsel = (lane8 == (j - j8)).astype(feats_ref.dtype)
            frow = jnp.sum(feats_ref[pl.ds(j8, 8), :] * fsel, axis=0)
            r8 = pl.multiple_of((r // 8) * 8, 8)
            m = lane8 == (r - r8)
            blk = grid_ref[0, pl.ds(r8, 8), :]
            grid_ref[0, pl.ds(r8, 8), :] = jnp.where(m, frow[None, :], blk)
            return 0

        jax.lax.fori_loop(k0, k1, body, 0, unroll=unroll)

    return _kernel


def build(unroll):
    nq = 4
    chunk = H * W // nq

    @jax.jit
    def run(feats, cell_flat):
        bounds = jnp.searchsorted(
            cell_flat,
            jnp.arange(D * nq + 1, dtype=jnp.int32) * chunk,
            side="left").astype(jnp.int32)
        return pl.pallas_call(
            make_kernel(unroll),
            grid=(D, nq),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((V, C), lambda i, q: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, chunk, C),
                                   lambda i, q: (i * nq + q, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((D * nq, chunk, C), feats.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(bounds, cell_flat, feats)

    return run


def main():
    rng = np.random.default_rng(0)
    cells = np.sort(rng.choice(D * H * W, V - 1024,
                               replace=False)).astype(np.int32)
    cell_flat = np.concatenate(
        [cells, np.full(1024, D * H * W, np.int32)])
    feats = rng.normal(0, 1, (V, C)).astype(np.float32)
    f_dev = jax.device_put(jnp.asarray(feats, BF))
    c_dev = jax.device_put(jnp.asarray(cell_flat))
    float(f_dev.sum())

    ref = None
    for unroll in (False, 2, 4, 8):
        try:
            run = build(unroll)
            out = run(f_dev, c_dev)
            s = float(out.sum())
            if ref is None:
                ref = s
            ts = []
            for _ in range(10):
                t0 = time.time()
                out = run(f_dev, c_dev)
                float(out[0, 0, 0])
                ts.append(time.time() - t0)
            print(f"unroll={unroll!s:5s}: {np.median(ts) * 1000:7.2f} ms "
                  f"(sum {s:.1f} vs ref {ref:.1f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"unroll={unroll!s:5s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
