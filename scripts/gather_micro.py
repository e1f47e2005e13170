"""Microbenchmark: TPU gather primitives for the patch-local SpMV kernel.

Measures (a) XLA's flat gather at several sizes (the round-1 bottleneck),
(b) Mosaic's within-tile (8,128) dynamic_gather throughput inside a
Pallas kernel shaped like the patch-local ELL SpMV: x_patches streamed as
(8,128) tiles, K gathers + FMAs per tile.

The patch-local design: nodes partitioned into 128-slot patches (own +
halo slots); each ELL entry's column is a slot of the SAME patch (halo
slots hold copies of foreign values), so the neighbour gather becomes a
lane-shuffle of the tile — the only gather shape Mosaic supports
(lowering.py _gather_lowering_rule: in.shape == idx.shape == out.shape,
2D, one tile).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, reps=50):
    """Readback-terminated timing: on the axon backend,
    block_until_ready acks optimistically, so a scalar fetch is the only
    trustworthy fence. The measured readback roundtrip (~52 ms) is
    subtracted."""
    y = fn(*args)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    float(jnp.sum(fn(*args)))
    rt = time.perf_counter() - t0  # 1 exec + readback
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(*args)
    float(jnp.sum(y))
    tot = time.perf_counter() - t0
    # tot = reps * exec + readback; rt = exec + readback
    return max((tot - rt) / (reps - 1), 1e-9)


def xla_gather(n_src, n_idx):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_src), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n_src, n_idx), jnp.int32)
    f = jax.jit(lambda x, i: x[i])
    t = bench(f, x, idx)
    print(f"XLA flat gather  {n_idx:>9} elems from {n_src:>8}: "
          f"{t*1e3:7.3f} ms  {n_idx/t/1e9:6.2f} Gelem/s")


def pallas_patch_spmv(n_patches, K, reps=50):
    """y[p, j] = sum_k vals[p, j, k] * x[p, idx[p, j, k]] — the in-patch
    scalar ELL SpMV with per-patch lane gathers."""
    rng = np.random.default_rng(0)
    P, L = n_patches, 128
    x = jnp.asarray(rng.standard_normal((P, L)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((P, L, K)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, L, (P, L, K)), jnp.int32)
    TP = 8  # patches per grid step

    def kernel(x_ref, v_ref, i_ref, o_ref):
        acc = jnp.zeros((TP, L), jnp.float32)
        for k in range(K):
            xg = jnp.take_along_axis(x_ref[:], i_ref[:, :, k], axis=1)
            acc = acc + v_ref[:, :, k] * xg
        o_ref[:] = acc

    f = jax.jit(lambda x, v, i: pl.pallas_call(
        kernel,
        grid=(P // TP,),
        in_specs=[
            pl.BlockSpec((TP, L), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, L, K), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, L, K), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TP, L), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
    )(x, v, i))

    # correctness
    y = np.asarray(f(x, vals, idx))
    xn, vn, idn = np.asarray(x), np.asarray(vals), np.asarray(idx)
    ref = np.zeros((P, L), np.float32)
    for k in range(K):
        xg = np.take_along_axis(xn, idn[:, :, k], axis=1)
        ref += vn[:, :, k] * xg
    ok = np.allclose(y, ref, atol=1e-4)

    t = bench(f, x, vals, idx, reps=reps)
    nbytes = vals.size * 4 + idx.size * 4 + 2 * x.size * 4
    ng = P * L * K
    print(f"pallas patch-ELL P={P} K={K}: {t*1e3:7.3f} ms  "
          f"{ng/t/1e9:6.2f} Ggather/s  {nbytes/t/1e9:7.1f} GB/s  ok={ok}")


def main():
    for n in (262144, 1048576, 4194304):
        xla_gather(n, n)
    for P, K in ((2048, 8), (2048, 16), (8192, 8)):
        pallas_patch_spmv(P, K)


if __name__ == "__main__":
    main()
