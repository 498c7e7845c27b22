"""Isolate the lattice kernel's per-grid-step overhead.

Variants:
  A. no-op body, constant block indices (pure grid machinery)
  B. no-op body, realistic varying indices (adds per-step block DMAs)
  C. no-op body, varying indices, single fused output (halves out DMAs)

If B >> A the fixed cost is DMA issue latency per step, and consolidating
blocks (C, or per-target grids) is the right attack.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NI, T, M, PP = 25, 25, 96, 9
D, TX = 8, 24
C = 128
NTGT = NI + 13 - 2
NB = NTGT * T
MEM, Hp, Wp = 32, 168, 224


def timeit(fn, n_it=20):
    out = fn()
    float(jnp.sum(out[0].astype(jnp.float32)[:2, 0, 0, 0]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = fn()
        float(jnp.sum(out[0].astype(jnp.float32)[:2, 0, 0, 0]))
        best = min(best, (time.perf_counter() - t0) / n_it)
    return best * 1e3


def make_tabs(varying: bool):
    b = np.arange(NB)
    a, t = b // T, b % T
    n = 40
    j = n - NTGT + a
    i = j - t + 12
    row = np.mod(i, NI)
    occupied = (n - 1 - np.mod(n - 1 - row, NI)) == i
    valid = occupied & (i >= 0) & (j >= 0) & (j <= n - 1) & (i >= n - 22)
    if varying:
        in_row = np.where(valid, row, 0)
        t_io = np.where(valid, t, 0)
        gslot = np.where(valid, np.mod(i, MEM), 0)
        out_row = np.where(valid, row, NI)
    else:
        in_row = np.zeros(NB, np.int64)
        t_io = np.zeros(NB, np.int64)
        gslot = np.zeros(NB, np.int64)
        out_row = np.full(NB, NI)
    return jnp.asarray(
        np.stack([in_row, t_io, gslot, gslot, out_row], 1), jnp.int32
    ), int(valid.sum())


def run_two_outs(tabs, f1, f2, g, scal):
    def kernel(tabs, f1, f2, g_ref, scal_ref, out1, out2, s1, s2, sem1, sem2):
        out1[0, 0, 0, 0] = jnp.zeros((1, D * TX), jnp.bfloat16)
        out2[0, 0, 0, 0] = jnp.zeros((1, D * TX), jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, M * PP, C), lambda b, tb: (tb[b, 3], 0, 0)),
                pl.BlockSpec((1, 1, M, 22), lambda b, tb: (tb[b, 0], tb[b, 1], 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, M, PP, 1, D * TX),
                             lambda b, tb: (tb[b, 4], tb[b, 1], 0, 0, 0, 0)),
                pl.BlockSpec((1, 1, M, PP, 1, D * TX),
                             lambda b, tb: (tb[b, 4], tb[b, 1], 0, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((Hp, Wp, C), jnp.bfloat16),
                pltpu.VMEM((64, 80, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((NI + 1, T, M, PP, 1, D * TX), jnp.bfloat16)
        ] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(tabs, f1, f2, g, scal)


def run_one_out(tabs, f1, f2, g, scal):
    def kernel(tabs, f1, f2, g_ref, scal_ref, out, s1, s2, sem1, sem2):
        out[0, 0, 0, 0] = jnp.zeros((1, D * TX), jnp.bfloat16)

    return [pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, M * PP, C), lambda b, tb: (tb[b, 3], 0, 0)),
                pl.BlockSpec((1, 1, M, 22), lambda b, tb: (tb[b, 0], tb[b, 1], 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, M, 2 * PP, 1, D * TX),
                             lambda b, tb: (tb[b, 4], tb[b, 1], 0, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((Hp, Wp, C), jnp.bfloat16),
                pltpu.VMEM((64, 80, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((NI + 1, T, M, 2 * PP, 1, D * TX), jnp.bfloat16)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(tabs, f1, f2, g, scal)[0]]


def main():
    f1 = jnp.zeros((MEM, Hp, Wp, C), jnp.bfloat16)
    f2 = jnp.zeros((MEM, 64, 80, C), jnp.bfloat16)
    g = jnp.zeros((MEM, M * PP, C), jnp.bfloat16)
    scal = jnp.zeros((NI, T, M, 22), jnp.int32)

    tabs_c, _ = make_tabs(False)
    tabs_v, nv = make_tabs(True)
    ta = timeit(lambda: run_two_outs(tabs_c, f1, f2, g, scal))
    tb = timeit(lambda: run_two_outs(tabs_v, f1, f2, g, scal))
    tc = timeit(lambda: run_one_out(tabs_v, f1, f2, g, scal))
    print(f"A constant idx, 2 outs : {ta:6.1f} ms   (NB={NB})")
    print(f"B varying idx,  2 outs : {tb:6.1f} ms   (valid={nv})")
    print(f"C varying idx,  1 out  : {tc:6.1f} ms")


if __name__ == "__main__":
    main()
