"""Compile-probe for the two primitives the cell-batched fused4 corr
kernel needs beyond fused3:

  1. fori_loop with DYNAMIC bounds (from the scalar-prefetch table);
  2. VMEM reads/writes at a dynamic 8-ALIGNED SUBLANE offset computed
     from the loop index (the fused4 vcol/out layout flattens the t axis
     into the tiled sublane dim: row = tc*M*PP + i*gang*PP).

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_dynlane.py [cpu]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

SP, T, W = 144, 8, 384


def kernel(tabs, vcol_ref, x_ref, o_ref):
    b = pl.program_id(0)
    tlo = tabs[b, 0]
    thi = tabs[b, 1]

    def cell(tc, carry):
        v_ = vcol_ref[0, pl.ds(tc * SP, SP), pl.ds(0, 1)]   # [SP, 1]
        r = x_ref[...] + v_.astype(jnp.float32)
        o_ref[0, pl.ds(tc * SP, SP), :] = r.astype(o_ref.dtype)
        return carry + 1

    jax.lax.fori_loop(tlo, thi + 1, cell, 0)


def main():
    tabs = jnp.asarray([[2, 6]], jnp.int32)
    vcol = jnp.asarray(
        np.random.randint(0, 1 << 20, (1, T * SP, 2)), jnp.int32
    )
    x = jnp.asarray(np.random.rand(SP, W), jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, T * SP, 2), lambda b, tb: (0, 0, 0)),
                pl.BlockSpec((SP, W), lambda b, tb: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, T * SP, W), lambda b, tb: (0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, T * SP, W), jnp.float32),
    )(tabs, vcol, x)
    t0 = time.time()
    got = np.asarray(out)[0]
    want = np.zeros((T * SP, W), np.float32)
    for tc in range(2, 7):
        want[tc * SP:(tc + 1) * SP] = (
            np.asarray(x) + np.asarray(vcol)[0, tc * SP:(tc + 1) * SP, 0:1]
        )
    err = np.abs(got[2 * SP:7 * SP] - want[2 * SP:7 * SP]).max()
    print(f"ran in {time.time() - t0:.1f}s  maxerr={err:.3e}")
    assert err == 0.0, "dynamic-bound loop + sublane-offset IO wrong"
    print("dynamic fori bounds + dynamic sublane-offset IO: OK")


if __name__ == "__main__":
    main()
