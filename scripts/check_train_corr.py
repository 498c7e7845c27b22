"""CPU (interpret) parity + VJP check for the fused training correlation
(ops/corr_pallas.corr_train_fused) against the exact XLA path
(ops/corr.corr_train x 2 levels + corr_stack).

Run: PYTHONPATH=.:/root/.axon_site python scripts/check_train_corr.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

# --tpu: run the Pallas kernels Mosaic-lowered on the real chip (the r03
# dynamic-rotate finding: interpret green does NOT imply chip-correct)
INTERP = "--tpu" not in sys.argv
if INTERP:
    jax.config.update("jax_platforms", "cpu")

from rampvo_tpu.ops.corr import corr_stack, corr_train
from rampvo_tpu.ops.corr_pallas import (
    corr_train_fused,
    make_corr_train_sched,
    paired_corr_perm,
)


def main():
    rng = np.random.RandomState(0)
    NF, H, W, C, P, M = 5, 32, 40, 128, 3, 8
    E = 300
    R = 3

    gmap = jnp.asarray(rng.randn(NF * M, P, P, C), jnp.float32) * 0.3
    fmap1 = jnp.asarray(rng.randn(NF, H, W, C), jnp.float32) * 0.3
    fmap2 = jnp.asarray(rng.randn(NF, H // 4, W // 4, C), jnp.float32) * 0.3
    jj = rng.randint(0, NF, E)
    kk = jnp.asarray(rng.randint(0, NF * M, E), jnp.int32)
    # centers well inside; small per-pixel spread (within SPREAD)
    cx = rng.uniform(8, W - 8, (E, 1, 1)) + rng.uniform(-2, 2, (E, P, P))
    cy = rng.uniform(8, H - 8, (E, 1, 1)) + rng.uniform(-2, 2, (E, P, P))
    coords = jnp.asarray(np.stack([cx, cy], -1), jnp.float32)

    sched = make_corr_train_sched(jj, NF, E_BLK=32)
    jjj = jnp.asarray(jj, jnp.int32)

    out = corr_train_fused(
        gmap, fmap1, fmap2, coords, kk, jjj,
        (sched["src"], sched["inv"]), sched["tabs"], 3, 32, INTERP,
    )
    assert out.shape == (E, P * P * 128)

    # exact reference path
    c1 = corr_train(gmap, fmap1, coords, kk, jjj, R)
    c2 = corr_train(gmap, fmap2, coords / 4.0, kk, jjj, R)
    ref = np.asarray(corr_stack(c1, c2), np.float32)

    idx = paired_corr_perm(P, R)
    rec = np.zeros_like(ref)
    outn = np.asarray(out, np.float32)
    for c_, rc in enumerate(idx):
        if rc >= 0:
            rec[:, rc] = outn[:, c_]
    scale = np.abs(ref).max()
    d = np.abs(ref - rec).max()
    print(f"fwd parity: {d/scale:.2e} rel (scale {scale:.2f})")
    assert np.isfinite(outn).all()
    assert d / scale < 2e-2, d / scale

    # ---- VJP parity ----
    ct = jnp.asarray(rng.randn(E, P * P * 128), jnp.float32) * 0.1
    # map the paired cotangent to the reference layout (garbage lanes have
    # no reference counterpart; keep their cotangent ZERO for equivalence)
    ct_np = np.zeros((E, P * P * 128), np.float32)
    ref_ct = np.asarray(ct, np.float32)
    ct_ref_layout = np.zeros((E, ref.shape[1]), np.float32)
    for c_, rc in enumerate(idx):
        if rc >= 0:
            ct_np[:, c_] = ref_ct[:, c_]
            ct_ref_layout[:, rc] = ref_ct[:, c_]
    ct_p = jnp.asarray(ct_np)
    ct_r = jnp.asarray(ct_ref_layout)

    def f_fused(g, f1, f2):
        return corr_train_fused(
            g, f1, f2, coords, kk, jjj,
            (sched["src"], sched["inv"]), sched["tabs"], 3, 32, INTERP,
        )

    def f_ref(g, f1, f2):
        a = corr_train(g, f1, coords, kk, jjj, R)
        b = corr_train(g, f2, coords / 4.0, kk, jjj, R)
        return corr_stack(a, b)

    _, vjp_fused = jax.vjp(f_fused, gmap, fmap1, fmap2)
    gg_f, gf1_f, gf2_f = vjp_fused(ct_p.astype(jnp.bfloat16))
    _, vjp_ref = jax.vjp(f_ref, gmap, fmap1, fmap2)
    gg_r, gf1_r, gf2_r = vjp_ref(ct_r)

    for name, a, b in (("d_gmap", gg_f, gg_r), ("d_fmap1", gf1_f, gf1_r),
                       ("d_fmap2", gf2_f, gf2_r)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        s = max(np.abs(b).max(), 1e-6)
        d = np.abs(a - b).max()
        print(f"{name}: {d/s:.2e} rel (scale {s:.3f})")
        assert d / s < 2e-2, (name, d / s)
    print("OK")


if __name__ == "__main__":
    main()
