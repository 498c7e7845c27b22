"""ON-CHIP parity of the channel-major Pallas encoder chains vs flax.

Interpret-mode green does not imply chip-correct (r03 dynamic-rotate
finding); this runs both families Mosaic-lowered on the real chip and
diffs against the flax path. Run before defaulting PALLAS_ENCODER.

Run alone: python scripts/check_encoder_onchip.py   (add --cpu for interpret)
"""

import sys

sys.path.insert(0, ".")

INTERP = "--cpu" in sys.argv

import jax

if INTERP:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models.encoders import MultiScaleEncoder, SingleScaleEncoder
from rampvo_tpu.ops.encoder_pallas import (
    pallas_multiscale_encode,
    pallas_singlescale_encode,
    singlescale_init_state_cm,
)


def _diff(name, a, b, scale=None, thresh=2e-2):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    s = scale or max(np.abs(a).max(), 1e-6)
    d = np.abs(a - b).max()
    ok = d / s < thresh and np.isfinite(b).all()
    print(f"{name:24s} {d/s:9.2e} rel  {'OK' if ok else 'WRONG'}",
          flush=True)
    return ok


def main():
    H, W = 64, 96
    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
    im = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    ok = True

    # ---- MultiScale (two steps: carried super-state) ----
    st = MultiScaleEncoder.init_state(H, W)
    st = jax.tree_util.tree_map(lambda x: x + 0.1, st)
    m = MultiScaleEncoder()
    params = m.init(jax.random.PRNGKey(0), ev, im, jnp.asarray([True]),
                    st, 1)
    mask = jnp.asarray([True])
    f1, i1, s1 = m.apply(params, ev, im, mask, st, 1)
    f1b, i1b, s1b = m.apply(params, ev, im, mask, s1, 1)

    f2, i2, s2 = pallas_multiscale_encode(
        params["params"], ev, im, mask, st, interpret=INTERP
    )
    f2b, i2b, _ = pallas_multiscale_encode(
        params["params"], ev, im, mask, s2, interpret=INTERP
    )
    # fmap threshold 5e-2: the fmap head ends in INSTANCE NORM, which
    # amplifies matmul-precision rounding ~3-4x — on chip the flax path
    # vs ITSELF at highest matmul precision measures 2.3e-2 on fmap /
    # 7.5e-3 on imap (r04 probe), so 2e-2 would flag legitimate rounding.
    # The defended-against failure mode (Mosaic miscompile) shows ~1.0 rel.
    ok &= _diff("MS fmap (step 1)", f1, f2, thresh=5e-2)
    ok &= _diff("MS imap (step 1)", i1, i2)
    ok &= _diff("MS fmap (step 2, carry)", f1b, f2b, thresh=5e-2)
    ok &= _diff("MS imap (step 2, carry)", i1b, i2b)

    # ---- SingleScale (carried h/c/ss channel-major state) ----
    ss = SingleScaleEncoder()
    st0 = SingleScaleEncoder.init_state(H, W)
    params_s = ss.init(jax.random.PRNGKey(1), ev, im, st0)
    g1, j1, t1 = ss.apply(params_s, ev, im, st0)
    g1b, j1b, _ = ss.apply(params_s, ev, im, t1)

    cm0 = singlescale_init_state_cm(H, W)
    g2, j2, t2 = pallas_singlescale_encode(
        params_s["params"], ev, im, cm0, interpret=INTERP
    )
    g2b, j2b, _ = pallas_singlescale_encode(
        params_s["params"], ev, im, t2, interpret=INTERP
    )
    ok &= _diff("SS fmap (step 1)", g1, g2)
    ok &= _diff("SS imap (step 1)", j1, j2)
    ok &= _diff("SS fmap (step 2, carry)", g1b, g2b)
    ok &= _diff("SS imap (step 2, carry)", j1b, j2b)

    if not ok:
        print("ENCODER ON-CHIP PARITY FAILURES")
        sys.exit(1)
    print("pallas encoders correct" + (" (interpret)" if INTERP else
                                       " on chip"))


if __name__ == "__main__":
    main()
