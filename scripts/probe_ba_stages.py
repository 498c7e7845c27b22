"""Decompose ba_infer's per-iteration cost on TPU: linearize vs assemble
vs solve vs retract. Guides whether BA needs a Pallas kernel or an XLA
layout restructure."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.ba.core import (
    _assemble,
    _assemble_cellwise,
    _solve_schur,
    linearize_center,
)
from rampvo_tpu.lie import ops as lops
from rampvo_tpu.vo.state import host_of_row


def main():
    rng = np.random.RandomState(0)
    NI, T, Mp = 25, 25, 96
    r, n = 13, 40
    E = NI * T * Mp
    Nwin, PW = 10, 26
    Mwin = PW * Mp
    base = n - PW

    i_row = np.arange(NI)[:, None]
    tt = np.arange(T)[None, :]
    i = n - 1 - np.mod(n - 1 - i_row, NI) + 0 * tt
    j = i + tt - (r - 1)
    cellv = (i >= 0) & (j >= 0) & (j <= n - 1) & (i >= n - (NI - 3))
    ii = np.broadcast_to(i[:, :, None], (NI, T, Mp))
    jj = np.broadcast_to(j[:, :, None], (NI, T, Mp))
    m_ = np.broadcast_to(np.arange(Mp)[None, None, :], (NI, T, Mp))
    kk = ii * Mp + m_
    valid = np.broadcast_to(cellv[:, :, None], (NI, T, Mp))
    iif = jnp.asarray(np.where(valid, ii - base, 0).reshape(E), jnp.int32)
    jjf = jnp.asarray(np.where(valid, jj - base, 0).reshape(E), jnp.int32)
    kkf = jnp.asarray(np.where(valid, kk - base * Mp, 0).reshape(E), jnp.int32)
    vf = jnp.asarray(valid.reshape(E))

    poses7 = lops.se3_exp(jnp.asarray(0.01 * rng.randn(64, 6), jnp.float32))
    centers = jnp.asarray(rng.rand(E, 3), jnp.float32)
    intr_e = jnp.broadcast_to(
        jnp.asarray([320.0, 320.0, 320.0, 240.0], jnp.float32), (E, 4)
    )
    targets = jnp.asarray(rng.rand(E, 2) * 400, jnp.float32)
    weights = jnp.asarray(rng.rand(E, 2), jnp.float32)

    lin = jax.jit(lambda p, c: linearize_center(p, c, intr_e, intr_e, iif, jjf))
    coords, Z, Ji, Jj, Jz = lin(poses7, centers)
    w = weights * vf[:, None]
    rr = (targets - coords) * vf[:, None]

    asm = jax.jit(
        lambda rr, w, Ji, Jj, Jz: _assemble(
            rr, w, Ji, Jj, Jz, iif - (PW - Nwin), jjf - (PW - Nwin), kkf,
            Nwin, Mwin,
        )
    )
    Bm, Em, C, v, u, touched = asm(rr, w, Ji, Jj, Jz)

    slv = jax.jit(
        lambda Bm, Em, C, v, u: _solve_schur(
            Bm, Em, C, v, u, jnp.float32(1e-4), 1.0, 1e-4, False,
            jnp.int32(Nwin),
        )
    )

    def timeit(fn, fetch, n_it=20):
        out = fn()
        fetch(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n_it):
                out = fn()
            fetch(out)
            best = min(best, (time.perf_counter() - t0) / n_it)
        return best * 1e3

    wf = base + jnp.arange(PW, dtype=jnp.int32)
    wrow = jnp.mod(wf, NI)
    held = host_of_row(wrow, jnp.int32(n), NI) == wf
    win_rows = jnp.where(held & (wf < n), wrow, -1).astype(jnp.int32)
    asm_c = jax.jit(
        lambda rr, w, Ji, Jj, Jz: _assemble_cellwise(
            rr, w, Ji, Jj, Jz, iif - (PW - Nwin), jjf - (PW - Nwin),
            Nwin, Mwin, (NI, T, Mp), win_rows,
        )
    )

    t_lin = timeit(lambda: lin(poses7, centers),
                   lambda o: float(jnp.sum(o[0][:64])))
    t_asm = timeit(lambda: asm(rr, w, Ji, Jj, Jz),
                   lambda o: float(jnp.sum(o[0][:6])))
    t_asc = timeit(lambda: asm_c(rr, w, Ji, Jj, Jz),
                   lambda o: float(jnp.sum(o[0][:6])))
    t_slv = timeit(lambda: slv(Bm, Em, C, v, u),
                   lambda o: float(jnp.sum(o[0])))
    print(f"linearize : {t_lin:6.2f} ms")
    print(f"assemble  : {t_asm:6.2f} ms")
    print(f"asm cell  : {t_asc:6.2f} ms")
    print(f"solve     : {t_slv:6.2f} ms")
    print(f"x2 iters  : {2*(t_lin+t_asc+t_slv):6.2f} ms (+retract/glue)")


if __name__ == "__main__":
    main()
