"""VOState: the entire SLAM state as one fixed-shape pytree.

Replaces Ramp_vo's mutable attributes (ref: ramp/Ramp_vo.py:53-100) with a
functional design built for XLA:

  * frame-GLOBAL buffers (poses, patches, colors, trajectory deltas) are
    indexed by an immutable global frame id and never move. Keyframe
    eviction — which in the reference physically shifts pose/patch/feature
    buffers (Ramp_vo.py:258-268) — here only edits two small int32 maps.
  * `l2g` maps logical keyframe index -> global id (the reference's
    implicit row identity); `slotmap` maps logical index -> feature-ring
    slot, with a free-list (`slot_free`) replacing the reference's
    `n % mem` ring + shift.
  * the dynamic edge lists ii/jj/kk/net (Ramp_vo.py:92-94,200) become a
    fixed-capacity table with a validity mask; append = scatter into free
    slots, remove = mask clear.
  * trajectory interpolation deltas (Ramp_vo.py:100,155-160) are stored in
    device arrays (parent id + relative SE3), so the hot loop never syncs
    with the host; `terminate()` reads them back once.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .config import VOConfig


@struct.dataclass
class VOState:
    # ---- frame-global buffers (row = global frame id) ----
    poses: jnp.ndarray        # [F, 7] world-to-camera SE3
    patches: jnp.ndarray      # [F*M, 3, P, P]
    colors: jnp.ndarray       # [F, M, 3]
    delta_parent: jnp.ndarray  # [F] int32, -1 = none
    delta_dP: jnp.ndarray     # [F, 7] relative SE3 for removed/skipped frames

    # ---- logical maps ----
    l2g: jnp.ndarray          # [L] int32 logical keyframe -> global id (-1)
    slotmap: jnp.ndarray      # [L] int32 logical keyframe -> ring slot (-1)
    slot_free: jnp.ndarray    # [MEM] bool

    # ---- feature rings (row = ring slot) ----
    imap_r: jnp.ndarray       # [MEM, M, DIM]
    gmap_r: jnp.ndarray       # [MEM, M, P, P, 128]
    fmap1_r: jnp.ndarray      # [MEM, h, w, 128]
    fmap2_r: jnp.ndarray      # [MEM, h//4, w//4, 128]

    # ---- edge table ----
    ii: jnp.ndarray           # [E] int32 source (host) logical frame
    jj: jnp.ndarray           # [E] int32 target logical frame
    kk: jnp.ndarray           # [E] int32 logical patch id (= host*M + off)
    e_valid: jnp.ndarray      # [E] bool
    net: jnp.ndarray          # [E, DIM] hidden state
    last_weight: jnp.ndarray  # [E, 2]

    # ---- encoder recurrent state ----
    enc: Any

    # ---- scalars ----
    n: jnp.ndarray            # int32 number of logical keyframes
    counter: jnp.ndarray      # int32 next global frame id (VO frames only)
    initialized: jnp.ndarray  # bool
    intrinsics: jnp.ndarray   # [4] fx fy cx cy at 1/RES
    rng: jnp.ndarray          # PRNG key


def init_state(cfg: VOConfig, enc_state, ht: int, wd: int, P: int = 3,
               dim: int = 384) -> VOState:
    """ht, wd: full input resolution; feature maps live at 1/4."""
    F, L, M, E = cfg.MAX_FRAMES, cfg.BUFFER_SIZE, cfg.M, cfg.EDGE_CAPACITY
    MEM = cfg.MEM
    h, w = ht // 4, wd // 4
    fdt = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32

    poses = jnp.zeros((F, 7), jnp.float32).at[:, 6].set(1.0)
    return VOState(
        poses=poses,
        patches=jnp.zeros((F * M, 3, P, P), jnp.float32),
        colors=jnp.zeros((F, M, 3), jnp.float32),
        delta_parent=jnp.full((F,), -1, jnp.int32),
        delta_dP=jnp.zeros((F, 7), jnp.float32).at[:, 6].set(1.0),
        l2g=jnp.full((L,), -1, jnp.int32),
        slotmap=jnp.full((L,), -1, jnp.int32),
        slot_free=jnp.ones((MEM,), bool),
        imap_r=jnp.zeros((MEM, M, dim), fdt),
        gmap_r=jnp.zeros((MEM, M, P, P, 128), fdt),
        fmap1_r=jnp.zeros((MEM, h, w, 128), fdt),
        fmap2_r=jnp.zeros((MEM, h // 4, w // 4, 128), fdt),
        ii=jnp.zeros((E,), jnp.int32),
        jj=jnp.zeros((E,), jnp.int32),
        kk=jnp.zeros((E,), jnp.int32),
        e_valid=jnp.zeros((E,), bool),
        net=jnp.zeros((E, dim), jnp.float32),
        last_weight=jnp.zeros((E, 2), jnp.float32),
        enc=enc_state,
        n=jnp.int32(0),
        counter=jnp.int32(0),
        initialized=jnp.asarray(False),
        intrinsics=jnp.zeros((4,), jnp.float32),
        rng=jax.random.PRNGKey(0),
    )
