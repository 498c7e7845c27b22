"""VO runtime configuration (ref: ramp/config.py + config_vo/*.yaml).

Frozen dataclass so it can be a static jit argument. `from_yaml` consumes
the reference's config_vo files unchanged.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class VOConfig:
    # ref defaults: ramp/config.py:3-27
    BUFFER_SIZE: int = 2048
    PATCHES_PER_FRAME: int = 96
    REMOVAL_WINDOW: int = 22
    OPTIMIZATION_WINDOW: int = 10
    PATCH_LIFETIME: int = 13
    KEYFRAME_INDEX: int = 4
    KEYFRAME_THRESH: float = 15.0
    MOTION_MODEL: str = "DAMPED_LINEAR"
    MOTION_DAMPING: float = 0.5
    MIXED_PRECISION: bool = True
    GRADIENT_BIAS: bool = False

    # motion-probe gate threshold (ref: Ramp_vo.py:385); < 0 disables the
    # gate (every frame committed) — used by benchmarks/synthetic tests
    PROBE_THRESH: float = 2.0

    # correlation kernel: "auto" = best TPU path on TPU, exact XLA
    # tile-gather elsewhere; "xla" / "pallas" / "region" force one
    # implementation (region = one gather per edge + batched MXU dots);
    # "lattice" forces the lattice kernel, "lattice_interpret" runs it in
    # Pallas interpret mode (CPU-runnable — test coverage of the TPU path)
    CORR_IMPL: str = "auto"

    # lattice-path implementation toggles. CORR_LAYOUT: "fused4" =
    # fused3 with the lattice cells BATCHED per grid step (one step per
    # target t-band, in-kernel dynamic t-loop) — removes the ~7.7 us x
    # 546-step Pallas grid machinery that was the fused3 kernel's largest
    # fixed term (r04 phase ablation ~4.2 ms/update). "fused3"
    # (hardware path) = fused2 on STRIP-MAJOR feature rings —
    # the per-edge tile is one contiguous 8-aligned 2-D sublane slice
    # (no Mosaic relayout into the MXU dot), small exact level-2 tile,
    # blend-folded S4 extraction, compact grid; in-process A/B r04:
    # -3.1 ms/call vs fused2 at bench shapes, in-spread parity EXACT.
    # "fused2" = the padded-ring ancestor (kept: second hardware-safe
    # path, and the non-strip rings it shares with the probe path).
    # Both use STATIC-amount rolls only, the one roll construct that
    # lowers correctly on real hardware. "folded" (corr_lattice2_stacked
    # folded=True) uses per-window DYNAMIC-amount pltpu.roll, which
    # SILENTLY MISCOMPILES on the TPU (r03 finding: interpret-mode green,
    # 1.0 rel garbage on chip — scripts/check_layouts_onchip.py); it
    # remains as the CPU/interpret reference implementation only.
    # Measured dead-end layouts (fused, paired, compact, stacked
    # generations) were removed in r04 — see STATUS.md's graveyard record.
    # channel-major Pallas kernel for the per-scale LSTM+fold chain
    # (ops/encoder_pallas.py) — removes the NHWC lane-padding tax on the
    # C<=32 intermediates; heads stay flax. Measured -0.9 ms/frame on chip
    # (scripts/ab_frame_variants.py r03). "auto" (default) = on when the
    # backend is a real TPU, off elsewhere (interpret-mode Pallas on CPU
    # is orders of magnitude slower than the flax path); True/False force.
    PALLAS_ENCODER: object = "auto"

    def pallas_encoder_on(self) -> bool:
        """Resolve PALLAS_ENCODER ("auto" = TPU backend only)."""
        if self.PALLAS_ENCODER == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return bool(self.PALLAS_ENCODER)
    CORR_LAYOUT: str = "fused3"
    CELL_REPROJECT: bool = True  # per-cell relative poses in reprojection
    CELL_LINEARIZE: bool = True  # per-cell linearization inside ba_infer
    BA_ITERS: int = 2            # GN iterations per update (Ramp_vo.py:304)

    # TPU-native capacities (not in the reference; sized from its dynamics)
    MAX_FRAMES: int = 4096       # global frame-id capacity (>= total frames)
    # feature ring depth. The reference's mem=32 ring (Ramp_vo.py:72)
    # ALIASES for the oldest reachable targets (a host at n-REMOVAL_WINDOW
    # keeps backward edges to n-REMOVAL_WINDOW-PATCH_LIFETIME+1 = n-34 with
    # default config); 40 slots cover the true FEATURE_WINDOW reach.
    # HBM cost note: each slot holds the padded fmap rings PLUS (for the
    # fused3/fused4 strip layouts) strip-major views at ~3x the ring
    # bytes — at 480x640/MEM=40/bf16 that is ~0.5 GB rings + ~1.3 GB
    # strips. Scaling MEM or the input resolution scales both linearly;
    # a 16 GB v5e chip has room for ~4x the default before the training
    # path (which shares the chip) feels it.
    MEM: int = 40

    @property
    def M(self) -> int:
        return self.PATCHES_PER_FRAME

    @property
    def NI(self) -> int:
        # edge-lattice host rows: hosts hold edges while within
        # REMOVAL_WINDOW (Ramp_vo.py:273-274); +3 slack so a reused row's
        # previous occupant is always aged out
        return self.REMOVAL_WINDOW + 3

    @property
    def T(self) -> int:
        # edge-lattice target offsets: per host frame, M*(lifetime)
        # backward + M*(lifetime-1) forward targets (Ramp_vo.py:312-325)
        return 2 * self.PATCH_LIFETIME - 1

    @property
    def EDGE_CAPACITY(self) -> int:
        return self.NI * self.T * self.M

    @property
    def POSE_WINDOW(self) -> int:
        # pose values BA may touch (free + fixed-but-linearized)
        return self.REMOVAL_WINDOW + 4

    @property
    def FEATURE_WINDOW(self) -> int:
        # frames whose feature-ring slot must stay live: the oldest host in
        # the removal window keeps backward edges PATCH_LIFETIME-1 frames
        # further back (+1 slack for the in-flight commit)
        return min(self.REMOVAL_WINDOW + self.PATCH_LIFETIME, self.MEM - 2)

    @property
    def PATCH_WINDOW(self) -> int:
        return self.POSE_WINDOW * self.M

    @classmethod
    def from_yaml(cls, path: str) -> "VOConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in fields})
