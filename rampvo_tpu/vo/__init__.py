"""VO runtime: fixed-shape functional SLAM state machine (ref: ramp/Ramp_vo.py)."""

from .config import VOConfig
from .runtime import (
    RampVO,
    make_encode_only,
    make_final_updates,
    make_vo_frame,
    make_vo_frames_chunk,
)
from .state import VOState, init_state

__all__ = [
    "VOConfig",
    "VOState",
    "init_state",
    "RampVO",
    "make_vo_frame",
    "make_vo_frames_chunk",
    "make_encode_only",
    "make_final_updates",
]
