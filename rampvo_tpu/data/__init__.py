"""Data pipeline: event containers, representations, datasets, eval loaders.

Host-side (numpy) counterpart of the reference's data/ + ramp/data_readers/;
produces channels-last arrays ready for `jax.device_put`.
"""

from .events import Events
from .event_sequence import EventSequence
from .event_handle import H5EventHandle
from .representations import EventToStack, EventsToVoxelGrid
from .loader import (
    data_loader_all_events,
    normalize_image,
    resize_input,
)

__all__ = [
    "Events",
    "EventSequence",
    "H5EventHandle",
    "EventToStack",
    "EventsToVoxelGrid",
    "data_loader_all_events",
    "normalize_image",
    "resize_input",
]
