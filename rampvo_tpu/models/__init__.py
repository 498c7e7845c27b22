"""Networks: RAMP encoders, update operator, VONet.

Flax re-design of the reference model stack (ramp/net.py, ramp/extractor.py,
ramp/blocks.py) with TPU-native layouts: channels-last (NHWC) feature maps,
`lax.scan` pixel-wise LSTMs, segment-op SoftAgg, and explicit functional
recurrent state (no module-held mutable hidden states).
"""

from .blocks import GatedResidual, LayerNorm1D, SoftAgg, SoftAggBasic, grad_clip, grad_zero
from .encoders import (
    BasicEncoder4,
    ConvLSTMCell,
    LSTMEncoder,
    MultiScaleBasicEncoder4,
    MultiScaleEncoder,
    PixelLSTM,
    ResidualBlock,
    SingleScaleEncoder,
    SuperStateEncoder,
)
from .update import Update
from .vonet import CorrBlock, VONet, Patchifier

__all__ = [
    "GatedResidual",
    "LayerNorm1D",
    "SoftAgg",
    "SoftAggBasic",
    "grad_clip",
    "grad_zero",
    "ConvLSTMCell",
    "CorrBlock",
    "ResidualBlock",
    "BasicEncoder4",
    "MultiScaleBasicEncoder4",
    "PixelLSTM",
    "LSTMEncoder",
    "SuperStateEncoder",
    "SingleScaleEncoder",
    "MultiScaleEncoder",
    "Update",
    "VONet",
    "Patchifier",
]
