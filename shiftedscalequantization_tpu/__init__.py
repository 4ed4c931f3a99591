"""TPU-native shifted-scale post-training quantization framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference PyTorch codebase (jai1215snu/ShiftedScaleQuantization): BRECQ-style
PTQ with AdaRound learned rounding plus learned per-input-channel-group
shifted scales, for CNN classifiers (ResNet / MobileNetV2 / RegNetX /
MNASNet), with fake-quant calibration as jitted XLA graphs and a true-int
Pallas deploy path.
"""

from . import fold_bn, graph, quantize
from .graph import BlockSpec, Flags, Graph, OpSpec, UnitQuant, UnitSpec, forward
from .ops import quant, wquant
from .quantize import QuantConfig, calibrate_acts, prepare_model

__version__ = "0.1.0"
