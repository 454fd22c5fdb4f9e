"""Pallas TPU kernels for the framework's hot ops.

Kernels are drop-in numerical equivalents of module-library paths, validated
against them in tests (interpret mode on CPU, compiled on TPU).  Integration
into the model is gated behind config flags so the XLA path remains the
portable default.
"""

from nvae_tpu.kernels.se_gate import se_gate, se_gate_reference  # noqa: F401
from nvae_tpu.kernels.depthwise import (  # noqa: F401
    depthwise_conv5x5,
    depthwise_conv5x5_reference,
)
