from nvae_tpu.nn.spectral import (  # noqa: F401
    SNConv,
    DepthwiseConv,
    SN_KERNEL,
    is_sn_kernel_path,
    power_iteration,
    spectral_sigma,
)
from nvae_tpu.nn.blocks import (  # noqa: F401
    BatchNorm,
    ConvBNSwish,
    DecoderSampleCombiner,
    EncDecCombiner,
    EncoderResidualCell,
    FactorizedDownsample,
    GenerativeResidualCell,
    PostprocessCell,
    PostprocessNode,
    Rescaler,
    SqueezeExcitation,
    StemCell,
    swish,
)
