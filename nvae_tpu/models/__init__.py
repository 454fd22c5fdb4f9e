from nvae_tpu.models.nvae import (  # noqa: F401
    ForwardOutput,
    LatentParams,
    NVAE,
    SIGMA_FLOOR,
)
