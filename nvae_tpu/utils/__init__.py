from nvae_tpu.utils.images import (  # noqa: F401
    ImageDirectory,
    load_images_from_dir,
    sample_to_dir,
    save_images_to_dir,
    tile_images,
    to_uint8,
)
from nvae_tpu.utils.logging import MetricsLogger  # noqa: F401
