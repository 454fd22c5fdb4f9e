from nvae_tpu.data.datasets import (  # noqa: F401
    DataBundle,
    DatasetUnavailable,
    load_dataset,
    synthetic_dataset,
)
from nvae_tpu.data.pipeline import (  # noqa: F401
    BatchIterator,
    make_iterators,
    prepare_batch,
)
