from nvae_tpu.ops.math import (  # noqa: F401
    softclamp5,
    gaussian_log_prob,
    diagonal_gaussian_kl,
    bernoulli_log_prob,
    normalize_l2,
    slerp,
    dml_log_prob,
    dml_sample,
    dml_mean,
)
