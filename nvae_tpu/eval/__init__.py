from nvae_tpu.eval.evaluate import (  # noqa: F401
    EVAL_TEMPERATURES,
    Metric,
    Metrics,
    ModelEvaluation,
    evaluate_fid_against_dir,
    evaluate_model,
)
from nvae_tpu.eval.features import extract_features, get_extractor  # noqa: F401
from nvae_tpu.eval.frechet import (  # noqa: F401
    activation_statistics,
    fid_from_features,
    frechet_distance,
)
from nvae_tpu.eval.nll import neg_log_likelihood  # noqa: F401
from nvae_tpu.eval.precision_recall import (  # noqa: F401
    knn_precision_recall_features,
    pairwise_sq_dists,
)
