"""Evaluation suite: FID/KID/IS/PR metrics over pluggable detectors."""

from dimsum_tpu.eval.fid import (  # noqa: F401
    FeatureStats,
    compute_fid,
    compute_inception_score,
    compute_kid,
    compute_precision_recall,
    frechet_distance,
)
from dimsum_tpu.eval.features import (  # noqa: F401
    RandomProjectionDetector,
    TorchScriptDetector,
    batched_features,
    latents_to_uint8,
)
from dimsum_tpu.eval.metric_main import (  # noqa: F401
    calc_metric,
    calc_metrics_many,
    calc_metrics_multiprocess,
    is_valid_metric,
    list_valid_metrics,
    report_metric,
)
