from lgcnhs_tpu.eval.metrics import (  # noqa: F401
    EvalContext,
    accurate_metrics,
    diversity_metrics,
    evaluate_recommendations,
)
