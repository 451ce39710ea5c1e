from lgcnhs_tpu.models.spread import recommend_spread_method, spread_scores  # noqa: F401
from lgcnhs_tpu.models.lightgcn import (  # noqa: F401
    LightGCNParams,
    init_lightgcn,
    lightgcn_forward,
    layer0_scores,
)
