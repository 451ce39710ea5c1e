from lgcnhs_tpu.models.spread import recommend_spread_method, spread_scores  # noqa: F401
from lgcnhs_tpu.models.lightgcn import (  # noqa: F401
    LightGCNParams,
    bpr_loss,
    init_lightgcn,
    init_lightgcn_opti,
    lightgcn_forward,
    layer0_scores,
    sample_bpr_batch,
    sample_negatives_for_edges,
)
from lgcnhs_tpu.models.fusion import fused_recommend, recommend_fused  # noqa: F401
from lgcnhs_tpu.models.recommenders import recommend, recommend_gcn  # noqa: F401
