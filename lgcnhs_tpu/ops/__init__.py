from lgcnhs_tpu.ops.diffusion import (  # noqa: F401
    general_spreading_matrix,
    probs_transfer,
    heats_transfer,
    hybrid_transfer,
    resource,
    hybrid_resource,
)
from lgcnhs_tpu.ops.propagation import lightgcn_propagate  # noqa: F401
from lgcnhs_tpu.ops.topk import masked_topk, rank_exclude_seen  # noqa: F401
from lgcnhs_tpu.ops.metrics_ops import (  # noqa: F401
    hit_matrix,
    precision_recall,
    ndcg_at_k,
    hamming_distance,
    internal_similarity,
)
