from lgcnhs_tpu.ops.pallas.retrieval import fused_topk_retrieval  # noqa: F401
