"""LGCNHS-TPU: a TPU-native recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo `Alex-McAvoy/Light-Graph-Convolutional-Recommendation-Algorithm-based-on-
Hybrid-Spreading` (LGCNHS): LightGCN collaborative-filtering embeddings fused
with ProbS/HeatS hybrid resource-diffusion, plus the full data/metrics/driver
stack around them.

Layer map (mirrors reference SURVEY.md section 1, re-architected TPU-first):

- ``config``    -- dataclass config matrix (reference ``const.py``)
- ``runtime``   -- logging, stage timing, artifact cache, mesh bring-up
- ``data``      -- dataset ingestion/synthesis, rating pipeline, graph arrays
                   (reference ``processing/`` + ``utils/trans.py``/``graph.py``)
- ``ops``       -- jitted diffusion/propagation/top-k/metric kernels incl.
                   Pallas paths (reference has none; numpy/torch-geometric)
- ``models``    -- SpreadMethod, LightGCN, LightGCNOpti, SpreadLightGCN[Opti]
                   (reference ``model/``)
- ``train``     -- BPR training loop, schedules, checkpointing
                   (reference ``model/LightGCN/train.py``)
- ``eval``      -- accuracy + diversity metric suite (reference ``metrics/``)
- ``parallel``  -- Mesh/NamedSharding strategy: row-sharded tables,
                   item-block-sharded diffusion, distributed top-k
                   (absent in reference; single CUDA device)
- ``cli``       -- end-to-end drivers (reference ``main.py``/``findLambda.py``/
                   ``evaluationMetrics.py``)
"""

__version__ = "0.1.0"

from lgcnhs_tpu.config import Config, load_config  # noqa: F401
