"""Config system.

Re-design of the reference's ``const.py`` (class matrix ``Config``/``DevConfig``/
``ProdConfig`` selected by module-level constants, ``const.py:11,52,246,493-518``)
as frozen dataclasses with programmatic + CLI overrides instead of file editing.

All reference hyperparameter values are preserved:
- preprocessing: seed 42, 8:1:1 split as [0.2, 0.5], quantile band
  (``const.py:78-95``; movielens band [1, 0] ``const.py:213-216``, douban band
  [0.991, 0.99] ``const.py:236-239``)
- model: embedding_dim 64, layers 3, lr 1e-3, gamma 0.95, eval/decay every 200
  epochs, batch 1024, BPR L2 epsilon 1e-6 (``const.py:323-346``)
- lambda presets: ProbS 1 / HeatS 0 (``const.py:116,122``), HybridS dev 0.3 /
  prod 0.6 (``const.py:127,321``), SpreadLightGCN dev 0.5 / prod 0.85
  (``const.py:177,395``), SpreadLightGCNOpti 0.6 (``const.py:421``)
- recommend k: dev 10 / prod 100 (``const.py:189,433``)
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

MODEL_NAMES = (
    "ProbS",
    "HeatS",
    "HybridS",
    "LightGCN",
    "LightGCNOpti",
    "SpreadLightGCN",
    "SpreadLightGCNOpti",
)

DATASETS = ("movielens", "movielens1m", "douban", "synthetic")


@dataclass(frozen=True)
class PreprocessingConfig:
    """Reference ``cfg.PREPROCESSING`` (``const.py:78-95``)."""

    seed: int = 42
    dataset_paths: Dict[str, str] = field(default_factory=dict)
    save_path: str = ""
    # Word2Vec-style text feature vector sizes (``const.py:217-220``).
    vector_size: Dict[str, int] = field(
        default_factory=lambda: {"title": 5, "content": 20}
    )
    columns_map: Dict[str, str] = field(
        default_factory=lambda: {
            "user_id": "user",
            "item_id": "item",
            "rating": "rating",
            "rating_time": "timestamp",
        }
    )
    # User-activity quantile band [end, start] filter (``handleData.py:39-57``).
    quantile_start: float = 1.0
    quantile_end: float = 0.0
    # 8:1:1 split expressed as the reference does: first split holds out 20%,
    # the holdout is split 50/50 into val/test (``const.py:94``).
    split_percentage: Tuple[float, float] = (0.2, 0.5)


@dataclass(frozen=True)
class HyperParameters:
    """Union of all model hyperparameter groups (``const.py:109-188,311-432``)."""

    seed: int = 42
    embedding_dim: int = 64
    layers: int = 3
    lr: float = 1e-3
    gamma: float = 0.95
    epochs: int = 10000
    epoch_per_eval: int = 200
    epoch_per_lr_decay: int = 200
    batch_size: int = 1024
    epsilon: float = 1e-6
    # Hybrid-diffusion blend: 1 => ProbS, 0 => HeatS.
    lambda_: float = 0.5
    # Negative-candidate range. "catalog" (default): uniform over [0, n_items)
    # — the correct estimator. "reference": reproduce torch-geometric's
    # structured_negative_sampling quirk (model/LightGCN/loss.py:58,
    # evaluation.py:71-72): candidates bounded by the max user-OR-item id
    # PRESENT in the split's edge matrix, so tail items absent from the split
    # can never be drawn as negatives (docs/PARITY.md "Known deviations" #6).
    neg_range: str = "catalog"


@dataclass(frozen=True)
class ComputeConfig:
    """TPU-native execution knobs (no reference counterpart; the reference is a
    single hardcoded CUDA device, ``model/LightGCN/train.py:87``)."""

    # float32 is the parity default; bfloat16 is the speed path for matmul
    # inputs (accumulation stays f32 via preferred_element_type).
    dtype: str = "float32"
    # Mesh axis sizes: data-parallel x model-parallel. (1, 1) = single chip.
    mesh_shape: Tuple[int, int] = (1, 1)
    # Use Pallas kernels for the hot ops when shapes allow; otherwise XLA.
    use_pallas: bool = True
    # Dense-vs-sparse propagation crossover: below this edge density the CSR
    # segment-sum path is used, above it the dense MXU path.
    dense_threshold: float = 0.001
    donate_state: bool = True
    # Max epochs per device program (lax.scan dispatch). 0 = unbounded (one
    # scan per eval/checkpoint interval). Bound it when a single on-device
    # execution must stay short — e.g. relayed/tunneled TPUs kill executions
    # running longer than ~a minute, which a 200-epoch large-graph scan can
    # exceed. The fold_in(key, epoch) stream makes chunking invisible to
    # training: any chunking produces the identical model.
    scan_chunk: int = 0
    # Mesh x COO regime: row-shard the embedding tables + optimizer state
    # over the model axis instead of replicating them (for catalogs whose
    # graph refuses to densify AND whose tables outgrow one chip). Per-device
    # persistent table memory ~1/n_model; minibatch rows exchanged
    # shard-by-shard (parallel.sharding.make_table_sharded_coo_train_step).
    coo_table_sharding: bool = False


@dataclass(frozen=True)
class Config:
    env: str = "dev"
    dataset: str = "movielens"
    model: str = "SpreadLightGCNOpti"
    workdir: str = "artifacts"
    preprocessing: PreprocessingConfig = field(default_factory=PreprocessingConfig)
    hparams: HyperParameters = field(default_factory=HyperParameters)
    compute: ComputeConfig = field(default_factory=ComputeConfig)
    # Recommendation list size: dev 10 / prod 100 (``const.py:189,433``).
    k: int = 10
    # Synthetic dataset scale (used when dataset == "synthetic" or real files
    # are unavailable; the reference assumes local CSV paths, const.py:200-244).
    synthetic_users: int = 943
    synthetic_items: int = 1682
    synthetic_interactions: int = 100_000

    # ---- derived paths (reference Config.__init__ creates these dirs,
    # ``const.py:33-50``) ----
    @property
    def base_path(self) -> str:
        return os.path.join(self.workdir, self.dataset)

    @property
    def preprocess_path(self) -> str:
        return os.path.join(self.base_path, "preprocess")

    @property
    def model_path(self) -> str:
        return os.path.join(self.base_path, "model")

    @property
    def recommend_path(self) -> str:
        return os.path.join(self.base_path, "recommend")

    @property
    def evaluation_path(self) -> str:
        return os.path.join(self.base_path, "evaluation")

    @property
    def log_path(self) -> str:
        return os.path.join(self.base_path, "log")

    @property
    def pictures_path(self) -> str:
        return os.path.join(self.base_path, "pictures")

    def ensure_dirs(self) -> None:
        for p in (
            self.preprocess_path,
            self.model_path,
            self.recommend_path,
            self.evaluation_path,
            self.log_path,
            self.pictures_path,
        ):
            os.makedirs(p, exist_ok=True)

    def replace(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)


def _lambda_for(model: str, env: str) -> float:
    """Reference lambda presets per model/env (see module docstring cites)."""
    dev = {
        "ProbS": 1.0,
        "HeatS": 0.0,
        "HybridS": 0.3,
        "SpreadLightGCN": 0.5,
        "SpreadLightGCNOpti": 0.5,
        "LightGCN": 0.5,
        "LightGCNOpti": 0.5,
    }
    prod = {
        "ProbS": 1.0,
        "HeatS": 0.0,
        "HybridS": 0.6,
        "SpreadLightGCN": 0.85,
        "SpreadLightGCNOpti": 0.6,
        "LightGCN": 0.5,
        "LightGCNOpti": 0.5,
    }
    table = dev if env == "dev" else prod
    return table[model]


def load_config(
    env: str = "dev",
    dataset: str = "movielens",
    model: str = "SpreadLightGCNOpti",
    workdir: str = "artifacts",
    overrides: Optional[Dict[str, Any]] = None,
) -> Config:
    """Build a config the way ``const.py:493-518`` selects one, but callable.

    ``overrides`` may patch any top-level Config field or hparams via the
    ``hparams.<name>`` dotted form (e.g. ``{"hparams.epochs": 100}``).
    """
    if model not in MODEL_NAMES:
        raise ValueError(f"unknown model {model!r}; expected one of {MODEL_NAMES}")
    if dataset not in DATASETS:
        raise ValueError(f"unknown dataset {dataset!r}; expected one of {DATASETS}")
    if env not in ("dev", "prod"):
        raise ValueError(f"unknown env {env!r}")

    # Dev uses tiny epoch counts for fast iteration (``const.py:141``), prod
    # the full 10000 (``const.py:331``).
    epochs = 10 if env == "dev" else 10000
    k = 10 if env == "dev" else 100

    pre_kwargs: Dict[str, Any] = {}
    if dataset in ("movielens", "movielens1m"):
        # ML-1M shares every movielens preprocessing preset (same rating
        # semantics, same quantile band, same title vec size); only the raw
        # schema differs (data/movielens1m.py).
        pre_kwargs.update(
            columns_map={
                "user_id": "user",
                "item_id": "item",
                "rating": "rating",
                "rating_time": "timestamp",
            },
            quantile_start=1.0,
            quantile_end=0.0,
            vector_size={"title": 5, "content": 20},
        )
    elif dataset == "douban":
        pre_kwargs.update(
            columns_map={
                "user_id": "USER_MD5",
                "item_id": "MOVIE_ID",
                "rating": "RATING",
                "rating_time": "RATING_TIME",
            },
            quantile_start=0.991,
            quantile_end=0.99,
            vector_size={"title": 3, "content": 20},
        )
    else:  # synthetic: movielens-like schema, no filtering
        pre_kwargs.update(quantile_start=1.0, quantile_end=0.0)

    hp = HyperParameters(epochs=epochs, lambda_=_lambda_for(model, env))
    # prod preset = mixed precision (bf16 matmul inputs, f32 params/optimizer
    # state — the TPU production norm; trained-model parity sits within the
    # run-to-run-variance bar either way, docs/PARITY.md). dev keeps the f32
    # HIGHEST parity dtype the differential suite pins; either is one
    # `compute.dtype` override (CLI `--dtype`) away.
    compute = ComputeConfig(dtype="bfloat16" if env == "prod" else "float32")
    top_kwargs: Dict[str, Any] = {}
    if dataset == "movielens1m":
        # Synthetic stand-in scale when the raw ml-1m files are absent:
        # the real distribution's post-filter entity counts.
        top_kwargs.update(
            synthetic_users=6040,
            synthetic_items=3706,
            synthetic_interactions=1_000_209,
        )
    cfg = Config(
        env=env,
        dataset=dataset,
        model=model,
        workdir=workdir,
        preprocessing=PreprocessingConfig(**pre_kwargs),
        hparams=hp,
        compute=compute,
        k=k,
        **top_kwargs,
    )

    if overrides:
        hp_patch = {}
        compute_patch = {}
        pre_patch = {}
        top_patch = {}
        for key, value in overrides.items():
            if key.startswith("hparams."):
                hp_patch[key.split(".", 1)[1]] = value
            elif key.startswith("compute."):
                compute_patch[key.split(".", 1)[1]] = value
            elif key.startswith("preprocessing."):
                pre_patch[key.split(".", 1)[1]] = value
            else:
                top_patch[key] = value
        if hp_patch:
            cfg = cfg.replace(hparams=dataclasses.replace(cfg.hparams, **hp_patch))
        if compute_patch:
            cfg = cfg.replace(compute=dataclasses.replace(cfg.compute, **compute_patch))
        if pre_patch:
            cfg = cfg.replace(
                preprocessing=dataclasses.replace(cfg.preprocessing, **pre_patch)
            )
        if top_patch:
            cfg = cfg.replace(**top_patch)
    return cfg
