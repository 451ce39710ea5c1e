"""Runtime utilities: artifact cache, logging/timing, config matrix."""
import logging
import os

import numpy as np
import pytest

from lgcnhs_tpu.config import MODEL_NAMES, load_config
from lgcnhs_tpu.runtime.cache import ArtifactCache
from lgcnhs_tpu.runtime.logging import get_logger, stage_timer, timed


def test_cache_arrays_roundtrip(tmp_path):
    cache = ArtifactCache(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return {"a": np.arange(5), "b": np.eye(2)}

    first = cache.load_or_compute_arrays("stage1", compute)
    second = cache.load_or_compute_arrays("stage1", compute)
    assert len(calls) == 1  # second call hit the cache
    np.testing.assert_array_equal(first["a"], second["a"])


def test_cache_disabled_recomputes(tmp_path):
    cache = ArtifactCache(str(tmp_path), enabled=False)
    calls = []
    cache.load_or_compute_arrays("x", lambda: calls.append(1) or {"a": np.zeros(1)})
    cache.load_or_compute_arrays("x", lambda: calls.append(1) or {"a": np.zeros(1)})
    assert len(calls) == 2


def test_cache_json(tmp_path):
    cache = ArtifactCache(str(tmp_path))
    cache.save_json("metrics", {"P": 0.5, "k": 10})
    assert cache.load_json("metrics") == {"P": 0.5, "k": 10}
    assert cache.load_json("missing") is None


def test_recommendation_cache(tmp_path):
    cache = ArtifactCache(str(tmp_path))
    rec = np.arange(12, dtype=np.int32).reshape(3, 4)
    cache.save_recommendations("rec_M_10", rec)
    np.testing.assert_array_equal(cache.load_recommendations("rec_M_10"), rec)
    assert cache.load_recommendations("nope") is None


class _ListHandler(logging.Handler):
    def __init__(self):
        super().__init__()
        self.records = []

    def emit(self, record):
        self.records.append(record.getMessage())


def test_timed_decorator_logs():
    log = get_logger("lgcnhs-test-timer")
    handler = _ListHandler()
    log.addHandler(handler)

    @timed("stage finished", log)
    def work():
        return 41 + 1

    assert work() == 42
    assert any("stage finished" in msg for msg in handler.records)
    log.removeHandler(handler)


def test_config_matrix_all_models():
    for model in MODEL_NAMES:
        for env in ("dev", "prod"):
            cfg = load_config(env=env, dataset="movielens", model=model)
            assert cfg.k == (10 if env == "dev" else 100)
            assert 0.0 <= cfg.hparams.lambda_ <= 1.0


def test_config_prod_lambda_presets():
    # const.py:321,395,421 presets
    assert load_config("prod", "movielens", "HybridS").hparams.lambda_ == 0.6
    assert load_config("prod", "movielens", "SpreadLightGCN").hparams.lambda_ == 0.85
    assert load_config("prod", "movielens", "SpreadLightGCNOpti").hparams.lambda_ == 0.6
    assert load_config("dev", "movielens", "HybridS").hparams.lambda_ == 0.3


def test_config_invalid_inputs():
    with pytest.raises(ValueError):
        load_config(model="NotAModel")
    with pytest.raises(ValueError):
        load_config(dataset="netflix")
    with pytest.raises(ValueError):
        load_config(env="staging")


def test_config_overrides():
    cfg = load_config(
        overrides={"hparams.epochs": 7, "compute.dtype": "bfloat16", "k": 3}
    )
    assert cfg.hparams.epochs == 7
    assert cfg.compute.dtype == "bfloat16"
    assert cfg.k == 3
