"""Drive the CLI drivers end-to-end on tiny synthetic data."""
import json
import os

import numpy as np
import pytest

from lgcnhs_tpu.cli import evaluate as evaluate_cli
from lgcnhs_tpu.cli import find_lambda as find_lambda_cli
from lgcnhs_tpu.cli import main as main_cli

SMALL = [
    "--dataset", "synthetic", "--env", "dev",
    "--users", "50", "--items", "80", "--interactions", "2000",
    "--epochs", "12",
]


def test_main_spread_model(tmp_path):
    metrics = main_cli.main(
        SMALL + ["--model", "HybridS", "--workdir", str(tmp_path)]
    )
    assert set(metrics) == {"P", "R", "F1", "NDCG", "H", "I"}
    assert all(np.isfinite(v) for v in metrics.values())
    # recommendation cache artifact exists
    rec_dir = os.path.join(str(tmp_path), "synthetic", "recommend")
    assert any(f.endswith(".npy") for f in os.listdir(rec_dir))


def test_main_full_lgcnhs_and_cache_roundtrip(tmp_path):
    argv = SMALL + ["--model", "SpreadLightGCNOpti", "--workdir", str(tmp_path)]
    m1 = main_cli.main(argv)
    # second run must hit the recommendation cache and reproduce metrics
    m2 = main_cli.main(argv)
    assert m1 == m2


def test_main_lightgcn(tmp_path):
    metrics = main_cli.main(
        SMALL + ["--model", "LightGCN", "--workdir", str(tmp_path)]
    )
    assert all(np.isfinite(v) for v in metrics.values())


def test_find_lambda_sweep(tmp_path):
    df = find_lambda_cli.main(
        SMALL
        + ["--model", "SpreadLightGCNOpti", "--workdir", str(tmp_path), "--step", "0.5"]
    )
    assert list(df["lambda"]) == [0.0, 0.5, 1.0]
    assert (tmp_path / "synthetic" / "evaluation" / "lambda_evaluation_10.csv").exists()


def test_evaluate_report(tmp_path):
    # produce cached recommendations for two models at k=10, then report
    for model in ("HybridS", "HeatS"):
        main_cli.main(SMALL + ["--model", model, "--workdir", str(tmp_path)])
    sheets = evaluate_cli.main(
        SMALL
        + ["--model", "HybridS", "--workdir", str(tmp_path), "--ks", "10",
           "--models", "HybridS", "HeatS", "ProbS"]
    )
    assert 10 in sheets
    assert set(sheets[10]["Model"]) == {"HybridS", "HeatS"}
