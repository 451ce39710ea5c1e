"""bench.py machinery smoke test (tiny problem, CPU) so the driver-facing
benchmark can't rot silently."""
import jax
import numpy as np

import bench


def test_bench_backend_runs_tiny(monkeypatch):
    monkeypatch.setattr(bench, "N_USERS", 40)
    monkeypatch.setattr(bench, "N_ITEMS", 60)
    monkeypatch.setattr(bench, "N_INTERACTIONS", 1500)
    monkeypatch.setattr(bench, "EMBED_DIM", 8)
    monkeypatch.setattr(bench, "BATCH", 32)
    cfg, hp, graph = bench.build_problem()
    rate = bench.bench_backend(jax.devices("cpu"), hp, graph, n_steps=2)
    assert rate > 0
    rate16 = bench.bench_backend(jax.devices("cpu"), hp, graph, n_steps=2, bf16=True)
    assert rate16 > 0
