"""bench.py machinery smoke test (tiny problem, CPU) so the driver-facing
benchmark can't rot silently."""
import jax
import numpy as np

import bench


def _tiny(monkeypatch):
    monkeypatch.setattr(bench, "N_USERS", 40)
    monkeypatch.setattr(bench, "N_ITEMS", 60)
    monkeypatch.setattr(bench, "N_INTERACTIONS", 1500)
    monkeypatch.setattr(bench, "EMBED_DIM", 8)
    monkeypatch.setattr(bench, "BATCH", 32)
    monkeypatch.setattr(bench, "K", 5)
    return bench.build_problem()


def test_bench_train_runs_tiny(monkeypatch):
    cfg, hp, graph, _prov = _tiny(monkeypatch)
    for variant in ("xla_f32", "pallas_bf16", "binary"):
        # off-TPU the binary/pallas variants take their XLA fallbacks —
        # the point is the plumbing can't rot
        rate = bench.bench_train(jax.devices("cpu"), hp, graph, 2, variant)
        assert rate > 0, variant


def test_bench_serving_and_reference_rows_run_tiny(monkeypatch):
    cfg, hp, graph, _prov = _tiny(monkeypatch)
    qps, qps_steady = bench.bench_retrieval(graph, k=bench.K, reps=2)
    assert qps > 0 and qps_steady > 0
    sq, sq_steady = bench.bench_serve_fused(graph, cfg.hparams.lambda_, k=20, reps=2)
    assert sq > 0 and sq_steady > 0
    assert bench.STATS[f"retrieval_k{bench.K}"]["n"] >= 5  # variance floor
    assert "serve_fused_k20" in bench.STATS


def test_bench_train_coo_runs_tiny(monkeypatch):
    cfg, hp, graph, _prov = _tiny(monkeypatch)
    # problem size (50k x 30k, 2M edges) is fixed inside the row; keep D and
    # the step count tiny so the CPU run stays in seconds
    monkeypatch.setattr(bench, "EMBED_DIM", 8)
    assert bench.bench_train_coo(jax.devices("cpu"), hp, 2) > 0


def test_bench_reference_diffusion_row(monkeypatch):
    ref_s, ours_s = bench.bench_reference_diffusion()
    if ref_s is None:
        return  # /root/reference not mounted
    assert ref_s > 0 and ours_s > 0


def test_bench_lambda_sweep_row(monkeypatch):
    monkeypatch.setattr(bench, "SWEEP_USERS", 40)
    monkeypatch.setattr(bench, "SWEEP_ITEMS", 60)
    monkeypatch.setattr(bench, "SWEEP_INTERACTIONS", 1500)
    monkeypatch.setattr(bench, "EMBED_DIM", 8)
    monkeypatch.setattr(bench, "K", 5)
    monkeypatch.setattr(bench, "LAMBDA_POINTS", 3)
    monkeypatch.setattr(bench, "REF_SWEEP_ITERS", 1)
    ours_s, ref_iter_s = bench.bench_lambda_sweep()
    assert ours_s > 0
    if ref_iter_s is not None:  # /root/reference mounted
        assert ref_iter_s > 0


def test_run_row_isolates_failures_and_retries_once():
    """A bench row that dies (relay remote-compile flake) must not cost the
    driver record: _run_row retries once (transient relay errors clear on
    retry — observed live: `INTERNAL: remote_compile: response body closed`
    killed main() before any JSON was printed), then records the failure in
    extra["row_errors"] and moves on."""
    extra = {}
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("INTERNAL: remote_compile: body closed")
        return 42

    assert bench._run_row(extra, "flaky_row", flaky) == 42
    assert calls["n"] == 2 and "row_errors" not in extra

    def dead():
        raise RuntimeError("INTERNAL: remote_compile: body closed")

    assert bench._run_row(extra, "dead_row", dead) is None
    # the MESSAGE is kept (two relay failure modes share XlaRuntimeError);
    # the printed line truncates it, the side file keeps it
    assert extra["row_errors"] == [
        "dead_row: RuntimeError: INTERNAL: remote_compile: body closed"
    ]


def test_format_record_budgets_row_errors(tmp_path, monkeypatch):
    """row_errors is truncated to the same line budget as kernel_contracts
    and survives the last-resort extras trim."""
    import json

    monkeypatch.setattr(bench, "STATS", {})
    extra = {f"metric_{i}": 123456.7 for i in range(20)}
    extra["row_errors"] = [f"row_{i}: SomeVeryLongExceptionName" + "Y" * 200
                           for i in range(12)]
    line = bench.format_record(1000.0, 2.0, "synthetic", extra, out_dir=str(tmp_path))
    assert len(line) < 1500
    rec = json.loads(line)
    re_ = rec["extra"]["row_errors"]
    assert isinstance(re_, list) and len(re_) == 9  # 8 entries + overflow marker
    assert all(len(e) <= 120 for e in re_[:-1])
    assert "+4 more" in re_[-1]


def test_format_record_collapses_escaped_failure_lists(tmp_path, monkeypatch):
    """Relay exception text full of quotes/backslashes doubles under
    json.dumps escaping; with both protected lists maxed out the line could
    re-blow the 1500-char budget after every metric was trimmed. The
    last-resort collapse replaces each list with a bounded summary string."""
    import json

    monkeypatch.setattr(bench, "STATS", {})
    evil = '"\\' * 60  # 120 raw chars -> 240 escaped
    extra = {f"metric_{i}": 123456.7 for i in range(20)}
    extra["kernel_contracts"] = [f"check_{i}: {evil}" for i in range(8)]
    extra["row_errors"] = [f"row_{i}: {evil}" for i in range(12)]
    line = bench.format_record(1000.0, 2.0, "synthetic", extra, out_dir=str(tmp_path))
    assert len(line) < 1500
    rec = json.loads(line)
    assert isinstance(rec["extra"]["row_errors"], str)
    assert "rows failed" in rec["extra"]["row_errors"]
    assert "BENCH_STATS.json" in rec["extra"]["row_errors"]


def test_format_record_driver_contract(tmp_path, monkeypatch):
    """The printed bench line must stay parseable within the driver's 2000-char
    stdout-tail capture (BENCH_r04 "parsed": null regression): final line
    < 1500 chars, valid JSON, stats routed to the side file."""
    import json

    monkeypatch.setattr(  # restored after the test: later tests see real STATS
        bench, "STATS",
        {f"region_{i}": {"min_s": 0.1, "median_s": 0.2, "rel_spread": 0.01, "n": 5}
         for i in range(40)},  # bulky enough to blow 1500 chars if inlined
    )
    extra = {f"metric_{i}": 123456.7 for i in range(20)}
    extra["kernel_contracts"] = "skipped (not tpu)"
    line = bench.format_record(1000.0, 2.0, "synthetic", extra, out_dir=str(tmp_path))
    assert len(line) < 1500
    rec = json.loads(line)
    assert rec["metric"] == "lightgcn_train_examples_per_sec_ml1m"
    assert rec["extra"]["kernel_contracts"] == "skipped (not tpu)"
    assert rec["extra"]["stats_file"] == "BENCH_STATS.json"
    assert "stats" not in rec["extra"]
    side = json.load(open(tmp_path / "BENCH_STATS.json"))
    assert "region_0" in side["stats"]


def test_format_record_contract_survives_smoke_crash(tmp_path, monkeypatch):
    """kernel_contracts itself is budgeted: a smoke crash embedding a
    multi-KB relay exception string must not blow the driver's stdout-tail
    capture (the failure list is truncated in the line; the full text
    survives in the side file)."""
    import json

    monkeypatch.setattr(bench, "STATS", {})
    extra = {f"metric_{i}": 123456.7 for i in range(20)}
    extra["kernel_contracts"] = [
        f"check_{i} failed: " + "X" * 3000 for i in range(8)
    ]
    line = bench.format_record(1000.0, 2.0, "synthetic", extra, out_dir=str(tmp_path))
    assert len(line) < 1500
    rec = json.loads(line)
    kc = rec["extra"]["kernel_contracts"]
    assert isinstance(kc, list) and len(kc) == 6  # 5 entries + overflow marker
    assert kc[0].startswith("check_0 failed:") and len(kc[0]) <= 120
    assert "+3 more" in kc[-1]
    side = json.load(open(tmp_path / "BENCH_STATS.json"))
    assert len(side["record"]["extra"]["kernel_contracts"][0]) > 2000  # full text
