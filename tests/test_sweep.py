"""Fused on-device lambda sweep (ops/sweep.py) vs the per-lambda host path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgcnhs_tpu.config import load_config
from lgcnhs_tpu.data.graph import build_graph, interaction_matrix, pos_bool_matrix
from lgcnhs_tpu.data.ratings import prepare_ratings
from lgcnhs_tpu.data.synthetic import synthesize_movielens_like
from lgcnhs_tpu.eval.metrics import EvalContext, evaluate_recommendations
from lgcnhs_tpu.models.fusion import allocate_matrix
from lgcnhs_tpu.models.lightgcn import init_lightgcn
from lgcnhs_tpu.ops import metrics_ops
from lgcnhs_tpu.ops.diffusion import general_spreading_matrix, hybrid_resource
from lgcnhs_tpu.ops.sweep import (
    METRIC_COLUMNS,
    lambda_sweep_metrics,
    sharded_lambda_sweep,
    sweep_rows,
)
from lgcnhs_tpu.ops.topk import rank_exclude_seen
from lgcnhs_tpu.runtime.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(env="dev", dataset="synthetic", model="SpreadLightGCNOpti")
    df = synthesize_movielens_like(40, 70, 1500, seed=21)
    splits = prepare_ratings(df, cfg)
    graph = build_graph(splits)
    ctx = EvalContext.build(
        graph.n_users, graph.n_items, graph.test, graph.train, graph.val
    )
    params = init_lightgcn(jax.random.PRNGKey(3), graph.n_users, graph.n_items, 16)
    A = jnp.asarray(
        interaction_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    seen = jnp.asarray(
        pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    G = allocate_matrix(params, seen)
    W_gen = general_spreading_matrix(A)
    S = metrics_ops.similarity_matrix(
        jnp.asarray(ctx.interaction), jnp.asarray(ctx.item_deg)
    )
    args = (
        G, A, W_gen, seen,
        jnp.asarray(ctx.eval_pos), jnp.asarray(ctx.eval_counts),
        jnp.asarray(ctx.eval_present), S,
    )
    return cfg, graph, ctx, args


def test_internal_similarity_from_matrix_matches_bilinear(setup):
    _, graph, ctx, args = setup
    rng = np.random.default_rng(0)
    rec = jnp.asarray(
        np.stack([
            rng.choice(graph.n_items, size=5, replace=False)
            for _ in range(graph.n_users)
        ]).astype(np.int32)
    )
    S = args[-1]
    got = metrics_ops.internal_similarity_from_matrix(rec, S)
    want = metrics_ops.internal_similarity(
        rec, jnp.asarray(ctx.interaction), jnp.asarray(ctx.item_deg)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_tall_sweep_matches_dense_sweep(setup):
    """The W-free/S-free tall-catalog flavor must produce the same rows as
    the dense sweep (to float tolerance: factored diffusion and the direct
    Sorensen kernel reassociate sums)."""
    from lgcnhs_tpu.ops.sweep import lambda_sweep_metrics_tall

    cfg, graph, ctx, args = setup
    G, A, W_gen, seen, eval_pos, eval_counts, eval_present, S = args
    lambdas = jnp.asarray(np.linspace(0.0, 1.0, 7, dtype=np.float32))
    dense = np.asarray(lambda_sweep_metrics(lambdas, *args, cfg.k))
    tall = np.asarray(
        lambda_sweep_metrics_tall(
            lambdas, G, A, seen, eval_pos, eval_counts, eval_present,
            jnp.asarray(ctx.item_deg), cfg.k,
        )
    )
    np.testing.assert_allclose(tall, dense, rtol=1e-4, atol=1e-5)


def test_internal_similarity_direct_matches_matrix(setup):
    cfg, graph, ctx, args = setup
    rng = np.random.default_rng(5)
    rec = np.stack(
        [rng.choice(graph.n_items, size=6, replace=False)
         for _ in range(graph.n_users)]
    ).astype(np.int32)
    S = args[-1]
    want = float(metrics_ops.internal_similarity_from_matrix(jnp.asarray(rec), S))
    got = float(
        metrics_ops.internal_similarity_direct(
            jnp.asarray(rec), jnp.asarray(ctx.interaction),
            jnp.asarray(ctx.item_deg), chunk=16,
        )
    )
    assert got == pytest.approx(want, rel=1e-5, abs=1e-7)


def test_find_lambda_cli_tall_dispatch(tmp_path, monkeypatch):
    """find_lambda takes the tall-catalog branch when (I, I) is over budget
    on a single chip, and still writes the same CSV schema."""
    import lgcnhs_tpu.ops.diffusion as diff
    import lgcnhs_tpu.cli.find_lambda as fl
    from lgcnhs_tpu.ops import sweep as sweep_mod

    # forbids dense (2 I^2 + 3 U I ~ 64 kB at 30 x 70 f32) but fits the
    # factored live set (U^2 + 3 U I ~ 29 kB) -> "factored" regime
    monkeypatch.setattr(diff, "DENSE_TRANSFER_BUDGET_BYTES", 30_000)
    calls = []
    real = sweep_mod.lambda_sweep_metrics_tall

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(fl, "lambda_sweep_metrics_tall", spy)
    df = fl.main(
        ["--dataset", "synthetic", "--env", "dev", "--workdir", str(tmp_path),
         "--users", "30", "--items", "70", "--interactions", "900",
         "--epochs", "4", "--step", "0.5", "--k", "5"]
    )
    assert calls, "tall-catalog sweep branch did not run"
    assert list(df.columns) == ["lambda", "P", "R", "F1", "NDCG", "H", "I"]
    assert len(df) == 3
    assert np.isfinite(df[["P", "R", "NDCG", "H", "I"]].to_numpy()).all()


def test_find_lambda_cli_blocked_regime_needs_mesh(tmp_path, monkeypatch):
    """wide-AND-tall catalogs on one chip get a clear error pointing at
    --mesh instead of an OOM mid-sweep."""
    import lgcnhs_tpu.ops.diffusion as diff
    import lgcnhs_tpu.cli.find_lambda as fl

    monkeypatch.setattr(diff, "DENSE_TRANSFER_BUDGET_BYTES", 1)
    with pytest.raises(SystemExit, match="--mesh"):
        fl.main(
            ["--dataset", "synthetic", "--env", "dev",
             "--workdir", str(tmp_path), "--users", "60", "--items", "70",
             "--interactions", "900", "--epochs", "4", "--step", "0.5",
             "--k", "5"]
        )


def test_device_sweep_matches_per_lambda_host_path(setup):
    """One lax.map program == the per-lambda jit + host evaluate path,
    for every metric, at every grid point."""
    cfg, graph, ctx, args = setup
    G, A, W_gen, seen = args[:4]
    lambdas = np.asarray([0.0, 0.3, 0.5, 0.85, 1.0], np.float32)

    metrics = np.asarray(lambda_sweep_metrics(jnp.asarray(lambdas), *args, cfg.k))
    assert metrics.shape == (len(lambdas), len(METRIC_COLUMNS))
    rows = sweep_rows(lambdas, metrics)

    for lam, row in zip(lambdas, rows):
        F = hybrid_resource(A, W_gen, jnp.float32(lam))
        rec = np.asarray(rank_exclude_seen(G * F, seen, cfg.k, filter_seen=True))
        want = evaluate_recommendations(ctx, rec)
        for key in ("P", "R", "NDCG", "H"):
            assert row[key] == want[key], (lam, key, row, want)
        # I uses a gather formulation vs the host bilinear form: identical
        # math, different float contraction order
        assert abs(row["I"] - want["I"]) < 1e-4, (lam, row, want)
        assert abs(row["F1"] - want["F1"]) < 1e-4, (lam, row, want)


@pytest.mark.parametrize("n_lambdas", [3, 11])
def test_sharded_sweep_matches_single_device(setup, n_lambdas):
    """Grid sharded over all 8 fake devices (incl. padding when the grid
    does not divide the device count) == the single-device sweep."""
    cfg, _, _, args = setup
    lambdas = np.linspace(0.0, 1.0, n_lambdas).astype(np.float32)
    mesh = make_mesh((2, 4))
    got = np.asarray(sharded_lambda_sweep(mesh, lambdas, *args, k=cfg.k))
    want = np.asarray(lambda_sweep_metrics(jnp.asarray(lambdas), *args, cfg.k))
    assert got.shape == want.shape == (n_lambdas, len(METRIC_COLUMNS))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_find_lambda_cli_with_mesh(tmp_path):
    """The findLambda driver end-to-end with the grid sharded over a mesh."""
    from lgcnhs_tpu.cli import find_lambda as find_lambda_cli

    df = find_lambda_cli.main(
        [
            "--dataset", "synthetic", "--env", "dev",
            "--users", "40", "--items", "70", "--interactions", "1500",
            "--epochs", "8", "--model", "SpreadLightGCNOpti",
            "--workdir", str(tmp_path), "--step", "0.25", "--mesh", "2,4",
        ]
    )
    assert list(df["lambda"]) == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert set(df.columns) == {"lambda", "P", "R", "F1", "NDCG", "H", "I"}
    assert np.isfinite(df.drop(columns="lambda").to_numpy()).all()


def test_item_sharded_sweep_matches_single_device(setup):
    """Catalog-sharded sweep (the large-I layout, 70 % 4 != 0 so column
    padding is exercised) == the single-device sweep at every grid point."""
    from lgcnhs_tpu.ops.sweep import item_sharded_lambda_sweep

    cfg, _, _, args = setup
    lambdas = np.asarray([0.0, 0.3, 0.85, 1.0], np.float32)
    mesh = make_mesh((2, 4))
    got = np.asarray(item_sharded_lambda_sweep(mesh, lambdas, *args, k=cfg.k))
    want = np.asarray(lambda_sweep_metrics(jnp.asarray(lambdas), *args, cfg.k))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_item_sharded_sweep_builds_wgen_and_s_sharded(setup):
    """With W_gen=None and S=None the item-sharded sweep builds both as
    collective Grams over the sharded A (never dense on one device — the
    round-3 advisor's OOM-before-sharding path) and the rows still match the
    single-device sweep built from host-dense W_gen/S."""
    from lgcnhs_tpu.ops.sweep import item_sharded_lambda_sweep

    cfg, _, _, args = setup
    G, A, _W_gen, seen, eval_pos, eval_counts, eval_present, _S = args
    lambdas = np.asarray([0.0, 0.6, 1.0], np.float32)
    mesh = make_mesh((2, 4))
    got = np.asarray(item_sharded_lambda_sweep(
        mesh, lambdas, G, A, None, seen, eval_pos, eval_counts,
        eval_present, None, k=cfg.k,
    ))
    want = np.asarray(lambda_sweep_metrics(jnp.asarray(lambdas), *args, cfg.k))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_sweep_budget_guard_falls_back(setup, monkeypatch):
    """A replication estimate over budget must route sharded_lambda_sweep
    through the item-sharded layout (VERDICT r2 item 7) — here forced with a
    tiny budget; the rows must still match the single-device sweep."""
    import lgcnhs_tpu.ops.sweep as sweep_mod

    cfg, _, _, args = setup
    lambdas = np.asarray([0.2, 0.6], np.float32)
    mesh = make_mesh((2, 4))

    called = {}
    real = sweep_mod.item_sharded_lambda_sweep

    def spy(*a, **kw):
        called["yes"] = True
        return real(*a, **kw)

    monkeypatch.setattr(sweep_mod, "item_sharded_lambda_sweep", spy)
    got = np.asarray(
        sweep_mod.sharded_lambda_sweep(
            mesh, lambdas, *args, k=cfg.k, memory_budget_bytes=1
        )
    )
    assert called.get("yes"), "budget guard did not engage"
    want = np.asarray(lambda_sweep_metrics(jnp.asarray(lambdas), *args, cfg.k))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_tall_sweep_matches_single_device(setup):
    """Mesh x tall composition: the grid-parallel W-free sweep (no (I, I)
    operand on any device) == the single-device tall sweep == the dense
    sweep rows."""
    from lgcnhs_tpu.ops.sweep import (
        lambda_sweep_metrics_tall,
        sharded_lambda_sweep_tall,
    )
    from lgcnhs_tpu.eval.metrics import EvalContext

    cfg, graph, ctx, args = setup
    G, A, _W_gen, seen, eval_pos, eval_counts, eval_present, _S = args
    item_deg = jnp.asarray(ctx.item_deg)
    lambdas = np.asarray([0.0, 0.3, 0.6, 0.85, 1.0], np.float32)  # pads to 8
    mesh = make_mesh((2, 4))
    got = np.asarray(sharded_lambda_sweep_tall(
        mesh, lambdas, G, A, seen, eval_pos, eval_counts, eval_present,
        item_deg, k=cfg.k,
    ))
    want = np.asarray(lambda_sweep_metrics_tall(
        jnp.asarray(lambdas), G, A, seen, eval_pos, eval_counts,
        eval_present, item_deg, cfg.k,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    dense = np.asarray(lambda_sweep_metrics(jnp.asarray(lambdas), *args, cfg.k))
    np.testing.assert_allclose(got, dense, rtol=1e-4, atol=1e-5)


def test_sharded_s_build_uses_duplicate_counting_degrees(setup):
    """When S=None, the mesh sweep's Sorensen build must consume the
    caller's duplicate-counting item_deg (EvalContext semantics,
    utils/trans.py:94-116 counts dict-list rows), NOT a column sum of the
    0/1 A — on data with duplicated rating rows the two differ and the I@k
    column would drift from the single-device sweep."""
    from lgcnhs_tpu.ops.sweep import item_sharded_lambda_sweep

    cfg, graph, ctx, args = setup
    G, A, W_gen, seen, eval_pos, eval_counts, eval_present, _S = args
    # duplicate-counting degrees: inflate a few items beyond their colsum
    deg_dup = np.asarray(ctx.item_deg).astype(np.float64).copy()
    deg_dup[:5] += 3
    S_dup = metrics_ops.similarity_matrix(
        jnp.asarray(ctx.interaction), jnp.asarray(deg_dup)
    )
    lambdas = np.asarray([0.3, 0.8], np.float32)
    want = np.asarray(lambda_sweep_metrics(
        jnp.asarray(lambdas), G, A, W_gen, seen, eval_pos, eval_counts,
        eval_present, S_dup, cfg.k,
    ))
    mesh = make_mesh((2, 4))
    got = np.asarray(item_sharded_lambda_sweep(
        mesh, lambdas, G, A, None, seen, eval_pos, eval_counts,
        eval_present, None, k=cfg.k, item_deg=jnp.asarray(deg_dup),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    got2 = np.asarray(sharded_lambda_sweep(
        mesh, lambdas, G, A, None, seen, eval_pos, eval_counts,
        eval_present, None, k=cfg.k, item_deg=jnp.asarray(deg_dup),
    ))
    np.testing.assert_allclose(got2, want, rtol=1e-5, atol=1e-6)


def test_find_lambda_blocked_subcase_rescued_by_tall_flavor(tmp_path, monkeypatch):
    """Catalogs in the 'blocked' regime (2U >= I, dense over budget) whose
    W-free live set still fits must run the exact tall flavor single-chip
    instead of hard-exiting with a mesh demand (round-4 review finding)."""
    import lgcnhs_tpu.ops.diffusion as diff
    import lgcnhs_tpu.cli.find_lambda as fl
    from lgcnhs_tpu.ops import sweep as sweep_mod

    # at ~60 x ~70 f32: dense needs ~90 kB, blocked ~50 kB, factored live
    # ~65 kB -> budget 70 kB gives regime "blocked" with factored_fits True
    monkeypatch.setattr(diff, "DENSE_TRANSFER_BUDGET_BYTES", 70_000)
    calls = []
    real = sweep_mod.lambda_sweep_metrics_tall

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(fl, "lambda_sweep_metrics_tall", spy)
    df = fl.main(
        ["--dataset", "synthetic", "--env", "dev", "--workdir", str(tmp_path),
         "--users", "60", "--items", "70", "--interactions", "1200",
         "--epochs", "4", "--step", "0.5", "--k", "5"]
    )
    assert calls, "tall rescue did not run"
    assert np.isfinite(df[["P", "R", "NDCG", "H", "I"]].to_numpy()).all()


def test_find_lambda_cli_mesh_prefers_tall_when_factored_fits(tmp_path, monkeypatch):
    """With a mesh, blocked/sharded regimes whose factored live set fits one
    chip take the grid-parallel W-free sweep (no (I, I) operand per device),
    not the item-sharded layout (round-4 review finding: the old gate only
    allowed the 'factored' regime through)."""
    import lgcnhs_tpu.cli.find_lambda as fl
    import lgcnhs_tpu.ops.diffusion as diff

    # U=60, I=70, f32: dense live set 2 I^2 + 3 U I = 89.6 kB > 70 kB budget;
    # 2U >= I skips the "factored" FLOPs heuristic -> regime "blocked";
    # factored live set U^2 + 3 U I = 64.8 kB <= budget -> tall rescue holds
    monkeypatch.setattr(diff, "DENSE_TRANSFER_BUDGET_BYTES", 70_000)
    from lgcnhs_tpu.ops.diffusion import choose_diffusion, factored_fits
    assert choose_diffusion(60, 70, 4) == "blocked"
    assert factored_fits(60, 70, 4)

    calls = []
    real = fl.sharded_lambda_sweep_tall

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(fl, "sharded_lambda_sweep_tall", spy)
    df = fl.main(
        ["--dataset", "synthetic", "--env", "dev", "--workdir", str(tmp_path),
         "--users", "60", "--items", "70", "--interactions", "900",
         "--epochs", "4", "--step", "0.5", "--k", "5", "--mesh", "1,2"]
    )
    assert calls, "mesh + rescued-tall regime did not take the W-free sweep"
    assert len(df) == 3
    assert np.isfinite(df[["P", "R", "NDCG", "H", "I"]].to_numpy()).all()
