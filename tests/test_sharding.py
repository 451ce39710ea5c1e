"""Multi-device sharding tests on the 8-device fake CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lgcnhs_tpu.config import load_config
from lgcnhs_tpu.data.graph import EdgeSet, normalized_bipartite, pos_bool_matrix
from lgcnhs_tpu.models.lightgcn import init_lightgcn
from lgcnhs_tpu.ops.topk import masked_topk
from lgcnhs_tpu.parallel.sharding import (
    distributed_masked_topk,
    make_plan,
    make_sharded_train_step,
    shard_params,
    shard_train_inputs,
)
from lgcnhs_tpu.runtime.mesh import make_mesh
from lgcnhs_tpu.train.trainer import lr_schedule

U, I, D = 48, 128, 8


def _toy():
    rng = np.random.default_rng(21)
    eu = rng.integers(0, U, 600).astype(np.int32)
    ei = rng.integers(0, I, 600).astype(np.int32)
    pairs = np.unique(np.stack([eu, ei]), axis=1)
    return pairs[0], pairs[1]


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_train_step_runs(mesh_shape):
    mesh = make_mesh(mesh_shape)
    plan = make_plan(mesh)
    eu, ei = _toy()
    es = EdgeSet(eu, ei)
    R_hat, pos_mask, edge_users, edge_items = shard_train_inputs(
        plan, normalized_bipartite(U, I, es), pos_bool_matrix(U, I, es), eu, ei
    )
    cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "batch_size": 64, "embedding_dim": D}
    )
    params = shard_params(plan, init_lightgcn(jax.random.PRNGKey(0), U, I, D))
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(plan, optimizer, hp, I)
    params, opt_state, loss = step(
        params, opt_state, jax.random.PRNGKey(1), R_hat, edge_users, edge_items, pos_mask
    )
    assert np.isfinite(float(loss))
    # params keep their row sharding after the update
    assert params.user_emb.sharding.spec == plan.params.user_emb.spec


def test_sharded_step_matches_single_device():
    """Same key + same inputs: sharded step must reproduce the single-device
    update (GSPMD is semantics-preserving)."""
    from lgcnhs_tpu.train.trainer import make_train_step

    eu, ei = _toy()
    es = EdgeSet(eu, ei)
    cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "batch_size": 32, "embedding_dim": D}
    )
    R_hat_np = normalized_bipartite(U, I, es)
    pos_np = pos_bool_matrix(U, I, es)
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )

    # single device
    p0 = init_lightgcn(jax.random.PRNGKey(0), U, I, D)
    s0 = optimizer.init(p0)
    step0 = make_train_step(optimizer, hp, I)
    p0, s0, loss0 = step0(
        p0, s0, jax.random.PRNGKey(9), jnp.asarray(R_hat_np),
        jnp.asarray(eu), jnp.asarray(ei), jnp.asarray(pos_np),
    )

    # sharded (1, 8): no data-axis padding, identical sampling stream
    mesh = make_mesh((1, 8))
    plan = make_plan(mesh)
    R_hat, pos_mask, edge_users, edge_items = shard_train_inputs(
        plan, R_hat_np, pos_np, eu, ei
    )
    p1 = shard_params(plan, init_lightgcn(jax.random.PRNGKey(0), U, I, D))
    s1 = optimizer.init(p1)
    step1 = make_sharded_train_step(plan, optimizer, hp, I)
    p1, s1, loss1 = step1(
        p1, s1, jax.random.PRNGKey(9), R_hat, edge_users, edge_items, pos_mask
    )

    assert float(loss0) == pytest.approx(float(loss1), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(p0.user_emb), np.asarray(p1.user_emb), rtol=2e-5, atol=1e-6
    )


def test_sharded_train_scan_matches_per_step_path():
    """The jitted multi-epoch scan must reproduce the per-step sharded path
    exactly (same fold_in(base_key, epoch) stream)."""
    from lgcnhs_tpu.parallel.sharding import make_sharded_train_scan

    eu, ei = _toy()
    es = EdgeSet(eu, ei)
    cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "batch_size": 32, "embedding_dim": D}
    )
    mesh = make_mesh((2, 4))
    plan = make_plan(mesh)
    R_hat, pos_mask, edge_users, edge_items = shard_train_inputs(
        plan, normalized_bipartite(U, I, es), pos_bool_matrix(U, I, es), eu, ei
    )
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )
    base = jax.random.PRNGKey(5)
    n_steps = 4

    p0 = shard_params(plan, init_lightgcn(jax.random.PRNGKey(0), U, I, D))
    s0 = optimizer.init(p0)
    step = make_sharded_train_step(plan, optimizer, hp, I)
    for e in range(n_steps):
        p0, s0, loss0 = step(
            p0, s0, jax.random.fold_in(base, e),
            R_hat, edge_users, edge_items, pos_mask,
        )

    p1 = shard_params(plan, init_lightgcn(jax.random.PRNGKey(0), U, I, D))
    s1 = optimizer.init(p1)
    scan = make_sharded_train_scan(plan, optimizer, hp, I)
    p1, s1, loss1 = scan(
        p1, s1, base, jnp.int32(0), n_steps,
        R_hat, edge_users, edge_items, pos_mask,
    )

    assert float(loss0) == pytest.approx(float(loss1), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(p0.user_emb), np.asarray(p1.user_emb), rtol=2e-5, atol=1e-6
    )
    assert p1.user_emb.sharding.spec == plan.params.user_emb.spec


def test_distributed_topk_matches_single_device():
    rng = np.random.default_rng(3)
    scores_np = rng.standard_normal((U, I)).astype(np.float32)
    seen_np = rng.random((U, I)) < 0.2
    k = 9
    mesh = make_mesh((1, 8))
    plan = make_plan(mesh)
    scores = jax.device_put(jnp.asarray(scores_np), plan.pos_mask)
    seen = jax.device_put(jnp.asarray(seen_np), plan.pos_mask)
    got = np.asarray(distributed_masked_topk(mesh, scores, seen, k))
    want = np.asarray(masked_topk(jnp.asarray(scores_np), jnp.asarray(seen_np), k))
    np.testing.assert_array_equal(got, want)


def test_distributed_topk_pads_non_divisible_items():
    """Real catalogs (ML-100K: I=1682) don't divide an 8-way mesh; the
    distributed top-k must pad transparently and never emit a padded id."""
    rng = np.random.default_rng(4)
    I_odd = 123
    scores_np = rng.standard_normal((U, I_odd)).astype(np.float32)
    seen_np = rng.random((U, I_odd)) < 0.2
    # scores BELOW the -1024 seen-sentinel: padding must still rank under them
    scores_np[0, :] = -2000.0
    seen_np[0, :] = False
    k = 7
    mesh = make_mesh((1, 8))
    got = np.asarray(
        distributed_masked_topk(mesh, jnp.asarray(scores_np), jnp.asarray(seen_np), k)
    )
    want = np.asarray(masked_topk(jnp.asarray(scores_np), jnp.asarray(seen_np), k))
    np.testing.assert_array_equal(got, want)
    assert (got < I_odd).all()


def test_distributed_retrieve_pads_non_divisible_items():
    """distributed_retrieve_topk on an odd catalog must match the dense
    single-device masked ranking and never emit a padded id."""
    from lgcnhs_tpu.parallel.sharding import distributed_retrieve_topk

    rng = np.random.default_rng(11)
    I_odd = 123
    ue = jnp.asarray(rng.standard_normal((U, D)), jnp.float32)
    ie = jnp.asarray(rng.standard_normal((I_odd, D)), jnp.float32)
    seen = jnp.asarray(rng.random((U, I_odd)) < 0.2)
    k = 7
    mesh = make_mesh((1, 8))
    got = np.asarray(distributed_retrieve_topk(mesh, ue, ie, seen, k))
    scores = jnp.dot(ue, ie.T)
    want = np.asarray(masked_topk(scores, seen, k))
    np.testing.assert_array_equal(got, want)
    assert (got < I_odd).all()


def test_sharded_step_pads_non_divisible_catalog():
    """U=45, I=123 on an 8-way model axis: the padded sharded step must still
    reproduce the single-device update on the true catalog."""
    from lgcnhs_tpu.parallel.sharding import unpad_params
    from lgcnhs_tpu.train.trainer import make_train_step

    U_odd, I_odd = 45, 123
    rng = np.random.default_rng(7)
    eu = rng.integers(0, U_odd, 500).astype(np.int32)
    ei = rng.integers(0, I_odd, 500).astype(np.int32)
    pairs = np.unique(np.stack([eu, ei]), axis=1)
    eu, ei = pairs[0], pairs[1]
    es = EdgeSet(eu, ei)
    cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "batch_size": 32, "embedding_dim": D}
    )
    R_hat_np = normalized_bipartite(U_odd, I_odd, es)
    pos_np = pos_bool_matrix(U_odd, I_odd, es)
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )

    p0 = init_lightgcn(jax.random.PRNGKey(0), U_odd, I_odd, D)
    s0 = optimizer.init(p0)
    step0 = make_train_step(optimizer, hp, I_odd)
    p0, s0, loss0 = step0(
        p0, s0, jax.random.PRNGKey(9), jnp.asarray(R_hat_np),
        jnp.asarray(eu), jnp.asarray(ei), jnp.asarray(pos_np),
    )

    mesh = make_mesh((1, 8))
    plan = make_plan(mesh)
    R_hat, pos_mask, edge_users, edge_items = shard_train_inputs(
        plan, R_hat_np, pos_np, eu, ei
    )
    assert R_hat.shape == (48, 128)  # padded to the 8-way axis
    p1 = shard_params(plan, init_lightgcn(jax.random.PRNGKey(0), U_odd, I_odd, D))
    s1 = optimizer.init(p1)
    step1 = make_sharded_train_step(plan, optimizer, hp, I_odd)
    p1, s1, loss1 = step1(
        p1, s1, jax.random.PRNGKey(9), R_hat, edge_users, edge_items, pos_mask
    )
    p1 = unpad_params(p1, U_odd, I_odd)

    assert float(loss0) == pytest.approx(float(loss1), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(p0.user_emb), p1.user_emb, rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p0.item_emb), p1.item_emb, rtol=2e-5, atol=1e-6
    )


def test_distributed_topk_validates_k():
    mesh = make_mesh((1, 8))
    plan = make_plan(mesh)
    scores = jax.device_put(jnp.zeros((4, 32)), plan.pos_mask)
    seen = jax.device_put(jnp.zeros((4, 32), bool), plan.pos_mask)
    with pytest.raises(ValueError, match="exceeds shard width"):
        distributed_masked_topk(mesh, scores, seen, k=5)


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    rec = np.asarray(jax.jit(fn)(*args))
    assert rec.shape == (64, 10)


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


class TestShardedCooTraining:
    """mesh x large-graph composition (VERDICT r2 item 3): graphs that pick
    the COO propagation path must train DISTRIBUTED (edge blocks sharded,
    psummed partial segment-sums), not fall back to a single device."""

    def _graph(self):
        from lgcnhs_tpu.data.graph import InteractionGraph

        rng = np.random.default_rng(33)
        n_train, n_val = 900, 200
        pairs = np.unique(np.stack([
            rng.integers(0, U, n_train + n_val),
            rng.integers(0, I, n_train + n_val),
        ]), axis=1)
        tr, va = pairs[:, :-150], pairs[:, -150:]
        return InteractionGraph(
            n_users=U, n_items=I,
            all=EdgeSet(pairs[0].astype(np.int32), pairs[1].astype(np.int32)),
            train=EdgeSet(tr[0].astype(np.int32), tr[1].astype(np.int32)),
            val=EdgeSet(va[0].astype(np.int32), va[1].astype(np.int32)),
            test=EdgeSet(tr[0][:0], tr[1][:0]),
        )

    @pytest.mark.parametrize("layout", ["bucketed", "segment"])
    def test_sharded_coo_step_matches_single_device(self, layout):
        """Both mesh layouts — the production scatter-free bucketed ELL
        (VERDICT r4 #3) and the sorted-segment-sum fallback — must reproduce
        the single-device bucketed COO step (same CSR triple stream; sums
        psum-reassociated only)."""
        from lgcnhs_tpu.ops.propagation import edge_gcn_norm
        from lgcnhs_tpu.ops.scalable import user_csr
        from lgcnhs_tpu.parallel.sharding import (
            make_sharded_coo_train_step,
            shard_bucketed_incidence,
            shard_coo_edges,
        )
        from lgcnhs_tpu.train.trainer import make_coo_train_step, make_optimizer

        eu, ei = _toy()
        es = EdgeSet(eu, ei)
        cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
        hp = cfg.hparams.__class__(
            **{**cfg.hparams.__dict__, "batch_size": 64, "embedding_dim": D}
        )
        edge_users, edge_items = jnp.asarray(eu), jnp.asarray(ei)
        edge_norm = edge_gcn_norm(edge_users, edge_items, U, I)
        rowptr_np, cols_np = user_csr(U, es)
        rowptr, cols = jnp.asarray(rowptr_np), jnp.asarray(cols_np)
        optimizer = make_optimizer(hp)

        params0 = init_lightgcn(jax.random.PRNGKey(0), U, I, D)
        key = jax.random.PRNGKey(9)

        from lgcnhs_tpu.ops.propagation import build_bucketed_incidence

        binc = build_bucketed_incidence(eu, ei, np.asarray(edge_norm), U, I)
        step0 = make_coo_train_step(optimizer, hp, U, I)
        p_ref, _, loss_ref = step0(
            params0, optimizer.init(params0), key,
            binc, edge_users, edge_items, rowptr, cols,
        )

        mesh = make_mesh((2, 4))
        plan = make_plan(mesh)
        if layout == "bucketed":
            se = shard_bucketed_incidence(
                plan, eu, ei, np.asarray(edge_norm), U, I
            )
        else:
            se = shard_coo_edges(plan, eu, ei, edge_norm)
        params1 = jax.device_put(
            init_lightgcn(jax.random.PRNGKey(0), U, I, D), plan.replicated
        )
        step1 = make_sharded_coo_train_step(plan, optimizer, hp, U, I,
                                            layout=layout)
        p_m, _, loss_m = step1(
            params1, optimizer.init(params1), key,
            edge_users, edge_items, rowptr, cols, se,
        )

        # same triple stream, psum-reassociated sums: bit-close
        assert float(loss_m) == pytest.approx(float(loss_ref), abs=1e-6)
        np.testing.assert_allclose(
            np.asarray(p_m.user_emb), np.asarray(p_ref.user_emb), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(p_m.item_emb), np.asarray(p_ref.item_emb), atol=1e-6
        )

    def test_trainer_composes_mesh_with_coo(self, monkeypatch):
        """train_lightgcn with a mesh AND a graph forced onto the COO path
        (dense_threshold=1.0) must train distributed and match the
        single-device COO run; the old single-device fallback must be gone
        (the single-device step factories are poisoned for the mesh run)."""
        from lgcnhs_tpu.train import trainer as trainer_mod
        from lgcnhs_tpu.train.trainer import choose_propagation, train_lightgcn

        graph = self._graph()

        def cfg_for(mesh_shape):
            return load_config(
                env="dev", dataset="synthetic", model="LightGCN",
                overrides={
                    "compute.mesh_shape": mesh_shape,
                    "compute.dense_threshold": 1.0,  # force COO at toy scale
                    "hparams.epochs": 6,
                    "hparams.epoch_per_eval": 3,
                    "hparams.batch_size": 64,
                    "k": 5,
                },
            )

        cfg1, cfg8 = cfg_for((1, 1)), cfg_for((2, 4))
        assert choose_propagation(U, I, graph.train.n_edges, cfg8.compute) == "coo"

        base = train_lightgcn(graph, cfg1, save_artifacts=False)

        def _poison(*_a, **_kw):
            raise AssertionError(
                "single-device COO step built despite a configured mesh"
            )

        monkeypatch.setattr(trainer_mod, "make_coo_train_step", _poison)
        monkeypatch.setattr(trainer_mod, "make_coo_train_scan", _poison)
        sharded = train_lightgcn(graph, cfg8, save_artifacts=False)

        assert set(sharded.history) == set(base.history)
        for name in base.history:
            assert sharded.history[name] == pytest.approx(
                base.history[name], abs=2e-5
            ), name
        np.testing.assert_allclose(
            np.asarray(sharded.params.user_emb),
            np.asarray(base.params.user_emb), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(sharded.params.item_emb),
            np.asarray(base.params.item_emb), atol=1e-5,
        )


def test_distributed_csr_masked_topk_matches_chunked():
    """User-sharded CSR retrieval == the host-chunked kernel (which itself
    equals the dense masked_topk), incl. a U that doesn't divide the mesh."""
    from lgcnhs_tpu.data.graph import EdgeSet
    from lgcnhs_tpu.ops.scalable import chunked_masked_topk, user_csr
    from lgcnhs_tpu.parallel.sharding import distributed_csr_masked_topk

    rng = np.random.default_rng(71)
    U_odd = 53  # 53 % 8 != 0 -> user padding exercised
    eu = rng.integers(0, U_odd, 700).astype(np.int32)
    ei = rng.integers(0, I, 700).astype(np.int32)
    rowptr, cols = user_csr(U_odd, EdgeSet(eu, ei))
    ue = rng.standard_normal((U_odd, D)).astype(np.float32)
    ie = rng.standard_normal((I, D)).astype(np.float32)

    want = chunked_masked_topk(ue, ie, rowptr, cols, 6, chunk_bytes=1e4)
    mesh = make_mesh((2, 4))
    got = distributed_csr_masked_topk(mesh, ue, ie, rowptr, cols, 6)
    np.testing.assert_array_equal(got, want)


class TestTableShardedCooTraining:
    """SURVEY section-2.9's last capability (VERDICT r4 #4): COO-regime
    training with the embedding tables AND optimizer state ROW-SHARDED over
    the model axis — per-device persistent table memory shrinks ~1/n_model
    instead of replicating — while the minibatch layer-0 rows are exchanged
    shard-by-shard (psum of owned rows, O(B*D) bytes)."""

    def test_matches_replicated_plan_and_shards_memory(self):
        from lgcnhs_tpu.ops.propagation import edge_gcn_norm
        from lgcnhs_tpu.ops.scalable import user_csr
        from lgcnhs_tpu.parallel.sharding import (
            make_sharded_coo_train_step,
            make_table_sharded_coo_train_step,
            padded_catalog,
            shard_bucketed_incidence,
            unpad_params,
        )
        from lgcnhs_tpu.runtime.mesh import MODEL_AXIS
        from lgcnhs_tpu.train.trainer import make_optimizer

        eu, ei = _toy()
        es = EdgeSet(eu, ei)
        cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
        hp = cfg.hparams.__class__(
            **{**cfg.hparams.__dict__, "batch_size": 64, "embedding_dim": D}
        )
        edge_users, edge_items = jnp.asarray(eu), jnp.asarray(ei)
        edge_norm = edge_gcn_norm(edge_users, edge_items, U, I)
        rowptr_np, cols_np = user_csr(U, es)
        rowptr, cols = jnp.asarray(rowptr_np), jnp.asarray(cols_np)
        optimizer = make_optimizer(hp)
        key = jax.random.PRNGKey(9)

        mesh = make_mesh((2, 4))
        plan = make_plan(mesh)
        n_model = mesh.shape[MODEL_AXIS]

        # replicated-table plan (the existing production mesh-COO step)
        se_rep = shard_bucketed_incidence(
            plan, eu, ei, np.asarray(edge_norm), U, I
        )
        params_rep = jax.device_put(
            init_lightgcn(jax.random.PRNGKey(0), U, I, D), plan.replicated
        )
        step_rep = make_sharded_coo_train_step(plan, optimizer, hp, U, I)
        p_rep, _, loss_rep = step_rep(
            params_rep, optimizer.init(params_rep), key,
            edge_users, edge_items, rowptr, cols, se_rep,
        )

        # table-sharded plan: padded catalog, row-sharded tables + opt state
        U_pad, I_pad = padded_catalog(plan, U, I)
        se_ts = shard_bucketed_incidence(
            plan, eu, ei, np.asarray(edge_norm), U_pad, I_pad
        )
        params_ts = shard_params(
            plan, init_lightgcn(jax.random.PRNGKey(0), U, I, D)
        )
        opt_ts = optimizer.init(params_ts)

        # the memory contract: every params/opt-state table leaf holds only
        # 1/n_model of its rows per device
        leaves = [params_ts.user_emb, params_ts.item_emb] + [
            leaf for leaf in jax.tree.leaves(opt_ts)
            if getattr(leaf, "ndim", 0) == 2
        ]
        assert len(leaves) >= 6  # params + Adam mu/nu
        for leaf in leaves:
            n_pad = U_pad if leaf.shape[0] == U_pad else I_pad
            assert leaf.shape[0] == n_pad
            shard_rows = leaf.sharding.shard_shape(leaf.shape)[0]
            assert shard_rows == n_pad // n_model, (leaf.shape, shard_rows)

        step_ts = make_table_sharded_coo_train_step(
            plan, optimizer, hp, U, I
        )
        p_ts, opt_ts, loss_ts = step_ts(
            params_ts, opt_ts, key, edge_users, edge_items, rowptr, cols, se_ts,
        )

        # identical triple stream; sums reassociated only
        assert float(loss_ts) == pytest.approx(float(loss_rep), abs=1e-6)
        p_ts_u = unpad_params(p_ts, U, I)
        np.testing.assert_allclose(
            np.asarray(p_ts_u.user_emb), np.asarray(p_rep.user_emb), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(p_ts_u.item_emb), np.asarray(p_rep.item_emb), atol=1e-6
        )
        # updated tables keep their row sharding (optimizer didn't replicate)
        assert p_ts.user_emb.sharding.shard_shape(p_ts.user_emb.shape)[0] == \
            U_pad // n_model

    def test_scan_matches_step_sequence(self):
        from lgcnhs_tpu.ops.propagation import edge_gcn_norm
        from lgcnhs_tpu.ops.scalable import user_csr
        from lgcnhs_tpu.parallel.sharding import (
            make_table_sharded_coo_train_scan,
            make_table_sharded_coo_train_step,
            padded_catalog,
            shard_bucketed_incidence,
        )
        from lgcnhs_tpu.train.trainer import make_optimizer

        eu, ei = _toy()
        es = EdgeSet(eu, ei)
        cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
        hp = cfg.hparams.__class__(
            **{**cfg.hparams.__dict__, "batch_size": 32, "embedding_dim": D}
        )
        edge_users, edge_items = jnp.asarray(eu), jnp.asarray(ei)
        edge_norm = edge_gcn_norm(edge_users, edge_items, U, I)
        rowptr_np, cols_np = user_csr(U, es)
        rowptr, cols = jnp.asarray(rowptr_np), jnp.asarray(cols_np)
        optimizer = make_optimizer(hp)

        mesh = make_mesh((2, 4))
        plan = make_plan(mesh)
        U_pad, I_pad = padded_catalog(plan, U, I)
        se = shard_bucketed_incidence(
            plan, eu, ei, np.asarray(edge_norm), U_pad, I_pad
        )
        base_key = jax.random.PRNGKey(5)

        p1 = shard_params(plan, init_lightgcn(jax.random.PRNGKey(0), U, I, D))
        o1 = optimizer.init(p1)
        step = make_table_sharded_coo_train_step(plan, optimizer, hp, U, I)
        for epoch in range(3):
            p1, o1, loss1 = step(
                p1, o1, jax.random.fold_in(base_key, epoch),
                edge_users, edge_items, rowptr, cols, se,
            )

        p2 = shard_params(plan, init_lightgcn(jax.random.PRNGKey(0), U, I, D))
        o2 = optimizer.init(p2)
        scan = make_table_sharded_coo_train_scan(plan, optimizer, hp, U, I)
        p2, o2, loss2 = scan(
            p2, o2, base_key, jnp.int32(0), 3,
            edge_users, edge_items, rowptr, cols, se,
        )

        assert float(loss2) == pytest.approx(float(loss1), abs=1e-6)
        np.testing.assert_allclose(
            np.asarray(p2.user_emb), np.asarray(p1.user_emb), atol=1e-6
        )

    def test_trainer_composes_table_sharding(self):
        """train_lightgcn with compute.coo_table_sharding=True must produce
        the same history as the replicated mesh-COO plan (identical triple
        stream; sums reassociated only) while holding tables row-sharded."""
        from lgcnhs_tpu.train.trainer import train_lightgcn

        graph = TestShardedCooTraining._graph(None)

        def cfg_for(table_sharding):
            return load_config(
                env="dev", dataset="synthetic", model="LightGCN",
                overrides={
                    "compute.mesh_shape": (2, 4),
                    "compute.dense_threshold": 1.0,  # force COO at toy scale
                    "compute.coo_table_sharding": table_sharding,
                    "hparams.epochs": 6,
                    "hparams.epoch_per_eval": 3,
                    "hparams.batch_size": 64,
                    "k": 5,
                },
            )

        base = train_lightgcn(graph, cfg_for(False), save_artifacts=False)
        sharded = train_lightgcn(graph, cfg_for(True), save_artifacts=False)

        assert set(sharded.history) == set(base.history)
        for name in base.history:
            assert sharded.history[name] == pytest.approx(
                base.history[name], abs=2e-5
            ), name
        assert sharded.params.user_emb.shape == (U, base.params.user_emb.shape[1])
        np.testing.assert_allclose(
            np.asarray(sharded.params.user_emb),
            np.asarray(base.params.user_emb), atol=1e-5,
        )
