import numpy as np

from lgcnhs_tpu.data.graph import EdgeSet, normalized_bipartite
from lgcnhs_tpu.ops.propagation import (
    build_edge_ordering,
    edge_gcn_norm,
    lightgcn_propagate,
    lightgcn_propagate_coo,
    lightgcn_propagate_coo_sorted,
)
from tests import reference_formulas as ref

U, I, D, K = 12, 20, 8, 3


def _setup():
    rng = np.random.default_rng(7)
    eu = rng.integers(0, U, 60).astype(np.int32)
    ei = rng.integers(0, I, 60).astype(np.int32)
    # dedup pairs (interaction semantics)
    pairs = np.unique(np.stack([eu, ei]), axis=1)
    eu, ei = pairs[0], pairs[1]
    user_emb = rng.standard_normal((U, D)).astype(np.float32)
    item_emb = rng.standard_normal((I, D)).astype(np.float32)
    return eu, ei, user_emb, item_emb


def test_dense_path_matches_joint_adjacency_reference():
    eu, ei, user_emb, item_emb = _setup()
    R_hat = normalized_bipartite(U, I, EdgeSet(eu, ei))
    got_u, got_i = lightgcn_propagate(user_emb, item_emb, R_hat, K)
    want_u, want_i = ref.ref_lightgcn_forward(user_emb, item_emb, eu, ei, U, I, K)
    np.testing.assert_allclose(np.asarray(got_u), want_u, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), want_i, rtol=1e-4, atol=1e-5)


def test_coo_path_matches_dense_path():
    eu, ei, user_emb, item_emb = _setup()
    R_hat = normalized_bipartite(U, I, EdgeSet(eu, ei))
    du, di = lightgcn_propagate(user_emb, item_emb, R_hat, K)
    norm = edge_gcn_norm(eu, ei, U, I)
    cu, ci = lightgcn_propagate_coo(user_emb, item_emb, eu, ei, norm, U, I, K)
    np.testing.assert_allclose(np.asarray(cu), np.asarray(du), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(di), rtol=1e-4, atol=1e-5)


def test_sorted_coo_matches_unsorted_forward_and_grad():
    import jax
    import jax.numpy as jnp

    eu, ei, user_emb, item_emb = _setup()
    norm = edge_gcn_norm(eu, ei, U, I)
    order = build_edge_ordering(jnp.asarray(eu), jnp.asarray(ei), norm)

    cu, ci = lightgcn_propagate_coo(user_emb, item_emb, eu, ei, norm, U, I, K)
    su, si = lightgcn_propagate_coo_sorted(
        jnp.asarray(user_emb), jnp.asarray(item_emb), order, U, I, K
    )
    np.testing.assert_allclose(np.asarray(su), np.asarray(cu), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(si), np.asarray(ci), rtol=1e-5, atol=1e-6)

    # the custom VJP (self-adjoint pair applied to cotangents) must equal
    # autodiff through the unsorted segment-sum forward
    def loss_unsorted(ue, ie):
        u, i = lightgcn_propagate_coo(ue, ie, eu, ei, norm, U, I, K)
        return jnp.sum(u * u) + jnp.sum(jnp.sin(i))

    def loss_sorted(ue, ie):
        u, i = lightgcn_propagate_coo_sorted(ue, ie, order, U, I, K)
        return jnp.sum(u * u) + jnp.sum(jnp.sin(i))

    gu0, gi0 = jax.grad(loss_unsorted, argnums=(0, 1))(
        jnp.asarray(user_emb), jnp.asarray(item_emb)
    )
    gu1, gi1 = jax.grad(loss_sorted, argnums=(0, 1))(
        jnp.asarray(user_emb), jnp.asarray(item_emb)
    )
    np.testing.assert_allclose(np.asarray(gu1), np.asarray(gu0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gi1), np.asarray(gi0), rtol=1e-4, atol=1e-5)


def test_bucketed_matches_unsorted_forward_and_grad():
    import jax
    import jax.numpy as jnp

    from lgcnhs_tpu.ops.propagation import (
        build_bucketed_incidence,
        lightgcn_propagate_bucketed,
    )

    eu, ei, user_emb, item_emb = _setup()
    # zero-degree nodes on both sides exercise the appended zeros row
    mask = (eu != U - 1) & (ei != I - 1)
    eu, ei = eu[mask], ei[mask]
    norm = edge_gcn_norm(eu, ei, U, I)
    binc = build_bucketed_incidence(eu, ei, np.asarray(norm), U, I)

    cu, ci = lightgcn_propagate_coo(user_emb, item_emb, eu, ei, norm, U, I, K)
    bu, bi = lightgcn_propagate_bucketed(
        jnp.asarray(user_emb), jnp.asarray(item_emb), binc, K
    )
    np.testing.assert_allclose(np.asarray(bu), np.asarray(cu), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bi), np.asarray(ci), rtol=1e-5, atol=1e-6)

    def loss_unsorted(ue, ie):
        u, i = lightgcn_propagate_coo(ue, ie, eu, ei, norm, U, I, K)
        return jnp.sum(u * u) + jnp.sum(jnp.sin(i))

    def loss_bucketed(ue, ie):
        u, i = lightgcn_propagate_bucketed(ue, ie, binc, K)
        return jnp.sum(u * u) + jnp.sum(jnp.sin(i))

    g0 = jax.grad(loss_unsorted, argnums=(0, 1))(
        jnp.asarray(user_emb), jnp.asarray(item_emb)
    )
    g1 = jax.grad(loss_bucketed, argnums=(0, 1))(
        jnp.asarray(user_emb), jnp.asarray(item_emb)
    )
    for want, got in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )


def test_bucketed_preserves_float64():
    """build_bucketed_incidence must not round f64 weights to f32 — the x64
    parity runs rely on reassociation-level (~1e-12) agreement."""
    import jax
    import jax.numpy as jnp

    from lgcnhs_tpu.ops.propagation import (
        build_bucketed_incidence,
        lightgcn_propagate_bucketed,
    )

    was = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        eu, ei, user_emb, item_emb = _setup()
        norm = np.asarray(edge_gcn_norm(eu, ei, U, I)).astype(np.float64)
        binc = build_bucketed_incidence(eu, ei, norm, U, I)
        assert all(w.dtype == jnp.float64 for w in binc.users.w)
        cu, ci = lightgcn_propagate_coo(
            user_emb.astype(np.float64), item_emb.astype(np.float64),
            eu, ei, jnp.asarray(norm), U, I, K,
        )
        bu, bi = lightgcn_propagate_bucketed(
            jnp.asarray(user_emb, jnp.float64),
            jnp.asarray(item_emb, jnp.float64), binc, K,
        )
        np.testing.assert_allclose(np.asarray(bu), np.asarray(cu), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(ci), rtol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", was)


def test_zero_degree_nodes_stay_finite():
    eu, ei, user_emb, item_emb = _setup()
    # add an isolated user/item by construction: none reference idx U-1 / I-1
    mask = (eu != U - 1) & (ei != I - 1)
    eu, ei = eu[mask], ei[mask]
    R_hat = normalized_bipartite(U, I, EdgeSet(eu, ei))
    u, i = lightgcn_propagate(user_emb, item_emb, R_hat, K)
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(np.asarray(i)).all()
    # isolated nodes keep only their layer-0 term in the layer mean
    np.testing.assert_allclose(np.asarray(u)[U - 1], user_emb[U - 1] / (K + 1), rtol=1e-5)


def test_bucket_caps_pad_ratio_and_count():
    """The quantized-cap rule (_bucket_caps): pad ratio <= ~1.13 over any
    degree distribution and bucket count bounded even for heavy tails (the
    round-3 power-of-two rule padded Poisson(40) degrees 1.51x, and the
    aggregation is gather-issue-bound so padding costs linearly)."""
    from lgcnhs_tpu.ops.propagation import _bucket_caps

    rng = np.random.default_rng(0)
    for deg in (
        rng.poisson(40, 50_000) + 1,
        rng.poisson(67, 30_000) + 1,
        (rng.pareto(1.2, 20_000) * 5 + 1).astype(np.int64),  # heavy tail
        np.arange(1, 3000),
    ):
        caps = _bucket_caps(deg, min_cap=4)
        assert (caps >= deg).all()
        pad = caps.sum() / deg.sum()
        assert pad <= 1.25, pad  # min_cap floor dominates tiny degrees
        big = deg > 128
        if big.any():  # geometric region: per-row pad <= 1.125
            assert (caps[big] / deg[big] <= 1.125 + 1e-9).all()
        assert len(np.unique(caps)) <= 16 + 8 * int(np.ceil(np.log2(max(deg.max(), 2)))), (
            len(np.unique(caps))
        )


def test_bucketed_matches_after_cap_rule_change():
    """Aggregation over the tight-cap layout == plain segment-sum COO (the
    cap rule only changes padding, never values)."""
    from lgcnhs_tpu.ops.propagation import (
        build_bucketed_incidence,
        edge_gcn_norm,
        lightgcn_propagate_bucketed,
        lightgcn_propagate_coo,
    )

    import jax.numpy as jnp

    U, I, E, D = 60, 45, 700, 8
    rng = np.random.default_rng(3)
    eu = rng.integers(0, U, E).astype(np.int32)
    ei = rng.integers(0, I, E).astype(np.int32)
    norm = edge_gcn_norm(jnp.asarray(eu), jnp.asarray(ei), U, I)
    binc = build_bucketed_incidence(eu, ei, np.asarray(norm), U, I)
    xu = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    got_u, got_i = lightgcn_propagate_bucketed(xu, xi, binc, 3)
    want_u, want_i = lightgcn_propagate_coo(
        xu, xi, jnp.asarray(eu), jnp.asarray(ei), norm, U, I, 3
    )
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i), rtol=2e-5, atol=2e-6)
