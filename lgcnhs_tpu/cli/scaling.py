"""Multi-device scaling measurement harness.

BASELINE.md's speed protocol calls for examples/s measured at 1 chip, 1 host,
and >=2 hosts with >=80% scaling efficiency. This driver measures the sharded
train step at a ladder of mesh sizes on whatever devices exist (real TPU
chips, or virtual CPU devices via
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` for harness testing)
and prints an efficiency table.

Usage:
  python -m lgcnhs_tpu.cli.scaling --users 6040 --items 3706 \
      --interactions 1000000 --steps 50 --meshes 1 2 4 8
"""
from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np


def measure_mesh(n_model: int, graph, hp, steps: int, chunk: int = 1) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from lgcnhs_tpu.data.graph import normalized_bipartite, pos_bool_matrix
    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.parallel.sharding import (
        make_plan,
        make_sharded_train_scan,
        make_sharded_train_step,
        shard_params,
        shard_train_inputs,
    )
    from lgcnhs_tpu.runtime.mesh import make_mesh
    from lgcnhs_tpu.train.trainer import lr_schedule

    mesh = make_mesh((1, n_model))
    plan = make_plan(mesh)
    U, I = graph.n_users, graph.n_items
    R_hat, pos_mask, eu, ei = shard_train_inputs(
        plan,
        normalized_bipartite(U, I, graph.train),
        pos_bool_matrix(U, I, graph.train),
        graph.train.users,
        graph.train.items,
    )
    params = shard_params(plan, init_lightgcn(jax.random.PRNGKey(0), U, I, hp.embedding_dim))
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )
    opt_state = optimizer.init(params)

    if chunk > 1:
        # Dispatch-amortized path: `chunk` epochs per device program, same
        # fold_in(base_key, epoch) stream as the per-step path.
        scan = make_sharded_train_scan(plan, optimizer, hp, I)
        base_key = jax.random.PRNGKey(3)
        params, opt_state, loss = scan(
            params, opt_state, base_key, jnp.int32(0), chunk, R_hat, eu, ei, pos_mask
        )
        loss.block_until_ready()
        n_chunks = -(-steps // chunk)  # ceil: run at least the requested steps
        t0 = time.perf_counter()
        for c in range(n_chunks):
            params, opt_state, loss = scan(
                params, opt_state, base_key, jnp.int32((c + 1) * chunk), chunk,
                R_hat, eu, ei, pos_mask,
            )
        float(loss)  # real D2H sync (see bench.py's relay note)
        return hp.batch_size * n_chunks * chunk / (time.perf_counter() - t0)

    step = make_sharded_train_step(plan, optimizer, hp, I)
    key = jax.random.PRNGKey(3)
    key, sub = jax.random.split(key)
    params, opt_state, loss = step(params, opt_state, sub, R_hat, eu, ei, pos_mask)
    loss.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, R_hat, eu, ei, pos_mask)
    float(loss)  # real D2H sync (see bench.py's relay note)
    return hp.batch_size * steps / (time.perf_counter() - t0)


def measure_mesh_coo(n_model: int, graph, hp, steps: int, chunk: int = 1,
                     layout: str = "bucketed",
                     table_sharded: bool = False) -> float:
    """Edge-sharded COO trainer flavor of ``measure_mesh`` — the large-graph
    regime (SURVEY.md section 2.9): edges sharded over the mesh, replicated
    tables, psummed partial aggregates. ``layout``: "bucketed" (production —
    per-shard scatter-free ELL gathers) or "segment" (sorted segment-sums).
    ``table_sharded`` measures the ``compute.coo_table_sharding`` plan
    instead: params + Adam state row-sharded over the model axis (~1/n_model
    persistent table bytes per device, minibatch rows exchanged per shard)."""
    import jax
    import jax.numpy as jnp
    import optax

    from lgcnhs_tpu.data.graph import EdgeSet
    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.ops.propagation import edge_gcn_norm
    from lgcnhs_tpu.ops.scalable import user_csr
    from lgcnhs_tpu.parallel.sharding import (
        make_plan,
        make_sharded_coo_train_scan,
        make_table_sharded_coo_train_scan,
        padded_catalog,
        shard_bucketed_incidence,
        shard_coo_edges,
        shard_params,
    )
    from lgcnhs_tpu.runtime.mesh import make_mesh
    from lgcnhs_tpu.train.trainer import lr_schedule

    mesh = make_mesh((1, n_model))
    plan = make_plan(mesh)
    U, I = graph.n_users, graph.n_items
    eu_np = np.asarray(graph.train.users)
    ei_np = np.asarray(graph.train.items)
    edge_users, edge_items = jnp.asarray(eu_np), jnp.asarray(ei_np)
    edge_norm = edge_gcn_norm(edge_users, edge_items, U, I)
    rowptr_np, cols_np = user_csr(U, EdgeSet(eu_np, ei_np))
    rowptr, cols = jnp.asarray(rowptr_np), jnp.asarray(cols_np)
    if table_sharded:
        # tables row-sharded (padded): the incidence aggregates into padded
        # outputs so propagation shapes line up (trainer wiring parity)
        U_se, I_se = padded_catalog(plan, U, I)
    else:
        U_se, I_se = U, I
    if layout == "bucketed" or table_sharded:
        se = shard_bucketed_incidence(
            plan, eu_np, ei_np, np.asarray(edge_norm), U_se, I_se
        )
    else:
        se = shard_coo_edges(plan, eu_np, ei_np, edge_norm)

    init = init_lightgcn(jax.random.PRNGKey(0), U, I, hp.embedding_dim)
    if table_sharded:
        params = shard_params(plan, init)
    else:
        params = jax.device_put(init, plan.replicated)
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )
    opt_state = optimizer.init(params)
    if table_sharded:
        scan = make_table_sharded_coo_train_scan(plan, optimizer, hp, U, I)
    else:
        scan = make_sharded_coo_train_scan(
            plan, optimizer, hp, U, I, layout=layout
        )
    base_key = jax.random.PRNGKey(3)

    chunk = max(1, chunk)
    params, opt_state, loss = scan(
        params, opt_state, base_key, jnp.int32(0), chunk,
        edge_users, edge_items, rowptr, cols, se,
    )
    loss.block_until_ready()
    n_chunks = -(-steps // chunk)
    t0 = time.perf_counter()
    for c in range(n_chunks):
        params, opt_state, loss = scan(
            params, opt_state, base_key, jnp.int32((c + 1) * chunk), chunk,
            edge_users, edge_items, rowptr, cols, se,
        )
    float(loss)  # real D2H sync (see bench.py's relay note)
    return hp.batch_size * n_chunks * chunk / (time.perf_counter() - t0)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--users", type=int, default=943)
    parser.add_argument("--items", type=int, default=1682)
    parser.add_argument("--interactions", type=int, default=100_000)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--batch-size", type=int, default=1024)
    parser.add_argument("--chunk", type=int, default=1,
                        help="epochs per device program (lax.scan); 1 = per-step dispatch")
    parser.add_argument("--meshes", type=int, nargs="+", default=None)
    parser.add_argument("--coo", action="store_true",
                        help="measure the edge-sharded COO (large-graph) trainer")
    parser.add_argument("--coo-layout", choices=("bucketed", "segment"),
                        default="bucketed",
                        help="per-shard aggregation for --coo: scatter-free "
                             "bucketed ELL (production) or sorted segment-sums")
    parser.add_argument("--coo-table-sharding", action="store_true",
                        help="with --coo: measure the row-sharded-tables plan "
                             "(~1/n_model persistent table bytes per device) "
                             "instead of replicated tables")
    args = parser.parse_args(argv)
    if args.coo_table_sharding and args.coo_layout == "segment":
        parser.error("--coo-table-sharding runs the bucketed-ELL aggregation; "
                     "it cannot measure --coo-layout segment")

    import os

    import jax

    # This machine's sitecustomize force-registers the axon TPU backend with
    # jax_platforms="axon,cpu", which shadows the virtual CPU devices
    # requested via xla_force_host_platform_device_count — the ladder then
    # silently collapses to the 1-device rung. Same guard as
    # __graft_entry__.dryrun_multichip: pin CPU before backend init.
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception as exc:  # surfacing beats the silent 1-rung collapse
            print(f"WARNING: could not pin jax_platforms=cpu ({exc}); the "
                  "requested virtual devices may be shadowed by a registered "
                  "accelerator backend", flush=True)

    from lgcnhs_tpu.cli.common import enable_compilation_cache
    from lgcnhs_tpu.config import load_config
    from lgcnhs_tpu.data.graph import build_graph
    from lgcnhs_tpu.data.ratings import prepare_ratings
    from lgcnhs_tpu.data.synthetic import synthesize_movielens_like

    enable_compilation_cache()
    n_dev = len(jax.devices())
    meshes = args.meshes or [m for m in (1, 2, 4, 8, 16) if m <= n_dev]
    meshes = [m for m in meshes if m <= n_dev]

    cfg = load_config(env="prod", dataset="synthetic", model="LightGCN")
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "batch_size": args.batch_size}
    )
    df = synthesize_movielens_like(args.users, args.items, args.interactions, seed=42)
    splits = prepare_ratings(df, cfg)
    graph = build_graph(splits)

    rows = []
    base_rate = None
    if args.coo:
        measure = partial(measure_mesh_coo, layout=args.coo_layout,
                          table_sharded=args.coo_table_sharding)
    else:
        measure = measure_mesh
    for m in meshes:
        rate = measure(m, graph, hp, args.steps, chunk=args.chunk)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * m)
        rows.append({"devices": m, "examples_per_sec": round(rate, 1),
                     "speedup": round(rate / base_rate, 2),
                     "efficiency": round(eff, 3)})
        print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == "__main__":
    main()
