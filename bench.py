"""Benchmark: LGCNHS training / retrieval / fused-serving throughput on TPU.

Headline: the flagship workload from BASELINE.json — SpreadLightGCNOpti's
embedding-model training step (full-graph LightGCN forward + BPR + Adam) at
MovieLens-1M scale (6040 users x 3706 items, ~1M interactions, d=64,
batch=1024), measured THROUGH the trainer's actual TPU dispatch: the int8
binary-incidence dual-product Pallas kernel when it fits VMEM
(ops/pallas/propagation.py — 1 byte/entry of streamed incidence vs 2 for
bf16), else the bf16 dense Pallas kernel. Both variants are measured and
logged; the one the trainer would pick is the headline.

``vs_baseline`` is the speedup over the SAME jitted program on this host's
CPU backend (the reference is CPU/single-GPU torch-geometric with per-epoch
dense (U+I)^2 joint-adjacency message passing, so CPU-JAX is a STRONGER
baseline; the ratio is conservative).

The "extra" field folds in the other product kernels so every headline
number in PERF.md is reproducible from this one committed entry point:
- retrieval_qps: fused masked top-k retrieval over the full catalog
  (ops/pallas/retrieval.py), users/s
- serve_fused_qps: one-pass LGCNHS serving (G, F, Hadamard, top-k in VMEM;
  ops/pallas/fusion_serve.py), users/s
- vs_reference_code: measured wall-clock of the REFERENCE'S OWN
  getSpreadingGeneralMat + HybridS + getResource numpy code
  (model/SpreadMethod/model.py:14-99) on ML-100K-scale input vs our jitted
  diffusion_scores on TPU — the one speedup measured against actual
  reference code rather than a JAX re-implementation.

Output: one JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.
Progress/diagnostics go to stderr.

Environment note: on the tunneled axon TPU, the first device->host sync of a
process costs minutes (measured 25s..540s). The warmup below pays it before
any timer starts.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_USERS = 6040
N_ITEMS = 3706
N_INTERACTIONS = 1_600_000  # ~1M post-dedup: true ML-1M interaction count
EMBED_DIM = 64
BATCH = 1024
K = 10
TPU_STEPS = 200
CPU_STEPS = 20
LAMBDA_POINTS = 101  # the reference's findLambda grid (findLambda.py:83)
REF_SWEEP_ITERS = 2  # reference loop iterations to time (each costs seconds)
SWEEP_USERS, SWEEP_ITEMS, SWEEP_INTERACTIONS = 943, 1682, 100_000  # ML-100K


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


#: per-region timing statistics, keyed by metric name; written to the
#: BENCH_STATS.json side file by ``format_record`` (NOT inlined into the
#: printed JSON line — that blew the driver's 2000-char stdout-tail capture
#: in round 4) so every headline number still carries its repetition count,
#: min, median, and relative spread (VERDICT r3 weak 3: single-run numbers
#: on a relay TPU invite misreading regressions).
STATS: dict = {}


def timed_stats(run, reps: int, inner: int = None) -> dict:
    """{'min_s','median_s','rel_spread','n'} per-invocation seconds over
    ``reps`` independently timed repetitions (each timing ``inner``
    back-to-back calls of ``run()``, which must return a device array).

    ``inner=None`` auto-calibrates so each timed region runs >= ~0.25 s:
    measured this round, every BLOCKED REGION through the relay carries a
    fixed ~25 ms sync overhead regardless of length, so sub-10-ms kernels
    timed one-per-region read 3-5x slower than their steady-state rate
    (which is what a serving deployment sees). Long regions (train scans)
    pass ``inner=1`` explicitly.

    Robust to the relay's two timing pathologies observed in round 3:
    (a) ``block_until_ready`` once returned immediately (a 0.000 s
    "measurement" of a 0.3 s program), and (b) device fetches have wildly
    erratic latency when the relay degrades (25 ms nominal; up to ~60 s
    observed), so fetch-terminated timing poisons short regions.

    Strategy: time each repetition with block_until_ready (stable in every
    healthy run), then VERIFY execution with one fetch OUTSIDE all timers.
    Only if the fastest repetition is implausibly small (< 1 ms — the
    lying-block signature) re-time fetch-terminated, which is conservative
    (an upper bound) rather than flattering."""
    import jax

    reps = max(5, reps)  # variance floor: never report a single-run number
    out = None

    if inner is None:
        t0 = time.perf_counter()
        probe = run()
        probe.block_until_ready()
        per = max(time.perf_counter() - t0, 1e-5)
        inner = max(1, min(500, int(0.25 / per)))

    def _once(terminate_with_fetch: bool) -> float:
        nonlocal out
        t0 = time.perf_counter()
        for _ in range(inner):
            out = run()
        if terminate_with_fetch:
            jax.device_get(out)
        else:
            out.block_until_ready()
        return (time.perf_counter() - t0) / inner

    samples = [_once(False) for _ in range(reps)]
    jax.device_get(out)  # execution proof, outside every timer
    if min(samples) * inner < 1e-3:  # guard tests the REGION, not per-call
        samples = [_once(True) for _ in range(reps)]
    s = sorted(samples)
    med = s[len(s) // 2]
    return {
        "min_s": s[0],
        "median_s": med,
        "rel_spread": (s[-1] - s[0]) / med if med else 0.0,
        "n": reps,
    }


def record_stats(name: str, stats: dict) -> dict:
    STATS[name] = {
        "min_s": round(stats["min_s"], 5),
        "median_s": round(stats["median_s"], 5),
        "rel_spread": round(stats["rel_spread"], 3),
        "n": stats["n"],
    }
    return stats


def timed_rate(run, reps: int, name: str = None, inner: int = None) -> float:
    """MEDIAN seconds per invocation (see ``timed_stats``); records the full
    stats under ``name`` when given."""
    stats = timed_stats(run, reps, inner=inner)
    if name:
        record_stats(name, stats)
    return stats["median_s"]


def _find_ml1m_dir():
    """Real ml-1m directory when present: $LGCNHS_ML1M_DIR, else the
    conventional fetch locations. None -> synthetic stand-in."""
    import os

    from lgcnhs_tpu.data.fetch import have_ml1m

    candidates = [os.environ.get("LGCNHS_ML1M_DIR")] + [
        os.path.join(base, "ml-1m")
        for base in ("data", "artifacts/data", os.path.expanduser("~/data"))
    ]
    for cand in candidates:
        if cand and have_ml1m(cand):
            return cand
    return None


def build_problem():
    """(cfg, hp, graph, dataset_provenance).

    Uses the REAL MovieLens-1M files when available (data/movielens1m.py,
    provenance "ml-1m"); otherwise a seeded synthetic dataset at the same
    scale (provenance "synthetic-ml1m-scale" — the metric name carries this
    so the bench never claims real-data results it didn't produce)."""
    from lgcnhs_tpu.config import load_config
    from lgcnhs_tpu.data.graph import build_graph
    from lgcnhs_tpu.data.ratings import prepare_ratings
    from lgcnhs_tpu.data.synthetic import synthesize_movielens_like

    ml1m_dir = _find_ml1m_dir()
    if ml1m_dir is not None:
        from lgcnhs_tpu.data.fetch import ml1m_paths
        from lgcnhs_tpu.data.movielens1m import read_movielens1m_raw

        log(f"using REAL ml-1m from {ml1m_dir}")
        cfg = load_config(env="prod", dataset="movielens1m",
                          model="SpreadLightGCNOpti")
        import dataclasses

        cfg = cfg.replace(
            preprocessing=dataclasses.replace(
                cfg.preprocessing, dataset_paths=ml1m_paths(ml1m_dir)
            )
        )
        rating, _, _ = read_movielens1m_raw(cfg.preprocessing.dataset_paths)
        splits = prepare_ratings(rating, cfg)
        provenance = "ml-1m"
    else:
        cfg = load_config(env="prod", dataset="synthetic", model="SpreadLightGCNOpti")
        cfg = cfg.replace(
            synthetic_users=N_USERS,
            synthetic_items=N_ITEMS,
            synthetic_interactions=N_INTERACTIONS,
        )
        df = synthesize_movielens_like(N_USERS, N_ITEMS, N_INTERACTIONS, seed=42)
        splits = prepare_ratings(df, cfg)
        provenance = "synthetic-ml1m-scale"
    graph = build_graph(splits)
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "batch_size": BATCH, "embedding_dim": EMBED_DIM}
    )
    return cfg, hp, graph, provenance


def bench_train(devices, hp, graph, n_steps: int, variant: str,
                stats_name: str = None) -> float:
    """examples/s for the jitted train scan on the given device.

    variant: "xla_f32" (CPU baseline / parity path), "pallas_bf16" (dense
    bf16 incidence), or "binary" (factored int8 incidence — the trainer's
    TPU dispatch when it fits VMEM, train/trainer.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from lgcnhs_tpu.data.graph import (
        binary_incidence_factors,
        normalized_bipartite,
        pos_bool_matrix,
    )
    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.train.trainer import lr_schedule, make_train_scan

    dev = devices[0]
    U, I = graph.n_users, graph.n_items
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    pallas_ok = dev.platform == "tpu"  # Mosaic kernels need real TPU
    if variant == "binary":
        R8, du_inv, di_inv = binary_incidence_factors(U, I, graph.train)
        R_hat = (put(R8), put(du_inv), put(di_inv))
        bf16, use_pallas = True, pallas_ok
    elif variant == "pallas_bf16":
        R_hat = put(normalized_bipartite(U, I, graph.train)).astype(jnp.bfloat16)
        bf16, use_pallas = True, pallas_ok
    else:
        R_hat = put(normalized_bipartite(U, I, graph.train))
        bf16, use_pallas = False, False
    pos = put(pos_bool_matrix(U, I, graph.train))
    eu = put(graph.train.users)
    ei = put(graph.train.items)
    params = jax.tree.map(put, init_lightgcn(jax.random.PRNGKey(0), U, I, EMBED_DIM))

    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )
    opt_state = jax.tree.map(put, optimizer.init(params))
    # What the trainer actually runs between eval boundaries: all epochs in
    # ONE jitted lax.scan (make_train_scan).
    scan = make_train_scan(optimizer, hp, I, bf16_matmul=bf16, use_pallas=use_pallas)

    key = jax.device_put(jax.random.PRNGKey(7), dev)

    # >=5 independently timed scan chunks (variance discipline, VERDICT r3
    # weak 3): compile+warm one chunk, then each timed repetition runs a
    # fresh chunk-sized scan at advancing epoch offsets (training states
    # chain through, so every rep is real work at steady state).
    chunk = max(1, n_steps)
    params, opt_state, loss = scan(params, opt_state, key, 0, chunk, R_hat, eu, ei, pos)
    loss.block_until_ready()

    state = {"p": params, "o": opt_state, "e": chunk}

    def run():
        p, o, loss = scan(state["p"], state["o"], key, state["e"], chunk,
                          R_hat, eu, ei, pos)
        state["p"], state["o"], state["e"] = p, o, state["e"] + chunk
        return loss

    stats = record_stats(stats_name or f"train_{variant}",
                         timed_stats(run, 5, inner=1))
    return hp.batch_size * chunk / stats["median_s"]


def bench_train_coo(devices, hp, n_steps: int, chunk: int = 50) -> float:
    """examples/s of the scalable (COO/segment-sum) train scan at a catalog
    too large to densify (50k x 30k would be a 6 GB dense incidence —
    choose_propagation picks "coo"). Measures the path the trainer actually
    uses beyond the dense regime; no (U, I) array exists anywhere.

    Dispatched in <=``chunk``-step scans: the tunneled axon TPU kills any
    single on-device execution that runs long (measured: a 200-step scan at
    0.35 s/step died UNAVAILABLE; 5 steps fine), and chunking still
    amortizes dispatch overhead over ``chunk`` steps."""
    import jax
    import jax.numpy as jnp
    import optax

    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.ops.propagation import build_bucketed_incidence, edge_gcn_norm
    from lgcnhs_tpu.ops.scalable import user_csr
    from lgcnhs_tpu.data.graph import EdgeSet
    from lgcnhs_tpu.train.trainer import lr_schedule, make_coo_train_scan

    dev = devices[0]
    U, I, E = 50_000, 30_000, 2_000_000
    rng = np.random.default_rng(3)
    eu = rng.integers(0, U, E).astype(np.int32)
    ei = rng.integers(0, I, E).astype(np.int32)
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    edge_users, edge_items = put(eu), put(ei)
    edge_norm = edge_gcn_norm(edge_users, edge_items, U, I)
    binc = jax.tree.map(put, build_bucketed_incidence(eu, ei, np.asarray(edge_norm), U, I))
    rowptr_np, cols_np = user_csr(U, EdgeSet(eu, ei))
    rowptr, cols = put(rowptr_np), put(cols_np)
    params = jax.tree.map(put, init_lightgcn(jax.random.PRNGKey(0), U, I, EMBED_DIM))
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )
    opt_state = jax.tree.map(put, optimizer.init(params))
    scan = make_coo_train_scan(optimizer, hp, U, I)
    key = jax.device_put(jax.random.PRNGKey(7), dev)

    chunk = min(chunk, n_steps)
    params, opt_state, loss = scan(
        params, opt_state, key, 0, chunk, binc, edge_users, edge_items,
        rowptr, cols,
    )
    loss.block_until_ready()

    # >=5 independently timed chunk-sized scans (see bench_train)
    state = {"p": params, "o": opt_state, "e": chunk}

    def run():
        p, o, loss = scan(state["p"], state["o"], key, state["e"], chunk,
                          binc, edge_users, edge_items, rowptr, cols)
        state["p"], state["o"], state["e"] = p, o, state["e"] + chunk
        return loss

    stats = record_stats(
        "train_coo_50kx30k", timed_stats(run, max(5, n_steps // chunk), inner=1)
    )
    return hp.batch_size * chunk / stats["median_s"]


def bench_train_dense_rung(devices, hp, n_steps: int = 60, chunk: int = 20) -> float:
    """examples/s of the REAL train scan on the bf16-DENSE middle rung at the
    COO bench's 50k x 30k / 2M-edge scale: the f32 incidence (6 GB) is over
    the densify budget but the bf16 one (3 GB) is not, and the dtype-aware
    ``choose_propagation`` dispatches mixed-precision runs here — dense MXU
    streams beat the bucketed layout's gather-issue bound (docs/PERF.md,
    COO roofline). The incidence is built ON DEVICE from the int8 pattern
    (a host-side f32 (U, I) would be 6 GB of RAM + transfer)."""
    import jax
    import jax.numpy as jnp
    import optax

    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.train.trainer import lr_schedule, make_train_scan

    dev = devices[0]
    U, I, E = 50_000, 30_000, 2_000_000
    rng = np.random.default_rng(3)
    eu = rng.integers(0, U, E).astype(np.int32)
    ei = rng.integers(0, I, E).astype(np.int32)
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    from lgcnhs_tpu.data.graph import EdgeSet, device_bf16_incidence
    from lgcnhs_tpu.ops.scalable import user_csr

    es = EdgeSet(eu, ei)
    R16 = device_bf16_incidence(U, I, es)  # the trainer's own rung builder
    R16.block_until_ready()
    # the production rung samples via CSR (trainer csr_sampler=True): no
    # (U, I) pos_mask anywhere. Measured vs the dense-mask flavor at this
    # scale: 52.4 vs 50.5 ms/step (+3.7%) for -3 GB of host+device bool.
    rowptr_np, cols_np = user_csr(U, es)
    rowptr, cols = put(rowptr_np), put(cols_np)

    eu_j, ei_j = put(eu), put(ei)
    params = jax.tree.map(put, init_lightgcn(jax.random.PRNGKey(0), U, I, EMBED_DIM))
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )
    opt_state = jax.tree.map(put, optimizer.init(params))
    scan = make_train_scan(optimizer, hp, I, bf16_matmul=True, use_pallas=False,
                           csr_sampler=True)
    key = jax.device_put(jax.random.PRNGKey(7), dev)

    chunk = min(chunk, n_steps)
    params, opt_state, loss = scan(
        params, opt_state, key, 0, chunk, R16, eu_j, ei_j, rowptr, cols
    )
    loss.block_until_ready()
    state = {"p": params, "o": opt_state, "e": chunk}

    def run():
        p, o, loss = scan(state["p"], state["o"], key, state["e"], chunk,
                          R16, eu_j, ei_j, rowptr, cols)
        state["p"], state["o"], state["e"] = p, o, state["e"] + chunk
        return loss

    stats = record_stats("train_densebf16_50kx30k", timed_stats(run, 5, inner=1))
    return hp.batch_size * chunk / stats["median_s"]


def bench_retrieval(graph, k: int, reps: int = 10) -> tuple:
    """users/s of full-catalog masked top-k retrieval (the serving kernel
    recommend_gcn dispatches to on TPU) at list size ``k`` — benched at BOTH
    the dev k=10 and the prod k=100 so the README's k=100 claim is backed by
    the current artifact (VERDICT r3 weak 6)."""
    import jax
    import jax.numpy as jnp

    from lgcnhs_tpu.data.graph import pos_bool_matrix
    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.ops.topk import retrieve_topk

    U, I = graph.n_users, graph.n_items
    params = init_lightgcn(jax.random.PRNGKey(1), U, I, EMBED_DIM)
    seen = jnp.asarray(pos_bool_matrix(U, I, graph.train, graph.val))
    idx = retrieve_topk(params.user_emb, params.item_emb, seen, k)
    idx.block_until_ready()
    per = timed_rate(
        lambda: retrieve_topk(params.user_emb, params.item_emb, seen, k),
        reps, name=f"retrieval_k{k}",
    )

    # steady-state device rate: 20 chained invocations in ONE program (the
    # carry perturbation serializes them) — immune to the relay's variable
    # per-dispatch cost (~1-4 ms depending on the day), which inflates the
    # dispatched rate above by up to 4x for ms-scale kernels
    @jax.jit
    def _scan20(ue):
        def body(c, _):
            out = retrieve_topk(c, params.item_emb, seen, k)
            return c + 1e-30 * out[0, 0].astype(c.dtype), None
        c, _ = jax.lax.scan(body, ue, None, length=20)
        return c

    _scan20(params.user_emb).block_until_ready()
    st = record_stats(
        f"retrieval_k{k}_steady", timed_stats(lambda: _scan20(params.user_emb), 5, inner=1)
    )
    return U / per, U * 20 / st["median_s"]


def bench_streaming_retrieval(k: int = 100, n_items: int = 50_000,
                              n_users: int = 1024, reps: int = 5) -> tuple:
    """(streaming-kernel users/s, XLA-chain users/s) at a catalog beyond
    ``fits_vmem_retrieval``'s one-shot cap (VERDICT r4 #5): the item-tiled
    Pallas kernel (running top-k merge, no (U, I) score write to HBM) vs the
    materialize-scores + masked_topk XLA program at the same shape."""
    import jax
    import jax.numpy as jnp

    from lgcnhs_tpu.ops.pallas.retrieval import streaming_topk_retrieval
    from lgcnhs_tpu.ops.topk import masked_topk

    rng = np.random.default_rng(7)
    ue = jnp.asarray(rng.standard_normal((n_users, EMBED_DIM)), jnp.float32)
    ie = jnp.asarray(rng.standard_normal((n_items, EMBED_DIM)), jnp.float32)
    seen = jnp.asarray(rng.random((n_users, n_items)) < 0.02)

    @jax.jit
    def xla_chain(ue):
        scores = jnp.dot(ue, ie.T, precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        return masked_topk(scores, seen, k)

    got = streaming_topk_retrieval(ue, ie, seen, k)[0]
    want = xla_chain(ue)
    agree = float(jnp.mean((got == want).astype(jnp.float32)))
    log(f"streaming retrieval @{n_items} items: index agreement {agree:.6f}")

    per_stream = timed_rate(
        lambda: streaming_topk_retrieval(ue, ie, seen, k)[0],
        reps, name=f"retrieval_stream_{n_items // 1000}k",
    )
    per_xla = timed_rate(
        lambda: xla_chain(ue), reps,
        name=f"retrieval_stream_xla_{n_items // 1000}k",
    )
    return n_users / per_stream, n_users / per_xla, agree


def bench_serve_fused(graph, lam: float, k: int, reps: int = 7) -> tuple:
    """users/s of the one-pass fused LGCNHS serving kernel (G, F, Hadamard,
    top-k without HBM intermediates) — XLA equivalent off-TPU."""
    import jax
    import jax.numpy as jnp

    from lgcnhs_tpu.data.graph import interaction_matrix, pos_bool_matrix
    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.ops.diffusion import general_spreading_matrix, hybrid_transfer

    U, I = graph.n_users, graph.n_items
    params = init_lightgcn(jax.random.PRNGKey(2), U, I, EMBED_DIM)
    A = jnp.asarray(interaction_matrix(U, I, graph.train, graph.val))
    seen = jnp.asarray(pos_bool_matrix(U, I, graph.train, graph.val))
    W = hybrid_transfer(A, general_spreading_matrix(A), jnp.asarray(lam, A.dtype))

    if jax.default_backend() == "tpu":
        from lgcnhs_tpu.ops.pallas.fusion_serve import fused_lgcnhs_serve

        run = lambda: fused_lgcnhs_serve(
            params.user_emb, params.item_emb, A, W, seen, k
        )[0]
    else:
        from lgcnhs_tpu.models.fusion import _serve_unfused

        run = lambda: _serve_unfused(params.user_emb, params.item_emb, A, W, seen, k)

    run().block_until_ready()
    per = timed_rate(run, reps, name=f"serve_fused_k{k}")

    if jax.default_backend() == "tpu":
        serve = lambda ue: fused_lgcnhs_serve(ue, params.item_emb, A, W, seen, k)[0]
    else:
        serve = lambda ue: _serve_unfused(ue, params.item_emb, A, W, seen, k)

    @jax.jit
    def _scan20(ue):  # steady-state rate; see bench_retrieval
        def body(c, _):
            out = serve(c)
            return c + 1e-30 * out[0, 0].astype(c.dtype), None
        c, _ = jax.lax.scan(body, ue, None, length=20)
        return c

    _scan20(params.user_emb).block_until_ready()
    st = record_stats(
        f"serve_fused_k{k}_steady", timed_stats(lambda: _scan20(params.user_emb), 5, inner=1)
    )
    return U / per, U * 20 / st["median_s"]


def bench_diffusion_tall(reps: int = 5) -> tuple:
    """(factored_s, blocked_s) for full-catalog diffusion scoring at a TALL
    catalog (U=2,000 x I=50,000): the (I, I) transfer matrix would be 10 GB,
    so the dense reference-order path cannot run at all. choose_diffusion
    picks "factored" here (2U < I): F = (A D1 An^T)(A D2) — 2 U^2 I FLOPs,
    no I x I intermediate; "blocked" streams W in (I, B) column blocks at
    U I^2 FLOPs. Both are exact (ops/diffusion.py; equality pinned in
    tests/test_diffusion_scale.py)."""
    import jax
    import jax.numpy as jnp

    from lgcnhs_tpu.ops.diffusion import (
        blocked_diffusion_scores,
        choose_diffusion,
        user_factored_diffusion_scores,
    )

    U, I, E = 2_000, 50_000, 1_500_000
    assert choose_diffusion(U, I) == "factored"
    rng = np.random.default_rng(17)
    A = np.zeros((U, I), np.float32)
    A[rng.integers(0, U, E), rng.integers(0, I, E)] = 1.0
    Aj = jnp.asarray(A)
    lam = jnp.float32(0.6)

    user_factored_diffusion_scores(Aj, lam).block_until_ready()
    fact_s = timed_rate(lambda: user_factored_diffusion_scores(Aj, lam), reps,
                        name="diffusion_tall_factored", inner=1)

    blocked_diffusion_scores(Aj, lam, block=500).block_until_ready()
    blk_s = timed_rate(lambda: blocked_diffusion_scores(Aj, lam, block=500), 5,
                       name="diffusion_tall_blocked", inner=1)
    return fact_s, blk_s


# Loader for the reference's own modules (shared with cli/parity_report.py).
from lgcnhs_tpu.eval.reference_runner import ReferenceModules


def _RefModules(ref_root, save_dir: str):
    return ReferenceModules(save_dir, ref_root=ref_root, k=K)


def bench_reference_diffusion() -> tuple:
    """(reference_seconds, ours_seconds) for the HybridS resource-matrix
    chain at ML-100K scale — the reference side executes the ACTUAL
    /root/reference/model/SpreadMethod/model.py code (numpy, as shipped)."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from lgcnhs_tpu.ops.diffusion import diffusion_scores

    ref_root = Path("/root/reference")
    if not ref_root.exists():
        return None, None

    rng = np.random.default_rng(5)
    U, I, E = 943, 1682, 80_000
    A = np.zeros((U, I))
    A[rng.integers(0, U, E), rng.integers(0, I, E)] = 1.0
    lam = 0.8

    with tempfile.TemporaryDirectory() as td, _RefModules(ref_root, td) as ref:
        t0 = time.perf_counter()
        W_gen = ref.spread.getSpreadingGeneralMat(A.copy())
        W = ref.spread.HybridS(A, W_gen, lam)
        _F_ref = ref.spread.getResource(A, W)
        ref_s = time.perf_counter() - t0

    Aj = jnp.asarray(A, jnp.float32)
    lamj = jnp.asarray(lam, jnp.float32)
    diffusion_scores(Aj, lamj).block_until_ready()  # compile
    ours_s = timed_rate(lambda: diffusion_scores(Aj, lamj), 10,
                        name="hybrids_ml100k")
    return ref_s, ours_s


def bench_lambda_sweep() -> tuple:
    """(ours_total_s, ref_per_iter_s) for the findLambda hyperparameter sweep
    at ML-100K scale, 101 grid points.

    Ours: the ENTIRE grid as one on-device program (ops/sweep.py) — G, A,
    W_gen, eval arrays resident; diffusion + Hadamard + ranking + all five
    raw metrics per point under lax.map. Timed end-to-end for all 101 points.

    Reference: the ACTUAL per-iteration body of findLambda.py:93-116 composed
    from the reference's own loadable functions — getHybridSResourceMat's
    exact body HybridS+getResource (model/SpreadLightGCNOpti/model.py:173-188
    delegates to model/SpreadMethod/model.py), the per-user ranking loop
    (model/SpreadMethod/recommend.py:18-56, same loop as the
    SpreadLightGCNOpti flavor minus its movielens quirk), recommendDictToTensor,
    and getAccurateMetrics + getDiversityMetrics (incl. the O(U^2) python
    Hamming loop). Measured for REF_SWEEP_ITERS iterations, reported
    per-iteration; a full grid costs 101x that.
    """
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from lgcnhs_tpu.config import load_config
    from lgcnhs_tpu.data.graph import build_graph, interaction_matrix, pos_bool_matrix
    from lgcnhs_tpu.data.ratings import prepare_ratings
    from lgcnhs_tpu.data.synthetic import synthesize_movielens_like
    from lgcnhs_tpu.eval.metrics import EvalContext
    from lgcnhs_tpu.models.fusion import allocate_matrix
    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.ops.diffusion import general_spreading_matrix
    from lgcnhs_tpu.ops.metrics_ops import similarity_matrix
    from lgcnhs_tpu.ops.sweep import lambda_sweep_metrics

    U, I = SWEEP_USERS, SWEEP_ITEMS
    cfg = load_config(env="dev", dataset="synthetic", model="SpreadLightGCNOpti")
    df = synthesize_movielens_like(U, I, SWEEP_INTERACTIONS, seed=11)
    splits = prepare_ratings(df, cfg)
    graph = build_graph(splits)
    ctx = EvalContext.build(
        graph.n_users, graph.n_items, graph.test, graph.train, graph.val
    )
    params = init_lightgcn(jax.random.PRNGKey(9), graph.n_users, graph.n_items, EMBED_DIM)
    A = jnp.asarray(
        interaction_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    seen = jnp.asarray(
        pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    G = allocate_matrix(params, seen)
    W_gen = general_spreading_matrix(A)
    S = similarity_matrix(jnp.asarray(ctx.interaction), jnp.asarray(ctx.item_deg))
    lambdas = jnp.asarray(np.linspace(0.0, 1.0, LAMBDA_POINTS, dtype=np.float32))
    sweep_args = (
        G, A, W_gen, seen,
        jnp.asarray(ctx.eval_pos), jnp.asarray(ctx.eval_counts),
        jnp.asarray(ctx.eval_present), S,
    )
    lambda_sweep_metrics(lambdas, *sweep_args, K).block_until_ready()  # compile
    # block-timed median of 5 with a lying-block guard (see timed_stats)
    ours_s = timed_rate(lambda: lambda_sweep_metrics(lambdas, *sweep_args, K), 5,
                        name="lambda_sweep_101pts", inner=1)

    ref_root = Path("/root/reference")
    if not ref_root.exists():
        return ours_s, None

    An = np.asarray(A, np.float64)
    Gn = np.asarray(G, np.float64)
    train_df = pd.DataFrame(
        {"user_id": graph.train.users, "item_id": graph.train.items}
    )
    val_df = pd.DataFrame({"user_id": graph.val.users, "item_id": graph.val.items})
    with tempfile.TemporaryDirectory() as td, _RefModules(ref_root, td) as ref:
        test_df = pd.DataFrame(
            {"user_id": graph.test.users, "item_id": graph.test.items}
        )
        # hoisted exactly as findLambda.py:51-74 hoists them
        test_pos = ref.trans.getUserItemsDictByDataframe(test_df)
        train_pos = ref.trans.getUserItemsDictByDataframe(train_df)
        val_pos = ref.trans.getUserItemsDictByDataframe(val_df)
        item_deg = ref.trans.getItemDegreeByUserPosItemDict(train_pos, val_pos)
        W_gen_ref = ref.spread.getSpreadingGeneralMat(An.copy())
        t0 = time.perf_counter()
        for it in range(REF_SWEEP_ITERS):
            lam = 0.5 + 0.01 * it
            # findLambda.py:95-116 loop body, reference code throughout
            F = ref.spread.getResource(An, ref.spread.HybridS(An, W_gen_ref, lam))
            F_new = Gn * F
            rec_dict = ref.spread_rec.recommendForAllUser(
                F_new, graph.n_users, train_df, val_df, K
            )
            rec = ref.trans.recommendDictToTensor(rec_dict)
            _acc = ref.accurate.getAccurateMetrics(test_pos, rec, K)
            _div = ref.diversity.getDiversityMetrics(rec, item_deg, An, K)
        ref_iter_s = (time.perf_counter() - t0) / REF_SWEEP_ITERS
    return ours_s, ref_iter_s


def _run_row(extra: dict, name: str, fn):
    """Fault-isolate one bench row: a single row's failure (relay
    remote-compile flake, HTTP hiccup, kernel regression) must NEVER cost
    the driver record — a live crash here once ate the whole JSON line
    (observed round 5: the streaming-retrieval row died `INTERNAL:
    remote_compile: response body closed` and main() never printed).
    Transient relay errors usually clear on retry, so each row gets one;
    a second failure is logged, recorded in extra["row_errors"], and the
    bench moves on."""
    for attempt in (1, 2):
        try:
            return fn()
        except Exception as exc:
            log(f"row {name} attempt {attempt} FAILED: "
                f"{type(exc).__name__}: {exc}")
            if attempt == 2:
                # keep the MESSAGE, not just the type: two different relay
                # failures share XlaRuntimeError, and the driver's 2000-char
                # stdout tail won't include early log lines. format_record
                # writes this full entry to the side file BEFORE the printed
                # line truncates it to 80 chars.
                extra.setdefault("row_errors", []).append(
                    f"{name}: {type(exc).__name__}: {str(exc)[:2000]}"
                )
    return None


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lgcnhs_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    jax.device_get(jax.numpy.zeros((4,)))
    log(f"D2H handshake: {time.perf_counter() - t0:.1f}s")

    cfg, hp, graph, provenance = build_problem()
    log(f"problem: U={graph.n_users} I={graph.n_items} E={graph.train.n_edges} "
        f"dataset={provenance}")
    on_tpu = jax.default_backend() == "tpu"

    extra = {}

    from lgcnhs_tpu.ops.pallas.propagation import fits_vmem_binary

    binary_fits = fits_vmem_binary(graph.n_users, graph.n_items, EMBED_DIM, True)
    tpu_devices = jax.devices()
    rate_bf16 = _run_row(
        extra, "train_bf16",
        lambda: bench_train(tpu_devices, hp, graph, TPU_STEPS,
                            "pallas_bf16" if on_tpu else "xla_f32"),
    )
    if rate_bf16 is not None:
        log(f"train bf16 dense Pallas: {rate_bf16:,.0f} examples/s")
        extra["train_bf16_pallas_eps"] = round(rate_bf16, 1)
    else:
        # the headline metric itself is unmeasured: 0.0 would read as a
        # 1.19M -> 0 collapse in any cross-round comparison — flag it
        extra["headline_missing"] = True
    tpu_rate = rate_bf16 or 0.0
    if on_tpu and binary_fits:
        rate_bin = _run_row(
            extra, "train_binary",
            lambda: bench_train(tpu_devices, hp, graph, TPU_STEPS, "binary"),
        )
        if rate_bin is not None:
            log(f"train int8 binary-incidence Pallas: {rate_bin:,.0f} examples/s")
            extra["train_int8_binary_eps"] = round(rate_bin, 1)
            # headline = what the trainer actually dispatches (the binary path)
            tpu_rate = rate_bin
            extra.pop("headline_missing", None)  # the binary row measured it

    try:
        cpu_devices = jax.devices("cpu")
        cpu_rate = bench_train(cpu_devices, hp, graph, CPU_STEPS, "xla_f32",
                               stats_name="train_cpu_baseline")
        log(f"CPU baseline ({CPU_STEPS} steps): {cpu_rate:,.0f} examples/s")
        extra["cpu_f32_eps"] = round(cpu_rate, 1)
        vs_baseline = tpu_rate / cpu_rate
    except Exception as exc:  # CPU backend unavailable: report ratio 1
        log(f"CPU baseline unavailable: {exc}")
        vs_baseline = 1.0

    def row_coo():
        coo_rate = bench_train_coo(tpu_devices, hp, TPU_STEPS if on_tpu else 5)
        log(f"train COO/bucketed (50k x 30k, 2M edges): {coo_rate:,.0f} examples/s")
        extra["train_coo_50kx30k_eps"] = round(coo_rate, 1)

    _run_row(extra, "train_coo", row_coo)

    def row_dense_rung():
        dense_rung = bench_train_dense_rung(tpu_devices, hp)
        log(f"train bf16-dense rung (same 50k x 30k): {dense_rung:,.0f} examples/s")
        extra["train_densebf16_50kx30k_eps"] = round(dense_rung, 1)

    if on_tpu:  # the 3 GB dense program is pointless on the CPU fallback
        _run_row(extra, "train_dense_rung", row_dense_rung)

    def row_diffusion_tall():
        fact_s, blk_s = bench_diffusion_tall()
        log(
            f"tall-catalog diffusion (2k x 50k, no (I,I) possible): "
            f"factored {fact_s:.3f}s vs blocked {blk_s:.3f}s ({blk_s / fact_s:.1f}x)"
        )
        extra["diffusion_tall_factored_s"] = round(fact_s, 4)
        extra["diffusion_tall_blocked_s"] = round(blk_s, 4)

    _run_row(extra, "diffusion_tall", row_diffusion_tall)

    def row_retrieval():
        qps, qps_st = bench_retrieval(graph, K)
        log(f"retrieval k={K}: {qps:,.0f} users/s dispatched, {qps_st:,.0f} steady")
        extra["retrieval_qps"] = round(qps, 1)
        extra["retrieval_qps_steady"] = round(qps_st, 1)

    def row_retrieval_k100():
        qps100, qps100_st = bench_retrieval(graph, 100)
        log(f"retrieval k=100: {qps100:,.0f} users/s dispatched, {qps100_st:,.0f} steady")
        extra["retrieval_qps_k100"] = round(qps100, 1)
        extra["retrieval_qps_k100_steady"] = round(qps100_st, 1)

    _run_row(extra, "retrieval_k10", row_retrieval)
    _run_row(extra, "retrieval_k100", row_retrieval_k100)

    def row_streaming():
        sq, xq, agree = bench_streaming_retrieval()
        log(f"streaming retrieval 50k items k=100: {sq:,.0f} users/s vs "
            f"XLA chain {xq:,.0f} ({sq / xq:.2f}x), agreement {agree:.4f}")
        extra["retrieval_stream_50k_qps"] = round(sq, 1)
        extra["retrieval_stream_50k_xla_qps"] = round(xq, 1)
        extra["retrieval_stream_50k_agree"] = round(agree, 6)

    if on_tpu:  # off-TPU both sides are the same XLA program
        _run_row(extra, "streaming_retrieval", row_streaming)

    def row_serve():
        sqps, sqps_st = bench_serve_fused(graph, cfg.hparams.lambda_, K)
        log(f"fused serving k={K}: {sqps:,.0f} users/s dispatched, {sqps_st:,.0f} steady")
        extra["serve_fused_qps"] = round(sqps, 1)
        extra["serve_fused_qps_steady"] = round(sqps_st, 1)

    def row_serve_k100():
        sqps100, sqps100_st = bench_serve_fused(graph, cfg.hparams.lambda_, 100)
        log(f"fused serving k=100: {sqps100:,.0f} users/s dispatched, {sqps100_st:,.0f} steady")
        extra["serve_fused_qps_k100"] = round(sqps100, 1)
        extra["serve_fused_qps_k100_steady"] = round(sqps100_st, 1)

    _run_row(extra, "serve_fused_k10", row_serve)
    _run_row(extra, "serve_fused_k100", row_serve_k100)

    def row_reference_diffusion():
        ref_s, ours_s = bench_reference_diffusion()
        if ref_s is not None:
            log(f"reference HybridS chain (actual numpy code): {ref_s:.3f}s; ours: {ours_s:.4f}s")
            extra["ref_hybrids_ml100k_s"] = round(ref_s, 3)
            extra["ours_hybrids_ml100k_s"] = round(ours_s, 4)
            extra["vs_reference_code"] = round(ref_s / ours_s, 1)

    _run_row(extra, "reference_diffusion", row_reference_diffusion)

    def row_lambda_sweep():
        sweep_s, ref_iter_s = bench_lambda_sweep()
        log(f"lambda sweep, {LAMBDA_POINTS} grid points fused on-device: {sweep_s:.3f}s")
        extra["lambda_sweep_101pts_s"] = round(sweep_s, 3)
        if ref_iter_s is not None:
            log(
                f"reference findLambda body (actual code): {ref_iter_s:.2f}s/point "
                f"-> {ref_iter_s * LAMBDA_POINTS:.0f}s for the grid "
                f"({ref_iter_s * LAMBDA_POINTS / sweep_s:.0f}x)"
            )
            extra["ref_lambda_point_s"] = round(ref_iter_s, 3)
            extra["vs_reference_lambda_sweep"] = round(
                ref_iter_s * LAMBDA_POINTS / sweep_s, 1
            )

    _run_row(extra, "lambda_sweep", row_lambda_sweep)

    # On-chip kernel-contract smoke (VERDICT r4 #7): pin the Pallas-vs-XLA
    # contracts in every round's driver record — the round-4 f32-truncation
    # bug showed why. Runs in THIS process (handshake already paid).
    import jax as _jax

    if _jax.default_backend() == "tpu":
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
        try:
            from tpu_smoke import run_checks

            fails = run_checks(emit=log)
            extra["kernel_contracts"] = "pass" if not fails else fails
        except Exception as e:  # a crash is itself a contract failure
            extra["kernel_contracts"] = [f"smoke crashed: {type(e).__name__}: {e}"]
    else:
        extra["kernel_contracts"] = "skipped (not tpu)"

    print(format_record(tpu_rate, vs_baseline, provenance, extra))


def format_record(tpu_rate, vs_baseline, provenance, extra, out_dir=None) -> str:
    """Build the driver-facing JSON line, guaranteed parseable and compact.

    The driver captures only the last ~2000 chars of stdout and parses the
    final line (round 4's inline stats blew that budget: BENCH_r04.json
    "parsed": null). Bulky per-region stats go to a side file; the printed
    line stays compact and is hard-bounded under 1500 chars."""
    record = {
        "metric": "lightgcn_train_examples_per_sec_ml1m",
        "value": round(tpu_rate, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs_baseline, 2),
        "dataset": provenance,
        "extra": extra,
    }
    out_dir = out_dir or os.path.dirname(os.path.abspath(__file__))
    stats_path = os.path.join(out_dir, "BENCH_STATS.json")
    with open(stats_path, "w") as f:
        json.dump({"stats": STATS, "record": record}, f, indent=1)
    extra["stats_file"] = "BENCH_STATS.json"
    # kernel_contracts itself must respect the budget: a smoke crash embeds
    # an exception string that on this relay can run multi-KB — exactly the
    # run where the record matters most. Full text survives in the side file.
    side_name = os.path.basename(stats_path)
    # pre-truncation failure counts: the collapse summaries below must report
    # how many ACTUALLY failed, not the truncated list length (which includes
    # the "+N more" marker)
    true_counts = {}
    kc = extra.get("kernel_contracts")
    if isinstance(kc, list):
        true_counts["kernel_contracts"] = len(kc)
        extra["kernel_contracts"] = [str(f)[:120] for f in kc[:5]] + (
            [f"... +{len(kc) - 5} more (see {side_name})"] if len(kc) > 5 else []
        )
    re_ = extra.get("row_errors")
    if isinstance(re_, list):  # same budget discipline as kernel_contracts
        true_counts["row_errors"] = len(re_)
        extra["row_errors"] = [str(f)[:80] for f in re_[:8]] + (
            [f"... +{len(re_) - 8} more (see {side_name})"] if len(re_) > 8 else []
        )
    line = json.dumps(record)
    if len(line) > 1500:  # last-resort: drop extras until the contract holds
        log(f"WARNING: bench line {len(line)} chars > 1500; trimming extras")
        for key in list(extra.keys())[::-1]:
            if key in ("kernel_contracts", "stats_file", "row_errors"):
                continue
            del extra[key]
            line = json.dumps(record)
            if len(line) <= 1500:
                break
    # The protected failure lists are truncated in RAW chars above, but
    # json.dumps escaping of relay exception text (quotes/backslashes/
    # control bytes) can double their printed width — with both lists maxed
    # this alone can re-blow the budget after every metric is gone (round-5
    # review finding). Collapse them to bounded summaries, worst first.
    for key, label in (("row_errors", "rows failed"),
                       ("kernel_contracts", "checks failed")):
        if len(line) <= 1500:
            break
        if isinstance(extra.get(key), list):
            extra[key] = f"{true_counts[key]} {label} (see {side_name})"
            line = json.dumps(record)
    return line


if __name__ == "__main__":
    main()
