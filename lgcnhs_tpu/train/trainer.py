"""LightGCN / LightGCNOpti training loop.

Re-design of ``model/LightGCN/train.py:62-223`` (and the byte-identical Opti
flavor). Semantics preserved:

- one "epoch" = ONE minibatch step of ``batch_size`` BPR triples sampled with
  replacement from all train edges (``train.py:125-144``) — not a data sweep
- the full-graph forward runs every step (``train.py:26-59``)
- Adam(lr) + exponential decay by ``gamma`` applied every
  ``epoch_per_lr_decay`` epochs, skipping epoch 0 (``train.py:104-105,180-181``):
  lr(e) = lr0 * gamma^max(0, floor((e-1)/decay_every))
- every ``epoch_per_eval`` epochs: val loss computed by FORWARDING ON THE VAL
  ADJACENCY and scoring EVERY val edge exactly once with one rejected
  negative each — structured negative sampling over the full val edge list,
  no minibatch resample (``evaluation.py:68-77``) —, val recommendations
  from LAYER-0 scores with
  train positives masked (``evaluation.py:17-54``), accuracy metrics vs val
  positives and diversity metrics with TRAIN-only degrees/interactions
  (``train.py:147-177``)
- metric history saved to CSV and PNG curves (``train.py:190-221``)

TPU re-design: the whole step (forward + sampling + loss + Adam update) is a
single jitted, donated XLA program — zero host round-trips in steady state;
eval is a second jitted program invoked every ``epoch_per_eval`` steps.
Checkpointing saves params + optimizer state (the reference saves only the
final whole module via torch.save, ``train.py:184``).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lgcnhs_tpu.config import Config
from lgcnhs_tpu.data.graph import (
    InteractionGraph,
    interaction_matrix,
    item_degrees,
    normalized_bipartite,
    pos_bool_matrix,
    user_pos_counts,
    users_present,
)
from lgcnhs_tpu.models.lightgcn import (
    LightGCNParams,
    bpr_loss,
    init_lightgcn,
    init_lightgcn_opti,
    layer0_scores,
    sample_bpr_batch,
    sample_negatives_for_edges,
)
from lgcnhs_tpu.ops.propagation import lightgcn_propagate
from lgcnhs_tpu.ops.topk import masked_topk
from lgcnhs_tpu.ops import metrics_ops
from lgcnhs_tpu.runtime.logging import get_logger, stage_timer


@dataclass
class TrainResult:
    params: LightGCNParams
    history: Dict[str, List[float]] = field(default_factory=dict)


def lr_schedule(lr0: float, gamma: float, decay_every: int):
    """Reference ExponentialLR stepped every ``decay_every`` epochs except
    epoch 0 (``train.py:180-181``)."""

    def schedule(step):
        exponent = jnp.maximum(0, (step - 1) // decay_every)
        # int exponent promotes to the ambient default float (f32; f64 under
        # jax_enable_x64 so the optimizer-trajectory differential is exact)
        return lr0 * jnp.power(gamma, exponent)

    return schedule


def make_optimizer(hp) -> optax.GradientTransformation:
    """The reference's optimizer stack as one optax transform:
    ``torch.optim.Adam(lr)`` + ``ExponentialLR(gamma)`` stepped per the
    epoch rule above (``model/LightGCN/train.py:104-105,180-181``).
    Trajectory pinned against torch's actual Adam+ExponentialLR in
    tests/test_reference_differential.py."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )


def _loss_fn(params, R_hat, users, pos_items, neg_items, epsilon, n_layers,
             bf16_matmul=False, use_pallas=False):
    # With use_pallas (callers set it only when the step runs on TPU), and
    # when the resident state fits VMEM, the dual-product Pallas kernel
    # computes both propagation half-steps per read of R_hat, halving the
    # HBM traffic of the bandwidth-bound forward AND backward
    # (ops/pallas/propagation.py). The kernel dispatches on the bf16 SPEED
    # path only: at f32 the MXU must run HIGHEST (the parity precision
    # rule), where the measured full train step is FASTER through XLA
    # (2.52 vs 3.25 ms at ML-1M scale — the kernel's round-3 f32 win was
    # an artifact of its matmuls silently truncating to bf16, caught by
    # tests/tpu_smoke.py). R_hat may instead be the factored triple
    # (R int8, du^-1/2, di^-1/2) from data/graph.binary_incidence_factors:
    # the streamed incidence is then 1 byte/entry (half of bf16) with exact
    # 0/1 values.
    D = params.user_emb.shape[1]
    from lgcnhs_tpu.ops.pallas.propagation import (
        fits_vmem,
        fits_vmem_binary,
        lightgcn_propagate_pallas,
        lightgcn_propagate_pallas_binary,
    )

    if isinstance(R_hat, tuple):
        R8, du_inv, di_inv = R_hat
        U, I = R8.shape
        if use_pallas and bf16_matmul and fits_vmem_binary(U, I, D, True):
            u_final, i_final = lightgcn_propagate_pallas_binary(
                params.user_emb, params.item_emb, R8, du_inv, di_inv,
                n_layers, True,
            )
        else:  # correctness fallback; callers pick the tuple only on TPU
            dense = du_inv[:, None] * R8.astype(du_inv.dtype) * di_inv[None, :]
            u_final, i_final = lightgcn_propagate(
                params.user_emb, params.item_emb, dense, n_layers, bf16_matmul
            )
    elif use_pallas and bf16_matmul and fits_vmem(*R_hat.shape, D, True):
        u_final, i_final = lightgcn_propagate_pallas(
            params.user_emb, params.item_emb, R_hat, n_layers, True
        )
    else:
        u_final, i_final = lightgcn_propagate(
            params.user_emb, params.item_emb, R_hat, n_layers, bf16_matmul
        )
    return bpr_loss(
        u_final[users],
        params.user_emb[users],
        i_final[pos_items],
        params.item_emb[pos_items],
        i_final[neg_items],
        params.item_emb[neg_items],
        epsilon,
    )


#: HBM budget for a dense (U, I) incidence / f32 eval-array set; the same
#: 4 GB bound choose_diffusion mirrors. Tests shrink it to pin dispatch.
DENSIFY_BUDGET_BYTES = 4e9
#: above this f32-incidence size the bf16-dense rung builds R_hat on device
#: from the int8 pattern instead of a host normalized_bipartite (which would
#: materialize (U, I) f64/f32 host intermediates).
HOST_INCIDENCE_BUILD_BYTES = 2e9


def choose_propagation(n_users: int, n_items: int, n_edges: int, compute,
                       single_chip: Optional[bool] = None) -> str:
    """"dense" vs "coo" forward path. Dense (MXU matmul on the full R_hat)
    wins whenever the incidence fits — the MXU eats the zeros for free at
    recsys densities. COO (bucketed gather) is the memory-scalable path:
    chosen when the dense incidence would exceed ~4 GB or the graph is
    extremely sparse (density below ``compute.dense_threshold``).

    The incidence is stored at 2 bytes/entry under mixed precision
    (``compute.dtype == "bfloat16"``), so the dense regime reaches 2x the
    catalog area there — measured on-chip at 50k x 30k / 2M edges (v5e):
    dense-bf16 fwd+bwd 54 ms/step vs 71 ms for the (exact-f32) bucketed
    layout, while the f32 dense incidence (6 GB) wouldn't fit the budget
    at all (docs/PERF.md, COO roofline section).

    The 2x bf16 expansion applies SINGLE-CHIP only: the mesh-dense branch
    builds its sharded training/eval arrays host-side at f32/f64 width
    (``shard_train_inputs`` + padded eval matrices) without the rung's
    device-build/CSR-eval treatment, so a mesh run in the expanded band
    would die in host allocation before sharding anything — with a mesh the
    f32 budget stands and that band takes the edge-sharded COO path
    (round-4 review finding). ``single_chip`` lets callers that have
    RESOLVED the mesh pass the truth (mesh_shape=(0,0) "auto" on a
    one-device host resolves to no mesh and is single-chip); default is
    the mesh_shape==(1,1) proxy."""
    if single_chip is None:
        single_chip = tuple(getattr(compute, "mesh_shape", (1, 1))) == (1, 1)
    entry_bytes = (
        2.0 if getattr(compute, "dtype", "") == "bfloat16" and single_chip else 4.0
    )
    dense_bytes = entry_bytes * n_users * n_items
    density = n_edges / max(1.0, float(n_users) * n_items)
    if dense_bytes > DENSIFY_BUDGET_BYTES or density < compute.dense_threshold:
        return "coo"
    return "dense"


def _make_coo_step_parts(optimizer, hp, n_items: int, neg_hi: Optional[int] = None):
    """Shared body of the COO step: (loss over the bucketed incidence,
    one-step update). Propagation runs on the scatter-free degree-bucketed
    ELL layout with the self-adjoint custom-VJP pair
    (``ops/propagation.lightgcn_propagate_bucketed``) — TPU profiling showed
    segment_sum's scatter-add is the path's bottleneck (22 ms sorted /
    35 ms unsorted vs 6.5 ms for the same-volume gather at E=2M), so both
    forward and backward run on gathers + dense reductions only. The
    sampler keeps the ORIGINAL edge order so the triple stream stays
    bit-identical to the dense sampler's."""
    from lgcnhs_tpu.ops.propagation import lightgcn_propagate_bucketed
    from lgcnhs_tpu.ops.scalable import sample_bpr_batch_csr

    def _loss(params, binc, users, pos_items, neg_items):
        u_final, i_final = lightgcn_propagate_bucketed(
            params.user_emb, params.item_emb, binc, hp.layers,
        )
        return bpr_loss(
            u_final[users], params.user_emb[users],
            i_final[pos_items], params.item_emb[pos_items],
            i_final[neg_items], params.item_emb[neg_items],
            hp.epsilon,
        )

    def step(params, opt_state, key, binc, edge_users, edge_items, rowptr, cols):
        users, pos_items, neg_items = sample_bpr_batch_csr(
            key, edge_users, edge_items, rowptr, cols, hp.batch_size,
            neg_hi if neg_hi is not None else n_items,
        )
        loss, grads = jax.value_and_grad(_loss)(
            params, binc, users, pos_items, neg_items
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_coo_train_step(optimizer, hp, n_users: int, n_items: int,
                        neg_hi: Optional[int] = None):
    """Large-graph flavor of the train step for graphs too large/sparse to
    densify (same math as ``ops/propagation.lightgcn_propagate_coo``; runs
    on the bucketed layout, ``build_bucketed_incidence``). Negative-sampling
    rejection runs against the user-major CSR edge list
    (``ops/scalable.sample_bpr_batch_csr``) — no (U, I) pos_mask anywhere,
    same triple stream as the dense sampler. ``neg_hi`` overrides the
    negative-candidate upper bound (``hparams.neg_range='reference'``)."""
    step = _make_coo_step_parts(optimizer, hp, n_items, neg_hi)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, key, binc, edge_users, edge_items,
                   rowptr, cols):
        return step(params, opt_state, key, binc, edge_users, edge_items,
                    rowptr, cols)

    return train_step


def make_coo_train_scan(optimizer, hp, n_users: int, n_items: int,
                        neg_hi: Optional[int] = None):
    """Scan-chunked flavor of ``make_coo_train_step`` — same fold_in key
    stream as the per-step path (see ``make_train_scan``); amortizes dispatch
    for the large-graph path exactly like the dense one."""
    step = _make_coo_step_parts(optimizer, hp, n_items, neg_hi)

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("n_steps",))
    def train_scan(params, opt_state, base_key, epoch0, n_steps,
                   binc, edge_users, edge_items, rowptr, cols):
        def body(carry, epoch):
            params, opt_state = carry
            key = jax.random.fold_in(base_key, epoch)
            params, opt_state, loss = step(
                params, opt_state, key, binc, edge_users, edge_items,
                rowptr, cols,
            )
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), epoch0 + jnp.arange(n_steps)
        )
        return params, opt_state, losses[-1]

    return train_scan


def make_train_step(optimizer, hp, n_items: int, bf16_matmul: bool = False,
                    use_pallas: bool = False, neg_hi: Optional[int] = None,
                    csr_sampler: bool = False):
    """One jitted epoch: sample -> forward -> BPR -> Adam update. ``neg_hi``
    overrides the negative-candidate upper bound (defaults to ``n_items``;
    ``hparams.neg_range='reference'`` passes the split-bounded range).
    ``csr_sampler=True`` swaps the dense (U, I) ``pos_mask`` rejection for
    the CSR flavor (bit-identical triple stream, ``tests/test_scalable.py``)
    — the step then takes ``(..., rowptr, cols)`` instead of
    ``(..., pos_mask)``; the bf16-dense rung uses it so NOTHING in that
    branch is O(U*I) beyond the bf16 incidence itself."""
    _hi = neg_hi if neg_hi is not None else n_items

    def _update(params, opt_state, users, pos_items, neg_items, R_hat):
        loss, grads = jax.value_and_grad(_loss_fn)(
            params, R_hat, users, pos_items, neg_items, hp.epsilon, hp.layers,
            bf16_matmul, use_pallas,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    if csr_sampler:
        from lgcnhs_tpu.ops.scalable import sample_bpr_batch_csr

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step_csr(params, opt_state, key, R_hat, edge_users,
                           edge_items, rowptr, cols):
            users, pos_items, neg_items = sample_bpr_batch_csr(
                key, edge_users, edge_items, rowptr, cols, hp.batch_size, _hi
            )
            return _update(params, opt_state, users, pos_items, neg_items, R_hat)

        return train_step_csr

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, key, R_hat, edge_users, edge_items, pos_mask):
        users, pos_items, neg_items = sample_bpr_batch(
            key, edge_users, edge_items, pos_mask, hp.batch_size, _hi
        )
        return _update(params, opt_state, users, pos_items, neg_items, R_hat)

    return train_step


def make_train_scan(optimizer, hp, n_items: int, bf16_matmul: bool = False,
                    use_pallas: bool = False, neg_hi: Optional[int] = None,
                    csr_sampler: bool = False):
    """Multi-epoch train step: ``n_steps`` reference epochs (each = ONE
    minibatch step, ``model/LightGCN/train.py:125``) in a single jitted
    ``lax.scan``, amortizing the per-dispatch host/runtime overhead that
    dominates small steps. Per-epoch RNG keys are derived inside by the same
    ``fold_in(base_key, epoch)`` rule the per-step path uses, so the sample
    stream (and therefore training) is IDENTICAL to calling
    ``make_train_step`` once per epoch. ``csr_sampler`` as in
    ``make_train_step`` (trailing args become ``rowptr, cols``)."""
    step_once = make_train_step(
        optimizer, hp, n_items, bf16_matmul=bf16_matmul, use_pallas=use_pallas,
        neg_hi=neg_hi, csr_sampler=csr_sampler,
    )

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("n_steps",))
    def train_scan(params, opt_state, base_key, epoch0, n_steps, *step_rest):
        def body(carry, epoch):
            params, opt_state = carry
            step_key = jax.random.fold_in(base_key, epoch)
            params, opt_state, loss = step_once.__wrapped__(
                params, opt_state, step_key, *step_rest
            )
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), epoch0 + jnp.arange(n_steps)
        )
        return params, opt_state, losses[-1]

    return train_scan


@partial(jax.jit, static_argnames=("n_layers",))
def val_loss_fn(params, R_hat_val, users, pos_items, neg_items, epsilon, n_layers):
    """Reference ``calValLoss``: forward on the VAL adjacency, BPR over all
    val edges (``model/LightGCN/evaluation.py:56-86``)."""
    return _loss_fn(params, R_hat_val, users, pos_items, neg_items, epsilon, n_layers)


@partial(jax.jit, static_argnames=("k", "n_items"))
def _val_eval(params, train_pos, val_pos, val_counts, val_present, train_interaction, train_deg, k, n_items):
    """Val recommendations (layer-0 scores, train-masked) + all 6 metrics in
    one device program."""
    scores = layer0_scores(params)
    rec = masked_topk(scores, train_pos, k)
    p, r = metrics_ops.precision_recall(rec, val_pos, val_counts, val_present)
    n = metrics_ops.ndcg_at_k(rec, val_pos, val_present)
    h = metrics_ops.hamming_distance(rec, n_items)
    i = metrics_ops.internal_similarity(rec, train_interaction, train_deg)
    return rec, p, r, n, h, i


def train_lightgcn(
    graph: InteractionGraph,
    cfg: Config,
    user_features: Optional[np.ndarray] = None,
    item_features: Optional[np.ndarray] = None,
    save_artifacts: bool = True,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
) -> TrainResult:
    """Train LightGCN (or LightGCNOpti when features are given).

    Returns final params + the per-eval metric history the reference logs
    and plots (``train.py:107-177``). With ``checkpoint_dir`` set, the full
    (params, optimizer) state is orbax-checkpointed every
    ``checkpoint_every`` epochs and training resumes from the latest
    checkpoint — mid-train resume the reference lacks (SURVEY.md section 5.4).
    """
    hp = cfg.hparams
    log = get_logger()
    U, I = graph.n_users, graph.n_items
    # "bfloat16" selects mixed precision: params/optimizer stay f32 (Adam
    # moments need it), only the propagation matmul inputs are cast to bf16.
    dtype = jnp.float32 if cfg.compute.dtype == "bfloat16" else jnp.dtype(cfg.compute.dtype)

    key = jax.random.PRNGKey(hp.seed)
    key, init_key = jax.random.split(key)
    if user_features is not None and item_features is not None:
        params = init_lightgcn_opti(
            init_key,
            jnp.asarray(user_features, dtype),
            jnp.asarray(item_features, dtype),
            hp.embedding_dim,
            dtype,
        )
        model_name = "LightGCNOpti"
    else:
        params = init_lightgcn(init_key, U, I, hp.embedding_dim, dtype)
        model_name = "LightGCN"

    _bf16 = cfg.compute.dtype == "bfloat16"
    _pallas = cfg.compute.use_pallas and jax.default_backend() == "tpu"

    # ---- multi-chip flagship path (ComputeConfig.mesh_shape) ----
    # The reference trains on one hardcoded device (model/LightGCN/train.py:87).
    # With a mesh configured, THIS function (not a side harness) runs the
    # sharded step/scan over row-sharded tables, the distributed top-k eval,
    # and sharded optimizer state.
    mesh = None
    if tuple(cfg.compute.mesh_shape) != (1, 1):
        from lgcnhs_tpu.runtime.mesh import mesh_from_config

        mesh = mesh_from_config(cfg.compute)

    # propagation is chosen AFTER mesh resolution: the bf16 densify
    # expansion is single-chip only, and "single chip" is whether a mesh
    # actually resolved — mesh_shape=(0,0) ("auto") on a one-device host
    # resolves to None and must keep the bf16-dense rung (round-4 review
    # finding; the (1,1)-proxy default stands for callers without a
    # resolved mesh).
    propagation = choose_propagation(
        U, I, graph.train.n_edges, cfg.compute, single_chip=mesh is None
    )
    # coo_table_sharding only changes behavior on the mesh x COO path;
    # surface misconfigurations instead of silently training with tables
    # laid out differently than the operator planned capacity around
    # (round-5 review finding).
    if cfg.compute.coo_table_sharding:
        if mesh is None:
            raise ValueError(
                "compute.coo_table_sharding requires a resolved mesh "
                "(--mesh); without one, tables are single-device anyway"
            )
        if propagation != "coo":
            log.warning(
                "coo_table_sharding requested but the graph takes the %s "
                "path; tables are row-sharded by the dense mesh plan "
                "already — the flag has no additional effect", propagation,
            )
    if mesh is not None:
        # dense graphs shard the (U, I) incidence and the tables; COO
        # graphs shard the edge list with psummed partial segment-sums
        # (parallel.sharding.make_sharded_coo_train_step) — mesh and
        # large-graph compose (VERDICT r2 item 3).
        log.info(
            "training %s on mesh %s (%s propagation)", model_name,
            dict(zip(mesh.axis_names, mesh.devices.shape)), propagation,
        )

    optimizer = make_optimizer(hp)

    # LightGCN-side edge lists are DEDUPED: the reference round-trips every
    # split through a dense 0/1 adjacency (utils/graph.py:23-25,
    # R[u][i] = 1) before gcn_norm, BPR edge sampling, and calValLoss, so
    # duplicated (user, item) rating rows collapse there — while the
    # metric/diversity side keeps dataframe row counts (item_degrees /
    # user_pos_counts below stay on the RAW splits). First-occurrence order
    # makes this a no-op on duplicate-free data (data/graph.unique_edges).
    from lgcnhs_tpu.data.graph import unique_edges

    train_es = unique_edges(graph.train)
    val_es = unique_edges(graph.val)

    # eval-side tensors shared by every path (true, unpadded shapes)
    val_edge_users = jnp.asarray(val_es.users)
    val_edge_items = jnp.asarray(val_es.items)
    val_counts = jnp.asarray(user_pos_counts(U, graph.val))
    val_present = jnp.asarray(users_present(U, graph.val))
    train_deg = jnp.asarray(item_degrees(I, graph.train))

    # Negative-candidate upper bound per split. "reference" reproduces
    # torch-geometric's structured_negative_sampling range quirk
    # (model/LightGCN/loss.py:58, evaluation.py:71-72; docs/PARITY.md
    # "Known deviations" #6): candidates bounded by the max user-OR-item id
    # present in that split's edge matrix, not by the catalog size — items
    # beyond the split's max id can never be drawn as negatives. The
    # reference itself indexes items_emb with those candidates, so where its
    # range exceeds n_items (max user id > max item id, e.g. ML-1M's
    # 6040 > 3706) it would crash with a torch IndexError; fail fast with
    # the explanation instead.
    if hp.neg_range == "reference":

        def _split_neg_hi(es, split_name: str) -> int:
            hi = 1 + int(
                max(
                    np.asarray(es.users).max(initial=-1),
                    np.asarray(es.items).max(initial=-1),
                )
            )
            if hi > I:
                raise ValueError(
                    f"neg_range='reference': the {split_name} split's max "
                    f"node id {hi - 1} >= n_items={I}; the reference's own "
                    "sampler would index items_emb out of range here "
                    "(structured_negative_sampling bounds candidates by the "
                    "max USER-or-item id). Use neg_range='catalog'."
                )
            return hi

        neg_hi_train = _split_neg_hi(graph.train, "train")
        neg_hi_val = _split_neg_hi(graph.val, "val")
    elif hp.neg_range == "catalog":
        neg_hi_train = neg_hi_val = I
    else:
        raise ValueError(
            f"unknown hparams.neg_range {hp.neg_range!r} "
            "(expected 'catalog' or 'reference')"
        )
    # calValLoss passes contains_neg_self_loops=False (evaluation.py:71):
    # val candidates whose item id equals the edge's USER id are rejected.
    # Part of the same opt-in quirk family; the train-side sampleMiniBatch
    # uses the default (no such rejection).
    _val_reject_uid = hp.neg_range == "reference"

    def _dense_val_loss_closure(R_hat_val, val_pos):
        """Shared val-loss closure for the dense-propagation branches
        (single-chip and mesh — one definition so the calValLoss
        semantics cannot drift between them): every val edge exactly
        once, one rejected negative each (evaluation.py:68-77) — NOT a
        bootstrap resample."""

        def val_loss_closure(params, vkey):
            v_users, v_pos, v_neg = sample_negatives_for_edges(
                vkey, val_edge_users, val_edge_items, val_pos, neg_hi_val,
                reject_user_ids=_val_reject_uid,
            )
            return val_loss_fn(
                params, R_hat_val, v_users, v_pos, v_neg, hp.epsilon,
                hp.layers,
            )

        return val_loss_closure

    if mesh is not None and propagation == "dense":
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lgcnhs_tpu.parallel.sharding import (
            distributed_masked_topk,
            make_plan,
            make_sharded_train_scan,
            make_sharded_train_step,
            padded_catalog,
            shard_params,
            shard_train_inputs,
            unpad_params,
        )
        from lgcnhs_tpu.runtime.mesh import MODEL_AXIS

        plan = make_plan(mesh)
        U_pad, I_pad = padded_catalog(plan, U, I)
        # training tensors: incidence/positives item-sharded (padded), edges
        # replicated at true length (exact single-device sample stream)
        # incidences built at the configured dtype (f64 parity under a mesh
        # must match the single-device f64 path exactly)
        R_hat, train_pos, edge_users, edge_items = shard_train_inputs(
            plan,
            normalized_bipartite(U, I, graph.train, dtype=dtype),
            pos_bool_matrix(U, I, graph.train),
            train_es.users,
            train_es.items,
            r_dtype=jnp.bfloat16 if _bf16 else dtype,
        )
        params = shard_params(plan, params)
        opt_state = optimizer.init(params)  # sharded like the tables

        item_cols = NamedSharding(mesh, P(None, MODEL_AXIS))
        R_val_np = np.zeros((U_pad, I_pad), dtype)
        R_val_np[:U, :I] = normalized_bipartite(U, I, graph.val, dtype=dtype)
        R_hat_val = jax.device_put(jnp.asarray(R_val_np, dtype), item_cols)
        # eval matrices item-padded to I_pad columns (False/0 padding is
        # inert: rec ids are always < I because padded columns enter the
        # distributed top-k as seen=True)
        val_pos_np = np.zeros((U, I_pad), bool)
        val_pos_np[:, :I] = pos_bool_matrix(U, I, graph.val)
        val_pos = jax.device_put(jnp.asarray(val_pos_np), item_cols)
        ti_np = np.zeros((U, I_pad), np.float32)
        ti_np[:, :I] = interaction_matrix(U, I, graph.train)
        train_interaction = jax.device_put(jnp.asarray(ti_np), item_cols)
        train_deg_pad = jnp.asarray(
            np.pad(np.asarray(item_degrees(I, graph.train)), (0, I_pad - I))
        )

        train_step = make_sharded_train_step(
            plan, optimizer, hp, I, bf16_matmul=_bf16, neg_hi=neg_hi_train
        )
        train_scan = make_sharded_train_scan(
            plan, optimizer, hp, I, bf16_matmul=_bf16, neg_hi=neg_hi_train
        )
        step_args = lambda: (R_hat, edge_users, edge_items, train_pos)

        scores_fn = jax.jit(
            lambda p: jnp.dot(
                p.user_emb,
                p.item_emb.T,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=p.user_emb.dtype,
            ),
            out_shardings=item_cols,
        )

        def eval_fn(params):
            # layer-0 scores stay item-sharded; recommendations via the
            # explicit two-phase distributed top-k (padded ids unreachable:
            # padded columns carry seen=True); the metric kernels consume the
            # item-sharded eval arrays under GSPMD
            rec = distributed_masked_topk(mesh, scores_fn(params), train_pos, cfg.k)[:U]
            p, r = metrics_ops.precision_recall(rec, val_pos, val_counts, val_present)
            n = metrics_ops.ndcg_at_k(rec, val_pos, val_present)
            h = metrics_ops.hamming_distance(rec, I)
            i = metrics_ops.internal_similarity(rec, train_interaction, train_deg_pad)
            return p, r, n, h, i

        def finalize(params):
            return unpad_params(params, U, I)

        val_loss_closure = _dense_val_loss_closure(R_hat_val, val_pos)

    elif propagation == "dense":
        from lgcnhs_tpu.data.graph import binary_incidence_factors
        from lgcnhs_tpu.ops.pallas.propagation import fits_vmem_binary

        if _pallas and _bf16 and fits_vmem_binary(U, I, hp.embedding_dim, True):
            # factored int8 incidence: the streamed operand of the bandwidth-
            # bound propagation is 1 byte/entry (vs 2 bf16 / 4 f32), values
            # exact (see lightgcn_propagate_pallas_binary). Speed (bf16)
            # path only — the f32 parity path always takes the XLA HIGHEST
            # propagation (faster than any HIGHEST Pallas flavor; see
            # _loss_fn)
            R8, du_inv, di_inv = binary_incidence_factors(U, I, graph.train)
            R_hat = (jnp.asarray(R8), jnp.asarray(du_inv), jnp.asarray(di_inv))
        elif _bf16 and 4.0 * U * I > HOST_INCIDENCE_BUILD_BYTES:
            # the dtype-aware dense regime's BIG half (f32 incidence over
            # ~2 GB, bf16 under the densify budget): build the bf16
            # incidence ON DEVICE from the int8 pattern (data/graph.
            # device_bf16_incidence) — normalized_bipartite would
            # materialize (U, I) f64/f32 host intermediates (12 GB at the
            # 50k x 30k rung docs/PERF.md measures at 20.3k examples/s)
            from lgcnhs_tpu.data.graph import device_bf16_incidence

            R_hat = device_bf16_incidence(U, I, graph.train)
        else:
            # In the mixed-precision path the matmul input R_hat is cast ONCE
            # here, not inside the jitted step (45 MB -> 22 MB copy per step
            # at ML-1M scale); the propagate functions' .astype is a no-op.
            # normalized_bipartite computes in f64 internally; requesting the
            # configured dtype directly keeps the float64 parity path exact.
            r_dtype = jnp.bfloat16 if _bf16 else dtype
            R_hat = jnp.asarray(
                normalized_bipartite(U, I, graph.train, dtype=dtype), r_dtype
            )
    else:
        log.info(
            "graph too large/sparse to densify: COO propagation "
            "(scatter-free bucketed aggregation)"
        )

    if mesh is None or propagation == "coo":
        edge_users = jnp.asarray(train_es.users)
        edge_items = jnp.asarray(train_es.items)
        if mesh is not None:
            # COO + mesh: edge blocks sharded below. Tables/optimizer are
            # replicated by default (chip-sized in the regime where U*I
            # explodes); compute.coo_table_sharding row-shards them instead
            # for the regime where the TABLES outgrow a chip too (SURVEY
            # 2.9's all-to-all lookup exchange; VERDICT r4 #4).
            from lgcnhs_tpu.parallel.sharding import make_plan

            plan = make_plan(mesh)
            if cfg.compute.coo_table_sharding:
                from lgcnhs_tpu.parallel.sharding import (
                    shard_params,
                    unpad_params,
                )

                params = shard_params(plan, params)
            else:
                params = jax.device_put(params, plan.replicated)
        opt_state = optimizer.init(params)

        if mesh is not None and cfg.compute.coo_table_sharding:
            def finalize(params):
                return unpad_params(params, U, I)
        else:
            def finalize(params):
                return LightGCNParams(*jax.tree.map(jax.device_get, params))

        # Eval layout is chosen SEPARATELY from train propagation: the
        # bf16-dense rung trains on a 2-byte incidence at catalogs whose
        # f32 (U, I) eval arrays (val adjacency, interaction, masks) would
        # not fit — those evals run on the CSR machinery instead.
        eval_dense = 4.0 * U * I <= DENSIFY_BUDGET_BYTES
        if propagation == "dense" and eval_dense:
            R_hat_val = jnp.asarray(
                normalized_bipartite(U, I, graph.val, dtype=dtype), dtype
            )
            train_pos = jnp.asarray(pos_bool_matrix(U, I, graph.train))
            val_pos = jnp.asarray(pos_bool_matrix(U, I, graph.val))
            train_interaction = jnp.asarray(interaction_matrix(U, I, graph.train))

            def eval_fn(params):
                _, p, r, n, h, i = _val_eval(
                    params, train_pos, val_pos, val_counts, val_present,
                    train_interaction, train_deg, cfg.k, I,
                )
                return p, r, n, h, i

            val_loss_closure = _dense_val_loss_closure(R_hat_val, val_pos)

            train_step = make_train_step(
                optimizer, hp, I, bf16_matmul=_bf16, use_pallas=_pallas,
                neg_hi=neg_hi_train,
            )
            train_scan = make_train_scan(
                optimizer, hp, I, bf16_matmul=_bf16, use_pallas=_pallas,
                neg_hi=neg_hi_train,
            )
            step_args = lambda: (R_hat, edge_users, edge_items, train_pos)
        else:
            # large-graph path: NOTHING here is O(U*I). Training rejection,
            # eval masking, hit matrices, and the Sorensen metric all run
            # against CSR edge structures (ops/scalable.py); retrieval is
            # chunked over users.
            from lgcnhs_tpu.ops import scalable
            from lgcnhs_tpu.ops.propagation import (
                edge_gcn_norm,
                lightgcn_propagate_coo,
            )

            if propagation != "dense":
                # consumed only by the COO train layouts below; skip the
                # device bincount programs on the bf16-dense rung. The
                # deduped edge list makes the per-edge degrees BINARY —
                # the same graph the dense normalized_bipartite encodes
                # and the reference's adjacency round-trip produces.
                edge_norm = edge_gcn_norm(edge_users, edge_items, U, I)
            rowptr_np, cols_np = scalable.user_csr(U, train_es)
            rowptr, cols = jnp.asarray(rowptr_np), jnp.asarray(cols_np)
            v_rowptr_np, v_cols_np = scalable.user_csr(U, val_es)
            v_rowptr, v_cols = jnp.asarray(v_rowptr_np), jnp.asarray(v_cols_np)
            val_edge_norm = edge_gcn_norm(val_edge_users, val_edge_items, U, I)
            inter_edges = (
                np.asarray(graph.train.users), np.asarray(graph.train.items)
            )
            train_deg_np = np.asarray(item_degrees(I, graph.train))

            @partial(jax.jit, static_argnames=("n_layers",))
            def _coo_val_loss(params, users, pos_items, neg_items, n_layers):
                # segment counts from the table shapes, not (U, I): under
                # coo_table_sharding the tables carry padded catalog axes
                u_final, i_final = lightgcn_propagate_coo(
                    params.user_emb, params.item_emb,
                    val_edge_users, val_edge_items, val_edge_norm,
                    params.user_emb.shape[0], params.item_emb.shape[0],
                    n_layers,
                )
                return bpr_loss(
                    u_final[users], params.user_emb[users],
                    i_final[pos_items], params.item_emb[pos_items],
                    i_final[neg_items], params.item_emb[neg_items],
                    hp.epsilon,
                )

            def val_loss_closure(params, vkey):
                # every val edge exactly once (calValLoss, evaluation.py:68-77)
                v_users, v_pos, v_neg = scalable.sample_negatives_for_edges_csr(
                    vkey, val_edge_users, val_edge_items, v_rowptr, v_cols,
                    neg_hi_val, reject_user_ids=_val_reject_uid,
                )
                return _coo_val_loss(params, v_users, v_pos, v_neg, hp.layers)

            @jax.jit
            def _hit_metrics(rec, hits):
                p, r = metrics_ops.precision_recall_from_hits(
                    hits, val_counts, val_present
                )
                n = metrics_ops.ndcg_from_hits(hits, val_present)
                h = metrics_ops.hamming_distance(rec, I)
                return p, r, n, h

            if mesh is not None:
                # user-sharded retrieval: each device scores U/n_dev users
                # vs the full table, no (U, I) global block; the sharded CSR
                # scatter arrays are staged once, not per eval
                from lgcnhs_tpu.parallel.sharding import (
                    make_distributed_csr_masked_topk,
                )

                csr_topk = make_distributed_csr_masked_topk(
                    mesh, rowptr_np, cols_np, U
                )

            def eval_fn(params):
                if mesh is not None:
                    # [:U]/[:I] strip the coo_table_sharding catalog padding
                    # (no-op otherwise): padded zero rows must not reach the
                    # retrieval scores
                    rec = csr_topk(
                        np.asarray(params.user_emb)[:U],
                        np.asarray(params.item_emb)[:I],
                        cfg.k,
                    )
                else:
                    rec = scalable.chunked_masked_topk(
                        params.user_emb, params.item_emb, rowptr_np, cols_np, cfg.k
                    )
                rec_j = jnp.asarray(rec)
                hits = scalable.hits_csr(rec_j, v_rowptr, v_cols)
                p, r, n, h = _hit_metrics(rec_j, hits)
                i = scalable.internal_similarity_csr(
                    rec, inter_edges, U, I, train_deg_np
                )
                return p, r, n, h, i

            if propagation == "dense":
                # the bf16-dense rung: dense (2-byte) TRAIN step with the
                # CSR eval above — measured 20.3k examples/s at 50k x 30k
                # (docs/PERF.md, "bf16-dense middle rung"). Negative
                # rejection runs on the CSR structures already in scope
                # (bit-identical triple stream) — a dense (U, I) pos_mask
                # here would be 1.5 GB of host+device bool at the rung's
                # own scale, in the branch that promises nothing O(U*I)
                # beyond the bf16 incidence (round-4 review finding).
                train_step = make_train_step(
                    optimizer, hp, I, bf16_matmul=_bf16, use_pallas=_pallas,
                    neg_hi=neg_hi_train, csr_sampler=True,
                )
                train_scan = make_train_scan(
                    optimizer, hp, I, bf16_matmul=_bf16, use_pallas=_pallas,
                    neg_hi=neg_hi_train, csr_sampler=True,
                )
                step_args = lambda: (R_hat, edge_users, edge_items, rowptr, cols)
            elif mesh is not None:
                # edge-sharded mesh x large-graph step on the scatter-free
                # bucketed-ELL layout — the same aggregation the single-chip
                # COO path ships (3.6x over segment-sum on-chip), psummed
                # over the flattened mesh (VERDICT r4 #3)
                from lgcnhs_tpu.parallel.sharding import (
                    make_sharded_coo_train_scan,
                    make_sharded_coo_train_step,
                    make_table_sharded_coo_train_scan,
                    make_table_sharded_coo_train_step,
                    padded_catalog,
                    shard_bucketed_incidence,
                )

                if cfg.compute.coo_table_sharding:
                    # tables row-sharded (padded): the incidence aggregates
                    # into padded outputs so propagation shapes line up
                    U_se, I_se = padded_catalog(plan, U, I)
                    make_step = make_table_sharded_coo_train_step
                    make_scan = make_table_sharded_coo_train_scan
                else:
                    U_se, I_se = U, I
                    make_step = make_sharded_coo_train_step
                    make_scan = make_sharded_coo_train_scan
                se = shard_bucketed_incidence(
                    plan, train_es.users, train_es.items,
                    np.asarray(edge_norm), U_se, I_se,
                )
                train_step = make_step(
                    plan, optimizer, hp, U, I, neg_hi=neg_hi_train
                )
                train_scan = make_scan(
                    plan, optimizer, hp, U, I, neg_hi=neg_hi_train
                )
                step_args = lambda: (edge_users, edge_items, rowptr, cols, se)
            else:
                from lgcnhs_tpu.ops.propagation import build_bucketed_incidence

                binc = build_bucketed_incidence(
                    train_es.users, train_es.items, np.asarray(edge_norm),
                    U, I,
                )
                train_step = make_coo_train_step(
                    optimizer, hp, U, I, neg_hi=neg_hi_train
                )
                train_scan = make_coo_train_scan(
                    optimizer, hp, U, I, neg_hi=neg_hi_train
                )
                step_args = lambda: (binc, edge_users, edge_items, rowptr, cols)

    if not cfg.compute.donate_state:
        # compute.donate_state=False keeps the pre-step params/opt buffers
        # alive (e.g. a driver diffing params across a step). Every step/scan
        # factory donates (0, 1) for the in-place update, so re-jit the
        # un-jitted bodies without donation — previously this knob was
        # advertised (config.py, MIGRATION.md) but never read (round-5
        # review finding).
        train_step = jax.jit(train_step.__wrapped__)
        if train_scan is not None:
            train_scan = jax.jit(
                train_scan.__wrapped__, static_argnames=("n_steps",)
            )

    start_epoch = 0
    if checkpoint_dir:
        from lgcnhs_tpu.train.checkpoint import restore_train_state

        template_params, template_opt = params, opt_state
        restored = restore_train_state(checkpoint_dir, params, opt_state)
        if restored is not None:
            start_epoch, params, opt_state = restored
            params = LightGCNParams(*params)
            if mesh is not None:
                # orbax restores every leaf COMMITTED to one device; under a
                # mesh the jitted step needs mesh placements (row-sharded
                # tables for dense, replicated for edge-sharded COO). Re-pin
                # each restored leaf to its template's mesh sharding; leaves
                # whose template is not mesh-placed (e.g. Adam's scalar
                # count, which optimizer.init leaves uncommitted on one
                # device) become mesh-replicated. Exposed by
                # test_resume_sharded_dense_path (round-3 verdict item 6).
                from jax.sharding import NamedSharding, PartitionSpec

                def repin(tpl, arr):
                    s = getattr(tpl, "sharding", None)
                    if not (
                        isinstance(s, NamedSharding)
                        and s.mesh.devices.size == mesh.devices.size
                    ):
                        s = NamedSharding(
                            mesh, PartitionSpec(*(None,) * getattr(tpl, "ndim", 0))
                        )
                    return jax.device_put(arr, s)

                params = jax.tree.map(repin, template_params, params)
                opt_state = jax.tree.map(repin, template_opt, opt_state)
            start_epoch += 1
            log.info("resumed from checkpoint at epoch %d", start_epoch - 1)

    history: Dict[str, List[float]] = {
        name: []
        for name in (
            "iters",
            "train_loss",
            "val_loss",
            "val_precision",
            "val_recall",
            "val_f1",
            "val_ndcg",
            "val_H",
            "val_I",
        )
    }
    if start_epoch > 0 and save_artifacts:
        # resume: re-seed the metric history from the previous run's CSV so
        # _save_history extends the reference's whole-run curves/table
        # instead of clobbering them with only post-resume rows (round-5
        # review finding). Rows at/after the resume epoch are re-computed
        # by this run and dropped here.
        csv_path = os.path.join(
            cfg.pictures_path, f"{model_name}_{cfg.k}_val_metrics.csv"
        )
        if os.path.exists(csv_path):
            try:
                import pandas as pd

                prior = pd.read_csv(csv_path)
                keep = prior[prior["iters"] < start_epoch]
                for name in history:
                    if name in keep.columns:
                        history[name] = [float(v) for v in keep[name]]
                log.info(
                    "resume: carried %d prior metric rows from %s",
                    len(keep), csv_path,
                )
            except Exception as exc:  # a corrupt CSV must not kill training
                log.warning("resume: could not carry prior history: %s", exc)

    def _is_boundary(e: int) -> bool:
        """Epochs after which host-side work happens (eval / checkpoint)."""
        if e % hp.epoch_per_eval == 0:
            return True
        return bool(checkpoint_dir and checkpoint_every and e and e % checkpoint_every == 0)

    with stage_timer(f"{model_name} training done ({hp.epochs} epochs)", log):
        epoch = start_epoch
        while epoch < hp.epochs:
            # run every epoch up to the next eval/checkpoint boundary as ONE
            # jitted lax.scan chunk (identical per-epoch fold_in key stream;
            # see make_train_scan) — per-step dispatch only when chunk == 1
            b = epoch
            while b < hp.epochs - 1 and not _is_boundary(b):
                b += 1
            n_chunk = b - epoch + 1
            if train_scan is not None and n_chunk > 1:
                # compute.scan_chunk bounds a single device program's length
                # (relayed TPUs kill minute-long executions); sub-chunking is
                # invisible to training — the per-epoch fold_in key stream
                # makes any chunking produce the identical model
                sub = max(0, cfg.compute.scan_chunk) or n_chunk
                e0 = epoch
                while e0 < b + 1:
                    n_sub = min(sub, b + 1 - e0)
                    params, opt_state, loss = train_scan(
                        params, opt_state, key, e0, n_sub, *step_args()
                    )
                    e0 += n_sub
            else:
                for e in range(epoch, b + 1):
                    # per-epoch keys derived by fold_in: stateless, so
                    # checkpoint resume continues the exact sample stream
                    step_key = jax.random.fold_in(key, e)
                    params, opt_state, loss = train_step(
                        params, opt_state, step_key, *step_args()
                    )
            epoch = b

            if checkpoint_dir and checkpoint_every and epoch % checkpoint_every == 0 and epoch:
                from lgcnhs_tpu.train.checkpoint import save_train_state

                save_train_state(checkpoint_dir, epoch, params, opt_state)

            if epoch % hp.epoch_per_eval == 0:
                vkey = jax.random.fold_in(key, hp.epochs + epoch)
                vloss = val_loss_closure(params, vkey)
                p, r, n, h, i = eval_fn(params)
                tl = round(float(loss), 5)
                vl = round(float(vloss), 5)
                p, r, n = round(float(p), 5), round(float(r), 5), round(float(n), 5)
                f1 = round(2 * p * r / (p + r), 5) if (p + r) else 0.0
                h, i = round(float(h), 5), round(float(i), 5)
                history["iters"].append(epoch)
                history["train_loss"].append(tl)
                history["val_loss"].append(vl)
                history["val_precision"].append(p)
                history["val_recall"].append(r)
                history["val_f1"].append(f1)
                history["val_ndcg"].append(n)
                history["val_H"].append(h)
                history["val_I"].append(i)
                log.info(
                    "[Iteration %d/%d] train_loss: %s, val_loss: %s, "
                    "val_precision@%d: %s, val_recall@%d: %s, val_f1@%d: %s, "
                    "val_NDCG@%d: %s, val_H@%d: %s, val_I@%d: %s",
                    epoch, hp.epochs, tl, vl,
                    cfg.k, p, cfg.k, r, cfg.k, f1, cfg.k, n, cfg.k, h, cfg.k, i,
                )
            epoch += 1

    params = finalize(params)

    if save_artifacts:
        cfg.ensure_dirs()
        save_checkpoint(
            os.path.join(cfg.model_path, f"{cfg.k}_{model_name}.npz"), params
        )
        _save_history(cfg, model_name, history)
    return TrainResult(params=params, history=history)


def save_checkpoint(path: str, params: LightGCNParams) -> None:
    """Final-params checkpoint (reference torch.save of the whole module,
    ``train.py:184``; we save arrays, loadable anywhere)."""
    np.savez(path, user_emb=np.asarray(params.user_emb), item_emb=np.asarray(params.item_emb))


def load_checkpoint(path: str) -> Optional[LightGCNParams]:
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        return LightGCNParams(
            user_emb=jnp.asarray(data["user_emb"]),
            item_emb=jnp.asarray(data["item_emb"]),
        )


def _save_history(cfg: Config, model_name: str, history: Dict[str, List[float]]) -> None:
    """CSV + metric curve PNGs (``train.py:190-221``)."""
    import pandas as pd

    base = os.path.join(cfg.pictures_path, f"{model_name}_{cfg.k}")
    pd.DataFrame(history).to_csv(base + "_val_metrics.csv", index=False)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        iters = history["iters"]
        fig = plt.figure()
        plt.plot(iters, history["train_loss"], label="train")
        plt.plot(iters, history["val_loss"], label="validation")
        plt.xlabel("iteration")
        plt.ylabel("loss")
        plt.title("training and validation loss curves")
        plt.legend()
        plt.savefig(base + "_loss_curves.png")
        plt.close(fig)
        for metric, label in (
            ("val_precision", "precision"),
            ("val_recall", "recall"),
            ("val_f1", "F1-score"),
            ("val_ndcg", "NDCG"),
            ("val_H", "H"),
            ("val_I", "I"),
        ):
            fig = plt.figure()
            plt.plot(iters, history[metric])
            plt.xlabel("iteration")
            plt.ylabel(label)
            plt.title(f"{label} curves")
            plt.savefig(f"{base}_{label}.png")
            plt.close(fig)
    except Exception as exc:  # plotting must never kill training
        get_logger().warning("plotting failed: %s", exc)
