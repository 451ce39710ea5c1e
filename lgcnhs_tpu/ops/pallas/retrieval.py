"""Fused retrieval kernel: scores + seen-mask + top-k in one Pallas pass.

The reference materializes the full (U, I) preference matrix in memory, masks
it with Python index lists, and calls torch.topk
(``model/LightGCN/recommend.py:83-114``). At serving scale that matrix is the
HBM-bandwidth bottleneck. This kernel never writes it: for each 128-user
block it computes scores on the MXU into VMEM, applies the -1024 seen mask,
and selects the top-k by iterative masked argmax on the VPU — O(k) passes
over a block that stays on-chip.

Mosaic has no top_k/sort lowering (probed: NotImplementedError), so selection
is emulated with max + first-argmax (iota/min trick), which reproduces
torch.topk's lowest-index tie rule exactly.

VMEM budget: the item table (I_pad x D), the (128, I_pad) f32 score
scratch, and the (128, I_pad) seen block must fit on-chip together —
~(4D + 512 + 128) bytes per item, i.e. I up to ~13k at D=64
(``fits_vmem_retrieval``; dispatchers fall back to the XLA masked_topk
beyond it). Larger catalogs use the sharded distributed top-k
(``parallel/sharding.py``) over item blocks, which composes with this
kernel per shard.

Mask encoding (int8): 0 = unseen (real score), 1 = seen (the reference's
finite -1024 sentinel — seen items CAN be emitted when every unseen score
is below it, exactly like the reference's torch.topk over the masked
matrix), 2 = invalid (lane padding / sharding padding: -inf, can never be
emitted).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lgcnhs_tpu.ops.topk import MASK_VALUE

_NEG_INF = -3.0e38
USER_BLOCK = 128
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below ~16 MB/core


def fits_vmem_retrieval(n_items: int, d: int, budget: int = _VMEM_BUDGET) -> bool:
    """True when the fused kernel's resident set fits on-chip: item table
    (I_pad, D) f32 + (USER_BLOCK, I_pad) f32 score scratch + (USER_BLOCK,
    I_pad) int8 seen block (+ small user/out tiles). ~13k items at D=64."""
    i_pad = -(-n_items // 128) * 128
    resident = i_pad * d * 4
    resident += USER_BLOCK * i_pad * 4
    resident += USER_BLOCK * i_pad * 1
    resident += 4 * USER_BLOCK * d * 4
    return resident <= budget


def _retrieval_kernel(u_ref, it_ref, seen_ref, idx_ref, val_ref, scores):
    """One user block: scores -> mask -> k x (max, first-argmax, knock-out).

    Selections accumulate into fori_loop-carried (BU, k) values via one-hot
    writes — Mosaic cannot vectorize a column store at a dynamic lane index
    ("index in dimension 1 is a multiple of 128"), but whole-block stores at
    the end are free.
    """
    k = idx_ref.shape[1]
    n_items = it_ref.shape[0]

    # HIGHEST precision: the single-pass MXU matmul truncates f32 inputs to
    # bf16 and flips ~4% of near-tie indices vs the XLA path (measured on
    # chip); the 3-pass f32 emulation keeps retrieve_topk's "identical
    # indices" dispatch contract
    s = jnp.dot(u_ref[:], it_ref[:].T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    # int8 vector compares don't lower on v5e Mosaic ("Target does not
    # support this comparison"); upcast the mask once
    m = seen_ref[:].astype(jnp.int32)
    s = jnp.where(m == 1, MASK_VALUE, s)  # reference seen sentinel
    s = jnp.where(m >= 2, _NEG_INF, s)  # padding: never emitted
    scores[:] = s

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    col_k = jax.lax.broadcasted_iota(jnp.int32, idx_ref.shape, dimension=1)

    def select_one(t, carry):
        idx_acc, val_acc = carry
        cur = scores[:]
        row_max = jnp.max(cur, axis=1, keepdims=True)
        first_idx = jnp.min(jnp.where(cur == row_max, col, n_items), axis=1)
        slot = col_k == t
        idx_acc = jnp.where(slot, first_idx[:, None], idx_acc)
        val_acc = jnp.where(slot, row_max, val_acc)
        scores[:] = jnp.where(col == first_idx[:, None], _NEG_INF, cur)
        return idx_acc, val_acc

    idx_acc, val_acc = jax.lax.fori_loop(
        0,
        k,
        select_one,
        (
            jnp.zeros(idx_ref.shape, jnp.int32),
            jnp.full(val_ref.shape, _NEG_INF, jnp.float32),
        ),
    )
    idx_ref[:] = idx_acc
    val_ref[:] = val_acc


@partial(jax.jit, static_argnames=("k", "interpret"))
def fused_topk_retrieval(
    user_emb: jnp.ndarray,  # (U, D)
    item_emb: jnp.ndarray,  # (I, D)
    seen: jnp.ndarray,  # (U, I) bool
    k: int,
    interpret: bool = False,
):
    """(indices (U, k) int32, values (U, k) f32) of the masked preference
    top-k, computed without materializing scores in HBM."""
    U, D = user_emb.shape
    I = item_emb.shape[0]

    # pad to hardware tiles: users to 128 rows, items to 128 lanes
    U_pad = -(-U // USER_BLOCK) * USER_BLOCK
    I_pad = -(-I // 128) * 128
    u = jnp.pad(user_emb, ((0, U_pad - U), (0, 0)))
    it = jnp.pad(item_emb, ((0, I_pad - I), (0, 0)))
    # padded items must NEVER win, not even against sub-sentinel scores:
    # they carry mask state 2 (-inf), distinct from seen items' finite
    # -1024 sentinel (callers may pass an int8 seen already carrying 2s
    # for their own sharding padding — astype keeps them)
    seen_i8 = jnp.pad(
        seen.astype(jnp.int8), ((0, U_pad - U), (0, I_pad - I)), constant_values=2
    )

    grid = (U_pad // USER_BLOCK,)
    idx, vals = pl.pallas_call(
        _retrieval_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((USER_BLOCK, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I_pad, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((USER_BLOCK, I_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((USER_BLOCK, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((USER_BLOCK, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((U_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((U_pad, k), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((USER_BLOCK, I_pad), jnp.float32)],
        interpret=interpret,
    )(u, it, seen_i8)
    return idx[:U], vals[:U]


# -- item-tiled streaming flavor: no catalog-size VMEM cap (VERDICT r4 #5) --


def _stream_resident_bytes(d: int, k_pad: int, tile: int) -> int:
    """Streaming kernel resident set per core: double-buffered streamed
    item/seen tiles + user tile + work scratch + (idx, val) accumulators.
    Independent of the catalog size; linear in the item tile and in D."""
    return (
        2 * (tile * d * 4 + USER_BLOCK * tile)  # pipelined item f32 + seen i8
        + USER_BLOCK * d * 4
        + USER_BLOCK * (k_pad + tile) * 4
        + 2 * USER_BLOCK * k_pad * 4
    )


def pick_stream_tile(d: int, k: int, budget: int = _VMEM_BUDGET):
    """Largest power-of-two item tile (<= the measured-optimal 4096, >= 128)
    whose streaming resident set fits VMEM, or None when even 128 does not
    (pathological D) — dispatchers then fall back to the XLA chain. The
    catalog-independent resident set is ~5.4 MB at D=64/k=100 with the
    default tile, but grows linearly in D: at D >= ~768 the 4096-wide tile
    alone would blow the core budget (round-5 review finding), so wide-D
    configs stream with narrower tiles instead of failing to compile."""
    k_pad = max(128, -(-k // 128) * 128)
    tile = 4096
    while tile >= 128:
        if _stream_resident_bytes(d, k_pad, tile) <= budget:
            return tile
        tile //= 2
    return None


def _streaming_kernel(u_ref, it_ref, seen_ref, idx_ref, val_ref,
                      work_vals, *, k: int, k_pad: int):
    """Grid (user blocks, item tiles): the (USER_BLOCK, k_pad) accumulator
    out-blocks persist in VMEM across the item-tile axis (index_map ignores
    j — the fusion_serve streaming idiom); each tile merges its masked
    scores with the running top-k by k iterative first-argmax selections
    over the (k_pad + T)-wide work values.

    Tie rule = torch.topk lowest-global-index, preserved structurally:
    running candidates (columns 0..k_pad-1) all carry ids from EARLIER
    tiles, so leftmost-first-argmax prefers them over equal current-tile
    scores, and within the tile the column order IS id order. Every store
    is a full block or a static slice at a 128-multiple lane offset
    (Mosaic's dynamic-lane constraint, CLAUDE.md). Id extraction needs no
    (BU, tile) id plane: a selected tile column's global id is affine
    (``j*tile + col - k_pad``), so only the k_pad running lanes use a
    one-hot masked sum over ``idx_ref`` (never a dynamic gather) — that
    cuts the per-selection VPU work from ~2 full-width passes to one
    full-width + one k_pad-wide pass."""
    j = pl.program_id(1)
    tile_w = it_ref.shape[0]
    width = k_pad + tile_w

    @pl.when(j == 0)
    def _init():
        idx_ref[:] = jnp.zeros(idx_ref.shape, jnp.int32)
        val_ref[:] = jnp.full(val_ref.shape, _NEG_INF, jnp.float32)

    s = jnp.dot(u_ref[:], it_ref[:].T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    m = seen_ref[:].astype(jnp.int32)
    s = jnp.where(m == 1, MASK_VALUE, s)
    s = jnp.where(m >= 2, _NEG_INF, s)

    work_vals[:, :k_pad] = val_ref[:]
    work_vals[:, k_pad:] = s

    col = jax.lax.broadcasted_iota(jnp.int32, (u_ref.shape[0], width), 1)
    col_kp = jax.lax.broadcasted_iota(
        jnp.int32, (u_ref.shape[0], k_pad), dimension=1
    )
    col_k = jax.lax.broadcasted_iota(jnp.int32, idx_ref.shape, dimension=1)
    run_ids = idx_ref[:]  # ids of the running candidates, fixed per tile

    def select_one(t, carry):
        idx_acc, val_acc = carry
        cur = work_vals[:]
        row_max = jnp.max(cur, axis=1, keepdims=True)
        sel_col = jnp.min(jnp.where(cur == row_max, col, width), axis=1)
        run_id = jnp.sum(
            jnp.where(col_kp == sel_col[:, None], run_ids, 0), axis=1
        )
        sel_id = jnp.where(
            sel_col < k_pad, run_id, j * tile_w + sel_col - k_pad
        )
        slot = col_k == t
        idx_acc = jnp.where(slot, sel_id[:, None], idx_acc)
        val_acc = jnp.where(slot, row_max, val_acc)
        work_vals[:] = jnp.where(col == sel_col[:, None], _NEG_INF, cur)
        return idx_acc, val_acc

    idx_acc, val_acc = jax.lax.fori_loop(
        0,
        k,
        select_one,
        (
            jnp.zeros(idx_ref.shape, jnp.int32),
            jnp.full(val_ref.shape, _NEG_INF, jnp.float32),
        ),
    )
    idx_ref[:] = idx_acc
    val_ref[:] = val_acc


@partial(jax.jit, static_argnames=("k", "item_tile", "interpret"))
def streaming_topk_retrieval(
    user_emb: jnp.ndarray,  # (U, D)
    item_emb: jnp.ndarray,  # (I, D)
    seen: jnp.ndarray,  # (U, I) bool or int8 tri-state
    k: int,
    item_tile: int = None,
    interpret: bool = False,
):
    """``fused_topk_retrieval`` without the ~13k-item VMEM cap: the item
    table streams through VMEM one (item_tile, D) tile at a time (the same
    treatment ``fusion_serve`` gives W) with a running (idx, val) top-k
    merge per 128-user block. Resident VMEM is O(item_tile·(D + USER_BLOCK)
    + USER_BLOCK·k_pad) — INDEPENDENT of the catalog size; dispatches at
    50k+ items where the one-shot kernel cannot.

    The per-tile merge costs k selection passes over (k_pad + item_tile)
    lanes, so small tiles pay the k·k_pad merge overhead once per tile:
    measured on-chip at I=50k, k=100, tile 512 ran 0.53x the XLA chain,
    tile 2048 1.19x, tile 4096 1.41x (and 1.26x at I=200k with 2048) —
    hence the wide default. ``item_tile=None`` auto-picks the widest tile
    whose resident set fits VMEM (``pick_stream_tile``: 4096 at model D,
    ~4-5 MB resident; narrower automatically at wide D instead of a Mosaic
    compile failure).

    Index contract: identical to ``masked_topk``/``fused_topk_retrieval``
    (HIGHEST-precision scores, torch.topk lowest-index ties, tri-state mask
    with state 2 = -inf) whenever the user has >= k real candidates; users
    whose real candidates run out (possible only with sharding padding)
    fill the tail with id-0 sentinel slots at -inf, like the one-shot
    kernel's padded-lane behavior."""
    U, D = user_emb.shape
    I = item_emb.shape[0]
    if item_tile is None:
        # widest tile whose resident set fits VMEM (the measured-optimal
        # 4096 at model D; narrower automatically at wide D)
        item_tile = pick_stream_tile(D, min(k, I)) if not interpret else 512
        if item_tile is None:
            raise ValueError(
                f"no streaming item tile fits VMEM at D={D}, k={k} — "
                "use the XLA masked_topk chain"
            )
    if item_tile % 128 != 0 and not interpret:
        raise ValueError(f"item_tile must be a multiple of 128, got {item_tile}")
    k_eff = min(k, I)
    k_pad = -(-k_eff // 128) * 128 if not interpret else k_eff

    U_pad = -(-U // USER_BLOCK) * USER_BLOCK
    I_pad = -(-I // item_tile) * item_tile
    u = jnp.pad(user_emb, ((0, U_pad - U), (0, 0)))
    it = jnp.pad(item_emb, ((0, I_pad - I), (0, 0)))
    seen_i8 = jnp.pad(
        seen.astype(jnp.int8), ((0, U_pad - U), (0, I_pad - I)), constant_values=2
    )

    grid = (U_pad // USER_BLOCK, I_pad // item_tile)
    idx, vals = pl.pallas_call(
        partial(_streaming_kernel, k=k_eff, k_pad=k_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((USER_BLOCK, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((item_tile, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((USER_BLOCK, item_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((USER_BLOCK, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((USER_BLOCK, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((U_pad, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((U_pad, k_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((USER_BLOCK, k_pad + item_tile), jnp.float32),
        ],
        interpret=interpret,
    )(u, it, seen_i8)
    return idx[:U, :k_eff], vals[:U, :k_eff]
