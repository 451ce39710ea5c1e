"""Fused LGCNHS serving kernel: diffusion x GCN fusion + top-k in one pass.

The LGCNHS serving computation is top-k over F_new = G * F where
G = masked layer-0 preference scores and F = A W is the diffusion resource
matrix (``model/SpreadLightGCN/model.py:122-153``). Done naively that
materializes THREE (U, I) matrices in HBM (G, F, F_new). This kernel fuses
the whole chain per 128-user block entirely in VMEM:

  for each user block:
    G_blk = u_emb_blk @ item_emb^T          (MXU)
    F_blk = A_blk @ W                        (MXU, W streamed by item tiles)
    S_blk = where(seen, -1024, G_blk) * F_blk
    top-k by iterative masked argmax         (VPU)

Only the (U, k) results ever reach HBM. The transfer matrix W is the one
large HBM-resident operand (I x I); it streams through VMEM tile by tile via
the grid's second dimension.

Tie-breaking is torch.topk-style lowest-index (same as ``masked_topk``); the
exact-parity spread ranker (reversed-stable argsort + seen backfill,
``ops/topk.rank_exclude_seen``) remains the reference-parity path — this
kernel is the high-QPS serving flavor. Seen/padded entries are excluded
OUTRIGHT (-inf on the PRODUCT, see the kernel comment): the reference's
spread ranker list-filters seen items (``recommend.py:44``) rather than
relying on the -1024 G mask, whose product with F=0 would be 0 and outrank
real negative fused scores; consequently users with fewer than k unseen
items get lowest-index -inf entries at the tail here, not the parity
ranker's best-seen backfill.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -3.0e38
USER_BLOCK = 128
_VMEM_BUDGET = 12 * 1024 * 1024


def fits_vmem_serve(n_items: int, d: int, item_tile: int = 256,
                    budget: int = _VMEM_BUDGET) -> bool:
    """True when the fused serving kernel's resident set fits on-chip:
    (128, I_pad) A block + (128, I_pad) f32 scores scratch + (128, I_pad)
    int8 seen + double-buffered (I_pad, item_tile) W stripe + item/user
    tiles. ~10-12k items at the default tile; beyond it callers take the
    XLA chain or the sharded serving path."""
    i_pad = -(-n_items // item_tile) * item_tile
    resident = USER_BLOCK * i_pad * 4  # A block
    resident += USER_BLOCK * i_pad * 4  # scores scratch
    resident += USER_BLOCK * i_pad * 1  # seen
    resident += 2 * i_pad * item_tile * 4  # W stripe, double buffered
    resident += 2 * item_tile * d * 4 + 2 * USER_BLOCK * d * 4
    return resident <= budget


def _fusion_kernel(u_ref, it_ref, a_ref, w_ref, seen_ref, idx_ref, val_ref, scores):
    """Grid: (user blocks, item tiles). The item-tile dimension accumulates
    G*F into the scores scratch; the final tile runs the selection loop."""
    tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    k = idx_ref.shape[1]
    n_items = scores.shape[1]
    tile_w = w_ref.shape[1]

    # G and (A @ W) for this item tile. Seen/padded entries are excluded
    # OUTRIGHT (-inf on the product): the reference's spread ranker filters
    # seen items from the list (``recommend.py:44``) rather than relying on
    # the -1024 G mask, whose product with F=0 would be 0 and outrank real
    # negative fused scores.
    # Native MXU precision (single-pass: f32 operands truncate to bf16,
    # accumulation f32) — DELIBERATE for this high-QPS flavor. HIGHEST was
    # measured on-chip (round 4): the 3-pass emulation's operand-split
    # scratch blows the kernel past VMEM at ML-1M scale (17.2 MB > 16 MB)
    # and costs 7x at item_tile=128 where it does fit. Consequence
    # (tests/tpu_smoke.py): ~1% of k=100 tail slots are value-equal tie
    # swaps vs the XLA chain. Exact-parity recommendation flows use the
    # spread ranker (ops/topk.rank_exclude_seen) or retrieve_topk, whose
    # kernel runs HIGHEST (its contraction is only D-long — no such
    # VMEM/throughput cliff).
    g = jnp.dot(u_ref[:], it_ref[:].T, preferred_element_type=jnp.float32)
    f = jnp.dot(a_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    scores[:, pl.ds(tile * tile_w, tile_w)] = jnp.where(
        seen_ref[:] != 0, _NEG_INF, g * f
    )

    @pl.when(tile == n_tiles - 1)
    def _select():
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


@partial(jax.jit, static_argnames=("k", "item_tile", "interpret"))
def fused_lgcnhs_serve(
    user_emb: jnp.ndarray,  # (U, D) layer-0 user table
    item_emb: jnp.ndarray,  # (I, D) layer-0 item table
    A: jnp.ndarray,  # (U, I) train+val interaction matrix
    W: jnp.ndarray,  # (I, I) HybridS transfer matrix
    seen: jnp.ndarray,  # (U, I) bool
    k: int,
    item_tile: int = 256,
    interpret: bool = False,
):
    # VMEM budget per program: W stripe (I_pad x item_tile x 4B, double-
    # buffered) + A block + scores scratch (each 128 x I_pad x 4B). At
    # item_tile=256 and I~4k that is ~12 MB of the 16 MB VMEM; catalogs
    # beyond ~16k items should use the sharded serving path instead.
    """(indices, values) of top-k over (masked G) * (A W) without
    materializing any (U, I) intermediate in HBM."""
    if item_tile % 128 != 0 and not interpret:
        # the kernel stores to the scores scratch at lane offset
        # tile*item_tile; Mosaic only lowers dynamic-lane stores at
        # 128-multiples (see CLAUDE.md) — fail fast with a clear message
        # (the interpreter has no lane constraint; tests use small tiles)
        raise ValueError(f"item_tile must be a multiple of 128, got {item_tile}")
    U, D = user_emb.shape
    I = item_emb.shape[0]

    U_pad = -(-U // USER_BLOCK) * USER_BLOCK
    I_pad = -(-I // item_tile) * item_tile

    u = jnp.pad(user_emb, ((0, U_pad - U), (0, 0)))
    it = jnp.pad(item_emb, ((0, I_pad - I), (0, 0)))
    a = jnp.pad(A, ((0, U_pad - U), (0, I_pad - I)))
    w = jnp.pad(W, ((0, I_pad - I), (0, I_pad - I)))
    seen_i8 = jnp.pad(
        seen.astype(jnp.int8), ((0, U_pad - U), (0, I_pad - I)), constant_values=1
    )

    grid = (U_pad // USER_BLOCK, I_pad // item_tile)
    idx, vals = pl.pallas_call(
        _fusion_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((USER_BLOCK, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((item_tile, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((USER_BLOCK, I_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I_pad, item_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((USER_BLOCK, item_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((USER_BLOCK, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((USER_BLOCK, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((U_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((U_pad, k), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((USER_BLOCK, I_pad), jnp.float32)],
        interpret=interpret,
    )(u, it, a, w, seen_i8)
    return idx[:U], vals[:U]
