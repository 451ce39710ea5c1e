"""Dual-product propagation kernel: (R @ X, R^T @ Y) in ONE pass over R.

Each LightGCN layer needs both half-steps of the bipartite propagation
(``model/LightGCN/model.py:60-63`` does them as one joint-graph message
passing; our dense path as two matmuls, ``ops/propagation.py``):

    e_u' = R_hat   @ e_i      (U, I) x (I, D)
    e_i' = R_hat^T @ e_u      (I, U) x (U, D)

At recsys shapes (D = 64) the step is HBM-bandwidth-bound: the incidence
R_hat is megabytes-to-gigabytes while the embeddings are ~1 MB, so the cost
of a layer IS the number of times R_hat crosses HBM. XLA computes the two
products as two separate matmuls = two full reads of R_hat. This kernel
computes both against the SAME streamed tile, halving incidence traffic:

- grid over user tiles; R tile (TILE_U, I) is read once per step
- e_i (X) and the e_i' accumulator live resident in VMEM across the whole
  grid (their block index maps are constant), e_u/e_u' stream per tile
- both MXU products run per tile: out_u tile = R_tile @ X, and
  out_i += R_tile^T @ Y_tile accumulated into the resident output block

The VJP is the SAME kernel with swapped cotangents — for (gU, gI) upstream,
(dX, dY) = (R^T @ gU, R @ gI) = dual(R, gI, gU) swapped — so a training step
(forward + backward) reads R_hat 2x per layer instead of XLA's 4x.

Applicability is VMEM-bounded: e_i + the (I, D) f32 accumulator + a double-
buffered R stripe must fit on-chip (~16 MB/core); ``fits_vmem`` guards the
dispatch and the XLA path remains the fallback (and the parity reference).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below the ~16 MB/core VMEM
_TILES = (512, 256, 128, 64, 32, 16, 8)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _vmem_bytes(tile_u: int, i_pad: int, d: int, r_itemsize: int, e_itemsize: int) -> int:
    r_stripe = 2 * tile_u * i_pad * r_itemsize  # double-buffered input stream
    if r_itemsize < e_itemsize:
        # int8 R is converted to the compute dtype in VMEM before the MXU dots
        r_stripe += tile_u * i_pad * e_itemsize
    resident = i_pad * d * e_itemsize + i_pad * d * 4  # X + f32 accumulator
    streams = 2 * tile_u * d * (e_itemsize + 4)  # Y tile in, out_u tile out
    return r_stripe + resident + streams


def _pick_tile(n_users: int, n_items: int, d: int, r_itemsize: int, e_itemsize: int):
    i_pad = _pad_to(n_items, 128)
    for t in _TILES:
        if _vmem_bytes(t, i_pad, d, r_itemsize, e_itemsize) <= _VMEM_BUDGET:
            return t
    return None


def fits_vmem(n_users: int, n_items: int, d: int, bf16: bool = False) -> bool:
    """True when the dual kernel's resident state fits on-chip."""
    s = 2 if bf16 else 4
    return _pick_tile(n_users, n_items, d, s, s) is not None


def fits_vmem_binary(n_users: int, n_items: int, d: int, bf16: bool = False) -> bool:
    """VMEM guard for the int8 binary-incidence flavor."""
    s = 2 if bf16 else 4
    return _pick_tile(n_users, n_items, d, 1, s) is not None


def _dual_kernel(r_ref, x_ref, y_ref, out_u_ref, out_i_ref, *, precision):
    r = r_ref[:]
    if r.dtype != x_ref.dtype:
        # int8 binary incidence: promote the tile once in VMEM, reuse it for
        # both MXU products — HBM still only moved 1 byte/entry
        r = r.astype(x_ref.dtype)
    # out_u tile: R_tile @ X  — contracting R dim 1 with X dim 0
    out_u_ref[:] = jax.lax.dot_general(
        r, x_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # out_i accumulator: R_tile^T @ Y_tile — contracting R dim 0 with Y dim 0
    contrib = jax.lax.dot_general(
        r, y_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_i_ref[:] = contrib

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        out_i_ref[:] = out_i_ref[:] + contrib


def _dual_impl(R, X, Y, interpret: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    U, I = R.shape
    D = X.shape[1]
    tile_u = _pick_tile(U, I, D, R.dtype.itemsize, X.dtype.itemsize)
    if tile_u is None:
        raise ValueError(
            f"dual_matmul does not fit VMEM at U={U}, I={I}, D={D}; "
            "use the XLA propagation path"
        )
    # f32 operands = the parity path: run the MXU at HIGHEST (3-pass bf16
    # emulation) exactly like the XLA lightgcn_propagate — the default
    # single-pass matmul truncates f32 inputs to bf16 and silently degraded
    # the f32 path whenever this kernel dispatched (caught by
    # tests/tpu_smoke.py on-chip; the path stays bandwidth-bound, so the
    # extra MXU passes are largely hidden behind the R reads). bf16
    # operands are exact in one pass; the speed path is unchanged.
    if X.dtype != Y.dtype or (
        jnp.issubdtype(R.dtype, jnp.floating) and R.dtype != X.dtype
    ):
        # the precision gate below keys on X.dtype: a mixed-dtype call (e.g.
        # f32 R with bf16 X/Y) would pick DEFAULT and silently truncate the
        # f32 operand in-kernel — the exact failure class the gate exists to
        # prevent (advisor r4 #1). int8 R is the binary-incidence path and
        # legitimately differs.
        raise ValueError(
            f"dual_matmul operand dtypes must agree (got R={R.dtype}, "
            f"X={X.dtype}, Y={Y.dtype}); cast consistently before calling"
        )
    precision = (
        jax.lax.Precision.HIGHEST
        if X.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    U_pad, I_pad = _pad_to(U, tile_u), _pad_to(I, 128)
    Rp = jnp.pad(R, ((0, U_pad - U), (0, I_pad - I)))
    Xp = jnp.pad(X, ((0, I_pad - I), (0, 0)))
    Yp = jnp.pad(Y, ((0, U_pad - U), (0, 0)))

    out_u, out_i = pl.pallas_call(
        partial(_dual_kernel, precision=precision),
        grid=(U_pad // tile_u,),
        in_specs=[
            pl.BlockSpec((tile_u, I_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I_pad, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_u, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_u, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I_pad, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((U_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((I_pad, D), jnp.float32),
        ),
        interpret=interpret,
    )(Rp, Xp, Yp)
    return out_u[:U], out_i[:I]


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def dual_matmul(R, X, Y, interpret: bool = False):
    """(R @ X, R^T @ Y) with one streaming pass over R. f32 outputs;
    cast R/X/Y to bfloat16 beforehand for the mixed-precision speed path."""
    return _dual_impl(R, X, Y, interpret)


def _dual_fwd(R, X, Y, interpret):
    # the zero-size marker carries the compute dtype to the backward pass
    # (for int8 binary R it differs from R.dtype)
    return _dual_impl(R, X, Y, interpret), (R, jnp.zeros((0,), X.dtype))


def _dual_bwd(interpret, res, cts):
    R, marker = res
    cdt = marker.dtype
    gU, gI = cts
    gU = gU.astype(cdt)
    gI = gI.astype(cdt)
    dY, dX = _dual_impl(R, gI, gU, interpret)
    # cotangent dtypes must match the primal X/Y dtypes (f32 parity path,
    # bf16 speed path); integer R gets the symbolic-zero float0 cotangent
    if jnp.issubdtype(R.dtype, jnp.floating):
        dR = jnp.zeros_like(R)
    else:
        import numpy as _np

        dR = _np.zeros(R.shape, jax.dtypes.float0)
    return dR, dX.astype(cdt), dY.astype(cdt)


dual_matmul.defvjp(_dual_fwd, _dual_bwd)


@partial(jax.jit, static_argnames=("n_layers", "bf16_matmul", "interpret"))
def lightgcn_propagate_pallas(
    user_emb: jnp.ndarray,  # (U, D)
    item_emb: jnp.ndarray,  # (I, D)
    R_hat: jnp.ndarray,  # (U, I)
    n_layers: int = 3,
    bf16_matmul: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dual-kernel flavor of ``ops.propagation.lightgcn_propagate``: same
    math (layer-mean of K sym-normalized propagation steps,
    ``model/LightGCN/model.py:60-72``), half the incidence traffic.

    R_hat (and the embeddings) are cast + padded to kernel-aligned shapes
    ONCE here, outside the layer loop, so each per-layer ``dual_matmul``
    hits its aligned fast path with no pad copies of the big operand.
    """
    U, I = R_hat.shape
    D = user_emb.shape[1]
    Rl = R_hat.astype(jnp.bfloat16) if bf16_matmul else R_hat
    cast = (lambda a: a.astype(jnp.bfloat16)) if bf16_matmul else (lambda a: a)
    tile_u = _pick_tile(U, I, D, Rl.dtype.itemsize, Rl.dtype.itemsize)
    if tile_u is None:
        raise ValueError("shapes exceed VMEM; use the XLA propagation path")
    U_pad, I_pad = _pad_to(U, tile_u), _pad_to(I, 128)
    Rl = jnp.pad(Rl, ((0, U_pad - U), (0, I_pad - I)))
    eu = jnp.pad(user_emb, ((0, U_pad - U), (0, 0)))
    ei = jnp.pad(item_emb, ((0, I_pad - I), (0, 0)))
    acc_u, acc_i = eu, ei
    for _ in range(n_layers):
        eu, ei = dual_matmul(Rl, cast(ei), cast(eu), interpret)
        acc_u = acc_u + eu
        acc_i = acc_i + ei
    scale = 1.0 / (n_layers + 1)
    return acc_u[:U] * scale, acc_i[:I] * scale


@partial(jax.jit, static_argnames=("n_layers", "bf16_matmul", "interpret"))
def lightgcn_propagate_pallas_binary(
    user_emb: jnp.ndarray,  # (U, D)
    item_emb: jnp.ndarray,  # (I, D)
    R8: jnp.ndarray,  # (U, I) int8 BINARY interaction matrix
    du_inv: jnp.ndarray,  # (U,) 1/sqrt(user degree), 0 for isolated users
    di_inv: jnp.ndarray,  # (I,) 1/sqrt(item degree)
    n_layers: int = 3,
    bf16_matmul: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Binary-incidence flavor of ``lightgcn_propagate_pallas``.

    R_hat factorizes as diag(du_inv) R diag(di_inv) with R strictly 0/1
    (``data/graph.normalized_bipartite`` builds it exactly this way), so the
    streamed operand can be int8: HALF the HBM bytes of the bf16 R_hat path
    and a quarter of f32, with the 0/1 values EXACT — the degree scales are
    applied to the (U, D)/(I, D) embeddings (megabytes, not the gigabyte-
    scale incidence). Each layer:

        e_u' = du_inv * (R  @ (di_inv * e_i))
        e_i' = di_inv * (R^T @ (du_inv * e_u))
    """
    U, I = R8.shape
    D = user_emb.shape[1]
    cdt = jnp.bfloat16 if bf16_matmul else jnp.float32
    tile_u = _pick_tile(U, I, D, 1, jnp.dtype(cdt).itemsize)
    if tile_u is None:
        raise ValueError("shapes exceed VMEM; use the XLA propagation path")
    U_pad, I_pad = _pad_to(U, tile_u), _pad_to(I, 128)
    Rp = jnp.pad(R8.astype(jnp.int8), ((0, U_pad - U), (0, I_pad - I)))
    du = jnp.pad(du_inv, (0, U_pad - U))[:, None].astype(jnp.float32)
    di = jnp.pad(di_inv, (0, I_pad - I))[:, None].astype(jnp.float32)
    eu = jnp.pad(user_emb, ((0, U_pad - U), (0, 0)))
    ei = jnp.pad(item_emb, ((0, I_pad - I), (0, 0)))
    acc_u, acc_i = eu, ei
    for _ in range(n_layers):
        ou, oi = dual_matmul(Rp, (di * ei).astype(cdt), (du * eu).astype(cdt), interpret)
        eu = du * ou
        ei = di * oi
        acc_u = acc_u + eu
        acc_i = acc_i + ei
    scale = 1.0 / (n_layers + 1)
    return acc_u[:U] * scale, acc_i[:I] * scale
