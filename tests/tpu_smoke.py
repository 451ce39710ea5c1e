"""Opt-in ON-CHIP kernel parity smoke — run manually on the real TPU:

    cd /root/repo && timeout 1800 python tests/tpu_smoke.py

NOT collected by pytest (no test_ prefix; the suite pins CPU in conftest).
The CPU suite exercises every kernel in Pallas interpret mode; this script
re-asserts the claims that can only be checked on hardware — Mosaic
lowering, MXU precision behavior, the tri-state mask in the compiled
kernels — in ONE process (one lease handshake):

  1. fused_topk_retrieval == masked_topk indices, incl. a user whose every
     unseen score sits below the -1024 sentinel (the round-4 tri-state mask
     regression: lane padding must never be emitted).
  2. fused_lgcnhs_serve == the XLA serving chain (_serve_unfused) indices.
  3. lightgcn_propagate_pallas (dual kernel) fwd and grad vs the XLA
     propagation, f32.
  4. lightgcn_propagate_pallas_binary (int8 incidence) vs the XLA path on
     the same normalized incidence.

Prints one PASS/FAIL line per check; exits nonzero on any FAIL.
"""
import os
import sys
import time

# run as `python tests/tpu_smoke.py`: sys.path[0] is tests/, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def run_checks(emit=print) -> list:
    """Run every on-chip kernel contract; returns the list of FAILED check
    names (empty = all pass). Importable by bench.py so each round's driver
    record pins the kernel contracts (VERDICT r4 next-steps #7). Assumes the
    caller already paid the TPU lease handshake."""
    t0 = time.time()

    from lgcnhs_tpu.data.graph import (
        EdgeSet,
        binary_incidence_factors,
        interaction_matrix,
        normalized_bipartite,
        pos_bool_matrix,
    )
    from lgcnhs_tpu.models.fusion import _serve_unfused
    from lgcnhs_tpu.ops.diffusion import general_spreading_matrix, hybrid_transfer
    from lgcnhs_tpu.ops.pallas.fusion_serve import fused_lgcnhs_serve
    from lgcnhs_tpu.ops.pallas.propagation import (
        lightgcn_propagate_pallas,
        lightgcn_propagate_pallas_binary,
    )
    from lgcnhs_tpu.ops.pallas.retrieval import (
        fits_vmem_retrieval,
        fused_topk_retrieval,
        streaming_topk_retrieval,
    )
    from lgcnhs_tpu.ops.propagation import lightgcn_propagate
    from lgcnhs_tpu.ops.topk import masked_topk

    U, I, D, E = 384, 896, 64, 6000
    rng = np.random.default_rng(0)
    ue = rng.standard_normal((U, D)).astype(np.float32) * 0.3
    ie = rng.standard_normal((I, D)).astype(np.float32) * 0.3
    # user 0: every score < -1024 (sub-sentinel regime) — item dim 0 is
    # strictly positive, user 0 lives on -3000 * e_0
    ie[:, 0] = 1.0 + np.abs(ie[:, 0])
    ue[0] = 0.0
    ue[0, 0] = -3000.0
    eu = rng.integers(0, U, E).astype(np.int32)
    ei = rng.integers(0, I, E).astype(np.int32)
    es = EdgeSet(eu, ei)
    seen = pos_bool_matrix(U, I, es)
    seen[0] = False  # the sub-sentinel user has NO seen items
    ue_j, ie_j, seen_j = jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(seen)

    failures: list = []

    def check(name: str, ok: bool, detail: str = "") -> None:
        if not ok:
            failures.append(name)
        emit(f"[{'PASS' if ok else 'FAIL'}] {name}{(' — ' + detail) if detail else ''}")

    # 1. retrieval kernel vs XLA masked_topk (exact index contract)
    scores = jnp.dot(
        ue_j, ie_j.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    for k in (10, 100):
        want = np.asarray(masked_topk(scores, seen_j, k))
        got = np.asarray(fused_topk_retrieval(ue_j, ie_j, seen_j, k)[0])
        check(
            f"retrieval k={k} indices == masked_topk",
            bool((want == got).all()),
            f"{(want != got).sum()} mismatched slots",
        )
        check(
            f"retrieval k={k} sub-sentinel user in range",
            bool((got[0] >= 0).all() and (got[0] < I).all()),
            f"ids {sorted(set(got[0]) - set(range(I)))[:4]} out of range"
            if ((got[0] < 0) | (got[0] >= I)).any() else "",
        )

    # 1b. streaming (item-tiled) retrieval: same index contract at the small
    # shape (multi-tile merge incl. the sub-sentinel user), AND a dispatch
    # at 50k items — beyond fits_vmem_retrieval's one-shot cap — checked
    # against the XLA masked_topk (VERDICT r4 #5).
    for k in (10, 100):
        got = np.asarray(streaming_topk_retrieval(ue_j, ie_j, seen_j, k)[0])
        want = np.asarray(masked_topk(scores, seen_j, k))
        check(
            f"streaming retrieval k={k} indices == masked_topk",
            bool((want == got).all()),
            f"{(want != got).sum()} mismatched slots",
        )
    I_BIG = 50_000
    check(
        "50k catalog exceeds the one-shot kernel cap",
        not fits_vmem_retrieval(I_BIG, D),
    )
    ie_big = jnp.asarray(
        rng.standard_normal((I_BIG, D)).astype(np.float32) * 0.3
    )
    seen_big = jnp.asarray(rng.random((U, I_BIG)) < 0.05)
    scores_big = jnp.dot(
        ue_j, ie_big.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    want_big = np.asarray(masked_topk(scores_big, seen_big, 100))
    got_big = np.asarray(
        streaming_topk_retrieval(ue_j, ie_big, seen_big, 100)[0]
    )
    check(
        "streaming retrieval @50k items k=100 == masked_topk",
        bool((want_big == got_big).all()),
        f"{(want_big != got_big).sum()} mismatched slots",
    )

    # 1c. wide-D streaming: the resident set is linear in D, so at D=1024
    # pick_stream_tile must NARROW the tile (the fixed 4096 tile fails
    # Mosaic compilation there) and the narrowed kernel must still match
    # masked_topk exactly (round-5 review finding + on-chip proof).
    from lgcnhs_tpu.ops.pallas.retrieval import pick_stream_tile

    D_W, I_W, U_W = 1024, 16_384, 128
    tile_w = pick_stream_tile(D_W, 100)
    check(
        "wide-D (1024) picks a narrowed streaming tile",
        tile_w is not None and tile_w < 4096,
        f"tile {tile_w}",
    )
    ue_w = jnp.asarray(rng.standard_normal((U_W, D_W)).astype(np.float32) * 0.1)
    ie_w = jnp.asarray(rng.standard_normal((I_W, D_W)).astype(np.float32) * 0.1)
    seen_w = jnp.asarray(rng.random((U_W, I_W)) < 0.05)
    want_w = np.asarray(
        masked_topk(
            jnp.dot(ue_w, ie_w.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32),
            seen_w, 100,
        )
    )
    got_w = np.asarray(streaming_topk_retrieval(ue_w, ie_w, seen_w, 100)[0])
    check(
        "wide-D streaming @D=1024 k=100 == masked_topk",
        bool((want_w == got_w).all()),
        f"tile {tile_w}, {(want_w != got_w).sum()} mismatched slots",
    )

    # 2. fused serving kernel vs the XLA chain. Both serving flavors run
    # native MXU precision BY DESIGN (HIGHEST blows the kernel's VMEM and
    # costs 7x — see ops/pallas/fusion_serve.py), so the contract is:
    # identical indices modulo near-tie swaps from differing matmul
    # tilings/truncation; every mismatched slot must carry an
    # (approximately) EQUAL fused value under an independent HIGHEST
    # reference (the parity_report "tie_equivalent" notion), and the vast
    # majority of slots must agree exactly.
    A = jnp.asarray(interaction_matrix(U, I, es))
    W = hybrid_transfer(A, general_spreading_matrix(A), jnp.float32(0.5))
    G = np.asarray(jnp.dot(ue_j, ie_j.T, precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32))
    F = np.asarray(jnp.dot(A, W, precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32))
    fused_vals = np.where(seen, -3.0e38, G * F)
    rows = np.arange(U)[:, None]
    for k in (10, 100):
        want = np.asarray(_serve_unfused(ue_j, ie_j, A, W, seen_j, k))
        got = np.asarray(fused_lgcnhs_serve(ue_j, ie_j, A, W, seen_j, k)[0])
        mism = want != got
        agree = 1.0 - float(mism.mean())
        vals_w = fused_vals[rows, want]
        vals_g = fused_vals[rows, got]
        # Tie bound derived from bf16 truncation: each of the two in-kernel
        # matmuls carries <= 2^-8 relative operand error, so a genuinely
        # tied slot's fused values differ by O(1e-2) relative AT WORST —
        # but the observed tie gap on-chip is ~1e-4 relative (round-4
        # measurement); pin close to that so a real kernel regression
        # (value error on non-tied slots) cannot hide inside the tolerance
        # (advisor r4 finding #2).
        # Per-slot RELATIVE bound: a global max|vals| scale would be
        # inflated ~3 orders of magnitude by the injected -3000
        # sub-sentinel user, making the bound vacuous for typical slots
        # (round-5 review finding). Observed on-chip tie gap is ~1e-4
        # relative; 5e-4 leaves headroom without hiding real value errors.
        if mism.any():
            w_m, g_m = vals_w[mism], vals_g[mism]
            slot_scale = np.maximum(np.abs(w_m), np.abs(g_m))
            rel_gaps = np.abs(w_m - g_m) / (slot_scale + 1e-5)
            gap = float(rel_gaps.max())
        else:
            gap = 0.0
        ties_ok = gap <= 5e-4
        check(
            f"fused serving k={k} tie-equivalent to XLA chain",
            agree >= 0.98 and ties_ok,
            f"agreement {agree:.4f}, mismatched-slot max RELATIVE gap "
            f"{gap:.3e} (bound 5e-4)",
        )

    # 3. dual propagation kernel: forward + grad vs XLA, f32
    R_hat = jnp.asarray(normalized_bipartite(U, I, es))
    fu, fi = lightgcn_propagate(ue_j, ie_j, R_hat, 3)
    pu, pi = lightgcn_propagate_pallas(ue_j, ie_j, R_hat, 3)
    err = max(
        float(jnp.abs(fu - pu).max()), float(jnp.abs(fi - pi).max())
    )
    check("dual kernel forward == XLA propagate (f32)", err < 1e-4, f"max |diff| {err:.2e}")

    def loss_xla(u, i):
        a, b = lightgcn_propagate(u, i, R_hat, 3)
        return jnp.sum(a * a) + jnp.sum(b * b)

    def loss_pal(u, i):
        a, b = lightgcn_propagate_pallas(u, i, R_hat, 3)
        return jnp.sum(a * a) + jnp.sum(b * b)

    gx = jax.grad(loss_xla, argnums=(0, 1))(ue_j, ie_j)
    gp = jax.grad(loss_pal, argnums=(0, 1))(ue_j, ie_j)
    gerr = max(float(jnp.abs(a - b).max()) for a, b in zip(gx, gp))
    check("dual kernel grad == XLA grad (f32)", gerr < 1e-3, f"max |diff| {gerr:.2e}")

    # 4. binary-incidence kernel vs XLA on the same normalized incidence
    R8, du_inv, di_inv = binary_incidence_factors(U, I, es)
    bu, bi = lightgcn_propagate_pallas_binary(
        ue_j, ie_j, jnp.asarray(R8), jnp.asarray(du_inv), jnp.asarray(di_inv), 3
    )
    berr = max(
        float(jnp.abs(fu - bu).max()), float(jnp.abs(fi - bi).max())
    )
    check("binary int8 kernel == XLA propagate (f32)", berr < 1e-4, f"max |diff| {berr:.2e}")

    emit(
        f"tpu_smoke: {'ALL PASS' if not failures else f'{len(failures)} FAILURES'} "
        f"({time.time() - t0:.1f}s total)"
    )
    return failures


def main() -> int:
    if jax.default_backend() != "tpu":
        print("tpu_smoke: default backend is not tpu — nothing to check")
        return 0
    t0 = time.time()
    jax.device_get(jnp.zeros((4,)))  # lease handshake outside any check
    print(f"[handshake {time.time() - t0:.1f}s] devices={jax.devices()}")
    return 1 if run_checks() else 0


if __name__ == "__main__":
    sys.exit(main())
