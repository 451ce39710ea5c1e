"""Fused retrieval kernel vs the reference masked-topk semantics.

Runs in Pallas interpret mode on CPU; the same kernel compiles via Mosaic on
real TPU (exercised by bench.py / the driver).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgcnhs_tpu.ops.pallas.retrieval import fused_topk_retrieval
from lgcnhs_tpu.ops.topk import masked_topk

U, I, D = 50, 300, 16


@pytest.fixture
def problem():
    rng = np.random.default_rng(17)
    ue = rng.standard_normal((U, D)).astype(np.float32)
    ie = rng.standard_normal((I, D)).astype(np.float32)
    seen = rng.random((U, I)) < 0.3
    return jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(seen)


@pytest.mark.parametrize("k", [1, 10])
def test_matches_masked_topk(problem, k):
    ue, ie, seen = problem
    idx, vals = fused_topk_retrieval(ue, ie, seen, k, interpret=True)
    scores = ue @ ie.T
    want = np.asarray(masked_topk(scores, seen, k))
    np.testing.assert_array_equal(np.asarray(idx), want)
    # values are the actual masked scores at those indices
    masked = np.where(np.asarray(seen), -1024.0, np.asarray(scores))
    np.testing.assert_allclose(
        np.asarray(vals),
        np.take_along_axis(masked, want, axis=1),
        rtol=1e-5,
        atol=1e-5,
    )


def test_padded_items_never_recommended(problem):
    ue, ie, seen = problem
    idx, _ = fused_topk_retrieval(ue, ie, seen, 10, interpret=True)
    assert (np.asarray(idx) < I).all()


def test_tie_break_lowest_index():
    ue = jnp.ones((4, 8), jnp.float32)
    ie = jnp.ones((20, 8), jnp.float32)  # all scores equal
    seen = jnp.zeros((4, 20), bool)
    idx, _ = fused_topk_retrieval(ue, ie, seen, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.tile(np.arange(5), (4, 1)))


def test_padding_never_wins_below_sentinel_scores():
    """Round-4 review finding: the kernel's 128-lane item padding must rank
    at -inf (mask state 2), NOT at the finite -1024 seen sentinel — a user
    whose every unseen score is below -1024 must still get REAL item ids,
    matching masked_topk on the true catalog exactly."""
    rng = np.random.default_rng(3)
    U2, I2, D2, k = 8, 123, 16, 7  # I=123 pads to 128: 5 phantom lanes
    ue = rng.standard_normal((U2, D2)).astype(np.float32)
    ie = rng.standard_normal((I2, D2)).astype(np.float32)
    # push every score far below the -1024 sentinel
    ue[0] *= 0.0
    ie_scaled = ie * 1.0
    scores_base = ue @ ie_scaled.T
    ue_j = jnp.asarray(ue * 2000.0 / max(1e-9, np.abs(scores_base).max()))
    ue_j = -jnp.abs(ue_j)  # make most scores very negative
    seen = jnp.zeros((U2, I2), bool)
    idx, vals = fused_topk_retrieval(
        ue_j, jnp.asarray(ie_scaled), seen, k, interpret=True
    )
    assert (np.asarray(idx) < I2).all(), "padded pseudo-item id emitted"
    scores = np.asarray(ue_j) @ ie_scaled.T
    want = np.asarray(masked_topk(jnp.asarray(scores), seen, k))
    np.testing.assert_array_equal(np.asarray(idx), want)


def test_seen_sentinel_still_beats_sub_sentinel_unseen():
    """Parity of the -1024 semantics is preserved by the tri-state mask:
    a SEEN item (finite sentinel) can still be emitted over unseen items
    scoring below -1024, exactly like the reference's torch.topk over the
    masked matrix."""
    U2, I2, D2, k = 4, 100, 8, 3
    rng = np.random.default_rng(5)
    ie = rng.standard_normal((I2, D2)).astype(np.float32)
    ue = -np.abs(rng.standard_normal((U2, D2)).astype(np.float32)) * 1e4
    seen = np.zeros((U2, I2), bool)
    seen[:, 0] = True  # one seen item at the -1024 sentinel
    scores = ue @ ie.T
    assert (np.where(~seen, scores, np.inf).min(axis=1) < -1024).all()
    idx, vals = fused_topk_retrieval(
        jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(seen), k, interpret=True
    )
    want = np.asarray(masked_topk(jnp.asarray(scores), jnp.asarray(seen), k))
    np.testing.assert_array_equal(np.asarray(idx), want)


# ---------------------------------------------------------------------------
# streaming (item-tiled) flavor — no catalog-size VMEM cap (VERDICT r4 #5)
# ---------------------------------------------------------------------------


class TestStreamingRetrieval:
    def _problem(self, n_users, n_items, d=16, seed=23):
        rng = np.random.default_rng(seed)
        ue = rng.standard_normal((n_users, d)).astype(np.float32)
        ie = rng.standard_normal((n_items, d)).astype(np.float32)
        seen = rng.random((n_users, n_items)) < 0.3
        return jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(seen)

    @pytest.mark.parametrize("k,item_tile", [(1, 64), (10, 64), (10, 128), (7, 256)])
    def test_matches_masked_topk_across_tiles(self, k, item_tile):
        from lgcnhs_tpu.ops.pallas.retrieval import streaming_topk_retrieval

        ue, ie, seen = self._problem(40, 500)
        idx, vals = streaming_topk_retrieval(
            ue, ie, seen, k, item_tile=item_tile, interpret=True
        )
        scores = ue @ ie.T
        want = np.asarray(masked_topk(scores, seen, k))
        np.testing.assert_array_equal(np.asarray(idx), want)
        masked = np.where(np.asarray(seen), -1024.0, np.asarray(scores))
        np.testing.assert_allclose(
            np.asarray(vals), np.take_along_axis(masked, want, axis=1),
            rtol=1e-5, atol=1e-5,
        )

    def test_tie_break_prefers_earlier_tiles_and_lower_ids(self):
        from lgcnhs_tpu.ops.pallas.retrieval import streaming_topk_retrieval

        ue = jnp.ones((4, 8), jnp.float32)
        ie = jnp.ones((300, 8), jnp.float32)  # all scores equal, 3+ tiles
        seen = jnp.zeros((4, 300), bool)
        idx, _ = streaming_topk_retrieval(ue, ie, seen, 6, item_tile=128,
                                          interpret=True)
        np.testing.assert_array_equal(
            np.asarray(idx), np.tile(np.arange(6), (4, 1))
        )

    def test_sub_sentinel_user_and_padding(self):
        """Tri-state contract across tiles: a user whose every unseen score
        sits below -1024 still gets real ids (tile/lane padding is state 2 =
        -inf, never emitted); seen items CAN back-fill at the sentinel."""
        from lgcnhs_tpu.ops.pallas.retrieval import streaming_topk_retrieval

        rng = np.random.default_rng(5)
        n_items = 190  # pads to 2 tiles of 128
        ue = np.zeros((3, 8), np.float32)
        ie = rng.standard_normal((n_items, 8)).astype(np.float32)
        ie[:, 0] = 1.0 + np.abs(ie[:, 0])
        ue[0, 0] = -3000.0  # user 0: all scores < -1024
        ue[1, 0] = 1.0
        ue[2, 0] = 0.5
        seen = np.zeros((3, n_items), bool)
        idx, _ = streaming_topk_retrieval(
            jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(seen), 9,
            item_tile=128, interpret=True,
        )
        idx = np.asarray(idx)
        assert (idx >= 0).all() and (idx < n_items).all()
        scores = ue @ ie.T
        want = np.asarray(masked_topk(jnp.asarray(scores), jnp.asarray(seen), 9))
        np.testing.assert_array_equal(idx, want)

    def test_pick_stream_tile_vmem_guard(self):
        """Dispatch guard (round-5 review finding): the streaming resident
        set is catalog-independent but linear in D — at wide D the default
        4096 tile alone would blow the ~12 MB budget and Mosaic would fail
        to compile where the old code fell back to XLA. pick_stream_tile
        narrows the tile instead, and returns None (-> XLA fallback in
        retrieve_topk/_chunk_masked_topk/distributed_retrieve_topk) only
        when even a 128-wide tile cannot fit."""
        from lgcnhs_tpu.ops.pallas.retrieval import (
            _VMEM_BUDGET,
            _stream_resident_bytes,
            pick_stream_tile,
        )

        assert pick_stream_tile(64, 100) == 4096  # model D: measured optimum
        wide = pick_stream_tile(1024, 100)
        assert wide is not None and wide < 4096
        assert _stream_resident_bytes(1024, 128, wide) <= _VMEM_BUDGET
        assert _stream_resident_bytes(1024, 128, wide * 2) > _VMEM_BUDGET
        assert pick_stream_tile(200_000, 100) is None  # pathological D

    def test_auto_tile_matches_explicit(self):
        """item_tile=None auto-picks a tile; indices identical to an
        explicit-tile call and to masked_topk."""
        from lgcnhs_tpu.ops.pallas.retrieval import streaming_topk_retrieval

        ue, ie, seen = self._problem(12, 700)
        idx_auto, _ = streaming_topk_retrieval(ue, ie, seen, 5, interpret=True)
        idx_exp, _ = streaming_topk_retrieval(ue, ie, seen, 5, item_tile=256,
                                              interpret=True)
        want = np.asarray(masked_topk(ue @ ie.T, seen, 5))
        np.testing.assert_array_equal(np.asarray(idx_auto), want)
        np.testing.assert_array_equal(np.asarray(idx_exp), want)

    def test_fuzz_matches_masked_topk(self):
        """Seeded breadth fuzz of the streaming merge: random shapes, k,
        tiles (incl. non-dividing ones that force lane padding), seen
        densities, an occasional all-seen user, and int8 tri-state masks
        with explicit state-2 (invalid) columns. Every config must produce
        masked_topk's exact indices (state-2 columns masked to -inf on the
        XLA side)."""
        from lgcnhs_tpu.ops.pallas.retrieval import streaming_topk_retrieval

        rng = np.random.default_rng(123)
        for trial in range(8):
            U = int(rng.integers(3, 30))
            I = int(rng.integers(40, 700))
            d = int(rng.choice([4, 8, 16]))
            k = int(rng.integers(1, min(I, 40)))
            tile = int(rng.choice([32, 64, 128, 256]))
            ue = rng.standard_normal((U, d)).astype(np.float32)
            ie = rng.standard_normal((I, d)).astype(np.float32)
            seen8 = (rng.random((U, I)) < rng.uniform(0.05, 0.6)).astype(np.int8)
            if trial % 2:  # tri-state: a block of invalid (state 2) columns
                n_inv = int(rng.integers(1, I // 4 + 1))
                seen8[:, I - n_inv:] = 2
                # stay in the >= k-real-candidates regime: below it the
                # kernel's documented tail contract (id-0 sentinel slots)
                # intentionally diverges from the lax.top_k oracle, which
                # would return the -inf columns' indices
                k = min(k, I - n_inv)
            if trial % 3 == 0:
                seen8[0, :] = np.where(seen8[0] == 2, 2, 1)  # all-seen user
            scores = ue @ ie.T
            masked = np.where(seen8 == 1, -1024.0, scores)
            masked = np.where(seen8 >= 2, -np.inf, masked)
            want = np.asarray(
                jax.lax.top_k(jnp.asarray(masked), k)[1]
            )
            got, _ = streaming_topk_retrieval(
                jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(seen8), k,
                item_tile=tile, interpret=True,
            )
            np.testing.assert_array_equal(
                np.asarray(got), want,
                err_msg=f"trial={trial} U={U} I={I} d={d} k={k} tile={tile}",
            )

    def test_dispatches_beyond_one_shot_cap(self):
        """The streaming kernel's resident set is catalog-size independent:
        50k items (where fits_vmem_retrieval=False at D=64) must produce
        masked_topk's exact ids."""
        from lgcnhs_tpu.ops.pallas.retrieval import (
            fits_vmem_retrieval,
            streaming_topk_retrieval,
        )

        assert not fits_vmem_retrieval(50_000, 64)
        ue, ie, seen = self._problem(8, 3000, d=8)  # interpret-mode scale
        idx, _ = streaming_topk_retrieval(ue, ie, seen, 10, item_tile=512,
                                          interpret=True)
        want = np.asarray(masked_topk(ue @ ie.T, seen, 10))
        np.testing.assert_array_equal(np.asarray(idx), want)
