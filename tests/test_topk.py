import numpy as np
import pytest

from lgcnhs_tpu.ops.topk import MASK_VALUE, masked_topk, rank_exclude_seen
from tests import reference_formulas as ref


def _seen_lists(seen):
    return {u: list(np.flatnonzero(seen[u])) for u in range(seen.shape[0])}


def test_mask_value_is_reference_sentinel():
    assert MASK_VALUE == -1024.0


def test_masked_topk_excludes_seen():
    rng = np.random.default_rng(1)
    scores = rng.standard_normal((8, 50)).astype(np.float32)
    seen = rng.random((8, 50)) < 0.3
    rec = np.asarray(masked_topk(scores, seen, 5))
    for u in range(8):
        # no seen item recommended unless fewer than k unseen exist
        unseen = np.flatnonzero(~seen[u])
        assert len(set(rec[u]) & set(np.flatnonzero(seen[u]))) == 0 or len(unseen) < 5
        # matches numpy topk on masked scores
        m = scores[u].copy()
        m[seen[u]] = MASK_VALUE
        want = np.argsort(-m, kind="stable")[:5]
        np.testing.assert_array_equal(np.sort(rec[u]), np.sort(want))


@pytest.mark.parametrize("filter_seen", [True, False])
def test_rank_exclude_seen_matches_numpy_reference(filter_seen):
    rng = np.random.default_rng(2)
    # quantized scores force plenty of ties to exercise the [::-1] tie order
    F = np.round(rng.random((12, 40)) * 5).astype(np.float32)
    seen = rng.random((12, 40)) < 0.25
    k = 7
    got = np.asarray(rank_exclude_seen(F, seen, k, filter_seen=filter_seen))
    want = ref.ref_rank_filter(F, _seen_lists(seen), k, filter_seen=filter_seen)
    np.testing.assert_array_equal(got, want)


def test_rank_all_zero_resource_ties():
    """All-tied rows must reproduce numpy's reversed order exactly."""
    F = np.zeros((3, 10), dtype=np.float32)
    seen = np.zeros((3, 10), dtype=bool)
    seen[1, 9] = True
    got = np.asarray(rank_exclude_seen(F, seen, 4))
    want = ref.ref_rank_filter(F, _seen_lists(seen), 4)
    np.testing.assert_array_equal(got, want)


class TestRankExcludeSeenTopk:
    """rank_exclude_seen_topk must be bit-identical to rank_exclude_seen."""

    def _compare(self, resource, seen, k, filter_seen=True):
        from lgcnhs_tpu.ops.topk import rank_exclude_seen_topk

        a = np.asarray(rank_exclude_seen(resource, seen, k, filter_seen))
        b = np.asarray(rank_exclude_seen_topk(resource, seen, k, filter_seen))
        np.testing.assert_array_equal(a, b)

    def test_random_scores(self):
        rng = np.random.default_rng(0)
        resource = rng.standard_normal((37, 53)).astype(np.float32)
        seen = rng.random((37, 53)) < 0.3
        for k in (1, 5, 10):
            self._compare(resource, seen, k)

    def test_heavy_ties(self):
        rng = np.random.default_rng(1)
        # scores drawn from 4 distinct values -> massive tie groups
        resource = rng.integers(0, 4, (29, 41)).astype(np.float32)
        seen = rng.random((29, 41)) < 0.4
        self._compare(resource, seen, 7)

    def test_all_tied(self):
        resource = np.zeros((5, 12), np.float32)
        seen = np.zeros((5, 12), bool)
        seen[2, :3] = True
        self._compare(resource, seen, 6)

    def test_backfill_users_with_few_unseen(self):
        rng = np.random.default_rng(2)
        resource = rng.standard_normal((8, 20)).astype(np.float32)
        seen = np.zeros((8, 20), bool)
        seen[0] = True            # zero unseen -> all k backfilled
        seen[1, :15] = True       # 5 unseen < k=9 -> partial backfill
        seen[2, 1:] = True        # exactly 1 unseen
        self._compare(resource, seen, 9)

    def test_no_filter_quirk(self):
        rng = np.random.default_rng(3)
        resource = rng.integers(0, 3, (11, 17)).astype(np.float32)
        seen = rng.random((11, 17)) < 0.5
        self._compare(resource, seen, 4, filter_seen=False)

    def test_negative_scores(self):
        rng = np.random.default_rng(4)
        resource = -np.abs(rng.standard_normal((9, 15)).astype(np.float32)) - 1e3
        seen = rng.random((9, 15)) < 0.3
        self._compare(resource, seen, 5)

    def test_k_exceeds_catalog_clamps(self):
        """k > I returns the same I-wide result as rank_exclude_seen's slice
        (ADVICE r2: lax.top_k would raise without the clamp)."""
        rng = np.random.default_rng(5)
        resource = rng.standard_normal((6, 9)).astype(np.float32)
        seen = rng.random((6, 9)) < 0.3
        for filter_seen in (True, False):
            self._compare(resource, seen, 15, filter_seen=filter_seen)

    def test_neg_inf_seen_entries_are_safe(self):
        """-inf in SEEN entries (the distributed path's padding) is within
        the documented precondition and must stay bit-identical."""
        rng = np.random.default_rng(6)
        resource = rng.standard_normal((7, 13)).astype(np.float32)
        seen = rng.random((7, 13)) < 0.3
        seen[:, -3:] = True
        resource[:, -3:] = -np.inf
        self._compare(resource, seen, 5)
