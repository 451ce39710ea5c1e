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
