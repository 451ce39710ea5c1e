"""Distributed serving composition: shard-local retrieval + global merge."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lgcnhs_tpu.ops.topk import masked_topk
from lgcnhs_tpu.parallel.sharding import distributed_retrieve_topk
from lgcnhs_tpu.runtime.mesh import make_mesh

U, I, D = 32, 128, 8


@pytest.fixture
def problem():
    rng = np.random.default_rng(9)
    ue = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
    ie = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    seen = jnp.asarray(rng.random((U, I)) < 0.2)
    return ue, ie, seen


@pytest.mark.parametrize("mesh_shape", [(1, 8), (1, 4), (2, 4)])
def test_matches_single_device(problem, mesh_shape):
    ue, ie, seen = problem
    mesh = make_mesh(mesh_shape)
    ie_sh = jax.device_put(ie, NamedSharding(mesh, P("model", None)))
    seen_sh = jax.device_put(seen, NamedSharding(mesh, P(None, "model")))
    got = np.asarray(distributed_retrieve_topk(mesh, ue, ie_sh, seen_sh, 9))
    want = np.asarray(masked_topk(ue @ ie.T, seen, 9))
    np.testing.assert_array_equal(got, want)


def test_rejects_oversized_k(problem):
    ue, ie, seen = problem
    mesh = make_mesh((1, 8))
    with pytest.raises(ValueError, match="exceeds shard width"):
        distributed_retrieve_topk(mesh, ue, ie, seen, k=17)
