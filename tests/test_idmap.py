import numpy as np

from lgcnhs_tpu.config import load_config
from lgcnhs_tpu.data.idmap import IdMapper
from lgcnhs_tpu.data.ratings import prepare_ratings
from lgcnhs_tpu.data.synthetic import synthesize_movielens_like


def test_idmap_roundtrip():
    cfg = load_config(env="dev", dataset="synthetic", model="HybridS")
    df = synthesize_movielens_like(30, 50, 800, seed=4)
    splits = prepare_ratings(df, cfg)
    mapper = IdMapper.from_splits(splits)

    raw_users = list(splits.uid_mapping)[:5]
    internal = mapper.users_to_internal(raw_users)
    assert [mapper.internal_to_uid[i] for i in internal] == raw_users

    rec = np.tile(np.arange(3, dtype=np.int32), (splits.n_users, 1))
    decoded = mapper.decode_recommendations(rec)
    assert len(decoded) == splits.n_users
    first_user = mapper.internal_to_uid[0]
    assert decoded[first_user] == [mapper.internal_to_iid[i] for i in range(3)]
