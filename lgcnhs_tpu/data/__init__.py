from lgcnhs_tpu.data.ratings import RatingSplits, prepare_ratings  # noqa: F401
from lgcnhs_tpu.data.graph import (  # noqa: F401
    InteractionGraph,
    build_graph,
    interaction_matrix,
    item_degrees,
    pos_bool_matrix,
)
from lgcnhs_tpu.data.synthetic import synthesize_movielens_like  # noqa: F401
