from lgcnhs_tpu.native.bindings import (  # noqa: F401
    available,
    build_csr,
    count_degrees,
    parse_edges_csv,
)
