from lgcnhs_tpu.runtime.logging import get_logger, stage_timer, timed  # noqa: F401
from lgcnhs_tpu.runtime.cache import ArtifactCache  # noqa: F401
from lgcnhs_tpu.runtime.mesh import make_mesh, mesh_axes  # noqa: F401
