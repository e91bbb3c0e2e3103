from hippomm_tpu.parallel.mesh import make_mesh, param_shardings  # noqa: F401
from hippomm_tpu.parallel.sharded_store import ShardedFeatureStore  # noqa: F401
