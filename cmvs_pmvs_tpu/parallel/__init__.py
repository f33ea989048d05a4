from .sharding import make_mesh, sharded_refine_step  # noqa: F401
from .clusters import (  # noqa: F401
    assign_clusters, discover_options, merge_models, run_clusters,
)
