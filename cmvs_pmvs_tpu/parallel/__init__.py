from .sharding import make_mesh, sharded_refine_step  # noqa: F401
