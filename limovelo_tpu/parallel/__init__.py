from .sharding import AXIS, dryrun, make_mesh, make_sharded_step

__all__ = ["AXIS", "dryrun", "make_mesh", "make_sharded_step"]
