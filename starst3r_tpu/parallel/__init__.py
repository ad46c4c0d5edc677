from .mesh import make_mesh, local_mesh, replicated, shard_along, P, NamedSharding
