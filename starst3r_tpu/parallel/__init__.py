from .distributed import (initialize_distributed, pair_sharding, replicate,
                          shard_gs_state)
from .mesh import (make_mesh, local_mesh, replicated, shard_along, P,
                   NamedSharding)
from .tp import tp_param_specs, tp_shard_params
