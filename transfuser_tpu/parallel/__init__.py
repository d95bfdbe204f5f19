from .sharding import (MeshSpec, batch_sharding, make_mesh,  # noqa: F401
                       opt_state_sharding, param_sharding)
