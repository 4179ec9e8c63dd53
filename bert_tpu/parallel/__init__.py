from .mesh import make_mesh  # noqa: F401
from .sharding import batch_pspec, param_pspecs  # noqa: F401
from .spmd import make_sharded_encode_fn, shard_params  # noqa: F401
