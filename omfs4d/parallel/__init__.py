from omfs4d.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    TILE_AXIS,
    get_mesh,
    make_mesh,
    shard_batch,
    shard_frames,
    replicate,
)
