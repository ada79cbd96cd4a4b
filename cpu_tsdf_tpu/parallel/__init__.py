from .sharding import (  # noqa: F401
    integrate_sharded,
    make_tsdf_mesh,
    render_view_sharded,
    replicate_volume,
    shard_volume,
)
