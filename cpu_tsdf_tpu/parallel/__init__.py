from .raycast import render_view_pallas_sharded  # noqa: F401
from .sharding import (  # noqa: F401
    integrate_sharded,
    make_tsdf_mesh,
    render_view_sharded,
    replicate_volume,
    shard_volume,
)
