"""cpu_tsdf_tpu: a TPU-native differentiable TSDF fusion framework.

Brand-new JAX/XLA/Pallas re-design with the capabilities of sdmiller/cpu_tsdf
(mounted read-only at /root/reference): projective depth fusion into a
truncated signed distance field, raycast rendering, trilinear field queries
with analytic gradients/Hessians, color fusion (RGB / RGBNormalized / LAB),
checkpointing (native + reference-compatible .vol), marching-cubes isosurface
extraction, and a CLI pipeline — all as pure functional transforms over a
dense/brick-sparse voxel grid that shards across a TPU mesh.
"""

from .config import TSDFConfig, snap_resolution_pow2  # noqa: F401
from .volume import TSDFVolume, make_volume, reset  # noqa: F401
from .ops.fusion import integrate  # noqa: F401
from .ops.raycast import RenderResult, render_view  # noqa: F401
from .ops import interpolate  # noqa: F401
from .bricks import (  # noqa: F401
    BrickVolume,
    PackedRenderVolume,
    from_dense,
    integrate_bricks,
    make_brick_volume,
    pack_render,
    to_dense,
)

__version__ = "0.1.0"
