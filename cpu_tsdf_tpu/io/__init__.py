from . import checkpoint, pcd, ply, poses, vol  # noqa: F401
from .checkpoint import load_any, load_checkpoint, save_checkpoint  # noqa: F401
