from . import color, fusion, interpolate, raycast  # noqa: F401
