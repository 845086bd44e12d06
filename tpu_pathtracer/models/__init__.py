from . import bsdf, camera  # noqa: F401
