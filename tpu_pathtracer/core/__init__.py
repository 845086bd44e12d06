from . import color, geometry, math3d, sampling, spectrum  # noqa: F401
