"""tpu-pathtracer: a TPU-native progressive spectral path tracer in JAX/Pallas.

Built from scratch with the capabilities of the Metal reference renderer
(serhii-rieznik/metal-renderer); see SURVEY.md at the repo root for the layer map
this framework mirrors and the TPU-first design decisions.
"""

__version__ = "0.1.0"

from .config import ComparisonMode, NoiseMode, RenderConfig  # noqa: F401
