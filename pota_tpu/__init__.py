"""pota_tpu — a TPU-native differentiable polynomial-optics lens renderer.

Brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
zpelgrims/pota ("lentil"): physically-based camera simulation (extended
thin-lens + sparse polynomial optics fitted to real lens prescriptions),
image-based bokeh importance sampling, and bidirectional energy
redistribution of bright out-of-focus samples — re-designed array-first for
TPU hardware.  See SURVEY.md at the repo root for the structural map of the
reference this build follows.
"""

from .config import CameraConfig, CameraType, ChromaticType, RenderConfig, UnitModel

__version__ = "0.1.0"

__all__ = [
    "CameraConfig",
    "RenderConfig",
    "CameraType",
    "UnitModel",
    "ChromaticType",
]
