"""gaussian_lic_tpu — TPU-native photo-realistic 3DGS mapping for LiDAR-Inertial-Camera SLAM.

A from-scratch JAX/XLA/Pallas framework with the capabilities of APRIL-ZJU/Gaussian-LIC
(reference: /root/reference). See DESIGN.md for the architecture and SURVEY.md for the
component-by-component mapping to the reference.
"""

from gaussian_lic_tpu.config import Params, load_params, PRESETS
from gaussian_lic_tpu.camera import Intrinsics, CameraPose, Camera, make_camera

__version__ = "0.1.0"

__all__ = [
    "Params",
    "load_params",
    "PRESETS",
    "Intrinsics",
    "CameraPose",
    "Camera",
    "make_camera",
]
