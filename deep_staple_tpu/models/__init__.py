from .lraspp3d import MobileNetLRASPP3D, MobileNetASPP3D
from .lraspp2d import LRASPPMobileNetV3Large2D

__all__ = ["MobileNetLRASPP3D", "MobileNetASPP3D", "LRASPPMobileNetV3Large2D"]
