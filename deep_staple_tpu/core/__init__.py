from .cache import enable_persistent_compile_cache
from .config import TrainConfig, DataParamMode, LabelDisturbanceMode, DotDict
from .determinism import reset_determinism, seeded_rng

__all__ = [
    "TrainConfig",
    "DataParamMode",
    "LabelDisturbanceMode",
    "DotDict",
    "reset_determinism",
    "seeded_rng",
    "enable_persistent_compile_cache",
]
