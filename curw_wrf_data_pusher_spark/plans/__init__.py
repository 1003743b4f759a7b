from .config import WrfConfig
from .hybrid import build_hybrid_rfield
from .rfields import build_rfields
from .wrf_push import push_wrf_grid

__all__ = ["WrfConfig", "build_hybrid_rfield", "build_rfields", "push_wrf_grid"]
