from . import sharded, sharded2d  # noqa: F401
from .sharded import ShardedFrontEnd, measure_scaling_efficiency  # noqa: F401
from .sharded2d import Sharded2DFrontEnd  # noqa: F401
