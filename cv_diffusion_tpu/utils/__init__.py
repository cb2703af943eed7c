from . import profiling
from . import torch_compat
