from . import compile_opts
from . import profiling
from . import torch_compat
