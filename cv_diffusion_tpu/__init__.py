"""TPU-native conditional-diffusion framework for low-light image enhancement.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
PyTorch project (efficient UNet + LCM scheduler + trainer + export stack).
"""

__version__ = "0.1.0"
