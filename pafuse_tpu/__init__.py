"""PAFUSE-TPU: TPU-native part-based diffusion for 3D whole-body pose estimation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of valeoai/PAFUSE
(part-specific MixSTE spatio-temporal transformers + D3DP-style conditional
diffusion, trained/evaluated on H3WB).
"""

__version__ = "0.1.0"
