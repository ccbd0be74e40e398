"""Hot-path operators: Pallas TPU kernels and their XLA-level building blocks.

The native compute layer of the framework (SURVEY.md §2.3): where the reference
leaned on vendored NumPy/PyTorch kernels, this package provides fused Pallas
kernels (path simulation with on-chip counter-based RNG) plus the LSM feature
basis. Every kernel has a pure-XLA twin in models/ with identical semantics.
"""

from options_model_tpu.ops.lsm_basis import regression_features, NUM_FEATURES

__all__ = ["regression_features", "NUM_FEATURES"]
