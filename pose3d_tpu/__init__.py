"""pose3d_tpu — TPU-native triplet-manifold 3D pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the Wohlhart-Lepetit descriptor
pipeline (reference: mingliangfu/3DPoseEstimation, C++/Caffe/OpenGL), built
TPU-first:

* compute path: jitted XLA programs, MXU matmuls for kNN / rasterization,
  fused on-device triplet batch assembly and augmentation;
* scale-out: ``jax.sharding.Mesh`` + data-parallel sharding over ICI;
* host path: thin NumPy/h5py orchestration plus a native C++ data plane.

Layout mirrors the reference's layer map (SURVEY.md §1) but each layer is
re-architected for XLA's compilation model rather than translated.
"""

__version__ = "0.1.0"

from pose3d_tpu.config import Config, load_config  # noqa: F401
