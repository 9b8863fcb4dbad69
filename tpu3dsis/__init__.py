"""tpu3dsis — a TPU-native JAX/XLA/Pallas rebuild of 3D-SIS.

3D semantic instance segmentation of RGB-D scans (3D Faster/Mask-R-CNN over
TSDF voxel grids, with a multi-view 2D color stream back-projected into 3D).

This is a from-scratch TPU-first framework with the capabilities of the
reference CUDA/PyTorch implementation (Sekunde/3D-SIS):

  - dense 3D conv backbones + 3D RPN + classification head + mask head
    as pure-functional JAX models (pytree params, NDHWC layout, jit/pjit)
  - custom CUDA ops (3D NMS, 3D RoI max-pool) re-designed as fixed-shape
    XLA programs / Pallas TPU kernels
  - 2D->3D projection as a dense per-voxel gather (instead of host-side
    index-list scatter), vmapped over views
  - whole-scene inference via static-shape sliding-window chunk tiling
  - data-parallel training via jax.sharding.Mesh + shard_map collectives

Layer map mirrors SURVEY.md section 7.
"""

__version__ = "0.1.0"
