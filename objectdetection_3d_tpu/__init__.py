"""objectdetection_3d_tpu — TPU-native 3D object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
michalp0lak/ObjectDetection_3D (PointPillars-style forest-LiDAR tree-trunk
detection with 9-parameter, fully rotated boxes):

- static-shape, padding-masked device voxelization (sort + segment ops)
  instead of a host-side numba loop,
- dense XLA convolutions with active-site masking that reproduce the
  reference's submanifold/sparse conv semantics exactly,
- an exact rotated-3D-box IoU built from static-shape half-space clipping
  instead of the pytorch3d C++/CUDA extension,
- fixed-size masked greedy NMS under `jax.jit`,
- data parallelism via `jax.sharding.Mesh` + XLA collectives.

Public surface mirrors the reference: ``run_training.py`` / ``run_testing.py``
/ ``show_inference.py`` entry scripts driven by the same ``config.yaml``
schema, the same ``ForestDataset`` ``.npy`` contract, and the same
focal / smooth-L1 / cross-entropy loss semantics.
"""

__version__ = "0.1.0"
