"""CerberusDet-TPU: a TPU-native (JAX/XLA/Pallas) multi-dataset object detection framework.

A from-scratch re-design of the capabilities of ai-forever/CerberusDet
(multi-task YOLOv8: shared backbone, partially-shared FPN neck, per-task
detection heads, gradient-averaging multi-task training) built TPU-first:

- NHWC layouts, bf16 compute on the MXU, XLA-fused convolutions.
- The multi-task branched graph is resolved to a *static* execution plan at
  config time (no runtime DAG walk; reference: cerberusdet/models/cerberus.py).
- Data parallelism via jax.sharding.Mesh + ICI collectives (no NCCL/DDP).
- Device-side NMS with fixed shapes.
"""

__version__ = "0.1.0"
