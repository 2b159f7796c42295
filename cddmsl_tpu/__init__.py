"""cddmsl_tpu: a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
sinamalakouti/CDDMSL (Detectron2/RegionCLIP-based semi-supervised domain-generalized
detection), re-designed TPU-first.

Design stance (vs the PyTorch reference at /root/reference):
  * one jitted program per (config, mode) — static shapes via pad-and-mask
  * NHWC layout everywhere (TPU conv-friendly), bf16 compute / fp32 params
  * parallelism via jax.sharding.Mesh + collectives, not process-per-device DDP
  * boxes/instances are fixed-capacity pytrees with validity masks
"""

__version__ = "0.1.0"
