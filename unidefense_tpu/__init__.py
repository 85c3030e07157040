"""unidefense_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for unified
face forgery + presentation-attack detection.

Capability parity target: VISION-SJTU/UniDefense (IJCV 2024, "Towards Unified
Defense for Face Forgery and Spoofing Attacks via Dual Space Reconstruction
Learning"). This is a ground-up TPU-first redesign, not a port:

* functional core — one jitted two-pass train step instead of an eager
  engine loop (reference: engine/abstract_engine.py:207-381),
* explicit PRNG threading instead of global seeds,
* data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives instead of DDP/NCCL (reference: engine/forgery_engine.py:51,144),
* NHWC layout and bf16-friendly compute for the MXU,
* device-resident preprocessing instead of an in-loop cv2 pipeline
  (reference: dataset/abstract_dataset.py:101-160).
"""

from unidefense_tpu.version import __version__

__all__ = ["__version__"]
