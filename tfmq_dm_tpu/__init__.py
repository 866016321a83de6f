"""TFMQ-DM-TPU: a TPU-native post-training-quantization + sampling framework
for diffusion models (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of ModelTC/TFMQ-DM (CVPR 2024 /
TPAMI 2025) — TIAR (Temporal-Information-Aware Reconstruction) and FSC
(Finite Set Calibration) on top of BRECQ/AdaRound-style block
reconstruction — designed TPU-first:

- pure-functional UNets over explicit parameter pytrees (no module surgery);
  quantization enters at named call sites via a `QuantCtx`
- samplers are single `lax.scan` programs; FSC per-timestep activation
  params are batched arrays indexed inside the scan (no host round trips)
- calibration-data harvesting is one scan emitting every intermediate
  latent (O(T) instead of the reference's O(T^2) re-sampling)
- reconstruction loops are jitted optax/`lax.scan` programs
- real int8/int4 Pallas MXU kernels for deployment (the reference only
  fake-quantizes in fp32 and defers integer speed to OpenVINO)
- multi-chip scaling via `jax.sharding.Mesh` + collectives over ICI.
"""

__version__ = "0.1.0"
