"""FLASHE-TPU: a TPU-native secure-aggregation framework for cross-silo
federated learning.

A from-scratch reimplementation of the capability set of SamuelGong/FLASHE
(arXiv:2109.00675, a fork of FATE v1.2.0) designed for TPUs:

- the FLASHE additively-symmetric HE cipher (PRP-derived double masking
  mod 2^m) as vectorized JAX/Pallas lane kernels,
- ACIQ quantization with stochastic rounding,
- general-HE baselines (Paillier / BFV / CKKS) as limb/NTT kernels,
- a guest/host/arbiter aggregation protocol over a tag-addressed
  federation transport,
- flax trainer harness and multi-chip sharding via jax.sharding.

Reference parity map: see SURVEY.md section 2 and docs/PARITY.md.
"""

__version__ = "0.1.0"
