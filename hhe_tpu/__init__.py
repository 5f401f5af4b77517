"""hhe_tpu — TPU-native privacy-preserving ML through hybrid homomorphic encryption.

A from-scratch re-design of harpocrates-project/Privacy-Preserving-ML-through-HHE
for TPU hardware (JAX / XLA / Pallas / pjit):

- ``hhe_tpu.ops``     — RNS-BFV homomorphic encryption engine (the SEAL-4.0 BFV
  equivalent, reference ``libs/seal/``), PASTA-3 symmetric cipher and SHAKE128
  expansion (reference ``src/pasta/pasta_3_plain.cpp``), the homomorphic
  transcipher (reference ``src/pasta/pasta_3_seal.cpp``), and HE linear algebra
  (reference ``src/pasta/SEAL_Cipher.cpp``, ``src/util/sealhelper.cpp``).
- ``hhe_tpu.models``  — integer-only neural nets (the PocketNN equivalent,
  reference ``libs/pocketnn/``) with DFA training as JAX transforms.
- ``hhe_tpu.parallel``— device-mesh sharding of ciphertext batches and RNS limbs.
- ``hhe_tpu.parties`` — the three-party protocol (Analyst / User / CSP) over gRPC
  (reference ``src/examples/*/``, ``protos/hhe.proto``).
- ``hhe_tpu.utils``   — config system (reference ``configs/config.cpp``), checks,
  metrics, serialization.

Design notes: ciphertexts are uint32 RNS tensors of shape ``[n_polys, limbs, N]``
(64-bit modular arithmetic is built from 32-bit digits — TPU has no u64 multiply);
all evaluator operations are pure jittable functions; sample batches shard over a
``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
