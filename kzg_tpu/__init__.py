"""kzg_tpu: a TPU-native KZG polynomial-commitment framework
(EIP-4844 Proto-Danksharding + EIP-7594 PeerDAS) built on JAX/XLA/Pallas."""

__version__ = "0.1.0"
