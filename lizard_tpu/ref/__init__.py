"""Bit-exact scalar oracle implementations (NumPy/Python).

These pin the format semantics and serve as the correctness reference for
the JAX/Pallas kernels. They are intentionally simple and slow; the TPU path
lives in lizard_tpu.ops / lizard_tpu.parallel.
"""
