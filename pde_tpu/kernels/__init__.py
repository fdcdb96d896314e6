"""Pallas TPU kernels for the hot relaxation sweeps (filled in iteratively).

Pure-JAX reference implementations live in pde_tpu.solvers; kernels here
are drop-in replacements validated against them.
"""
