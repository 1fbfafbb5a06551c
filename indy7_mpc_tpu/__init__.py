"""indy7_mpc_tpu: TPU-native batched SQP-MPC framework for the Indy7 arm.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
A2R-Lab/indy7-mpc: batched rigid-body dynamics, block-tridiagonal KKT
(Riccati) QP solves, SQP trajectory optimization, sampled
wrench-hypothesis MPC, and lane-axis sharding across TPU meshes.
"""

__version__ = "0.1.0"
