"""sqmc_tpu — TPU-native semistochastic quantum Monte Carlo / SHCI framework.

A from-scratch JAX/Pallas re-design of the capabilities of QMC-Cornell/sqmc
(reference: Fortran+MPI, see /root/reference).  The compute path is jit-compiled
XLA with Pallas kernels for the hot ops; parallelism is expressed as shardings
over a `jax.sharding.Mesh` (determinant/walker sharding == the reference's
MPI rank sharding, ref `mpi_routines.f90:419` `get_det_owner`).

Numerical precision: quantum-chemistry energies need ~1e-9 relative accuracy,
so all energy accumulation is float64 (x64 mode is enabled on import).  Hot
stochastic kernels may downcast internally where statistically safe.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
