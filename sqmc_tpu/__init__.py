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


def __getattr__(name):
    """Lazy top-level API (avoids importing heavy modules at package
    import): run_hci, do_pt, run_walk, run_dense_walk, make_chem_system,
    make_heg_system, make_hubbard_k_system, run_vmc, run_cpmc, ..."""
    _API = {
        "run_hci": ("sqmc_tpu.algo.hci", "run_hci"),
        "run_eps_series": ("sqmc_tpu.algo.hci", "run_eps_series"),
        "do_pt": ("sqmc_tpu.algo.pt", "do_pt"),
        "run_walk": ("sqmc_tpu.algo.walk", "run_walk"),
        "WalkConfig": ("sqmc_tpu.algo.walk", "WalkConfig"),
        "run_dense_walk": ("sqmc_tpu.algo.densewalk", "run_dense_walk"),
        "DenseWalkConfig": ("sqmc_tpu.algo.densewalk", "DenseWalkConfig"),
        "perform_selected_ci": ("sqmc_tpu.algo.legacy_ci",
                                "perform_selected_ci"),
        "perform_truncated_lanczos": ("sqmc_tpu.algo.legacy_ci",
                                      "perform_truncated_lanczos"),
        "build_trial_wavefunction": ("sqmc_tpu.algo.semistoch",
                                     "build_trial_wavefunction"),
        "build_trial_iterate": ("sqmc_tpu.algo.semistoch",
                                "build_trial_iterate"),
        "generate_space_iterate": ("sqmc_tpu.algo.semistoch",
                                   "generate_space_iterate"),
        "load_trial_from_reference": ("sqmc_tpu.algo.semistoch",
                                      "load_trial_from_reference"),
        "make_gutzwiller_guiding": ("sqmc_tpu.algo.guiding",
                                    "make_gutzwiller_guiding"),
        "make_table_guiding": ("sqmc_tpu.algo.guiding",
                               "make_table_guiding"),
        "matrix_lanczos_on_the_fly": ("sqmc_tpu.algo.legacy_ci",
                                      "matrix_lanczos_on_the_fly"),
        "make_chem_system": ("sqmc_tpu.systems.base", "make_chem_system"),
        "make_heg_system": ("sqmc_tpu.systems.heg.system",
                            "make_heg_system"),
        "make_hubbard_k_system": ("sqmc_tpu.systems.hubbard.system",
                                  "make_hubbard_k_system"),
        "make_hubbard_real_system": ("sqmc_tpu.systems.hubbard.system",
                                     "make_hubbard_real_system"),
        "make_fictitious_system": ("sqmc_tpu.systems.toy",
                                   "make_fictitious_system"),
        "make_read_system": ("sqmc_tpu.systems.toy", "make_read_system"),
        "run_vmc": ("sqmc_tpu.systems.hubbard.vmc", "run_vmc"),
        "run_cpmc": ("sqmc_tpu.systems.hubbard.cpmc", "run_cpmc"),
        "CpmcConfig": ("sqmc_tpu.systems.hubbard.cpmc", "CpmcConfig"),
        "get_1rdm": ("sqmc_tpu.algo.rdm", "get_1rdm"),
        "greens_function_g0": ("sqmc_tpu.algo.greens",
                               "greens_function_g0"),
        "make_mesh": ("sqmc_tpu.parallel.dist", "make_mesh"),
        "parse_input": ("sqmc_tpu.config", "parse_input"),
    }
    if name in _API:
        import importlib
        mod, attr = _API[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'sqmc_tpu' has no attribute {name!r}")
