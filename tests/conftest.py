"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md section 4).

Note: the container's sitecustomize imports jax and registers the 'axon' TPU
backend before pytest starts, so JAX_PLATFORMS env tweaks are too late; we
must use jax.config.update after import instead.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (deselect with -m 'not slow' "
        "for the fast tier; CI target < 5 min)")


# Long-running tests (measured >= ~30 s) get the `slow` marker centrally;
# the fast tier is `pytest -m "not slow"` (target < 5 min).
_SLOW_TESTS = {
    "test_heg_i_st_e2e",
    "test_heg_i_det_e2e",
    "test_f32_state_walk_accuracy",
    "test_walk_identical",
    "test_rdm_identical",
    "test_distributed_pt_matches_serial",
    "test_sharded_walk_deterministic_same_seed",
    "test_hubbard2_fixed_node_from_cards",
    "test_sharded_walk_unbiased",
    "test_capacity_escalation",
    "test_walk_chem_proposals_unbiased",
    "test_walk_uniform_proposal_unbiased",
    "test_walk_stochastic_unbiased",
    "test_walk_exact_deterministic_limit",
    "test_walk_hubbardk_vs_fci",
    "test_importance_sampling_unbiased",
    "test_release_node_recovers_exact",
    "test_fixed_node_matches_dense_oracle",
    "test_table_guiding_matches_gutzwiller",
    "test_hci_energy_identical",
    "test_pt_identical",
    "test_triplet_sector_higher",
    "test_run_eps_series_extrapolation",
    "test_pt_memory_autosize_and_reuse",
    "test_active_space_restricts_and_raises_energy",
    "test_semistochastic_pt_golden",
    "test_ts_walk_stochastic_unbiased",
    "test_curve_goldens_reproduce",
    "test_time_sym_extrapolation_consistent",
    "test_chem_walk_from_cards",
    "test_variational_scale_100k",
    "test_walkalize_and_histogram",
    "test_ct_walk_unbiased_at_large_tau",
    "test_initiator_on_accuracy_and_effect",
    # round-5 re-tier (VERDICT r4 item 6; measured on this 1-vCPU host,
    # /tmp/r5_fast_tier.log 2026-08-21: tier was 21:50): every entry
    # below measured >= ~16 s and has a faster sibling keeping its
    # subsystem covered in the fast tier
    "test_ct_heg_unbiased_at_large_tau",            # 405 s
    "test_ct_generic_chem_unbiased_at_large_tau",   # 189 s
    "test_walk_deterministic_limit_w2",             # 66 s
    "test_hf_to_psit_card_forces_psit_into_d",      # 41 s
    "test_walk_quantized_selection_unbiased",       # 38 s
    "test_ct_in_d_trace_is_shifted_gather_trace",   # 33 s
    "test_sharded_dense_projection_matches_ell",    # 27 s
    "test_pscan_u32_fields_sign_flip_domain",       # 26 s
    "test_walk_trajectory_bitwise_invariant",       # 25 s
    "test_ts_walk_exact_deterministic_limit",       # 19 s
    "test_deterministic_pt_golden",                 # 16 s
    "test_devpt_alias_matches_host",                # 16 s
    "test_trial_iterate_drives_exact_walk",         # 13 s
    "test_ensure_psit_in_imp_subset",               # 11 s
}

# parametrized cases demoted individually (full item name, with params):
# the remaining params keep the oracle in the fast tier
_SLOW_ITEMS = {
    "test_pscan_matches_xla_six_fields[70000]",     # 42 s
    "test_pscan_matches_xla_six_fields[4096]",      # 19 s
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        if (item.name.split("[")[0] in _SLOW_TESTS
                or item.name in _SLOW_ITEMS):
            item.add_marker(_pytest.mark.slow)
