"""CLI compatibility: the reference's own e2e input files must run
unchanged and reproduce the golden numbers the reference's checker greps
(src/e2e_tests/e2e_check.py patterns)."""

import re
import pytest

import numpy as np
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_heg_i_det_e2e():
    out = subprocess.run(
        [sys.executable, "-m", "sqmc_tpu", "-i",
         "/root/reference/src/e2e_tests/heg/i_det", "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout
    m = re.search(r"Variational energy\s*=\s*([-+0-9.]+)", text)
    assert m and abs(float(m.group(1)) - 58.276906085) < 1e-6
    m = re.search(r"Second-order PT energy lowering\s*=\s*([-+0-9.]+)", text)
    assert m and abs(float(m.group(1)) - (-0.000939196)) < 1e-8
    m = re.search(r"Total energy \(includ. Madelung\)\s*=\s*([-+0-9.]+)", text)
    assert m and abs(float(m.group(1)) - 48.051813420) < 1e-7


def test_namelist_parsing():
    from sqmc_tpu.config import parse_input
    with open("/root/reference/src/e2e_tests/heg/i_st") as f:
        cfg = parse_input(f.read())
    assert cfg.n_mc == 200
    assert abs(cfg.eps_pt_big - 8.1920e-4) < 1e-12
    with open("/root/reference/C2_v2z_curve/r1.24253/i_1sigma_g") as f:
        cfg2 = parse_input(f.read())
    assert cfg2.run_type == "hci"
    assert cfg2.n_states == 2
    assert cfg2.time_sym and cfg2.z == 1
    assert cfg2.norb == 26
    assert cfg2.eps_var_sched[:2] == [2e-3, 2e-3]
    assert cfg2.hf_symmetry == 1


FICTITIOUS_INPUT = """\
1234567 7654321                    irand_seed
100 8 2 0                          nstep,nblk,nblk_eq,ipr
500 2000 0                         w_abs_gen_begin, w_abs_gen_target, MWALK
0.5 0.                             tau_multiplier, tau
1. 2.                              reweight_factor_inv_max_multiplier, reweight_factor_inv_max
10. 0. 0.25                        population_control_expon, e_trial_initial, min_wt
heat_bath2 0 1. 0 1.               proposal_method, importance_sampling, r_initiator, initiator_power, initiator_rescale_power
none                               run_type
.false. f                          semistochastic, use_exponential_projector
'fictitious' 0                     hamiltonian_type,ipr
1 1. 1. 0.5 1.0                    bosonic, spectrum_coef, spectrum_power, ham_diag_fluc, ham_offdiag_fluc
20                                 ndet
1                                  diagonalize_ham
2                                  ndet_psi_t
1 2                                iwdet_psi_t
0.9 0.3                            cdet_psi_t
"""


def test_fictitious_walk_from_cards(tmp_path):
    """run_type=none on a fictitious matrix through the card CLI; the
    mixed energy must land within stochastic error of dense ED."""
    inp = tmp_path / "i_fict"
    inp.write_text(FICTITIOUS_INPUT)
    out = subprocess.run(
        [sys.executable, "-m", "sqmc_tpu", "-i", str(inp), "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"Setting e_trial \(from diagonalizing Hamiltonian\) ="
                  r"\s*([-+0-9.]+)", out.stdout)
    assert m
    e_exact = float(m.group(1))
    m = re.search(r"e_mixed=\s*([-+0-9.]+)\s*\+-\s*([0-9.]+)", out.stdout)
    assert m, out.stdout[-2000:]
    e, err = float(m.group(1)), float(m.group(2))
    assert abs(e - e_exact) < max(5 * err, 0.05)


def test_walk_card_layout_parsing(tmp_path):
    """partial_node's extra eps card and the semistochastic card chain
    (ref: do_walk.f90:321-401)."""
    from sqmc_tpu.config import parse_input
    text = FICTITIOUS_INPUT.replace(
        "none                               run_type",
        "partial_node                       run_type\n0.7    partial_node_eps")
    cfg = parse_input(text)
    assert cfg.run_type == "partial_node"
    assert cfg.partial_node_eps == 0.7
    assert cfg.ndet_toy == 20 and cfg.bosonic == 1
    assert cfg.ndet_psi_t == 2 and cfg.iwdet_psi_t == [1, 2]
    assert cfg.diagonalize_ham == 1


def test_namelist_observables_parsing():
    from sqmc_tpu.config import parse_input
    text = FICTITIOUS_INPUT + """
&natorb get_natorbs=.true. use_pt=.false. /
&greens_function get_greens_function=.true. n_w=5 w_min=-2. w_max=2. /
&active_space n_var_e_up=2 n_var_e_dn=2 n_var_orbs=10 /
"""
    cfg = parse_input(text)
    assert cfg.get_natorbs and not cfg.natorb_use_pt
    assert cfg.get_greens_function and cfg.n_w == 5
    assert cfg.w_min == -2.0 and cfg.w_max == 2.0
    assert cfg.active_space == (2, 2, 10)


def test_heg_i_st_e2e():
    """The reference's semistochastic-PT e2e input (i_st: n_mc=200,
    eps_pt_big=8.192e-4) through the CLI; golden -0.000928741 +- 1e-5
    (o_st_ref), checked at 5 combined sigma like e2e_check.py."""
    out = subprocess.run(
        [sys.executable, "-m", "sqmc_tpu", "-i",
         "/root/reference/src/e2e_tests/heg/i_st", "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout
    m = re.search(r"Variational energy\s*=\s*([-+0-9.]+)", text)
    assert m and abs(float(m.group(1)) - 58.276906085) < 1e-6
    m = re.search(r"Second-order PT energy lowering\s*=\s*([-+0-9.eE]+)\s*"
                  r"\+-\s*([0-9.eE-]+)", text)
    assert m, text[-2000:]
    pt, err = float(m.group(1)), float(m.group(2))
    sigma = np.hypot(err, 9.966e-6)
    assert abs(pt - (-0.000928741)) < 5 * sigma + 2e-5


def test_fictitious_fixed_node_from_cards(tmp_path):
    """run_type=fixed_node1 with importance sampling through the card CLI
    (fixed-node energy is an upper bound; with the near-exact psi_g built
    from the 2-det psi_t it stays within 0.2 of ED here)."""
    text = FICTITIOUS_INPUT.replace(
        "heat_bath2 0 1. 0 1.", "heat_bath2 1 0. 0 1.").replace(
        "none                               run_type",
        "fixed_node1                        run_type").replace(
        "&hf", "&hf")  # no-op keeps structure clear
    # importance sampling adds the psi_g card after the semistochastic one
    text = text.replace(
        ".false. f                          semistochastic, use_exponential_projector",
        ".false. f                          semistochastic, use_exponential_projector\n"
        "0. 0.                              psi_g_energy, psi_g_epsilon")
    inp = tmp_path / "i_fn"
    inp.write_text(text)
    out = subprocess.run(
        [sys.executable, "-m", "sqmc_tpu", "-i", str(inp), "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"Setting e_trial \(from diagonalizing Hamiltonian\) ="
                  r"\s*([-+0-9.]+)", out.stdout)
    e_exact = float(m.group(1))
    m = re.search(r"e_mixed=\s*([-+0-9.]+)\s*\+-\s*([0-9.eE-]+)", out.stdout)
    assert m, out.stdout[-1500:]
    e = float(m.group(1))
    assert e >= e_exact - 0.02      # FN upper bound (stochastic slack)
    assert abs(e - e_exact) < 0.5


HUBBARD_TOY_INPUT = """\
42 7                               irand_seed
80 6 2 0                           nstep,nblk,nblk_eq,ipr
300 1500 0                         w_abs_gen_begin, w_abs_gen_target, MWALK
0.3 0.                             tau_multiplier, tau
1. 2.                              reweight_factor_inv_max_multiplier, reweight_factor_inv_max
10. 0. 0.25                        population_control_expon, e_trial_initial, min_wt
heat_bath2 0 1. 0 1.               proposal_method, importance_sampling, r_initiator, initiator_power, initiator_rescale_power
none                               run_type
.false. f                          semistochastic, use_exponential_projector
'hubbard' 0                        hamiltonian_type,ipr
2 2                                l_x, l_y
t f                                pbc, neel_up_only
1. 4.                              t, U
1 1                                n_alpha, n_beta
1                                  diagonalize_ham
1                                  ndet_psi_t
1                                  iwdet_psi_t
1.0                                cdet_psi_t
"""


def test_hubbard_dense_toy_from_cards(tmp_path):
    """The reference's dense `hubbard` toy type through the card CLI
    (ref: hamiltonian_mod.f90:273-301)."""
    inp = tmp_path / "i_hub"
    inp.write_text(HUBBARD_TOY_INPUT)
    out = subprocess.run(
        [sys.executable, "-m", "sqmc_tpu", "-i", str(inp), "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"Setting e_trial \(from diagonalizing Hamiltonian\) ="
                  r"\s*([-+0-9.]+)", out.stdout)
    e_exact = float(m.group(1))
    m = re.search(r"e_mixed=\s*([-+0-9.]+)\s*\+-\s*([0-9.eE-]+)", out.stdout)
    assert m, out.stdout[-1500:]
    e, err = float(m.group(1)), float(m.group(2))
    assert abs(e - e_exact) < max(6 * err, 0.1)


HUBBARDK_INPUT = """\
9 3                                irand_seed
hci                                run_type
1e-9 1e-9 1e-4 1                   eps_var, eps_pt, target_error, n_states
f                                  dump_wf_var
'hubbardk' 0                       hamiltonian_type,ipr
2 2                                l_x, l_y
t f                                pbc, neel_up_only
1. 4.                              t, U
2 2                                n_alpha, n_beta
"""


def test_hubbardk_hci_from_cards(tmp_path):
    """hubbardk card input through the CLI: tiny-eps HCI == the FCI energy
    of the HF-connected sector."""
    inp = tmp_path / "i_hubk"
    inp.write_text(HUBBARDK_INPUT)
    out = subprocess.run(
        [sys.executable, "-m", "sqmc_tpu", "-i", str(inp), "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"Variational energy\s*=\s*([-+0-9.]+)", out.stdout)
    assert m, out.stdout[-1500:]
    # HF-sector ground state of 2x2 U=4 half... (1up,1dn at)**: 2up2dn:
    # the HF-reachable FCI ground is -5.6568542 (validated in
    # test_legacy_ci / test_walk_hubbardk_vs_fci)
    assert float(m.group(1)) == pytest.approx(-5.6568542, abs=1e-5)


HUBBARD2_FN_INPUT = """\
13 5                               irand_seed
100 6 3 0                          nstep,nblk,nblk_eq,ipr
1500 3000 4096                     w_abs_gen_begin, w_abs_gen_target, MWALK
0.3 0.02                           tau_multiplier, tau
1. 2.                              reweight_factor_inv_max_multiplier, reweight_factor_inv_max
10. 0. 0.5                         population_control_expon, e_trial_initial, min_wt
fast_heatbath 1 0. 0 1.            proposal_method, importance_sampling, r_initiator, initiator_power, initiator_rescale_power
fixed_node1                        run_type
.false. f                          semistochastic, use_exponential_projector
0. 0.                              psi_g_energy, psi_g_epsilon
'hubbard2' 0                       hamiltonian_type,ipr
1 8                                l_x, l_y
f f                                pbc, neel_up_only
1. 4.                              t, U
2 2                                n_alpha, n_beta
gutz                               wf_type
0.7                                g
0                                  diagonalize_ham
"""


def test_hubbard2_fixed_node_from_cards(tmp_path):
    """Card-driven fixed_node1 walk with Gutzwiller guiding on a real
    determinant system (ref: run_type dispatch do_walk.f90:38-50 +
    hubbard.f90 wf_type 'gutz':244-253); oracle = exact fixed-node
    effective Hamiltonian on the enumerated 1x8 quarter-filled chain."""
    import itertools
    import jax.numpy as jnp
    from sqmc_tpu import dets as _dets
    from sqmc_tpu.systems.hubbard.system import make_hubbard_real_system
    from sqmc_tpu.systems.chem import slater
    from sqmc_tpu.algo.guiding import make_gutzwiller_guiding, eval_guiding

    inp = tmp_path / "i_h2fn"
    inp.write_text(HUBBARD2_FN_INPUT)
    out = subprocess.run(
        [sys.executable, "-m", "sqmc_tpu", "-i", str(inp), "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "trial_wf_type=gutz" in out.stdout
    m = re.search(r"e_mixed=\s*([-+0-9.]+)\s*\+-\s*([0-9.eE-]+)", out.stdout)
    assert m, out.stdout[-1500:]
    e, err = float(m.group(1)), float(m.group(2))

    # exact oracle: E_mix of the FN effective Hamiltonian's ground state
    # against the (near-exact) variational trial
    L = 8
    sys_ = make_hubbard_real_system(1, L, 1.0, 4.0, 2, 2, pbc=False)
    guide = make_gutzwiller_guiding(sys_, g=0.7)
    combos = [(u, d) for u in itertools.combinations(range(L), 2)
              for d in itertools.combinations(range(L), 2)]
    ups = np.stack([_dets.det_from_orbs(u, L) for u, d in combos])
    dns = np.stack([_dets.det_from_orbs(d, L) for u, d in combos])
    bu = _dets.to_bits(jnp.asarray(ups), L)
    bd = _dets.to_bits(jnp.asarray(dns), L)
    n = len(combos)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    H = np.asarray(slater.pair_matrix_elements(
        sys_.table, bu[ii.ravel()], bd[ii.ravel()],
        bu[jj.ravel()], bd[jj.ravel()])).reshape(n, n)
    g = np.asarray(eval_guiding(guide, "gutzwiller", jnp.asarray(ups),
                                jnp.asarray(dns), L, 2, 2))
    ht = H * (g[:, None] / g[None, :])
    viol = (~np.eye(n, dtype=bool)) & (ht > 0)
    hfn = np.where(viol, 0.0, H)
    np.fill_diagonal(hfn, np.diag(H) +
                     np.sum(np.where(viol, ht, 0.0), axis=0))
    w_, v_ = np.linalg.eig(hfn)
    i0 = np.argmin(w_.real)
    phi = v_[:, i0].real
    w0, v0 = np.linalg.eigh(H)
    psi0 = v0[:, 0]
    phi *= np.sign(phi @ psi0)
    e_mix_oracle = (psi0 @ H @ phi) / (psi0 @ phi)
    assert abs(e - e_mix_oracle) < max(8 * err, 0.05), \
        (e, e_mix_oracle, err)


CHEM_WALK_INPUT = """\
1837465927472523 1257676276476276   irand_seed
100 5 3 0                          nstep,nblk,nblk_eq,ipr
2000 4000 8192                     w_abs_gen_begin, w_abs_gen_target, MWALK
0.1 0.                             tau_multiplier, tau
1. 2.                              reweight_factor_inv_max_multiplier, reweight_factor_inv_max
10. 0. 0.5                         population_control_expon, e_trial_initial, min_wt
fast_heatbath 0 1. 0 1.            proposal_method, importance_sampling, r_initiator, initiator_power, initiator_rescale_power
none                               run_type
.true. f                           semistochastic, use_exponential_projector
f                                  diff_from_psi_t
200                                size_deterministic
f f 0.5                            hf_to_psit, c_t_initiator, always_spawn_cutoff
'chem'  0                          hamiltonian_type,ipr
8        4                        nelec, nup
d2h                                point_group
f                                  time_sym
26                                 norb
0                                  n_core_spatial_orb
2                                  trial_wf_iterations
26 26                              norb_trial_wf
1 20                               trial_wf_initiators
50 80                              n_sym_uniq_det_trial_wf
1,5,3,2,1,7,6,5,1,2,3,1,6,7,5,4,1,5,3,2,8,5,1,7,6,5, orbital_symmetries(1:norb)
1                                  spatial_symmetry_wf
0                                  diagonalize_ham
"""


def test_chem_walk_from_cards(tmp_path):
    """A chemistry FCIQMC walk through the SQMC-style card layout
    (tau from tau_multiplier, semistochastic D space, heat-bath
    proposals; ref walk dispatch do_walk.f90:38-50 run_type none)."""
    inp = tmp_path / "i_chem_walk"
    inp.write_text(CHEM_WALK_INPUT)
    out = subprocess.run(
        [sys.executable, "-m", "sqmc_tpu", "-i", str(inp),
         "-f", "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP", "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "tau_multiplier" in out.stdout        # tau deduced and printed
    # Psi_T must come from the deck's trial_wf cards (ref
    # hamiltonian_mod.f90:113), not an invented HCI fallback
    assert "trial_wf_iters" in out.stdout
    assert "WARNING: no trial_wf cards" not in out.stdout
    m = re.search(r"e_mixed=\s*([-+0-9.]+)\s*\+-\s*([0-9.eE-]+)",
                  out.stdout)
    assert m, out.stdout[-1500:]
    e = float(m.group(1))
    # short run: not converged to E0 (-75.7286), but must sit between the
    # trial's variational energy and the exact ground state
    assert -75.73 < e < -75.55, e


def test_hf_to_psit_card_forces_psit_into_d(tmp_path):
    """hf_to_psit=t must run with stated semantics: Psi_T is forced into
    the deterministic space (the exact D-projection subsumes the
    reference's Psi_T-column move, do_walk.f90:2281-2296) and the
    substitution is printed (VERDICT r4 item 7)."""
    # size_deterministic=50 < the 80-det Psi_T so the forcing is
    # guaranteed to add dets; tiny walk (8 steps x 1 block)
    inp = tmp_path / "i_hf_to_psit"
    inp.write_text(CHEM_WALK_INPUT
                   .replace("100 5 3 0", "8 1 1 0")
                   .replace("200                                "
                            "size_deterministic",
                            "50                                 "
                            "size_deterministic")
                   .replace("f f 0.5", "t f 0.5"))
    out = subprocess.run(
        [sys.executable, "-m", "sqmc_tpu", "-i", str(inp),
         "-f", "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP", "--cpu"],
        capture_output=True, text=True, cwd=REPO, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "hf_to_psit: forcing Psi_T into the deterministic space" \
        in out.stdout, out.stdout[-1500:]
    m = re.search(r"n_imp \d+ -> (\d+)", out.stdout)
    assert m and int(m.group(1)) > 50, out.stdout[-1500:]


def test_ensure_psit_in_imp_subset():
    """ensure_psit_in_imp yields Psi_T subset of D with a consistent
    rebuilt projector; a trial already satisfying the subset is returned
    unchanged."""
    from sqmc_tpu.systems.base import make_chem_system
    from sqmc_tpu.algo.semistoch import (build_trial_wavefunction,
                                         ensure_psit_in_imp)
    from sqmc_tpu.ops import setalg
    system = make_chem_system(
        "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
    trial = build_trial_wavefunction(system, eps_var=2e-2, n_psi_t=60,
                                     n_imp=20, verbose=False)
    forced = ensure_psit_in_imp(system, trial)
    pos = setalg.search_dets(forced.imp_up, forced.imp_dn,
                             forced.psit_up, forced.psit_dn)
    assert (pos >= 0).all()
    assert forced.imp_ham.n == len(forced.imp_up)
    again = ensure_psit_in_imp(system, forced)
    assert again is forced
