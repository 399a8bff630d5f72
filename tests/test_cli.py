"""CLI compatibility: the reference's own e2e input files must run
unchanged and reproduce the golden numbers the reference's checker greps
(src/e2e_tests/e2e_check.py patterns)."""

import re
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
