"""Checkpoint / resume artifacts.

Parity with the reference's restart files (SURVEY.md 5.4):
  * variational wavefunction cache `wf_eps_var=<eps>` written after the
    variational stage and read on startup to skip it entirely
    (ref: hci.f90:194-259, 602-625) - here an .npz with dets, weights,
    energies, and diagonal elements;
  * SQMC trial-wavefunction artifacts (psit / psit_connections /
    dtm_projector; ref: commons/common_psi_t.f90:14-19) - covered by
    algo.semistoch.save_trial/load_trial;
  * per-block walker-state checkpoints for the walk (beyond the reference,
    which had no mid-walk checkpoint).
"""

from __future__ import annotations

import os

import numpy as np


def wf_var_filename(eps_var: float, directory: str = ".") -> str:
    """Reference-compatible name: wf_eps_var=<eps in es7.2e1>
    (ref: hci.f90 write(fmt,'(es7.2e1)'))."""
    return os.path.join(directory, f"wf_eps_var={eps_var:7.2e}".replace("e-0", "E-0").replace("e+0", "E+0"))


def save_wf_var(path: str, up, dn, wts, energies, diag):
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                        up=up, dn=dn, wts=wts, energies=energies, diag=diag)


def load_wf_var(path: str):
    p = path if path.endswith(".npz") else path + ".npz"
    if not os.path.exists(p):
        return None
    z = np.load(p)
    return dict(up=z["up"], dn=z["dn"], wts=z["wts"],
                energies=z["energies"], diag=z["diag"])


def save_walker_state(path: str, state):
    """Mid-walk walker checkpoint (host copy of the device state)."""
    np.savez_compressed(
        path if path.endswith(".npz") else path + ".npz",
        up=np.asarray(state.up), dn=np.asarray(state.dn),
        wt=np.asarray(state.wt), init=np.asarray(state.init),
        imp=np.asarray(state.imp), diag=np.asarray(state.diag),
        ct=np.asarray(state.ct),
        nwalk=np.asarray(state.nwalk), key=np.asarray(state.key),
        e_trial=np.asarray(state.e_trial), e_est=np.asarray(state.e_est),
        tau=np.asarray(state.tau),
        reweight=np.asarray(state.reweight_factor_inv),
        reached=np.asarray(state.reached_target),
        equilibrated=np.asarray(state.equilibrated),
        enbc=np.asarray(state.e_num_blkabs_cum),
        edbc=np.asarray(state.e_den_blkabs_cum),
        enb=np.asarray(state.e_num_blk), edb=np.asarray(state.e_den_blk),
        w_abs=np.asarray(state.w_abs_gen), step=np.asarray(state.step))


def load_walker_state(path: str, cfg):
    import jax.numpy as jnp
    from ..algo.walk import WalkState

    p = path if path.endswith(".npz") else path + ".npz"
    z = np.load(p)
    return WalkState(
        up=jnp.asarray(z["up"]), dn=jnp.asarray(z["dn"]),
        wt=jnp.asarray(z["wt"]), init=jnp.asarray(z["init"]),
        imp=jnp.asarray(z["imp"]), diag=jnp.asarray(z["diag"]),
        # ct missing in pre-round-3 checkpoints: -2 = repaired in-step
        ct=jnp.asarray(z["ct"]) if "ct" in z.files else
        jnp.full(z["imp"].shape[0], -2, jnp.int32),
        nwalk=jnp.asarray(z["nwalk"]), key=jnp.asarray(z["key"]),
        e_trial=jnp.asarray(z["e_trial"]), e_est=jnp.asarray(z["e_est"]),
        tau=jnp.asarray(z["tau"]),
        reweight_factor_inv=jnp.asarray(z["reweight"]),
        reached_target=jnp.asarray(z["reached"]),
        equilibrated=jnp.asarray(z["equilibrated"]),
        e_num_blkabs_cum=jnp.asarray(z["enbc"]),
        e_den_blkabs_cum=jnp.asarray(z["edbc"]),
        e_num_blk=jnp.asarray(z["enb"]), e_den_blk=jnp.asarray(z["edb"]),
        w_abs_gen=jnp.asarray(z["w_abs"]),
        overflow=jnp.asarray(False),
        step=jnp.asarray(z["step"] if "step" in z.files else 0, jnp.int32))
