"""Second-order Epstein-Nesbet perturbation theory: deterministic and
semistochastic (alias-sampled) evaluation.

Re-design of the reference's PT stack (ref: hci.f90 second_order_pt:1100,
second_order_pt_alias:1314, do_pt:4148; aggregation semantics from
semistoch.f90 find_doubly_excited:1579):

  deterministic: sum_{a not in V} (sum_{i in V, |H_ai c_i|>eps_pt} H_ai c_i)^2
                 / (E_var - H_aa)
  semistochastic: deterministic part at eps_pt_big + the unbiased two-term
                 stochastic estimator of the eps_pt / eps_pt_big difference,
                 with variational dets alias-sampled with p_i ~ |c_i| and
                 Welford-accumulated until the target error.

TPU shape: candidate generation is the batched screened kernel; the merge of
contributions is sorted segment-summation; denominators' diagonal elements
are computed directly as batched MXU matmuls (the reference's O(N) diagonal
update trick - chemistry.f90 get_new_diag_elem:9649 - is unnecessary when
the diag evaluation is a matmul).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import dets as dets_mod
from ..ops import setalg
from ..ops.alias import sample_alias, setup_alias_np
from ..systems.chem import slater
from ..utils.timers import phase
from .connect import generate_connections


def _diag_elements_np(table, up, dn, norb, batch=1 << 17,
                      time_sym=False, z=1, devices=None):
    if time_sym:
        from .sparseham import ts_diag_elements
        return ts_diag_elements(table, up, dn, norb, z)
    devs = list(devices) if devices is not None else [None]
    if devs[0] is not None:
        # round-robin batch dispatch across mesh devices (async; the
        # device->host copies in the collection loop are the only syncs).
        # Cap the per-dispatch batch: the bit-plane broadcast inside
        # diag_elements is [W*64, batch, nelec]-shaped, so an uncapped
        # split (12M external dets on a 1-device mesh) exceeds HBM
        tabs = [jax.device_put(table, d) for d in devs]
        batch = max(4096, min(batch, -(-len(up) // len(devs))))
    else:
        tabs = [table]
    out = np.empty(len(up))
    pend = []
    for k, beg in enumerate(range(0, len(up), batch)):
        end = min(beg + batch, len(up))
        kd = k % len(devs)
        if devs[kd] is not None:
            bu = dets_mod.to_bits(jax.device_put(up[beg:end], devs[kd]), norb)
            bd = dets_mod.to_bits(jax.device_put(dn[beg:end], devs[kd]), norb)
        else:
            bu = dets_mod.to_bits(jnp.asarray(up[beg:end]), norb)
            bd = dets_mod.to_bits(jnp.asarray(dn[beg:end]), norb)
        pend.append((beg, end, slater.diag_elements(tabs[kd], bu, bd)))
    for beg, end, d in pend:
        out[beg:end] = np.asarray(d)
    return out


def second_order_pt(system, up, dn, wts, var_energy: float, eps_pt: float,
                    verbose: bool = True, batch: int = 2048, mesh=None):
    """Deterministic screened PT-2.  up/dn: sorted variational dets [n,W];
    wts: [n] coefficients of the state.  Returns (delta_e2, n_connected).

    mesh: optional jax.sharding.Mesh - the reference-det scan and the
    external-det diagonal evaluation are dispatched round-robin across the
    mesh devices (ref: the per-core reference split of
    find_doubly_excited, semistoch.f90:1743)."""
    devs = list(mesh.devices.flat) if mesh is not None else None
    coeffs = np.abs(wts)
    coeffs = np.where(coeffs == 0.0, 1e-300, coeffs)
    with phase("Deterministic 2nd-order PT correction", enabled=verbose):
        cu, cd, h, ref = generate_connections(system, up, dn, eps_pt / coeffs,
                                              batch=batch, devices=devs)
        contrib = h * wts[ref]
        cu_u, cd_u, (num,), _ = setalg.unique_dets(cu, cd, [contrib])
        # count connections as the reference does: unique over candidates
        # plus the references themselves (each ref emits itself in the
        # Fortran; ref: find_important_connected_dets entry 1)
        all_u = np.concatenate([cu_u, up])
        all_d = np.concatenate([cd_u, dn])
        uu, dd, _, _ = setalg.unique_dets(all_u, all_d)
        n_connected = len(uu)

        ext = setalg.setdiff_dets(cu_u, cd_u, up, dn)
        cu_e, cd_e, num_e = cu_u[ext], cd_u[ext], num[ext]
        diag_e = _diag_elements_np(system.table, cu_e, cd_e, system.norb,
                                   time_sym=system.time_sym, z=system.z,
                                   devices=devs)
        delta_e2 = float(np.sum(num_e ** 2 / (var_energy - diag_e)))
    if verbose:
        print(f"Number of connected dets={n_connected}", flush=True)
        print(f"2nd-order PT energy lowering={delta_e2:26.9f}", flush=True)
    return delta_e2, n_connected


@dataclasses.dataclass
class StochasticPTResult:
    pt_diff: float
    std_dev: float
    n_samples: int
    e_tot: float


def second_order_pt_alias(system, up, dn, wts, var_energy: float,
                          eps_pt: float, eps_pt_big: float, n_mc: int,
                          target_error: float, pt_big: float,
                          seed: int = 0, max_samples: int = 10 ** 6,
                          min_samples: int = 10, verbose: bool = True,
                          mesh=None):
    """Semistochastic difference estimator (ref: hci.f90:1314).

    For each sample: draw n_mc refs iid with p ~ |c|, compress duplicates to
    (i, w_i); generate connections a with |H_ai c_i| > eps_pt; accumulate
      term1[a]     = sum_i H_ai c_i w_i/p_i
      term2[a]     = sum_i (H_ai c_i)^2 ((n_mc-1) w_i/p_i - (w_i/p_i)^2)
      term*_big[a] = same, contributions restricted to |H_ai c_i| > eps_pt_big
    and the sample estimate is
      sum_{a not in V} [term1^2 + term2 - term1_big^2 - term2_big]
        / (E - H_aa) / (n_mc (n_mc-1)).
    Welford mean/variance until std < target_error (ref: tools.f90 welford).

    mesh: optional jax.sharding.Mesh - distributed PT the reference's way
    (ref: the round-robin split of the compressed sample references across
    cores, hci.f90:1482-1520): the compressed refs of each sample are
    sliced across the mesh devices, every device generates connections for
    ONLY its slice (the per-sample hot work), and the external-det
    diagonal evaluation is likewise round-robined.  The term sums per
    external det are assembled on the host before squaring (the reference
    merges contributions across cores before the quotient for the same
    reason), so the estimate is identical to the single-device path up to
    float reduction order.
    """
    devs = list(mesh.devices.flat) if mesh is not None else None

    n = len(up)
    absw = np.abs(wts)
    norm = absw.sum()
    prob = absw / norm
    J, q = setup_alias_np(prob)
    J_j, q_j = jnp.asarray(J), jnp.asarray(q)
    key = jax.random.PRNGKey(seed)

    mean = 0.0
    M2 = 0.0
    nsamp = 0
    var = np.inf

    coeffs_full = np.where(absw == 0.0, 1e-300, absw)

    for sample in range(1, max_samples + 1):
        key, sub = jax.random.split(key)
        idx = np.asarray(sample_alias(sub, J_j, q_j, n_mc))
        uniq, counts = np.unique(idx, return_counts=True)
        w_over_p = counts / prob[uniq]

        eps_ref = eps_pt / coeffs_full[uniq]
        gc_batch = 2048 if devs is None else max(32, -(-len(uniq) // len(devs)))
        cu, cd, h, ref = generate_connections(system, up[uniq], dn[uniq],
                                              eps_ref, batch=gc_batch,
                                              devices=devs)
        ci = wts[uniq][ref]
        wop = w_over_p[ref]
        hc = h * ci
        t1 = hc * wop
        t2 = hc ** 2 * ((n_mc - 1) * wop - wop ** 2)
        big = np.abs(hc) > eps_pt_big
        t1b = np.where(big, t1, 0.0)
        t2b = np.where(big, t2, 0.0)

        cu_u, cd_u, (T1, T2, T1b, T2b), _ = setalg.unique_dets(
            cu, cd, [t1, t2, t1b, t2b])
        ext = setalg.setdiff_dets(cu_u, cd_u, up, dn)
        dex = _diag_elements_np(system.table, cu_u[ext], cd_u[ext],
                                system.norb, time_sym=system.time_sym,
                                z=system.z, devices=devs)
        contrib = (T1[ext] ** 2 + T2[ext] - T1b[ext] ** 2 - T2b[ext]) \
            / (var_energy - dex)
        e_sample = float(np.sum(contrib)) / (n_mc * (n_mc - 1))

        nsamp += 1
        d = e_sample - mean
        mean += d / nsamp
        M2 += d * (e_sample - mean)
        var = M2 / (nsamp * (nsamp - 1)) if nsamp > 1 else np.inf
        if verbose:
            print(f"Sample, E_2pt_now, E_2pt estimate, total energy="
                  f"{nsamp:6d}{e_sample:15.9f}{mean:12.8f}"
                  f"{var_energy + pt_big + mean:15.8f} +-{np.sqrt(var) if np.isfinite(var) else 0:12.8f}",
                  flush=True)
        if nsamp >= min_samples and var < target_error ** 2:
            break

    return StochasticPTResult(pt_diff=mean, std_dev=float(np.sqrt(var)),
                              n_samples=nsamp,
                              e_tot=var_energy + pt_big + mean)


def estimate_n_connections(system, up, dn, wts, eps: float,
                           n_sample: int = 100) -> int:
    """Sampled estimate of the total screened connection count
    (ref: semistoch.f90 estimate_n_connections:2606)."""
    from .connect import count_doubles

    n = len(up)
    take = np.linspace(0, n - 1, min(n, n_sample)).astype(np.int64)
    coeffs = np.abs(wts[take])
    coeffs = np.where(coeffs == 0.0, 1e-300, coeffs)
    n_emit, _, _ = count_doubles(system.heatbath, jnp.asarray(up[take]),
                                 jnp.asarray(dn[take]),
                                 jnp.asarray(eps / coeffs),
                                 jnp.asarray(np.full(len(take), np.inf)),
                                 nup=system.nup, ndn=system.ndn)
    per_ref = float(jnp.sum(n_emit)) / len(take)
    if system.has_singles:
        # singles per reference det: each occupied electron can move to
        # any symmetry-allowed empty orbital of its irrep - counted from
        # the orbital-symmetry multiplicities instead of a flat guess
        sym = np.asarray(system.orb_sym_arr)
        vals, counts = np.unique(sym, return_counts=True)
        mult = dict(zip(vals.tolist(), counts.tolist()))
        avg_targets = float(np.mean([mult[s] - 1 for s in sym.tolist()])) \
            if len(sym) else 0.0
        per_ref += system.nelec * max(avg_targets, 0.0)
    return int(per_ref * n)


def free_memory_bytes() -> int:
    """MemAvailable from /proc/meminfo (ref: get_free_memory,
    tools.f90:1134)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 8 << 30


def do_pt(system, up, dn, wts, diag, var_energy: float, eps_var: float,
          eps_pt: float, eps_pt_big: float = -1.0, target_error: float = -1.0,
          n_mc: int = -1, n_max_connections: int = 40_000_000,
          seed: int = 0, verbose: bool = True,
          eps_pt_big_energy: float | None = None, mesh=None,
          max_pt_samples: int = 10 ** 6, device: bool = False):
    """PT driver: deterministic if the estimated connection count fits,
    else semistochastic with an auto-chosen eps_pt_big
    (ref: hci.f90 do_pt:4148).

    n_max_connections <= 0: auto-size from free RAM (~48 bytes per
    connection; ref hci.f90:629-640 mem_avail sizing).
    eps_pt_big_energy: a previous run's deterministic part for this
    eps_pt_big, reused instead of recomputed (ref: eps_pt_big_energy
    namelist, common_selected_ci.f90).
    device=True: use the device-resident estimators (algo/devpt.py) —
    one scalar crosses the tunnel per stochastic sample instead of the
    full candidate buffer.  Requires n_words == 1 and norb <= 32.

    Returns dict(pt, pt_err, e_tot, mode, ...).
    """
    if device:
        assert system.n_words == 1 and system.norb <= 32, \
            "device PT requires n_words == 1 and norb <= 32"
    if n_max_connections <= 0:
        n_max_connections = int(free_memory_bytes() * 0.4 / 48)
        if verbose:
            print(f"n_max_connections auto-sized from free memory: "
                  f"{n_max_connections}", flush=True)
    n_est = estimate_n_connections(system, up, dn, wts, eps_pt)
    if verbose:
        print(f"If eps_pt={eps_pt:.4e} estimated number of connections to "
              f"variational wavefn={n_est}", flush=True)

    if n_est < n_max_connections and eps_pt_big <= 0:
        if device:
            from .devpt import second_order_pt_device
            pt, n_conn = second_order_pt_device(system, up, dn, wts,
                                                var_energy, eps_pt,
                                                verbose=verbose)
        else:
            pt, n_conn = second_order_pt(system, up, dn, wts, var_energy,
                                         eps_pt, verbose=verbose, mesh=mesh)
        if verbose:
            print(f"Variational energy={var_energy:26.9f}")
            print(f"Total energy={var_energy + pt:26.9f}", flush=True)
        return dict(pt=pt, pt_err=0.0, e_tot=var_energy + pt,
                    mode="deterministic", n_connected=n_conn)

    # choose eps_pt_big if not given
    if eps_pt_big <= 0:
        eps_pt_big = eps_pt
        while n_est >= n_max_connections:
            eps_pt_big = 1.1 * eps_pt_big * (n_est / n_max_connections) ** 0.75
            if eps_pt_big >= eps_var:
                break
            n_est = estimate_n_connections(system, up, dn, wts, eps_pt_big)

    if eps_pt_big_energy is not None:
        pt_big, n_conn = float(eps_pt_big_energy), 0
        if verbose:
            print(f"Reusing deterministic part eps_pt_big_energy="
                  f"{pt_big:.9f}", flush=True)
    elif eps_pt_big < eps_var:
        if device:
            from .devpt import second_order_pt_device
            pt_big, n_conn = second_order_pt_device(system, up, dn, wts,
                                                    var_energy, eps_pt_big,
                                                    verbose=verbose)
        else:
            pt_big, n_conn = second_order_pt(system, up, dn, wts, var_energy,
                                             eps_pt_big, verbose=verbose,
                                             mesh=mesh)
    else:
        pt_big, n_conn = 0.0, 0

    if n_mc <= 0:
        n_mc = 200
    if target_error <= 0:
        target_error = 1e-4
    if device:
        from .devpt import second_order_pt_alias_device
        res = second_order_pt_alias_device(system, up, dn, wts, var_energy,
                                           eps_pt, eps_pt_big, n_mc,
                                           target_error, pt_big, seed=seed,
                                           verbose=verbose,
                                           max_samples=max_pt_samples)
    else:
        res = second_order_pt_alias(system, up, dn, wts, var_energy, eps_pt,
                                    eps_pt_big, n_mc, target_error, pt_big,
                                    seed=seed, verbose=verbose, mesh=mesh,
                                    max_samples=max_pt_samples)
    pt_total = pt_big + res.pt_diff
    if verbose:
        print(f"Variational energy={var_energy:26.9f}")
        print(f"2nd-order PT energy lowering={pt_total:26.9f} +-{res.std_dev:12.9f}")
        print(f"Total energy={var_energy + pt_total:26.9f} +-{res.std_dev:12.9f}",
              flush=True)
    return dict(pt=pt_total, pt_err=res.std_dev, e_tot=var_energy + pt_total,
                mode="semistochastic", pt_big=pt_big, pt_diff=res.pt_diff,
                n_samples=res.n_samples, n_connected=n_conn)
