"""A/B bench: identical C2 CAS(8e,26o) physics at norb=26 (fused single
u64 key) vs zero-padded to norb=60 (the cc-pVDZ-sized two-key path:
W=1, nk=2 variadic sort, generic det searches).  VERDICT r1 item 6 asks
the padded path to stay within 2x of the compact one.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from sqmc_tpu import dets
    from sqmc_tpu.systems.base import make_chem_system, FermionSystem
    from sqmc_tpu.systems.chem.integrals import (IntegralTable, n_eri,
                                                 pair_index, quad_index)
    from sqmc_tpu.systems.heatbath import build_heatbath
    from sqmc_tpu.algo.semistoch import build_trial_wavefunction
    from sqmc_tpu.algo.walk import (WalkConfig, build_walk_tables,
                                    init_walk_state, walk_block)

    NPAD = 60
    with jax.default_device(jax.devices("cpu")[0]):
        base = make_chem_system(
            "/root/reference/C2_v2z_curve/r1.24253/FCIDUMP")
        norb = base.norb
        h = np.asarray(base.table.h)
        hp = np.zeros((NPAD, NPAD))
        hp[:norb, :norb] = h
        for o in range(norb, NPAD):
            hp[o, o] = 100.0 + o
        erip = np.zeros(n_eri(NPAD))
        print("# padding integrals...", flush=True)
        P, Q = np.meshgrid(np.arange(norb), np.arange(norb), indexing="ij")
        ev = base.table.eri_value_np
        for r in range(norb):
            for s in range(r + 1):
                erip[quad_index(pair_index(P, Q), pair_index(r, s))] = \
                    ev(P.ravel(), Q.ravel(), np.full(norb * norb, r),
                       np.full(norb * norb, s)).reshape(norb, norb)
        symp = np.ones(NPAD, np.int32)
        symp[:norb] = np.asarray(base.orb_sym_arr)
        symp[norb:] = 100 + np.arange(NPAD - norb)
        table = IntegralTable.from_dense_arrays(hp, erip,
                                                base.table.core_energy,
                                                symp)
        big = FermionSystem(
            name="chem", norb=NPAD, nup=base.nup, ndn=base.ndn,
            table=table, heatbath=build_heatbath(table),
            orb_sym_arr=jnp.asarray(symp), has_singles=True,
            hf_up=dets.det_from_orbs(range(base.nup), NPAD),
            hf_dn=dets.det_from_orbs(range(base.ndn), NPAD), extra={})

        trials = {}
        for name, sys_ in (("norb26", base), ("norb60", big)):
            trials[name] = build_trial_wavefunction(sys_, eps_var=5e-3,
                                                    n_psi_t=200, n_imp=500,
                                                    verbose=False)

    results = {}
    for name, sys_ in (("norb26", base), ("norb60", big)):
        trial = trials[name]
        cfg = WalkConfig(mwalk=1 << 14, cap_spawn=1 << 17,
                         norb=sys_.norb, nup=sys_.nup, ndn=sys_.ndn,
                         n_words=sys_.n_words, tau=2e-3,
                         w_abs_target=200_000.0, has_singles=True,
                         spawn_granularity=2.0)
        tables = build_walk_tables(sys_, trial, cfg=cfg)
        state = init_walk_state(cfg, trial, 50_000.0, trial.e_trial)
        for _ in range(3):      # grow + warm the compile
            state, _ = walk_block(state, tables, cfg, 100)
        float(jnp.sum(state.wt))     # force execution (tunnel-safe)
        t0 = time.time()
        state, stats = walk_block(state, tables, cfg, 100)
        pop = float(jnp.mean(stats["w_abs_gen"]))   # forces execution
        dt = time.time() - t0
        results[name] = (100 / dt, pop)
        print(f"# {name}: {100 / dt:.2f} gen/s  pop={pop:.0f}  "
              f"walker-steps/s={pop * 100 / dt:.3e}", flush=True)

    ratio = results["norb26"][0] / results["norb60"][0]
    print(f"# norb26/norb60 gen-rate ratio: {ratio:.2f} "
          f"(target <= 2.0)")


if __name__ == "__main__":
    main()
