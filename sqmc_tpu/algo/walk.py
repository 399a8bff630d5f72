"""SQMC / FCIQMC walker propagation engine - the framework's hot loop.

TPU re-design of the reference walk (ref: do_walk.f90 walk:1462, step body
:2171-2930, move_uniform2:3538, merge_original_with_spawned2:5866,
reduce_my_walker:7196, check_initiator:6838; heat-bath proposal
chemistry.f90 off_diagonal_move_chem_efficient_heatbath:5086):

  * walker list = fixed-capacity SoA pytree sorted by (up,dn) key; invalid
    slots hold an all-ones sentinel key that sorts last;
  * per-walker child counts -> prefix sum -> fixed-capacity spawn slots
    (the data-dependent spawning loop becomes a static-shape emission);
  * heat-bath proposal: pair ~ rowsum|H|, target (r,s) ~ |H| within the
    row (exact joint-|H| heat bath for doubles, so every accepted double
    spawn carries the SAME |weight| = tau*W2tot/(1-p_single) - only the
    sign varies); singles ~ a precomputed upper-bound table U[p,r] so
    |weight| is bounded by construction.  Proposal probabilities are exact,
    hence the propagator is unbiased (the reference instead verifies its
    factorized scheme per system via check_heatbath_unbiased:9330);
  * annihilation = lexsort + segment combine with the reference's
    initiator / imp_distance merge rules (order-independent variant:
    group initiator = max, noted as the sanctioned alternative in
    do_walk.f90:5898);
  * semistochastic deterministic projection = COO matvec over the D-space
    walker weights, applied exactly each step;
  * population control, mixed estimator against C(T), and stochastic
    min_wt rounding all match the reference formulas.

Everything below `step()` is one jit-compiled program; the host loop only
handles blocks, statistics, and capacity escalation.
"""

from __future__ import annotations

import dataclasses
import functools
import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dets
from ..ops import dethash, prefix, rowpack, segscan, setalg
from ..systems.heatbath import tri_le, tri_lt
from ..systems.chem import slater


# ---------------------------------------------------------------------------
# Configuration and state
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WalkConfig:
    mwalk: int                  # walker-list capacity (ref MWALK)
    cap_spawn: int              # spawn-slot capacity per step
    norb: int
    nup: int
    ndn: int
    n_words: int
    tau: float                  # final timestep (tau_sav)
    w_abs_target: float         # target total |weight| (ref w_abs_gen_target)
    r_initiator: float = 1.0
    initiator_power: float = 0.0
    initiator_min_distance: int = 0
    min_wt: float = 0.5
    always_spawn_cutoff: float = 0.5
    pop_ctrl_exponent: float = 10.0
    reweight_factor_inv_max: float = 2.0
    semistochastic: bool = True
    has_singles: bool = True
    # C(T)-in-D mixed estimator (WalkTables.ct_num_imp): valid ONLY when
    # every C(T) det is deterministic (C(T) subset of D - true for
    # FCI-solvable D spaces, NEVER for the flagship C2 trial where
    # |C(T)|=674k >> |D|=12k).  Opt-in because it changes the estimator
    # trace (each generation's (e_num, e_den) are evaluated on the step's
    # INPUT state - the same sequence shifted by one generation), which
    # would silently move digit-exact golden outputs.
    ct_in_d: bool = False
    # store the dense D-projection matrix in bfloat16 (half the HBM
    # stream of the step's biggest single operand, [n_imp, n_imp]).  On
    # the v5e MXU this is FREE precision-wise - the MXU rounds f32
    # matmul operands to bf16 at any precision setting (measured,
    # tools/microbench_rowsum.py; accumulation stays f32) - so TPU
    # results are bitwise unchanged.  Off by default because on CPU it
    # WOULD change the projection arithmetic (real f32 FMAs there).
    proj_bf16: bool = False
    # spawning granularity: children are drawn per g units of |weight|
    # instead of per unit (g=1 reproduces the reference's one-child-per-
    # unit-weight resolution; larger g trades statistical efficiency for
    # g-fold fewer spawn slots per step - a variance/throughput dial)
    spawn_granularity: float = 1.0
    # double-excitation proposal distribution (ref proposal_method card,
    # do_walk.f90:289): 'fast_heatbath' (exact joint-|H|, constant spawn
    # magnitude; ref off_diagonal_move_chem_efficient_heatbath:5086),
    # 'uniform' (orbitals uniform; ref off_diagonal_move_chem:4237),
    # 'cauchy_schwarz' (separable sqrt((pr|pr)(qs|qs)) bound; ref
    # off_diagonal_move_chem_cauchySchwarz:2530)
    proposal: str = "fast_heatbath"
    # determinant sharding over a mesh axis (SURVEY P1/P2): when axis_name
    # is set, mwalk/cap_spawn are PER-SHARD capacities, spawns are routed
    # to their owner shard by all_to_all, and control scalars are psummed
    # C(T) states (imp == -2) are permanent initiators when set (ref
    # c_t_initiator card, do_walk.f90:383; permanent initiator = code 3,
    # never demoted).  The related hf_to_psit option (exact Psi_T-column
    # treatment, do_walk.f90:2281-2296) is subsumed by the exact D-space
    # projection: cli.py calls semistoch.ensure_psit_in_imp when the card
    # is set, forcing Psi_T into the deterministic space.
    c_t_initiator: bool = False
    # annihilation strategy.  full_sort_merge=True (default): one variadic
    # key-value sort over [M+CAP] - measured FASTER on C2 FCIQMC at 200k
    # population, where ~30% of spawns create (mostly immediately-dying)
    # NEW determinants each step, so the two-level scatter merge cannot
    # keep its new-det buffer small.  False: two-level merge (scatter onto
    # resident walkers + sort only new dets) - wins in high-annihilation
    # regimes (larger min_wt, small spaces); both paths are A/B-tested
    # exact in the deterministic limit.
    full_sort_merge: bool = True
    # capacity for distinct NEW determinants per step (0 = cap_spawn//8)
    cap_new: int = 0
    # compacted-spawn capacity: valid spawns are compacted into a buffer of
    # this size before the annihilation sort, so the sort runs at
    # [mwalk + cap_compact] instead of [mwalk + cap_spawn] (typically
    # 25-45% of spawn slots are dead: unused slots + occupied-target
    # rejections).  0 = no compaction (sort at full cap_spawn).
    cap_compact: int = 0
    # fresh-determinant buffer: kept merge groups whose det was NOT in last
    # step's walker list get their diagonal element and C(T)-cache index
    # computed through a buffer of this size (every resident walker carries
    # both, so the per-step [M] diagonal evaluation and the [M]-query C(T)
    # search collapse to this small batch).  0 = max(cap_spawn//8, 8192).
    cap_fresh: int = 0

    # singles-channel compaction: the ~p_single fraction of slots taking
    # the single branch routes through a buffer of this size, so the
    # [CAP, norb]-shaped element rows shrink accordingly.  0 = off
    # (compute singles on every slot).  Overflow joins the capacity
    # escalation path.
    cap_single: int = 0

    # initiator combine rule inside the annihilation merge.  "group_max"
    # (default): a merged group's initiator is the max over its rows —
    # the order-independent alternative the reference itself suggests in
    # a comment (do_walk.f90:5898-5900).  "sequential": the reference's
    # ACTUAL order-dependent pairwise rule (:5897-5950): same-sign pair
    # -> max; opposite-sign pair -> the initiator follows the sign-
    # winning walker (|acc| < |row| takes the row's value; a tie zeroes
    # it; a permanent initiator, code 3, is never demoted).  Sequential
    # mode serializes the merge with an O(N) lax.scan —
    # it exists to MEASURE the bias difference between the two semantics
    # (tools/ab_initiator_rule.py), not for production throughput.
    initiator_rule: str = "group_max"

    # f32-state runs materialize the D-space off-diagonal projection as a
    # DENSE [n_imp, n_imp] f32 matrix when n_imp is at most this (1 GB at
    # 16384): the matvec streams the matrix at HBM bandwidth on the MXU
    # instead of the block-ELL arbitrary-index gather (~0.7 vs ~14
    # ms/step at 12k dets / 1.5M nnz).  0 disables.  f64-state runs keep
    # block-ELL (the MXU has no f64 path).
    dense_proj_max: int = 16384

    # hash the static C(T) det list (ops/dethash.py) so the fresh-det
    # C(T) lookup is two [F]-row gathers instead of a [F + n_ct] fused
    # re-sort every generation.  Identical indices -> bitwise-identical
    # trajectories; the flag exists for A/B measurement.
    det_hash: bool = True

    @property
    def cap_compact_eff(self):
        return min(self.cap_compact or self.cap_spawn, self.cap_spawn)

    @property
    def cap_new_eff(self):
        return self.cap_new or max(self.cap_spawn // 4, 8192)

    @property
    def cap_fresh_eff(self):
        return self.cap_fresh or max(self.cap_spawn // 8, 8192)

    # store wt/diag (and the C(T)/projection tables) in f32.  On TPU the
    # nominal-f64 path pays double-float emulation on every scatter/segment
    # op (measured ~8x on the merge's scatters) for precision the physics
    # does not need: weight noise is O(1) by design, f32 diag rounding
    # (~5e-6 Ha) and f32 C(T) ratios (~1e-7 rel) sit far below the mHa
    # scale, and the per-generation estimator/population reductions still
    # accumulate in f64.  Default False: CPU validation runs are bit-f64.
    f32_state: bool = False
    axis_name: str | None = None
    n_dev: int = 1
    # continuous-time exponential projector exp(-tau(H - E_T)) instead of
    # the linear 1 - tau(H - E_T) (ref: use_exponential_projector card,
    # move_uniform_exponential_projector do_walk.f90:3803).  Per child, a
    # chain of off-diagonal moves at exponentially-sampled times under the
    # uniform total-rate bound |H_off| = nup*ndn*(norb-nup)*U/norb, with
    # the deterministic-diagonal variant (parents take the exact
    # exp(tau(E_T - H_ii)) factor; do_walk.f90:3838 deterministic_diagonal).
    # Requires semistochastic=False (the reference skips the deterministic
    # projection in this mode, do_walk.f90:2255).  No time-step error: the
    # TPU chain is a bounded unrolled scan of ct_max_jumps moves (chains
    # longer than that are zeroed; P(>12 jumps) < 1e-9 at tau*rate <= 1 -
    # raise ct_max_jumps when tau*ct_rate is larger).
    use_exponential_projector: bool = False
    ct_max_jumps: int = 12
    # which CT jump move runs (static; build_walk_tables validates it
    # against the system).  The reference only ever RAN hubbardk here -
    # its rate bound and diagonal calls are hubbardk-hardwired even
    # though the move dispatch nominally lists chem/heg
    # (do_walk.f90:3849, :3910, :3931) - so "heg" and "generic" go
    # beyond the reference:
    #   "hubbardk": uniform (e_up, e_dn, r) moves, s by momentum
    #     conservation, unit jump factors (all |H_ij| equal).
    #   "heg": uniform electron pair (uu/dd/ud) + r, s by momentum
    #     conservation, per-jump factor -H_ij/(rate * p(j|i)) with the
    #     EXACT analytic element (thinning: unbiased for ANY rate > 0;
    #     the rate only controls variance).
    #   "generic": chem-like - uniform singles + doubles over all
    #     orbital cells, exact signed elements; symmetry-forbidden or
    #     occupied targets kill the chain (variance, never bias).
    # "heg"/"generic" rates are ct_rate_mult * sum_j |H_hf,j| (the HF
    # row's off-diagonal mass, computed at table build).
    ct_mode: str = "hubbardk"
    ct_rate_mult: float = 1.5
    # projector variant (ref run_type dispatch do_walk.f90:38-50; move
    # variants :3460-4748).  'none'/'no_fixed_node' = exact signed
    # projector (plain FCIQMC); the fixed-node family applies per-spawn
    # sign rules on the importance-transformed flow Ht_ij =
    # (psi_g_i/psi_g_j) H_ij:
    #   fixed_node1/fixed_node4: sign-violating spawns REDIRECT to the
    #     parent det (the stochastic estimate of the fixed-node diagonal
    #     dump sum_viol Ht_ij);
    #   fixed_node2: violating spawns flip sign;
    #   fixed_node3: violating spawns are dropped;
    #   partial_node: violators redirect with probability
    #     partial_node_eps (eps=0 exact .. eps=1 fixed_node1);
    #   release_node: fixed_node1 until step >= release_step, exact after;
    #   sr: partial_node + Sorella comb reconfiguration each step
    #     (ref stochastic_reconfiguration do_walk.f90:7258).
    run_type: str = "none"
    partial_node_eps: float = 0.0
    release_step: int = 0
    sr_nwalk: int = 0               # sr comb size (0 = w_abs_target)
    # guiding wavefunction for importance sampling: 'none', 'gutzwiller'
    # (free-fermion x g^n_double; ref hubbard.f90 det_ratio_hubbard:4346)
    # or 'table' (explicit values; ref read_psit)
    guiding: str = "none"
    # walk in the time-reversal-symmetrized basis (ref
    # hamiltonian_chem_time_sym, chemistry.f90:1323): walkers are
    # representatives (min of (up,dn) vs (dn,up)); spawns sample the
    # det-basis connections of the stored orientation and map to
    # representatives with the sqrt2 norms and z sign flips; the diagonal
    # gains the z*<i|H|rev_i> cross term
    time_sym: bool = False
    z: int = 1

    def __post_init__(self):
        allowed = ("none", "no_fixed_node", "fixed_node1", "fixed_node2",
                   "fixed_node3", "fixed_node4", "partial_node",
                   "release_node", "sr")
        if self.run_type not in allowed:
            raise ValueError(f"unknown run_type {self.run_type!r}; one of "
                             f"{allowed} (vmc on determinant systems runs "
                             "through systems.hubbard.vmc / densewalk)")
        if self.run_type != "none" and self.run_type != "no_fixed_node" \
                and self.guiding == "none":
            raise ValueError(f"run_type {self.run_type!r} requires a "
                             "guiding wavefunction (cfg.guiding)")
        if self.proposal not in ("fast_heatbath", "uniform",
                                 "cauchy_schwarz"):
            raise ValueError(f"unknown proposal {self.proposal!r}")

    @property
    def nelec(self):
        return self.nup + self.ndn

    @property
    def npairs(self):
        return (self.nup * (self.nup - 1)) // 2 + \
               (self.ndn * (self.ndn - 1)) // 2 + self.nup * self.ndn


N_HIST_BINS = 40


class WalkTables(NamedTuple):
    """Device-resident lookup tables (built once per run).

    The same-spin and opposite-spin heat-bath families are CONCATENATED
    (opp rows offset by the same-spin totals) so the sampler's row/entry
    gathers need no same/opp select; per-entry fields are packed f32
    (self-consistent sampling distributions - see PERF_NOTES.md) so each
    logical lookup is ONE narrow HBM gather (ref tables: chemistry.f90
    setup_efficient_heatbath:872/dtm_hb + setup_alias,
    more_tools.f90:5603)."""
    # packed u32 planes (ops/rowpack layout, bit-exact bitcast moves): one
    # row gather replaces K planar gathers at the same per-row cost.
    # Each alias entry carries (f32 acceptance q, f32 own target value,
    # f32 alias-partner target value) where the target value is
    # sign(H) * (r*norb+s + 1) - fast_heatbath needs only the target pair
    # and the element SIGN (the spawn magnitude is the constant W2tot
    # form), and carrying the partner VALUE instead of its index J turns
    # accept-or-alias into one row gather + one select (no second gather)
    hb_alias_pack: jnp.ndarray   # [n_tot, 3] u32: (q, rs_own, rs_partner)
    hb_row_scr: jnp.ndarray      # [ntri_s + ntri_o, 3] u32:
                                 #   (i32 row start, i32 count, f32 |H| sum)
    # the same row sums as DENSE symmetric [norb, norb] f32 matrices, so
    # the per-walker [M, npairs] rowsum evaluation is one spin-block MXU
    # einsum chain over one-hot occupation planes (O2 @ R2 @ O2^T)
    # instead of M*npairs serialized scalar gathers (measured 100 ms/step
    # at M=600k on v5e).  NOTE the MXU quantizes the entries to bf16
    # (measured, tools/microbench_rowsum.py); the spawn weights carry an
    # exact S/diff correction so unbiasedness never depends on it.
    hb_rs_dense: jnp.ndarray     # [norb, norb] f32 same-spin (diag 0)
    hb_ro_dense: jnp.ndarray     # [norb, norb] f32 opposite-spin
    # continuous-time projector tables (cfg.use_exponential_projector,
    # hubbardk): momentum-conservation target map s = kmap3[(p*norb+q)*
    # norb+r] and the uniform total off-diagonal rate bound |H_off|
    # (dummy [1] / [()]=0 when unused)
    kmap3: jnp.ndarray           # [norb^3] i32 (or [1])
    ct_rate: jnp.ndarray         # [] f64 |H_off|
    # singles upper-bound table (chem): U[p,r] (0 if symmetry-forbidden),
    # row sums, and per-row alias tables for O(1) target sampling
    u_table: jnp.ndarray         # [norb, norb]
    u_rowsum: jnp.ndarray        # [norb]
    u_alias_qJ: jnp.ndarray      # [norb*norb, 2] u32: (f32 accept, i32 J)
    # f32-state fast path for the singles element: one [norb^2, 2norb+2]
    # f32 row gather keyed by p*norb+r carries (pr|qq) rows, (pq|qr) rows,
    # h_pr AND the U[p,r] bound - replacing two f64 row gathers + three
    # scalar gathers.  [1, 1] placeholder when inactive (f64 state or no
    # singles); f32 element noise ~1e-6 Ha enters spawn weights only
    # (the f32 state already quantizes them)
    sng_pack: jnp.ndarray        # [norb^2, 2*norb+2] f32 or [1, 1]
    # Cauchy-Schwarz separable bound c[p,r] = sqrt|(pr|pr)| with per-row
    # alias tables (proposal='cauchy_schwarz')
    cs_c: jnp.ndarray            # [norb, norb]
    cs_rowsum: jnp.ndarray       # [norb]
    cs_aliasJ: jnp.ndarray       # [norb, norb]
    cs_aliasq: jnp.ndarray       # [norb, norb]
    # integrals (for exact single elements)
    table: object                # IntegralTable (registered pytree)
    # C(T) mixed-estimator cache (sorted)
    ct_up: jnp.ndarray
    ct_dn: jnp.ndarray
    ct_num: jnp.ndarray
    ct_den: jnp.ndarray
    # cuckoo hash over the C(T) det list (ops/dethash.py; [1, 1] u32 =
    # inactive): the fresh-det C(T) lookup becomes exactly two [F]-row
    # gathers instead of re-sorting [F + n_ct] fused keys every
    # generation (6.2 -> ~1 ms/step at 32k x 129k, PERF_NOTES round-4h)
    ct_hash: jnp.ndarray
    # C(T)-in-D estimator vectors ([n_imp] f64; [0] = inactive): when every
    # Psi_T det is deterministic (true for the standard top-|c| trial
    # construction), the mixed estimator reduces to two dots against the
    # D-weight vector the exact projection already materializes, so the
    # per-walker C(T) index, its fresh-det search, its merge-sort /
    # segscan / rowpack planes, and the [M] num/den estimator gather all
    # drop out of the step.  The per-generation energy trace is then
    # evaluated on the step's INPUT state (= previous step's merged+
    # reweighted output), i.e. shifted by one generation - and since the
    # population control (e_est -> e_trial -> reweight, _finalize_step)
    # consumes the estimator, the feedback loop sees each estimate one
    # generation late: statistically equivalent control, NOT a bitwise
    # trajectory match with the gather path (test_ct_in_d.py).  Gated by
    # cfg.ct_in_d: valid only when C(T) is a subset of D (FCI-solvable D
    # spaces; never the flagship C2 trial, |C(T)|=674k vs |D|=12k).
    ct_num_imp: jnp.ndarray
    ct_den_imp: jnp.ndarray
    # deterministic space (sorted, local shard) + row-complete symmetric
    # H COO: Hw[r] = sum vals * w[cols], diag included; cols index the
    # (all-gathered when sharded) D-space weight vector
    imp_up: jnp.ndarray
    imp_dn: jnp.ndarray
    imp_rows: jnp.ndarray
    imp_cols: jnp.ndarray
    imp_vals: jnp.ndarray
    # block-ELL layout of the same matrix (single-device path): rows padded
    # to 128-slot blocks so the projection is gather + [nb,128] row-sum +
    # a tiny [n_blocks] segment-sum instead of a [nnz]-long f64 scatter-add
    # (measured 165 ms/step at 1.5M nnz on v5e - TPU scatter-adds serialize)
    imp_ell_cols: jnp.ndarray    # [P] i32 (pad -> 0), off-diagonal only
    imp_ell_vals: jnp.ndarray    # [P] f64/f32 (pad -> 0), off-diag only
    imp_ell_row: jnp.ndarray     # [P//128] i32 row id per block
    imp_diag: jnp.ndarray        # [n_imp] f64 H diagonal (ELL path)
    # dense [n_imp, n_imp] f32 off-diagonal projection matrix (f32-state
    # runs with n_imp <= cfg.dense_proj_max; [0, 0] otherwise): the MXU
    # matvec replaces the block-ELL gather at HBM-streaming speed
    imp_dense: jnp.ndarray
    # guiding wavefunction (importance sampling / fixed-node; empty
    # placeholder when cfg.guiding == 'none')
    guide: object


class WalkState(NamedTuple):
    up: jnp.ndarray             # [M, W] uint64 (sentinel ~0 for empty)
    dn: jnp.ndarray
    wt: jnp.ndarray             # [M] float64
    init: jnp.ndarray           # [M] int32: 0..3 initiator code
    imp: jnp.ndarray            # [M] int32: 0=deterministic, -2=C(T),
                                #   -1=spawned-from-D (transient), >=1 dist
    diag: jnp.ndarray           # [M] float64 diagonal cache (DIAG_UNKNOWN unknown)
    ct: jnp.ndarray             # [M] int32 C(T)-cache index (-1 = not in
                                #   C(T), -2 = unknown/repair at next merge)
    nwalk: jnp.ndarray          # scalar int32
    key: jnp.ndarray            # PRNG key
    e_trial: jnp.ndarray        # scalar f64
    e_est: jnp.ndarray
    tau: jnp.ndarray            # current timestep (variable during growth)
    reweight_factor_inv: jnp.ndarray
    reached_target: jnp.ndarray  # bool
    equilibrated: jnp.ndarray    # bool: e_trial frozen
    # estimator accumulators (reference *_blkabs_cum + current block)
    e_num_blkabs_cum: jnp.ndarray
    e_den_blkabs_cum: jnp.ndarray
    e_num_blk: jnp.ndarray
    e_den_blk: jnp.ndarray
    w_abs_gen: jnp.ndarray
    overflow: jnp.ndarray        # bool: capacity exceeded (host must grow)
    step: jnp.ndarray            # generation counter (release_node)


SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)

# Device float constants, chosen to survive the TPU backend's SILENT
# f64->f32 demotion (arrays report float64 but store f32; verified on the
# axon backend: jnp.float64(DIAG_UNKNOWN) reads back as inf and inf > DIAG_UNKNOWN_THRESHOLD is
# False, which permanently disabled the diagonal-cache repair in rounds
# 1-2 and killed every stochastic walker outside the D space after one
# step).  DIAG_UNKNOWN marks an unevaluated diagonal element; TINY guards
# divisions.  Both are exactly representable in f32.
DIAG_UNKNOWN = 1e30
DIAG_UNKNOWN_THRESHOLD = 1e29
TINY = 1e-30


# ---------------------------------------------------------------------------
# Table construction (host)
# ---------------------------------------------------------------------------

def _hf_offdiag_mass(system) -> float:
    """sum_j |H_hf,j| over the HF det's connections: the CT jump rate
    scale for the heg/generic exponential-projector modes.  Any rate > 0
    is unbiased (the per-jump factor divides by rate * p(j|i)); this is
    the natural scale that keeps factors O(1)."""
    from .connect import generate_connections
    up = np.atleast_2d(np.asarray(system.hf_up))
    dn = np.atleast_2d(np.asarray(system.hf_dn))
    _, _, helem, _ = generate_connections(system, up, dn, np.zeros(1))
    mass = float(np.abs(helem).sum())
    if mass <= 0.0:
        raise ValueError("HF det has no off-diagonal connections - "
                         "cannot scale the CT jump rate")
    return mass


def build_walk_tables(system, trial, guide=None, cfg=None) -> WalkTables:
    """Assemble device tables from a FermionSystem + TrialWavefunction.

    With a guiding wavefunction (cfg.guiding != 'none'), the C(T)
    estimator caches and the deterministic-space projector are
    importance-transformed (Ht_ij = psi_g_i/psi_g_j H_ij), and the
    projector additionally gets the EXACT fixed-node treatment of
    cfg.run_type (violators zeroed, column dumps on the diagonal) -
    mirroring the reference's deterministic-space handling of the
    effective Hamiltonian (ref do_walk.f90:887-1012)."""
    hb = system.heatbath
    table = system.table
    norb = system.norb
    from .guiding import empty_guiding, eval_guiding
    guiding_kind = cfg.guiding if cfg is not None else "none"
    run_type = cfg.run_type if cfg is not None else "none"
    if guide is None:
        guide = empty_guiding()

    def row_cums(val, start, count):
        """In-row inclusive |value| prefix sums over the flat ragged array
        (robust to empty rows)."""
        v = np.abs(np.asarray(val))
        cum = np.cumsum(v)
        cum0 = np.concatenate([[0.0], cum])
        st = np.asarray(start)
        ct = np.asarray(count).astype(np.int64)
        offs = np.repeat(cum0[st], ct)
        if len(offs) < len(v):   # padding entry appended by build_heatbath
            offs = np.concatenate([offs, cum0[-2:-1]])
        return cum - offs

    s_cum = row_cums(hb.same_val, hb.same_start, hb.same_count)
    o_cum = row_cums(hb.opp_val, hb.opp_start, hb.opp_count)
    s_rowsum = np.zeros(len(np.asarray(hb.same_start)))
    cnt = np.asarray(hb.same_count)
    st = np.asarray(hb.same_start)
    nz = cnt > 0
    s_rowsum[nz] = s_cum[(st + cnt - 1)[nz]]
    o_rowsum = np.zeros(len(np.asarray(hb.opp_start)))
    cnt_o = np.asarray(hb.opp_count)
    st_o = np.asarray(hb.opp_start)
    nz = cnt_o > 0
    o_rowsum[nz] = o_cum[(st_o + cnt_o - 1)[nz]]

    def row_alias(val, start, count):
        """Per-row alias tables over |val| in the flat ragged array: the
        in-row target draw becomes O(1) - 2 gathers instead of a
        log(row)-deep bisection of HBM gathers (ref: setup_alias,
        more_tools.f90:5603)."""
        from ..native import build_row_alias
        from ..ops.alias import setup_alias_np
        v = np.abs(np.asarray(val))
        st_a = np.asarray(start).astype(np.int64)
        ct_a = np.asarray(count).astype(np.int64)
        out = build_row_alias(v, st_a, ct_a)
        if out is not None:
            return out
        J = np.zeros(len(v), np.int32)
        q = np.ones(len(v))
        for s, c in zip(st_a, ct_a):
            if c <= 0:
                continue
            row = v[s:s + c]
            tot = row.sum()
            if tot <= 0:
                continue
            Jr, qr = setup_alias_np(row / tot)
            J[s:s + c] = Jr
            q[s:s + c] = qr
        return J, q

    s_J, s_q = row_alias(hb.same_val, hb.same_start, hb.same_count)
    o_J, o_q = row_alias(hb.opp_val, hb.opp_start, hb.opp_count)

    # Cauchy-Schwarz separable bound tables (proposal='cauchy_schwarz';
    # ref off_diagonal_move_chem_cauchySchwarz:2530): c[p,r]=sqrt|(pr|pr)|
    from ..ops.alias import setup_alias_np
    pr = np.arange(norb)
    PP, RR = np.meshgrid(pr, pr, indexing="ij")
    cs_c = np.sqrt(np.abs(np.asarray(
        table.eri_value_np(PP.ravel(), RR.ravel(), PP.ravel(),
                           RR.ravel())))).reshape(norb, norb)
    np.fill_diagonal(cs_c, 0.0)
    cs_rowsum = cs_c.sum(axis=1)
    cs_J2 = np.zeros((norb, norb), np.int32)
    cs_q2 = np.ones((norb, norb))
    for p_ in range(norb):
        if cs_rowsum[p_] > 0:
            cs_J2[p_], cs_q2[p_] = setup_alias_np(cs_c[p_] / cs_rowsum[p_])

    # singles bound U[p,r] = |h_pr| + sum_q (|(pr|qq)| + |(pq|qr)|),
    # zeroed when symmetry-forbidden or p==r; per-row alias tables make the
    # target-orbital draw O(1) (2 gathers) instead of a log(norb) bisection
    if system.has_singles:
        sd = np.abs(np.asarray(table.sing_dir)).sum(axis=1).reshape(norb, norb)
        se = np.abs(np.asarray(table.sing_exch)).sum(axis=1).reshape(norb, norb)
        U = np.abs(np.asarray(table.h)) + sd + se
        sym = np.asarray(system.orb_sym_arr)
        U[sym[:, None] != sym[None, :]] = 0.0
        np.fill_diagonal(U, 0.0)
    else:
        U = np.zeros((norb, norb))
    u_rowsum = U.sum(axis=1)
    u_aliasJ = np.zeros((norb, norb), np.int32)
    u_aliasq = np.ones((norb, norb))
    for p_ in range(norb):
        if u_rowsum[p_] > 0:
            u_aliasJ[p_], u_aliasq[p_] = setup_alias_np(U[p_] / u_rowsum[p_])
    sng_pack = np.zeros((1, 1), np.float32)
    if (cfg is not None and cfg.f32_state and system.has_singles
            and getattr(table, "sing_dir", None) is not None):
        sng_pack = np.concatenate([
            np.asarray(table.sing_dir, np.float64),
            np.asarray(table.sing_exch, np.float64),
            np.asarray(table.h, np.float64).reshape(-1, 1),
            U.reshape(-1, 1)], axis=1).astype(np.float32)

    # row-complete symmetric COO (diag + both orientations of the stored
    # upper triangle) so the projection is a single segment-sum
    n_imp = len(trial.imp_up)
    H = trial.imp_ham
    r_all = np.concatenate([H.rows, H.cols, np.arange(n_imp)]).astype(np.int32)
    c_all = np.concatenate([H.cols, H.rows, np.arange(n_imp)]).astype(np.int32)
    v_all = np.concatenate([H.vals, H.vals, H.diag])
    # row-sorted COO: the projection's segment_sum runs with
    # indices_are_sorted=True (sorted-segment lowering on TPU)
    ord_r = np.argsort(r_all, kind="stable")
    r_all, c_all, v_all = r_all[ord_r], c_all[ord_r], v_all[ord_r]

    fdt = np.float32 if (cfg is not None and cfg.f32_state) else np.float64
    ct_num = np.asarray(trial.ct_num, np.float64)
    ct_den = np.asarray(trial.ct_den, np.float64)
    if guiding_kind != "none":
        # importance transform of the estimator caches: the walker carries
        # f_i = psi_g_i Phi_i, so the per-det numerator/denominator divide
        # by psi_g (ref energy_pieces under importance sampling)
        g_ct = np.asarray(eval_guiding(guide, guiding_kind,
                                       jnp.asarray(trial.ct_up),
                                       jnp.asarray(trial.ct_dn),
                                       norb, system.nup, system.ndn))
        g_ct = np.where(np.abs(g_ct) < 1e-300, 1e-300, g_ct)
        ct_num = ct_num / g_ct
        ct_den = ct_den / g_ct
        if n_imp > 0:
            g_imp = np.asarray(eval_guiding(guide, guiding_kind,
                                            jnp.asarray(trial.imp_up),
                                            jnp.asarray(trial.imp_dn),
                                            norb, system.nup, system.ndn))
            g_imp = np.where(np.abs(g_imp) < 1e-300, 1e-300, g_imp)
            off = r_all != c_all
            v_all = v_all * np.where(off, g_imp[r_all] / g_imp[c_all], 1.0)
            if run_type not in ("none", "no_fixed_node"):
                # exact fixed-node effective H on the deterministic space:
                # sign-violating off-diagonals (Ht > 0) move to the
                # column's diagonal per the run_type rule
                viol = off & (v_all > 0)
                eps_fn = {"fixed_node1": 1.0, "fixed_node4": 1.0,
                          "release_node": 1.0, "fixed_node3": 1.0,
                          "partial_node": cfg.partial_node_eps,
                          "sr": cfg.partial_node_eps,
                          "fixed_node2": 1.0}[run_type]
                dump = np.zeros(n_imp)
                np.add.at(dump, c_all[viol], eps_fn * v_all[viol])
                if run_type == "fixed_node2":
                    v_all = np.where(viol, -v_all, v_all)
                else:
                    v_all = np.where(viol, (1.0 - eps_fn) * v_all, v_all)
                    if run_type != "fixed_node3":
                        diag_sel = ~off
                        add = dump[r_all] * diag_sel
                        v_all = v_all + add

    # concatenate the same/opp families: opp entry indices offset by
    # n_same, opp row indices offset by ntri_s (handled at the call site)
    n_same = len(np.asarray(hb.same_val))
    rs_cat = np.concatenate([np.asarray(hb.same_rs, np.float64),
                             np.asarray(hb.opp_rs, np.float64)])
    val_cat = np.concatenate([np.asarray(hb.same_val), np.asarray(hb.opp_val)])
    sgn = np.where(val_cat < 0, -1.0, 1.0)
    hb_rssign = (sgn * (rs_cat + 1.0)).astype(np.float32)
    hb_alias_q = np.concatenate([s_q, o_q]).astype(np.float32)
    hb_alias_J = np.concatenate([s_J, o_J]).astype(np.int32)
    hb_start = np.concatenate([
        np.asarray(hb.same_start, np.int64),
        np.asarray(hb.opp_start, np.int64) + n_same]).astype(np.int32)
    hb_count = np.concatenate([np.asarray(hb.same_count),
                               np.asarray(hb.opp_count)]).astype(np.int32)
    # alias entries carry their OWN target value and their alias
    # PARTNER's value (precomputed here), so the accept-or-alias draw is
    # one row gather + one select - no post-alias hb_rssign re-gather
    n_tot = len(hb_rssign)
    ers = np.arange(n_tot, dtype=np.int64)   # padding entries: self
    for st_, ct_ in zip(hb_start.astype(np.int64),
                        hb_count.astype(np.int64)):
        ers[st_:st_ + ct_] = st_
    partner_rs = hb_rssign[np.clip(ers + hb_alias_J, 0, n_tot - 1)]
    hb_alias_pack = np.stack([hb_alias_q.view(np.uint32),
                              hb_rssign.view(np.uint32),
                              partner_rs.view(np.uint32)], axis=1)
    # f32 rowsums: the sampler stays self-consistent (selection probability
    # and weight normalization read the same array)
    hb_rowsum = np.concatenate([s_rowsum, o_rowsum]).astype(np.float32)
    # one packed (start, count, rowsum) row per pair class: the per-slot
    # row descriptor becomes ONE row gather instead of three planar ones
    hb_row_scr = np.stack([hb_start.view(np.uint32),
                           hb_count.view(np.uint32),
                           hb_rowsum.view(np.uint32)], axis=1)

    # dense [norb, norb] views of the f32 rowsums (MXU proposal path)
    aa, bb_ = np.triu_indices(norb, k=1)
    rs_dense = np.zeros((norb, norb), np.float32)
    rs_dense[aa, bb_] = hb_rowsum[np.asarray(tri_lt(aa, bb_))]
    rs_dense = rs_dense + rs_dense.T
    ntri_s_np = norb * (norb - 1) // 2
    aae, bbe = np.triu_indices(norb, k=0)
    ro_dense = np.zeros((norb, norb), np.float32)
    ro_dense[aae, bbe] = hb_rowsum[ntri_s_np + np.asarray(tri_le(aae, bbe))]
    ro_dense = ro_dense + ro_dense.T - np.diag(np.diag(ro_dense))

    # block-ELL layout of the (final, possibly guiding/FN-transformed)
    # projection matrix: each row's OFF-DIAGONAL entries padded to
    # 128-slot blocks; the diagonal is split out as a dense [n_imp] f64
    # vector so the step can use the well-conditioned difference form
    # deltaw = tau*((e_trial - diag_i) w_i - Hoff w) - the two terms are
    # O(correlation energy * w) instead of O(E_tot * w), which keeps the
    # f32-state projection (cfg.f32_state) at ~1e-10 relative error
    if n_imp > 0:
        imp_diag = np.zeros(n_imp)
        dmask = r_all == c_all
        np.add.at(imp_diag, r_all[dmask], v_all[dmask])
        r_off, c_off, v_off = r_all[~dmask], c_all[~dmask], v_all[~dmask]
        counts = np.bincount(r_off, minlength=n_imp)
        nb_r = np.maximum(1, -(-counts // 128))
        block_starts = np.concatenate([[0], np.cumsum(nb_r)])[:-1] * 128
        csr_start = np.concatenate([[0], np.cumsum(counts)])
        P = int(np.sum(nb_r)) * 128
        ell_cols = np.zeros(P, np.int32)
        ell_vals = np.zeros(P)
        slot = block_starts[r_off] + (np.arange(len(r_off)) -
                                      csr_start[r_off])
        ell_cols[slot] = c_off
        ell_vals[slot] = v_off
        ell_row = np.repeat(np.arange(n_imp, dtype=np.int32), nb_r)
        imp_dense = np.zeros((0, 0), np.float32)
        if (cfg is not None and cfg.f32_state
                and 0 < n_imp <= cfg.dense_proj_max):
            imp_dense = np.zeros((n_imp, n_imp), np.float32)
            np.add.at(imp_dense, (r_off, c_off), v_off)
    else:
        imp_diag = np.zeros(0)
        ell_cols = np.zeros(0, np.int32)
        ell_vals = np.zeros(0)
        ell_row = np.zeros(0, np.int32)
        imp_dense = np.zeros((0, 0), np.float32)

    # continuous-time projector tables (use_exponential_projector)
    kmap3 = np.zeros(1, np.int32)
    ct_rate = 0.0
    if cfg is not None and getattr(cfg, "use_exponential_projector", False):
        sysname = getattr(system, "name", "")
        if cfg.semistochastic:
            raise ValueError(
                "use_exponential_projector requires semistochastic=False "
                "(ref skips the deterministic projection, do_walk.f90:2255)")
        if cfg.run_type not in ("none", "no_fixed_node"):
            raise NotImplementedError(
                "use_exponential_projector supports the plain signed "
                "projector only")
        if getattr(cfg, "time_sym", False):
            raise NotImplementedError(
                "use_exponential_projector runs in the plain det basis "
                "(no time-reversal symmetrization)")
        mode = getattr(cfg, "ct_mode", "hubbardk")
        if mode == "hubbardk":
            if sysname != "hubbardk":
                raise NotImplementedError(
                    "ct_mode='hubbardk' needs a momentum-space Hubbard "
                    "system; set ct_mode='heg' or 'generic' for this one "
                    "(WalkConfig.ct_mode)")
            if cfg.has_singles:
                raise NotImplementedError(
                    "ct_mode='hubbardk' is the doubles-only uniform walk")
        elif mode == "heg":
            if sysname != "heg":
                raise NotImplementedError(
                    "ct_mode='heg' needs the HEG system (momentum-"
                    "conserving doubles with analytic elements)")
            if cfg.nup < 1 or cfg.ndn < 1 or cfg.nelec < 2:
                raise ValueError("ct_mode='heg' needs >=1 electron of "
                                 "each spin")
            # exact momentum map WITHOUT periodic folding (no umklapp in
            # the HEG): s with k_s = k_p + k_q - k_r, -1 when outside the
            # cutoff sphere (such proposals kill the chain)
            rel = np.asarray(system.extra["k_rel"], np.int64)
            lut = {tuple(v): i for i, v in enumerate(rel.tolist())}
            ks = (rel[:, None, None, :] + rel[None, :, None, :]
                  - rel[None, None, :, :]).reshape(-1, rel.shape[1])
            kmap3 = np.fromiter(
                (lut.get(tuple(v), -1) for v in ks.tolist()),
                np.int32, count=len(ks))
            ct_rate = cfg.ct_rate_mult * _hf_offdiag_mass(system)
        elif mode == "generic":
            if sysname in ("hubbardk", "hubbard2", "hubbarddm"):
                raise NotImplementedError(
                    "ct_mode='generic' covers det systems with chem-style "
                    "integral tables (chem/heg/toy); hubbardk has its own "
                    "mode and real-space Hubbard is unsupported")
            if cfg.nup < 1 or cfg.ndn < 1 or cfg.nelec < 2:
                raise ValueError("ct_mode='generic' needs >=1 electron "
                                 "of each spin")
            ct_rate = cfg.ct_rate_mult * _hf_offdiag_mass(system)
        else:
            raise ValueError(f"unknown ct_mode {mode!r}")
    if (cfg is not None and getattr(cfg, "use_exponential_projector", False)
            and cfg.ct_mode == "hubbardk"):
        ex = system.extra
        rel = np.asarray(ex["k_rel"], np.int64)
        lx, ly = int(ex["l_x"]), int(ex["l_y"])
        kmin = rel.min(axis=0)
        # canonical half-step grid coordinates; umklapp = mod L (all k
        # components share one parity, so the //2 is exact)
        idx = np.full((lx, ly), -1, np.int32)
        idx[((rel[:, 0] - kmin[0]) // 2) % lx,
            ((rel[:, 1] - kmin[1]) // 2) % ly] = np.arange(norb)
        ks = rel[:, None, None, :] + rel[None, :, None, :] \
            - rel[None, None, :, :]
        kmap3 = idx[((ks[..., 0] - kmin[0]) // 2) % lx,
                    ((ks[..., 1] - kmin[1]) // 2) % ly].reshape(-1)
        assert kmap3.min() >= 0
        ct_rate = cfg.nup * cfg.ndn * (norb - cfg.nup) \
            * abs(float(ex["U"])) / norb

    # C(T)-in-D estimator vectors (see WalkTables docstring): active when
    # the run is semistochastic and every Psi_T det is found in D
    ct_num_imp = np.zeros(0)
    ct_den_imp = np.zeros(0)
    if (n_imp > 0 and cfg is not None and cfg.semistochastic
            and cfg.ct_in_d and len(trial.ct_up) > 0):
        pos_ct = np.asarray(setalg.search_dets(
            trial.imp_up, trial.imp_dn, trial.ct_up, trial.ct_dn))
        if not np.all(pos_ct >= 0):
            raise ValueError(
                "ct_in_d=True requires every C(T) det in the deterministic "
                f"space: {int((pos_ct < 0).sum())}/{len(pos_ct)} outside D "
                "(the estimator would silently drop their contributions)")
        ct_num_imp = np.zeros(n_imp)
        ct_den_imp = np.zeros(n_imp)
        ct_num_imp[pos_ct] = ct_num
        ct_den_imp[pos_ct] = ct_den

    return WalkTables(
        hb_alias_pack=jnp.asarray(hb_alias_pack),
        hb_row_scr=jnp.asarray(hb_row_scr),
        hb_rs_dense=jnp.asarray(rs_dense),
        hb_ro_dense=jnp.asarray(ro_dense),
        kmap3=jnp.asarray(kmap3), ct_rate=jnp.asarray(float(ct_rate)),
        u_table=jnp.asarray(U), u_rowsum=jnp.asarray(u_rowsum),
        sng_pack=jnp.asarray(sng_pack),
        u_alias_qJ=jnp.asarray(np.stack(
            [u_aliasq.astype(np.float32).reshape(-1).view(np.uint32),
             u_aliasJ.astype(np.int32).reshape(-1).view(np.uint32)],
            axis=1)),
        cs_c=jnp.asarray(cs_c), cs_rowsum=jnp.asarray(cs_rowsum),
        cs_aliasJ=jnp.asarray(cs_J2), cs_aliasq=jnp.asarray(cs_q2),
        table=table,
        ct_up=jnp.asarray(trial.ct_up), ct_dn=jnp.asarray(trial.ct_dn),
        ct_num=jnp.asarray(ct_num.astype(fdt)),
        ct_den=jnp.asarray(ct_den.astype(fdt)),
        ct_hash=jnp.asarray(
            dethash.build_det_hash(trial.ct_up, trial.ct_dn, cfg.norb)
            if (cfg is not None and cfg.det_hash and len(trial.ct_up) > 0
                and ct_num_imp.shape[0] == 0)
            else np.zeros((1, 1), np.uint32)),
        ct_num_imp=jnp.asarray(ct_num_imp),
        ct_den_imp=jnp.asarray(ct_den_imp),
        imp_up=jnp.asarray(trial.imp_up), imp_dn=jnp.asarray(trial.imp_dn),
        imp_rows=jnp.asarray(r_all), imp_cols=jnp.asarray(c_all),
        imp_vals=jnp.asarray(v_all.astype(fdt)),
        imp_ell_cols=jnp.asarray(ell_cols),
        imp_ell_vals=jnp.asarray(ell_vals.astype(fdt)),
        imp_ell_row=jnp.asarray(ell_row),
        imp_diag=jnp.asarray(imp_diag),
        imp_dense=(jnp.asarray(imp_dense).astype(jnp.bfloat16)
                   if cfg is not None and cfg.proj_bf16
                   else jnp.asarray(imp_dense)),
        guide=guide,
    )


def init_walk_state(cfg: WalkConfig, trial, w_abs_begin: float,
                    e_trial_initial: float, seed: int = 0,
                    guide=None, tables: "WalkTables | None" = None) -> WalkState:
    """Initial population: Psi_T dets weighted by coefficients, scaled to
    total |w| = w_abs_begin (ref: do_walk.f90:1129-1368), plus all
    deterministic-space dets at weight 0 so the projector always sees them.
    Under importance sampling the walker carries f = psi_g * Phi (taken
    positive for fixed-node runs; ref do_walk.f90:1212-1217).
    """
    M, W = cfg.mwalk, cfg.n_words
    sdt = np.float32 if cfg.f32_state else np.float64
    up = np.full((M, W), SENTINEL, dtype=np.uint64)
    dn = np.full((M, W), SENTINEL, dtype=np.uint64)
    wt = np.zeros(M, sdt)
    init = np.zeros(M, np.int32)
    imp = np.full(M, 10 ** 6, np.int32)
    diag = np.full(M, DIAG_UNKNOWN, sdt)
    ct = np.full(M, -1, np.int32)

    # union of Psi_T and D-space dets, sorted
    all_up = np.concatenate([trial.psit_up, trial.imp_up])
    all_dn = np.concatenate([trial.psit_dn, trial.imp_dn])
    coefs = np.concatenate([trial.psit_coef, np.zeros(len(trial.imp_up))])
    u, d, (c,), _ = setalg.unique_dets(all_up, all_dn, [coefs])
    if cfg.guiding != "none" and guide is not None:
        from .guiding import eval_guiding
        g = np.asarray(eval_guiding(guide, cfg.guiding, jnp.asarray(u),
                                    jnp.asarray(d), cfg.norb, cfg.nup,
                                    cfg.ndn))
        c = g * c
        if cfg.run_type not in ("none", "no_fixed_node"):
            c = np.abs(c)   # f = psi_g * Phi >= 0 (ref do_walk.f90:1212)
    scale = w_abs_begin / max(np.sum(np.abs(c)), 1e-300)
    n0 = len(u)
    up[:n0] = u
    dn[:n0] = d
    wt[:n0] = c * scale
    # membership flags (imp==0 exempts a det from the stochastic diagonal
    # move, so it is only valid when the exact D-projection runs)
    if cfg.semistochastic:
        in_imp = ~setalg.setdiff_dets(u, d, trial.imp_up, trial.imp_dn)
        imp[:n0] = np.where(in_imp, 0, 1)
    else:
        imp[:n0] = 1
    init[:n0] = 2  # starting dets are initiators

    # resident walkers always carry their C(T)-cache index and (when the
    # integral tables are at hand) diagonal element; anything left unknown
    # here is repaired by the step's cond-guarded fill
    ct[:n0] = setalg.search_dets(trial.ct_up, trial.ct_dn, u, d)
    if tables is not None:
        bu = dets.to_bits(jnp.asarray(u), cfg.norb)
        bd = dets.to_bits(jnp.asarray(d), cfg.norb)
        dg = slater.diag_elements(tables.table, bu, bd)
        if cfg.time_sym:
            cross = slater.pair_matrix_elements(tables.table, bu, bd, bd, bu)
            selfs = np.all(u == d, axis=1)
            dg = dg + jnp.where(jnp.asarray(selfs), 0.0, cfg.z * cross)
        diag[:n0] = np.asarray(dg)

    return WalkState(
        up=jnp.asarray(up), dn=jnp.asarray(dn), wt=jnp.asarray(wt),
        init=jnp.asarray(init), imp=jnp.asarray(imp), diag=jnp.asarray(diag),
        ct=jnp.asarray(ct),
        nwalk=jnp.asarray(n0, jnp.int32), key=jax.random.PRNGKey(seed),
        e_trial=jnp.asarray(float(e_trial_initial), jnp.float64),
        e_est=jnp.asarray(float(e_trial_initial), jnp.float64),
        tau=jnp.asarray(cfg.tau * (1 + np.log(max(cfg.w_abs_target / max(w_abs_begin, 1.0), 1.0))), jnp.float64),
        reweight_factor_inv=jnp.asarray(1.0, jnp.float64),
        reached_target=jnp.asarray(False),
        equilibrated=jnp.asarray(False),
        e_num_blkabs_cum=jnp.asarray(0.0, jnp.float64),
        e_den_blkabs_cum=jnp.asarray(0.0, jnp.float64),
        e_num_blk=jnp.asarray(0.0, jnp.float64),
        e_den_blk=jnp.asarray(0.0, jnp.float64),
        w_abs_gen=jnp.asarray(float(w_abs_begin), jnp.float64),
        overflow=jnp.asarray(False),
        step=jnp.asarray(0, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Step kernel pieces
# ---------------------------------------------------------------------------

def _lex_less_eq(a_up, a_dn, b_up, b_dn):
    """(a < b, a == b) under the up-major, most-significant-word-first
    ordering, for packed [..., W] det pairs."""
    W = a_up.shape[-1]
    lt = jnp.zeros(a_up.shape[:-1], bool)
    eq = jnp.ones(a_up.shape[:-1], bool)
    for arr_a, arr_b in ((a_up, b_up), (a_dn, b_dn)):
        for w in range(W - 1, -1, -1):
            aw = arr_a[..., w]
            bw = arr_b[..., w]
            lt = lt | (eq & (aw < bw))
            eq = eq & (aw == bw)
    return lt, eq


def _searchsorted_dets(list_up, list_dn, q_up, q_dn, norb: int | None = None):
    """Index of each query det in a sorted packed det list, -1 if absent.
    Works on the most-significant-word-first fused ordering used by
    setalg.sort.  With norb <= 32 the two halves fuse into ONE uint64 key
    and the lookup is a single jnp.searchsorted (the cheapest lowering);
    otherwise a bisection comparing all 2W words."""
    n = list_up.shape[0]
    if norb is not None and norb <= 32 and list_up.shape[1] == 1:
        lu = list_up[:, 0]
        ld = list_dn[:, 0]
        qu = q_up[:, 0]
        qd = q_dn[:, 0]
        lk = (lu << jnp.uint64(32)) | (ld & jnp.uint64(0xFFFFFFFF))
        qk = (qu << jnp.uint64(32)) | (qd & jnp.uint64(0xFFFFFFFF))
        # method='sort' co-sorts queries with the list - one fused sort
        # instead of log2(n) serialized [q]-wide gather rounds (sorts are
        # nearly free on TPU, scattered gathers are not; 9.4 -> 6.2 ms at
        # 33k queries x 129k list, PERF_NOTES round-3k)
        idx = jnp.clip(jnp.searchsorted(lk, qk, method="sort"),
                       0, n - 1).astype(jnp.int32)
        return jnp.where(lk[idx] == qk, idx, -1)

    lo = jnp.zeros(q_up.shape[:1], jnp.int32)
    hi = jnp.full(q_up.shape[:1], n, jnp.int32)
    n_iter = max(int(np.ceil(np.log2(max(n, 2)))) + 1, 1)

    def body2(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        mc = jnp.clip(mid, 0, n - 1)
        less, _ = _lex_less_eq(list_up[mc], list_dn[mc], q_up, q_dn)
        go_right = less & (lo < hi)
        return (jnp.where(go_right, mid + 1, lo),
                jnp.where(go_right, hi, mid))

    lo, hi = jax.lax.fori_loop(0, n_iter, body2, (lo, hi))
    idx = jnp.clip(lo, 0, n - 1)
    _, found = _lex_less_eq(list_up[idx], list_dn[idx], q_up, q_dn)
    return jnp.where(found, idx, -1)


def _lower_bound_dets(list_up, list_dn, q_up, q_dn, norb: int | None = None):
    """Insertion position (lower bound) of each query det in a sorted
    packed det list: the count of list entries with key < query."""
    n = list_up.shape[0]
    if norb is not None and norb <= 32 and list_up.shape[1] == 1:
        lk = (list_up[:, 0] << jnp.uint64(32)) | \
            (list_dn[:, 0] & jnp.uint64(0xFFFFFFFF))
        qk = (q_up[:, 0] << jnp.uint64(32)) | \
            (q_dn[:, 0] & jnp.uint64(0xFFFFFFFF))
        return jnp.searchsorted(lk, qk, side="left",
                                method="sort").astype(jnp.int32)
    lo = jnp.zeros(q_up.shape[:1], jnp.int32)
    hi = jnp.full(q_up.shape[:1], n, jnp.int32)
    n_iter = max(int(np.ceil(np.log2(max(n, 2)))) + 1, 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        mc = jnp.clip(mid, 0, n - 1)
        less, _ = _lex_less_eq(list_up[mc], list_dn[mc], q_up, q_dn)
        go_right = less & (lo < hi)
        return (jnp.where(go_right, mid + 1, lo),
                jnp.where(go_right, hi, mid))

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return lo


def _lexsort_walkers(up, dn, norb: int | None = None):
    """Sort order by (up, dn) keys, most significant first.  When both
    halves fit one word (norb <= 32) the key fuses into a single uint64 -
    one sort pass instead of 2W stable passes."""
    W = up.shape[1]
    if W == 1 and norb is not None and norb <= 32:
        key = (up[:, 0] << jnp.uint64(32)) | dn[:, 0]
        # sentinel rows (all ones) still sort last: up=~0 dominates
        return jnp.argsort(key)
    keys = []
    for w in range(W):
        keys.append(dn[:, w])
    for w in range(W):
        keys.append(up[:, w])
    return jnp.lexsort(tuple(keys))


# ---------------------------------------------------------------------------
# The step
# ---------------------------------------------------------------------------

def _fill_fresh(cfg, tables, up, dn, diag, ct, need, with_ct: bool = True):
    """Compute diagonal elements + C(T)-cache indices for the rows flagged
    in `need`, through a cap_fresh-sized compaction buffer (PERF_NOTES
    ideas 2-3: every resident walker carries diag and ct, so the [M]
    diagonal evaluation and [M]-query C(T) search run only over fresh
    determinants).  with_ct=False (C(T)-in-D estimator active): the index
    plane is dead — skip its search and scatter, return ct unchanged.
    Returns (diag, ct, overflow)."""
    M = up.shape[0]
    F = cfg.cap_fresh_eff
    norb = cfg.norb
    fpos = prefix.cumsum_i32(need.astype(jnp.int32)) - 1
    n_need = fpos[-1] + 1
    overflow = n_need > F
    # compaction via top_k instead of an arbitrary scatter: TPU scatters
    # serialize (microbench_scatter r4h: 16.7 ms scatter vs 1.8 ms top_k
    # at [458k] -> [32k]); the key ranks needed rows by ascending index,
    # so the result is bit-identical to the scatter form (first F needed
    # rows, ascending; M sentinel beyond n_need)
    _, f_top = jax.lax.top_k(
        jnp.where(need, M - jnp.arange(M, dtype=jnp.int32), -1), min(F, M))
    if F > M:      # tiny configs: cap_fresh floor can exceed mwalk
        f_top = jnp.concatenate([f_top, jnp.full(F - M, M, jnp.int32)])
    fidx = jnp.where(jnp.arange(F) < n_need, f_top, M)
    fi = jnp.clip(fidx, 0, M - 1)
    f_up = up[fi]
    f_dn = dn[fi]
    fb_up = dets.to_bits(f_up, norb)
    fb_dn = dets.to_bits(f_dn, norb)
    # f32-state runs evaluate the diagonal directly in f32 (see
    # slater.diag_elements dtype note; the state stores f32 regardless)
    f_diag = slater.diag_elements(tables.table, fb_up, fb_dn,
                                  dtype=diag.dtype)
    if cfg.time_sym:
        # ts diagonal cross term z*<i|H|rev_i> for non-self-symmetric
        # representatives (ref hamiltonian_chem_time_sym diagonal branch)
        cross = slater.pair_matrix_elements(tables.table, fb_up, fb_dn,
                                            fb_dn, fb_up)
        selfs = jnp.all(f_up == f_dn, axis=1)
        f_diag = f_diag + jnp.where(selfs, 0.0, cfg.z * cross)
    # fidx is ascending (needed rows in order, M sentinels last): the
    # sorted-indices hint keeps these scatters off the serialized path
    diag = diag.at[fidx].set(f_diag.astype(diag.dtype), mode="drop",
                             indices_are_sorted=True)
    if with_ct:
        if tables.ct_hash.shape[0] > 1:
            f_ct = dethash.lookup_det_hash(tables.ct_hash, f_up, f_dn,
                                           norb)
        else:
            f_ct = _searchsorted_dets(tables.ct_up, tables.ct_dn, f_up,
                                      f_dn, norb)
        ct = ct.at[fidx].set(f_ct, mode="drop", indices_are_sorted=True)
    return diag, ct, overflow


def _ct_chain(cfg, tables, state, b, slot_valid, key, tau, e_trial):
    """Continuous-time off-diagonal chains for the exponential projector
    (ref: move_uniform_exponential_projector do_walk.f90:3803, the
    deterministic_diagonal variant; the heg/generic modes go BEYOND the
    reference, whose rate bound and diagonals are hubbardk-hardwired -
    see WalkConfig.ct_mode).

    Per spawn slot (parent walker b[slot]): starting at the parent det,
    sample jump times from the exponential distribution at total rate
    ``tables.ct_rate`` (first jump time wrapped mod tau - the
    conditioning factor 1-exp(-tau*rate) is already in the child weight)
    and chain proposal moves until the measurement time tau.  Each
    segment of length dt at det i contributes exp(dt*(E_T - H_ii +
    rate)) (the +rate cancels the sampling density); each jump to det j
    proposed with probability p(j|i) contributes -H_ij/(rate * p(j|i))
    (thinning identity: exact in expectation for ANY rate > 0 and any
    proposal whose support covers the connected space - the rate and
    proposal only shape the variance).  hubbardk mode: uniform
    (e_up, e_dn, r) moves with s by momentum conservation, where
    |H_ij| = U/N uniformly so the factor reduces to -sign(H_ij).
    Invalid proposals (occupied target, outside-cutoff momentum,
    symmetry-zero element) zero the chain - variance, never bias.

    Returns (up [S,W], dn [S,W], f [S] f64 chain factor, ok [S] bool).
    """
    S = b.shape[0]
    norb = cfg.norb
    nup, ndn = cfg.nup, cfg.ndn
    rate = tables.ct_rate
    cu = state.up[b]
    cd = state.dn[b]
    f = jnp.where(slot_valid, 1.0, 0.0)
    t = jnp.zeros(S)
    done = ~slot_valid
    sl = jnp.arange(S)

    def in_window(x, a_pos, b_pos):
        lo_ = jnp.minimum(a_pos, b_pos)
        hi_ = jnp.maximum(a_pos, b_pos)
        return ((x >= lo_) & (x < hi_)).astype(jnp.int32)

    for i in range(cfg.ct_max_jumps):
        k_i = jax.random.fold_in(key, i)
        u6 = jax.random.uniform(k_i, (6, S))
        t_inc = -jnp.log(jnp.maximum(u6[0], TINY)) / rate
        if i == 0:
            t_inc = jnp.mod(t_inc, tau)   # conditioned on >=1 jump
        t_new = t + t_inc
        cross = t_new > tau

        bits_cu = dets.to_bits(cu, norb)
        bits_cd = dets.to_bits(cd, norb)
        diag_cur = slater.diag_elements(tables.table, bits_cu, bits_cd)
        seg = jnp.where(cross, tau - t, t_inc)
        seg_f = jnp.exp(seg * (e_trial - diag_cur + rate))

        if cfg.ct_mode == "hubbardk":
            # uniform jump: occupied up electron, occupied dn electron,
            # unoccupied-up target r; s = k_p + k_q - k_r (umklapp
            # folded); all |H_ij| = U/N = rate/n_slots so the thinning
            # factor is -sign(H_ij)
            occ_u = dets.occ_orbitals(bits_cu, nup)
            occ_d = dets.occ_orbitals(bits_cd, ndn)
            unocc_u = dets.occ_orbitals(1 - bits_cu, norb - nup)
            p = occ_u[sl, jnp.minimum((u6[1] * nup).astype(jnp.int32),
                                      nup - 1)]
            q = occ_d[sl, jnp.minimum((u6[2] * ndn).astype(jnp.int32),
                                      ndn - 1)]
            r = unocc_u[sl, jnp.minimum(
                (u6[3] * (norb - nup)).astype(jnp.int32), norb - nup - 1)]
            s = tables.kmap3[(p * norb + q) * norb + r]
            s_occ = dets.get_orb(cd, s)
            cu_cnt = dets.count_below(cu, p, r) - in_window(p, p, r)
            cd_cnt = dets.count_below(cd, q, s) - in_window(q, q, s)
            gamma = jnp.where((cu_cnt + cd_cnt) % 2 == 0, 1.0, -1.0)
            jump_f = jnp.where(s_occ, 0.0, -gamma)
            nxt_up = dets.set_orb(dets.clear_orb(cu, p), r)
            nxt_dn = dets.set_orb(dets.clear_orb(cd, q), s)
        else:
            jump_f, nxt_up, nxt_dn = _ct_jump_move(
                cfg, tables, cu, cd, bits_cu, bits_cd, u6, sl)

        act = ~done
        dead = jump_f == 0.0
        f = jnp.where(act, f * seg_f * jnp.where(cross, 1.0, jump_f), f)
        jumped = act & ~cross & ~dead
        cu = jnp.where(jumped[:, None], nxt_up, cu)
        cd = jnp.where(jumped[:, None], nxt_dn, cd)
        t = jnp.where(act, t_new, t)
        done = done | (act & (cross | dead))

    # chains still running after ct_max_jumps are zeroed (negligible:
    # P(>K jumps) ~ Pois(tau*rate) tail; see WalkConfig.ct_max_jumps)
    f = jnp.where(done, f, 0.0)
    ok = slot_valid & (f != 0.0)
    return cu, cd, f, ok


def _ct_jump_move(cfg, tables, cu, cd, bits_cu, bits_cd, u6, sl):
    """One proposed CT jump for the heg/generic modes (see _ct_chain).

    Proposal: with probability Ps (generic + has_singles only,
    Ps = n_s/(n_s + n_d) over the uniform cell counts) a single
    excitation (electron uniform over ne, target orbital uniform over
    norb); otherwise a double: ORDERED electron pair (e1 uniform over
    ne, e2 uniform over the rest), target r for e1's spin uniform over
    norb, and s for e2's spin from momentum conservation (heg:
    tables.kmap3, -1 = outside cutoff) or uniform over norb (generic).
    p(j|i) counts all orderings that reach j: same-spin doubles 4 ways
    ((e1,e2) swap x (r,s) swap; heg momentum: the r-draw picks either
    target), mixed doubles 2 ways, singles 1.  The returned factor is
    -H_ij/(rate * p(j|i)) with the EXACT signed element, or 0 for
    invalid/forbidden proposals (occupied target, r==s same-spin,
    outside-cutoff momentum, symmetry-zero element) - such chains die
    unbiasedly.
    """
    norb = cfg.norb
    nup, ndn = cfg.nup, cfg.ndn
    ne = nup + ndn
    rate = tables.ct_rate
    heg_mode = cfg.ct_mode == "heg"

    occ_u = dets.occ_orbitals(bits_cu, nup)            # [S, nup]
    occ_d = dets.occ_orbitals(bits_cd, ndn)            # [S, ndn]

    # ---- category (static probability) ----
    n_pairs_ord = ne * (ne - 1)                        # ordered pairs
    if cfg.has_singles and not heg_mode:
        n_s_cells = ne * norb
        n_d_cells = (n_pairs_ord // 2) * norb * norb
        p_single = n_s_cells / (n_s_cells + n_d_cells)
    else:
        p_single = 0.0
    take_single = u6[1] < p_single

    # ---- electron draws (fused list: up 0..nup-1, dn nup..ne-1) ----
    e1 = jnp.minimum((u6[2] * ne).astype(jnp.int32), ne - 1)
    e2r = jnp.minimum((u6[3] * (ne - 1)).astype(jnp.int32), ne - 2)
    e2 = e2r + (e2r >= e1).astype(jnp.int32)
    up1 = e1 < nup
    up2 = e2 < nup
    orb1 = jnp.where(up1, occ_u[sl, jnp.clip(e1, 0, nup - 1)],
                     occ_d[sl, jnp.clip(e1 - nup, 0, ndn - 1)])
    orb2 = jnp.where(up2, occ_u[sl, jnp.clip(e2, 0, nup - 1)],
                     occ_d[sl, jnp.clip(e2 - nup, 0, ndn - 1)])

    r = jnp.minimum((u6[4] * norb).astype(jnp.int32), norb - 1)
    if heg_mode:
        s = tables.kmap3[(orb1 * norb + orb2) * norb + r]
        s_ok = s >= 0
        s_c = jnp.clip(s, 0, norb - 1)
    else:
        s_c = jnp.minimum((u6[5] * norb).astype(jnp.int32), norb - 1)
        s_ok = jnp.ones_like(r, bool)

    same_spin = up1 == up2
    occ_r = jnp.where(up1, dets.get_orb(cu, r), dets.get_orb(cd, r))
    occ_s = jnp.where(up2, dets.get_orb(cu, s_c), dets.get_orb(cd, s_c))
    dbl_ok = s_ok & ~occ_r & ~occ_s & ~(same_spin & (r == s_c))

    # ---- double element (exact, signed) ----
    pl, ph = jnp.minimum(orb1, orb2), jnp.maximum(orb1, orb2)
    rl, rh = jnp.minimum(r, s_c), jnp.maximum(r, s_c)
    bits_same = jnp.where(up1[:, None], bits_cu, bits_cd)
    h_same = slater.double_same_spin(tables.table, bits_same, pl, ph, rl, rh)
    p_up = jnp.where(up1, orb1, orb2)
    q_dn = jnp.where(up1, orb2, orb1)
    r_up = jnp.where(up1, r, s_c)
    s_dn = jnp.where(up1, s_c, r)
    h_mix = slater.double_opposite_spin(tables.table, bits_cu, bits_cd,
                                        p_up, r_up, q_dn, s_dn)
    h_dbl = jnp.where(same_spin, h_same, h_mix)
    # p(j|i), doubles: ordered-pair prob 1/n_pairs_ord per ordering
    inv_ord = 1.0 / n_pairs_ord
    if heg_mode:
        p_dbl = jnp.where(same_spin, 4.0, 2.0) * inv_ord / norb
    else:
        p_dbl = (1.0 - p_single) * jnp.where(same_spin, 4.0, 2.0) \
            * inv_ord / (norb * norb)
    f_dbl = jnp.where(dbl_ok, -h_dbl / (rate * p_dbl), 0.0)
    du = jnp.where(up1[:, None], dets.set_orb(dets.clear_orb(cu, orb1), r),
                   cu)
    du = jnp.where(up2[:, None], dets.set_orb(dets.clear_orb(du, orb2), s_c),
                   du)
    dd = jnp.where(~up1[:, None], dets.set_orb(dets.clear_orb(cd, orb1), r),
                   cd)
    dd = jnp.where(~up2[:, None], dets.set_orb(dets.clear_orb(dd, orb2), s_c),
                   dd)

    if p_single > 0.0:
        # ---- single element (electron e1 -> r) ----
        sng_ok = ~occ_r
        bits_other = jnp.where(up1[:, None], bits_cd, bits_cu)
        h_sng = slater.single_element(tables.table, bits_same, bits_other,
                                      orb1, r)
        p_sng = p_single / (ne * norb)
        f_sng = jnp.where(sng_ok, -h_sng / (rate * p_sng), 0.0)
        su = jnp.where(up1[:, None],
                       dets.set_orb(dets.clear_orb(cu, orb1), r), cu)
        sd = jnp.where(~up1[:, None],
                       dets.set_orb(dets.clear_orb(cd, orb1), r), cd)
        jump_f = jnp.where(take_single, f_sng, f_dbl)
        nxt_up = jnp.where(take_single[:, None], su, du)
        nxt_dn = jnp.where(take_single[:, None], sd, dd)
    else:
        jump_f, nxt_up, nxt_dn = f_dbl, du, dd
    return jump_f, nxt_up, nxt_dn


def _walk_step_impl(state: WalkState, tables: WalkTables, cfg: WalkConfig):
    """One MC generation (pure function).  Returns (new_state, stats)."""
    M = cfg.mwalk
    CAP = cfg.cap_spawn
    W = cfg.n_words
    norb = cfg.norb
    nup, ndn = cfg.nup, cfg.ndn
    nelec = cfg.nelec
    npairs = cfg.npairs

    key = state.key
    keys = jax.random.split(key, 8)
    new_key = keys[0]
    tau = state.tau
    e_trial = state.e_trial
    # walker-state dtype (cfg.f32_state): weights/diag stored + sorted +
    # scattered in f32; scalar control flow and per-generation estimator
    # reductions stay f64
    wdt = jnp.float32 if cfg.f32_state else jnp.float64

    alive = jnp.arange(M) < state.nwalk
    wt = jnp.where(alive, state.wt, 0.0)
    absw = jnp.abs(wt)

    # ---------------- deterministic projection (exact on D) ---------------
    # find walker slots of the (local-shard) D-space dets; both lists are
    # sorted and D dets are always present in the walker list
    n_imp = tables.imp_up.shape[0]
    if cfg.semistochastic and n_imp > 0:
        if tables.imp_ell_row.shape[0] > 0:
            # D dets are always resident (init seeds them; min_wt rounding
            # exempts imp==0), and both the walker list and the D list are
            # sorted by the same det order (per shard in sharded mode: the
            # owner hash routes identically), so the k-th imp==0 slot IS
            # the k-th D det: ONE compaction replaces the log(M) search
            is_imp = alive & (state.imp == 0)
            rank = prefix.cumsum_i32(is_imp.astype(jnp.int32)) - 1
            # stable-sort compaction instead of an arbitrary scatter
            # (18.1 -> 1.6 ms at [458k] -> [12k], microbench_scatter
            # r4h); bit-identical: D slots in ascending order, -1 beyond
            _, imp_order = jax.lax.sort(
                (jnp.where(is_imp, jnp.uint32(0), jnp.uint32(1)),
                 jnp.arange(M, dtype=jnp.int32)),
                num_keys=1, is_stable=True)
            imp_pos = jnp.where(jnp.arange(n_imp) < rank[-1] + 1,
                                imp_order[:n_imp], -1)
        else:
            imp_pos = _searchsorted_dets(state.up, state.dn, tables.imp_up,
                                         tables.imp_dn)
        w_imp = jnp.where(imp_pos >= 0, wt[jnp.clip(imp_pos, 0, M - 1)], 0.0)
        if cfg.axis_name is not None:
            # columns index the all-gathered global D-weight vector (P4)
            w_vec = jax.lax.all_gather(w_imp, cfg.axis_name).reshape(-1)
        else:
            w_vec = w_imp
        # deltaw = tau * (e_trial * w - H w), H row-complete incl. diagonal
        if tables.imp_dense.shape[0] > 0:
            # dense MXU matvec (f32-state, n_imp <= dense_proj_max): the
            # [n,n] matrix streams at HBM bandwidth - no gather at all.
            # cfg.proj_bf16 stores it bf16 (half the stream; bitwise-
            # identical on the v5e MXU, which rounds f32 operands to
            # bf16 anyway); accumulation stays f32 either way
            Hw_off = jnp.matmul(tables.imp_dense,
                                w_vec.astype(tables.imp_dense.dtype),
                                preferred_element_type=jnp.float32)
            deltaw = tau * ((e_trial - tables.imp_diag) *
                            w_imp.astype(jnp.float64) -
                            Hw_off.astype(jnp.float64))
        elif tables.imp_ell_row.shape[0] > 0:
            # block-ELL: gather + [nb,128] row-sum + tiny segment-sum (a
            # [nnz]-long f64 scatter-add serializes on TPU: 165 ms/step
            # at 1.5M nnz vs ~10 ms for this form).  Difference form
            # (e_trial - diag_i) w_i - Hoff w: both terms are
            # O(E_corr * w), so the f32-state path loses nothing.
            # Sharded: rows are the local shard's D dets, pad blocks carry
            # row id n_imp (dropped by segment_sum), cols index w_vec
            prod = tables.imp_ell_vals * w_vec[tables.imp_ell_cols]
            blk = jnp.sum(prod.reshape(-1, 128), axis=1)
            Hw_off = jax.ops.segment_sum(blk, tables.imp_ell_row,
                                         num_segments=n_imp,
                                         indices_are_sorted=True)
            deltaw = tau * ((e_trial - tables.imp_diag) *
                            w_imp.astype(jnp.float64) -
                            Hw_off.astype(jnp.float64))
        else:
            sorted_rows = cfg.axis_name is None
            Hw = jax.ops.segment_sum(tables.imp_vals * w_vec[tables.imp_cols],
                                     tables.imp_rows, num_segments=n_imp,
                                     indices_are_sorted=sorted_rows)
            deltaw = tau * (e_trial * w_imp - Hw)
        if tables.ct_num_imp.shape[0] > 0:
            # C(T)-in-D mixed estimator (WalkTables.ct_num_imp): this
            # generation's (e_num, e_den) ride the D-weight vector as two
            # dots — evaluated on the INPUT state (the previous
            # generation's merged + reweighted output), i.e. the gather
            # path's sequence shifted by one generation.  Sharded runs
            # dot the local slice; _finalize_step psums with the other
            # control scalars.
            ct_dots = (jnp.dot(tables.ct_num_imp, w_imp.astype(jnp.float64)),
                       jnp.dot(tables.ct_den_imp, w_imp.astype(jnp.float64)))
        else:
            ct_dots = None
    else:
        imp_pos = jnp.zeros(0, jnp.int32)
        ct_dots = None
        deltaw = jnp.zeros(0)

    # ---------------- spawn slot allocation -------------------------------
    # one fused uniform draw for the parent-level + all per-slot streams
    # (one PRNG dispatch instead of five); fast_heatbath adds a stream
    # for the in-row alias slot (the hierarchical pair draw uses up_/ue)
    n_cap_draws = 4 + (cfg.proposal == "fast_heatbath") \
        + (cfg.run_type in ("partial_node", "sr"))
    u_all = jax.random.uniform(keys[1], (M + n_cap_draws * CAP,))
    u_spawn = u_all[:M]
    g = cfg.spawn_granularity
    if cfg.use_exponential_projector:
        # CT mode: children carry the >=1-jump weight fraction
        # w*(1 - exp(-tau*|H_off|)); the no-jump diagonal path is taken
        # deterministically by the parent (exp diag factor below)
        # (ref: stoch_wt, do_walk.f90:3852)
        sw = wt * -jnp.expm1(-tables.ct_rate * tau)
        can_spawn = alive
    else:
        sw = wt
        # every alive walker may draw slots: the proposal normalizations
        # are computed at SLOT level below (1.75x fewer rows than [M] at
        # bench occupancy, and the parent pack shrinks ~10x), and a
        # zero-proposal parent (W2tot+Utot == 0 - physically absent in
        # real systems) yields zero-weight children through the
        # slot-level w2_b/diff guards
        can_spawn = alive
    absw_sp = jnp.abs(sw)
    small = absw_sp < cfg.always_spawn_cutoff * g
    do_spawn_small = u_spawn < absw_sp / (cfg.always_spawn_cutoff * g)
    # i32 throughout: counts are < CAP <= 2^19 and the cumsum already
    # routes through i32, so the old int64 planes only bought emulated
    # 32-bit-pair arithmetic on TPU (values identical, ~1 ms/step)
    nchild = jnp.where(small, jnp.where(do_spawn_small, 1, 0),
                       jnp.maximum(jnp.round(absw_sp / g),
                                   1.0)).astype(jnp.int32)
    nchild = jnp.where(can_spawn, nchild, 0)
    wt_child = jnp.where(small,
                         jnp.sign(sw) * cfg.always_spawn_cutoff * g,
                         sw / jnp.maximum(nchild, 1))

    cum_child = prefix.cumsum_i32(nchild)
    total_spawn = cum_child[-1]
    off_child = cum_child - nchild

    # slot -> parent walker: scatter each walker's index at its first slot
    # and forward-fill with a running max (walkers are ascending, and among
    # walkers sharing an offset only the last has children) - O(CAP)
    # instead of a log(M)-deep batched searchsorted.  (A/B round-3k: the
    # sort-based searchsorted(cum, t, 'right') form costs 7.2 ms vs 4.6 -
    # sorting [M+CAP] loses to a [CAP] scatter+scan here, unlike the det
    # searches below where queries are few and the list is large.)
    t = jnp.arange(CAP, dtype=jnp.int32)
    # off_child is a prefix sum (monotone), so the sorted-indices hint
    # applies: 14.9 -> 5.1 ms standalone at [458k] -> [262k]
    # (microbench_scatter r4h)
    seed_par = jnp.full(CAP, -1, jnp.int32).at[
        jnp.clip(off_child, 0, CAP - 1)].max(
        jnp.arange(M, dtype=jnp.int32), mode="drop",
        indices_are_sorted=True)
    # lax.cummax lowers ~1.4x faster than associative_scan(maximum) on
    # v5e (1.45 vs 2.03 ms at [262k] i32, tools/microbench_scan.py);
    # bitwise-identical result
    parent = jax.lax.cummax(seed_par)
    parent = jnp.clip(parent, 0, M - 1)
    slot_valid = t < total_spawn
    overflow = total_spawn > CAP

    # ---------------- per-slot proposal -----------------------------------
    ub = u_all[M:M + CAP]                       # branch
    up_ = u_all[M + CAP:M + 2 * CAP]            # pair / electron select
    ue = u_all[M + 2 * CAP:M + 3 * CAP]         # entry / orbital select
    # fast_heatbath: in-row alias slot (the pair draw consumed up_/ue)
    ur = u_all[M + 4 * CAP:M + 5 * CAP] \
        if cfg.proposal == "fast_heatbath" else None

    b = parent

    # ONE packed parent-row gather serves every per-slot parent lookup
    # (det words, child weight, flags): K planar gathers cost ~K times
    # one K-plane row gather on TPU, and u64 planar gathers take a 4x
    # emulated path (ops/rowpack.py, tools/microbench_gs.py).  The pack
    # is SLIM - all proposal normalizations are recomputed at slot level
    # from the gathered det words (round-3l: [CAP] < [M] rows, so the
    # one-hot einsum chain and the cumulative rows shrink 1.75x, and the
    # ~80-plane pack that used to carry them shrinks to ~8 planes;
    # recomputation per slot is exact, so slots sharing a parent agree)
    prp = rowpack.RowPack()
    prp.add("up", state.up)
    prp.add("dn", state.dn)
    prp.add("wtc", wt_child)
    prp.add("imp", state.imp)
    prp.add("init", state.init)
    parent_pack = prp.pack()
    prow = rowpack.gather_rows(parent_pack, b)
    up_w = prp.unpack(prow, "up")
    dn_w = prp.unpack(prow, "dn")
    wtc_b = prp.unpack(prow, "wtc")

    # ---- proposal normalizations (slot level) ----
    bits_up_c = dets.to_bits(up_w, norb)
    bits_dn_c = dets.to_bits(dn_w, norb)
    n2 = 2 * norb
    ntri_s = norb * (norb - 1) // 2
    # [CAP, 2n] f32 spin-orbital occupancies: every selection cumulative
    # below runs at ORBITAL level on these (round-4a) - no per-electron
    # one-hots are ever materialized (the old O2 R2 O2^T einsum chain
    # wrote ~900 MB/step of [CAP, ne, 2n] temporaries and lowered as
    # convolutions; see PERF_NOTES round-4).
    # PRECISION NOTE (measured, tools/microbench_rowsum.py): the v5e MXU
    # rounds f32 matmul operands to bf16 at ANY precision setting on
    # this backend.  The SELECTION cumulatives below are therefore
    # quantized; unbiasedness does not rely on them being exact, because
    # each channel's spawn WEIGHT divides by the realized selection
    # cells and multiplies by the exact f32 alias normalization (see the
    # fast_heatbath / singles corrections below) - quantization reshapes
    # the proposal distribution, never the estimate.
    bits2 = jnp.concatenate([bits_up_c, bits_dn_c],
                            axis=1).astype(jnp.float32)       # [CAP, 2n]
    iota2 = jnp.arange(n2, dtype=jnp.int32)[None, :]

    def sel_cell(rows, idx):
        # realized quantized cumulative cell at a selected index (the
        # probability the count-based draw actually used)
        prev = jnp.concatenate(
            [jnp.zeros((rows.shape[0], 1), rows.dtype), rows[:, :-1]],
            axis=1)
        return jnp.sum(jnp.where(iota2 == idx[:, None], rows - prev, 0.0),
                       axis=1)

    # singles rowsums at orbital level: occupied spin-orbital o carries
    # weight u_rowsum[orb(o)] (identical distribution to the reference's
    # per-electron draw; the cumulative cell is the realized probability
    # for the singles S/diff correction)
    if cfg.has_singles:
        u2 = jnp.tile(tables.u_rowsum.astype(jnp.float32), 2)
        sing_rows = prefix.cumsum_rows(bits2 * u2[None, :])   # [CAP, 2n]
        utot_b = sing_rows[:, -1].astype(wdt)
    else:
        sing_rows = jnp.zeros((CAP, 1), jnp.float32)
        utot_b = jnp.zeros(CAP)

    R2 = jnp.concatenate([
        jnp.concatenate([tables.hb_rs_dense, tables.hb_ro_dense], axis=1),
        jnp.concatenate([tables.hb_ro_dense.T, tables.hb_rs_dense], axis=1),
    ], axis=0)               # [2n, 2n] symmetric; R_s diagonal is zero

    if cfg.proposal == "fast_heatbath":
        # Hierarchical pair selection (round-4a): first spin-orbital a ~
        # marginal m_a = sum_occ_q R2[a, q] (ONE [CAP,2n] x [2n,2n]
        # matmul - R2[a,a]=0 kills the self term), then b | a ~ R2[a, b]
        # over occupied b from ONE gathered R2 row.  The realized
        # unordered-pair probability is the two-path sum
        #   p{a,b} = (cell_mu(a) cell_row_a(b)/S_a
        #           + cell_mu(b) cell_row_b(a)/S_b) / M
        # with every factor a realized quantized cumulative cell, so the
        # exact-unbiasedness correction generalizes verbatim.  p{a,b} ~=
        # 2 R2[a,b]/M: the heat-bath constant-spawn-magnitude property
        # is preserved.  (Ref: the pair step of
        # off_diagonal_move_chem_efficient_heatbath, chemistry.f90:5086.)
        mu = jnp.einsum("mo,oq->mq", bits2, R2)               # [CAP, 2n]
        mu_rows = prefix.cumsum_rows(mu * bits2)
        m_tot = mu_rows[:, -1]
        # every (i,j) ordered pair of distinct occupied spin-orbitals is
        # counted once in m_tot, so the unordered total is half of it
        w2_b = (0.5 * m_tot).astype(wdt)
    else:
        # parity proposals (uniform / cauchy_schwarz): per-electron-pair
        # weights via the one-hot einsum (these paths are reference
        # cross-checks, not the production sampler)
        occ_up_c = dets.occ_orbitals(bits_up_c, nup)
        occ_dn_c = dets.occ_orbitals(bits_dn_c, ndn)
        iu, ju = np.triu_indices(nup, k=1)
        idn, jdn = np.triu_indices(ndn, k=1)
        io, jo = np.meshgrid(np.arange(nup), np.arange(ndn), indexing="ij")
        p_pair = jnp.concatenate([occ_up_c[:, iu], occ_dn_c[:, idn],
                                  occ_up_c[:, io.ravel()]], axis=1)
        q_pair = jnp.concatenate([occ_up_c[:, ju], occ_dn_c[:, jdn],
                                  occ_dn_c[:, jo.ravel()]], axis=1)
        n_uu = len(iu)
        n_dd = len(idn)
        occ2 = jnp.concatenate([occ_up_c, occ_dn_c + norb], axis=1)
        O2 = jax.nn.one_hot(occ2, 2 * norb, dtype=jnp.float32)
        G2 = jnp.einsum("mio,oq->miq", O2, R2)                # [S,ne,2n]
        P2 = jnp.einsum("miq,mjq->mij", G2, O2)               # [S,ne,ne]
        flat_pairs = np.concatenate(
            [iu * nelec + ju, (nup + idn) * nelec + (nup + jdn),
             io.ravel() * nelec + (nup + jo.ravel())]).astype(np.int32)
        pr_rowsum = P2.reshape(CAP, nelec * nelec)[:, flat_pairs].astype(wdt)
        if cfg.proposal == "uniform":
            pr_weight = jnp.where(pr_rowsum > 0, 1.0, 0.0)
        else:  # cauchy_schwarz
            pr_weight = tables.cs_rowsum[p_pair] * tables.cs_rowsum[q_pair]
        pair_rows = prefix.cumsum_rows(pr_weight.astype(jnp.float32))
        w2_b = pair_rows[:, -1].astype(wdt)                   # [CAP]
    psing_b = jnp.where(utot_b + w2_b > 0, utot_b / (utot_b + w2_b), 0.0)

    if cfg.has_singles:
        take_single = ub < psing_b
    else:
        take_single = jnp.zeros(CAP, bool)

    # ---- doubles path ----
    if cfg.proposal == "fast_heatbath":
        # first spin-orbital a ~ marginal cumulative (count entries <=
        # target: one contiguous row compare, no bisection)
        targ1 = (up_ * m_tot).astype(jnp.float32)
        o1 = jnp.minimum(
            jnp.sum(mu_rows <= targ1[:, None], axis=1).astype(jnp.int32),
            n2 - 1)
        row1 = R2[o1] * bits2              # exact f32 row gather, masked
        r1_rows = prefix.cumsum_rows(row1)
        s1q = r1_rows[:, -1]
        targ2 = (ue * s1q).astype(jnp.float32)
        o2 = jnp.minimum(
            jnp.sum(r1_rows <= targ2[:, None], axis=1).astype(jnp.int32),
            n2 - 1)
        # mirror path (b first, then a | b): its realized cells come from
        # the same mu cumulative and the gathered row of b
        row2 = R2[o2] * bits2
        r2_rows = prefix.cumsum_rows(row2)
        s2q = r2_rows[:, -1]
        cell_mu1 = sel_cell(mu_rows, o1)
        cell_mu2 = sel_cell(mu_rows, o2)
        cell_12 = sel_cell(r1_rows, o2)    # p(b | a) numerator
        cell_21 = sel_cell(r2_rows, o1)    # p(a | b) numerator
        p_pair_q = (cell_mu1 * cell_12 / jnp.maximum(s1q, TINY)
                    + cell_mu2 * cell_21 / jnp.maximum(s2q, TINY)) \
            / jnp.maximum(m_tot, TINY)
        pair_fail = (o1 == o2) | (m_tot <= 0) | (s1q <= 0) | (s2q <= 0) \
            | (p_pair_q <= 0)
        up1 = o1 < norb
        up2 = o2 < norb
        orb1 = jnp.where(up1, o1, o1 - norb)
        orb2 = jnp.where(up2, o2, o2 - norb)
        same_up_k = up1 & up2
        kk = jnp.where(same_up_k, 0, jnp.where((~up1) & (~up2), 1, 2))
        # opposite-spin pairs: pp = the UP orbital, qq = the DN orbital
        # (the hb table's (r,s) orientation convention); same-spin pairs
        # are canonicalized pp < qq
        pp = jnp.where(kk == 2, jnp.where(up1, orb1, orb2),
                       jnp.minimum(orb1, orb2))
        qq = jnp.where(kk == 2, jnp.where(up1, orb2, orb1),
                       jnp.maximum(orb1, orb2))
    else:
        # pair ~ row weights: count cumulative entries <= target
        targ = (up_ * w2_b).astype(jnp.float32)
        pair_i = jnp.minimum(
            jnp.sum(pair_rows <= targ[:, None], axis=1).astype(jnp.int32),
            npairs - 1)
        pq_sel = jnp.take_along_axis(
            p_pair.astype(jnp.uint32) | (q_pair.astype(jnp.uint32) << 8),
            pair_i[:, None], axis=1)[:, 0]
        pp = (pq_sel & jnp.uint32(0xFF)).astype(jnp.int32)
        qq = ((pq_sel >> 8) & jnp.uint32(0xFF)).astype(jnp.int32)
        # pair kind is a function of the pair INDEX alone (uu block, then
        # dd, then opposite-spin) - pure arithmetic, no [M, npairs] table
        kk = jnp.where(pair_i < n_uu, 0,
                       jnp.where(pair_i < n_uu + n_dd, 1, 2))
        same_up_k = kk == 0
    opp = kk == 2
    # per-slot row descriptors: the row id is recomputed elementwise from
    # the selected orbitals (no [M, npairs] row-id materialization), then
    # planar [CAP] gathers (never a [CAP, k]-wide padded gather)
    a_s = jnp.minimum(pp, qq)
    b_s = jnp.maximum(pp, qq)
    rc_slot = jnp.where(opp, ntri_s + tri_le(a_s, b_s), tri_lt(a_s, b_s))
    row_scr = tables.hb_row_scr[rc_slot]          # [CAP, 3] packed u32
    st = jax.lax.bitcast_convert_type(row_scr[:, 0], jnp.int32)
    ct = jax.lax.bitcast_convert_type(row_scr[:, 1], jnp.int32)
    S_exact = jax.lax.bitcast_convert_type(row_scr[:, 2], jnp.float32)

    ua2 = u_all[M + 3 * CAP:M + 4 * CAP]
    extra_fail = jnp.zeros(CAP, bool)
    p_rs = jnp.ones(CAP)          # in-row proposal probability (non-hb)
    val_tab = jnp.zeros(CAP)
    if cfg.proposal == "fast_heatbath":
        # O(1) in-row target draw ~ |H| via per-row alias tables (ref:
        # setup_alias/sample_alias, more_tools.f90:5603,5665): uniform
        # slot, then accept-or-alias as ONE packed row gather + select
        # (the entry carries its own AND its partner's target value -
        # see WalkTables.hb_alias_pack).
        n_cat = tables.hb_alias_pack.shape[0]
        slot = jnp.minimum((ur * ct).astype(jnp.int32),
                           jnp.maximum(ct - 1, 0))
        i0 = jnp.clip(st + slot, 0, n_cat - 1)
        e3 = tables.hb_alias_pack[i0]             # [CAP, 3] packed u32
        rv = jnp.where(
            ua2.astype(jnp.float32) <
            jax.lax.bitcast_convert_type(e3[:, 0], jnp.float32),
            jax.lax.bitcast_convert_type(e3[:, 1], jnp.float32),
            jax.lax.bitcast_convert_type(e3[:, 2], jnp.float32))
        rs = jnp.abs(rv).astype(jnp.int32) - 1
        val_tab = rv.astype(jnp.float64)   # sign carrier only
        r_tab = rs // norb
        s_tab = rs % norb
        sw = opp & (pp > qq)
        r = jnp.where(sw, s_tab, r_tab)
        s = jnp.where(sw, r_tab, s_tab)
    else:
        if cfg.proposal == "uniform":
            # r, s uniform over orbitals (ref off_diagonal_move_chem:4237)
            r = jnp.minimum((ue * norb).astype(jnp.int32), norb - 1)
            s = jnp.minimum((ua2 * norb).astype(jnp.int32), norb - 1)
            p_rs = jnp.where(opp, 1.0 / norb ** 2, 2.0 / norb ** 2)
            extra_fail = (~opp) & (r == s)
        else:  # cauchy_schwarz: r ~ c_p, s ~ c_q, c_p(r)=sqrt|(pr|pr)|
            kr1, kr2 = jax.random.split(keys[7])
            u3 = jax.random.uniform(kr1, (CAP,))
            u4 = jax.random.uniform(kr2, (CAP,))
            slot_r = jnp.minimum((ue * norb).astype(jnp.int32), norb - 1)
            r = jnp.where(u3 < tables.cs_aliasq[pp, slot_r], slot_r,
                          tables.cs_aliasJ[pp, slot_r])
            slot_s = jnp.minimum((ua2 * norb).astype(jnp.int32), norb - 1)
            s = jnp.where(u4 < tables.cs_aliasq[qq, slot_s], slot_s,
                          tables.cs_aliasJ[qq, slot_s])
            cp = jnp.maximum(tables.cs_rowsum[pp], TINY)
            cq = jnp.maximum(tables.cs_rowsum[qq], TINY)
            p_dir = tables.cs_c[pp, r] * tables.cs_c[qq, s] / (cp * cq)
            p_swp = tables.cs_c[pp, s] * tables.cs_c[qq, r] / (cp * cq)
            p_rs = jnp.where(opp, p_dir, p_dir + p_swp)
            extra_fail = ((~opp) & (r == s)) | (p_rs <= 0)
        # same-spin pairs are unordered: canonicalize r<s (both orderings
        # produce the same determinant; p_rs above sums both)
        r2 = jnp.where(opp, r, jnp.minimum(r, s))
        s2 = jnp.where(opp, s, jnp.maximum(r, s))
        r, s = r2, s2

    r_occ = jnp.where(opp | (kk == 0), dets.get_orb(up_w, r),
                      dets.get_orb(dn_w, r))
    s_occ = jnp.where(opp, dets.get_orb(dn_w, s),
                      jnp.where(kk == 0, dets.get_orb(up_w, s),
                                dets.get_orb(dn_w, s)))
    dbl_ok = ~(r_occ | s_occ)

    # fermion sign: occupied-count windows by mask-table AND + popcount
    # (no per-det prefix tables, no 2-D gathers; ref permutation factors
    # tools.f90:1294,1342)
    def in_window(x, a_pos, b_pos):
        lo_ = jnp.minimum(a_pos, b_pos)
        hi_ = jnp.maximum(a_pos, b_pos)
        return ((x >= lo_) & (x < hi_)).astype(jnp.int32)

    words_same = jnp.where(same_up_k[:, None], up_w, dn_w)
    wc_same = dets.count_below(words_same, pp, r)
    wc_same2 = dets.count_below(words_same, qq, s)
    c1 = wc_same - in_window(pp, pp, r) - in_window(qq, pp, r)
    c2 = wc_same2 - in_window(pp, qq, s) - in_window(qq, qq, s)
    gamma_same = jnp.where((c1 + c2) % 2 == 0, 1.0, -1.0)
    cu_ = dets.count_below(up_w, pp, r) - in_window(pp, pp, r)
    cd_ = dets.count_below(dn_w, qq, s) - in_window(qq, qq, s)
    gamma_opp = jnp.where((cu_ + cd_) % 2 == 0, 1.0, -1.0)
    if cfg.proposal != "fast_heatbath":
        # exact element from integrals: same-spin (pr|qs)-(ps|qr),
        # opposite-spin (pr|qs)
        tb = tables.table
        e_dir = tb.eri_value(pp, r, qq, s)
        e_exc = tb.eri_value(pp, s, qq, r)
        val_tab = jnp.where(opp, e_dir, e_dir - e_exc)
    gamma_fac = jnp.where(opp, gamma_opp, gamma_same)
    h_signed_dbl = gamma_fac * val_tab

    if cfg.proposal == "fast_heatbath":
        # p(spawn) = (1-p_single) * p{pair} * |H|/S_exact: the in-row
        # alias draw is normalized by the EXACT f32 rowsum S_exact =
        # hb_rowsum[row], while p{pair} is the realized two-path
        # hierarchical probability built from the (possibly
        # MXU-quantized, see the PRECISION NOTE above) cumulative cells
        # the draw actually used.  Dividing by exactly that probability
        # makes E[spawn] = -tau*H*w independent of matmul rounding (the
        # round-3i exact-unbiasedness construction, generalized to the
        # hierarchical pair draw; pinned by
        # test_walk_quantized_selection_unbiased).  p{pair} ~= 2|R2|/M,
        # so accepted doubles keep near-constant magnitude ~tau*W2tot.
        S_sel = S_exact.astype(wdt)   # rides the hb_row_scr gather above
        w_dbl = jnp.where(
            pair_fail, 0.0,
            -tau * jnp.sign(h_signed_dbl) * S_sel /
            jnp.maximum((1.0 - psing_b) * p_pair_q.astype(wdt), TINY))
    else:
        prw_sel = jnp.take_along_axis(pr_weight,
                                      pair_i[:, None], axis=1)[:, 0]
        p_sel = prw_sel / jnp.maximum(w2_b, TINY) * p_rs * \
            jnp.maximum(1.0 - psing_b, TINY)
        w_dbl = jnp.where(extra_fail | (p_sel <= 0), 0.0,
                          -tau * h_signed_dbl / jnp.maximum(p_sel, TINY))

    dbl_up = jnp.where(opp[:, None],
                       dets.set_orb(dets.clear_orb(up_w, pp), r),
                       jnp.where(same_up_k[:, None],
                                 dets.set_orb(dets.set_orb(dets.clear_orb(dets.clear_orb(up_w, pp), qq), r), s),
                                 up_w))
    dbl_dn = jnp.where(opp[:, None],
                       dets.set_orb(dets.clear_orb(dn_w, qq), s),
                       jnp.where(same_up_k[:, None], dn_w,
                                 dets.set_orb(dets.set_orb(dets.clear_orb(dets.clear_orb(dn_w, pp), qq), r), s)))

    # ---- singles path (chem) ----
    def singles_at(uw, dw, utot_sl, ps_sl, sing_sl,
                   bits_u_sl, bits_d_sl, slots_ue, slots_ua2, slots_up_):
        """Single-excitation proposals for a batch of slots, on the
        slot-level det words / normalizations.  The moved spin-orbital
        is drawn at ORBITAL level from the [S, 2n] occupancy-masked
        u_rowsum cumulative (same distribution as the reference's
        per-electron draw - the index IS the orbital, no occ lookup).
        Returns (up, dn, wt_factor, ok)."""
        utot_b = utot_sl
        ps_b = ps_sl
        sing_rows = sing_sl                                   # [S, 2n]
        targ_s = (slots_up_ * utot_b).astype(jnp.float32)
        o_s = jnp.minimum(
            jnp.sum(sing_rows <= targ_s[:, None], axis=1).astype(jnp.int32),
            2 * norb - 1)
        e_up = o_s < norb
        p_s = jnp.where(e_up, o_s, o_s - norb)
        # target orbital ~ U[p_s, :] via per-row alias (ue: slot, ua2:
        # accept - ua2 is reused from the doubles branch; each slot takes
        # exactly one branch so the streams never interact)
        slot_r = jnp.minimum((slots_ue * norb).astype(jnp.int32), norb - 1)
        qJ_s = tables.u_alias_qJ[p_s * norb + slot_r]   # [S, 2] packed u32
        r_s = jnp.where(
            slots_ua2.astype(jnp.float32) <
            jax.lax.bitcast_convert_type(qJ_s[:, 0], jnp.float32),
            slot_r, jax.lax.bitcast_convert_type(qJ_s[:, 1], jnp.int32))
        r_s_occ = jnp.where(e_up, dets.get_orb(uw, r_s),
                            dets.get_orb(dw, r_s))
        # exact single element; sign by mask-window popcount on the
        # packed words (bits strictly between p and r; p itself is
        # occupied).  Bit planes come in from the slot-level arrays.
        bits_same_sl = jnp.where(e_up[:, None], bits_u_sl, bits_d_sl)
        bits_other_sl = jnp.where(e_up[:, None], bits_d_sl, bits_u_sl)
        words_same_s = jnp.where(e_up[:, None], uw, dw)
        n_btw = dets.count_below(words_same_s, p_s, r_s) - \
            (p_s < r_s).astype(jnp.int32)
        sgn_s = jnp.where(n_btw % 2 == 0, 1.0, -1.0)
        if tables.sng_pack.shape[0] > 1:
            # f32-state fast path: (pr|qq), (pq|qr), h_pr and U[p,r] all
            # ride ONE packed f32 row gather (see WalkTables.sng_pack)
            srow = tables.sng_pack[p_s * norb + r_s]
            direct_row = srow[:, :norb]
            exch_row = srow[:, norb:2 * norb]
            h_pr = srow[:, 2 * norb]
            u_sel = srow[:, 2 * norb + 1]
            qs = jnp.arange(norb, dtype=jnp.int32)
            mask_pr = (qs[None, :] != p_s[:, None]) & \
                (qs[None, :] != r_s[:, None])
            same_m = bits_same_sl.astype(jnp.float32) * mask_pr
            other_f = bits_other_sl.astype(jnp.float32)
            h_sng = sgn_s * (
                h_pr
                + jnp.sum((direct_row - exch_row) * same_m, axis=-1)
                + jnp.sum(direct_row * other_f, axis=-1))
        else:
            h_sng = sgn_s * slater.single_element_no_sign(
                tables.table, bits_same_sl, bits_other_sl, p_s, r_s)
            u_sel = tables.u_table[p_s, r_s]
        p_sel_sng = ps_b * u_sel / jnp.maximum(utot_b, TINY)
        w_s = -tau * h_sng / jnp.maximum(p_sel_sng, TINY)
        # exact-unbiasedness correction (see the fast_heatbath analog):
        # realized p(spin-orbital) = diff/Utot from the MXU-quantized
        # cumulative, while the alias target draw is normalized by the
        # exact row sum u_rowsum[p] - multiply by u_rowsum[p]/diff
        S_sng = tables.u_rowsum[p_s].astype(w_s.dtype)
        row_prev_s = jnp.concatenate(
            [jnp.zeros((sing_rows.shape[0], 1), sing_rows.dtype),
             sing_rows[:, :-1]], axis=1)
        hit_s = jnp.arange(sing_rows.shape[1],
                           dtype=jnp.int32)[None, :] == o_s[:, None]
        diff_sng = jnp.sum(jnp.where(hit_s, sing_rows - row_prev_s, 0.0),
                           axis=1).astype(w_s.dtype)
        w_s = w_s * jnp.where(diff_sng > 0, S_sng / diff_sng, 1.0)
        moved_up = dets.set_orb(dets.clear_orb(uw, p_s), r_s)
        moved_dn = dets.set_orb(dets.clear_orb(dw, p_s), r_s)
        s_up = jnp.where(e_up[:, None], moved_up, uw)
        s_dn = jnp.where(e_up[:, None], dw, moved_dn)
        s_ok = (~r_s_occ) & (u_sel > 0)
        return s_up, s_dn, w_s, s_ok

    CAPS = cfg.cap_single
    if cfg.has_singles and CAPS and CAPS < CAP:
        # COMPACT the singles channel: only ~p_single of the VALID slots
        # take the branch, but every [CAP]-shaped op here pays full price
        # - route the taking slots through a cap_single-sized buffer
        # (overflow joins the capacity-escalation path)
        sng_take = take_single & slot_valid
        spos = prefix.cumsum_i32(sng_take.astype(jnp.int32)) - 1
        overflow_s = (spos[-1] + 1) > CAPS
        sdest = jnp.where(sng_take, spos, CAPS)
        idx_s = jnp.full(CAPS, CAP, jnp.int32).at[sdest].set(
            jnp.arange(CAP, dtype=jnp.int32), mode="drop")
        live_s = idx_s < CAP
        ic = jnp.clip(idx_s, 0, CAP - 1)
        c_up, c_dn, c_wt, c_ok = singles_at(
            up_w[ic], dn_w[ic], utot_b[ic], psing_b[ic], sing_rows[ic],
            bits_up_c[ic], bits_dn_c[ic], ue[ic], ua2[ic], up_[ic])
        c_ok = c_ok & live_s
        # scatter back by the UNCLIPPED source index (dead rows hold CAP
        # and are dropped - a clipped index would clobber slot CAP-1)
        sng_up = jnp.full((CAP, W), jnp.uint64(SENTINEL)).at[idx_s].set(
            jnp.where(c_ok[:, None], c_up, jnp.uint64(SENTINEL)),
            mode="drop")
        sng_dn = jnp.full((CAP, W), jnp.uint64(SENTINEL)).at[idx_s].set(
            jnp.where(c_ok[:, None], c_dn, jnp.uint64(SENTINEL)),
            mode="drop")
        w_sng = jnp.zeros(CAP).at[idx_s].set(jnp.where(c_ok, c_wt, 0.0),
                                             mode="drop")
        sng_ok = jnp.zeros(CAP, bool).at[idx_s].set(c_ok, mode="drop")
        sng_ok = sng_ok & take_single
    elif cfg.has_singles:
        sng_up, sng_dn, w_sng, sng_ok = singles_at(
            up_w, dn_w, utot_b, psing_b, sing_rows,
            bits_up_c, bits_dn_c, ue, ua2, up_)
        overflow_s = jnp.asarray(False)
    else:
        sng_up = dbl_up
        sng_dn = dbl_dn
        w_sng = jnp.zeros(CAP)
        sng_ok = jnp.zeros(CAP, bool)
        overflow_s = jnp.asarray(False)
    overflow = overflow | overflow_s

    # combine branches
    if cfg.use_exponential_projector:
        spawn_up, spawn_dn, ct_f, spawn_ok = _ct_chain(
            cfg, tables, state, b, slot_valid, keys[7], tau, e_trial)
        spawn_wt = ct_f * wtc_b
    else:
        spawn_up = jnp.where(take_single[:, None], sng_up, dbl_up)
        spawn_dn = jnp.where(take_single[:, None], sng_dn, dbl_dn)
        spawn_ok = jnp.where(take_single, sng_ok, dbl_ok) & slot_valid
        spawn_wt = jnp.where(take_single, w_sng, w_dbl) * wtc_b
    spawn_wt = jnp.where(spawn_ok, spawn_wt, 0.0)

    # ---------------- time-reversal symmetrized basis -----------------------
    if cfg.time_sym:
        # map det-basis targets to ts representatives (same rules as
        # connect._time_sym_postprocess; ref chemistry.f90:6957-6992):
        # kill self-symmetric targets for z<0 and targets equal to the
        # parent's time-reverse (a ts-diagonal move, carried exactly by
        # the diagonal cross term below); apply sqrt2 norms; swap
        # non-representative orientations with h *= z
        from ..systems.chem.slater import SQRT2, SQRT2INV
        sym_par = jnp.all(up_w == dn_w, axis=1)
        sym_cand = jnp.all(spawn_up == spawn_dn, axis=1)
        kill_ts = jnp.all(spawn_up == dn_w, axis=1) & \
            jnp.all(spawn_dn == up_w, axis=1) & ~sym_par
        if cfg.z < 0:
            kill_ts = kill_ts | sym_cand
        fac = jnp.where(sym_par & ~sym_cand, SQRT2INV, 1.0) * \
            jnp.where(sym_cand & ~sym_par, SQRT2, 1.0)
        swap_ts, _ = _lex_less_eq(spawn_dn, spawn_up, spawn_up, spawn_dn)
        fac = jnp.where(swap_ts, cfg.z * fac, fac)
        new_su = jnp.where(swap_ts[:, None], spawn_dn, spawn_up)
        spawn_dn = jnp.where(swap_ts[:, None], spawn_up, spawn_dn)
        spawn_up = new_su
        spawn_ok = spawn_ok & ~kill_ts
        spawn_wt = jnp.where(spawn_ok, spawn_wt * fac, 0.0)

    # ---------------- importance sampling + run_type sign rules ------------
    if cfg.guiding != "none":
        # spawn weight x psi_g(target)/psi_g(parent) (ref det_ratio_*);
        # both evaluated at slot level on the gathered det words
        from .guiding import eval_guiding
        psi_g_t = eval_guiding(tables.guide, cfg.guiding, spawn_up,
                               spawn_dn, norb, nup, ndn)
        gp = eval_guiding(tables.guide, cfg.guiding, up_w, dn_w,
                          norb, nup, ndn)
        ratio = psi_g_t / jnp.where(jnp.abs(gp) < TINY, TINY, gp)
        spawn_wt = spawn_wt * ratio

    # child flags (ref: do_walk.f90:3700-3730)
    par_imp = prp.unpack(prow, "imp")
    child_imp = jnp.where(par_imp == -2, 2,
                          jnp.minimum(par_imp, 125) + 1)
    child_imp = jnp.where(cfg.semistochastic & (par_imp == 0), -1, child_imp)
    child_init = jnp.where(prp.unpack(prow, "init") >= 2, 1,
                           0).astype(jnp.int32)

    if cfg.run_type not in ("none", "no_fixed_node"):
        # sign-violating flow: spawn sign opposite the parent's (ref move
        # variants do_walk.f90:3460-4748; densewalk._projector_parts holds
        # the matrix form of the same rules)
        viol = spawn_ok & (spawn_wt * jnp.sign(wtc_b) < 0)
        if cfg.run_type == "fixed_node2":
            spawn_wt = jnp.where(viol, -spawn_wt, spawn_wt)
        elif cfg.run_type == "fixed_node3":
            spawn_ok = spawn_ok & ~viol
            spawn_wt = jnp.where(viol, 0.0, spawn_wt)
        else:
            if cfg.run_type in ("partial_node", "sr"):
                u5 = u_all[M + (n_cap_draws - 1) * CAP:]
                redirect = viol & (u5 < cfg.partial_node_eps)
            elif cfg.run_type == "release_node":
                redirect = viol & (state.step < cfg.release_step)
            else:  # fixed_node1 / fixed_node4
                redirect = viol
            # REDIRECT to the parent det: an unbiased estimate of the
            # fixed-node diagonal dump sum_viol Ht_ij.  imp is forced to
            # max distance so a redirected D-parent dump is NOT discarded
            # by the stochastic D->D rule (the exact D-projection carries
            # only the D-internal part of the dump).
            spawn_up = jnp.where(redirect[:, None], up_w, spawn_up)
            spawn_dn = jnp.where(redirect[:, None], dn_w, spawn_dn)
            child_imp = jnp.where(redirect, 126, child_imp)

    spawn_up = jnp.where(spawn_ok[:, None], spawn_up, jnp.uint64(SENTINEL))
    spawn_dn = jnp.where(spawn_ok[:, None], spawn_dn, jnp.uint64(SENTINEL))
    spawn_wt = spawn_wt.astype(wdt)   # storage dtype (f64 math above)
    child_imp = jnp.where(spawn_ok, child_imp, 10 ** 6)
    child_init = jnp.where(spawn_ok, child_init, 0)

    # ---------------- owner routing over the mesh (P2) ---------------------
    # n_dev==1: every det is owner-local, so routing is the identity -
    # skip its sort/scatter/all_to_all entirely (the n_dev=1 sharded
    # program then matches the unsharded one; measured ~70 ms/step of
    # pure routing cost at CAP=2^18 on v5e)
    if cfg.axis_name is not None and cfg.n_dev > 1:
        from ..parallel.dist import det_owner_jnp, route_spawns

        owner = det_owner_jnp(spawn_up, spawn_dn, cfg.n_dev)
        routed, spawn_ok, route_ovf = route_spawns(
            cfg.axis_name, cfg.n_dev, owner, spawn_ok,
            dict(up=spawn_up, dn=spawn_dn, wt=spawn_wt, imp=child_imp,
                 init=child_init))
        spawn_up = jnp.where(spawn_ok[:, None], routed["up"], jnp.uint64(SENTINEL))
        spawn_dn = jnp.where(spawn_ok[:, None], routed["dn"], jnp.uint64(SENTINEL))
        spawn_wt = jnp.where(spawn_ok, routed["wt"], 0.0)
        child_imp = jnp.where(spawn_ok, routed["imp"], 10 ** 6)
        child_init = jnp.where(spawn_ok, routed["init"], 0)
        overflow = overflow | route_ovf

    # ---------------- diagonal move + projection on parents ----------------
    # resident walkers always carry diag + ct (filled at init and for
    # fresh dets at merge time); the cond-guarded fill only fires for
    # states built without tables or resumed from old checkpoints
    ct_free = tables.ct_num_imp.shape[0] > 0
    need = alive & (state.diag > DIAG_UNKNOWN_THRESHOLD)
    if not ct_free:
        need = need | (alive & (state.ct == -2))
    diag, ct_state, fill_ovf = jax.lax.cond(
        jnp.any(need),
        lambda a: _fill_fresh(cfg, tables, state.up, state.dn,
                              a[0], a[1], need, with_ct=not ct_free),
        lambda a: (a[0], a[1], jnp.asarray(False)),
        (state.diag, state.ct))
    overflow = overflow | fill_ovf
    if cfg.use_exponential_projector:
        # exact diagonal propagation (deterministic_diagonal variant,
        # ref do_walk.f90:3851); no clamp needed - exp is positive
        diag_factor = jnp.exp(tau * (e_trial - diag))
    else:
        diag_factor = 1.0 + tau * (e_trial - diag)
        diag_factor = jnp.maximum(diag_factor, 0.0)   # clamp (ref :3788)
    wt_par = jnp.where(alive & (state.imp >= 1),
                       wt * diag_factor, wt).astype(wdt)
    # exact projection on D-space walkers
    if cfg.semistochastic and n_imp > 0:
        safe_pos = jnp.clip(imp_pos, 0, M - 1)
        wt_par = wt_par.at[safe_pos].add(
            jnp.where(imp_pos >= 0, deltaw, 0.0).astype(wdt))

    # ---------------- merge (annihilation) --------------------------------
    if not cfg.full_sort_merge:
        out = _two_level_merge(state, cfg, tables, keys, alive, wt_par,
                               diag, ct_state, spawn_up, spawn_dn,
                               spawn_wt, spawn_ok, child_imp, child_init,
                               overflow)
        (out_up, out_dn, out_wt, out_init, out_imp, out_diag, out_ct,
         nwalk_new, overflow) = out
        return _finalize_step(state, tables, cfg, out_up, out_dn, out_wt,
                              out_init, out_imp, out_diag, nwalk_new,
                              overflow, total_spawn, spawn_wt, spawn_ok,
                              new_key, tau, e_trial, key_comb=keys[6],
                              out_ct=out_ct, ct_dots=ct_dots)

    out = _full_sort_merge(state, cfg, tables, keys[5], alive, wt_par, diag,
                           ct_state, spawn_up, spawn_dn, spawn_wt, spawn_ok,
                           child_imp, child_init, overflow)
    (out_up, out_dn, out_wt, out_init, out_imp, out_diag, out_ct,
     nwalk_new, overflow) = out
    return _finalize_step(state, tables, cfg, out_up, out_dn, out_wt,
                          out_init, out_imp, out_diag, nwalk_new, overflow,
                          total_spawn, spawn_wt, spawn_ok, new_key, tau,
                          e_trial, key_comb=keys[6], out_ct=out_ct,
                          ct_dots=ct_dots)


def sequential_initiator_scan(neq, s_wt, init_row, wdt):
    """The reference's ACTUAL order-dependent pairwise initiator combine
    (merge_original_with_spawned2 do_walk.f90:5897-5950): walk each merge
    group in sort order carrying (running weight, initiator); same-sign
    pair -> max initiator, opposite-sign pair -> the initiator of the
    sign-winning walker (exact cancellation -> 0), except a permanent
    initiator (code 3, do_walk.f90:5938-5946 ``initiator.ne.3`` guards)
    is never demoted.  Non-associative, so it cannot ride the fused
    segmented scan; an O(N) lax.scan serializes the merge — measurement
    mode only (WalkConfig.initiator_rule "sequential"; A/B vs the
    order-independent group-max default in tools/ab_initiator_rule.py).

    neq: [N] bool group-start flags (sorted row i starts a new det group);
    s_wt: [N] wdt signed row weights; init_row: [N] i32 per-row initiator
    flags.  Returns the [N] running-initiator scan; a group's merged
    initiator is its value at the group's END row.
    """
    def _seq(carry, x):
        acc_w, acc_i = carry
        st, w, ini = x
        aw, ar = jnp.abs(acc_w), jnp.abs(w)
        opp = jnp.where(ar > aw, ini, jnp.where(ar == aw, 0, acc_i))
        opp = jnp.where(acc_i == 3, acc_i, opp)
        new_i = jnp.where(acc_w * w > 0, jnp.maximum(acc_i, ini), opp)
        new_w = acc_w + w
        new_i = jnp.where(st, ini, new_i)
        new_w = jnp.where(st, w, new_w)
        return (new_w, new_i), new_i

    _, seq_init = jax.lax.scan(
        _seq, (jnp.zeros((), wdt), jnp.zeros((), jnp.int32)),
        (neq, s_wt, init_row.astype(jnp.int32)))
    return seq_init


def _full_sort_merge(state, cfg, tables, key_red, alive, wt_par, diag,
                     ct_state, spawn_up, spawn_dn, spawn_wt, spawn_ok,
                     child_imp, child_init, overflow):
    """Annihilation by one slim variadic sort (ref:
    merge_original_with_spawned2/3, do_walk.f90:5866,6087).

    Three ideas keep the sort cheap:
      * entries carry only (key words, weight, packed flags, diag, ct) -
        up/dn are recovered FROM the key, validity is derived from
        key != sentinel, and the diagonal/C(T) caches ride the sort as
        payloads (resident rows carry them; only FRESH determinants go
        through the compacted _fill_fresh evaluation afterwards);
      * valid spawns are optionally compacted into cap_compact slots first
        (the dead 25-45% of cap_spawn never enters the sort);
      * ALL group reductions (weight sum, initiator max, diag min, ct
        max, and a priority min whose encoding D=0 < C(T)=1 <
        transient-D-spawn=2 < distance d=d+1 < invalid yields membership,
        the merged imp code, and group validity at once) ride ONE fused
        segmented scan (ops/segscan.py) and are read at each group's END
        row, from which the output scatters go directly - no segment_*
        scatters, no group->row gathers (ref merge rules
        do_walk.f90:5898-5960, check_initiator:6838).
    """
    M = cfg.mwalk
    CAP = cfg.cap_spawn
    W = cfg.n_words
    norb = cfg.norb
    CAPC = cfg.cap_compact_eff
    wdt = wt_par.dtype
    fused32 = (W == 1 and norb <= 32)
    nk = 1 if fused32 else 2 * W

    def pack_flags(imp, init, valid):
        code = jnp.clip(imp, -2, 129).astype(jnp.int32) + 2
        code = jnp.where(valid, code, 131)
        return (code << 2) | jnp.where(valid, init, 0)

    flags_w = pack_flags(state.imp, state.init, alive)
    flags_s = pack_flags(child_imp, child_init, spawn_ok)

    # key words, most significant first, up-major (the order every sorted
    # walker structure in the framework uses)
    SENT = jnp.uint64(SENTINEL)
    if fused32:
        wkeys = [jnp.where(alive, (state.up[:, 0] << jnp.uint64(32)) |
                           state.dn[:, 0], SENT)]
        skeys = [jnp.where(spawn_ok, (spawn_up[:, 0] << jnp.uint64(32)) |
                           spawn_dn[:, 0], SENT)]
    else:
        wkeys = ([jnp.where(alive, state.up[:, w], SENT)
                  for w in range(W - 1, -1, -1)] +
                 [jnp.where(alive, state.dn[:, w], SENT)
                  for w in range(W - 1, -1, -1)])
        skeys = ([jnp.where(spawn_ok, spawn_up[:, w], SENT)
                  for w in range(W - 1, -1, -1)] +
                 [jnp.where(spawn_ok, spawn_dn[:, w], SENT)
                  for w in range(W - 1, -1, -1)])

    s_wt_in = jnp.where(spawn_ok, spawn_wt, 0.0)
    if CAPC < CAP:
        cpos = prefix.cumsum_i32(spawn_ok.astype(jnp.int32)) - 1
        overflow = overflow | (cpos[-1] + 1 > CAPC)
        sdest = jnp.where(spawn_ok, cpos, CAPC)
        skeys = [jnp.full(CAPC, SENT).at[sdest].set(k, mode="drop")
                 for k in skeys]
        s_wt_in = jnp.zeros(CAPC, wdt).at[sdest].set(s_wt_in, mode="drop")
        flags_s = jnp.full(CAPC, 131 << 2, jnp.int32).at[sdest].set(
            flags_s, mode="drop")
    CS = flags_s.shape[0]           # CAPC or CAP

    N = M + CS
    all_keys = tuple(jnp.concatenate([a, b]) for a, b in zip(wkeys, skeys))
    all_wt = jnp.concatenate([wt_par, s_wt_in])
    all_flags = jnp.concatenate([flags_w, flags_s])
    # diag/ct caches ride the sort: resident rows carry their values,
    # spawn rows are unknown (DIAG_UNKNOWN / -2) and resolved per GROUP below
    all_diag = jnp.concatenate([diag, jnp.full(CS, DIAG_UNKNOWN, wdt)])
    # C(T)-in-D estimator active (WalkTables.ct_num_imp): the per-walker
    # C(T) index is dead — drop its sort operand, segscan value, and
    # rowpack plane entirely
    ct_free = tables.ct_num_imp.shape[0] > 0
    if ct_free:
        vals_in = (all_wt, all_flags, all_diag)
    else:
        all_ct = jnp.concatenate([jnp.where(alive, ct_state, -1),
                                  jnp.full(CS, -2, jnp.int32)])
        vals_in = (all_wt, all_flags, all_diag, all_ct)

    sorted_ = jax.lax.sort((*all_keys, *vals_in), num_keys=nk)
    s_keys = sorted_[:nk]
    s_wt = sorted_[nk]
    s_flags = sorted_[nk + 1]
    s_diag = sorted_[nk + 2]
    s_ct = None if ct_free else sorted_[nk + 3]

    neq_t = s_keys[0][1:] != s_keys[0][:-1]
    for k in s_keys[1:]:
        neq_t = neq_t | (k[1:] != k[:-1])
    neq = jnp.ones(N, bool).at[1:].set(neq_t)
    is_end = segscan.seg_ends(neq)

    code = s_flags >> 2
    init_row = s_flags & 3
    # priority value per row: 0=D resident, 1=C(T), 2=transient D-spawn
    # (distance 1), d+1 for distance-d rows, 130=invalid
    u = jnp.where(code == 2, 0,
                  jnp.where(code == 0, 1,
                            jnp.where(code == 1, 2, code - 1)))
    # ALL group reductions ride one fused segmented scan (segment_* ops
    # lower to serialized HBM scatters, ~7 ms each at these shapes —
    # PERF_NOTES); each group's values are read at its END row, so the
    # group->row gathers and the group-space scatter destinations of the
    # old formulation disappear.  The decision weight and the output
    # weight are now the SAME wdt-exact segment sum (the old split f32
    # decision / f64 scatter-add is gone; only the summation ORDER of a
    # group differs from sequential: a tree reduction).
    dwt_in = jnp.where(code == 1, s_wt, jnp.zeros((), wdt))
    if ct_free:
        sc_u, sc_init, sc_wt, sc_dwt, sc_diag = segscan.seg_scan(
            (u, init_row, s_wt, dwt_in, s_diag),
            ("min", "max", "sum", "sum", "min"), neq)
        sc_ct = None
    else:
        sc_u, sc_init, sc_wt, sc_dwt, sc_diag, sc_ct = segscan.seg_scan(
            (u, init_row, s_wt, dwt_in, s_diag, s_ct),
            ("min", "max", "sum", "sum", "min", "max"), neq)
    g_u = sc_u
    # discard stochastic D->D spawns (ref merge rule :5947): their
    # partial sum is subtracted at the end row of every in-D group
    g_wt = jnp.where(sc_u == 0, sc_wt - sc_dwt, sc_wt)
    g_init = sc_init
    if cfg.initiator_rule == "sequential":
        g_init = sequential_initiator_scan(neq, s_wt, init_row, wdt)
    # group diag/ct: rows of one group are the same det, so any resident
    # row's value wins; all-spawn groups stay unknown (DIAG_UNKNOWN / -2)
    # and are evaluated in the compacted fresh pass below
    g_diag = sc_diag
    g_ct = sc_ct

    g_valid = is_end & (g_u <= 127)
    g_imp = jnp.where(g_u == 0, 0,
                      jnp.where(g_u == 1, -2, g_u - 1)).astype(jnp.int32)

    g_init = _initiator_update(cfg, g_wt, g_init, g_imp)
    keep = g_valid & ~(((g_wt == 0.0) | (g_init == 0)) & (g_imp >= 1))
    # stochastic min_wt rounding (ref reduce_my_walker:7196); the rounded
    # replacement is applied post-compaction on the exact row sums
    u_rnd = jax.random.uniform(key_red, (N,))
    tiny = keep & (g_imp >= 1) & (jnp.abs(g_wt) < cfg.min_wt)
    kill = tiny & (u_rnd >= jnp.abs(g_wt) / cfg.min_wt)
    rounded = tiny & ~kill
    keep = keep & ~kill

    # ---------------- compact to [M] ---------------------------------------
    # inverse compaction: ONE planar i32 scatter builds output-slot ->
    # sorted-row, then ONE packed row gather moves every output field
    # (keys, weight, flags, diag, ct) at once.  A wide scatter is 17x a
    # planar one on v5e and even per-field planar scatters pay per row;
    # the packed row gather pays once (tools/microbench_gs.py: the old
    # multi-scatter formulation was ~31 ms/step at these shapes, this
    # form ~5 ms).  plane0 packs (rounded | init<<1 | (imp+2)<<3; imp in
    # [-2,126], template 127 == "far from D", equivalent to the old 10^6
    # under pack_flags' clip).
    pos = prefix.cumsum_i32(keep.astype(jnp.int32)) - 1
    nwalk_new = (pos[-1] + 1).astype(jnp.int32)
    overflow = overflow | (nwalk_new > M)
    plane0 = (rounded.astype(jnp.uint32) |
              (g_init.astype(jnp.uint32) << 1) |
              ((g_imp + 2).astype(jnp.uint32) << 3))
    rp = rowpack.RowPack()
    for i, k in enumerate(s_keys):
        rp.add(f"k{i}", k)
    rp.add("wt", g_wt)
    rp.add("p0", plane0)
    if not ct_free:
        rp.add("ct", g_ct)
    rp.add("diag", g_diag)
    # stable-sort compaction instead of the arbitrary inverse scatter
    # (microbench_scatter r4h: the [720k] 1-key sort costs 1.9 ms while
    # the scatter form serializes); src entries beyond nwalk_new differ
    # from the scatter form (arbitrary non-kept rows vs 0) but every such
    # output row is overwritten by the template below — bit-identical
    # final state
    _, src_order = jax.lax.sort(
        (jnp.where(keep, jnp.uint32(0), jnp.uint32(1)),
         jnp.arange(N, dtype=jnp.int32)), num_keys=1, is_stable=True)
    src = src_order[:M]
    rows = rowpack.gather_rows(rp.pack(), src)
    defaults = {**{f"k{i}": SENT for i in range(len(s_keys))},
                "wt": 0.0, "p0": (127 + 2) << 3, "diag": DIAG_UNKNOWN}
    if not ct_free:
        defaults["ct"] = -1
    tmpl = rp.defaults_row(defaults)
    valid_out = jnp.arange(M, dtype=jnp.int32) < nwalk_new
    rows = jnp.where(valid_out[:, None], rows, tmpl[None, :])

    out_keys = [rp.unpack(rows, f"k{i}") for i in range(len(s_keys))]
    out_wt_raw = rp.unpack(rows, "wt")
    p0 = rp.unpack(rows, "p0")
    out_rnd = (p0 & 1) != 0
    out_init = ((p0 >> 1) & 3).astype(jnp.int32)
    out_imp = ((p0 >> 3) & 255).astype(jnp.int32) - 2
    out_ct = state.ct if ct_free else rp.unpack(rows, "ct")
    out_diag = rp.unpack(rows, "diag")

    out_wt = jnp.where(out_rnd, jnp.sign(out_wt_raw) * cfg.min_wt,
                       out_wt_raw)

    if fused32:
        k = out_keys[0]
        sent = k == SENT
        out_up = jnp.where(sent, SENT, k >> jnp.uint64(32))[:, None]
        out_dn = jnp.where(sent, SENT,
                           k & jnp.uint64(0xFFFFFFFF))[:, None]
    else:
        out_up = jnp.stack([out_keys[W - 1 - w] for w in range(W)], axis=1)
        out_dn = jnp.stack([out_keys[2 * W - 1 - w] for w in range(W)],
                           axis=1)

    # diag/ct caches: group values land directly in the output (no
    # [M]-into-[M] re-attach bisection); FRESH groups (all-spawn, so
    # diag==DIAG_UNKNOWN / ct==-2) are evaluated through the compacted
    # buffer.  ct_free: only the diagonal needs filling, and freshness is
    # read off the diag sentinel (set/repaired together with ct)
    fresh = (out_diag > DIAG_UNKNOWN_THRESHOLD) if ct_free \
        else (out_ct == -2)
    out_diag, out_ct, fresh_ovf = _fill_fresh(cfg, tables, out_up, out_dn,
                                              out_diag, out_ct, fresh,
                                              with_ct=not ct_free)
    overflow = overflow | fresh_ovf

    return (out_up, out_dn, out_wt, out_init, out_imp, out_diag, out_ct,
            nwalk_new, overflow)


def _initiator_update(cfg, wt, init, imp):
    """Initiator promote/demote + keep rule + the per-code threshold
    (ref check_initiator:6838), shared by both merge strategies."""
    thr = cfg.r_initiator * jnp.maximum(
        0, imp - cfg.initiator_min_distance).astype(jnp.float64) \
        ** cfg.initiator_power
    aw = jnp.abs(wt)
    demote = (init == 2) & (((aw <= thr) & (imp > 0)) |
                            ((aw <= cfg.r_initiator) & (imp == -2)))
    promote = (init < 2) & (((aw > thr) & (imp >= 0)) |
                            ((aw > cfg.r_initiator) & (imp == -2)))
    init = jnp.where(demote, 1, jnp.where(promote, init + 1, init))
    if cfg.c_t_initiator:
        init = jnp.where(imp == -2, 3, init)
    return init


def _min_wt_round(cfg, key, wt, keep, imp):
    """Stochastic min_wt rounding (ref reduce_my_walker:7196)."""
    u = jax.random.uniform(key, wt.shape)
    tiny = keep & (imp >= 1) & (jnp.abs(wt) < cfg.min_wt)
    kill = tiny & (u >= jnp.abs(wt) / cfg.min_wt)
    wt = jnp.where(tiny & ~kill, jnp.sign(wt) * cfg.min_wt, wt)
    return wt, keep & ~kill


def _two_level_merge(state, cfg, tables, keys, alive, wt_par, diag,
                     ct_state, spawn_up, spawn_dn, spawn_wt, spawn_ok,
                     child_imp, child_init, overflow):
    """Annihilation without the big sort (ref shape:
    merge_original_with_spawned2/3, do_walk.f90:5866,6087):

      level 1: spawns whose det already EXISTS in the (sorted) walker
               list merge in place by scatter-add/-max/-min;
      level 2: the remaining (few) new-det spawns are compacted, sorted,
               group-combined among themselves;
      level 3: surviving walkers and surviving new groups interleave into
               the output by rank (two lower-bound searches), keeping the
               list sorted without ever sorting [M + CAP] elements.
    """
    M = cfg.mwalk
    W = cfg.n_words
    NEW = cfg.cap_new_eff
    norb = cfg.norb
    wdt = wt_par.dtype
    k_round_w, k_round_n = jax.random.split(keys[5])

    # ---- level 1: hits on existing walkers --------------------------------
    hit = _searchsorted_dets(state.up, state.dn, spawn_up, spawn_dn, norb)
    found = spawn_ok & (hit >= 0)
    hit_c = jnp.clip(hit, 0, M - 1)
    # discard stochastic D->D spawns (ref merge rule :5947); D dets are
    # always resident, so an absent target cannot be in D
    dropDD = found & (child_imp == -1) & (state.imp[hit_c] == 0)
    mw_wt = wt_par.at[hit_c].add(jnp.where(found & ~dropDD, spawn_wt, 0.0))
    in_init = jnp.zeros(M, jnp.int32).at[hit_c].max(
        jnp.where(found, child_init, 0))
    imp_eff_child = jnp.abs(jnp.where(child_imp == -1, 1, child_imp))
    in_imp = jnp.full(M, 10 ** 6, jnp.int32).at[hit_c].min(
        jnp.where(found, imp_eff_child, 10 ** 6))
    mw_init = jnp.where(alive, jnp.maximum(state.init, in_init), 0)
    mw_imp = jnp.where(state.imp >= 1, jnp.minimum(state.imp, in_imp),
                       state.imp)
    mw_imp = jnp.where(alive, mw_imp, 10 ** 6)

    mw_init = _initiator_update(cfg, mw_wt, mw_init, mw_imp)
    keep_w = alive & ~(((mw_wt == 0.0) | (mw_init == 0)) & (mw_imp >= 1))
    mw_wt, keep_w = _min_wt_round(cfg, k_round_w, mw_wt, keep_w, mw_imp)

    # ---- level 2: new-det spawns ------------------------------------------
    nf = spawn_ok & (hit < 0)
    posn = prefix.cumsum_i32(nf.astype(jnp.int32)) - 1
    n_nf = jnp.sum(nf).astype(jnp.int32)
    overflow = overflow | (n_nf > NEW)     # conservative: slots, pre-dedup
    destn = jnp.where(nf, posn, NEW)
    nu_up = jnp.full((NEW, W), jnp.uint64(SENTINEL)).at[destn].set(
        spawn_up, mode="drop")
    nu_dn = jnp.full((NEW, W), jnp.uint64(SENTINEL)).at[destn].set(
        spawn_dn, mode="drop")
    nu_wt = jnp.zeros(NEW, wdt).at[destn].set(
        jnp.where(nf, spawn_wt, 0.0), mode="drop")
    nu_init = jnp.zeros(NEW, jnp.int32).at[destn].set(
        jnp.where(nf, child_init, 0), mode="drop")
    nu_imp = jnp.full(NEW, 10 ** 6, jnp.int32).at[destn].set(
        jnp.where(nf, imp_eff_child, 10 ** 6), mode="drop")

    if cfg.n_words == 1 and norb <= 32:
        fusedk = (nu_up[:, 0] << jnp.uint64(32)) | nu_dn[:, 0]
        (_, u0, d0, s_nwt, s_ninit, s_nimp) = jax.lax.sort(
            (fusedk, nu_up[:, 0], nu_dn[:, 0], nu_wt, nu_init, nu_imp),
            num_keys=1)
        s_nup = u0[:, None]
        s_ndn = d0[:, None]
    else:
        order = _lexsort_walkers(nu_up, nu_dn, norb)
        s_nup = nu_up[order]
        s_ndn = nu_dn[order]
        s_nwt = nu_wt[order]
        s_ninit = nu_init[order]
        s_nimp = nu_imp[order]

    neq = jnp.ones(NEW, bool)
    neq = neq.at[1:].set(jnp.any(s_nup[1:] != s_nup[:-1], axis=1) |
                         jnp.any(s_ndn[1:] != s_ndn[:-1], axis=1))
    gid = prefix.cumsum_i32(neq.astype(jnp.int32)) - 1
    valid_n = jnp.all(s_nup != jnp.uint64(SENTINEL), axis=1)
    gn_wt = jax.ops.segment_sum(jnp.where(valid_n, s_nwt, 0.0), gid,
                                num_segments=NEW)
    gn_init = jax.ops.segment_max(jnp.where(valid_n, s_ninit, 0), gid,
                                  num_segments=NEW)
    gn_imp = jax.ops.segment_min(jnp.where(valid_n, s_nimp, 10 ** 6), gid,
                                 num_segments=NEW)
    gn_valid = jax.ops.segment_max(valid_n.astype(jnp.int32), gid,
                                   num_segments=NEW) > 0
    gn_init = _initiator_update(cfg, gn_wt, gn_init, gn_imp)
    keep_g = gn_valid & ~((gn_wt == 0.0) | (gn_init == 0))
    gn_wt, keep_g = _min_wt_round(cfg, k_round_n, gn_wt, keep_g, gn_imp)

    # per-position flags/fields (group values at FIRST rows)
    keep_n = neq & keep_g[jnp.clip(gid, 0, NEW - 1)]
    n_wt_pos = gn_wt[gid]
    n_init_pos = gn_init[gid]
    n_imp_pos = gn_imp[gid]

    # ---- level 3: rank merge of two sorted survivor lists -----------------
    kw_i = prefix.cumsum_i32(keep_w.astype(jnp.int32))
    kn_i = prefix.cumsum_i32(keep_n.astype(jnp.int32))
    excl_n = jnp.concatenate([jnp.zeros(1, jnp.int32), kn_i])
    excl_w = jnp.concatenate([jnp.zeros(1, jnp.int32), kw_i])

    lo_w = _lower_bound_dets(s_nup, s_ndn, state.up, state.dn, norb)
    pos_w = (kw_i - 1) + excl_n[jnp.clip(lo_w, 0, NEW)]
    dest_w = jnp.where(keep_w, pos_w, M)

    lo_n = _lower_bound_dets(state.up, state.dn, s_nup, s_ndn, norb)
    pos_n = (kn_i - 1) + excl_w[jnp.clip(lo_n, 0, M)]
    dest_n = jnp.where(keep_n, pos_n, M)

    nwalk_new = (kw_i[-1] + kn_i[-1]).astype(jnp.int32)
    overflow = overflow | (nwalk_new > M)

    out_up = jnp.full((M, W), jnp.uint64(SENTINEL)).at[dest_w].set(
        state.up, mode="drop").at[dest_n].set(s_nup, mode="drop")
    out_dn = jnp.full((M, W), jnp.uint64(SENTINEL)).at[dest_w].set(
        state.dn, mode="drop").at[dest_n].set(s_ndn, mode="drop")
    out_wt = jnp.zeros(M, wdt).at[dest_w].set(mw_wt, mode="drop").at[
        dest_n].set(n_wt_pos, mode="drop")
    out_init = jnp.zeros(M, jnp.int32).at[dest_w].set(
        mw_init, mode="drop").at[dest_n].set(n_init_pos, mode="drop")
    out_imp = jnp.full(M, 10 ** 6, jnp.int32).at[dest_w].set(
        mw_imp, mode="drop").at[dest_n].set(n_imp_pos, mode="drop")
    # diag/ct caches ride the rank merge: survivors keep theirs, new
    # groups are evaluated through the compacted fresh buffer
    out_diag = jnp.full(M, DIAG_UNKNOWN, wdt).at[
        dest_w].set(diag, mode="drop").at[
        dest_n].set(jnp.full(NEW, DIAG_UNKNOWN, wdt), mode="drop")
    if tables.ct_num_imp.shape[0] > 0:
        # C(T)-in-D estimator active: the index plane is dead (see
        # _full_sort_merge) — freshness reads the diag sentinel
        out_ct = state.ct
        fresh = out_diag > DIAG_UNKNOWN_THRESHOLD
        with_ct = False
    else:
        out_ct = jnp.full(M, -1, jnp.int32).at[dest_w].set(
            jnp.where(alive, ct_state, -1), mode="drop").at[
            dest_n].set(jnp.full(NEW, -2, jnp.int32), mode="drop")
        fresh = out_ct == -2
        with_ct = True
    out_diag, out_ct, fresh_ovf = _fill_fresh(cfg, tables, out_up, out_dn,
                                              out_diag, out_ct, fresh,
                                              with_ct=with_ct)
    overflow = overflow | fresh_ovf

    return (out_up, out_dn, out_wt, out_init, out_imp, out_diag, out_ct,
            nwalk_new, overflow)


def _finalize_step(state, tables, cfg, out_up, out_dn, out_wt, out_init,
                   out_imp, out_diag, nwalk_new, overflow, total_spawn,
                   spawn_wt, spawn_ok, new_key, tau, e_trial,
                   key_comb=None, out_ct=None, ct_dots=None):
    # ---------------- stochastic reconfiguration (run_type sr) -------------
    if cfg.run_type == "sr":
        from .densewalk import _comb_reconfigure
        n_comb = cfg.sr_nwalk or int(cfg.w_abs_target)
        out_wt = _comb_reconfigure(out_wt, key_comb, n_comb).astype(
            out_wt.dtype)

    # ---------------- reweight ---------------------------------------------
    out_wt = out_wt * state.reweight_factor_inv.astype(out_wt.dtype)

    # ---------------- estimators -------------------------------------------
    if ct_dots is not None:
        # C(T)-in-D: the dots were computed at the top of the step from
        # the D-weight vector the projection materializes (see
        # WalkTables.ct_num_imp); out_ct is a dead pass-through plane
        e_num_gen, e_den_gen = ct_dots
        if out_ct is None:
            out_ct = state.ct
    else:
        if out_ct is None:
            # two-level-merge path: C(T) positions by search (the
            # full-sort path carries them through the merge instead)
            if tables.ct_hash.shape[0] > 1:
                out_ct = dethash.lookup_det_hash(tables.ct_hash, out_up,
                                                 out_dn, cfg.norb)
            else:
                out_ct = _searchsorted_dets(tables.ct_up, tables.ct_dn,
                                            out_up, out_dn, cfg.norb)
        n_ct = tables.ct_num.shape[0]
        safe_ct = jnp.clip(out_ct, 0, n_ct - 1)
        match = out_ct >= 0
        # (num, den) ride ONE packed row gather (two planar f64 gathers
        # at [M] cost ~4 ms/step on v5e; one 16B-row gather ~1.5 ms)
        ctnd = jnp.take(jnp.stack([tables.ct_num, tables.ct_den], axis=1),
                        safe_ct, axis=0)
        e_num_gen = jnp.sum(jnp.where(match, ctnd[:, 0] * out_wt,
                                      0.0), dtype=jnp.float64)
        e_den_gen = jnp.sum(jnp.where(match, ctnd[:, 1] * out_wt,
                                      0.0), dtype=jnp.float64)
    w_abs_gen = jnp.sum(jnp.abs(out_wt), dtype=jnp.float64)
    nwalk_stat = nwalk_new
    if cfg.axis_name is not None:
        # control scalars are global: every shard sees the same values
        e_num_gen = jax.lax.psum(e_num_gen, cfg.axis_name)
        e_den_gen = jax.lax.psum(e_den_gen, cfg.axis_name)
        w_abs_gen = jax.lax.psum(w_abs_gen, cfg.axis_name)
        nwalk_stat = jax.lax.psum(nwalk_new, cfg.axis_name)
        overflow = jax.lax.psum(overflow.astype(jnp.int32), cfg.axis_name) > 0
        total_spawn = jax.lax.psum(total_spawn, cfg.axis_name)

    e_num_blk = state.e_num_blk + e_num_gen
    e_den_blk = state.e_den_blk + e_den_gen

    # e_est (ref :2880): blkabs-cumulative mixed estimator
    e_est = jnp.where(
        state.e_den_blkabs_cum + jnp.abs(e_den_blk) != 0,
        (state.e_num_blkabs_cum + e_num_blk * jnp.sign(e_den_blk)) /
        (state.e_den_blkabs_cum + jnp.abs(e_den_blk)),
        state.e_est)

    # ---------------- population control -----------------------------------
    # e_trial update only while not equilibrated (ref :2889)
    e_trial_new = jnp.where(
        state.equilibrated, e_trial,
        e_trial + jnp.sign(e_est - e_trial) * jnp.minimum(jnp.abs(e_est - e_trial), 1.0))
    pexp = jnp.minimum(1.0, tau * cfg.pop_ctrl_exponent)
    ratio = (cfg.w_abs_target / jnp.maximum(w_abs_gen, TINY)) ** pexp
    rw_eq = jnp.clip(ratio, 0.5, 2.0)
    rw_main = jnp.clip(ratio / (1.0 + tau * (e_trial_new - e_est)), 0.5, 2.0)
    reweight = jnp.where(state.equilibrated, rw_main, rw_eq)
    reweight = jnp.minimum(reweight, cfg.reweight_factor_inv_max)

    # variable tau during initial growth (ref :2178)
    reached = state.reached_target | (w_abs_gen >= cfg.w_abs_target)
    tau_new = jnp.where(reached, cfg.tau,
                        cfg.tau * (1.0 + jnp.log(jnp.maximum(
                            cfg.w_abs_target / jnp.maximum(w_abs_gen, 1.0), 1.0))))

    new_state = WalkState(
        up=out_up, dn=out_dn, wt=out_wt, init=out_init, imp=out_imp,
        diag=out_diag, ct=out_ct.astype(jnp.int32), nwalk=nwalk_new,
        key=new_key,
        e_trial=e_trial_new, e_est=e_est, tau=tau_new,
        reweight_factor_inv=reweight, reached_target=reached,
        equilibrated=state.equilibrated,
        e_num_blkabs_cum=state.e_num_blkabs_cum,
        e_den_blkabs_cum=state.e_den_blkabs_cum,
        e_num_blk=e_num_blk, e_den_blk=e_den_blk,
        w_abs_gen=w_abs_gen,
        overflow=state.overflow | overflow,
        step=state.step + 1,
    )
    # log2-binned |spawned weight| histogram (ref: gen_hist/add_to_hist,
    # more_tools.f90:5449, filled at do_walk.f90:7603-7636); bin i covers
    # [2^(i-20), 2^(i-19))
    aw_sp = jnp.abs(spawn_wt)
    hbin = jnp.clip(jnp.floor(jnp.log2(jnp.maximum(aw_sp, TINY))) + 20.0,
                    0, N_HIST_BINS - 1).astype(jnp.int32)
    hbin = jnp.where(spawn_ok & (aw_sp > 0), hbin, N_HIST_BINS)
    # one-hot reduction instead of a [CAP] scatter-add (out-of-range rows
    # one_hot to all-zero = drop); counts < 2^24 are exact in f32
    spawn_hist = jnp.sum(jax.nn.one_hot(hbin, N_HIST_BINS,
                                        dtype=jnp.float32),
                         axis=0).astype(jnp.int32)
    if cfg.axis_name is not None:
        spawn_hist = jax.lax.psum(spawn_hist, cfg.axis_name)

    stats = dict(e_num_gen=e_num_gen, e_den_gen=e_den_gen,
                 w_abs_gen=w_abs_gen, nwalk=nwalk_stat,
                 e_gen=e_num_gen / jnp.where(e_den_gen == 0, TINY, e_den_gen),
                 n_spawn=total_spawn,
                 reweight_factor_inv=state.reweight_factor_inv,
                 spawn_hist=spawn_hist)
    return new_state, stats


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def walk_step(state: WalkState, tables: WalkTables, cfg: WalkConfig):
    """One MC generation.  Returns (new_state, stats dict)."""
    return _walk_step_impl(state, tables, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "nstep"))
def walk_block(state: WalkState, tables: WalkTables, cfg: WalkConfig,
               nstep: int):
    """A whole block of generations as one lax.scan: a single device
    dispatch per block, so high-latency links (and kernel-launch overhead)

    No donation: donated outputs get different layouts than freshly
    committed inputs, forcing a second full compile of the same program
    on call 2 (observed ~3 min each through the remote-compile tunnel);
    one state copy per ~100-step block is negligible.
    are amortized across the block.  Returns (state, stacked stats)."""

    def body(st, _):
        st2, stats = _walk_step_impl(st, tables, cfg)
        return st2, stats

    return jax.lax.scan(body, state, None, length=nstep)


def grow_walk_state(state: WalkState, cfg_new: WalkConfig) -> WalkState:
    """Pad a walker state into larger-capacity arrays (mwalk growth;
    ref MWALK auto-size, do_walk.f90:652-674)."""
    M_old = state.up.shape[0]
    M = cfg_new.mwalk
    W = state.up.shape[1]
    if M == M_old:
        return state._replace(overflow=jnp.asarray(False))
    pad = M - M_old
    return state._replace(
        up=jnp.concatenate([state.up,
                            jnp.full((pad, W), jnp.uint64(SENTINEL))]),
        dn=jnp.concatenate([state.dn,
                            jnp.full((pad, W), jnp.uint64(SENTINEL))]),
        wt=jnp.concatenate([state.wt, jnp.zeros(pad, state.wt.dtype)]),
        init=jnp.concatenate([state.init, jnp.zeros(pad, jnp.int32)]),
        imp=jnp.concatenate([state.imp, jnp.full(pad, 10 ** 6, jnp.int32)]),
        diag=jnp.concatenate([state.diag,
                              jnp.full(pad, DIAG_UNKNOWN,
                                       state.diag.dtype)]),
        ct=jnp.concatenate([state.ct, jnp.full(pad, -1, jnp.int32)]),
        overflow=jnp.asarray(False))


def end_of_block(state: WalkState) -> WalkState:
    """Roll the block accumulators into the blkabs cumulants
    (ref: do_walk.f90 block-end bookkeeping)."""
    return state._replace(
        e_num_blkabs_cum=state.e_num_blkabs_cum +
        state.e_num_blk * jnp.sign(state.e_den_blk),
        e_den_blkabs_cum=state.e_den_blkabs_cum + jnp.abs(state.e_den_blk),
        e_num_blk=jnp.asarray(0.0, jnp.float64),
        e_den_blk=jnp.asarray(0.0, jnp.float64))


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class WalkResult:
    e_mixed: float
    e_err: float
    e_blocks: np.ndarray
    w_abs_trace: np.ndarray
    nwalk_trace: np.ndarray
    steps_per_sec: float
    state: WalkState
    spawn_hist: np.ndarray | None = None   # log2 |spawn wt| bins (scan mode)
    t_corr: float = float("nan")           # autocorrelation factor
    reblock_curve: list | None = None      # [(block_size, err), ...]


def run_walk(system, trial, cfg: WalkConfig, nstep: int, nblk: int,
             nblk_eq: int, w_abs_begin: float, e_trial_initial: float,
             seed: int = 0, verbose: bool = True,
             mode: str = "scan", walkalize_file: str | None = None,
             max_eq_extensions: int = 3,
             checkpoint_file: str | None = None,
             resume_state: "WalkState | None" = None,
             guide=None, tables_transform=None,
             pipeline_blocks: bool = False) -> WalkResult:
    """Block/step driver with equilibration (ref: do_walk.f90:2113).

    Energy estimate: ratio of block sums of e_num/e_den with blocking error
    (ref blocking analysis :2952).

    walkalize_file: per-generation trace `step 1/reweight w_abs e_gen
    nwalk` for external blocking tools (ref: do_walk.f90:1675,2930).
    max_eq_extensions: auto-extend equilibration while the population is
    still >10% from target or the energy still drifts by >3 block sigmas
    (ref: equilibration auto-extension, do_walk.f90:2917+).
    pipeline_blocks: scan mode dispatches block k+1 before fetching block
    k's stats (1-block lookahead; trajectory bit-identical - the chain is
    functional and the lookahead stalls at the eq-extension decision
    block).  OFF by default: the A/B at the bench shape measured the
    lookahead NET NEGATIVE through the axon tunnel (34.8 vs 39.8 gen/s
    wall, .cache/scan_r5.jsonl - queueing a second undonated dispatch
    behind the in-flight block slows the remote executor more than the
    hidden round trips save); on a locally-attached chip the lookahead
    may win - it stays available as an option.
    """
    import time

    tables = build_walk_tables(system, trial, guide=guide, cfg=cfg)
    if tables_transform is not None:
        # test hook: perturb device tables after construction (e.g.
        # quantize the dense selection rowsums the way the TPU MXU does,
        # tests/test_walk.py::test_walk_quantized_selection_unbiased)
        tables = tables_transform(tables)
    if resume_state is not None:
        # mid-walk restart (extends the reference's restart artifacts,
        # SURVEY 5.4: "no mid-walk walker checkpoint exists" - here one
        # does; see utils/checkpoint.save_walker_state)
        state = resume_state
    else:
        state = init_walk_state(cfg, trial, w_abs_begin, e_trial_initial,
                                seed, guide=guide, tables=tables)

    e_blocks = []
    w_trace, n_trace = [], []
    num_trace, den_trace = [], []
    t_measured = 0.0
    n_measured = 0
    spawn_hist = np.zeros(N_HIST_BINS, np.int64)
    wf = open(walkalize_file, "w") if walkalize_file else None
    gstep = 0

    eq_extensions = 0
    eq_energies = []
    iblk = 0
    n_eq_planned = nblk_eq
    # equilibration blocks run a LARGE-cap_new program variant (the growth
    # transient creates tens of thousands of new dets per step); once
    # equilibrated, the small-cap_new variant keeps the new-det sort tiny.
    # Both variants share state shapes, so the swap is free at runtime
    # (two cached compiles).
    cfg_growth = dataclasses.replace(cfg, cap_new=cfg.cap_spawn) \
        if not cfg.full_sort_merge else cfg
    if cfg.cap_compact:
        # the growth transient spawns far above the steady-state valid
        # fraction (measured: >196k valid of cap 262k in block 1 vs
        # ~65-75% at stationarity), so equilibration blocks run the
        # UNCOMPACTED program; the compacted variant takes over for
        # measured blocks (same state shapes - swap is free)
        cfg_growth = dataclasses.replace(cfg_growth, cap_compact=0)

    max_capacity_grows = 4
    grows = 0
    # Pipelined scan-mode driver (round 5): dispatch block k+1 BEFORE
    # fetching block k's stats, so the host-side stat pulls / walkalize
    # writes / prints overlap the device's next block (the axon tunnel
    # adds ~0.1-0.3 s of round trips per block - 4-12% of wall at 2.5 s
    # blocks).  end_of_block rolls into the NEXT dispatch as a cheap
    # device op on the unmaterialized output, and the lookahead stalls
    # at the auto-extension decision block (the last planned eq block),
    # so the trajectory is bit-identical to the unpipelined driver.
    t_meas_t0 = None

    def _dispatch_block(i):
        nonlocal state, t_meas_t0
        equil_i = i < n_eq_planned
        chained = end_of_block(state) if i > 0 else state
        if not equil_i:
            chained = chained._replace(equilibrated=jnp.asarray(True))
        cfg_b = cfg_growth if equil_i else cfg
        # snapshot for overflow retry (per-step mode donates the state
        # buffers into walk_step, so it needs a real copy)
        start = chained if mode == "scan" else \
            jax.tree_util.tree_map(jnp.copy, chained)
        if not equil_i and t_meas_t0 is None:
            t_meas_t0 = time.time()
        t0_i = time.time()
        if mode == "scan":
            # whole block in one device dispatch
            out, st_stats = walk_block(chained, tables, cfg_b, nstep)
        else:
            out = chained
            for istep in range(nstep):
                out, st_stats = walk_step(out, tables, cfg_b)
        state = out
        return [i, equil_i, t0_i, start, out, st_stats]

    inflight = None
    while iblk < n_eq_planned + nblk or inflight is not None:
        cur = None
        if iblk < n_eq_planned + nblk and (
                inflight is None
                or (mode == "scan" and pipeline_blocks
                    and inflight[0] != n_eq_planned - 1)):
            cur = _dispatch_block(iblk)
            iblk += 1
        if inflight is None:
            inflight = cur
            continue
        ib, equil, t0, state_blk_start, state_out, stats = inflight
        jax.block_until_ready(state_out.wt)
        if bool(state_out.overflow):
            # capacity escalation (ref MWALK auto-size do_walk.f90:652):
            # double the capacities and RERUN the block from its start
            # state - the overflowing pass dropped walkers, so its output
            # (and any lookahead block chained on it) must not be used
            if grows >= max_capacity_grows:
                raise RuntimeError(
                    "walker/spawn capacity exceeded after "
                    f"{grows} growth retries (mwalk={cfg.mwalk}, "
                    f"cap_spawn={cfg.cap_spawn})")
            grows += 1
            cfg = dataclasses.replace(cfg, mwalk=2 * cfg.mwalk,
                                      cap_spawn=2 * cfg.cap_spawn,
                                      cap_single=2 * cfg.cap_single,
                                      cap_compact=2 * cfg.cap_compact)
            cfg_growth = dataclasses.replace(cfg, cap_new=cfg.cap_spawn) \
                if not cfg.full_sort_merge else cfg
            if cfg.cap_compact:
                cfg_growth = dataclasses.replace(cfg_growth, cap_compact=0)
            if verbose:
                print(f"capacity overflow: growing to mwalk={cfg.mwalk} "
                      f"cap_spawn={cfg.cap_spawn}, rerunning block "
                      f"{ib + 1}", flush=True)
            state = grow_walk_state(state_blk_start, cfg)
            iblk = ib
            inflight = None
            continue
        dt = time.time() - t0
        if mode == "scan":
            blk_num = float(jnp.sum(stats["e_num_gen"]))
            blk_den = float(jnp.sum(stats["e_den_gen"]))
            if not equil:
                num_trace.extend(np.asarray(stats["e_num_gen"]).tolist())
                den_trace.extend(np.asarray(stats["e_den_gen"]).tolist())
            w_trace.extend(np.asarray(stats["w_abs_gen"]).tolist())
            n_trace.extend(np.asarray(stats["nwalk"]).tolist())
            spawn_hist += np.asarray(jnp.sum(stats["spawn_hist"], axis=0),
                                     np.int64)
            if wf is not None:
                rw = np.asarray(stats["reweight_factor_inv"])
                wa = np.asarray(stats["w_abs_gen"])
                eg = np.asarray(stats["e_gen"])
                nw = np.asarray(stats["nwalk"])
                for j in range(len(wa)):
                    wf.write(f"{gstep + j + 1} {1.0 / rw[j]:.9f} "
                             f"{wa[j]:.2f} {eg[j]:.9f} {nw[j]}\n")
            gstep += nstep
        else:
            # per-step mode: the block sums live in the state's on-device
            # accumulators, so the host fetches only a handful of scalars
            # per block (per-step traces are skipped in this mode - every
            # extra fetch is a round trip on high-latency links)
            blk_num = float(state_out.e_num_blk)
            blk_den = float(state_out.e_den_blk)
            w_trace.append(float(state_out.w_abs_gen))
            n_trace.append(int(state_out.nwalk))
        if not equil:
            t_measured += dt
            n_measured += nstep
        e_blk = blk_num / blk_den if blk_den != 0 else np.nan
        if not equil:
            e_blocks.append(e_blk)
        else:
            eq_energies.append(e_blk)
        if verbose:
            print(f"block {ib + 1}{' (eq)' if equil else ''}: "
                  f"e_blk={blk_num / max(abs(blk_den), 1e-300) * np.sign(blk_den) if blk_den else float('nan'):.6f} "
                  f"e_est={float(state_out.e_est):.6f} "
                  f"e_trial={float(state_out.e_trial):.6f} "
                  f"w_abs={float(state_out.w_abs_gen):.1f} "
                  f"nwalk={int(state_out.nwalk)} "
                  f"steps/s={nstep / dt:.1f}", flush=True)
        # dispatch-length guard (code, not doc): the axon tunnel kills
        # single device dispatches past ~2-4 min (PERF_NOTES
        # "dispatch-length limit"); a slow config at this nstep would
        # crash the NEXT block, so warn as soon as one block crosses
        # half the observed kill threshold
        if mode == "scan" and dt > 100.0 and not getattr(
                run_walk, "_warned_dispatch", False):
            run_walk._warned_dispatch = True
            print(f"WARNING: block dispatch took {dt:.0f}s; the TPU "
                  f"tunnel kills ~2-4 min dispatches - reduce nstep "
                  f"(currently {nstep}) for this configuration",
                  file=sys.stderr, flush=True)

        if checkpoint_file is not None:
            from ..utils.checkpoint import save_walker_state
            save_walker_state(checkpoint_file, end_of_block(state_out))

        # equilibration auto-extension (ref: do_walk.f90:2917+): extend
        # while the population is off target, or (with >= 3 block
        # energies, so the spread estimate has at least 1 dof) while the
        # last block drifts > 3 sigma from the earlier mean
        if (equil and ib == n_eq_planned - 1 and
                eq_extensions < max_eq_extensions and len(eq_energies) >= 2):
            pop_off = abs(float(state_out.w_abs_gen) - cfg.w_abs_target) \
                > 0.1 * cfg.w_abs_target
            drift = False
            if len(eq_energies) >= 3:
                prev = np.asarray(eq_energies[:-1], np.float64)
                prev = prev[np.isfinite(prev)]
                if len(prev) >= 2:
                    sig = np.std(prev, ddof=1)
                    if np.isfinite(sig) and sig > 0:
                        drift = abs(eq_energies[-1] - np.mean(prev)) \
                            > 3.0 * sig
            if pop_off or drift:
                n_eq_planned += 1
                eq_extensions += 1
                if verbose:
                    print(f"extending equilibration (pop_off={pop_off}, "
                          f"drift={drift})", flush=True)
        inflight = cur
    state = end_of_block(state)
    # pipelined throughput of record: wall over the measured segment (the
    # boundary stall separates it cleanly from equilibration); per-block
    # dt sums double-count queue time under the 1-block lookahead
    if (pipeline_blocks and mode == "scan" and t_meas_t0 is not None
            and n_measured):
        t_measured = time.time() - t_meas_t0
    if wf is not None:
        wf.close()
    e_blocks = np.asarray(e_blocks)
    e_mean = float(np.mean(e_blocks))
    e_err = float(np.std(e_blocks, ddof=1) / np.sqrt(len(e_blocks))) \
        if len(e_blocks) > 1 else float("nan")
    t_corr = float("nan")
    rb = None
    if len(num_trace) >= 32:
        # per-generation analysis: covariance-corrected ratio error with
        # autocorrelation + Flyvbjerg-Petersen reblocking plateau (ref
        # blocking + t_corr analysis, do_walk.f90:2952-3190); report the
        # most conservative of the three error estimates
        from ..utils.blocking import ratio_stats, reblock
        num = np.asarray(num_trace)
        den = np.asarray(den_trace)
        bs = ratio_stats(num, den)
        e_mean = bs.e_mean
        t_corr = bs.t_corr
        ratio = num / np.where(den == 0, 1e-300, den)
        rb = reblock(ratio)
        err_rb = max((e for s, e in rb if len(ratio) // s >= 8),
                     default=0.0)
        cands = [bs.e_err, err_rb] + \
            ([e_err] if np.isfinite(e_err) else [])
        e_err = float(max(cands))
    return WalkResult(e_mixed=e_mean, e_err=e_err, e_blocks=e_blocks,
                      w_abs_trace=np.asarray(w_trace),
                      nwalk_trace=np.asarray(n_trace),
                      steps_per_sec=n_measured / t_measured if t_measured else 0.0,
                      state=state, spawn_hist=spawn_hist,
                      t_corr=t_corr, reblock_curve=rb)
