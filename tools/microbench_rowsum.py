"""Microbenchmark the per-walker heat-bath rowsum block at bench shapes.

The walk's proposal normalization needs pr_rowsum[m, pair] =
R_spin[p, q] for the ~28 occupied orbital pairs of each walker plus the
singles row sums u_rows[m, i] (walk.py:1049-1085).  Current production
formulation (v0) is five one-hot einsums; the candidates fuse them into
a single spin-block chain (one-hot determinant over 2*norb spin
orbitals, R2 = [[R_s, R_o], [R_o^T, R_s]] with the singles row-sum
vector as an extra column):

  v0: 3x einsum(onehot, R) + 2x einsum(G, onehot) + singles einsum
  v1: G = einsum(onehot2, R2aug); P = einsum(G, onehot2)   (2 einsums)
  v2: G = R2aug[occ2] row gather;  P = einsum(G, onehot2)  (1 einsum)
  v3: G = R2aug[occ2] row gather;  P = take_along_axis(G, occ2)

All variants select exact f32 table entries (one nonzero per one-hot
dot) ONLY at Precision.HIGHEST: at the TPU's DEFAULT matmul precision
the MXU rounds the table entries to bf16, making pr_rowsum inconsistent
with the exact-f32 alias tables (a systematic ~2^-9 per-pair misweight
of every heat-bath double spawn - measured by this script's exactness
check, which is why each variant is timed at both precisions).
Run: python tools/microbench_rowsum.py  (on the axon chip)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 458752
NORB = 26
NUP = 4
NDN = 4

_OVERHEAD = [0.0]


def bench(name, fn, *args, iters=30):
    fetch = jax.jit(lambda o: jnp.ravel(o[0])[:1] + jnp.ravel(o[1])[:1])
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    np.asarray(jax.device_get(fetch(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    np.asarray(jax.device_get(fetch(out)))
    dt = (time.perf_counter() - t0 - _OVERHEAD[0]) / iters
    print(f"{name:60s} {dt * 1e3:8.3f} ms")
    return dt


def calibrate():
    z = (jnp.zeros(8, jnp.float32), jnp.zeros(8, jnp.float32))
    _OVERHEAD[0] = 0.0
    t = bench("null (fetch overhead, subtracted)",
              lambda x: (x[0] + 1.0, x[1]), z, iters=30)
    _OVERHEAD[0] = max(t * 30, 0.0)


iu, ju = np.triu_indices(NUP, k=1)
idn, jdn = np.triu_indices(NDN, k=1)
io, jo = np.meshgrid(np.arange(NUP), np.arange(NDN), indexing="ij")
NE = NUP + NDN
# flat [8,8] indices matching the v0 concat order (uu, dd, od)
FLAT = np.concatenate([iu * NE + ju,
                       (NUP + idn) * NE + (NUP + jdn),
                       io.ravel() * NE + (NUP + jo.ravel())]).astype(np.int32)


PREC = [None]


def _es(expr, *ops):
    return jnp.einsum(expr, *ops, precision=PREC[0])


def v0(occ_up, occ_dn, R_s, R_o, u_row):
    O_up = jax.nn.one_hot(occ_up, NORB, dtype=jnp.float32)
    O_dn = jax.nn.one_hot(occ_dn, NORB, dtype=jnp.float32)
    G_us = _es("mio,oq->miq", O_up, R_s)
    G_ds = _es("mio,oq->miq", O_dn, R_s)
    G_uo = _es("mio,oq->miq", O_up, R_o)
    pr_uu = _es("miq,mjq->mij", G_us, O_up)[:, iu, ju]
    pr_dd = _es("miq,mjq->mij", G_ds, O_dn)[:, idn, jdn]
    pr_od = _es("miq,mjq->mij", G_uo, O_dn).reshape(occ_up.shape[0], -1)
    pr = jnp.concatenate([pr_uu, pr_dd, pr_od], axis=1)
    O_all = jnp.concatenate([O_up, O_dn], axis=1)
    u_rows = _es("mio,o->mi", O_all, u_row)
    return pr, u_rows


def _r2aug(R_s, R_o, u_row):
    top = jnp.concatenate([R_s, R_o], axis=1)
    bot = jnp.concatenate([R_o.T, R_s], axis=1)
    R2 = jnp.concatenate([top, bot], axis=0)                  # [2n, 2n]
    u2 = jnp.concatenate([u_row, u_row])[:, None]             # [2n, 1]
    return jnp.concatenate([R2, u2], axis=1)                  # [2n, 2n+1]


def _extract(P, G):
    m = P.shape[0]
    pr = P.reshape(m, NE * NE)[:, FLAT]
    return pr, G[:, :, -1]


def v1(occ_up, occ_dn, R_s, R_o, u_row):
    A = _r2aug(R_s, R_o, u_row)
    occ2 = jnp.concatenate([occ_up, occ_dn + NORB], axis=1)
    O2 = jax.nn.one_hot(occ2, 2 * NORB, dtype=jnp.float32)
    G = _es("mio,oq->miq", O2, A)
    P = _es("miq,mjq->mij", G[:, :, :2 * NORB], O2)
    return _extract(P, G)


def v2(occ_up, occ_dn, R_s, R_o, u_row):
    A = _r2aug(R_s, R_o, u_row)
    occ2 = jnp.concatenate([occ_up, occ_dn + NORB], axis=1)
    G = jnp.take(A, occ2, axis=0)                             # [M,8,2n+1]
    O2 = jax.nn.one_hot(occ2, 2 * NORB, dtype=jnp.float32)
    P = _es("miq,mjq->mij", G[:, :, :2 * NORB], O2)
    return _extract(P, G)


def v3(occ_up, occ_dn, R_s, R_o, u_row):
    A = _r2aug(R_s, R_o, u_row)
    occ2 = jnp.concatenate([occ_up, occ_dn + NORB], axis=1)
    G = jnp.take(A, occ2, axis=0)
    P = jnp.take_along_axis(
        G[:, :, :2 * NORB],
        jnp.broadcast_to(occ2[:, None, :], (occ2.shape[0], NE, NE)), axis=2)
    return _extract(P, G)


def main():
    print(f"# device: {jax.devices()[0]}")
    rng = np.random.default_rng(1)

    def rand_occ(m, k):
        return jnp.asarray(
            np.sort(np.argsort(rng.random((m, NORB)), axis=1)[:, :k],
                    axis=1).astype(np.int32))

    R_s = np.abs(rng.random((NORB, NORB), np.float32))
    R_s = np.float32(R_s + R_s.T)
    np.fill_diagonal(R_s, 0)
    R_o = np.abs(rng.random((NORB, NORB), np.float32))
    u_row = np.abs(rng.random(NORB, np.float32))
    args_t = (jnp.asarray(R_s), jnp.asarray(R_o), jnp.asarray(u_row))

    # exact reference: the true f32 table entries (host gather)
    ou, od = rand_occ(1024, NUP), rand_occ(1024, NDN)
    oun, odn = np.asarray(ou), np.asarray(od)
    pu = np.concatenate([oun[:, iu], odn[:, idn],
                         oun[:, io.ravel()]], axis=1)
    qv = np.concatenate([oun[:, ju], odn[:, jdn],
                         odn[:, jo.ravel()]], axis=1)
    kind = np.concatenate([np.zeros(len(iu), int), np.zeros(len(idn), int),
                           np.ones(NUP * NDN, int)])
    pr_ref = np.where(kind[None, :] == 0, R_s[pu, qv], R_o[pu, qv])
    u_ref = u_row[np.concatenate([oun, odn], axis=1)]

    variants = (("v0 five one-hot einsums (production)", v0),
                ("v1 spin-block 2-einsum chain", v1),
                ("v2 row-gather G + one-hot P einsum", v2),
                ("v3 row-gather G + take_along_axis P", v3))
    for pname, prec in (("DEFAULT", None),
                        ("HIGHEST", jax.lax.Precision.HIGHEST)):
        PREC[0] = prec
        for name, fn in variants:
            pr, ur = map(np.asarray, jax.jit(fn)(ou, od, *args_t))
            print(f"# {name.split()[0]} @ {pname}: pr exact="
                  f"{np.array_equal(pr, pr_ref)} "
                  f"u exact={np.array_equal(ur, u_ref)}")

    calibrate()
    ou, od = rand_occ(M, NUP), rand_occ(M, NDN)
    for pname, prec in (("DEFAULT", None),
                        ("HIGHEST", jax.lax.Precision.HIGHEST)):
        PREC[0] = prec
        for name, fn in variants:
            bench(f"{name} @ {pname}", fn, ou, od, *args_t)


if __name__ == "__main__":
    main()
