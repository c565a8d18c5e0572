"""Isolate the scatter (rank-update) cost at the bench layout.

micro_anatomy showed gather 1.9 ms but gather+full-update 12.4 ms at
(V*B=24576, n=10000) int8 — hypothesis: XLA materializes the f32 convert of
the int8 block when both matmuls consume it. Variants measure the fix.

Run: python scripts/micro_update.py  (NU_N/NU_P/NU_B/NU_V env)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nextgp_tpu.ops import pack2

F32 = jnp.float32
REPS = 20


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    # hard host readback: block_until_ready does not reliably block through
    # the axon remote-execution tunnel
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(fn, *a):
    out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / REPS


def main():
    n = int(os.environ.get("NU_N", 10000))
    p = int(os.environ.get("NU_P", 49152))
    B = int(os.environ.get("NU_B", 256))
    V = int(os.environ.get("NU_V", 96))
    R = V * B
    T = p // R
    q = pack2.packed_q(n)

    key = jax.random.key(0)

    @jax.jit
    def sim(key):
        kg, ky, ku = jax.random.split(key, 3)
        g = jax.random.randint(kg, (T, R, n), 0, 3, jnp.int8)
        y = jax.random.normal(ky, (n,))
        u = jax.random.normal(ku, (T, R)) * 1e-6
        return g, y, u

    g, y, u = sim(key)

    @jax.jit
    def pack(gg):
        gp = jnp.zeros((T, R, 4 * q), jnp.uint8).at[:, :, :n].set(gg.astype(jnp.uint8))
        g4 = gp.reshape(T, R, 4, q)
        return g4[:, :, 0] | (g4[:, :, 1] << 2) | (g4[:, :, 2] << 4) | (g4[:, :, 3] << 6)

    gpk = pack(g)
    yp = jnp.concatenate([y, jnp.zeros(4 * q - n, F32)])
    gb = g.size / 1e9

    # 0. update only
    @jax.jit
    def upd_only(g, y, u):
        def body(yc, xs):
            gb_, ub = xs
            return yc + ub @ gb_.astype(F32), ub[0]
        yc, _ = lax.scan(body, y, (g, u))
        return yc

    # 1. gather + update, one bound astype (anatomy baseline)
    @jax.jit
    def both_shared(g, y, u):
        def body(yc, xs):
            gb_, ub = xs
            mtf = gb_.astype(F32)
            r0 = mtf @ yc
            yc = yc + (ub * r0[0] * 1e-9) @ mtf
            return yc, r0[0]
        yc, _ = lax.scan(body, y, (g, u))
        return yc

    # 2. fresh astype per matmul
    @jax.jit
    def both_fresh(g, y, u):
        def body(yc, xs):
            gb_, ub = xs
            r0 = gb_.astype(F32) @ yc
            yc = yc + (ub * r0[0] * 1e-9) @ gb_.astype(F32)
            return yc, r0[0]
        yc, _ = lax.scan(body, y, (g, u))
        return yc

    # 3. packed pallas kernels
    @jax.jit
    def both_packed(gp, ypv, u):
        def body(yc, xs):
            gb_, ub = xs
            r0 = pack2.matvec(gb_, pack2.y_planar(yc))
            dy = pack2.rank_update(gb_, ub * r0[0] * 1e-9)[:4].reshape(-1)
            return yc + dy, r0[0]
        yc, _ = lax.scan(body, ypv, (gp, u))
        return yc

    # 4. dot_general with int8 lhs (convert fused per-op, update via transpose)
    @jax.jit
    def both_dotg(g, y, u):
        def body(yc, xs):
            gb_, ub = xs
            r0 = jax.lax.dot_general(gb_, yc, (((1,), (0,)), ((), ())),
                                     preferred_element_type=F32)
            dy = jax.lax.dot_general(ub * r0[0] * 1e-9, gb_, (((0,), (0,)), ((), ())),
                                     preferred_element_type=F32)
            return yc + dy, r0[0]
        yc, _ = lax.scan(body, y, (g, u))
        return yc

    for name, fn, args, passes in [
        ("update only (int8)   ", upd_only, (g, y, u), 1),
        ("both, shared astype  ", both_shared, (g, y, u), 2),
        ("both, fresh astype   ", both_fresh, (g, y, u), 2),
        ("both, packed kernels ", both_packed, (gpk, yp, u), 2),
        ("both, dot_general i8 ", both_dotg, (g, y, u), 2),
    ]:
        try:
            t = timeit(fn, *args)
            print(f"{name}: {t*1e3:7.3f} ms ({passes*gb/t:5.0f} GB/s int8-equiv)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


main()
