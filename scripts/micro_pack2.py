"""Microbenchmark: 2-bit packed genotype kernels vs int8 XLA matvec.

The sweep's HBM traffic is two passes over the genotype block per block-step
(gather r0 = Mc @ ycorr, scatter ycorr += u @ Mc). Genotypes are {0,1,2} so
int8 wastes 4x the bandwidth; this measures whether planar 2-bit packing
(ops/pack2.py) converts the 4x byte reduction into wall-clock, or whether
the VPU unpack becomes the new wall.

Run on the TPU: python scripts/micro_pack2.py   (MP_N/MP_P/MP_B/MP_QT env)
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
    n = int(os.environ.get("MP_N", 49152))
    p = int(os.environ.get("MP_P", 24576))
    B = int(os.environ.get("MP_B", 512))
    q = pack2.packed_q(n)
    nb = p // B
    rng = np.random.default_rng(0)
    g = rng.integers(0, 3, (n, p), dtype=np.int8)
    y = rng.normal(0, 1, n).astype(np.float32)
    u = rng.normal(0, 1, (nb, B)).astype(np.float32)

    mt8 = jnp.asarray(np.ascontiguousarray(g.T).reshape(nb, B, n))
    mtp = jnp.asarray(pack2.pack2_np(g).reshape(nb, B, q))
    y_dev = jnp.asarray(y)
    yp = jnp.concatenate([y_dev, jnp.zeros(4 * q - n, F32)])
    u_dev = jnp.asarray(u)
    gb8 = mt8.size / 1e9
    gbp = mtp.size / 1e9

    # correctness
    y4 = pack2.y_planar(yp)
    r_pal = pack2.matvec(mtp[0], y4)
    r_ref = mt8[0].astype(F32) @ y_dev
    err = float(jnp.max(jnp.abs(r_pal - r_ref)) / jnp.max(jnp.abs(r_ref)))
    d_pal = pack2.rank_update(mtp[0], u_dev[0])[:4].reshape(-1)[:n]
    d_ref = u_dev[0] @ mt8[0].astype(F32)
    err2 = float(jnp.max(jnp.abs(d_pal - d_ref)) / jnp.max(jnp.abs(d_ref)))
    print(f"correctness: matvec rel {err:.2e}, rank-update rel {err2:.2e}", flush=True)

    @jax.jit
    def base_gather(mt, yv):
        def body(c, mtb):
            return c, mtb.astype(F32) @ yv
        _, r = lax.scan(body, 0.0, mt)
        return r

    @jax.jit
    def base_both(mt, yv, uv):
        def body(yc, xs):
            mtb, ub = xs
            mtf = mtb.astype(F32)
            r0 = mtf @ yc
            yc = yc + ub @ mtf * 1e-6
            return yc, r0
        yc, r = lax.scan(body, yv, (mt, uv))
        return yc, r

    @jax.jit
    def pal_gather(mt, ypv):
        y4l = pack2.y_planar(ypv)
        def body(c, mtb):
            return c, pack2.matvec(mtb, y4l)
        _, r = lax.scan(body, 0.0, mt)
        return r

    @jax.jit
    def pal_both(mt, ypv, uv):
        def body(y4c, xs):
            mtb, ub = xs
            r0 = pack2.matvec(mtb, y4c)
            y4c = y4c + pack2.rank_update(mtb, ub) * 1e-6
            return y4c, r0
        y4, r = lax.scan(body, pack2.y_planar(ypv), (mt, uv))
        return y4, r

    t = timeit(base_gather, mt8, y_dev)
    print(f"int8 gather pass      : {t*1e3:7.3f} ms  ({gb8/t:6.0f} GB/s int8)", flush=True)
    t = timeit(base_both, mt8, y_dev, u_dev)
    print(f"int8 gather+scatter   : {t*1e3:7.3f} ms  ({2*gb8/t:6.0f} GB/s int8-equiv)", flush=True)
    t = timeit(pal_gather, mtp, yp)
    print(f"pack2 gather pass     : {t*1e3:7.3f} ms  ({gbp/t:6.0f} GB/s packed, {gb8/t:6.0f} GB/s int8-equiv)", flush=True)
    t2 = timeit(pal_both, mtp, yp, u_dev)
    print(f"pack2 gather+scatter  : {t2*1e3:7.3f} ms  ({2*gbp/t2:6.0f} GB/s packed, {2*gb8/t2:6.0f} GB/s int8-equiv)", flush=True)


main()
