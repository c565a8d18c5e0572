"""Attribute per-sweep wall time at the bench shape to its components.

The micro_pack2 result shows the raw gather+scatter streams at ~660 GB/s
int8-equivalent (3.6 ms for a 1.2 GB matrix twice), while the full sweep
at 10k x 49k runs 9.1 ms for 0.98 GB of traffic — so most of the sweep is
NOT the genotype passes. This times each piece at the exact bench layout.

Run: python scripts/micro_anatomy.py   (NA_N/NA_P/NA_B/NA_V env)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import nextgp_tpu as ng
from nextgp_tpu.engine.samplers.markers import sample_marker_set
from nextgp_tpu.engine.sharding import UNSHARDED
from nextgp_tpu.ops import gibbs_kernels

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
    n = int(os.environ.get("NA_N", 10000))
    p = int(os.environ.get("NA_P", 49152))
    B = int(os.environ.get("NA_B", 256))
    V = int(os.environ.get("NA_V", 96))

    @jax.jit
    def simulate(key):
        kg, ke = jax.random.split(key)
        g = jax.random.randint(kg, (n, p), 0, 3, jnp.int8)
        y = jax.random.normal(ke, (n,))
        return g, y

    g_dev, y_dev = simulate(jax.random.key(0))
    y = np.asarray(jax.device_get(y_dev), np.float64)
    from nextgp_tpu.data.ingest import from_device_array

    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm(
            "M1", from_device_array(g_dev),
            ng.BayesR([0.9, 0.05, 0.03, 0.02], [0.0, 1e-4, 1e-3, 1e-2], 1.0,
                      estimatePi=True))],
        block_size=B,
    )
    plan, state = ng.assemble(spec, vshards=V, pack2=False)
    mp = plan.markers[0]
    ms = state.markers[0]
    print(f"layout: mt {ms.mt.shape} {ms.mt.dtype}, gram {ms.gram.shape}", flush=True)
    T = ms.mt.shape[0]
    nb = mp.n_blocks

    # 1. matvec-only scan at the sweep's exact layout
    @jax.jit
    def mv(mt, yv):
        def body(c, mtb):
            mtf = mtb.astype(F32).reshape(V * B, n)
            return c, mtf @ yv
        _, r = lax.scan(body, 0.0, mt)
        return r

    # 2. matvec + rank-update scan (the full genotype traffic of one sweep)
    @jax.jit
    def mv_up(mt, yv):
        def body(yc, mtb):
            mtf = mtb.astype(F32).reshape(V * B, n)
            r0 = mtf @ yc
            yc = yc + (r0[:V] * 1e-9) @ mtf[:V]
            return yc, r0[0]
        yc, r = lax.scan(body, yv, mt)
        return yc, r

    # 2b. rank-update uses full-width u like the real sweep
    @jax.jit
    def mv_up_full(mt, yv, uv):
        def body(yc, xs):
            mtb, ub = xs
            mtf = mtb.astype(F32).reshape(V * B, n)
            r0 = mtf @ yc
            yc = yc + ub @ mtf * 1e-9
            return yc, r0[0]
        yc, r = lax.scan(body, yv, (mt, uv))
        return yc, r

    # 3. Pallas V-kernel alone (gram resident, dummy packed coefficients)
    K = mp.n_classes
    pkw = 8 + 4 * K
    pk = jnp.zeros((T, V, B, pkw), F32).at[..., 3].set(1.0)

    @jax.jit
    def kernel_only(gram, pka):
        def body(c, xs):
            gb, pb = xs
            beta, u, delta = gibbs_kernels.r_block_scan_v(gb, pb, K)
            return c, (beta[0, 0], u[0, 0])
        _, r = lax.scan(body, 0.0, (gram, pka))
        return r

    # 4. coefficient pack alone (all-p vectorized prep)
    @jax.jit
    def pack_only(ms_beta, key):
        z = jax.random.normal(key, (mp.p_pad,), F32)
        unif = jax.random.uniform(key, (mp.p_pad,), F32)
        varc = jnp.asarray([0.0, 1e-4, 1e-3, 1e-2], F32)
        logpi = jnp.log(jnp.asarray([0.9, 0.05, 0.03, 0.02], F32))
        return gibbs_kernels.r_block_pack(
            ms_beta, z, unif, ms.mpm.reshape(-1), ms.lhs_ss.reshape(-1),
            ms.rhs_ss.reshape(-1), ms.mask.reshape(-1), varc, logpi, 1.0, 1.0)

    # 5. full marker stage
    @jax.jit
    def marker_stage(msx, yv, key):
        msx, yc = sample_marker_set(key, msx, mp, yv, jnp.asarray(1.0, F32), None,
                                    UNSHARDED)
        return yc

    # 6. full sweep
    sweep = jax.jit(ng.make_sweep(plan))

    yv = state.ycorr
    uv = jnp.zeros((T, V * B), F32)
    key = jax.random.key(1)

    t1 = timeit(mv, ms.mt, yv)
    t2 = timeit(mv_up, ms.mt, yv)
    t2b = timeit(mv_up_full, ms.mt, yv, uv)
    t3 = timeit(kernel_only, ms.gram, pk)
    t4 = timeit(pack_only, ms.beta, key)
    t5 = timeit(marker_stage, ms, yv, key)
    t6 = timeit(lambda s, k: sweep(s, k), state, key)

    gb = ms.mt.size / 1e9
    print(f"1 matvec scan          : {t1*1e3:7.3f} ms ({gb/t1:5.0f} GB/s int8)", flush=True)
    print(f"2 matvec+thin update   : {t2*1e3:7.3f} ms ({2*gb/t2:5.0f} GB/s equiv)", flush=True)
    print(f"2b matvec+full update  : {t2b*1e3:7.3f} ms ({2*gb/t2b:5.0f} GB/s equiv)", flush=True)
    print(f"3 pallas V-kernel scan : {t3*1e3:7.3f} ms", flush=True)
    print(f"4 coefficient pack     : {t4*1e3:7.3f} ms", flush=True)
    print(f"5 full marker stage    : {t5*1e3:7.3f} ms", flush=True)
    print(f"6 full sweep           : {t6*1e3:7.3f} ms", flush=True)


main()
