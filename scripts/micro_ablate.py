"""In-context ablation of the real 50-sweep fused program at the bench shape.

Single-dispatch micros carry axon-tunnel dispatch overhead, so component
costs are attributed by REPLACING one component at a time inside the exact
bench program (50 sweeps in one jit, donated carry, hard readback barrier)
and measuring the drop.

Run: python scripts/micro_ablate.py   (NB_* env as bench.py)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import nextgp_tpu as ng
from nextgp_tpu.data.ingest import from_device_array
from nextgp_tpu.ops import gibbs_kernels

F32 = jnp.float32


def build(n, p, block, vshards, pack2):
    @jax.jit
    def simulate(key):
        kg, ke = jax.random.split(key)
        g = jax.random.randint(kg, (n, p), 0, 3, jnp.int8)
        y = jax.random.normal(ke, (n,))
        return g, y

    g_dev, y_dev = simulate(jax.random.key(0))
    y = np.asarray(jax.device_get(y_dev), np.float64)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm(
            "M1", from_device_array(g_dev),
            ng.BayesR([0.9, 0.05, 0.03, 0.02], [0.0, 1e-4, 1e-3, 1e-2], 1.0,
                      estimatePi=True))],
        block_size=block,
    )
    return ng.assemble(spec, vshards=vshards, pack2=pack2)


def run_case(name, plan, state, n_sweeps=50):
    sweep = ng.make_sweep(plan)

    def multi(st, key):
        def body(s, _):
            return sweep(s, key), None
        st, _ = lax.scan(body, st, None, length=n_sweeps)
        return st

    step = jax.jit(multi, donate_argnums=0)
    key = jax.random.key(0)
    state = step(state, key)
    float(np.asarray(state.e.var_e))  # compile + barrier
    t0 = time.perf_counter()
    state = step(state, key)
    float(np.asarray(state.e.var_e))
    dt = (time.perf_counter() - t0) / n_sweeps
    print(f"{name:34s}: {dt*1e3:7.3f} ms/sweep ({1.0/dt:6.1f} sweeps/s)", flush=True)
    return dt


def _int8_cases(n, p, block, vshards):
    plan, state = build(n, p, block, vshards, pack2=False)
    run_case("baseline int8", plan, state)

    # ablate the coefficient pack: constant coefficients
    orig_pack = gibbs_kernels.r_block_pack
    gibbs_kernels.r_block_pack = (
        lambda beta_old, z, unif, mpm, lss, rss, mask, varc, logpi, ive, var_e:
            jnp.zeros((beta_old.shape[0], 8 + 4 * varc.shape[0]), F32).at[:, 2].set(0.5)
    )
    plan, state = build(n, p, block, vshards, pack2=False)
    run_case("no coefficient pack", plan, state)
    gibbs_kernels.r_block_pack = orig_pack

    # ablate the pallas scan kernel: identity draw (u=0, beta=bold)
    orig_scan = gibbs_kernels.r_block_scan_v
    gibbs_kernels.r_block_scan_v = (
        lambda gram_t, pk, K, interpret=False: (
            pk[:, :, 1], jnp.zeros(pk.shape[:2], F32), jnp.ones(pk.shape[:2], jnp.int32))
    )
    plan, state = build(n, p, block, vshards, pack2=False)
    run_case("no pallas scan kernel", plan, state)
    gibbs_kernels.r_block_scan_v = orig_scan

    # ablate both
    gibbs_kernels.r_block_pack = (
        lambda beta_old, z, unif, mpm, lss, rss, mask, varc, logpi, ive, var_e:
            jnp.zeros((beta_old.shape[0], 8 + 4 * varc.shape[0]), F32).at[:, 2].set(0.5)
    )
    gibbs_kernels.r_block_scan_v = (
        lambda gram_t, pk, K, interpret=False: (
            pk[:, :, 1], jnp.zeros(pk.shape[:2], F32), jnp.ones(pk.shape[:2], jnp.int32))
    )
    plan, state = build(n, p, block, vshards, pack2=False)
    run_case("neither (gather+scatter+tail)", plan, state)
    gibbs_kernels.r_block_pack = orig_pack
    gibbs_kernels.r_block_scan_v = orig_scan


def main():
    n = int(os.environ.get("NB_N", 10000))
    p = int(os.environ.get("NB_P", 49152))
    block = int(os.environ.get("NB_B", 256))
    vshards = int(os.environ.get("NB_V", 96))
    orig_scan = gibbs_kernels.r_block_scan_v

    if os.environ.get("NB_SKIP_INT8", "0") != "1":
        _int8_cases(n, p, block, vshards)

    # packed storage end to end
    plan, state = build(n, p, block, vshards, pack2=True)
    run_case("baseline pack2", plan, state)

    # pack2 with the scan kernel ablated -> passes + tail only
    gibbs_kernels.r_block_scan_v = (
        lambda gram_t, pk, K, interpret=False: (
            pk[:, :, 1], jnp.zeros(pk.shape[:2], F32), jnp.ones(pk.shape[:2], jnp.int32))
    )
    plan, state = build(n, p, block, vshards, pack2=True)
    run_case("pack2, no pallas scan kernel", plan, state)
    gibbs_kernels.r_block_scan_v = orig_scan

    # pack2 with the gather ablated (constant r0): scatter + scan + tail.
    # The TPU packed sweep routes through the step-indexed variants
    # (markers.py matvec_step/rank_update_step), so BOTH the sliced and
    # step-indexed entry points are patched — patching only the sliced one
    # silently measures the unablated program.
    from nextgp_tpu.ops import pack2 as p2
    orig_mv, orig_mvs = p2.matvec, p2.matvec_step
    p2.matvec = lambda pk, y4, interpret=False: jnp.zeros((pk.shape[0], 1), F32)[:, 0] + y4[0, 0]
    p2.matvec_step = (
        lambda pk_all, t, y4, rows, interpret=False:
            jnp.zeros((rows, 1), F32)[:, 0] + y4[0, 0])
    plan, state = build(n, p, block, vshards, pack2=True)
    run_case("pack2, no gather", plan, state)
    p2.matvec, p2.matvec_step = orig_mv, orig_mvs

    # pack2 with the scatter ablated: gather + scan + tail
    orig_ru, orig_rus = p2.rank_update, p2.rank_update_step
    p2.rank_update = lambda pk, u, interpret=False: jnp.zeros((8, pk.shape[1]), F32) + u[0]
    p2.rank_update_step = (
        lambda pk_all, t, u, interpret=False:
            jnp.zeros((8, pk_all.shape[1]), F32) + u[0])
    plan, state = build(n, p, block, vshards, pack2=True)
    run_case("pack2, no scatter", plan, state)
    p2.rank_update, p2.rank_update_step = orig_ru, orig_rus


if __name__ == "__main__":
    main()
