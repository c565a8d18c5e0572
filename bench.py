"""Headline benchmark: BayesR Gibbs sweep throughput on the local device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's only marker-sweep timing evidence is the BWGR docs
example — ~81 sweeps/s at 12,414 SNPs, single CPU thread
(/root/reference/docs/src/BWGR/BWGR.md:37,58; see BASELINE.md). vs_baseline
is measured sweeps/s divided by 81, on a problem `NG_BENCH_P`/`NG_BENCH_N`
(default 49,152 SNPs x 10,000 individuals — ~20x more work per sweep than
the baseline problem).

Env overrides: NG_BENCH_N, NG_BENCH_P, NG_BENCH_BLOCK, NG_BENCH_SWEEPS.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    try:  # persistent compile cache (big kernels; remote compiles are slow)
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import nextgp_tpu as ng
    from nextgp_tpu.engine.sweep import make_sweep
    from jax import lax

    n = int(os.environ.get("NG_BENCH_N", 10000))
    p = int(os.environ.get("NG_BENCH_P", 49152))
    block = int(os.environ.get("NG_BENCH_BLOCK", 256))
    n_sweeps = int(os.environ.get("NG_BENCH_SWEEPS", 50))
    # virtual shards: 96 block chains advance per step (the multi-device
    # schedule run on one chip; fills the VPU sublane dimension and cuts the
    # per-sweep sequential iteration count to p/V). Tuned on v5e at
    # 10k x 49k: V=8 -> 71.7, V=32 -> 96.3, V=96/B=256 -> 108.6 sweeps/s.
    vshards = int(os.environ.get("NG_BENCH_VSHARDS", 96))

    # simulate ON DEVICE: the remote-TPU tunnel uploads at only a few MB/s at
    # production sizes, so the int8 genotype matrix (0.5-30 GB) never leaves
    # the chip; only y (n floats) is pulled back for the ModelSpec.
    import jax.numpy as jnp
    from nextgp_tpu.data.ingest import from_device_array

    rng = np.random.default_rng(0)

    @jax.jit
    def simulate(key):
        kg, kb, ke = jax.random.split(key, 3)
        g = jax.random.randint(kg, (n, p), 0, 3, jnp.int8)
        gf = g.astype(jnp.float32)
        bt = jnp.where(
            jax.random.uniform(kb, (p,)) < 500.0 / p,
            jax.random.normal(kb, (p,)) * 0.1,
            0.0,
        )
        sig = gf @ bt
        y = sig - jnp.mean(sig) + jax.random.normal(ke, (n,))
        return g, y

    g_dev, y_dev = simulate(jax.random.key(0))
    y = np.asarray(jax.device_get(y_dev), np.float64)

    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[
            ng.MarkerTerm(
                "M1",
                from_device_array(g_dev),
                ng.BayesR([0.9, 0.05, 0.03, 0.02], [0.0, 1e-4, 1e-3, 1e-2], 1.0, estimatePi=True),
            )
        ],
        block_size=block,
    )
    t0 = time.perf_counter()
    plan, state = ng.assemble(spec, vshards=vshards)
    t_assemble = time.perf_counter() - t0

    sweep = make_sweep(plan)

    def multi(state, key):
        def body(st, _):
            return sweep(st, key), None

        st, _ = lax.scan(body, state, None, length=n_sweeps)
        return st

    step = jax.jit(multi, donate_argnums=0)
    key = jax.random.key(0)

    def barrier(st):
        # host readback: block_until_ready does not reliably block through
        # the axon remote-execution tunnel
        return float(np.asarray(st.e.var_e))

    t0 = time.perf_counter()
    state = step(state, key)
    barrier(state)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    state = step(state, key)
    barrier(state)
    dt = time.perf_counter() - t0
    sweeps_per_sec = n_sweeps / dt

    # chain-quality sanity: the current draw's genetic values should already
    # track the simulated signal after 2*n_sweeps sweeps (guards against a
    # fast-but-broken schedule). Row-subsampled to keep it cheap.
    @jax.jit
    def ebv_corr(beta_draw, key):
        ns = min(n, 2048)
        kg, kb, ke = jax.random.split(key, 3)
        bt = jnp.where(
            jax.random.uniform(kb, (p,)) < 500.0 / p,
            jax.random.normal(kb, (p,)) * 0.1,
            0.0,
        )
        gs = g_dev[:ns].astype(jnp.float32)
        ghat = gs @ beta_draw.astype(jnp.float32)
        gtrue = gs @ bt
        ghat = ghat - jnp.mean(ghat)
        gtrue = gtrue - jnp.mean(gtrue)
        return jnp.vdot(ghat, gtrue) / jnp.sqrt(jnp.vdot(ghat, ghat) * jnp.vdot(gtrue, gtrue))

    corr = float(np.asarray(ebv_corr(state.markers[0].beta[:p], jax.random.key(0))))

    print(
        json.dumps(
            {
                "metric": f"BayesR Gibbs sweeps/s ({n} ind x {p} SNPs, 1 chip, est-pi)",
                "value": round(sweeps_per_sec, 2),
                "unit": "sweeps/s",
                "vs_baseline": round(sweeps_per_sec / 81.0, 2),
            }
        )
    )
    print(
        f"# assemble {t_assemble:.1f}s, compile {t_compile:.1f}s, "
        f"{dt / n_sweeps * 1e3:.1f} ms/sweep, EBV corr {corr:.3f} "
        f"after {2 * n_sweeps} sweeps, backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
