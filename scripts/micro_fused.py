"""Fused scatter(t) || gather(t+1) experiment (VERDICT r3 #9 / r4 next-5).

The production sweep's two panel passes are serialized by the residual
update: scatter(t) spreads step t's new effects (dy = u_t @ Mc_t), then
gather(t+1) reads the updated residual (r0 = Mc_{t+1} @ y). The passes
touch DIFFERENT panel rows, so a single pallas_call CAN issue both in one
grid — two input streams DMA concurrently while the VPU alternates
unpack+reduce work, and per-call launch overhead halves. The gather's
dependency on dy is satisfied in-kernel: r0 is computed against y_old and
dy separately never — instead the caller passes y_new = y_old + dy which
is NOT available... so the fusion here evaluates the SCHEDULE REWRITE:

    r0(t+1) = Mc_{t+1} @ y_new = Mc_{t+1} @ y_old + Mc_{t+1} @ dy

The fused kernel computes BOTH Mc_{t+1} @ y_old (gather against the
pre-scatter residual, available immediately) and the scatter partials; the
correction term Mc_{t+1} @ dy would be a third pass, so the honest fused
variant measured here is the OVERLAP-ONLY schedule: it assumes the caller
re-associates the residual update so gather(t+1) can run against y_old
(mathematically this changes the chain unless the correction is applied;
the measurement answers whether the DMA overlap is worth building that
correction path at all).

Both passes are measured at shared tiles (fusion forces one grid) against
the sequential two-call baseline at each pass's OWN best tiles. If the
fused time is not clearly below gather_best + scatter_best, the experiment
is a recorded negative and the production schedule stays two-pass.

Run on the TPU: python scripts/micro_fused.py   (MF_ROWS/MF_Q/MF_T env)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nextgp_tpu.ops import pack2
from nextgp_tpu.ops.pack2 import F32

HERE = os.path.dirname(os.path.abspath(__file__))


def _sync(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]


def timeit(fn, *a, reps=5):
    out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def make_fused_step(rows, q, rt, qt):
    """One pallas_call doing scatter over step t's rows AND gather over
    step t1's rows (t1 = scalar-prefetched separately). Grid (rows//rt,
    q//qt), gather-order: r0 accumulates over the inner q axis; scatter
    partials write one (8, qt) block per cell and reduce outside."""
    R, Q = rows // rt, q // qt

    def kernel(t_ref, pk_s_ref, pk_g_ref, u_ref, y4_ref, r0_ref, dyp_ref):
        qi = pl.program_id(1)
        # gather part (rows of t+1)
        pkg = pk_g_ref[:].astype(jnp.int32)
        acc = (pkg & 3).astype(F32) * y4_ref[0:1, :]
        acc += ((pkg >> 2) & 3).astype(F32) * y4_ref[1:2, :]
        acc += ((pkg >> 4) & 3).astype(F32) * y4_ref[2:3, :]
        acc += ((pkg >> 6) & 3).astype(F32) * y4_ref[3:4, :]
        partial_g = jnp.sum(acc, axis=1, keepdims=True)

        @pl.when(qi == 0)
        def _():
            r0_ref[:] = partial_g

        @pl.when(qi != 0)
        def _():
            r0_ref[:] += partial_g

        # scatter part (rows of t): per-cell partial, no revisits
        pks = pk_s_ref[:].astype(jnp.int32)
        uc = u_ref[:, 0:1]
        rows4 = [
            jnp.sum(((pks >> (2 * k)) & 3).astype(F32) * uc,
                    axis=0, keepdims=True)
            for k in range(4)
        ]
        dyp_ref[0] = jnp.concatenate(
            rows4 + [jnp.zeros_like(rows4[0])] * 4, axis=0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # [t, t1]
        grid=(R, Q),
        in_specs=[
            pl.BlockSpec((rt, qt), lambda i, j, t_ref: (t_ref[0] * R + i, j)),
            pl.BlockSpec((rt, qt), lambda i, j, t_ref: (t_ref[1] * R + i, j)),
            pl.BlockSpec((rt, 1), lambda i, j, t_ref: (i, 0)),
            pl.BlockSpec((8, qt), lambda i, j, t_ref: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1), lambda i, j, t_ref: (i, 0)),
            pl.BlockSpec((1, 8, qt), lambda i, j, t_ref: (i, 0, j)),
        ],
    )

    interp = os.environ.get("MF_INTERPRET", "0") == "1"

    def call(pk_all, t, t1, u, y4):
        r0, dyp = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((rows, 1), F32),
                jax.ShapeDtypeStruct((R, 8, q), F32),
            ],
            grid_spec=gs,
            interpret=interp,
        )(jnp.asarray([t, t1], jnp.int32), pk_all, pk_all, u.reshape(rows, 1), y4)
        return r0[:, 0], jnp.sum(dyp, axis=0)

    return call


def main():
    rows = int(os.environ.get("MF_ROWS", 36864))
    q = int(os.environ.get("MF_Q", pack2.packed_q(50000)))
    T = int(os.environ.get("MF_T", 16))
    gb2 = 2 * T * rows * q / 1e9  # both passes over the panel
    print(f"panel: T={T} x rows={rows} x q={q}; {gb2:.2f} GB per fused scan",
          flush=True)

    key = jax.random.key(0)
    pk_all = jax.jit(
        lambda k: jax.random.randint(k, (T * rows, q), 0, 255, jnp.uint8))(key)
    y4 = jax.jit(lambda k: jax.random.normal(k, (8, q), F32))(key)
    u = jax.jit(lambda k: jax.random.normal(k, (rows,), F32))(key)

    results = {}

    # ---- baseline: the two separate step kernels at their own best tiles
    from micro_frontier import make_gather_step, make_scatter_step

    g_call = make_gather_step("vpu", rows, q, 1024, max(
        (d for d in range(128, 2049, 128) if q % d == 0), default=256))
    s_rt, s_qt = pack2._tile_sizes(rows, q)
    s_call = make_scatter_step("vpu", rows, q, s_rt, s_qt)

    @jax.jit
    def seq_scan(pk_all, u, y4):
        def body(acc, t):
            dy = s_call(pk_all, t, u)
            r0 = g_call(pk_all, (t + 1) % T, y4)
            return acc + dy.reshape(-1)[0] + r0.reshape(-1)[0], None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(T))
        return acc

    t_seq = timeit(seq_scan, pk_all, u, y4)
    results[f"seq scatter({s_rt}x{s_qt})+gather"] = t_seq
    print(f"sequential 2-call pair: {t_seq*1e3:7.2f} ms/scan  "
          f"{gb2/t_seq:6.1f} GB/s", flush=True)

    # ---- one-time correctness check at a SMALL shape (full unpack of the
    # big panel would be 7.4 GB f32): same kernel, tiny panel
    rs, qs, Ts = 1024, 512, 2
    pk_s = jax.jit(lambda k: jax.random.randint(
        k, (Ts * rs, qs), 0, 255, jnp.uint8))(key)
    u_s = jax.jit(lambda k: jax.random.normal(k, (rs,), F32))(key)
    y4_s = jax.jit(lambda k: jax.random.normal(k, (8, qs), F32))(key)
    f_small = make_fused_step(rs, qs, 256, 256)
    r0_s, dy_s = f_small(pk_s, 0, 1, u_s, y4_s)
    ref_dy = np.asarray(u_s @ pack2.unpack2(pk_s[:rs], F32))
    ref_r0 = np.asarray(
        pack2.unpack2(pk_s[rs:2 * rs], F32) @ y4_s[:4].reshape(-1))
    e1 = np.abs(np.asarray(dy_s)[:4].reshape(-1) - ref_dy).max() / (
        np.abs(ref_dy).max() + 1e-9)
    e2 = np.abs(np.asarray(r0_s) - ref_r0).max() / (np.abs(ref_r0).max() + 1e-9)
    print(f"small-shape fused correctness: err dy={e1:.1e} r0={e2:.1e}",
          flush=True)
    assert e1 < 1e-4 and e2 < 1e-4, "fused kernel incorrect"

    # ---- fused at several shared tiles (two pk streams double-buffer, so
    # tiles must be ~half the single-pass sizes to fit scoped vmem)
    for rt, qt in ((512, 896), (1024, 256), (512, 1792), (2048, 256),
                   (512, 256), (1024, 896)):
        if rows % rt or q % qt:
            continue
        f_call = make_fused_step(rows, q, rt, qt)

        @jax.jit
        def fused_scan(pk_all, u, y4):
            def body(acc, t):
                r0, dy = f_call(pk_all, t, (t + 1) % T, u, y4)
                return acc + dy.reshape(-1)[0] + r0[0], None
            acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(T))
            return acc

        try:
            t_f = timeit(fused_scan, pk_all, u, y4)
        except Exception as exc:
            print(f"fused rt={rt} qt={qt}: FAILED {str(exc)[:140]}", flush=True)
            results[f"fused rt={rt} qt={qt}"] = None
            continue
        results[f"fused rt={rt} qt={qt}"] = t_f
        print(f"fused rt={rt} qt={qt}: {t_f*1e3:7.2f} ms/scan  "
              f"{gb2/t_f:6.1f} GB/s", flush=True)

    best_f = min((v for k, v in results.items() if v and k.startswith("fused")),
                 default=None)
    verdict = None
    if best_f:
        verdict = ("WIN" if best_f < 0.95 * t_seq else
                   "NEUTRAL" if best_f < 1.05 * t_seq else "LOSS")
        print(f"\nfused best {best_f*1e3:.2f} ms vs sequential {t_seq*1e3:.2f} "
              f"ms -> {verdict}", flush=True)

    rec = {"experiment": "micro_fused", "rows": rows, "q": q, "T": T,
           "date": __import__("datetime").date.today().isoformat(),
           "verdict": verdict,
           **{k: (round(v * 1e3, 2) if v else None) for k, v in results.items()}}
    with open(os.path.join(HERE, "ladder_results.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
