"""Micro-bench: int8 genotype matvec strategies on the TPU.

Measures the two per-block-step contractions of the marker sweep
(r0 = M_blk @ ycorr and correction = u @ M_blk) as XLA convert+dot vs a
Pallas kernel that streams int8 and converts in-register.

Run: python scripts/micro_matvec.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, N = 16384, 10240  # one V=32 block-step at the bench problem size
REPS = 50


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(out)  # host readback: the only reliable barrier over the tunnel
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    mt = jnp.asarray(rng.integers(0, 3, (L, N)), jnp.int8)
    y = jnp.asarray(rng.normal(0, 1, N), jnp.float32)
    u = jnp.asarray(rng.normal(0, 1, L), jnp.float32)

    # -- XLA convert + dot
    @jax.jit
    def xla_r0(mt, y):
        return mt.astype(jnp.float32) @ y

    @jax.jit
    def xla_corr(mt, u):
        return u @ mt.astype(jnp.float32)

    # -- XLA bf16 dot
    @jax.jit
    def xla_r0_bf16(mt, y):
        return jnp.dot(mt.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    # -- Pallas: stream int8 row tiles, convert in-register, reduce on VPU
    TL, TN = 512, 2048

    def _r0_kernel(mt_ref, y_ref, o_ref):
        j = pl.program_id(1)
        a = mt_ref[...].astype(jnp.float32)  # (TL, TN)
        part = jnp.sum(a * y_ref[...], axis=1)[None, :]
        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += part

    @jax.jit
    def pl_r0(mt, y):
        out = pl.pallas_call(
            _r0_kernel,
            grid=(L // TL, N // TN),
            in_specs=[
                pl.BlockSpec((TL, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TL), lambda i, j: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
        )(mt, y[None, :])
        return out[0]

    def _corr_kernel(mt_ref, u_ref, o_ref):
        i = pl.program_id(1)
        a = mt_ref[...].astype(jnp.float32)  # (TL, TN)
        part = jnp.sum(a * u_ref[...].reshape(TL, 1), axis=0)  # (TN,)
        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += part[None, :]

    @jax.jit
    def pl_corr(mt, u):
        # grid order: N-tile outer so the (1, TN) output block revisits over
        # the row accumulation (innermost axis)
        out = pl.pallas_call(
            _corr_kernel,
            grid=(N // TN, L // TL),
            in_specs=[
                pl.BlockSpec((TL, TN), lambda j, i: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TL), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TN), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        )(mt, u[None, :])
        return out[0]

    gb = L * N / 1e9
    for name, fn, args in [
        ("xla  r0   (convert+dot)", xla_r0, (mt, y)),
        ("xla  r0   bf16 dot     ", xla_r0_bf16, (mt, y)),
        ("plas r0   int8 stream  ", pl_r0, (mt, y)),
        ("xla  corr (convert+dot)", xla_corr, (mt, u)),
        ("plas corr int8 stream  ", pl_corr, (mt, u)),
    ]:
        try:
            dt = timeit(fn, *args)
            print(f"{name}: {dt * 1e3:7.3f} ms  ({gb / dt:6.0f} GB/s int8-equivalent)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    # correctness
    np.testing.assert_allclose(np.asarray(pl_r0(mt, y)), np.asarray(xla_r0(mt, y)), rtol=2e-5, atol=2e-2)
    np.testing.assert_allclose(np.asarray(pl_corr(mt, u)), np.asarray(xla_corr(mt, u)), rtol=2e-5, atol=2e-2)
    print("pallas == xla (within fp32 tolerance)")


if __name__ == "__main__" and not os.environ.get("MB_PACKED"):
    main()


def packed():
    """2-bit packed genotype matvec: 4 dosages/byte, in-kernel unpack."""
    rng = np.random.default_rng(0)
    g = rng.integers(0, 3, (L, N)).astype(np.uint8)
    y_h = rng.normal(0, 1, N).astype(np.float32)
    u_h = rng.normal(0, 1, L).astype(np.float32)
    N4 = N // 4
    packed = (g.reshape(L, N4, 4) << np.array([0, 2, 4, 6], np.uint8)).sum(
        axis=2).astype(np.uint8)
    mt2 = jnp.asarray(packed.view(np.int8))  # (L, N4), bit-pattern carrier
    mtf = jnp.asarray(g, jnp.int8)
    y = jnp.asarray(y_h)
    u = jnp.asarray(u_h)
    # y in unpack-interleaved order: lane k of the unpacked quad is source
    # column 4*j + k -> y4[k, j]
    y4 = jnp.asarray(y_h.reshape(N4, 4).T.copy())  # (4, N4)

    TL, TN4 = 512, 2048

    def _r0p_kernel(mt2_ref, y4_ref, o_ref):
        j = pl.program_id(1)
        a = mt2_ref[...].astype(jnp.int32)  # (TL, TN4); mosaic lacks u8->f32
        acc = jnp.zeros((TL,), jnp.float32)
        for k in range(4):
            dk = ((a >> (2 * k)) & 3).astype(jnp.float32)
            acc += jnp.sum(dk * y4_ref[k, :][None, :], axis=1)
        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += acc[None, :]

    @jax.jit
    def pl_r0p(mt2, y4):
        out = pl.pallas_call(
            _r0p_kernel,
            grid=(L // TL, N4 // TN4),
            in_specs=[
                pl.BlockSpec((TL, TN4), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, TN4), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TL), lambda i, j: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
        )(mt2, y4)
        return out[0]

    def _corrp_kernel(mt2_ref, u_ref, o_ref):
        i = pl.program_id(1)
        a = mt2_ref[...].astype(jnp.int32)
        uc = u_ref[...].reshape(TL, 1)
        parts = []
        for k in range(4):
            dk = ((a >> (2 * k)) & 3).astype(jnp.float32)
            parts.append(jnp.sum(dk * uc, axis=0))  # (TN4,)
        part = jnp.stack(parts, axis=0)  # (4, TN4)
        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += part

    @jax.jit
    def pl_corrp(mt2, u):
        out = pl.pallas_call(
            _corrp_kernel,
            grid=(N4 // TN4, L // TL),
            in_specs=[
                pl.BlockSpec((TL, TN4), lambda j, i: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TL), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, TN4), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((4, N4), jnp.float32),
        )(mt2, u[None, :])
        # (4, N4) -> (N,): source column 4*j + k at [k, j]
        return out.T.reshape(N)

    @jax.jit
    def xla_r0(mt, y):
        return mt.astype(jnp.float32) @ y

    @jax.jit
    def xla_corr(mt, u):
        return u @ mt.astype(jnp.float32)

    def _r0p8_kernel(mt2_ref, y4_ref, o_ref):
        j = pl.program_id(1)
        a = mt2_ref[...]  # (TL, TN4) int8
        acc = jnp.zeros((TL,), jnp.float32)
        for k in range(4):
            dk = ((a >> (2 * k)) & 3).astype(jnp.float32)  # int8-native shift
            acc += jnp.sum(dk * y4_ref[k, :][None, :], axis=1)
        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += acc[None, :]

    @jax.jit
    def pl_r0p8(mt2, y4):
        out = pl.pallas_call(
            _r0p8_kernel,
            grid=(L // TL, N4 // TN4),
            in_specs=[
                pl.BlockSpec((TL, TN4), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, TN4), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TL), lambda i, j: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
        )(mt2, y4)
        return out[0]

    gb = L * N / 1e9
    for name, fn, args in [
        ("plas r0   2-bit packed", pl_r0p, (mt2, y4)),
        ("plas r0   2-bit int8sh", pl_r0p8, (mt2, y4)),
        ("plas corr 2-bit packed", pl_corrp, (mt2, u)),
    ]:
        try:
            dt = timeit(fn, *args)
            print(f"{name}: {dt * 1e3:7.3f} ms  ({gb / dt:6.0f} GB/s int8-equivalent)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            return
    d1 = np.abs(np.asarray(pl_r0p(mt2, y4)) - np.asarray(xla_r0(mtf, y))).max()
    d2 = np.abs(np.asarray(pl_corrp(mt2, u)) - np.asarray(xla_corr(mtf, u))).max()
    d3 = np.abs(np.asarray(pl_r0p8(mt2, y4)) - np.asarray(xla_r0(mtf, y))).max()
    print(f"packed vs dense max|diff|: r0={d1:.3e} r0_int8sh={d3:.3e} corr={d2:.3e}", flush=True)


if __name__ == "__main__" and os.environ.get("MB_PACKED"):
    packed()
