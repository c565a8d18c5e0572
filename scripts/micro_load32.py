"""Experiment: does loading the packed panel as int32 lanes beat uint8 loads?

The gather kernel streams (R, q) uint8 and does 4x {shift, mask, f32 mul,
reduce} per byte lane. TPU lanes are 32-bit; a uint8 array occupies one
byte value per lane after load, so the same bytes viewed as int32 pack 4
bytes (16 dosages) per lane — 4x fewer lanes streamed at the cost of 4x
the in-register bit ops. This measures which side wins, bandwidth-only
(no semantic layout — just stream + unpack + multiply-reduce).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
REPS = 20


def _sync(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]


def timeit(fn, *a):
    out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / REPS


def _k8(pk_ref, y_ref, out_ref):
    qi = pl.program_id(1)
    pk = pk_ref[:].astype(jnp.int32)
    acc = (pk & 3).astype(F32) * y_ref[0:1, :]
    acc += ((pk >> 2) & 3).astype(F32) * y_ref[1:2, :]
    acc += ((pk >> 4) & 3).astype(F32) * y_ref[2:3, :]
    acc += ((pk >> 6) & 3).astype(F32) * y_ref[3:4, :]
    partial = jnp.sum(acc, axis=1, keepdims=True)

    @pl.when(qi == 0)
    def _():
        out_ref[:] = partial

    @pl.when(qi != 0)
    def _():
        out_ref[:] += partial


def _k32(pk_ref, y_ref, out_ref):
    qi = pl.program_id(1)
    pk = pk_ref[:]
    acc = None
    for b in range(4):  # byte within the int32
        byte = (pk >> (8 * b)) & 0xFF
        for k in range(4):  # 2-bit field within the byte
            v = ((byte >> (2 * k)) & 3).astype(F32)
            term = v * y_ref[4 * b + k : 4 * b + k + 1, :]
            acc = term if acc is None else acc + term
    partial = jnp.sum(acc, axis=1, keepdims=True)

    @pl.when(qi == 0)
    def _():
        out_ref[:] = partial

    @pl.when(qi != 0)
    def _():
        out_ref[:] += partial


@functools.partial(jax.jit, static_argnames=("rt", "qt"))
def mv8(pk, y4, rt, qt):
    R, q = pk.shape
    return pl.pallas_call(
        _k8,
        grid=(R // rt, q // qt),
        in_specs=[
            pl.BlockSpec((rt, qt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, qt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 1), F32),
    )(pk, y4)


@functools.partial(jax.jit, static_argnames=("rt", "qt"))
def mv32(pk32, y16, rt, qt):
    R, q4 = pk32.shape
    return pl.pallas_call(
        _k32,
        grid=(R // rt, q4 // qt),
        in_specs=[
            pl.BlockSpec((rt, qt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, qt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 1), F32),
    )(pk32, y16)


def main():
    R = int(os.environ.get("ML_R", 24576))
    q = int(os.environ.get("ML_Q", 12544))  # n=50k packed lanes
    rng = np.random.default_rng(0)
    pk = jnp.asarray(rng.integers(0, 256, (R, q), dtype=np.uint8))
    pk32 = jax.jit(lambda a: jax.lax.bitcast_convert_type(
        a.reshape(R, q // 4, 4), jnp.int32).reshape(R, q // 4))(pk)
    y4 = jnp.asarray(rng.normal(0, 1, (8, q)).astype(np.float32))
    y16 = jnp.asarray(rng.normal(0, 1, (16, q // 4)).astype(np.float32))
    gb = R * q / 1e9
    for rt in (256, 512):
        for qt in (1024, 2048, 4096):
            if q % qt == 0:
                t = timeit(mv8, pk, y4, rt, qt)
                print(f"u8  rt={rt} qt={qt}: {t*1e3:7.3f} ms ({gb/t:6.0f} GB/s)", flush=True)
            if (q // 4) % qt == 0:
                t = timeit(mv32, pk32, y16, rt, qt)
                print(f"i32 rt={rt} qt={qt}: {t*1e3:7.3f} ms ({gb/t:6.0f} GB/s)", flush=True)


main()
