"""Practical HBM bandwidth ceiling through this stack (copy / reduce)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

REPS = 30
def timeit(fn, *a):
    out = fn(*a); np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(REPS): out = fn(*a)
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / REPS

def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(0, 3, (16384, 10240)), jnp.int8)   # 168 MB
    a32 = jnp.asarray(rng.normal(0, 1, (4096, 10240)), jnp.float32)  # 168 MB
    y = jnp.asarray(rng.normal(0, 1, 10240), jnp.float32)

    tests = [
        ("f32 sum-reduce (read 168MB)", jax.jit(lambda a: jnp.sum(a)), (a32,)),
        ("int8 sum-reduce (read 168MB)", jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32)), (a8,)),
        ("f32 matvec a32@y", jax.jit(lambda a, y: a @ y), (a32, y)),
        ("int8 elemwise reduce sum(a*y)", jax.jit(lambda a, y: jnp.sum(a.astype(jnp.float32) * y[None, :], axis=1)), (a8, y)),
    ]
    for name, fn, args in tests:
        dt = timeit(fn, *args)
        gb = args[0].size * args[0].dtype.itemsize / 1e9
        print(f"{name}: {dt*1e3:7.3f} ms ({gb/dt:6.0f} GB/s)", flush=True)

main()
