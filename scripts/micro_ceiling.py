"""Hard probe of this chip's achievable HBM bandwidth through JAX.

All loops are in-graph (lax.scan / fori) so tunnel dispatch overhead is
amortized to zero; each variant reports GB/s of total bytes moved.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REPS = 10
LOOP = 20


def _sync(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]


def timeit(fn, *a):
    out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    out = fn(*a)
    _sync(out)
    return time.perf_counter() - t0


def main():
    mb = int(os.environ.get("MC_MB", 512))
    n = mb * (1 << 20) // 4
    x = jnp.arange(n, dtype=jnp.float32)
    gb = n * 4 / 1e9

    @jax.jit
    def reduce_loop(x):
        def body(c, _):
            return c + jnp.sum(x * c), None
        c, _ = lax.scan(body, jnp.float32(1e-30), None, length=LOOP)
        return c

    t = timeit(reduce_loop, x)
    print(f"f32 reduce x{LOOP} ({mb} MB): {t*1e3:8.1f} ms ({LOOP*gb/t:6.0f} GB/s read)", flush=True)

    @jax.jit
    def copy_loop(x):
        def body(c, _):
            return c * 1.0000001 + 1e-30, None
        y, _ = lax.scan(body, x, None, length=LOOP)
        return y

    t = timeit(copy_loop, x)
    print(f"f32 rmw   x{LOOP} ({mb} MB): {t*1e3:8.1f} ms ({2*LOOP*gb/t:6.0f} GB/s r+w)", flush=True)

    x8 = jnp.asarray(np.random.default_rng(0).integers(0, 256, n, np.uint8))
    gb8 = n / 1e9

    @jax.jit
    def reduce8_loop(x8):
        def body(c, _):
            return c + jnp.sum(x8, dtype=jnp.int32), None
        c, _ = lax.scan(body, jnp.int32(0), None, length=LOOP)
        return c

    t = timeit(reduce8_loop, x8)
    print(f"u8  reduce x{LOOP} ({mb} MB): {t*1e3:8.1f} ms ({LOOP*gb8/t:6.0f} GB/s read)", flush=True)

    # big-matvec: MXU-fed streaming (p, n) @ (n,) — the gather pass shape
    p, nn = 16384, n // 16384
    a = x[: p * nn].reshape(p, nn)
    y = jnp.ones((nn,), jnp.float32)

    @jax.jit
    def matvec_loop(a, y):
        def body(c, _):
            return c + jnp.sum(a @ (y * c)) * 1e-30, None
        c, _ = lax.scan(body, jnp.float32(1.0), None, length=LOOP)
        return c

    t = timeit(matvec_loop, a, y)
    print(f"f32 matvec x{LOOP} ({p}x{nn}): {t*1e3:8.1f} ms ({LOOP*p*nn*4/1e9/t:6.0f} GB/s read)", flush=True)


main()
