"""Scatter-pass implementation shootout at the production shape (r5).

micro_frontier r5 found the plain-MXU scatter 25.2 ms vs VPU 32.2 at
(2048, 256) — but DEFAULT MXU precision truncates u to bf16 (~4e-3 rel
error injected into every residual correction). This measures the
`mxu_split` variant (two DEFAULT dots on a bf16 hi/lo split of u, panel
read once, ~2^-16 rel error) against vpu / mxu / mxu_hi with a
correctness anchor, and appends the record to ladder_results.jsonl.

Run on the TPU: python scripts/micro_scatter_impl.py
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

from micro_frontier import make_scatter_step, timeit
from nextgp_tpu.ops import pack2
from nextgp_tpu.ops.pack2 import F32

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    rows = int(os.environ.get("MF_ROWS", 36864))
    q = int(os.environ.get("MF_Q", pack2.packed_q(50000)))
    T = int(os.environ.get("MF_T", 16))
    gb = T * rows * q / 1e9
    print(f"panel: T={T} x rows={rows} x q={q} ({gb:.2f} GB)", flush=True)

    key = jax.random.key(0)
    pk_all = jax.jit(
        lambda k: jax.random.randint(k, (T * rows, q), 0, 255, jnp.uint8))(key)
    u = jax.jit(lambda k: jax.random.normal(k, (rows,), F32))(key)

    # correctness anchor: small row slice, exact unpack reference
    anchor = 2048
    ref = np.asarray(
        u[:anchor] @ pack2.unpack2(pk_all[:anchor], F32))

    results = {}
    for impl in ("vpu", "mxu", "mxu_split", "mxu_hi"):
        for rt, qt in ((2048, 256), (4096, 256)):
            if rows % rt or q % qt:
                continue
            call = make_scatter_step(impl, rows, q, rt, qt)
            name = f"scatter_{impl} rt={rt} qt={qt}"
            try:
                small = make_scatter_step(impl, anchor, q, min(rt, anchor), qt)
                out = np.asarray(small(pk_all[:anchor], 0, u[:anchor]))
                err = np.abs(out[:4].reshape(-1) - ref).max() / (
                    np.abs(ref).max() + 1e-9)

                @jax.jit
                def full(pk_all, u):
                    def body(acc, t):
                        o = call(pk_all, t, u)
                        return acc + o.reshape(-1)[0], None
                    acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(T))
                    return acc

                t = timeit(full, pk_all, u)
            except Exception as exc:
                print(f"{name}: FAILED {str(exc)[:120]}", flush=True)
                results[name] = None
                continue
            results[name] = t
            results[f"err_{impl} rt={rt} qt={qt}"] = float(err)
            print(f"{name}: {t*1e3:7.2f} ms/pass  {gb/t:6.1f} GB/s  "
                  f"rel_err={err:.2e}", flush=True)

    rec = {"experiment": "micro_scatter_impl", "rows": rows, "q": q, "T": T,
           "date": __import__("datetime").date.today().isoformat(),
           **{k: (round(v * 1e3, 2) if isinstance(v, float) and k.startswith("scatter") else v)
              for k, v in results.items()}}
    with open(os.path.join(HERE, "ladder_results.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
