"""Capture a device trace of the fused multi-sweep program and print the
top ops by total device time (parses the perfetto trace.json.gz).

Run: NB_N=50000 NB_P=73728 NB_V=96 python scripts/prof_sweep.py
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import numpy as np
from jax import lax

from micro_ablate import build  # noqa: E402 (same dir)
import nextgp_tpu as ng


def main():
    n = int(os.environ.get("NB_N", 50000))
    p = int(os.environ.get("NB_P", 73728))
    block = int(os.environ.get("NB_B", 256))
    vshards = int(os.environ.get("NB_V", 96))
    n_sweeps = int(os.environ.get("NB_SWEEPS", 20))

    plan, state = build(n, p, block, vshards, pack2=True)
    sweep = ng.make_sweep(plan)

    def multi(st, key):
        def body(s, _):
            return sweep(s, key), None
        st, _ = lax.scan(body, st, None, length=n_sweeps)
        return st

    step = jax.jit(multi, donate_argnums=0)
    key = jax.random.key(0)
    state = step(state, key)
    float(np.asarray(state.e.var_e))

    log_dir = "/tmp/nextgp_prof"
    os.system(f"rm -rf {log_dir}")
    with jax.profiler.trace(log_dir):
        t0 = time.perf_counter()
        state = step(state, key)
        float(np.asarray(state.e.var_e))
        dt = time.perf_counter() - t0
    print(f"wall: {dt / n_sweeps * 1e3:.2f} ms/sweep", flush=True)

    files = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found; dir contents:")
        os.system(f"find {log_dir} | head -30")
        return
    with gzip.open(files[0], "rt") as fh:
        tr = json.load(fh)
    # aggregate complete events by name across device tracks
    agg = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        agg[name] = agg.get(name, 0.0) + ev.get("dur", 0.0)
    total = sum(agg.values())
    print(f"(total traced op-time {total/1e3:.1f} ms over {n_sweeps} sweeps)")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us / n_sweeps / 1e3:8.3f} ms/sweep  {name[:110]}")


main()
