"""Run bench.py's measurement at several problem shapes in ONE process.

One process = one remote session: on tunneled-TPU environments each new
client can pay a long session-establishment wait, so the scaling ladder
runs all shapes in-process. Usage:

  python scripts/ladder.py "50000x73728" "50000x147456x96x30"

Each arg is NxP[xV[xSWEEPS]]. Results also append to scripts/ladder_results.jsonl.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    shapes = sys.argv[1:] or ["50000x73728", "50000x147456", "50000x294912"]
    import bench

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ladder_results.jsonl")
    for spec in shapes:
        parts = spec.split("x")
        n, p = int(parts[0]), int(parts[1])
        v = parts[2] if len(parts) > 2 else "auto"
        sweeps = int(parts[3]) if len(parts) > 3 else 30
        os.environ["NG_BENCH_N"] = str(n)
        os.environ["NG_BENCH_P"] = str(p)
        os.environ["NG_BENCH_VSHARDS"] = str(v)
        os.environ["NG_BENCH_SWEEPS"] = str(sweeps)
        os.environ.setdefault("NG_BENCH_SMOKE", "0")
        print(f"=== {n} x {p} V={v} sweeps={sweeps} ===", flush=True)
        try:
            record = bench.main()
        except Exception as exc:  # keep the session; move to the next shape
            print(f"# shape {spec} failed: {exc!r}", file=sys.stderr, flush=True)
            continue
        # full parsed result per shape: the README ladder table is
        # regenerable from this file without re-running on the chip
        with open(out_path, "a") as fh:
            fh.write(json.dumps({"shape": spec, **(record or {})}) + "\n")


if __name__ == "__main__":
    main()
