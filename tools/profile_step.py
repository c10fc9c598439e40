#!/usr/bin/env python
"""Profile the bench train step on the real TPU and aggregate device-op time
by (source line, op kind).  Uses the recipe from ROUND1_NOTES.md: trace via
jax.profiler, parse the .xplane.pb with tensorflow's profiler protos if
available, else fall back to the trace-event JSON inside the trace dir.

Usage:  python tools/profile_step.py [steps]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    batch = int(os.environ.get("BENCH_BATCH", 2))
    cfg, pipeline, state, train_step = bench.build(batch)
    lr = 1e-3

    # warm up (compile)
    for _ in range(2):
        img, lab = pipeline.next_batch(batch)
        state, loss = train_step(state, img, lab, lr)
        np.asarray(loss)  # force readback: block_until_ready doesn't sync on axon

    trace_dir = "/tmp/tpu_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            img, lab = pipeline.next_batch(batch)
            state, loss = train_step(state, img, lab, lr)
        np.asarray(loss)

    # find trace.json.gz produced by the profiler
    candidates = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not candidates:
        print("no trace.json.gz found; files:", file=sys.stderr)
        for f in glob.glob(f"{trace_dir}/**/*", recursive=True):
            print("  ", f, file=sys.stderr)
        return
    with gzip.open(candidates[0], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # keep device-thread complete events (they carry HLO long_name + source)
    by_key = defaultdict(float)
    by_op = defaultdict(lambda: [0.0, 0, "", ""])   # dur, count, shape, src
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        long = args.get("long_name") or args.get("hlo_op") or ""
        if not long and "tf_op" not in args:
            continue
        dur = float(e.get("dur", 0.0))  # us
        name = e.get("name", "?")
        src = args.get("source", "")
        if src.startswith("/root/repo/"):
            src = src[len("/root/repo/"):]
        kind = name.split(".")[0].split("(")[0]
        by_key[(src, kind)] += dur
        opname = args.get("deduplicated_name", name)
        rec = by_op[opname]
        rec[0] += dur
        rec[1] += 1
        rec[2] = args.get("shape_with_layout", "")[:60]
        rec[3] = f'{src} [{args.get("tf_op", "")[:60]}]'
        total += dur

    rows = sorted(by_key.items(), key=lambda kv: -kv[1])
    print(f"total device time: {total/1e3:.1f} ms over {steps} steps "
          f"({total/1e3/steps:.1f} ms/step)")
    print(f"{'us':>12}  {'%':>5}  source / kind")
    for (src, kind), dur in rows[:45]:
        print(f"{dur:12.0f}  {100*dur/total:5.1f}  {src:<44} {kind}")

    print("\ntop individual ops:")
    print(f"{'us':>12}  {'%':>5}  {'n':>4}  op / shape / source")
    for opname, (dur, cnt, shape, src) in sorted(
            by_op.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{dur:12.0f}  {100*dur/total:5.1f}  {cnt:>4}  {opname:<28} "
              f"{shape:<48} {src}")


if __name__ == "__main__":
    main()
