#!/usr/bin/env python
"""Probe the tiled affine-resample gather at different x-tile widths.

The gather row is 4*2*T*(C+1) lanes; T=8 (256 B rows at C=1 bf16) was the
round-1 default.  Smaller T fetches fewer wasted lanes per output voxel —
if the gather is byte-bound this is a direct win; if it is row-rate-bound
it changes nothing.  Run on the real chip:

    python tools/probe_aug_tile.py [--tiles 4,8,16] [--iters 10]

Spawns one subprocess per tile width (the constant is read at import).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %r)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from cbim_tpu.ops import resample

B, S, O = 4, 158, 128
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, S, S, S, 1).astype(np.float32), jnp.bfloat16)
lab = jnp.asarray(rng.randint(0, 16, (B, S, S, S)), jnp.int32)
th = np.tile(np.eye(3, 4, dtype=np.float32), (B, 1, 1))
th[:, :, :3] += rng.uniform(-0.2, 0.2, (B, 3, 3)).astype(np.float32)
th = jnp.asarray(th)

f = jax.jit(lambda i, l, t: resample.affine_sample_3d_batch(
    i, l, t, out_shape=(O, O, O), num_classes=16))
io, lo = f(img, lab, th)
np.asarray(lo[0, 0, 0, :1])        # sync (axon needs a readback)
iters = int(os.environ.get("ITERS", 10))
t0 = time.perf_counter()
for _ in range(iters):
    io, lo = f(img, lab, th)
np.asarray(lo[0, 0, 0, :1])
dt = (time.perf_counter() - t0) / iters
print(f"T={resample._TILE}: {dt*1e3:.2f} ms   checksum={float(jnp.sum(io.astype(jnp.float32))):.2f} {int(jnp.sum(lo))}",
      flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="4,8,16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    for t in args.tiles.split(","):
        env = dict(os.environ, CBIM_AUG_TILE=t, ITERS=str(args.iters))
        r = subprocess.run([sys.executable, "-c", CHILD % REPO], env=env,
                           capture_output=True, text=True, timeout=1800)
        out = [l for l in (r.stdout + r.stderr).splitlines()
               if l.startswith("T=") or "Error" in l]
        print("\n".join(out) if out else f"T={t}: FAILED\n{r.stderr[-500:]}")


if __name__ == "__main__":
    main()
