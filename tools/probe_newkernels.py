"""Post-outage on-device verification of the kernels built while the TPU
tunnel was down.  Runs each in its own jit, SMALLEST SHAPE FIRST and one at
a time, so a Mosaic compile hang is attributable to a single kernel (and
the process can be left to finish rather than killed — killing a client
mid-remote-compile is what wedged the tunnel on 2026-08-17).

Order:
  1. cw fused InstanceNorm+act v2 (fw, then bw)           [fused_norm cw]
  2. NDHWC fused InstanceNorm at lane-dense C             [usable 'lane']
  3. NDHWC halo conv + wgrad (CBIM_PLHALO path)           [conv3d halo]
  4. cw2 forward / dgrad / wgrad                          [conv3d cw2]
  5. conv2d tap-packed fw + vjp                           [conv2d]
then big-shape timings for whichever passed.

Run:  python tools/probe_newkernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


FAILED = []


def step(name, fn):
    t0 = time.time()
    print(f"[{name}] compiling...", flush=True)
    try:
        out = fn()
        _sync(out)
    except Exception as e:
        FAILED.append(name)
        msg = str(e).splitlines()
        print(f"[{name}] FAILED ({time.time() - t0:.1f}s): "
              f"{msg[0] if msg else e!r}", flush=True)
        return None
    print(f"[{name}] OK ({time.time() - t0:.1f}s)", flush=True)
    return out


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    from cbim_tpu.ops.pallas import fused_norm
    from cbim_tpu.ops.pallas.conv3d import (_conv3d_same_pallas, conv3d_wgrad,
                                            conv3d_same_cw, conv3d_same_cw2,
                                            conv3d_wgrad_cw2)
    from cbim_tpu.ops.pallas.conv2d import conv2d_same, conv2d_same_t

    bf = jnp.bfloat16
    x_small_cw = jnp.asarray(rng.normal(size=(1, 4, 8, 32, 128))
                             ).astype(bf)

    # 1. cw fused norm v2
    step("cwnorm-fw", lambda: fused_norm.instance_norm_act_cw(
        x_small_cw, act="relu"))
    step("cwnorm-bw", lambda: jax.grad(
        lambda t: jnp.sum(fused_norm.instance_norm_act_cw(t, act="gelu")
                          .astype(jnp.float32) ** 2))(x_small_cw))

    # 2. NDHWC fused norm at lane-dense C
    x_nhwc128 = jnp.asarray(rng.normal(size=(1, 4, 8, 16, 128))).astype(bf)
    step("nhwc-norm-fw", lambda: fused_norm.instance_norm_act(
        x_nhwc128, act="relu"))
    step("nhwc-norm-bw", lambda: jax.grad(
        lambda t: jnp.sum(fused_norm.instance_norm_act(t, act="gelu")
                          .astype(jnp.float32) ** 2))(x_nhwc128))

    # 3. NDHWC halo conv
    w128 = (jnp.asarray(rng.normal(size=(3, 3, 3, 128, 32))) * 0.1).astype(bf)
    step("halo-conv", lambda: _conv3d_same_pallas(
        x_nhwc128, w128, interpret=False, halo=True))
    g32 = jnp.asarray(rng.normal(size=(1, 4, 8, 16, 32))).astype(bf)
    step("halo-wgrad", lambda: conv3d_wgrad(x_nhwc128, g32, halo=True))

    # 4. cw2
    w32 = (jnp.asarray(rng.normal(size=(3, 3, 3, 32, 32))) * 0.1).astype(bf)
    step("cw2-fw", lambda: conv3d_same_cw2(x_small_cw, w32))
    g_cw = jnp.asarray(rng.normal(size=(1, 4, 8, 32, 128))).astype(bf)
    step("cw2-wgrad", lambda: conv3d_wgrad_cw2(x_small_cw, g_cw))

    # 5. conv2d
    x2 = jnp.asarray(rng.normal(size=(2, 16, 128, 32))).astype(bf)
    w2 = (jnp.asarray(rng.normal(size=(3, 3, 32, 32))) * 0.1).astype(bf)
    step("conv2d-fw", lambda: conv2d_same(x2, w2))
    step("conv2d-vjp", lambda: jax.grad(
        lambda xx, ww: jnp.sum(conv2d_same_t(xx, ww).astype(jnp.float32)
                               ** 2), argnums=(0, 1))(x2, w2))

    print(f"\nsmall-shape pass done (failed: {FAILED or 'none'}). "
          "big-shape timings:", flush=True)

    big_cw = jnp.asarray(rng.normal(size=(2, 128, 128, 32, 128))).astype(bf)

    def timing(name, fn):
        try:
            print(f"  {name}: {fn()}", flush=True)
        except Exception as e:
            msg = str(e).splitlines()
            print(f"  {name}: FAILED: {msg[0] if msg else e!r}", flush=True)

    f_norm = jax.jit(lambda t: fused_norm.instance_norm_act_cw(t, act="gelu"))
    timing("cw norm fw (2,128^3,32) [XLA was ~8 ms/layer fw]",
           lambda: f"{timeit(f_norm, big_cw):.2f} ms")

    f_cw = jax.jit(conv3d_same_cw)
    f_cw2 = jax.jit(conv3d_same_cw2)
    wb = (jnp.asarray(rng.normal(size=(3, 3, 3, 32, 32))) * 0.1).astype(bf)

    def cw_vs_cw2():
        y1 = f_cw(big_cw, wb)
        y2 = f_cw2(big_cw, wb)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                    - y2.astype(jnp.float32))))
        return (f"{timeit(f_cw, big_cw, wb):.2f} vs "
                f"{timeit(f_cw2, big_cw, wb):.2f} ms  max|d|={err:.2e}")

    timing("cw vs cw2 fw (2,128^3,C32->F32)", cw_vs_cw2)

    gb = jnp.asarray(rng.normal(size=(2, 128, 128, 32, 128))).astype(bf)
    from cbim_tpu.ops.pallas.conv3d import conv3d_wgrad_cw
    f_wg = jax.jit(conv3d_wgrad_cw)
    f_wg2 = jax.jit(conv3d_wgrad_cw2)

    def wg_parity():
        # cw2 wgrad is the training default (CBIM_WGRAD_CW2); interpret-mode
        # parity tests don't exercise the Mosaic lowering, so check on device.
        d1 = f_wg(big_cw, gb).astype(jnp.float32)
        d2 = f_wg2(big_cw, gb).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(d1 - d2)))
        rel = err / max(float(jnp.max(jnp.abs(d1))), 1e-9)
        return f"max|d|={err:.2e} (rel {rel:.2e})"

    timing("wgrad cw vs cw2 parity", wg_parity)
    timing("wgrad cw", lambda: f"{timeit(f_wg, big_cw, gb):.2f} ms")
    timing("wgrad cw2", lambda: f"{timeit(f_wg2, big_cw, gb):.2f} ms")


if __name__ == "__main__":
    main()
