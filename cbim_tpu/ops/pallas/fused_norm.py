"""Fused InstanceNorm(+activation) Pallas TPU kernels.

Replaces the XLA lowering of the framework's hottest elementwise pattern —
``InstanceNorm -> act`` after every conv (reference model/dim3/conv_layers.py
ConvNormAct with norm='in', the 3D configs' default) — with two
bandwidth-optimal passes:

    stats:  one read of x  -> per-(b, c) mean / rstd      (f32 accumulation)
    apply:  one read of x  -> y = act((x - mean) * rstd)  (one write)

and a custom VJP with the matching two-pass structure (the InstanceNorm
backward needs two data reductions, sum(dy') and sum(dy' * xhat)):

    bwd_stats: reads x, dy -> per-(b, c) sum(dy'), sum(dy' * xhat)
    bwd_apply: reads x, dy -> dx = rstd * (dy' - a - xhat * b)

Measured on v5e (tools/probe_norm_layout.py): the XLA lowering costs
~21 ms per norm+gelu layer fw+bw at (2, 128^3, 32) — ~8x the HBM roofline —
because XLA materializes f32 intermediates at full resolution and transposes
them between the reduce and apply fusions.  These kernels touch x/dy/y once
per pass in their native layout: fw 3 moves, bw 5 moves of the tensor.

Numerics match the unfused path (cbim_tpu/models/layers/convs.py Norm 'in'):
biased variance over spatial dims, f32 statistics, torch InstanceNorm
affine=False semantics, exact-erf GELU.  All math in f32 in-register; x may
be bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# spatial elements processed per grid step (per batch row).  Kept modest:
# C rides the lane dim, so a (block, C<=128) VMEM tile is physically padded
# to 128 lanes and Mosaic double-buffers in/out — 8192 rows OOM'd VMEM.
_BLOCK = 2048


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7 — far below the
    bf16 output precision).  Mosaic has no erf/erfc primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _act_fn(act: Optional[str]):
    if act in (None, "none", False):
        return lambda n: n
    if act == "relu":
        return jax.nn.relu
    if act == "gelu":
        # exact-erf gelu (torch.nn.GELU default); jax.nn.gelu lowers through
        # erfc, which Mosaic doesn't implement
        return lambda n: 0.5 * n * (1.0 + _erf(n * 0.7071067811865476))
    raise ValueError(f"fused_norm: unsupported act {act!r}")


def _act_grad_fn(act: Optional[str]):
    """d act(n) / d n, computed from the pre-activation n."""
    if act in (None, "none", False):
        return lambda n: jnp.ones_like(n)
    if act == "relu":
        return lambda n: (n > 0).astype(n.dtype)
    if act == "gelu":
        # d/dn [n * Phi(n)] = Phi(n) + n * phi(n)
        inv_sqrt2 = 0.7071067811865476
        inv_sqrt2pi = 0.3989422804014327
        return lambda n: (0.5 * (1.0 + _erf(n * inv_sqrt2))
                          + n * inv_sqrt2pi * jnp.exp(-0.5 * n * n))
    raise ValueError(f"fused_norm: unsupported act {act!r}")


def supported_act(act) -> bool:
    return act in (None, "none", False, "relu", "gelu")


def usable(norm_kind, act, C: Optional[int] = None) -> bool:
    """True when the fused kernel should replace the XLA norm(+act) lowering:
    InstanceNorm, a supported (or no) activation, a real TPU backend, and —
    unless CBIM_FUSED_NORM=1 forces it everywhere — a lane-dense channel
    count (C % 128 == 0, e.g. the PatchMerging norms: merged C is 128-1024
    across the MedFormer stages).

    At C=32 a (block, C) tile wastes 3/4 of the 128 lanes in both VMEM and
    HBM tiling and the measured kernel is HBM-bound at ~63 GB/s effective
    (tools/probe_bandwidth.py) — no faster than the XLA lowering it
    replaces — so narrow-C stays opt-in (the cw variant below covers the
    full-res stages instead).  A side benefit at lane-dense C: dx returns in
    x.dtype, keeping the surrounding backward (e.g. the space-to-depth
    transpose) in bf16 instead of the f32 the unfused lowering forces.  On
    CPU the kernel only runs in interpret mode (slow), so the unfused path
    stays the default there — which also keeps the CPU parity suite
    exercising the reference lowering."""
    import os
    if norm_kind != "in" or not supported_act(act):
        return False
    forced = os.environ.get("CBIM_FUSED_NORM", "lane")
    if forced == "1":
        pass                       # force everywhere (narrow C measured no
        #                            faster than XLA; see docstring)
    elif forced == "lane" and C is not None and C % 128 == 0:
        pass                       # DEFAULT: lane-dense sites only —
        #                            measured 2.553 -> 2.624 vols/s/chip at
        #                            step level (bench.py, 2026-08-18);
        #                            CBIM_FUSED_NORM=0 opts out
    else:
        return False
    from .._backend import pallas_gates_on
    return pallas_gates_on()


def _mask(s_idx, block: int, S: int, shape) -> jax.Array:
    """Boolean: row index inside the real extent.  Padded rows of the ragged
    final block may hold garbage (NaN in interpret mode) — callers must
    ``jnp.where`` it out of the *inputs*; multiplying by 0.0 would keep NaN."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return rows + s_idx * block < S


# ----------------------------------------------------------------- forward
def _stats_kernel(x_ref, sums_ref, acc_ref, *, S: int, block: int):
    s = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)                 # (block, C)
    x = jnp.where(_mask(s, block, S, x.shape), x, 0.0)
    acc_ref[0, :] += jnp.sum(x, axis=0)
    acc_ref[1, :] += jnp.sum(x * x, axis=0)

    @pl.when(s == n_s - 1)
    def _():
        sums_ref[0] = acc_ref[:]


def _apply_kernel(x_ref, mean_ref, rstd_ref, y_ref, *, act):
    act_f = _act_fn(act)
    x = x_ref[0].astype(jnp.float32)
    n = (x - mean_ref[0]) * rstd_ref[0]
    y_ref[0] = act_f(n).astype(y_ref.dtype)


# ---------------------------------------------------------------- backward
def _bwd_stats_kernel(x_ref, dy_ref, mean_ref, rstd_ref, sums_ref, acc_ref,
                      *, S: int, block: int, act):
    s = pl.program_id(1)
    n_s = pl.num_programs(1)
    act_g = _act_grad_fn(act)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    m = _mask(s, block, S, x_ref.shape[1:])
    x = jnp.where(m, x_ref[0].astype(jnp.float32), 0.0)   # (block, C)
    dy = jnp.where(m, dy_ref[0].astype(jnp.float32), 0.0)
    xhat = (x - mean_ref[0]) * rstd_ref[0]
    dyp = dy * act_g(xhat)
    acc_ref[0, :] += jnp.sum(dyp, axis=0)
    acc_ref[1, :] += jnp.sum(dyp * xhat, axis=0)

    @pl.when(s == n_s - 1)
    def _():
        sums_ref[0] = acc_ref[:]


def _bwd_apply_kernel(x_ref, dy_ref, mean_ref, rstd_ref, red_ref, dx_ref,
                      *, act):
    act_g = _act_grad_fn(act)
    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    xhat = (x - mean_ref[0]) * rstd_ref[0]
    dyp = dy * act_g(xhat)
    a = red_ref[0, 0:1, :]                            # mean(dy')
    b = red_ref[0, 1:2, :]                            # mean(dy' * xhat)
    dx = rstd_ref[0] * (dyp - a - xhat * b)
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ------------------------------------------------------------------ driver
def _grids(B: int, S: int, C: int):
    # VMEM-scoped budget.  Worst case is the bwd kernels: 2 bf16 input tiles
    # (x, dy) + 1 bf16 output tile, each double-buffered by Mosaic (6 tiles *
    # 2 B/elt = 12 B/elt of buffers), plus ~5 live f32 upcast temps of the
    # tile (x, dy, xhat, dy', dx pre-cast = 20 B/elt of stack) => ~32 B/elt
    # worst case.  The 4 MiB numerator keeps block*C*32B <= 10.7 MiB, under
    # the 16 MB scoped limit with margin (the 6 MiB numerator measured 4 KB
    # OVER the limit at C=512 — the down2 MBConv bwd under CBIM_FUSED_NORM=
    # lane).  A fixed 2048-row block at C=512 would be 32 MB; shrink the
    # block as C grows.
    budget_rows = (4 * 2 ** 20) // (C * 12)
    block = min(_BLOCK, max(8, budget_rows // 8 * 8), max(8, S))
    n_s = pl.cdiv(S, block)
    return block, n_s


def _row_spec(block, C):
    return pl.BlockSpec((1, block, C), lambda b, s: (b, s, 0),
                        memory_space=pltpu.VMEM)


def _stat_spec(C):
    # per-batch stats row, broadcast over the s grid axis
    return pl.BlockSpec((1, 1, C), lambda b, s: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _compute_stats(x3, S, interpret):
    B, _, C = x3.shape
    block, n_s = _grids(B, S, C)
    sums = pl.pallas_call(
        functools.partial(_stats_kernel, S=S, block=block),
        grid=(B, n_s),
        in_specs=[_row_spec(block, C)],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        interpret=interpret,
    )(x3)
    mean = sums[:, 0:1, :] / S
    var = jnp.maximum(sums[:, 1:2, :] / S - mean * mean, 0.0)
    return mean, var


def _forward(x3, eps, act, interpret):
    B, S, C = x3.shape
    block, n_s = _grids(B, S, C)
    mean, var = _compute_stats(x3, S, interpret)
    rstd = jax.lax.rsqrt(var + eps)
    y = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(B, n_s),
        in_specs=[_row_spec(block, C), _stat_spec(C), _stat_spec(C)],
        out_specs=_row_spec(block, C),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        interpret=interpret,
    )(x3, mean, rstd)
    return y, mean, rstd


def _backward(x3, dy3, mean, rstd, act, interpret):
    B, S, C = x3.shape
    block, n_s = _grids(B, S, C)
    sums = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, S=S, block=block, act=act),
        grid=(B, n_s),
        in_specs=[_row_spec(block, C), _row_spec(block, C),
                  _stat_spec(C), _stat_spec(C)],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        interpret=interpret,
    )(x3, dy3, mean, rstd)
    red = sums / S                                    # (B, 2, C) means
    dx = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, act=act),
        grid=(B, n_s),
        in_specs=[_row_spec(block, C), _row_spec(block, C),
                  _stat_spec(C), _stat_spec(C),
                  pl.BlockSpec((1, 2, C), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=_row_spec(block, C),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        interpret=interpret,
    )(x3, dy3, mean, rstd, red)
    return dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _instance_norm_act3(x3, eps, act, interpret):
    y, _, _ = _forward(x3, eps, act, interpret)
    return y


def _inorm_fwd(x3, eps, act, interpret):
    y, mean, rstd = _forward(x3, eps, act, interpret)
    return y, (x3, mean, rstd)


def _inorm_bwd(eps, act, interpret, res, dy3):
    x3, mean, rstd = res
    return (_backward(x3, dy3, mean, rstd, act, interpret),)


_instance_norm_act3.defvjp(_inorm_fwd, _inorm_bwd)


def instance_norm_act(x: jax.Array, eps: float = 1e-4,
                      act: Optional[str] = None,
                      interpret: Optional[bool] = None) -> jax.Array:
    """Fused InstanceNorm (+ optional activation) over a channels-last tensor.

    x: (B, *spatial, C).  Equivalent to the reference's
    ``nn.InstanceNormNd(affine=False)`` followed by the activation
    (conv_layers.py ConvNormAct), with f32 statistics.
    """
    if not supported_act(act):
        raise ValueError(f"unsupported act {act!r}")
    if interpret is None:
        # interpret everywhere except a real TPU backend (axon = tunneled TPU)
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, C = x.shape[0], x.shape[-1]
    spatial = x.shape[1:-1]
    S = 1
    for s in spatial:
        S *= int(s)
    x3 = x.reshape(B, S, C)
    y3 = _instance_norm_act3(x3, float(eps), act, bool(interpret))
    return y3.reshape(x.shape)


# ------------------------------------------------------------ NDHCW variant
#
# The cw stage layout [B, D, H, C, W] is lane-DENSE (W rides the 128 lanes),
# so the same two-pass structure moves exactly the tensor's bytes — unlike
# the NDHWC kernels above, whose (block, C=32) tiles waste 3/4 of each lane
# vreg and measured no faster than XLA (hence the CBIM_FUSED_NORM opt-in).
# This variant is default-ON for cw stages (CBIM_FUSED_NORM_CW=0 opts out).
#
# Layout discipline (the first cut hung Mosaic): no in-kernel lane
# reductions or lane<->sublane relayouts.  The stats kernels accumulate
# per-(b, c, w) partials (2, C, W) — only outer-dim reduces — and the tiny
# final W-fold runs in XLA; mean/rstd ride back in as (B, 2, C, 1) so the
# in-tile broadcast is a native lane-broadcast from a (C, 1) column.

_BLOCK_CW = 16            # s-rows per grid step: (16, C<=128, W=128) bf16 tile


def _grids_cw(S: int):
    block = min(_BLOCK_CW, max(1, S))
    return block, pl.cdiv(S, block)


def _row_spec_cw(block, C, W):
    return pl.BlockSpec((1, block, C, W), lambda b, s: (b, s, 0, 0),
                        memory_space=pltpu.VMEM)


def _sum_spec_cw(C, W):
    # per-batch partial-sum block, revisited across the s grid axis
    return pl.BlockSpec((1, 2, C, W), lambda b, s: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _stat_spec_cw(C):
    return pl.BlockSpec((1, 2, C, 1), lambda b, s: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _mask_cw(s_idx, block: int, S: int, shape) -> jax.Array:
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return rows + s_idx * block < S


def _stats_kernel_cw(x_ref, sums_ref, *, S: int, block: int):
    s = pl.program_id(1)

    x = x_ref[0].astype(jnp.float32)                 # (block, C, W)
    x = jnp.where(_mask_cw(s, block, S, x.shape), x, 0.0)
    p = jnp.stack([jnp.sum(x, axis=0), jnp.sum(x * x, axis=0)])  # (2, C, W)

    @pl.when(s == 0)
    def _():
        sums_ref[0] = p

    @pl.when(s > 0)
    def _():
        sums_ref[0] = sums_ref[0] + p


def _apply_kernel_cw(x_ref, stat_ref, y_ref, *, act):
    act_f = _act_fn(act)
    x = x_ref[0].astype(jnp.float32)                 # (block, C, W)
    mean = stat_ref[0, 0]                            # (C, 1): lane-broadcast
    rstd = stat_ref[0, 1]
    y_ref[0] = act_f((x - mean) * rstd).astype(y_ref.dtype)


def _bwd_stats_kernel_cw(x_ref, dy_ref, stat_ref, sums_ref,
                         *, S: int, block: int, act):
    s = pl.program_id(1)
    act_g = _act_grad_fn(act)

    m = _mask_cw(s, block, S, x_ref.shape[1:])
    x = jnp.where(m, x_ref[0].astype(jnp.float32), 0.0)
    dy = jnp.where(m, dy_ref[0].astype(jnp.float32), 0.0)
    xhat = (x - stat_ref[0, 0]) * stat_ref[0, 1]
    dyp = dy * act_g(xhat)
    p = jnp.stack([jnp.sum(dyp, axis=0), jnp.sum(dyp * xhat, axis=0)])

    @pl.when(s == 0)
    def _():
        sums_ref[0] = p

    @pl.when(s > 0)
    def _():
        sums_ref[0] = sums_ref[0] + p


def _bwd_apply_kernel_cw(x_ref, dy_ref, stat_ref, red_ref, dx_ref, *, act):
    act_g = _act_grad_fn(act)
    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    rstd = stat_ref[0, 1]
    xhat = (x - stat_ref[0, 0]) * rstd
    dyp = dy * act_g(xhat)
    a = red_ref[0, 0]                                 # (C, 1) mean(dy')
    b = red_ref[0, 1]                                 # (C, 1) mean(dy'*xhat)
    dx_ref[0] = (rstd * (dyp - a - xhat * b)).astype(dx_ref.dtype)


def _forward_cw(x4, eps, act, interpret):
    B, S, C, W = x4.shape
    block, n_s = _grids_cw(S)
    sums = pl.pallas_call(
        functools.partial(_stats_kernel_cw, S=S, block=block),
        grid=(B, n_s),
        in_specs=[_row_spec_cw(block, C, W)],
        out_specs=_sum_spec_cw(C, W),
        out_shape=jax.ShapeDtypeStruct((B, 2, C, W), jnp.float32),
        interpret=interpret,
    )(x4)
    n = S * W
    tot = jnp.sum(sums, axis=3)                       # (B, 2, C) — tiny
    mean = tot[:, 0] / n
    var = jnp.maximum(tot[:, 1] / n - mean * mean, 0.0)
    stat = jnp.stack([mean, jax.lax.rsqrt(var + eps)],
                     axis=1)[..., None]               # (B, 2, C, 1)
    y = pl.pallas_call(
        functools.partial(_apply_kernel_cw, act=act),
        grid=(B, n_s),
        in_specs=[_row_spec_cw(block, C, W), _stat_spec_cw(C)],
        out_specs=_row_spec_cw(block, C, W),
        out_shape=jax.ShapeDtypeStruct(x4.shape, x4.dtype),
        interpret=interpret,
    )(x4, stat)
    return y, stat


def _backward_cw(x4, dy4, stat, act, interpret):
    B, S, C, W = x4.shape
    block, n_s = _grids_cw(S)
    sums = pl.pallas_call(
        functools.partial(_bwd_stats_kernel_cw, S=S, block=block, act=act),
        grid=(B, n_s),
        in_specs=[_row_spec_cw(block, C, W), _row_spec_cw(block, C, W),
                  _stat_spec_cw(C)],
        out_specs=_sum_spec_cw(C, W),
        out_shape=jax.ShapeDtypeStruct((B, 2, C, W), jnp.float32),
        interpret=interpret,
    )(x4, dy4, stat)
    red = (jnp.sum(sums, axis=3) / (S * W))[..., None]  # (B, 2, C, 1) means
    dx = pl.pallas_call(
        functools.partial(_bwd_apply_kernel_cw, act=act),
        grid=(B, n_s),
        in_specs=[_row_spec_cw(block, C, W), _row_spec_cw(block, C, W),
                  _stat_spec_cw(C), _stat_spec_cw(C)],
        out_specs=_row_spec_cw(block, C, W),
        out_shape=jax.ShapeDtypeStruct(x4.shape, x4.dtype),
        interpret=interpret,
    )(x4, dy4, stat, red)
    return dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _instance_norm_act4_cw(x4, eps, act, interpret):
    y, _ = _forward_cw(x4, eps, act, interpret)
    return y


def _inorm_cw_fwd(x4, eps, act, interpret):
    y, stat = _forward_cw(x4, eps, act, interpret)
    return y, (x4, stat)


def _inorm_cw_bwd(eps, act, interpret, res, dy4):
    x4, stat = res
    return (_backward_cw(x4, dy4, stat, act, interpret),)


_instance_norm_act4_cw.defvjp(_inorm_cw_fwd, _inorm_cw_bwd)


def usable_cw(norm_kind, act) -> bool:
    """Gate for the cw fused kernel: InstanceNorm + supported (or no) act.
    OPT-IN (CBIM_FUSED_NORM_CW=1), and measured SLOWER at step level: the
    v2 kernel compiles and runs on device (standalone fw 7.4 ms vs ~8 ms
    for the XLA fusions it replaces, tools/probe_newkernels.py) but the
    full MedFormer-128^3 train step regresses 2.553 -> 2.394 vols/s/chip
    with it on — XLA fuses the unfused norm's elementwise tail into the
    neighboring ops, which the kernel boundary forfeits.  Kept for shapes
    where the XLA lowering misbehaves.  No backend condition: off-TPU the
    kernel runs in interpret mode, exercised by tests/test_fused_norm.py."""
    import os
    if norm_kind != "in" or not supported_act(act):
        return False
    from .._backend import pallas_disabled
    if pallas_disabled():
        return False
    return os.environ.get("CBIM_FUSED_NORM_CW", "0") == "1"


def instance_norm_act_cw(x: jax.Array, eps: float = 1e-4,
                         act: Optional[str] = None,
                         interpret: Optional[bool] = None) -> jax.Array:
    """Fused InstanceNorm (+ optional activation) in the NDHCW stage layout.

    x: (B, D, H, C, W) — channels on the second-minor axis, W on lanes (see
    ops/pallas/conv3d.py).  Same math as :func:`instance_norm_act` on the
    transposed tensor: biased variance over (D, H, W), f32 statistics.
    """
    if not supported_act(act):
        raise ValueError(f"unsupported act {act!r}")
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, D, H, C, W = x.shape
    x4 = x.reshape(B, D * H, C, W)
    y4 = _instance_norm_act4_cw(x4, float(eps), act, bool(interpret))
    return y4.reshape(x.shape)
