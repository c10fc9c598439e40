"""Dimension-generic convolutional building blocks (Flax, channels-last).

TPU-first re-design of the reference's block library
(model/dim3/conv_layers.py and model/dim2/conv_layers.py): one implementation
serves 2D and 3D — the spatial rank is inferred from the input, layouts are
channels-last (NHWC / NDHWC, the native TPU conv layout), and mixed precision
is expressed through Flax's ``dtype`` (bf16 compute) / ``param_dtype`` (fp32
params) convention instead of autocast.

Semantics parity notes (verified by tests/test_models.py param-count and
forward-parity tests):
- explicit symmetric padding k//2 (torch Conv default-style), not XLA 'SAME'
- norm: 'bn' (BatchNorm, eps 1e-4, torch momentum 0.1), 'in' (InstanceNorm,
  affine=False like torch's default), 'ln' (channel-dim LayerNorm — the
  reference's channels-first LayerNorm normalizes over C only)
- act: relu / relu6 / gelu (exact erf, like torch.nn.GELU) / silu / lrelu
- conv/linear weights use torch's kaiming-uniform(a=sqrt(5)) fan-in init so
  training dynamics match the reference
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.activations import fast_gelu as _fast_gelu
from ...ops.depthwise import usable as _dw_usable

KernelArg = Union[int, Sequence[int]]

#: torch Conv/Linear default init: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _tuple(v: KernelArg, n: int) -> tuple:
    if isinstance(v, int):
        return (v,) * n
    return tuple(int(t) for t in v)


def get_act(name) -> Callable:
    if name in (None, False):
        return lambda x: x
    if callable(name):
        return name
    return {
        "relu": jax.nn.relu,
        "relu6": jax.nn.relu6,
        # exact-form GELU; bf16 inputs take the exp/division-free polynomial
        # erf (ops/activations.py — identical to ~1.3e-6, far under bf16 ulp)
        "gelu": _fast_gelu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "lrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
        "sigmoid": jax.nn.sigmoid,
        "prelu": jax.nn.relu,  # placeholder; PReLU is a module (see vnet.py)
        "elu": jax.nn.elu,
    }[name]


class Norm(nn.Module):
    """Config-selected normalization over a channels-last tensor.

    ``cw=True`` marks the NDHCW stage layout (channels on the second-minor
    axis, W minor — see _stage_cw_ok): only InstanceNorm supports it natively
    (its reduction is over the spatial axes, wherever they live)."""
    kind: Any = "bn"           # 'bn' | 'in' | 'ln' | None/False
    eps: float = 1e-4
    dtype: Any = jnp.float32
    cw: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind in (None, False):
            return x
        if self.cw and self.kind != "in":
            raise ValueError("cw layout supports InstanceNorm only")
        if self.kind == "bn":
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=self.eps, dtype=self.dtype)(x)
        if self.kind == "in":
            # torch InstanceNorm default: affine=False, no running stats,
            # biased variance over spatial dims per sample/channel.
            from ...ops.pallas import fused_norm
            if not self.cw and fused_norm.usable("in", None, x.shape[-1]):
                # bandwidth-optimal Pallas lowering on TPU (2 reads + 1 write;
                # the XLA lowering materializes/transposes f32 intermediates)
                return fused_norm.instance_norm_act(x, eps=self.eps, act=None)
            if self.cw and x.ndim == 5 and fused_norm.usable_cw("in", None):
                return fused_norm.instance_norm_act_cw(x, eps=self.eps,
                                                       act=None)
            if self.cw:
                spatial_axes = tuple(range(1, x.ndim - 2)) + (x.ndim - 1,)
            else:
                spatial_axes = tuple(range(1, x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=spatial_axes, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=spatial_axes, keepdims=True)
            return ((x32 - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        if self.kind == "ln":
            # the reference's channels-first LayerNorm == LN over C only
            return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype)(x)
        raise ValueError(f"unknown norm {self.kind!r}")


class _PallasConv3x3(nn.Module):
    """Drop-in for nn.Conv(3^3, stride 1, SAME) computed by the tap-packed
    Pallas kernel (ops/pallas/conv3d.py).  Same parameter tree as nn.Conv
    (scope name set by the caller, params 'kernel'/'bias') so checkpoints
    and torch transplants work unchanged."""
    out_ch: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ...ops.pallas.conv3d import conv3d_same_t
        kernel = self.param("kernel", torch_conv_init,
                            (3, 3, 3, x.shape[-1], self.out_ch), jnp.float32)
        y = conv3d_same_t(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class _PallasConvCW(nn.Module):
    """NDHCW twin of _PallasConv3x3: x[B,D,H,C,W] -> y[B,D,H,F,W] through the
    dense channels-on-sublanes Pallas kernel (ops/pallas/conv3d.py
    conv3d_same_cw_t).  Same parameter tree as nn.Conv."""
    out_ch: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os
        from ...ops.pallas.conv3d import conv3d_same_cw_t, conv3d_same_cw2_t
        conv = (conv3d_same_cw2_t
                if os.environ.get("CBIM_CW2", "0") == "1" else
                conv3d_same_cw_t)
        kernel = self.param("kernel", torch_conv_init,
                            (3, 3, 3, x.shape[3], self.out_ch), jnp.float32)
        y = conv(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)[:, None]
        return y


class _SplitConvCW(nn.Module):
    """NDHCW 3^3 conv over a CHANNEL-SPLIT input: ``parts`` are cw tensors
    [B,D,H,C_i,W] whose virtual concat along C is the conv input.

    conv(concat(a, b)) == conv_a(a) + conv_b(b) with the kernel sliced along
    its input-channel axis, so the wide concat tensor (e.g. the 96-ch
    128^3 decoder entry, ~1.6 GB at batch 4) never materializes in HBM.
    The single ``kernel`` param keeps the exact nn.Conv/_PallasConvCW tree
    (same shape, same init fan-in), so checkpoints and torch transplants are
    unchanged."""
    out_ch: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, parts):
        import os
        from ...ops.pallas.conv3d import conv3d_same_cw_t, conv3d_same_cw2_t
        conv = (conv3d_same_cw2_t
                if os.environ.get("CBIM_CW2", "0") == "1" else
                conv3d_same_cw_t)
        cs = [p.shape[3] for p in parts]
        kernel = self.param("kernel", torch_conv_init,
                            (3, 3, 3, sum(cs), self.out_ch), jnp.float32)
        y = None
        off = 0
        for p, c in zip(parts, cs):
            kk = jax.lax.slice_in_dim(kernel, off, off + c, axis=3)
            t = conv(p.astype(self.dtype), kk.astype(self.dtype))
            y = t if y is None else y + t
            off += c
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)[:, None]
        return y


class _PallasConvCWNA(nn.Module):
    """Fused preact ConvNormAct in NDHCW layout: one Pallas program computes
    conv3x3(act(instance_norm(x))) with the norm+act applied per-tile in
    VMEM, so the normed tensor never exists in HBM (ops/pallas/conv3d.py
    conv_inorm_act_cw_t).  Same parameter tree as nn.Conv (the InstanceNorm
    is affine-free, so dropping the Norm module changes no params)."""
    out_ch: int
    act: Any = None
    eps: float = 1e-4
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ...ops.pallas.conv3d import conv_inorm_act_cw_t
        kernel = self.param("kernel", torch_conv_init,
                            (3, 3, 3, x.shape[3], self.out_ch), jnp.float32)
        y = conv_inorm_act_cw_t(x.astype(self.dtype),
                                kernel.astype(self.dtype), self.eps,
                                self.act if self.act not in (None, False)
                                else None)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)[:, None]
        return y


class _DepthwiseTapConv(nn.Module):
    """Drop-in for nn.Conv(features=C, feature_group_count=C, SAME, stride 1)
    computed as an explicit tap-sum (ops/depthwise.py) — the TPU grouped-conv
    lowering's backward emits per-group custom calls measured at ~13 ms each
    at the flagship MBConv shapes; the tap-sum form fuses to one stencil loop
    fw and bw.  Same parameter tree as nn.Conv (params 'kernel'/'bias', the
    grouped kernel shape (*k, 1, C), same fan-in init), so checkpoints and
    torch transplants are unchanged."""
    kernel_size: tuple
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ...ops.depthwise import depthwise_conv
        C = x.shape[-1]
        kernel = self.param("kernel", torch_conv_init,
                            (*self.kernel_size, 1, C), jnp.float32)
        y = depthwise_conv(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def _pallas_cw_usable(x, nd, k, s, d, p, groups, out_ch) -> bool:
    """Dispatch gate for the NDHCW Pallas conv (x is [B, D, H, C, W]).
    Unlike the NDHWC gate this does not depend on the backend: the caller
    (_stage_cw_ok) already decided the stage runs in cw layout."""
    import os
    from ...ops.pallas.conv3d import _D_BLK
    if os.environ.get("CBIM_PLCONV", "1") == "0":
        return False
    if nd != 3 or k != (3, 3, 3) or s != (1, 1, 1) or d != (1, 1, 1) \
            or p != (1, 1, 1) or groups != 1:
        return False
    B, D, H, C, W = x.shape
    if C > 128 or out_ch > 128 or C % 8 or out_ch % 8:
        return False
    h_need = 8 if max(C, out_ch) <= 64 else 4   # dgrad runs with F=C
    if D % _D_BLK or H % h_need or W % 8:
        return False
    return True


def _stage_cw_ok(x, norm, kernel_size, force: bool = False) -> bool:
    """Should this conv-block stage run in the NDHCW layout?

    The stage layout is worth the two boundary transposes only when (a) the
    tensors are lane-padded in NDHWC (C < 128) so the dense layout cuts HBM
    traffic, and (b) the Pallas cw kernels can carry the stride-1 3^3 convs.
    x is the stage input in NDHWC.  ``force`` bypasses the backend gate for
    tests (kernels fall back to interpret mode off-TPU)."""
    import os
    if os.environ.get("CBIM_CW", "1") == "0":
        return False
    force = force or os.environ.get("CBIM_CW_FORCE") == "1"
    if x.ndim != 5 or norm != "in":
        return False
    k = _tuple(kernel_size, 3)
    if k != (3, 3, 3):
        return False
    B, D, H, W, C = x.shape
    if C >= 128:            # already lane-dense; transposes would be pure cost
        return False
    if W % 128:             # W rides the lanes in cw: partial fill would just
        return False        # trade lane padding on C for lane padding on W
    if D % 2 or H % 8:
        return False
    from ...ops._backend import pallas_disabled, pallas_gates_on
    if pallas_disabled():      # spatial sharding active: force cannot bypass
        return False
    if not force and not pallas_gates_on():
        return False
    return True


class _PallasConv3x3_2D(nn.Module):
    """2D twin of _PallasConv3x3: nn.Conv(3x3, stride 1, SAME) via the
    tap-packed conv2d kernels (ops/pallas/conv2d.py).  Same parameter tree
    as nn.Conv."""
    out_ch: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ...ops.pallas.conv2d import conv2d_same_t
        kernel = self.param("kernel", torch_conv_init,
                            (3, 3, x.shape[-1], self.out_ch), jnp.float32)
        y = conv2d_same_t(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def _pallas_conv2d_usable(x, nd, k, s, d, p, groups, out_ch) -> bool:
    """Dispatch gate for the tap-packed 2D conv.  OPT-IN (CBIM_PLCONV2D=1):
    interpret-parity tested but not yet measured on a real TPU."""
    import os
    if os.environ.get("CBIM_PLCONV2D") != "1":
        return False
    if nd != 2 or k != (3, 3) or s != (1, 1) or d != (1, 1) \
            or p != (1, 1) or groups != 1:
        return False
    if x.shape[-1] > 192 or out_ch > 192:
        return False
    B, H, W, _ = x.shape
    if H % 8 or W % 8:
        return False
    from ...ops._backend import pallas_gates_on
    return pallas_gates_on()


def _pallas_conv_usable(x, nd, k, s, d, p, groups, out_ch, train) -> bool:
    """Pallas conv dispatch: 3D, 3^3/stride-1/SAME, channel widths within the
    kernel's VMEM budget, tile divisibility, TPU backend.  Default ON (the
    kernel is parity-tested fw+bw); CBIM_PLCONV=0 disables, and
    CBIM_PLCONV_TRAIN=0 disables just the training path (Pallas forward +
    dgrad, XLA wgrad — conv3d_same_t).  Measured: +15% train throughput on
    MedFormer-AMOS 128^3 (docs/benchmarks.md)."""
    import os
    from ...ops.pallas.conv3d import _D_BLK, _H_BLK
    if os.environ.get("CBIM_PLCONV", "1") == "0":
        return False
    if train and os.environ.get("CBIM_PLCONV_TRAIN", "1") == "0":
        return False
    if nd != 3 or k != (3, 3, 3) or s != (1, 1, 1) or d != (1, 1, 1) \
            or p != (1, 1, 1) or groups != 1:
        return False
    if x.shape[-1] > 192 or out_ch > 128:
        # (the adaptive h tile in conv3d_same keeps wide-F partials within
        # the VMEM budget; in_ch up to 192 covers the decoder concat entry
        # convs whose XLA lowering drags {4,0,3,2,1} layout copies around)
        return False
    B, D, H, W, _ = x.shape
    if D % _D_BLK or H % _H_BLK or W % 8:
        return False
    from ...ops._backend import pallas_gates_on
    return pallas_gates_on()


class ConvNormAct(nn.Module):
    """conv + norm + act, pre- or post-activated (conv_layers.py:16-53)."""
    out_ch: int
    kernel_size: KernelArg = 3
    stride: KernelArg = 1
    padding: KernelArg | None = None     # None -> k//2 per axis
    groups: int = 1
    dilation: KernelArg = 1
    use_bias: bool = False
    norm: Any = "bn"
    act: Any = "relu"
    preact: bool = False
    dtype: Any = jnp.float32
    cw: bool = False           # input/output in NDHCW (see _stage_cw_ok)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...ops.pallas import fused_norm as _fn
        if isinstance(x, (tuple, list)):
            # channel-split input (see _SplitConvCW): norm+act commute with
            # the virtual channel concat because InstanceNorm stats are
            # per-channel and the act is elementwise; preact order means the
            # conv consumes act(norm(part)) per part.  Only valid for the
            # param-free 'in' norm (BatchNorm would fork running stats).
            assert self.preact and self.norm == "in" and self.cw \
                and self.groups == 1, "split entry: preact cw InstanceNorm only"
            nd_s = x[0].ndim - 2
            assert _tuple(self.kernel_size, nd_s) == (3, 3, 3) \
                and _tuple(self.stride, nd_s) == (1, 1, 1)
            eps_s = 1e-4
            parts = []
            for t in x:
                if t.ndim == 5 and _fn.usable_cw(self.norm, self.act):
                    parts.append(_fn.instance_norm_act_cw(t, eps=eps_s,
                                                          act=self.act))
                else:
                    t = Norm(self.norm, eps=eps_s, dtype=self.dtype,
                             cw=True)(t, train)
                    parts.append(get_act(self.act)(t))
            return _SplitConvCW(self.out_ch, use_bias=self.use_bias,
                                dtype=self.dtype, name="Conv_0")(tuple(parts))
        nd = x.ndim - 2
        k = _tuple(self.kernel_size, nd)
        s = _tuple(self.stride, nd)
        d = _tuple(self.dilation, nd)
        if self.padding is None:
            p = tuple(ki // 2 for ki in k)
        else:
            p = _tuple(self.padding, nd)
        # reference dim3 ConvNormAct passes eps=1e-4 (conv_layers.py:40-42);
        # the dim2 twin relies on the torch default 1e-5
        eps = 1e-4 if nd == 3 else 1e-5
        from ...ops.pallas import fused_norm
        if self.cw:
            cw_ok = _pallas_cw_usable(x, nd, k, s, d, p, self.groups,
                                      self.out_ch)
            import os
            if (cw_ok and self.preact and self.norm == "in"
                    and fused_norm.supported_act(self.act)
                    and os.environ.get("CBIM_CONV_NA", "0") == "1"):
                # whole preact ConvNormAct as ONE fused program (opt-in
                # until step-level measured; see conv_inorm_act_cw_t)
                return _PallasConvCWNA(self.out_ch, act=self.act, eps=eps,
                                       use_bias=self.use_bias,
                                       dtype=self.dtype, name="Conv_0")(x)
            if cw_ok:
                conv = _PallasConvCW(self.out_ch, use_bias=self.use_bias,
                                     dtype=self.dtype, name="Conv_0")
            else:
                # transpose island: XLA conv in NDHWC for shapes the cw
                # kernel does not carry (e.g. the wide concat entry conv)
                xla = nn.Conv(self.out_ch, kernel_size=k, strides=s,
                              padding=[(pi, pi) for pi in p],
                              kernel_dilation=d,
                              feature_group_count=self.groups,
                              use_bias=self.use_bias,
                              kernel_init=torch_conv_init, dtype=self.dtype)
                conv = lambda t: jnp.transpose(
                    xla(jnp.transpose(t, (0, 1, 2, 4, 3))), (0, 1, 2, 4, 3))
        elif _pallas_conv_usable(x, nd, k, s, d, p, self.groups, self.out_ch,
                                 train):
            # tap-packed Pallas conv (trainable: custom VJP); name matches
            # nn.Conv's auto scope so the variables dict is interchangeable
            # with the XLA path (docs/benchmarks.md for measured wins)
            conv = _PallasConv3x3(self.out_ch, use_bias=self.use_bias,
                                  dtype=self.dtype, name="Conv_0")
        elif _pallas_conv2d_usable(x, nd, k, s, d, p, self.groups,
                                   self.out_ch):
            conv = _PallasConv3x3_2D(self.out_ch, use_bias=self.use_bias,
                                     dtype=self.dtype, name="Conv_0")
        elif (self.groups == x.shape[-1] == self.out_ch
              and p == tuple(ki // 2 for ki in k) and _dw_usable(k, s, d)):
            # pure depthwise (MBConv's expanded 3^d conv): tap-sum fast path
            conv = _DepthwiseTapConv(k, use_bias=self.use_bias,
                                     dtype=self.dtype, name="Conv_0")
        else:
            conv = nn.Conv(self.out_ch, kernel_size=k, strides=s,
                           padding=[(pi, pi) for pi in p], kernel_dilation=d,
                           feature_group_count=self.groups,
                           use_bias=self.use_bias,
                           kernel_init=torch_conv_init, dtype=self.dtype)
        norm_c = x.shape[-1] if self.preact else self.out_ch
        if not self.cw and fused_norm.usable(self.norm, self.act, norm_c):
            # one fused InstanceNorm+act kernel instead of norm -> act
            if self.preact:
                return conv(fused_norm.instance_norm_act(x, eps=eps,
                                                         act=self.act))
            return fused_norm.instance_norm_act(conv(x), eps=eps,
                                                act=self.act)
        if self.cw and x.ndim == 5 and fused_norm.usable_cw(self.norm,
                                                            self.act):
            # lane-dense cw twin: one fused InstanceNorm+act kernel
            if self.preact:
                return conv(fused_norm.instance_norm_act_cw(x, eps=eps,
                                                            act=self.act))
            return fused_norm.instance_norm_act_cw(conv(x), eps=eps,
                                                   act=self.act)
        norm = Norm(self.norm, eps=eps, dtype=self.dtype, cw=self.cw)
        act = get_act(self.act)
        if self.preact:
            return conv(act(norm(x, train)))
        return act(norm(conv(x), train))


class SingleConv(nn.Module):
    """conv_layers.py:56-68 — one post-activated ConvNormAct."""
    out_ch: int
    kernel_size: KernelArg = 3
    stride: KernelArg = 1
    norm: Any = "bn"
    act: Any = "relu"
    preact: bool = False
    dtype: Any = jnp.float32
    cw: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvNormAct(self.out_ch, self.kernel_size, self.stride,
                           norm=self.norm, act=self.act, preact=self.preact,
                           dtype=self.dtype, cw=self.cw)(x, train)


class BasicBlock(nn.Module):
    """conv_layers.py:71-94 — preact residual block (2 convs + shortcut)."""
    out_ch: int
    kernel_size: KernelArg = 3
    stride: KernelArg = 1
    norm: Any = "bn"
    act: Any = "relu"
    preact: bool = True
    dtype: Any = jnp.float32
    cw: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        split = isinstance(x, (tuple, list))
        x0 = x[0] if split else x
        nd = x0.ndim - 2
        ch_ax = 3 if self.cw else -1
        in_ch = (sum(t.shape[ch_ax] for t in x) if split
                 else x.shape[ch_ax])
        out = ConvNormAct(self.out_ch, self.kernel_size, self.stride,
                          norm=self.norm, act=self.act, preact=self.preact,
                          dtype=self.dtype, cw=self.cw)(x, train)
        out = ConvNormAct(self.out_ch, self.kernel_size, 1,
                          norm=self.norm, act=self.act, preact=self.preact,
                          dtype=self.dtype, cw=self.cw)(out, train)
        stride = _tuple(self.stride, nd)
        if any(s != 1 for s in stride) or in_ch != self.out_ch:
            shortcut = ConvNormAct(self.out_ch, self.kernel_size, self.stride,
                                   norm=self.norm, act=self.act, preact=self.preact,
                                   dtype=self.dtype, cw=self.cw)(x, train)
        else:
            assert not split, "split entry requires a conv shortcut"
            shortcut = x
        return out + shortcut


class Bottleneck(nn.Module):
    """conv_layers.py:97-123 — 1-k-1 preact bottleneck, expansion 2."""
    out_ch: int
    kernel_size: KernelArg = 3
    stride: KernelArg = 1
    groups: int = 1
    dilation: KernelArg = 1
    norm: Any = "bn"
    act: Any = "relu"
    preact: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        in_ch = x.shape[-1]
        mid = self.out_ch // 2
        out = ConvNormAct(mid, 1, 1, padding=0, norm=self.norm, act=self.act,
                          preact=self.preact, dtype=self.dtype)(x, train)
        out = ConvNormAct(mid, self.kernel_size, self.stride, groups=self.groups,
                          dilation=self.dilation, norm=self.norm, act=self.act,
                          preact=self.preact, dtype=self.dtype)(out, train)
        out = ConvNormAct(self.out_ch, 1, 1, padding=0, norm=self.norm,
                          act=self.act, preact=self.preact, dtype=self.dtype)(out, train)
        stride = _tuple(self.stride, nd)
        if any(s != 1 for s in stride) or in_ch != self.out_ch:
            shortcut = ConvNormAct(self.out_ch, self.kernel_size, self.stride,
                                   norm=self.norm, act=self.act, preact=self.preact,
                                   dtype=self.dtype)(x, train)
        else:
            shortcut = x
        return out + shortcut


class DepthwiseSeparableConv(nn.Module):
    """conv_layers.py:126-157 — depthwise conv + pointwise conv, no norm/act."""
    out_ch: int
    kernel_size: KernelArg = 3
    stride: KernelArg = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        in_ch = x.shape[-1]
        k = _tuple(self.kernel_size, nd)
        s = _tuple(self.stride, nd)
        p = [(ki // 2, ki // 2) for ki in k]
        if _dw_usable(k, s, None):
            x = _DepthwiseTapConv(k, use_bias=self.use_bias,
                                  dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(in_ch, kernel_size=k, strides=s, padding=p,
                        feature_group_count=in_ch, use_bias=self.use_bias,
                        kernel_init=torch_conv_init, dtype=self.dtype,
                        name="Conv_0")(x)
        x = nn.Conv(self.out_ch, kernel_size=(1,) * nd, use_bias=self.use_bias,
                    kernel_init=torch_conv_init, dtype=self.dtype,
                    name="Conv_1")(x)
        return x


class SEBlock(nn.Module):
    """conv_layers.py:159-174 — squeeze-and-excitation."""
    ratio: int = 4
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        in_ch = x.shape[-1]
        act = get_act(self.act)
        s = jnp.mean(x, axis=tuple(range(1, 1 + nd)), keepdims=True)
        s = nn.Conv(in_ch // self.ratio, (1,) * nd, use_bias=True,
                    kernel_init=torch_conv_init, dtype=self.dtype)(s)
        s = act(s)
        s = nn.Conv(in_ch, (1,) * nd, use_bias=True,
                    kernel_init=torch_conv_init, dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


class DropPath(nn.Module):
    """conv_layers.py:177-194 — batch-wise stochastic depth."""
    p: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.p == 0.0 or not train:
            return x
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.uniform(rng, shape) > self.p
        return x / (1.0 - self.p) * keep


class MBConv(nn.Module):
    """conv_layers.py:197-238 — inverted residual with depthwise conv + SE."""
    out_ch: int
    expansion: int = 4
    kernel_size: KernelArg = 3
    stride: KernelArg = 1
    ratio: int = 4
    p: float = 0.0
    se: bool = True
    norm: Any = "bn"
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        in_ch = x.shape[-1]
        expanded = self.expansion * in_ch
        residual = x

        if self.expansion != 1:
            x = ConvNormAct(expanded, 1, 1, padding=0, norm=self.norm,
                            act=self.act, preact=True, dtype=self.dtype)(x, train)
        x = ConvNormAct(expanded, self.kernel_size, self.stride, groups=expanded,
                        norm=self.norm, act=self.act, preact=True,
                        dtype=self.dtype)(x, train)
        if self.se:
            x = SEBlock(ratio=self.ratio, act=self.act, dtype=self.dtype)(x, train)
        x = ConvNormAct(self.out_ch, 1, 1, padding=0, norm=self.norm, act=False,
                        preact=True, dtype=self.dtype)(x, train)
        x = DropPath(self.p)(x, train)

        stride = _tuple(self.stride, nd)
        if in_ch != self.out_ch or any(s != 1 for s in stride):
            residual = ConvNormAct(self.out_ch, self.kernel_size, self.stride,
                                   norm=False, act=False, dtype=self.dtype)(residual, train)
        return x + residual


class FusedMBConv(nn.Module):
    """conv_layers.py:241-281 — fused inverted residual (dense kxk expand)."""
    out_ch: int
    expansion: int = 4
    kernel_size: KernelArg = 3
    stride: KernelArg = 1
    ratio: int = 4
    p: float = 0.0
    se: bool = True
    norm: Any = "bn"
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        in_ch = x.shape[-1]
        expanded = self.expansion * in_ch
        residual = x

        x = ConvNormAct(expanded, self.kernel_size, self.stride, norm=self.norm,
                        act=self.act, preact=True, dtype=self.dtype)(x, train)
        if self.se:
            x = SEBlock(ratio=self.ratio, act=self.act, dtype=self.dtype)(x, train)
        x = ConvNormAct(self.out_ch, 1, 1, padding=0, norm=self.norm, act=False,
                        preact=True, dtype=self.dtype)(x, train)
        x = DropPath(self.p)(x, train)

        stride = _tuple(self.stride, nd)
        if in_ch != self.out_ch or any(s != 1 for s in stride):
            residual = ConvNormAct(self.out_ch, self.kernel_size, self.stride,
                                   norm=False, act=False, dtype=self.dtype)(residual, train)
        return x + residual


class ConvNeXtBlock(nn.Module):
    """model/dim2/conv_layers.py:274+ — depthwise 7x7, LN, pointwise MLP."""
    out_ch: int
    kernel_size: KernelArg = 7
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        in_ch = x.shape[-1]
        k = _tuple(self.kernel_size, nd)
        residual = x
        if _dw_usable(k, (1,) * nd, None):
            x = _DepthwiseTapConv(k, use_bias=True, dtype=self.dtype,
                                  name="Conv_0")(x)
        else:
            x = nn.Conv(in_ch, kernel_size=k,
                        padding=[(ki // 2, ki // 2) for ki in k],
                        feature_group_count=in_ch, kernel_init=torch_conv_init,
                        dtype=self.dtype, name="Conv_0")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Dense(4 * in_ch, kernel_init=torch_conv_init, dtype=self.dtype)(x)
        x = _fast_gelu(x)
        x = nn.Dense(self.out_ch, kernel_init=torch_conv_init, dtype=self.dtype)(x)
        if self.layer_scale_init_value > 0:
            gamma_p = self.param("layer_scale",
                                 nn.initializers.constant(self.layer_scale_init_value),
                                 (self.out_ch,))
            x = x * gamma_p
        x = DropPath(self.drop_path)(x, train)
        if in_ch == self.out_ch:
            x = x + residual
        return x


def get_block_cls(name: str):
    """Reference get_block (model/dim3/utils.py:7-13), by config string."""
    return {
        "SingleConv": SingleConv,
        "ConvNormAct": SingleConv,   # dim3 unet.py default alias
        "BasicBlock": BasicBlock,
        "Bottleneck": Bottleneck,
        "MBConv": MBConv,
        "FusedMBConv": FusedMBConv,
        "ConvNeXtBlock": ConvNeXtBlock,
    }[name]
