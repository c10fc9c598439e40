"""Linear (bi/trilinear) resize with ``align_corners=True`` semantics.

``F.interpolate(..., mode='bilinear'/'trilinear', align_corners=True)`` is the
reference's decoder upsampler (model/dim3/unet_utils.py:69, medformer_utils.py:357).
``jax.image.resize`` implements half-pixel-center sampling (align_corners=False),
so we implement the align_corners=True rule directly: output index j samples
input position j*(in-1)/(out-1), interpolated linearly, separably per axis.
Separable 1D passes keep it to one gather + lerp per axis (VPU-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resize_axis_linear(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    if out_size == 1:
        # align_corners=True with out=1 samples position 0
        return jax.lax.slice_in_dim(x, 0, 1, axis=axis)

    # Lower the lerp as a dense (out,in) interpolation-matrix contraction:
    # two nonzeros per output row ((1-w) at i0, w at i0+1).  jnp.take along a
    # spatial axis lowers to per-slice loops on TPU (hundreds of tiny ops);
    # the matmul form is one MXU pass over the tensor instead.
    import numpy as np
    # same f32 arithmetic as the torch/XLA position computation
    pos32 = (np.arange(out_size, dtype=np.float32)
             * np.float32(in_size - 1) / np.float32(out_size - 1))
    i0 = np.clip(np.floor(pos32).astype(np.int32), 0, in_size - 2)
    w = pos32 - i0.astype(np.float32)
    M = np.zeros((out_size, in_size), np.float32)
    M[np.arange(out_size), i0] = 1.0 - w
    M[np.arange(out_size), i0 + 1] += w
    M = jnp.asarray(M)

    letters = "abcdefghijk"
    sub = letters[:x.ndim]
    a = sub[axis]
    out_sub = sub.replace(a, "z")
    out = jnp.einsum(f"{sub},z{a}->{out_sub}", x, M,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def resize_linear(x: jax.Array, out_spatial, channel_last: bool = True) -> jax.Array:
    """Resize (B, *spatial, C) to ``out_spatial`` with align_corners=True."""
    ndim_spatial = len(out_spatial)
    assert x.ndim == ndim_spatial + 2, (x.shape, out_spatial)
    for i, s in enumerate(out_spatial):
        x = _resize_axis_linear(x, int(s), axis=1 + i)
    return x


def resize_nearest(x: jax.Array, out_spatial) -> jax.Array:
    """Nearest-neighbour resize matching torch 'nearest' (floor of src index)."""
    ndim_spatial = len(out_spatial)
    assert x.ndim == ndim_spatial + 2
    for i, s in enumerate(out_spatial):
        in_size = x.shape[1 + i]
        if in_size == int(s):
            continue
        idx = jnp.floor(jnp.arange(int(s), dtype=jnp.float32) * in_size / int(s)).astype(jnp.int32)
        idx = jnp.clip(idx, 0, in_size - 1)
        x = jnp.take(x, idx, axis=1 + i)
    return x
