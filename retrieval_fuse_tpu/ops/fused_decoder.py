"""MXU-efficient serving decoder: fused nearest-upsample + conv.

The final decoder (models/refinement.Superresolution08FinalDecoder) spends
most of the serving pipeline's FLOPs in two 3³ convs at 64³ with nf(=16)
channels — only 16 of the MXU's 128 lanes carry useful output. Its first conv
consumes NEAREST-UPSAMPLED data (DecoderNoJoining: upsample 2x then conv), so
every 2³ output block reads the same 32³-grid values with different weights.
Folding the upsample into the conv turns it into ONE 3³ conv on the 32³ grid
with 8·nf(=128) output channels — identical FLOPs and identical math (weights
pre-summed per output sub-position), but the lane dimension is full: an 8x
MXU-utilization win for that conv. A depth-to-space reshape restores the 64³
layout; the second conv (non-redundant input — the same folding would pad 8x
zero FLOPs, a wash) and the 1x1 head run unchanged.

GroupNorm on nearest-upsampled data has identical statistics to GroupNorm on
the 32³ source (8-fold duplication preserves mean/variance), so the first
norm also moves to the small grid.

Value parity with the flax decoder is pinned by
tests/test_fused_decoder.py (and the engine equality test).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

_DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                     ("NDHWC", "DHWIO", "NDHWC"))


def fuse_upsample_conv_kernel(w: np.ndarray) -> np.ndarray:
    """(3,3,3,Cin,Cout) conv kernel meant for nearest-2x-upsampled input ->
    (3,3,3,Cin,8·Cout) kernel on the pre-upsample grid.

    out[2i+o] = Σ_k w[k] · x_up[2i+o+k-1] with x_up[j] = x[j//2], so the
    32³-grid tap offset is d = (o+k-1)//2 ∈ {-1,0,1}; taps sharing (o, d) are
    pre-summed. Output channel block o_idx = o0·4 + o1·2 + o2."""
    w = np.asarray(w)
    c_in, c_out = w.shape[3], w.shape[4]
    fused = np.zeros((3, 3, 3, c_in, 8 * c_out), w.dtype)
    for o in itertools.product((0, 1), repeat=3):
        o_idx = o[0] * 4 + o[1] * 2 + o[2]
        for k in itertools.product(range(3), repeat=3):
            d = tuple((oo + kk - 1) // 2 for oo, kk in zip(o, k))
            fused[d[0] + 1, d[1] + 1, d[2] + 1, :, o_idx * c_out:(o_idx + 1) * c_out] \
                += w[k[0], k[1], k[2]]
    return fused


def depth_to_space_2x(x: jnp.ndarray, c_out: int) -> jnp.ndarray:
    """(B, D, H, W, 8·C) with o_idx-major channel blocks -> (B, 2D, 2H, 2W, C)."""
    b, d, h, w, _ = x.shape
    x = x.reshape(b, d, h, w, 2, 2, 2, c_out)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, 2 * d, 2 * h, 2 * w, c_out)


def group_norm(x: jnp.ndarray, scale, bias, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """flax.linen.GroupNorm semantics (stats over spatial dims + channels in
    group, f32 accumulation)."""
    b = x.shape[0]
    c = x.shape[-1]
    g = num_groups if (c >= num_groups and c % num_groups == 0) else 1
    xg = x.reshape(b, -1, g, c // g).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    return (xn * scale + bias).astype(x.dtype)


def _conv_same(x, kernel):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, x.dtype), window_strides=(1, 1, 1),
        padding=[(1, 1)] * 3, dimension_numbers=_DN,
        preferred_element_type=jnp.float32).astype(x.dtype)


class FusedFinalDecoder:
    """Drop-in serving replacement for Superresolution08FinalDecoder.apply
    (layer_order 'gcr'): GN -> fused upsample-conv (128 lanes) -> ReLU -> d2s
    -> GN -> conv -> ReLU -> 1x1 conv -> tanh."""

    def __init__(self, decoder_params: dict, nf: int, dtype=jnp.float32):
        bm = decoder_params["up0"]["basic_module"]
        self.nf = nf
        self.num_groups = nf // 2
        self.gn1 = (jnp.asarray(bm["SingleConv1"]["groupnorm"]["scale"], dtype),
                    jnp.asarray(bm["SingleConv1"]["groupnorm"]["bias"], dtype))
        self.w1_fused = jnp.asarray(
            fuse_upsample_conv_kernel(np.asarray(bm["SingleConv1"]["conv"]["kernel"])), dtype)
        self.gn2 = (jnp.asarray(bm["SingleConv2"]["groupnorm"]["scale"], dtype),
                    jnp.asarray(bm["SingleConv2"]["groupnorm"]["bias"], dtype))
        self.w2 = jnp.asarray(bm["SingleConv2"]["conv"]["kernel"], dtype)
        self.w_final = jnp.asarray(decoder_params["final_conv"]["kernel"], dtype)
        self.b_final = jnp.asarray(decoder_params["final_conv"]["bias"], dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, S, S, S, nf) feature volume -> (B, 2S, 2S, 2S, 1) tanh TSDF."""
        h = group_norm(x, *self.gn1, self.num_groups)
        h = _conv_same(h, self.w1_fused)          # (B, S³, 8·nf): full lanes
        h = jax.nn.relu(h)
        h = depth_to_space_2x(h, self.nf)         # (B, (2S)³, nf)
        h = group_norm(h, *self.gn2, self.num_groups)
        h = jax.nn.relu(_conv_same(h, self.w2))
        out = jax.lax.conv_general_dilated(
            h, self.w_final.astype(h.dtype), (1, 1, 1), "VALID", dimension_numbers=_DN,
            preferred_element_type=jnp.float32) + self.b_final.astype(jnp.float32)
        return jnp.tanh(out)
