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


def fuse_upsample_conv_kernel_jnp(w: jnp.ndarray) -> jnp.ndarray:
    """Traceable/differentiable twin of fuse_upsample_conv_kernel, for
    TRAINING-time fusion (models/unet.DecoderNoJoining fused_upsample=True):
    the rearrangement is a fixed linear map of w built from 216 slice-adds,
    so gradients flow back to the canonical (3,3,3,Cin,Cout) parameter and
    checkpoints stay in the unfused layout."""
    c_in, c_out = w.shape[3], w.shape[4]
    fused = jnp.zeros((3, 3, 3, c_in, 8 * c_out), w.dtype)
    for o in itertools.product((0, 1), repeat=3):
        o_idx = o[0] * 4 + o[1] * 2 + o[2]
        for k in itertools.product(range(3), repeat=3):
            d = tuple((oo + kk - 1) // 2 for oo, kk in zip(o, k))
            fused = fused.at[d[0] + 1, d[1] + 1, d[2] + 1, :,
                             o_idx * c_out:(o_idx + 1) * c_out].add(w[k[0], k[1], k[2]])
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


def pack_conv_kernel_2x(w: np.ndarray) -> np.ndarray:
    """(3,3,3,Cin,Cout) SAME conv kernel on the 2x grid -> (3,3,3,8·Cin,8·Cout)
    kernel operating on the space-to-depth-packed half-res grid.

    For output sub-position o∈{0,1}³ and tap k∈{-1,0,1}³ the 2x-grid read
    2i+o+k lands in packed block o' = (o+k) mod 2 at half-res offset
    d = (o+k-o')//2 ∈ {-1,0,1}. Each (o,k) maps to exactly one (d,o') slot, so
    the packed kernel is 1/8-dense — dense conv pays 8x FLOPs but runs with
    full 128-lane MXU utilization instead of Cout(=nf) lanes at the 2x grid,
    and the whole decoder tail stays on the 32³ grid (no 64³ intermediates in
    HBM until the final depth-to-space)."""
    w = np.asarray(w)
    c_in, c_out = w.shape[3], w.shape[4]
    packed = np.zeros((3, 3, 3, 8 * c_in, 8 * c_out), w.dtype)
    for o in itertools.product((0, 1), repeat=3):
        o_idx = o[0] * 4 + o[1] * 2 + o[2]
        for k in itertools.product((-1, 0, 1), repeat=3):
            y = tuple(oo + kk for oo, kk in zip(o, k))
            op = tuple(yy % 2 for yy in y)
            d = tuple((yy - (yy % 2)) // 2 for yy in y)
            op_idx = op[0] * 4 + op[1] * 2 + op[2]
            packed[d[0] + 1, d[1] + 1, d[2] + 1,
                   op_idx * c_in:(op_idx + 1) * c_in,
                   o_idx * c_out:(o_idx + 1) * c_out] += w[k[0] + 1, k[1] + 1, k[2] + 1]
    return packed


def group_norm_packed(x: jnp.ndarray, scale, bias, num_groups: int, nf: int,
                      eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over a space-to-depth-packed (B, S, S, S, 8·nf) tensor with
    statistics identical to GroupNorm(num_groups) on the unpacked 2x-grid
    tensor: per group, stats run over (spatial, all 8 sub-voxel blocks,
    channels in group)."""
    b = x.shape[0]
    g = num_groups if (nf >= num_groups and nf % num_groups == 0) else 1
    xg = x.reshape(b, -1, 8, g, nf // g).astype(jnp.float32)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    scale8 = jnp.tile(jnp.asarray(scale), 8)
    bias8 = jnp.tile(jnp.asarray(bias), 8)
    return (xn * scale8 + bias8).astype(x.dtype)


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


def decomposed_conv2_kernels(w: np.ndarray):
    """(3,3,3,Cin,Cout) SAME conv on the 2x grid -> 8 sub-grid kernels
    [(k0,k1,k2,Cin,8·Cout)] + per-dim paddings, one per input sub-position s.

    Parity decomposition: out[2i+o] = Σ_k w[k]·x[2i+o+k-1]; the 2x-grid read
    y = o+k-1 lives in sub-grid s = y mod 2 at half-res offset d = (y-s)/2.
    For s_dim=0 the offsets span {0,1} (2 taps), for s_dim=1 {-1,0,1} (3).
    Each sub-grid s therefore gets ONE dense-lane conv of shape
    Π(2 or 3) × Cin × 8·Cout, and conv2 becomes Σ_s conv(x_s, K_s) — 4.6x the
    useful FLOPs (vs 8x for the 1/8-dense pack_conv_kernel_2x) but with all
    128 MXU lanes carrying output, vs Cout(=16) lanes for the unpacked conv.
    Roofline (ROOFLINE.md): 21.8 ms vs 37.6 ms effective at batch 256."""
    w = np.asarray(w)
    c_in, c_out = w.shape[3], w.shape[4]
    kernels, paddings = [], []
    for s in itertools.product((0, 1), repeat=3):
        ks = tuple(2 if sd == 0 else 3 for sd in s)
        kern = np.zeros(ks + (c_in, 8 * c_out), w.dtype)
        # s_dim=0: window d∈{0,1} -> VALID conv with pad (0,1)
        # s_dim=1: window d∈{-1,0,1} -> pad (1,1)
        paddings.append(tuple((0, 1) if sd == 0 else (1, 1) for sd in s))
        for o in itertools.product((0, 1), repeat=3):
            o_idx = o[0] * 4 + o[1] * 2 + o[2]
            for k in itertools.product(range(3), repeat=3):
                y = tuple(oo + kk - 1 for oo, kk in zip(o, k))
                if tuple(yy % 2 for yy in y) != s:
                    continue
                d = tuple((yy - (yy % 2)) // 2 for yy in y)
                idx = tuple(dd if sd == 0 else dd + 1 for dd, sd in zip(d, s))
                kern[idx[0], idx[1], idx[2], :,
                     o_idx * c_out:(o_idx + 1) * c_out] = w[k[0], k[1], k[2]]
        kernels.append(kern)
    return kernels, paddings


class PackedFinalDecoder(FusedFinalDecoder):
    """Serving decoder that never leaves the 32³ grid: the second 3³ conv and
    the 1x1 head run on the space-to-depth-packed representation (8·nf=128
    channels — full MXU lanes throughout), with ONE depth-to-space reshape at
    the very end. Math-identical to Superresolution08FinalDecoder / the flax
    decoder (pinned by tests/test_fused_decoder.py): GN1 -> fused
    upsample-conv -> ReLU -> packed GN2 -> packed conv -> ReLU -> packed 1x1
    head -> tanh -> depth-to-space."""

    def __init__(self, decoder_params: dict, nf: int, dtype=jnp.float32):
        super().__init__(decoder_params, nf, dtype)
        self.w2_packed = jnp.asarray(
            pack_conv_kernel_2x(np.asarray(decoder_params["up0"]["basic_module"]
                                           ["SingleConv2"]["conv"]["kernel"])), dtype)
        wf = np.asarray(decoder_params["final_conv"]["kernel"])  # (1,1,1,nf,1)
        wf_packed = np.zeros((1, 1, 1, 8 * nf, 8), wf.dtype)
        for o_idx in range(8):
            wf_packed[0, 0, 0, o_idx * nf:(o_idx + 1) * nf, o_idx] = wf[0, 0, 0, :, 0]
        self.wf_packed = jnp.asarray(wf_packed, dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = group_norm(x, *self.gn1, self.num_groups)
        h = _conv_same(h, self.w1_fused)                 # (B, S³, 8·nf)
        h = jax.nn.relu(h)
        h = group_norm_packed(h, *self.gn2, self.num_groups, self.nf)
        h = jax.nn.relu(_conv_same(h, self.w2_packed))   # (B, S³, 8·nf)
        out = jax.lax.conv_general_dilated(
            h, self.wf_packed.astype(h.dtype), (1, 1, 1), "VALID",
            dimension_numbers=_DN, preferred_element_type=jnp.float32
        ) + self.b_final.astype(jnp.float32)             # (B, S³, 8)
        return depth_to_space_2x(jnp.tanh(out), 1)


class DecomposedPackedDecoder(PackedFinalDecoder):
    """PackedFinalDecoder with the second 3³ conv parity-DECOMPOSED into 8
    dense-lane sub-grid convs (decomposed_conv2_kernels) instead of the
    1/8-dense packed kernel: 4.3 TFLOP/batch-256 at full MXU lanes vs
    7.4 TFLOP for the packed conv and an effective 7.4 for the 16-lane
    unpacked conv. Math-identical to the flax decoder (same pinning tests)."""

    def __init__(self, decoder_params: dict, nf: int, dtype=jnp.float32):
        super().__init__(decoder_params, nf, dtype)
        ks, pads = decomposed_conv2_kernels(
            np.asarray(decoder_params["up0"]["basic_module"]["SingleConv2"]["conv"]["kernel"]))
        self.w2_dec = [jnp.asarray(k, dtype) for k in ks]
        self.w2_pads = pads

    def _conv2(self, h):
        """h: packed (B, S³, 8·nf), sub-position-major channel blocks.

        Padding is applied EXPLICITLY (jnp.pad + VALID conv) rather than as
        conv padding config: the r4 on-device run showed every program
        carrying the asymmetric-padded even-kernel convs crashes the remote
        TPU compile helper (HTTP 500, exit 1); an explicit pad fused by XLA
        sidesteps that lowering while keeping the math identical (pinned by
        tests/test_fused_decoder.py)."""
        nf = self.nf
        out = None
        for s, (w, pad) in enumerate(zip(self.w2_dec, self.w2_pads)):
            x_s = h[..., s * nf:(s + 1) * nf]
            x_s = jnp.pad(x_s, ((0, 0),) + tuple(pad) + ((0, 0),))
            y = jax.lax.conv_general_dilated(
                x_s, w.astype(h.dtype), (1, 1, 1), "VALID",
                dimension_numbers=_DN, preferred_element_type=jnp.float32)
            out = y if out is None else out + y
        return out.astype(h.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = group_norm(x, *self.gn1, self.num_groups)
        h = _conv_same(h, self.w1_fused)                 # (B, S³, 8·nf)
        h = jax.nn.relu(h)
        h = group_norm_packed(h, *self.gn2, self.num_groups, self.nf)
        h = jax.nn.relu(self._conv2(h))                  # (B, S³, 8·nf)
        out = jax.lax.conv_general_dilated(
            h, self.wf_packed.astype(h.dtype), (1, 1, 1), "VALID",
            dimension_numbers=_DN, preferred_element_type=jnp.float32
        ) + self.b_final.astype(jnp.float32)             # (B, S³, 8)
        return depth_to_space_2x(jnp.tanh(out), 1)
