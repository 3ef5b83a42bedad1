"""MXU-efficient serving backbone for the 08-superresolution geometry.

Superresolution08UNetBackbone (models/refinement.py) is a tiny U-Net on the
8³ input followed by two nearest-upsample DoubleConv stages (up0: 8³→16³,
up1: 16³→32³). At the flagship nf=16 the up1 convs emit 16 output channels —
16 of 128 MXU lanes — and dominate the backbone's effective cost: ~12.7
GFLOP-equivalents per chunk against a 1.8 GFLOP useful count (ROOFLINE.md).

This applies the fused-decoder playbook (ops/fused_decoder) to the backbone:

  up0: GN -> fused upsample-conv on the 8³ grid (32 -> 8·32 = 256 lanes)
       -> ReLU -> depth-to-space -> GN -> conv2 (16³, 32ch; 25% lanes — the
       parity decomposition is a wash at 32 channels, so it stays plain)
  up1: GN -> fused upsample-conv on the 16³ grid (32 -> 8·16 = 128 lanes)
       -> ReLU -> packed GN -> parity-DECOMPOSED conv2 (full lanes, 4.6x
       useful FLOPs vs 8x effective unpacked) -> ReLU -> depth-to-space

GroupNorm on nearest-upsampled data has identical statistics to GroupNorm on
the source grid, so every norm moves to the small grid. The U-Net head runs
as the unchanged flax module (it computes at ≤8³ — noise). Value parity with
the flax backbone is pinned by tests/test_fused_backbone.py and the engine
equality test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.ops.fused_decoder import (
    _DN, _conv_same, decomposed_conv2_kernels, depth_to_space_2x,
    fuse_upsample_conv_kernel, group_norm, group_norm_packed)


class FusedSuperres08Backbone:
    """Drop-in serving replacement for Superresolution08UNetBackbone.apply
    (layer_order 'gcr'). Built from the backbone's flax params; the U-Net
    sub-tree is passed per call (it rides the jit arguments like every other
    param tree — the fused conv kernels are small enough to close over)."""

    def __init__(self, backbone_params: dict, nf: int, num_levels: int,
                 layer_order: str = "gcr", dtype=jnp.float32):
        assert layer_order == "gcr", "fused backbone covers the shipped 'gcr'"
        from retrieval_fuse_tpu.models.unet import UNet3D
        self.nf = nf
        self.num_groups = nf // 2
        self.unet = UNet3D(out_channels=2 * nf, final_sigmoid=False,
                           final_conv=False, f_maps=nf, num_groups=nf // 2,
                           layer_order=layer_order, num_levels=num_levels,
                           is_segmentation=False)

        def gn(conv_params):
            return (jnp.asarray(conv_params["groupnorm"]["scale"], dtype),
                    jnp.asarray(conv_params["groupnorm"]["bias"], dtype))

        up0 = backbone_params["up0"]["basic_module"]
        up1 = backbone_params["up1"]["basic_module"]
        self.gn01 = gn(up0["SingleConv1"])
        self.w01_fused = jnp.asarray(fuse_upsample_conv_kernel(
            np.asarray(up0["SingleConv1"]["conv"]["kernel"])), dtype)
        self.gn02 = gn(up0["SingleConv2"])
        self.w02 = jnp.asarray(up0["SingleConv2"]["conv"]["kernel"], dtype)

        self.gn11 = gn(up1["SingleConv1"])
        self.w11_fused = jnp.asarray(fuse_upsample_conv_kernel(
            np.asarray(up1["SingleConv1"]["conv"]["kernel"])), dtype)
        self.gn12 = gn(up1["SingleConv2"])
        ks, pads = decomposed_conv2_kernels(
            np.asarray(up1["SingleConv2"]["conv"]["kernel"]))
        self.w12_dec = [jnp.asarray(k, dtype) for k in ks]
        self.w12_pads = pads

    def __call__(self, unet_params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, 8, 8, 8, 1) normalized input -> (B, 32, 32, 32, nf)."""
        nf, g = self.nf, self.num_groups
        h = self.unet.apply({"params": unet_params}, x)        # (B, 8³, 2nf)
        # up0: fused upsample-conv at 8³ (8·2nf lanes), conv2 at 16³
        h = group_norm(h, *self.gn01, g)
        h = jax.nn.relu(_conv_same(h, self.w01_fused))         # (B, 8³, 16nf)
        h = depth_to_space_2x(h, 2 * nf)                       # (B, 16³, 2nf)
        h = group_norm(h, *self.gn02, g)
        h = jax.nn.relu(_conv_same(h, self.w02))               # (B, 16³, 2nf)
        # up1: fused upsample-conv at 16³, decomposed conv2 on the packed rep
        h = group_norm(h, *self.gn11, g)
        h = jax.nn.relu(_conv_same(h, self.w11_fused))         # (B, 16³, 8nf)
        h = group_norm_packed(h, *self.gn12, g, nf)
        out = None
        for s, (w, pad) in enumerate(zip(self.w12_dec, self.w12_pads)):
            y = jax.lax.conv_general_dilated(
                h[..., s * nf:(s + 1) * nf], w.astype(h.dtype), (1, 1, 1),
                list(pad), dimension_numbers=_DN,
                preferred_element_type=jnp.float32)
            out = y if out is None else out + y
        h = jax.nn.relu(out.astype(h.dtype))                   # (B, 16³, 8nf)
        return depth_to_space_2x(h, nf)                        # (B, 32³, nf)
