"""Refinement backbones + decoders wrapping the 3D U-Net family.

Parity: reference model/refinement.py — the same four task-specific stacks:
  * Superresolution08UNetBackbone: UNet3D(4 levels, 8³) + 2 skip-free
    upsampling decoders -> (B, 32, 32, 32, nf)
  * Superresolution16UNetBackbone: UNet3D + 1 upsampling decoder (16³ -> 32³)
  * SurfaceReconstructionUNetBackbone: UNet3D(5 levels, remove 2 final
    decoders) 128³ -> 32³
  * Superresolution08FinalDecoder: skip-free decoder 32³ -> 64³ + 1x1x1 conv
    + tanh (shared by all tasks)
  * RetrievalUNetBackbone: UNet3D(remove 1 final decoder) on 16³ shape patches
    -> (·, 8, 8, 8, nf) feature patches
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from retrieval_fuse_tpu.models.unet import UNet3D, DecoderNoJoining
from retrieval_fuse_tpu.ops.init import torch_kernel_init, torch_bias_init


class Superresolution08UNetBackbone(nn.Module):
    nf: int
    num_levels: int = 4
    layer_order: str = "gcr"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        nf = self.nf
        x = UNet3D(out_channels=2 * nf, final_sigmoid=False, final_conv=False, f_maps=nf,
                   num_groups=nf // 2, layer_order=self.layer_order, num_levels=self.num_levels,
                   is_segmentation=False, name="unet")(x, train)
        x = DecoderNoJoining(2 * nf, conv_layer_order=self.layer_order, num_groups=nf // 2,
                             name="up0")(x, train)
        x = DecoderNoJoining(nf, conv_layer_order=self.layer_order, num_groups=nf // 2,
                             name="up1")(x, train)
        return x


class Superresolution16UNetBackbone(nn.Module):
    nf: int
    num_levels: int = 4
    layer_order: str = "gcr"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        nf = self.nf
        x = UNet3D(out_channels=2 * nf, final_sigmoid=False, final_conv=False, f_maps=nf,
                   num_groups=nf // 2, layer_order=self.layer_order, num_levels=self.num_levels,
                   is_segmentation=False, name="unet")(x, train)
        x = DecoderNoJoining(nf, conv_layer_order=self.layer_order, num_groups=nf // 2,
                             name="up0")(x, train)
        return x


class SurfaceReconstructionUNetBackbone(nn.Module):
    nf: int
    num_levels: int = 5
    layer_order: str = "gcr"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        nf = self.nf
        return UNet3D(out_channels=nf, final_sigmoid=False, final_conv=False,
                      remove_n_final_layers=2, f_maps=nf, layer_order=self.layer_order,
                      num_groups=nf // 2, num_levels=self.num_levels, is_segmentation=False,
                      name="unet")(x, train)


class Superresolution08FinalDecoder(nn.Module):
    nf: int
    layer_order: str = "gcr"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        nf = self.nf
        x = DecoderNoJoining(nf, conv_layer_order=self.layer_order, num_groups=nf // 2,
                             name="up0")(x, train)
        in_ch = x.shape[-1]
        x = nn.Conv(1, kernel_size=(1, 1, 1), padding="VALID", kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(in_ch), name="final_conv")(x)
        return nn.tanh(x)


class RetrievalUNetBackbone(nn.Module):
    nf: int
    f_maps: int = 16
    num_levels: int = 4
    layer_order: str = "gcr"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return UNet3D(out_channels=self.nf, num_groups=self.nf // 2, final_sigmoid=False,
                      final_conv=False, remove_n_final_layers=1, f_maps=self.f_maps,
                      layer_order=self.layer_order, num_levels=self.num_levels,
                      is_segmentation=False, name="unet")(x, train)
