"""Configurable 3D U-Net family (channels-last, flax).

Re-implementation of the capability surface of the reference's vendored
pytorch-3dunet (model/unet.py): layer-order strings ('gcr' = GroupNorm + Conv
+ ReLU, 'cl', 'bcr', ...), DoubleConv / StepDownDoubleConv / ExtResNetBlock,
max-pool encoders, nearest-upsample + concat-skip decoders, skip-free
DecoderNoJoining, decoder truncation via `remove_n_final_layers`, and the
UNet3D / ResidualUNet3D presets.

TPU notes: nearest 2x upsampling is jnp.repeat (bit-exact with torch
F.interpolate(mode='nearest') at integer factors, and a pure layout op for
XLA); convs are channels-last so XLA tiles them onto the MXU directly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from retrieval_fuse_tpu.ops.init import torch_kernel_init, torch_bias_init
from retrieval_fuse_tpu.ops.fused_decoder import (
    fuse_upsample_conv_kernel_jnp, depth_to_space_2x)

_DN3D = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                       ("NDHWC", "DHWIO", "NDHWC"))


def number_of_features_per_level(init_channel_number: int, num_levels: int) -> list[int]:
    return [init_channel_number * 2 ** k for k in range(num_levels)]


def _adapt_num_groups(num_channels: int, num_groups: int) -> int:
    # parity: reference model/unet.py:61-65
    if num_channels < num_groups:
        return 1
    assert num_channels % num_groups == 0, (
        f"channels ({num_channels}) must divide num_groups ({num_groups})")
    return num_groups


class SingleConv(nn.Module):
    """One conv layer with non-linearity / norm in configurable order.

    Parity: reference model/unet.py:19-100 — 'c' conv (bias only without
    norm), 'g' groupnorm (in- or out-channels depending on position), 'b'
    batchnorm, 'r' ReLU, 'l' LeakyReLU(0.1), 'e' ELU.
    """

    out_channels: int
    kernel_size: int = 3
    order: str = "crg"
    num_groups: int = 8
    padding: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert "c" in self.order, "Conv layer MUST be present"
        assert self.order[0] not in "rle", "Non-linearity cannot be the first operation in the layer"
        for i, char in enumerate(self.order):
            if char == "r":
                x = nn.relu(x)
            elif char == "l":
                x = nn.leaky_relu(x, negative_slope=0.1)
            elif char == "e":
                x = nn.elu(x)
            elif char == "c":
                bias = not ("g" in self.order or "b" in self.order)
                in_ch = x.shape[-1]
                k = self.kernel_size
                pad = [(self.padding, self.padding)] * 3
                x = nn.Conv(self.out_channels, kernel_size=(k, k, k), padding=pad,
                            use_bias=bias, kernel_init=torch_kernel_init,
                            bias_init=torch_bias_init(in_ch * k ** 3), name="conv")(x)
            elif char == "g":
                ch = x.shape[-1]
                g = _adapt_num_groups(ch, self.num_groups)
                # a single norm per SingleConv (torch Sequential could not
                # even hold two same-named modules), so the name is stable
                # regardless of pre/post-conv position
                x = nn.GroupNorm(num_groups=g, epsilon=1e-5, name="groupnorm")(x)
            elif char == "b":
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 name="batchnorm")(x)
            else:
                raise ValueError(f"Unsupported layer type '{char}'")
        return x


class DoubleConv(nn.Module):
    """Two SingleConvs; encoder halves-then-doubles channels (ref :103-144)."""

    out_channels: int
    encoder: bool
    kernel_size: int = 3
    order: str = "crg"
    num_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        if self.encoder:
            conv1_out = max(self.out_channels // 2, in_channels)
        else:
            conv1_out = self.out_channels
        x = SingleConv(conv1_out, self.kernel_size, self.order, self.num_groups,
                       name="SingleConv1")(x, train)
        x = SingleConv(self.out_channels, self.kernel_size, self.order, self.num_groups,
                       name="SingleConv2")(x, train)
        return x


class StepDownDoubleConv(nn.Module):
    """Two SingleConvs stepping through (in+out)//2 (ref :147-159)."""

    out_channels: int
    encoder: bool = False
    kernel_size: int = 3
    order: str = "crg"
    num_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = (x.shape[-1] + self.out_channels) // 2
        x = SingleConv(mid, self.kernel_size, self.order, self.num_groups,
                       name="SingleConv1")(x, train)
        x = SingleConv(self.out_channels, self.kernel_size, self.order, self.num_groups,
                       name="SingleConv2")(x, train)
        return x


class ExtResNetBlock(nn.Module):
    """SingleConv + residual pair, non-linearity after the add (ref :162-207)."""

    out_channels: int
    encoder: bool = False
    kernel_size: int = 3
    order: str = "cge"
    num_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = SingleConv(self.out_channels, self.kernel_size, self.order, self.num_groups,
                         name="conv1")(x, train)
        residual = out
        out = SingleConv(self.out_channels, self.kernel_size, self.order, self.num_groups,
                         name="conv2")(out, train)
        n_order = self.order
        for c in "rel":
            n_order = n_order.replace(c, "")
        out = SingleConv(self.out_channels, self.kernel_size, n_order, self.num_groups,
                         name="conv3")(out, train)
        out = out + residual
        if "l" in self.order:
            return nn.leaky_relu(out, negative_slope=0.1)
        if "e" in self.order:
            return nn.elu(out)
        return nn.relu(out)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x on (B, D, H, W, C) — bit-exact with torch nearest."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    x = jnp.repeat(x, 2, axis=3)
    return x


_BASIC_MODULES = {"DoubleConv": DoubleConv, "StepDownDoubleConv": StepDownDoubleConv,
                  "ExtResNetBlock": ExtResNetBlock}


class Encoder(nn.Module):
    """Optional 2³ max-pool + basic module (ref :210-253)."""

    out_channels: int
    apply_pooling: bool = True
    pool_type: str = "max"
    basic_module: str = "DoubleConv"
    conv_layer_order: str = "crg"
    num_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.apply_pooling:
            if self.pool_type == "max":
                x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
            else:
                x = nn.avg_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
        mod = _BASIC_MODULES[self.basic_module]
        return mod(self.out_channels, encoder=True, order=self.conv_layer_order,
                   num_groups=self.num_groups, name="basic_module")(x, train)


class TorchConvTranspose2x(nn.Module):
    """torch ConvTranspose3d(k=3, s=2, p=1) called with output_size=2D
    (output_padding auto-resolves to 1), written as its exact correlation
    equivalent: 2x input dilation + (1, 2) edge padding + VALID 3³ conv.

    The kernel param is stored in CORRELATION layout (kD, kH, kW, in, out) —
    torch_import.conv_transpose_w flips/transposes the torch (in, out, kD,
    kH, kW) transposed-conv weight into it; value parity vs the reference is
    pinned in tests/test_reference_parity.py (ResidualUNet3D). Fresh init
    matches torch's ConvTranspose3d fan (weight.size(1)·k³ = out·27)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        fan = self.out_channels * 27
        bound = 1.0 / fan ** 0.5
        kernel = self.param(
            "kernel",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (3, 3, 3, in_ch, self.out_channels))
        bias = self.param("bias", torch_bias_init(fan), (self.out_channels,))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1, 1, 1),
            padding=[(1, 2)] * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return (y + bias).astype(x.dtype)


class Decoder(nn.Module):
    """Nearest-upsample to the skip's size + concat + basic module (ref :256-308).

    With ExtResNetBlock the reference switches to transposed-conv upsampling and
    summation joining (ResidualUNet3D); parity via TorchConvTranspose2x.
    """

    out_channels: int
    basic_module: str = "DoubleConv"
    conv_layer_order: str = "crg"
    num_groups: int = 8

    @nn.compact
    def __call__(self, encoder_features: jnp.ndarray, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.basic_module == "ExtResNetBlock":
            x = TorchConvTranspose2x(self.out_channels, name="upconv")(x)
            x = encoder_features + x
        else:
            x = upsample_nearest_2x(x)
            x = jnp.concatenate([encoder_features, x], axis=-1)
        mod = _BASIC_MODULES[self.basic_module]
        return mod(self.out_channels, encoder=False, order=self.conv_layer_order,
                   num_groups=self.num_groups, name="basic_module")(x, train)


class _ConvKernel(nn.Module):
    """Holds a conv kernel at the same pytree path ('conv'/'kernel'), shape,
    and initializer as SingleConv's nn.Conv, for compute paths that consume a
    TRANSFORMED kernel (fused upsample-conv): checkpoints interchange freely
    between the fused and unfused decoders, and fresh inits are identical."""

    out_channels: int
    in_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        k = self.kernel_size
        return self.param("kernel", torch_kernel_init,
                          (k, k, k, self.in_channels, self.out_channels))


class FusedUpsampleSingleConv(nn.Module):
    """'gcr' SingleConv consuming nearest-2x-UPSAMPLED input, computed on the
    PRE-upsample grid: GroupNorm (commutes with nearest repeat — duplicated
    values leave mean/variance unchanged) -> conv with the
    fuse_upsample_conv_kernel rearrangement of the canonical 3³ kernel (8·C
    output channels, full MXU lanes) -> ReLU -> depth-to-space.

    Math-identical to upsample_nearest_2x + SingleConv(order='gcr') with the
    SAME parameter tree ('groupnorm', 'conv/kernel'). On TPU it avoids
    materializing the 2x-upsampled tensor whose layout-padded (…, 2, C)
    temps dominated the phase-3 training HBM footprint (the r4 batch-16 OOM's
    largest allocation was a 2 GB broadcast at 256 MB unpadded), and runs the
    upsample-side conv at full lane utilization (the serving 'fused' variant's
    measured win, ops/fused_decoder.py)."""

    out_channels: int
    num_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train  # 'gcr' has no batchnorm
        g = _adapt_num_groups(x.shape[-1], self.num_groups)
        x = nn.GroupNorm(num_groups=g, epsilon=1e-5, name="groupnorm")(x)
        w = _ConvKernel(self.out_channels, x.shape[-1], name="conv")()
        wf = fuse_upsample_conv_kernel_jnp(w)
        x = jax.lax.conv_general_dilated(
            x, wf.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=_DN3D,
            preferred_element_type=jnp.float32).astype(x.dtype)
        x = nn.relu(x)
        return depth_to_space_2x(x, self.out_channels)


class _FusedUpsampleDoubleConv(nn.Module):
    """Decoder-side DoubleConv whose first SingleConv is the fused
    upsample-conv (conv1_out == out_channels, the encoder=False branch)."""

    out_channels: int
    order: str = "gcr"
    num_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = FusedUpsampleSingleConv(self.out_channels, self.num_groups,
                                    name="SingleConv1")(x, train)
        return SingleConv(self.out_channels, 3, self.order, self.num_groups,
                          name="SingleConv2")(x, train)


class DecoderNoJoining(nn.Module):
    """Upsample 2x + basic module, NO skip connection (ref :311-322).

    fused_upsample=True computes the upsample + first conv fused on the
    pre-upsample grid (FusedUpsampleSingleConv) — identical math and identical
    parameter tree, for TPU training memory/lane efficiency."""

    out_channels: int
    basic_module: str = "DoubleConv"
    conv_layer_order: str = "crg"
    num_groups: int = 8
    fused_upsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.fused_upsample:
            assert (self.basic_module == "DoubleConv"
                    and self.conv_layer_order == "gcr"), \
                "fused_upsample supports the shipped DoubleConv/'gcr' config"
            return _FusedUpsampleDoubleConv(
                self.out_channels, self.conv_layer_order, self.num_groups,
                name="basic_module")(x, train)
        x = upsample_nearest_2x(x)
        mod = _BASIC_MODULES[self.basic_module]
        return mod(self.out_channels, encoder=False, order=self.conv_layer_order,
                   num_groups=self.num_groups, name="basic_module")(x, train)


class Abstract3DUNet(nn.Module):
    """Base U-Net: encoder path, truncatable decoder path, optional final conv.

    Parity: reference model/unet.py:392-520 including `remove_n_final_layers`
    (truncates the decoder and switches its last kept decoder to
    StepDownDoubleConv when final_conv is off) and the `final_conv=False`
    convention of writing `out_channels` into the last decoder instead.
    """

    out_channels: int
    final_sigmoid: bool = False
    basic_module: str = "DoubleConv"
    f_maps: Any = 64
    layer_order: str = "gcr"
    num_groups: int = 8
    num_levels: int = 4
    remove_n_final_layers: int = 0
    is_segmentation: bool = False
    final_conv: bool = False
    testing: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        f_maps = self.f_maps
        if isinstance(f_maps, int):
            f_maps = number_of_features_per_level(f_maps, self.num_levels)

        encoders_features = []
        for i, out_feature_num in enumerate(f_maps):
            x = Encoder(out_feature_num, apply_pooling=(i != 0), basic_module=self.basic_module,
                        conv_layer_order=self.layer_order, num_groups=self.num_groups,
                        name=f"encoders_{i}")(x, train)
            encoders_features.insert(0, x)
        encoders_features = encoders_features[1:]

        reversed_f_maps = list(reversed(f_maps))
        if self.remove_n_final_layers > 0:
            reversed_f_maps = reversed_f_maps[: -self.remove_n_final_layers]
        reversed_f_maps_modified = list(reversed_f_maps)
        if not self.final_conv:
            reversed_f_maps_modified[-1] = self.out_channels

        for i in range(len(reversed_f_maps) - 1):
            out_feature_num = reversed_f_maps_modified[i + 1]
            last_truncated = (i == len(reversed_f_maps) - 2 and not self.final_conv
                              and self.remove_n_final_layers > 0)
            basic = "StepDownDoubleConv" if last_truncated else self.basic_module
            x = Decoder(out_feature_num, basic_module=basic,
                        conv_layer_order=self.layer_order, num_groups=self.num_groups,
                        name=f"decoders_{i}")(encoders_features[i], x, train)

        if self.final_conv:
            in_ch = x.shape[-1]
            x = nn.Conv(self.out_channels, kernel_size=(1, 1, 1), padding="VALID",
                        kernel_init=torch_kernel_init, bias_init=torch_bias_init(in_ch),
                        name="final_conv")(x)
        if self.is_segmentation and self.testing:
            x = nn.sigmoid(x) if self.final_sigmoid else nn.softmax(x, axis=-1)
        return x


class UNet3D(Abstract3DUNet):
    """Standard 3D U-Net: DoubleConv blocks + nearest upsampling (ref :523-537)."""
    basic_module: str = "DoubleConv"


class ResidualUNet3D(Abstract3DUNet):
    """Residual variant: ExtResNetBlock + transposed conv + sum join (ref :540-555)."""
    basic_module: str = "ExtResNetBlock"
    num_levels: int = 5
