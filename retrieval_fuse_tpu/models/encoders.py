"""Retrieval patch-encoder zoo.

Covers all 13 fixed architectures of the reference (model/retrieval.py): conv
stacks with LeakyReLU(0.2), valid padding and a final Linear to the latent
dim, MLP variants for tiny patches, and BatchNorm variants. Rather than 13
near-identical classes, each architecture is a layer spec driving one generic
flax module; the public names/factory match the reference exactly.

Layout is channels-last: input (B, D, H, W, 1); output (B, 1, 1, 1, z) — the
channels-last analog of the reference's (B, z, 1, 1, 1).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from retrieval_fuse_tpu.ops.init import torch_kernel_init, torch_bias_init

# (channel multiplier of nf, kernel, stride) per conv layer — shapes verified
# against reference model/retrieval.py (valid padding, floor-div strides).
CONV_SPECS: dict[str, tuple[tuple[int, int, int], ...]] = {
    # ref model/retrieval.py:4-28 (32³ input)
    "Patch32": ((1, 5, 1), (2, 3, 1), (4, 3, 2), (8, 3, 1), (8, 3, 2), (8, 4, 1)),
    # ref :136-156 (8³)
    "Patch08": ((1, 3, 1), (4, 3, 1), (4, 3, 1), (8, 2, 1)),
    # ref :277-303 (16³)
    "Patch16": ((1, 3, 1), (2, 3, 1), (2, 3, 1), (4, 3, 1), (4, 3, 1), (8, 3, 1), (8, 4, 1)),
    # ref :306-332 (24³)
    "Patch24": ((1, 5, 1), (2, 3, 1), (2, 3, 2), (4, 3, 1), (8, 3, 1), (8, 3, 1), (8, 2, 1)),
    # ref :335-361 (24³)
    "Patch24V2": ((1, 3, 1), (2, 3, 1), (2, 3, 2), (4, 3, 1), (8, 3, 1), (8, 3, 1), (8, 3, 1)),
    # ref :364-388 (12³)
    "Patch12": ((1, 3, 1), (2, 3, 1), (4, 3, 1), (4, 3, 1), (8, 3, 1), (8, 2, 1)),
    # ref :187-213 (32³ pc grid)
    "PCPatch32": ((1, 3, 1), (2, 3, 1), (4, 3, 2), (4, 3, 1), (8, 3, 2), (8, 3, 1), (8, 3, 1)),
    # ref :217-243 (48³ pc grid)
    "PCPatch48": ((1, 5, 1), (2, 3, 1), (4, 3, 2), (4, 3, 2), (8, 3, 2), (8, 3, 1), (8, 2, 1)),
    # ref :247-273 (64³ pc grid)
    "PCPatch64": ((1, 5, 1), (2, 3, 1), (4, 3, 2), (4, 3, 2), (8, 3, 2), (8, 3, 1), (8, 4, 1)),
}

MLP_SPECS: dict[str, tuple[int, tuple[int, ...]]] = {
    # (flat input size, hidden multipliers of nf); ref :64-84, :87-107, :110-132
    "Patch04": (4 ** 3, (4, 8, 16, 8)),
    "Patch05": (5 ** 3, (4, 8, 16, 8)),
    "Patch04V2": (4 ** 3, (4, 8, 16, 16, 8)),
}


class ConvPatchEncoder(nn.Module):
    """Valid-padding conv stack + LeakyReLU(0.2) + final Linear -> latent."""

    nf: int
    z_dim: int
    spec: Sequence[tuple[int, int, int]]
    use_batchnorm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        for i, (mult, k, s) in enumerate(self.spec):
            out_ch = self.nf * mult
            x = nn.Conv(out_ch, kernel_size=(k, k, k), strides=(s, s, s), padding="VALID",
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(in_ch * k ** 3),
                        name=f"conv{i}")(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 name=f"bn{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            in_ch = out_ch
        # spatial dims must have collapsed to 1³ here (spec is size-matched)
        b = x.shape[0]
        x = x.reshape(b, -1)
        x = nn.Dense(self.z_dim, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(x.shape[-1]), name="final_layer")(x)
        return x.reshape(b, 1, 1, 1, self.z_dim)


class MLPPatchEncoder(nn.Module):
    """Flattened-input MLP with ReLU (the tiny-patch variants)."""

    nf: int
    z_dim: int
    in_size: int
    hidden: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b = x.shape[0]
        x = x.reshape(b, -1)
        fan_in = self.in_size
        for i, mult in enumerate(self.hidden):
            x = nn.Dense(self.nf * mult, kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(fan_in), name=f"fc{i}")(x)
            x = nn.relu(x)
            fan_in = self.nf * mult
        x = nn.Dense(self.z_dim, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(fan_in), name="final_layer")(x)
        return x.reshape(b, 1, 1, 1, self.z_dim)


def make_encoder(name: str, nf: int, z_dim: int) -> nn.Module:
    """Instantiate an encoder by its reference class name (incl. Norm variants)."""
    if name in MLP_SPECS:
        in_size, hidden = MLP_SPECS[name]
        return MLPPatchEncoder(nf=nf, z_dim=z_dim, in_size=in_size, hidden=hidden, name=name)
    use_bn = name.startswith("PatchNorm")
    conv_name = name.replace("PatchNorm", "Patch") if use_bn else name
    return ConvPatchEncoder(nf=nf, z_dim=z_dim, spec=CONV_SPECS[conv_name],
                            use_batchnorm=use_bn, name=name)


# network-code -> encoder-class-name maps; parity: reference model/__init__.py:6-38.
# Code format is "<patch_size>+<context>" (actual input = size + 2·context).
INPUT_CODE_TO_ENCODER = {
    "2+1": "Patch04",
    "2+1V2": "Patch04V2",
    "4+2": "Patch08",
    "4+2N": "PatchNorm08",
    "16+4": "Patch24",
    "pc_16+8": "PCPatch32",
    "pc_32+8": "PCPatch48",
    "pc_32+16": "PCPatch64",
}

TARGET_CODE_TO_ENCODER = {
    "pc_32+16": "PCPatch64",
    "8+2": "Patch12",
    "8+4": "Patch16",
    "16+4": "Patch24",
    "16+4V2": "Patch24V2",
    "16+8": "Patch32",
    "16+8N": "PatchNorm32",
}
