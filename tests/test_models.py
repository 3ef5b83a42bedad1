"""Models: encoder zoo shapes + conv semantics vs torch, U-Net family shapes,
attention block behavior, factory coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_fuse_tpu.models import (
    get_retrieval_networks, get_unet_backbone, get_decoder, get_retrieval_backbone,
    get_attention_block,
)
from retrieval_fuse_tpu.models.encoders import make_encoder, CONV_SPECS, MLP_SPECS
from retrieval_fuse_tpu.models.unet import UNet3D, DecoderNoJoining, upsample_nearest_2x
from retrieval_fuse_tpu.models.attention import AttentionBlock, gumbel_softmax

KEY = jax.random.PRNGKey(0)

# encoder name -> expected input side length
ENCODER_INPUT_SIZES = {
    "Patch32": 32, "Patch08": 8, "Patch16": 16, "Patch24": 24, "Patch24V2": 24,
    "Patch12": 12, "PCPatch32": 32, "PCPatch48": 48, "PCPatch64": 64,
    "Patch04": 4, "Patch05": 5, "Patch04V2": 4,
    "PatchNorm08": 8, "PatchNorm32": 32,
}


@pytest.mark.parametrize("name", sorted(ENCODER_INPUT_SIZES))
def test_encoder_shapes(name):
    size = ENCODER_INPUT_SIZES[name]
    enc = make_encoder(name, nf=4, z_dim=16)
    x = jnp.zeros((2, size, size, size, 1))
    variables = enc.init(KEY, x)
    out = enc.apply(variables, x)
    assert out.shape == (2, 1, 1, 1, 16)


def test_conv_valid_stride_matches_torch():
    """One strided VALID conv cross-checked against torch.nn.functional.conv3d."""
    import torch
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9, 9, 9, 3)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3, 3)).astype(np.float32)  # (O, I, kD, kH, kW) torch layout
    b = rng.standard_normal(4).astype(np.float32)
    want = torch.nn.functional.conv3d(
        torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2).numpy().transpose(0, 2, 3, 4, 1)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 4, 1, 0)), (2, 2, 2), "VALID",
        dimension_numbers=jax.lax.conv_dimension_numbers(x.shape, (3, 3, 3, 3, 4),
                                                         ("NDHWC", "DHWIO", "NDHWC")))
    got = np.asarray(got) + b
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upsample_nearest_matches_torch():
    import torch
    x = np.random.default_rng(0).standard_normal((1, 3, 3, 3, 2)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), scale_factor=2, mode="nearest"
    ).numpy().transpose(0, 2, 3, 4, 1)
    got = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_unet3d_shapes_basic():
    net = UNet3D(out_channels=8, f_maps=4, num_groups=2, layer_order="gcr", num_levels=3)
    x = jnp.zeros((1, 8, 8, 8, 1))
    v = net.init(KEY, x)
    out = net.apply(v, x)
    assert out.shape == (1, 8, 8, 8, 8)


def test_unet3d_remove_final_layers():
    # 16³ with 4 levels, remove 1 final decoder -> output at 8³
    # num_groups=1: the truncated StepDown decoder's mid-channel count
    # ((24+6)//2 = 15) must divide num_groups, as in the reference
    net = UNet3D(out_channels=6, f_maps=4, num_groups=1, layer_order="gcr",
                 num_levels=4, remove_n_final_layers=1)
    x = jnp.zeros((1, 16, 16, 16, 1))
    out = net.apply(net.init(KEY, x), x)
    assert out.shape == (1, 8, 8, 8, 6)


def test_decoder_no_joining_upsamples():
    dec = DecoderNoJoining(4, conv_layer_order="gcr", num_groups=2)
    x = jnp.zeros((2, 4, 4, 4, 8))
    out = dec.apply(dec.init(KEY, x), x)
    assert out.shape == (2, 8, 8, 8, 4)


SR_CONFIG = {
    "task": "superresolution", "nf": 8, "unet_num_level": 4, "layer_order": "gcr",
    "retrieval_fmaps": 8, "retrieval_num_level": 4, "K": 2,
    "attn_normalize": True, "attn_use_switching": True, "attn_retrieval_mode": True,
    "attn_no_output_mapping": True, "attn_blend": True, "attn_patch_extent": 4,
    "attn_num_patch": 16, "dataset_train": {"input_chunk_size": 8},
}


def test_superres_backbone_and_decoder_shapes():
    backbone = get_unet_backbone(SR_CONFIG)
    x = jnp.zeros((2, 8, 8, 8, 1))
    feat = backbone.apply(backbone.init(KEY, x), x)
    assert feat.shape == (2, 32, 32, 32, 8)
    decoder = get_decoder(SR_CONFIG)
    out = decoder.apply(decoder.init(KEY, feat), feat)
    assert out.shape == (2, 64, 64, 64, 1)
    assert float(jnp.abs(out).max()) <= 1.0  # tanh range


def test_surface_recon_backbone_shape():
    cfg = dict(SR_CONFIG, task="surface_reconstruction", unet_num_level=5)
    backbone = get_unet_backbone(cfg)
    x = jnp.zeros((1, 128, 128, 128, 1))
    feat = backbone.apply(backbone.init(KEY, x), x)
    assert feat.shape == (1, 32, 32, 32, 8)


def test_retrieval_backbone_shape():
    rb = get_retrieval_backbone(SR_CONFIG)
    x = jnp.zeros((3, 16, 16, 16, 1))
    out = rb.apply(rb.init(KEY, x), x)
    assert out.shape == (3, 8, 8, 8, 8)


def test_factory_all_shipped_codes():
    for code_in, code_tgt in [("2+1", "16+8"), ("pc_32+8", "16+4V2"), ("pc_32+8", "16+4")]:
        fi, ft = get_retrieval_networks({
            "network_input": code_in, "network_target": code_tgt,
            "nf_input": 4, "nf_target": 4, "latent_dim": 8})
        assert fi is not None and ft is not None


def test_gumbel_softmax_hard_is_onehot():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((10, 4)).astype(np.float32))
    w = np.asarray(gumbel_softmax(logits, jax.random.PRNGKey(1), hard=True))
    np.testing.assert_allclose(w.sum(axis=1), np.ones(10), atol=1e-5)
    # forward value is one-hot up to straight-through float cancellation
    onehot = np.eye(4, dtype=np.float32)[w.argmax(axis=1)]
    np.testing.assert_allclose(w, onehot, atol=1e-5)


def test_gumbel_softmax_straight_through_gradient():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32))

    def f(l):
        return jnp.sum(gumbel_softmax(l, jax.random.PRNGKey(0), hard=True) * jnp.arange(3.0))

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0  # gradient flows through soft path


def test_attention_block_retrieval_mode_selects_one():
    blk = AttentionBlock(num_output_channels=4, patch_extent=2, K=3, normalize=True,
                         retrieval_mode=True, no_output_mapping=True, blend=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 2, 2, 2, 4)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((5, 3, 2, 2, 2, 4)).astype(np.float32))
    v = blk.init({"params": KEY, "gumbel": jax.random.PRNGKey(2)}, x, p)
    out = blk.apply(v, x, p, rngs={"gumbel": jax.random.PRNGKey(3)})
    assert out.shape == x.shape
    # blend: out = x*(1-s) + selected*s with s in [0, inf) clipped by relu; out
    # must be a convex-ish combination of x and ONE of the K retrieved patches
    # when switch <= 1. Just check determinism wrt rng:
    out2 = blk.apply(v, x, p, rngs={"gumbel": jax.random.PRNGKey(3)})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_attention_block_softmax_mode_and_get_features():
    blk = AttentionBlock(num_output_channels=4, patch_extent=2, K=3, normalize=True,
                         retrieval_mode=False, no_output_mapping=True, blend=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 2, 2, 2, 4)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((5, 3, 2, 2, 2, 4)).astype(np.float32))
    v = blk.init(KEY, x, p)
    out = blk.apply(v, x, p)
    assert out.shape == x.shape
    xf, pf = blk.apply(v, x, x, method=blk.get_features)
    assert xf.shape == (5, 32) and pf.shape == (5, 32)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(xf, axis=1)), np.ones(5), atol=1e-5)


def test_patched_attention_block_end_to_end():
    cfg = dict(SR_CONFIG)
    pab = get_attention_block(cfg)
    rng = np.random.default_rng(0)
    B, K, S, F = 2, cfg["K"], 32, cfg["nf"]
    x_pred = jnp.asarray(rng.standard_normal((B, S, S, S, F)).astype(np.float32))
    x_retr = jnp.asarray(rng.standard_normal((B * K, S, S, S, F)).astype(np.float32))
    v = pab.init({"params": KEY, "gumbel": jax.random.PRNGKey(1)}, x_pred, x_retr)
    out = pab.apply(v, x_pred, x_retr, rngs={"gumbel": jax.random.PRNGKey(5)})
    assert out.shape == (B, S, S, S, F)
    # get_features path
    occ = jnp.asarray(rng.random((B, S, S, S, 1)) > 0.5)
    xf, pf, of = pab.apply(v, x_pred, x_pred, occ, method=pab.get_features)
    R = cfg["attn_num_patch"]
    assert xf.shape == (B * R ** 3, 32)
    assert of.shape == (B * R ** 3,)


def test_residual_unet3d_shapes():
    from retrieval_fuse_tpu.models.unet import ResidualUNet3D
    net = ResidualUNet3D(out_channels=4, f_maps=4, num_groups=2, layer_order="cge",
                         num_levels=3, final_conv=True)
    x = jnp.zeros((1, 8, 8, 8, 1))
    out = net.apply(net.init(KEY, x), x)
    assert out.shape == (1, 8, 8, 8, 4)


def test_ext_resnet_block_residual():
    from retrieval_fuse_tpu.models.unet import ExtResNetBlock
    blk = ExtResNetBlock(out_channels=4, order="cge", num_groups=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 4, 3)).astype(np.float32))
    out = blk.apply(blk.init(KEY, x), x)
    assert out.shape == (2, 4, 4, 4, 4)
