"""Golden numerical parity vs PyTorch.

Independently-written torch models (built generically from OUR spec tables)
receive the flax modules' weights; outputs must match to float tolerance.
This pins down every semantic detail the reference relies on: valid/same
padding, strided conv flooring, LeakyReLU slopes, GroupNorm epsilon, nearest
upsampling, concat ordering, encoder/decoder channel plans, and the
attention score/softmax/blend math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from retrieval_fuse_tpu.models.encoders import ConvPatchEncoder, MLPPatchEncoder, CONV_SPECS, MLP_SPECS
from retrieval_fuse_tpu.models.unet import UNet3D
from retrieval_fuse_tpu.models.attention import AttentionBlock

KEY = jax.random.PRNGKey(0)


def t(x):
    return torch.from_numpy(np.asarray(x))


def nchw(x):  # (B, D, H, W, C) -> (B, C, D, H, W)
    return t(x).permute(0, 4, 1, 2, 3).contiguous()


def to_torch_conv_w(kernel):  # (kD,kH,kW,I,O) -> (O,I,kD,kH,kW)
    return t(np.asarray(kernel).transpose(4, 3, 0, 1, 2))


def to_torch_lin_w(kernel):  # (I,O) -> (O,I)
    return t(np.asarray(kernel).transpose(1, 0))


def test_conv_encoder_matches_torch():
    nf, z = 3, 8
    spec = CONV_SPECS["Patch32"]
    enc = ConvPatchEncoder(nf=nf, z_dim=z, spec=spec)
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 32, 1)).astype(np.float32)
    variables = enc.init(KEY, jnp.asarray(x))
    out_flax = np.asarray(enc.apply(variables, jnp.asarray(x))).reshape(2, z)

    p = variables["params"]
    xt = nchw(x)
    for i, (mult, k, s) in enumerate(spec):
        w = to_torch_conv_w(p[f"conv{i}"]["kernel"])
        b = t(p[f"conv{i}"]["bias"])
        xt = F.conv3d(xt, w, b, stride=s)
        xt = F.leaky_relu(xt, 0.2)
    xt = xt.reshape(2, -1)
    out_torch = (xt @ to_torch_lin_w(p["final_layer"]["kernel"]).T
                 + t(p["final_layer"]["bias"])).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-4)


def test_mlp_encoder_matches_torch():
    nf, z = 4, 8
    in_size, hidden = MLP_SPECS["Patch04"]
    enc = MLPPatchEncoder(nf=nf, z_dim=z, in_size=in_size, hidden=hidden)
    x = np.random.default_rng(1).standard_normal((3, 4, 4, 4, 1)).astype(np.float32)
    variables = enc.init(KEY, jnp.asarray(x))
    out_flax = np.asarray(enc.apply(variables, jnp.asarray(x))).reshape(3, z)

    p = variables["params"]
    xt = t(x).reshape(3, -1)
    for i in range(len(hidden)):
        xt = F.relu(xt @ to_torch_lin_w(p[f"fc{i}"]["kernel"]).T + t(p[f"fc{i}"]["bias"]))
    out_torch = (xt @ to_torch_lin_w(p["final_layer"]["kernel"]).T
                 + t(p["final_layer"]["bias"])).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-5)


def _torch_single_conv(x, p, order="gcr", num_groups=2):
    """Apply one gcr SingleConv with flax params in torch."""
    for ch in order:
        if ch == "g":
            g = num_groups if x.shape[1] >= num_groups and x.shape[1] % num_groups == 0 else 1
            x = F.group_norm(x, g, t(p["groupnorm"]["scale"]), t(p["groupnorm"]["bias"]), eps=1e-5)
        elif ch == "c":
            w = to_torch_conv_w(p["conv"]["kernel"])
            b = t(p["conv"]["bias"]) if "bias" in p["conv"] else None
            x = F.conv3d(x, w, b, padding=1)
        elif ch == "r":
            x = F.relu(x)
    return x


def test_unet3d_matches_torch():
    """Full 3-level gcr UNet3D forward cross-checked layer by layer in torch."""
    net = UNet3D(out_channels=6, f_maps=4, num_groups=2, layer_order="gcr", num_levels=3)
    x = np.random.default_rng(2).standard_normal((1, 8, 8, 8, 1)).astype(np.float32)
    variables = net.init(KEY, jnp.asarray(x))
    out_flax = np.asarray(net.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    f_maps = [4, 8, 16]
    xt = nchw(x)
    feats = []
    for i in range(3):
        if i > 0:
            xt = F.max_pool3d(xt, 2)
        bm = p[f"encoders_{i}"]["basic_module"]
        in_ch = xt.shape[1]
        out_ch = f_maps[i]
        mid = max(out_ch // 2, in_ch)
        xt = _torch_single_conv(xt, bm["SingleConv1"])
        xt = _torch_single_conv(xt, bm["SingleConv2"])
        feats.insert(0, xt)
    feats = feats[1:]
    outs = [16, 8]
    rfm_mod = [16, 8, 6]
    for i in range(2):
        bm = p[f"decoders_{i}"]["basic_module"]
        xt = F.interpolate(xt, scale_factor=2, mode="nearest")
        xt = torch.cat([feats[i], xt], dim=1)
        xt = _torch_single_conv(xt, bm["SingleConv1"])
        xt = _torch_single_conv(xt, bm["SingleConv2"])
    out_torch = xt.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=5e-4)


def test_attention_block_softmax_mode_matches_torch():
    b, k, e, c = 5, 3, 2, 4
    blk = AttentionBlock(num_output_channels=c, patch_extent=e, K=k, normalize=True,
                         retrieval_mode=False, no_output_mapping=True, blend=True)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((b, e, e, e, c)).astype(np.float32)
    pp = rng.standard_normal((b, k, e, e, e, c)).astype(np.float32)
    variables = blk.init(KEY, jnp.asarray(x), jnp.asarray(pp))
    out_flax = np.asarray(blk.apply(variables, jnp.asarray(x), jnp.asarray(pp)))

    p = variables["params"]

    def mlp(feats, params):
        xt = t(feats).reshape(feats.shape[0], -1)
        for i in range(3):
            xt = F.leaky_relu(xt @ to_torch_lin_w(params[f"fc{i}"]["kernel"]).T
                              + t(params[f"fc{i}"]["bias"]), 0.01)
        return xt @ to_torch_lin_w(params["out"]["kernel"]).T + t(params["out"]["bias"])

    xf = F.normalize(mlp(x, p["theta"]), dim=1)
    pf = F.normalize(mlp(pp.reshape(b * k, e, e, e, c), p["phi"]).reshape(b, k, -1), dim=2)
    scores = torch.einsum("bf,bkf->bk", xf, pf)
    switch = F.relu(scores.max(dim=1, keepdim=True).values)
    sharpness = 32 * e ** 3 * 4
    weights = torch.softmax(sharpness * scores, dim=1)
    g_feat = t(pp).reshape(b, k, -1)
    ws = torch.einsum("bk,bkf->bf", weights, g_feat).reshape(b, e, e, e, c)
    sw = switch.reshape(b, 1, 1, 1, 1)
    out_torch = (t(x) * (1 - sw) + ws * sw).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=1e-4)


def test_torch_import_roundtrip_conv_encoder():
    """Exporting a torch-layout state dict and importing via torch_import
    reproduces the flax params (layout transposes are involutive)."""
    from retrieval_fuse_tpu.utils.torch_import import import_conv_encoder
    nf, z = 2, 8
    spec = CONV_SPECS["Patch08"]
    enc = ConvPatchEncoder(nf=nf, z_dim=z, spec=spec)
    variables = enc.init(KEY, jnp.zeros((1, 8, 8, 8, 1)))
    p = variables["params"]
    # build a reference-style state dict (layers.{2i} convs + final_layer)
    sd = {}
    for i in range(len(spec)):
        sd[f"layers.{2 * i}.weight"] = np.asarray(p[f"conv{i}"]["kernel"]).transpose(4, 3, 0, 1, 2)
        sd[f"layers.{2 * i}.bias"] = np.asarray(p[f"conv{i}"]["bias"])
    sd["final_layer.weight"] = np.asarray(p["final_layer"]["kernel"]).transpose(1, 0)
    sd["final_layer.bias"] = np.asarray(p["final_layer"]["bias"])
    imported = import_conv_encoder(sd, n_convs=len(spec))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 8, 1)).astype(np.float32))
    out_a = enc.apply({"params": p}, x)
    out_b = enc.apply({"params": imported}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def _torch_double_conv(x, p, encoder, out_ch, num_groups=2):
    in_ch = x.shape[1]
    mid = max(out_ch // 2, in_ch) if encoder else out_ch
    x = _torch_single_conv(x, p["SingleConv1"], num_groups=num_groups)
    x = _torch_single_conv(x, p["SingleConv2"], num_groups=num_groups)
    del mid
    return x


def _torch_unet3d(x, p, f_maps, out_channels, remove_n=0, num_groups=2):
    """Generic torch evaluation of our UNet3D param tree (gcr order)."""
    feats = []
    for i in range(len(f_maps)):
        if i > 0:
            x = F.max_pool3d(x, 2)
        x = _torch_double_conv(x, p[f"encoders_{i}"]["basic_module"], True, f_maps[i], num_groups)
        feats.insert(0, x)
    feats = feats[1:]
    rfm = list(reversed(f_maps))
    if remove_n > 0:
        rfm = rfm[:-remove_n]
    rfm_mod = list(rfm)
    rfm_mod[-1] = out_channels
    for i in range(len(rfm) - 1):
        bm = p[f"decoders_{i}"]["basic_module"]
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = torch.cat([feats[i], x], dim=1)
        x = _torch_single_conv(x, bm["SingleConv1"], num_groups=num_groups)
        x = _torch_single_conv(x, bm["SingleConv2"], num_groups=num_groups)
    return x


def _torch_decoder_no_joining(x, p, num_groups=2):
    x = F.interpolate(x, scale_factor=2, mode="nearest")
    x = _torch_single_conv(x, p["basic_module"]["SingleConv1"], num_groups=num_groups)
    x = _torch_single_conv(x, p["basic_module"]["SingleConv2"], num_groups=num_groups)
    return x


def test_superres08_backbone_matches_torch():
    """Full SR08 backbone (UNet3D + two skip-free upsampling decoders)."""
    from retrieval_fuse_tpu.models.refinement import Superresolution08UNetBackbone
    nf = 4
    net = Superresolution08UNetBackbone(nf=nf, num_levels=3, layer_order="gcr")
    x = np.random.default_rng(4).standard_normal((1, 8, 8, 8, 1)).astype(np.float32)
    v = net.init(KEY, jnp.asarray(x))
    out_flax = np.asarray(net.apply(v, jnp.asarray(x)))

    p = v["params"]
    f_maps = [nf, 2 * nf, 4 * nf]
    xt = _torch_unet3d(nchw(x), p["unet"], f_maps, 2 * nf, num_groups=nf // 2)
    xt = _torch_decoder_no_joining(xt, p["up0"], num_groups=nf // 2)
    xt = _torch_decoder_no_joining(xt, p["up1"], num_groups=nf // 2)
    out_torch = xt.permute(0, 2, 3, 4, 1).numpy()
    assert out_flax.shape == out_torch.shape == (1, 32, 32, 32, nf)
    np.testing.assert_allclose(out_flax, out_torch, atol=5e-4)


def test_retrieval_backbone_matches_torch():
    """UNet3D with remove_n_final_layers=1 (truncated StepDown decoder)."""
    from retrieval_fuse_tpu.models.refinement import RetrievalUNetBackbone
    nf = 4
    net = RetrievalUNetBackbone(nf=nf, f_maps=nf, num_levels=3, layer_order="gcr")
    x = np.random.default_rng(5).standard_normal((2, 16, 16, 16, 1)).astype(np.float32)
    v = net.init(KEY, jnp.asarray(x))
    out_flax = np.asarray(net.apply(v, jnp.asarray(x)))

    p = v["params"]["unet"]
    f_maps = [nf, 2 * nf, 4 * nf]
    # encoders
    xt = nchw(x)
    feats = []
    for i in range(3):
        if i > 0:
            xt = F.max_pool3d(xt, 2)
        xt = _torch_double_conv(xt, p[f"encoders_{i}"]["basic_module"], True, f_maps[i], nf // 2)
        feats.insert(0, xt)
    feats = feats[1:]
    # single decoder (remove 1): StepDownDoubleConv after upsample+concat
    bm = p["decoders_0"]["basic_module"]
    xt = F.interpolate(xt, scale_factor=2, mode="nearest")
    xt = torch.cat([feats[0], xt], dim=1)
    xt = _torch_single_conv(xt, bm["SingleConv1"], num_groups=nf // 2)
    xt = _torch_single_conv(xt, bm["SingleConv2"], num_groups=nf // 2)
    out_torch = xt.permute(0, 2, 3, 4, 1).numpy()
    assert out_flax.shape == out_torch.shape == (2, 8, 8, 8, nf)
    np.testing.assert_allclose(out_flax, out_torch, atol=5e-4)


def test_final_decoder_matches_torch():
    from retrieval_fuse_tpu.models.refinement import Superresolution08FinalDecoder
    nf = 4
    net = Superresolution08FinalDecoder(nf=nf, layer_order="gcr")
    x = np.random.default_rng(6).standard_normal((1, 8, 8, 8, nf)).astype(np.float32)
    v = net.init(KEY, jnp.asarray(x))
    out_flax = np.asarray(net.apply(v, jnp.asarray(x)))

    p = v["params"]
    xt = _torch_decoder_no_joining(nchw(x), p["up0"], num_groups=nf // 2)
    w = to_torch_conv_w(p["final_conv"]["kernel"])
    b = t(p["final_conv"]["bias"])
    xt = torch.tanh(F.conv3d(xt, w, b))
    out_torch = xt.permute(0, 2, 3, 4, 1).numpy()
    assert out_flax.shape == out_torch.shape == (1, 16, 16, 16, 1)
    np.testing.assert_allclose(out_flax, out_torch, atol=5e-4)
