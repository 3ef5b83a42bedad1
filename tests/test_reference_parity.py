"""Reference-in-the-loop golden parity.

These tests import the ACTUAL reference implementation from /root/reference
(torch, CPU), transfer its randomly-initialized weights into our flax modules
through retrieval_fuse_tpu.utils.torch_import (the shipped checkpoint
converter), and assert output equality. Unlike tests/test_torch_parity.py
(which rebuilds torch models from OUR spec tables), a mistranscribed kernel
size, channel plan, or loss formula anywhere in this repo fails HERE against
the reference source itself.

Coverage: all 14 patch encoders (model/retrieval.py), every refinement
backbone + decoder (model/refinement.py via model/unet.py), the attention
block and the full PatchedAttentionBlock in both softmax and (deterministic)
gumbel retrieval mode (model/attention.py), NT-Xent with and without
IoU-scaled temperatures (model/loss.py), and the normal cosine similarity.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_loader import load_reference, deterministic_gumbel_hard

from retrieval_fuse_tpu.models.encoders import make_encoder
from retrieval_fuse_tpu.utils.torch_import import (
    import_conv_encoder, import_conv_encoder_stats, import_mlp_encoder,
    import_superres08_backbone, import_superres16_backbone,
    import_surface_recon_backbone, import_final_decoder,
    import_retrieval_backbone, import_patched_attention_block,
)

load_reference()

KEY = jax.random.PRNGKey(0)


def sd_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def nchw(x):  # ours (B, D, H, W, C) -> torch (B, C, D, H, W)
    return torch.from_numpy(np.asarray(x)).permute(0, 4, 1, 2, 3).contiguous()


def to_last(t):  # torch (B, C, D, H, W) -> (B, D, H, W, C)
    return t.detach().permute(0, 2, 3, 4, 1).numpy()


# --------------------------------------------------------------- encoders

# (reference class name, input side length, n conv layers | None for MLP)
ENCODER_CASES = [
    ("Patch04", 4, None), ("Patch04V2", 4, None), ("Patch05", 5, None),
    ("Patch08", 8, 4), ("Patch12", 12, 6), ("Patch16", 16, 7),
    ("Patch24", 24, 7), ("Patch24V2", 24, 7), ("Patch32", 32, 6),
    ("PCPatch32", 32, 7), ("PCPatch48", 48, 7), ("PCPatch64", 64, 7),
    ("PatchNorm08", 8, 4), ("PatchNorm32", 32, 6),
]


@pytest.mark.parametrize("name,size,n_convs", ENCODER_CASES,
                         ids=[c[0] for c in ENCODER_CASES])
def test_encoder_matches_reference(name, size, n_convs):
    """Every reference patch encoder (model/retrieval.py:4-388), weights
    transferred via torch_import, output equality at f32."""
    from model import retrieval as ref_retrieval
    nf, z = 2, 8
    ref = getattr(ref_retrieval, name)(nf, z).eval()
    x = np.random.default_rng(hash(name) % 2**31).standard_normal(
        (2, size, size, size, 1)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(nchw(x)).numpy().reshape(2, z)

    sd = sd_numpy(ref)
    ours = make_encoder(name, nf, z)
    if n_convs is None:
        variables = {"params": import_mlp_encoder(sd)}
    else:
        variables = {"params": import_conv_encoder(sd, n_convs)}
        stats = import_conv_encoder_stats(sd)
        if stats:
            variables["batch_stats"] = stats
    out_ours = np.asarray(ours.apply(variables, jnp.asarray(x))).reshape(2, z)
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4, rtol=1e-4)


def test_batchnorm_encoder_running_stats_transfer():
    """PatchNorm08 after a torch train-mode forward (running stats mutated):
    eval outputs still match — proves import_conv_encoder_stats carries the
    running mean/var, not just scale/bias."""
    from model import retrieval as ref_retrieval
    nf, z = 2, 8
    ref = getattr(ref_retrieval, "PatchNorm08")(nf, z)
    rng = np.random.default_rng(11)
    with torch.no_grad():
        ref.train()
        for _ in range(3):  # mutate running stats away from 0/1 defaults
            ref(nchw(rng.standard_normal((4, 8, 8, 8, 1)).astype(np.float32) * 2 + 1))
        ref.eval()
        x = rng.standard_normal((2, 8, 8, 8, 1)).astype(np.float32)
        out_ref = ref(nchw(x)).numpy().reshape(2, z)
    sd = sd_numpy(ref)
    ours = make_encoder("PatchNorm08", nf, z)
    variables = {"params": import_conv_encoder(sd, 4),
                 "batch_stats": import_conv_encoder_stats(sd)}
    out_ours = np.asarray(ours.apply(variables, jnp.asarray(x))).reshape(2, z)
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4, rtol=1e-4)


# ----------------------------------------------------- refinement backbones

def test_superres08_backbone_matches_reference():
    import model as ref_model
    nf = 4
    ref = ref_model.Superresolution08UNetBackbone(nf, num_levels=4, layer_order="gcr").eval()
    x = np.random.default_rng(1).standard_normal((1, 8, 8, 8, 1)).astype(np.float32)
    with torch.no_grad():
        out_ref = to_last(ref(nchw(x)))
    from retrieval_fuse_tpu.models.refinement import Superresolution08UNetBackbone
    ours = Superresolution08UNetBackbone(nf=nf, num_levels=4, layer_order="gcr")
    params = import_superres08_backbone(sd_numpy(ref))
    out_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    assert out_ours.shape == out_ref.shape == (1, 32, 32, 32, nf)
    np.testing.assert_allclose(out_ours, out_ref, atol=5e-4, rtol=1e-4)


def test_superres16_backbone_matches_reference():
    import model as ref_model
    nf = 4
    ref = ref_model.Superresolution16UNetBackbone(nf, num_levels=4, layer_order="gcr").eval()
    x = np.random.default_rng(2).standard_normal((1, 16, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        out_ref = to_last(ref(nchw(x)))
    from retrieval_fuse_tpu.models.refinement import Superresolution16UNetBackbone
    ours = Superresolution16UNetBackbone(nf=nf, num_levels=4, layer_order="gcr")
    params = import_superres16_backbone(sd_numpy(ref))
    out_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    assert out_ours.shape == out_ref.shape == (1, 32, 32, 32, nf)
    np.testing.assert_allclose(out_ours, out_ref, atol=5e-4, rtol=1e-4)


def test_surface_recon_backbone_matches_reference():
    """Shipped geometry: 128³ pc-occupancy grid -> 32³ features, 5 levels,
    remove_n_final_layers=2 incl. the StepDownDoubleConv switch."""
    import model as ref_model
    nf = 4
    # the reference module inits from torch's (unseeded) global RNG; pin it so
    # the 2e-3 reduction-order tolerance below is deterministic, not per-run
    torch.manual_seed(3)
    ref = ref_model.SurfaceReconstructionUNetBackbone(nf, num_levels=5, layer_order="gcr").eval()
    x = (np.random.default_rng(3).random((1, 128, 128, 128, 1)) < 0.02).astype(np.float32)
    with torch.no_grad():
        out_ref = to_last(ref(nchw(x)))
    from retrieval_fuse_tpu.models.refinement import SurfaceReconstructionUNetBackbone
    ours = SurfaceReconstructionUNetBackbone(nf=nf, num_levels=5, layer_order="gcr")
    params = import_surface_recon_backbone(sd_numpy(ref))
    out_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    assert out_ours.shape == out_ref.shape == (1, 32, 32, 32, nf)
    # 5 levels of f32 convs over 128³: XLA vs torch reduction order drifts a
    # handful of elements to ~1e-3 of values around 0.4 — structural parity
    # holds (a wrong channel plan or layer order diverges by O(1))
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-3, rtol=1e-4)


def _ref_residual_unet3d(**kwargs):
    """Reference ResidualUNet3D with its latent vendored bug shimmed: the
    reference's Encoder/Decoder pass `encoder=True/False` to every
    basic_module (model/unet.py:243, :292), but its ExtResNetBlock.__init__
    (:171) doesn't accept the kwarg — the residual family is dead code
    upstream, raising TypeError on construction. The shim drops the kwarg
    (ExtResNetBlock is encoder/decoder-symmetric by design, matching
    upstream pytorch-3dunet), giving the evidently intended semantics to
    value-test against."""
    import model.unet as ref_unet

    class PatchedExtResNetBlock(ref_unet.ExtResNetBlock):
        def __init__(self, in_channels, out_channels, encoder=None, **kw):
            del encoder
            super().__init__(in_channels, out_channels, **kw)

    return ref_unet.Abstract3DUNet(basic_module=PatchedExtResNetBlock,
                                   final_sigmoid=False, **kwargs)


def test_residual_unet3d_matches_reference():
    """ResidualUNet3D family (VERDICT r4 item 7): ExtResNetBlock encoders,
    transposed-conv upsampling (TorchConvTranspose2x — the exact correlation
    form of torch ConvTranspose3d(k=3, s=2, p=1, output_size=2D)), summation
    joining. Weights imported via import_unet3d's upconv branch, value parity
    vs the reference torch module (ref model/unet.py:540-555, 313-339)."""
    ref = _ref_residual_unet3d(in_channels=1, out_channels=4,
                               f_maps=8, layer_order="cge", num_groups=4,
                               num_levels=3, is_segmentation=False,
                               final_conv=True).eval()
    x = np.random.default_rng(6).standard_normal((2, 16, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        out_ref = to_last(ref(nchw(x)))
    from retrieval_fuse_tpu.models.unet import ResidualUNet3D
    from retrieval_fuse_tpu.utils.torch_import import import_unet3d
    ours = ResidualUNet3D(out_channels=4, f_maps=8, layer_order="cge",
                          num_groups=4, num_levels=3, final_conv=True)
    params = import_unet3d(sd_numpy(ref))
    out_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    assert out_ours.shape == out_ref.shape == (2, 16, 16, 16, 4)
    np.testing.assert_allclose(out_ours, out_ref, atol=5e-4, rtol=1e-4)


# NOTE: final_conv=False + residual basic module is unbuildable in the
# reference even past the kwarg shim — summation joining adds the skip (f_maps
# channels) to the modified last decoder's out_channels (model/unet.py:308
# RuntimeError), so only the final_conv=True residual configuration has
# reference semantics to pin. Our Decoder mirrors the same channel plan and
# fails the same shape check — parity extends to the unbuildable combination.


def test_retrieval_backbone_matches_reference():
    import model as ref_model
    nf = 4
    ref = ref_model.RetrievalUNetBackbone(nf=nf, f_maps=nf, num_levels=4, layer_order="gcr").eval()
    x = np.random.default_rng(4).standard_normal((3, 16, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        out_ref = to_last(ref(nchw(x)))
    from retrieval_fuse_tpu.models.refinement import RetrievalUNetBackbone
    ours = RetrievalUNetBackbone(nf=nf, f_maps=nf, num_levels=4, layer_order="gcr")
    params = import_retrieval_backbone(sd_numpy(ref))
    out_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    assert out_ours.shape == out_ref.shape == (3, 8, 8, 8, nf)
    np.testing.assert_allclose(out_ours, out_ref, atol=5e-4, rtol=1e-4)


def test_final_decoder_matches_reference():
    import model as ref_model
    nf = 4
    ref = ref_model.Superresolution08FinalDecoder(nf, layer_order="gcr").eval()
    x = np.random.default_rng(5).standard_normal((2, 32, 32, 32, nf)).astype(np.float32)
    with torch.no_grad():
        out_ref = to_last(ref(nchw(x)))
    from retrieval_fuse_tpu.models.refinement import Superresolution08FinalDecoder
    ours = Superresolution08FinalDecoder(nf=nf, layer_order="gcr")
    params = import_final_decoder(sd_numpy(ref))
    out_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    assert out_ours.shape == out_ref.shape == (2, 64, 64, 64, 1)
    np.testing.assert_allclose(out_ours, out_ref, atol=5e-4, rtol=1e-4)


# ----------------------------------------------------------------- attention

def _make_attention_pair(nf, num_patch_x, extent, K, retrieval_mode,
                         no_output_mapping=True, blend=True):
    from model.attention import AttentionBlock as RefAttn, PatchedAttentionBlock as RefPAB
    from retrieval_fuse_tpu.models.attention import PatchedAttentionBlock
    ref_blk = RefAttn(nf, extent, K, normalize=True, use_switching=True,
                      retrieval_mode=retrieval_mode,
                      no_output_mapping=no_output_mapping, blend=blend)
    ref = RefPAB(nf, num_patch_x, extent, K, ref_blk).eval()
    ours = PatchedAttentionBlock(
        nf=nf, num_patch_x=num_patch_x, patch_extent=extent,
        num_nearest_neighbors=K,
        attention_kwargs=dict(normalize=True, use_switching=True,
                              retrieval_mode=retrieval_mode,
                              no_output_mapping=no_output_mapping, blend=blend,
                              deterministic_selection=True))
    params = import_patched_attention_block(sd_numpy(ref), extent)
    return ref, ours, params


@pytest.mark.parametrize("retrieval_mode,no_output_mapping", [
    (False, True), (True, True), (False, False),
], ids=["softmax", "gumbel-det", "softmax+gconv"])
def test_patched_attention_block_matches_reference(retrieval_mode, no_output_mapping):
    """Full unfold -> K-way attention -> fold vs the reference's
    nn.Fold/unfold pipeline (model/attention.py:119-157). Gumbel noise is not
    shareable across frameworks, so the retrieval-mode case compares with
    torch's gumbel_softmax patched to deterministic hard argmax against our
    deterministic_selection=True path — everything except the noise itself."""
    nf, r, e, k = 4, 4, 2, 3
    s = r * e
    ref, ours, params = _make_attention_pair(nf, r, e, k, retrieval_mode,
                                             no_output_mapping=no_output_mapping)
    rng = np.random.default_rng(7)
    b = 2
    x = rng.standard_normal((b, s, s, s, nf)).astype(np.float32)
    p = rng.standard_normal((b * k, s, s, s, nf)).astype(np.float32)
    with torch.no_grad(), deterministic_gumbel_hard():
        out_ref = to_last(ref(nchw(x), nchw(p)))
    out_ours = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(p),
        rngs={"gumbel": jax.random.PRNGKey(0)}))
    assert out_ours.shape == out_ref.shape == (b, s, s, s, nf)
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-4, rtol=1e-4)


def test_attention_get_features_matches_reference():
    """Contrastive-side features + occupancy flags (model/attention.py:132-139)."""
    nf, r, e, k = 4, 4, 2, 3
    s = r * e
    ref, ours, params = _make_attention_pair(nf, r, e, k, retrieval_mode=True)
    rng = np.random.default_rng(9)
    b = 2
    x = rng.standard_normal((b, s, s, s, nf)).astype(np.float32)
    t = rng.standard_normal((b, s, s, s, nf)).astype(np.float32)
    occ = (rng.random((b, s, s, s, 1)) < 0.3)
    with torch.no_grad():
        f_ref, p_ref, o_ref = ref.get_features(
            nchw(x), nchw(t), nchw(occ.astype(np.float32)).bool())
    f_ours, p_ours, o_ours = ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(occ),
        method=ours.get_features)
    np.testing.assert_allclose(np.asarray(f_ours), f_ref.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p_ours), p_ref.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(o_ours), o_ref.numpy())


# -------------------------------------------------------------------- losses

@pytest.mark.parametrize("use_iou", [False, True], ids=["plain", "iou-scaled"])
def test_nt_xent_matches_reference(use_iou):
    from model.loss import NTXentLoss
    from retrieval_fuse_tpu.models.losses import nt_xent_loss
    n, c, temp = 16, 8, 0.3
    rng = np.random.default_rng(13)
    zis = rng.standard_normal((n, c)).astype(np.float32)
    zjs = rng.standard_normal((n, c)).astype(np.float32)
    iou = None
    iou_t = None
    if use_iou:
        m = rng.random((n, n)).astype(np.float32)
        iou = np.tile(m, (2, 2))
        iou_t = torch.from_numpy(iou)
    ref_loss = NTXentLoss(temp, use_cosine_similarity=True)
    with torch.no_grad():
        out_ref = float(ref_loss(torch.from_numpy(zis), torch.from_numpy(zjs), iou_t))
    out_ours = float(nt_xent_loss(jnp.asarray(zis), jnp.asarray(zjs), temp,
                                  jnp.asarray(iou) if use_iou else None))
    assert abs(out_ours - out_ref) < 1e-5, (out_ours, out_ref)


# ------------------------------------------------- full refinement forward

def test_forward_full_matches_reference_composition(synth_superres_root, tmp_path, monkeypatch):
    """End-to-end refinement forward (unfold -> encode -> fold -> attend ->
    decode, x3 outputs + contrastive features): our RefinementTrainer's
    forward_full vs a composition of the REAL reference modules wired exactly
    as trainer/train_refinement.py:108-120 (same factories driven by the same
    config, weights transferred with import_refinement_checkpoint). Gumbel is
    made deterministic on both sides."""
    import model as ref_model
    from model.attention import Unfold3D as RefUnfold3D, Fold3D as RefFold3D
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    from retrieval_fuse_tpu.train.refinement_trainer import RefinementTrainer
    from retrieval_fuse_tpu.utils.torch_import import import_refinement_checkpoint

    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    nf, K = 4, 2
    cfg.update(nf=nf, K=K, batch_size=1, unet_num_level=4, retrieval_fmaps=4,
               retrieval_num_level=4, experiment="test_ref_parity")
    for d in ("dataset_train", "dataset_val"):
        cfg[d].update(patch_size_input=8, patch_context_input=0, patch_size_target=64,
                      patch_context_target=0, patch_stride=64)

    torch.manual_seed(0)
    ub = ref_model.get_unet_backbone(cfg).eval()
    dec = ref_model.get_decoder(cfg).eval()
    rb = ref_model.get_retrieval_backbone(cfg).eval()
    pab = ref_model.get_attention_block(cfg).eval()

    sd = {}
    for prefix, mod in [("unet_backbone", ub), ("decoder", dec),
                        ("retrieval_backbone", rb), ("patched_attention_block", pab)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    params = import_refinement_checkpoint(
        sd, task="superresolution", input_chunk_size=8,
        attn_patch_extent=cfg["attn_patch_extent"])

    trainer = RefinementTrainer(cfg, enable_vis=False, deterministic_attention=True)
    trunc = float(trainer.scene_handlers["train"].target_trunc)
    voxel = float(trainer.scene_handlers["train"].target_voxel_size)

    rng = np.random.default_rng(21)
    b = 1
    inp = rng.standard_normal((b, 8, 8, 8, 1)).astype(np.float32)
    tgt = rng.standard_normal((b, 64, 64, 64, 1)).astype(np.float32)
    retr = rng.standard_normal((b, K, 64, 64, 64)).astype(np.float32)

    # --- reference composition (trainer/train_refinement.py:108-120) ---
    unfold_shape = RefUnfold3D(16, 1)
    fold_features = RefFold3D(4, 8, nf)
    unfold_features = RefUnfold3D(8, nf)
    fold_shape = RefFold3D(4, 16, 1)
    with torch.no_grad(), deterministic_gumbel_hard():
        t_inp, t_tgt = nchw(inp), nchw(tgt)
        t_retr = torch.from_numpy(retr)
        x_back = ub(t_inp)
        retrievals = t_retr[:, :K].reshape(b * K, 1, 64, 64, 64)
        rpt = torch.cat([retrievals, t_tgt], dim=0)
        x_rpt = fold_features(rb(unfold_shape(rpt)))
        x_retrieval = x_rpt[: b * K]
        x_target = x_rpt[b * K:]
        x = pab(x_back, x_retrieval)
        pred_shape = dec(x)
        pred_retr = fold_shape(dec(unfold_features(x_target)))
        pred_back = dec(x_back)
        pred_back_df = (pred_back + 1) * trunc / 2
        occ = torch.nn.functional.max_pool3d(
            (pred_back_df <= voxel * 0.75).float(), kernel_size=2, stride=2).bool()
        fpred_ref, ftgt_ref, occ_ref = pab.get_features(x_back, x_target, occ)

    # --- ours ---
    batch = {"input": jnp.asarray(inp), "target": jnp.asarray(tgt),
             "retrieval": jnp.asarray(retr)}
    (pred_ours, back_ours, retr_ours, fpred_ours, ftgt_ours, occ_ours
     ) = trainer.forward_full(params, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(np.asarray(pred_ours), to_last(pred_shape), atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(back_ours), to_last(pred_back), atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(retr_ours), to_last(pred_retr), atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fpred_ours), fpred_ref.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ftgt_ours), ftgt_ref.numpy(), atol=1e-4, rtol=1e-3)
    # occupancy flags: thresholding at voxel*0.75 may flip individual bools on
    # framework-level float noise; demand near-total agreement
    agree = (np.asarray(occ_ours) == occ_ref.numpy()).mean()
    assert agree > 0.999, f"occupancy agreement {agree}"


def test_cosine_similarity_matches_reference():
    from model.loss import get_cosine_similarity as ref_cos
    from retrieval_fuse_tpu.models.losses import get_cosine_similarity
    rng = np.random.default_rng(17)
    pred = rng.standard_normal((2, 8, 8, 8, 3)).astype(np.float32)
    tgt = rng.standard_normal((2, 8, 8, 8, 3)).astype(np.float32)
    # zero out some voxels on both sides (the reference masks zero-norm voxels)
    pred[0, :4] = 0.0
    tgt[1, :, :3] = 0.0
    with torch.no_grad():
        out_ref = float(ref_cos(nchw(pred), nchw(tgt)))
    out_ours = float(get_cosine_similarity(jnp.asarray(pred), jnp.asarray(tgt)))
    assert abs(out_ours - out_ref) < 1e-5, (out_ours, out_ref)
