"""Model factories, mirroring the reference's config-driven selection
(model/__init__.py:6-61) with the same network codes and config keys."""

from __future__ import annotations

from retrieval_fuse_tpu.models.encoders import (
    make_encoder, INPUT_CODE_TO_ENCODER, TARGET_CODE_TO_ENCODER,
    ConvPatchEncoder, MLPPatchEncoder,
)
from retrieval_fuse_tpu.models.refinement import (
    Superresolution08UNetBackbone, Superresolution16UNetBackbone,
    SurfaceReconstructionUNetBackbone, Superresolution08FinalDecoder,
    RetrievalUNetBackbone,
)
from retrieval_fuse_tpu.models.attention import AttentionBlock, PatchedAttentionBlock
from retrieval_fuse_tpu.models.unet import UNet3D, ResidualUNet3D, DecoderNoJoining


def get_retrieval_networks(model_config: dict):
    """(fenc_input, fenc_target) from network codes (ref model/__init__.py:6-38)."""
    fenc_input = fenc_target = None
    code_in = model_config["network_input"]
    code_tgt = model_config["network_target"]
    if code_in in INPUT_CODE_TO_ENCODER:
        fenc_input = make_encoder(INPUT_CODE_TO_ENCODER[code_in],
                                  model_config["nf_input"], model_config["latent_dim"])
    if code_tgt in TARGET_CODE_TO_ENCODER:
        fenc_target = make_encoder(TARGET_CODE_TO_ENCODER[code_tgt],
                                   model_config["nf_target"], model_config["latent_dim"])
    return fenc_input, fenc_target


def get_unet_backbone(config: dict):
    if config["task"] == "superresolution":
        if config["dataset_train"]["input_chunk_size"] == 8:
            return Superresolution08UNetBackbone(
                nf=config["nf"], num_levels=config["unet_num_level"], layer_order=config["layer_order"])
        if config["dataset_train"]["input_chunk_size"] == 16:
            return Superresolution16UNetBackbone(
                nf=config["nf"], num_levels=config["unet_num_level"], layer_order=config["layer_order"])
    if config["task"] == "surface_reconstruction":
        return SurfaceReconstructionUNetBackbone(
            nf=config["nf"], num_levels=config["unet_num_level"], layer_order=config["layer_order"])
    raise ValueError(f"no backbone for task={config['task']}")


def get_decoder(config: dict):
    return Superresolution08FinalDecoder(nf=config["nf"], layer_order=config["layer_order"])


def get_retrieval_backbone(config: dict):
    return RetrievalUNetBackbone(
        nf=config["nf"], f_maps=config["retrieval_fmaps"],
        num_levels=config["retrieval_num_level"], layer_order=config["layer_order"])


def get_attention_block(config: dict, deterministic_selection: bool = False):
    attention_kwargs = dict(
        normalize=config["attn_normalize"],
        use_switching=config["attn_use_switching"],
        retrieval_mode=config["attn_retrieval_mode"],
        no_output_mapping=config["attn_no_output_mapping"],
        blend=config["attn_blend"],
        deterministic_selection=deterministic_selection,
    )
    return PatchedAttentionBlock(
        nf=config["nf"], num_patch_x=config["attn_num_patch"],
        patch_extent=config["attn_patch_extent"] // 2,
        num_nearest_neighbors=config["K"], attention_kwargs=attention_kwargs)
