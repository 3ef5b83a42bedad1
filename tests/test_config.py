"""Config system: inheritance, merge, dataset fan-out, CLI override semantics."""

import argparse

from retrieval_fuse_tpu.config import (
    CONFIG_ROOT, read_config, update_recursive, update_dataset_configs, override_config_with_args,
)


def test_update_recursive_nested_merge():
    d1 = {"a": 1, "b": {"x": 1, "y": 2}}
    update_recursive(d1, {"b": {"y": 3, "z": 4}, "c": 5})
    assert d1 == {"a": 1, "b": {"x": 1, "y": 3, "z": 4}, "c": 5}


def test_dataset_fanout_keeps_existing_keys():
    cfg = {"dataset": {"p": 1, "q": 2}, "dataset_train": {"q": 9}, "dataset_val": {}}
    update_dataset_configs(cfg)
    assert cfg["dataset_train"] == {"q": 9, "p": 1}
    assert cfg["dataset_val"] == {"p": 1, "q": 2}


def test_override_semantics_none_and_sentinel():
    cfg = {"lr": 0.1, "seed": 7}
    args = argparse.Namespace(lr=None, seed=-100, extra="x")
    override_config_with_args(cfg, args)
    assert cfg["lr"] == 0.1            # None does not override
    assert cfg["seed"] == 7            # -100 sentinel does not override
    assert cfg["extra"] == "x"         # unknown keys are added (even None-able)


def test_packaged_config_inheritance_resolves():
    cfg = read_config(CONFIG_ROOT / "super_resolution" / "ShapeNetV2" / "retrieval_008_064.yaml")
    # leaf overrides win
    assert cfg["retrieval_training"]["batch_size"] == 128
    assert cfg["retrieval_training"]["iou_scaling"] is True
    # base keys survive
    assert cfg["retrieval_model"]["network_input"] == "2+1"
    assert cfg["dataset_train"]["patch_size_target"] == 16
    assert cfg["dataset_train"]["patch_context_target"] == 8
    # dataset block fanned out and deleted
    assert "dataset" not in cfg
    assert cfg["dataset_val"]["dataset_name"] == "ShapeNetV2"
    assert cfg["dataset_train"]["occupancy_threshold"] == 0
    assert cfg["dataset_val"]["occupancy_threshold"] == -1


def test_refinement_config_resolves():
    cfg = read_config(CONFIG_ROOT / "super_resolution" / "ShapeNetV2" / "refinement_008_064.yaml")
    assert cfg["nf"] == 16
    assert cfg["K"] == 4
    assert cfg["attn_patch_extent"] == 4
    assert cfg["dataset_train"]["patch_size_target"] == 64
    assert cfg["scheduler"] == [110, 125]


def test_all_packaged_leaf_configs_resolve():
    import yaml
    leaves = sorted(CONFIG_ROOT.glob("s*/**/*.yaml"))
    assert len(leaves) == 12  # 2 tasks x 3 datasets x {retrieval, refinement}
    for leaf in leaves:
        cfg = read_config(leaf)
        assert "dataset" not in cfg
        for d in ("dataset_train", "dataset_val"):
            assert cfg[d]["dataset_name"] is not None
            assert cfg[d]["patch_size_target"] > 0
        if "retrieval_model" in cfg:
            assert cfg["retrieval_model"]["latent_dim"] == 64


def test_encoder_codes_in_all_retrieval_configs_are_known():
    from retrieval_fuse_tpu.models.encoders import INPUT_CODE_TO_ENCODER, TARGET_CODE_TO_ENCODER
    for leaf in CONFIG_ROOT.glob("s*/**/retrieval_*.yaml"):
        cfg = read_config(leaf)
        rm = cfg["retrieval_model"]
        assert rm["network_input"] in INPUT_CODE_TO_ENCODER, leaf
        assert rm["network_target"] in TARGET_CODE_TO_ENCODER, leaf
