"""End-to-end retrieval engine: dictionary artifacts, kNN mapping semantics,
scene composition, and the retrieval trainer's train step."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset
from retrieval_fuse_tpu.retrieval.dictionary import create_dictionary, extract_input_features
from retrieval_fuse_tpu.retrieval.engine import (
    RetrievalInterface, query_dictionary_using_features, create_retrieval_from_mapping)
from retrieval_fuse_tpu.train.retrieval_trainer import RetrievalTrainer


@pytest.fixture(scope="module")
def trainer(synth_superres_root, tmp_path_factory):
    import os
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg["retrieval_training"]["batch_size"] = 8
    cfg["retrieval_model"].update(nf_input=4, nf_target=4, latent_dim=16)
    cfg["experiment"] = "test_retr"
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("retr_runs"))
    try:
        yield RetrievalTrainer(cfg, enable_vis=False)
    finally:
        os.chdir(cwd)


def test_train_step_changes_params_and_loss_finite(trainer):
    p_before = jax.tree_util.tree_leaves(trainer.state.params)[0].copy()
    trainer.fit(max_epochs=1, run_retrieval_validation=False, max_steps_per_epoch=2, save_epoch=100)
    p_after = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert not np.allclose(np.asarray(p_before), np.asarray(p_after))
    val_loss = trainer.validate(0, run_retrieval_validation=False)
    assert np.isfinite(val_loss)


def test_dictionary_artifacts(trainer, tmp_path):
    ds_train = trainer.dataset("train")
    _, encode_tgt = trainer.encoder_apply_fns()
    db = create_dictionary(encode_tgt, trainer.config["dictionary"], trainer.latent_dim,
                           ds_train, tmp_path)
    assert (tmp_path / "database.npy").exists()
    assert (tmp_path / "index.json").exists()
    assert (tmp_path / "params.json").exists()
    assert db.shape == (len(ds_train) + 1, 1 + 6 + trainer.latent_dim)
    # zero-patch row: scene_idx -1, extent [0, patch_size]³
    zrow = db[-1]
    assert zrow[0] == -1
    assert zrow[1] == 0 and zrow[2] == ds_train.target_patch_size
    # all embedding rows are unit-norm
    norms = np.linalg.norm(db[:, 7:], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # scene indices in range
    assert db[:-1, 0].min() >= 0 and db[:-1, 0].max() < len(ds_train.scenes)
    # extents stored unpadded: width == patch_size
    widths = db[:-1, 2] - db[:-1, 1]
    assert (widths == ds_train.target_patch_size).all()


def test_query_mapping_and_self_exclusion(trainer, tmp_path):
    ds_train = trainer.dataset("train")
    encode_in, encode_tgt = trainer.encoder_apply_fns()
    create_dictionary(encode_tgt, trainer.config["dictionary"], trainer.latent_dim,
                      ds_train, tmp_path)
    q_cfg = dict(trainer.config["query"])
    q_cfg["K"] = 2
    names, feats = extract_input_features(encode_in, q_cfg, trainer.latent_dim, ds_train)
    assert len(names) == len(ds_train)
    mapping = query_dictionary_using_features(q_cfg, names, feats, ds_train, tmp_path, True)
    assert set(mapping) == set(names)
    index = json.loads((tmp_path / "index.json").read_text())
    for name, rows in mapping.items():
        assert rows.shape == (2, 8)
        scene = name.split("--")[0]
        # demotion invariant (matches the reference's 2K-window semantics):
        # among kept rows, no foreign hit may appear AFTER a same-scene hit
        seen_same = False
        for k in range(2):
            sidx = int(rows[k, 0])
            is_same = sidx >= 0 and index[sidx] == scene
            if seen_same:
                assert is_same, "foreign hit ranked after a demoted same-scene hit"
            seen_same = seen_same or is_same
        assert (rows[:, 7] >= 0).all()  # squared distances


def test_compose_scene_and_zero_patch(trainer, tmp_path):
    ds_train = trainer.dataset("train")
    encode_in, encode_tgt = trainer.encoder_apply_fns()
    create_dictionary(encode_tgt, trainer.config["dictionary"], trainer.latent_dim,
                      ds_train, tmp_path)
    q_cfg = dict(trainer.config["query"], K=1)
    names, feats = extract_input_features(encode_in, q_cfg, trainer.latent_dim, ds_train)
    mapping = query_dictionary_using_features(q_cfg, names, feats, ds_train, tmp_path, False)
    scene = ds_train.scenes[0]
    vol = create_retrieval_from_mapping(scene, mapping, 1, ds_train, ds_train, tmp_path)
    size = ds_train.get_scene_size(scene)
    assert vol.shape == (1,) + tuple(size)
    # pasted values come from real scenes: finite, within [0, trunc]
    assert np.isfinite(vol).all()
    assert vol.max() <= ds_train.target_trunc + 1e-5

    # zero-patch row pastes trunc everywhere
    forced = {n: np.array([[-1, 0, 16, 0, 16, 0, 16, 0.5]], dtype=np.float64) for n in names}
    vol_z = create_retrieval_from_mapping(scene, forced, 1, ds_train, ds_train, tmp_path)
    np.testing.assert_allclose(vol_z, ds_train.target_trunc, atol=1e-6)


def test_full_retrieval_validation(trainer):
    res = trainer.retrieval_validation(0, None)
    for key in ("train", "traingt", "val"):
        iou, cd, p, r = res[key]
        assert 0 <= iou <= 1 and 0 <= p <= 1 and 0 <= r <= 1
        assert np.isfinite(cd)


def test_batchnorm_encoder_variant_trains(synth_superres_root, tmp_path, monkeypatch):
    """PatchNorm* encoders carry BatchNorm running stats through the train
    step (SURVEY hard-parts item)."""
    import jax
    import numpy as np
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    cfg["retrieval_training"]["batch_size"] = 8
    # BatchNorm exercised via the target encoder (16+8N -> PatchNorm32); the
    # input geometry stays the dataset's 2+1 MLP
    cfg["retrieval_model"].update(network_input="2+1", network_target="16+8N",
                                  nf_input=4, nf_target=4, latent_dim=16)
    cfg["experiment"] = "test_bn"
    tr = RetrievalTrainer(cfg, enable_vis=False)
    assert tr.has_batch_stats
    stats_before = jax.tree_util.tree_leaves(tr.state.batch_stats)
    means_before = [np.asarray(x).copy() for x in stats_before]
    tr.fit(max_epochs=1, run_retrieval_validation=False, max_steps_per_epoch=2, save_epoch=100)
    stats_after = jax.tree_util.tree_leaves(tr.state.batch_stats)
    # running stats updated by training
    assert any(not np.allclose(a, b) for a, b in zip(means_before, stats_after))
    val = tr.validate(0, run_retrieval_validation=False)
    assert np.isfinite(val)


def test_compose_overlapping_stride_distance_priority(synth_superres_root, tmp_path, monkeypatch):
    """With stride < patch size, overlapping regions keep the LOWEST-distance
    patch via the running distance volume (ref util/retrieval.py:148-164)."""
    import json
    from retrieval_fuse_tpu.data.synthetic import make_synthetic_config
    monkeypatch.chdir(tmp_path)
    cfg = make_synthetic_config(synth_superres_root, task="superresolution")
    # overlapping: stride 8 < patch 16 (context 0 keeps the math transparent)
    for d in ("dataset_train", "dataset_val"):
        cfg[d].update(patch_stride=8, patch_context_target=0, patch_context_input=0,
                      patch_size_input=2, occupancy_threshold=-1)
    from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset
    sh = SceneHandler("train", cfg)
    ds = PatchedSceneDataset("train", cfg["dataset_train"], sh)
    assert not ds.no_overlap
    scene = ds.scenes[0]
    tree = tmp_path / "tree"
    tree.mkdir()
    (tree / "index.json").write_text(json.dumps(ds.scenes))
    # synthetic mapping: patch at x0==0 retrieves scene 0's [0,16)³ region with
    # LOW distance; every other patch retrieves scene 1's region with HIGH
    # distance — in overlaps, scene 0's content must win
    mapping = {}
    for p in ds.patch_from_scene_lookup[scene]:
        _, ext = SceneHandler.get_extent_from_name(p)
        if ext[0] == 0 and ext[2] == 0 and ext[4] == 0:
            mapping[p] = np.array([[0, 0, 16, 0, 16, 0, 16, 0.001]])
        else:
            mapping[p] = np.array([[1, 0, 16, 0, 16, 0, 16, 5.0]])
    vol = create_retrieval_from_mapping(scene, mapping, 1, ds, ds, tree)
    # the reference's priority rule compares the REGION-MEAN of the running
    # distance volume, so later patches can overwrite parts of a better
    # patch's region when their window also spans untouched (distance-100)
    # voxels; the only region guaranteed to keep the low-distance content is
    # the one covered solely by the first patch: [0:8)³
    want_low = ds.get_scene_target(ds.scenes[0])[0:8, 0:8, 0:8]
    np.testing.assert_allclose(vol[0, 0:8, 0:8, 0:8], want_low, atol=1e-6)
    # interior block [40:48)³: its last overlapping writer in enumeration
    # order is the patch at (40,40,40) (its region mean still includes
    # untouched distance-100 voxels, so it pastes), mapping scene 1's [0:8)³
    want_high = ds.get_scene_target(ds.scenes[1])[0:8, 0:8, 0:8]
    np.testing.assert_allclose(vol[0, 40:48, 40:48, 40:48], want_high, atol=1e-6)


def test_native_compose_matches_numpy(trainer, tmp_path):
    """C++ compose kernel produces identical volumes to the numpy path,
    including overlapping-stride priority semantics."""
    ds_train = trainer.dataset("train")
    encode_in, encode_tgt = trainer.encoder_apply_fns()
    create_dictionary(encode_tgt, trainer.config["dictionary"], trainer.latent_dim,
                      ds_train, tmp_path)
    q_cfg = dict(trainer.config["query"], K=2)
    names, feats = extract_input_features(encode_in, q_cfg, trainer.latent_dim, ds_train)
    mapping = query_dictionary_using_features(q_cfg, names, feats, ds_train, tmp_path, False)
    scene = ds_train.scenes[0]
    vol_np = create_retrieval_from_mapping(scene, mapping, 2, ds_train, ds_train, tmp_path)
    vol_cc = create_retrieval_from_mapping(scene, mapping, 2, ds_train, ds_train, tmp_path,
                                           use_native=True)
    np.testing.assert_allclose(vol_cc, vol_np, atol=1e-6)
