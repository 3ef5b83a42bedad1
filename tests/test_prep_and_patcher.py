"""Data-prep utilities and the generic patcher."""

import numpy as np
import jax.numpy as jnp

from retrieval_fuse_tpu.ops.patcher import Patcher, get_patch_counts
from retrieval_fuse_tpu.utils.misc import truncate_sdf


def test_patcher_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 10, 3)).astype(np.float32))
    p = Patcher(4, pad_val=7.0)
    patches = p(x)
    assert patches.shape == (2 * 27, 4, 4, 4, 3)
    y = p.recompose_patches(patches, original_shape=x.shape)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    assert get_patch_counts(10, 4) == 3


def test_truncate_sdf():
    x = np.array([-5.0, -0.1, 0.2, 9.0])
    np.testing.assert_allclose(truncate_sdf(x, 1.0), [-1, -0.1, 0.2, 1])


def test_sample_scene_point_clouds(tmp_path, synth_superres_config):
    from retrieval_fuse_tpu.data.prep import sample_scene_point_clouds
    cfg = synth_superres_config
    dtr = cfg["dataset_train"]
    # build a "full scene" df matching a val scene name prefix convention
    scenes_dir = tmp_path / "full"
    scenes_dir.mkdir()
    from retrieval_fuse_tpu.utils.misc import read_list
    from pathlib import Path
    val = read_list(Path(dtr["data_dir"], "splits", dtr["dataset_name"], dtr["splits_dir"], "val.txt"))
    name = "__".join(val[0].split("__")[:3])
    # synthetic scene: sphere df
    g = np.stack(np.meshgrid(*([np.arange(64)] * 3), indexing="ij"), -1).astype(np.float32)
    df = (np.linalg.norm(g - 31.5, axis=-1) - 12) * dtr["voxel_size_target"]
    df = np.abs(df)
    np.save(scenes_dir / f"{name}.npy", df)
    out = tmp_path / "pc_out"
    sample_scene_point_clouds(cfg, scenes_dir, 200, out, split="val")
    pts = np.load(out / f"{name}.npz")["arr_0"]
    assert pts.shape[1] == 3 and len(pts) >= 100
    # all points near the sphere surface
    r = np.linalg.norm(pts - 31.5, axis=1)
    assert np.abs(r - 12).mean() < 2.0
