"""Serving engine: end-to-end shape/semantics, and exact equivalence of the
feature-bank fast path vs the re-encode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_fuse_tpu.inference import RetrieveRefineEngine, build_patch_bank_from_dataset
from retrieval_fuse_tpu.models import (
    get_retrieval_networks, get_unet_backbone, get_decoder, get_retrieval_backbone,
    get_attention_block)

CFG = {
    "task": "superresolution", "K": 2, "nf": 4, "unet_num_level": 4, "layer_order": "gcr",
    "retrieval_fmaps": 4, "retrieval_num_level": 4, "attn_normalize": True,
    "attn_use_switching": True, "attn_retrieval_mode": True, "attn_no_output_mapping": True,
    "attn_blend": True, "attn_patch_extent": 4, "attn_num_patch": 16,
    "retrieval_model": {"network_input": "2+1", "network_target": "16+8",
                        "nf_input": 4, "nf_target": 4, "latent_dim": 16},
    "dataset_train": {"input_chunk_size": 8, "target_chunk_size": 64,
                      "input_mean": 0.3, "input_std": 0.15,
                      "target_mean": 0.06, "target_std": 0.01,
                      "voxel_size_input": 0.166667, "voxel_size_target": 0.020834},
}


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    fenc_in, _ = get_retrieval_networks(CFG["retrieval_model"])
    unet = get_unet_backbone(CFG)
    dec = get_decoder(CFG)
    rb = get_retrieval_backbone(CFG)
    attn = get_attention_block(CFG, deterministic_selection=True)
    params = {
        "fenc_input": fenc_in.init(ks[0], jnp.zeros((1, 4, 4, 4, 1)))["params"],
        "unet_backbone": unet.init(ks[1], jnp.zeros((1, 8, 8, 8, 1)))["params"],
        "decoder": dec.init(ks[2], jnp.zeros((1, 32, 32, 32, 4)))["params"],
        "retrieval_backbone": rb.init(ks[3], jnp.zeros((1, 16, 16, 16, 1)))["params"],
        "patched_attention_block": attn.init(
            {"params": ks[4], "gumbel": ks[5]},
            jnp.zeros((1, 32, 32, 32, 4)), jnp.zeros((2, 32, 32, 32, 4)))["params"],
    }
    rng = np.random.default_rng(0)
    N = 300
    db = rng.standard_normal((N, 16)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    bank = (rng.random((N, 16, 16, 16)).astype(np.float32) * 0.0625)
    x = rng.random((2, 8, 8, 8, 1)).astype(np.float32) * 0.5
    return params, db, bank, x


def test_engine_output_shape_and_range(setup):
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    out = np.asarray(eng(x))
    assert out.shape == (2, 64, 64, 64, 1)
    trunc = eng.target_trunc
    assert out.min() >= -1e-6 and out.max() <= trunc + 1e-6  # df range from tanh


def test_feature_bank_equals_reencode(setup):
    params, db, bank, x = setup
    eng_fast = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                    use_feature_bank=True)
    eng_slow = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                    use_feature_bank=False)
    out_fast = np.asarray(eng_fast(x))
    out_slow = np.asarray(eng_slow(x))
    np.testing.assert_allclose(out_fast, out_slow, atol=2e-5)


def test_bf16_engine_accuracy_within_budget(setup):
    """bf16 fidelity audit (BASELINE.md budget): the bf16 serving engine's TSDF
    output vs the f32 engine on identical weights/inputs/database. The ≤1e-3
    MAE budget is in df units (trunc ≈ 0.0625 here); bf16's ~8-bit mantissa on
    the tanh output maps to ~1.2e-4 df resolution, so the budget holds with
    margin — this test pins it."""
    params, db, bank, x = setup
    eng32 = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True)
    eng16 = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.bfloat16,
                                 use_feature_bank=True)
    o32 = np.asarray(eng32(x))
    o16 = np.asarray(eng16(x))
    mae = float(np.abs(o32 - o16).mean())
    mx = float(np.abs(o32 - o16).max())
    print(f"bf16-vs-f32: MAE={mae:.2e} max={mx:.2e} (budget 1e-3)")
    assert mae < 1e-3, f"bf16 MAE {mae} blows the 1e-3 TSDF budget"


def test_build_patch_bank_tiling(synth_superres_config):
    from retrieval_fuse_tpu.data import SceneHandler, PatchedSceneDataset
    cfg = synth_superres_config
    sh = SceneHandler("train", cfg)
    ds = PatchedSceneDataset("train", cfg["dataset_train"], sh)
    bank = build_patch_bank_from_dataset(ds)
    n_scenes = len(ds.scenes)
    assert bank.shape == (n_scenes * 64, 16, 16, 16)
    # row ordering: scene-major, patch row-major — row 1 is tile (0,0,1) of scene 0
    vol = ds.get_scene_target(ds.scenes[0])
    np.testing.assert_allclose(bank[1], vol[0:16, 0:16, 16:32])


def test_engine_mesh_sharded_batch(setup):
    """Serving with the batch axis sharded over the 8-device mesh."""
    from retrieval_fuse_tpu.parallel.mesh import get_mesh
    params, db, bank, _ = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, mesh=get_mesh(),
                               compute_dtype=jnp.float32, use_feature_bank=True)
    rng = np.random.default_rng(1)
    x = rng.random((8, 8, 8, 8, 1)).astype(np.float32) * 0.5
    out = np.asarray(eng(x))
    assert out.shape == (8, 64, 64, 64, 1)
    # must equal the unsharded result
    eng1 = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                use_feature_bank=True)
    np.testing.assert_allclose(out, np.asarray(eng1(x)), atol=1e-5)


def test_engine_16cubed_input_geometry(setup):
    """Matterport-style geometry: 16³ input chunks, 4+2 patch encoder."""
    from retrieval_fuse_tpu.models.encoders import make_encoder
    params, db, bank, _ = setup
    cfg = dict(CFG)
    cfg["retrieval_model"] = dict(CFG["retrieval_model"], network_input="4+2")
    cfg["dataset_train"] = dict(CFG["dataset_train"], input_chunk_size=16)
    cfg["retrieval_patch_size_input"] = 4
    cfg["retrieval_patch_context_input"] = 2
    params = dict(params)
    enc = make_encoder("Patch08", 4, 16)
    params["fenc_input"] = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)))["params"]
    # 16³ input selects the Superresolution16 backbone — init matching params
    from retrieval_fuse_tpu.models import get_unet_backbone
    bb16 = get_unet_backbone(cfg)
    params["unet_backbone"] = bb16.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 16, 1)))["params"]
    eng = RetrieveRefineEngine(cfg, params, db, bank, compute_dtype=jnp.float32)
    x = np.random.default_rng(2).random((2, 16, 16, 16, 1)).astype(np.float32) * 0.5
    out = np.asarray(eng(x))
    assert out.shape == (2, 64, 64, 64, 1)


def test_pallas_attention_engine_equals_flax(setup):
    """Serving with the fused Pallas attention kernel (interpret mode on CPU)
    must reproduce the flax-module engine exactly."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_p = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True, use_pallas_attention=True)
    out = np.asarray(eng(x))
    out_p = np.asarray(eng_p(x))
    np.testing.assert_allclose(out_p, out, atol=2e-5)


def test_fused_decoder_engine_equals_flax(setup):
    """Serving with the fused upsample+conv decoder must reproduce the
    flax-decoder engine."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_f = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True, use_fused_decoder=True)
    np.testing.assert_allclose(np.asarray(eng_f(x)), np.asarray(eng(x)), atol=2e-5)


def test_packed_decoder_engine_equals_flax(setup):
    """Serving with the fully packed decoder (second conv + head on the 32³
    grid) must reproduce the flax-decoder engine."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_p = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True, use_packed_decoder=True)
    np.testing.assert_allclose(np.asarray(eng_p(x)), np.asarray(eng(x)), atol=2e-5)


def test_compact_decoder_engine_equals_flax(setup):
    """Serving with the Pallas compact packed decoder (in-VMEM im2col
    conv2+head, the bench 'cdec' variant) must reproduce the flax-decoder
    engine."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_c = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True,
                                 use_packed_decoder="compact")
    np.testing.assert_allclose(np.asarray(eng_c(x)), np.asarray(eng(x)), atol=3e-5)


def test_fused_backbone_engine_equals_flax(setup):
    """Serving with the fused backbone (fused upsample-convs + decomposed
    final conv, the bench 'fbb' variant) must reproduce the flax engine."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_b = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True, use_fused_backbone=True)
    np.testing.assert_allclose(np.asarray(eng_b(x)), np.asarray(eng(x)), atol=2e-4)


def test_decomposed_decoder_engine_equals_flax(setup):
    """Serving with the parity-decomposed second conv (the bench 'dconv'
    variant) must reproduce the flax-decoder engine."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_d = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True,
                                 use_packed_decoder="decomposed")
    np.testing.assert_allclose(np.asarray(eng_d(x)), np.asarray(eng(x)), atol=2e-5)


def test_pallas_attention_reencode_engine_equals_flax(setup):
    """The Pallas attention path in re-encode (no feature bank) mode — covers
    the volume->attention-patch packing helper."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=False)
    eng_p = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=False, use_pallas_attention=True)
    np.testing.assert_allclose(np.asarray(eng_p(x)), np.asarray(eng(x)), atol=2e-5)


def test_pallas_gathered_attention_engine_equals_flax(setup):
    """Serving with the fused-GATHER attention kernel (bank tiles DMA'd by
    top-k index inside the kernel; no XLA gather/pack/fold) must reproduce
    the flax-module engine exactly (interpret mode on CPU)."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_g = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True,
                                 use_pallas_attention="gathered")
    np.testing.assert_allclose(np.asarray(eng_g(x)), np.asarray(eng(x)), atol=2e-5)


def test_pallas_packedrows_attention_engine_equals_flax(setup):
    """Serving with the packed-row-gather attention variant (XLA gather of
    pre-packed bank rows + flat kernel over tile-major rows) must reproduce
    the flax-module engine exactly (interpret mode on CPU)."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_p = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True,
                                 use_pallas_attention="packedrows")
    np.testing.assert_allclose(np.asarray(eng_p(x)), np.asarray(eng(x)), atol=2e-5)


def test_pallas_gathered2_attention_engine_equals_flax(setup):
    """Serving with the v2 fused-gather attention kernel (GROUP tiles per
    grid step, double-buffered manual bank-row DMAs — no XLA gather, no K/t³
    swap) must reproduce the flax-module engine exactly (interpret mode on
    CPU). The test Q exercises the group-padding path."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_g2 = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                  use_feature_bank=True,
                                  use_pallas_attention="gathered2")
    np.testing.assert_allclose(np.asarray(eng_g2(x)), np.asarray(eng(x)), atol=2e-5)


def test_phibank_attention_engine_equals_flax(setup):
    """Serving with the kernel-free phibank attention (phi MLP over the
    static bank precomputed at engine build; serving = theta + small
    phi-row gather + VPU score/hard-select + ONE selected-row gather per
    output patch) must reproduce the flax-module engine exactly."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_pb = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                  use_feature_bank=True,
                                  use_pallas_attention="phibank")
    assert eng_pb.phi_bank.shape == (eng_pb.feature_bank.shape[0],
                                     eng_pb.feature_bank.shape[1], 32)
    np.testing.assert_allclose(np.asarray(eng_pb(x)), np.asarray(eng(x)), atol=2e-5)


def test_packedrows_flat_gather_engine_equals_flax(setup):
    """The 'flatg' packedrows variant (one flat take at idx·t³+t straight
    into the kernel's (Q·t³, K, F) layout — no swap transpose) must
    reproduce the flax-module engine exactly."""
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_f = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True,
                                 use_pallas_attention="packedrows",
                                 packedrows_flat_gather=True)
    np.testing.assert_allclose(np.asarray(eng_f(x)), np.asarray(eng(x)), atol=2e-5)


def test_streaming_knn_engine_equals_dense(setup):
    """Forcing the streaming Pallas kNN (interpret mode on CPU) must leave the
    engine output identical — the auto-selection (>=1M rows) swaps search
    engines, never results. Also pins that a small database auto-selects the
    dense path and a crossover-sized one auto-selects streaming."""
    from retrieval_fuse_tpu.ops.knn import use_streaming_knn
    params, db, bank, x = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                               use_feature_bank=True)
    eng_s = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                 use_feature_bank=True, streaming_knn=True)
    assert not eng.streaming_knn and eng_s.streaming_knn
    np.testing.assert_allclose(np.asarray(eng_s(x)), np.asarray(eng(x)), atol=2e-5)
    assert not use_streaming_knn(db.shape[0])
    assert use_streaming_knn(1_000_000)
    assert use_streaming_knn(500, min_rows=400)


def test_engine_mesh_sharded_fast_variant(setup):
    """The SHIPPED fast serving variant (fused decoder + packed-row pallas
    attention — the configuration behind every headline bench number) under a
    batch sharded over the 8-device mesh must equal the unsharded flax-module
    engine. Guards pack_tile_rows' gather and _tile_major_rows against
    sharding bugs on the batch axis (VERDICT r3 missing item 2)."""
    from retrieval_fuse_tpu.parallel.mesh import get_mesh
    params, db, bank, _ = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, mesh=get_mesh(),
                               compute_dtype=jnp.float32, use_feature_bank=True,
                               use_pallas_attention="packedrows",
                               use_fused_decoder=True)
    rng = np.random.default_rng(5)
    x = rng.random((8, 8, 8, 8, 1)).astype(np.float32) * 0.5
    out = np.asarray(eng(x))
    eng_ref = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                   use_feature_bank=True)
    np.testing.assert_allclose(out, np.asarray(eng_ref(x)), atol=2e-5)


def test_engine_mesh_sharded_combined_variant(setup):
    """The round-4 combined fast variant (packed-row pallas attention +
    single-pass pallas top-k + decomposed decoder conv + fused backbone)
    under a batch sharded over the 8-device mesh must equal the unsharded
    flax-module engine."""
    from retrieval_fuse_tpu.parallel.mesh import get_mesh
    params, db, bank, _ = setup
    eng = RetrieveRefineEngine(CFG, params, db, bank, mesh=get_mesh(),
                               compute_dtype=jnp.float32, use_feature_bank=True,
                               use_pallas_attention="packedrows",
                               use_fused_decoder=True,
                               use_packed_decoder="decomposed",
                               use_fused_backbone=True, topk_impl="pallas1p")
    rng = np.random.default_rng(6)
    x = rng.random((8, 8, 8, 8, 1)).astype(np.float32) * 0.5
    eng_ref = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                   use_feature_bank=True)
    np.testing.assert_allclose(np.asarray(eng(x)), np.asarray(eng_ref(x)), atol=2e-4)


def test_topk_impl_variants_equal(setup):
    """The dense-path top-k select implementations (iterative, approx_max_k
    recall=1.0, lax.top_k, single-pass pallas) must produce identical engine
    outputs (pallas1p runs interpret-mode on CPU)."""
    params, db, bank, x = setup
    outs = {}
    for impl in ("iterative", "approx", "top_k", "pallas1p"):
        eng = RetrieveRefineEngine(CFG, params, db, bank, compute_dtype=jnp.float32,
                                   use_feature_bank=True, topk_impl=impl)
        outs[impl] = np.asarray(eng(x))
    np.testing.assert_allclose(outs["approx"], outs["iterative"], atol=2e-5)
    np.testing.assert_allclose(outs["top_k"], outs["iterative"], atol=2e-5)
    np.testing.assert_allclose(outs["pallas1p"], outs["iterative"], atol=2e-5)
