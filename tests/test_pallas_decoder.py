"""CompactPackedDecoder (Pallas packed conv2+head kernel) == FusedFinalDecoder
== the flax final decoder — exact isosurface math, no (2S)³ intermediates."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.models.refinement import Superresolution08FinalDecoder
from retrieval_fuse_tpu.ops.fused_decoder import FusedFinalDecoder
from retrieval_fuse_tpu.ops.pallas_decoder import (
    CompactPackedDecoder, pack_conv2_imcol_kernel, pack_head_kernel,
    packed_decoder_tail, depth_to_space_1ch)


def _pack(x, nf):
    """(B, 2h, 2h, 2h, nf) -> packed (B, h, h, h, 8·nf) o_idx-major."""
    b, s = x.shape[0], x.shape[1]
    h = s // 2
    xp = x.reshape(b, h, 2, h, 2, h, 2, nf).transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return xp.reshape(b, h, h, h, 8 * nf)


def test_imcol_weight_equals_fullres_conv_plus_head():
    """packed_decoder_tail (interpret) == SAME conv2 + relu + 1x1 head + tanh
    on the full-res grid, including zero-pad boundaries."""
    rng = np.random.default_rng(3)
    nf, s2 = 4, 16  # full-res s2, packed s2//2
    w2 = rng.standard_normal((3, 3, 3, nf, nf)).astype(np.float32)
    wh = rng.standard_normal((nf, 1)).astype(np.float32)
    bh = 0.37
    x = rng.standard_normal((2, s2, s2, s2, nf)).astype(np.float32)
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                        ("NDHWC", "DHWIO", "NDHWC"))
    z = jax.nn.relu(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w2), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=dn))
    ref = np.asarray(jnp.tanh(jnp.einsum("bdhwc,co->bdhwo", z, jnp.asarray(wh)) + bh))

    h = s2 // 2
    hp = jnp.pad(jnp.asarray(_pack(x, nf)),
                 ((0, 0), (1, 1), (1, 1), (1, (-(h + 2)) % 8 + 1), (0, 0)))
    out = packed_decoder_tail(hp, jnp.asarray(pack_conv2_imcol_kernel(w2)),
                              jnp.asarray(pack_head_kernel(wh)), bh,
                              t0=4, interpret=True)
    got = np.asarray(depth_to_space_1ch(out))
    assert got.shape == ref.shape == (2, s2, s2, s2, 1)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_compact_packed_decoder_equals_flax():
    """Full CompactPackedDecoder (GN1 -> fused conv1 -> GN2 affine+pad ->
    kernel) == the flax Superresolution08FinalDecoder, f32 interpret mode."""
    nf = 4
    dec = Superresolution08FinalDecoder(nf=nf, layer_order="gcr")
    x = np.random.default_rng(5).standard_normal((2, 8, 8, 8, nf)).astype(np.float32)
    v = dec.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(dec.apply(v, jnp.asarray(x)))
    compact = CompactPackedDecoder(v["params"], nf=nf, interpret=True)
    got = np.asarray(compact(jnp.asarray(x)))
    assert got.shape == ref.shape == (2, 16, 16, 16, 1)
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_compact_matches_fused_decoder_bf16_path():
    """bf16 compute path: CompactPackedDecoder tracks FusedFinalDecoder
    within bf16 tolerance on flagship-like shapes (nf=8, S=16)."""
    nf = 8
    dec = Superresolution08FinalDecoder(nf=nf, layer_order="gcr")
    x = np.random.default_rng(7).standard_normal((1, 16, 16, 16, nf)).astype(np.float32)
    v = dec.init(jax.random.PRNGKey(1), jnp.asarray(x))
    fused = FusedFinalDecoder(v["params"], nf=nf, dtype=jnp.bfloat16)
    compact = CompactPackedDecoder(v["params"], nf=nf, dtype=jnp.bfloat16,
                                   interpret=True)
    xb = jnp.asarray(x, jnp.bfloat16)
    a = np.asarray(fused(xb), np.float32)
    b = np.asarray(compact(xb), np.float32)
    # both are tanh-bounded TSDFs; bf16 reassociation differences stay small
    assert np.max(np.abs(a - b)) < 0.03
