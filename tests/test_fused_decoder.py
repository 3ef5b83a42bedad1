"""Fused upsample+conv serving decoder == the flax final decoder, exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.models.refinement import Superresolution08FinalDecoder
from retrieval_fuse_tpu.ops.fused_decoder import (
    FusedFinalDecoder, fuse_upsample_conv_kernel, depth_to_space_2x)


def test_fused_kernel_equals_upsample_conv():
    """The folded 3³/8C kernel on the small grid == conv on nearest-upsampled
    input, including zero-padding boundaries."""
    rng = np.random.default_rng(0)
    c_in, c_out, s = 3, 5, 6
    w = rng.standard_normal((3, 3, 3, c_in, c_out)).astype(np.float32)
    x = rng.standard_normal((2, s, s, s, c_in)).astype(np.float32)
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                        ("NDHWC", "DHWIO", "NDHWC"))
    x_up = jnp.repeat(jnp.repeat(jnp.repeat(jnp.asarray(x), 2, 1), 2, 2), 2, 3)
    ref = jax.lax.conv_general_dilated(x_up, jnp.asarray(w), (1, 1, 1),
                                       [(1, 1)] * 3, dimension_numbers=dn)
    fused = jax.lax.conv_general_dilated(jnp.asarray(x),
                                         jnp.asarray(fuse_upsample_conv_kernel(w)),
                                         (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn)
    got = depth_to_space_2x(fused, c_out)
    # atol covers float reassociation from the per-(o,d) weight pre-summing
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_final_decoder_equals_flax():
    nf = 4
    dec = Superresolution08FinalDecoder(nf=nf, layer_order="gcr")
    x = np.random.default_rng(1).standard_normal((2, 16, 16, 16, nf)).astype(np.float32)
    v = dec.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(dec.apply(v, jnp.asarray(x)))
    fused = FusedFinalDecoder(v["params"], nf=nf)
    got = np.asarray(fused(jnp.asarray(x)))
    assert got.shape == ref.shape == (2, 32, 32, 32, 1)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_packed_conv_kernel_equals_fullres_conv():
    """The space-to-depth-packed 3³ kernel on the half-res grid == SAME conv
    on the full-res grid, including zero-padding boundaries."""
    from retrieval_fuse_tpu.ops.fused_decoder import pack_conv_kernel_2x
    rng = np.random.default_rng(2)
    c_in, c_out, s = 3, 5, 8  # full-res grid s, half-res s//2
    w = rng.standard_normal((3, 3, 3, c_in, c_out)).astype(np.float32)
    x = rng.standard_normal((2, s, s, s, c_in)).astype(np.float32)
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                        ("NDHWC", "DHWIO", "NDHWC"))
    ref = jax.lax.conv_general_dilated(jnp.asarray(x), jnp.asarray(w), (1, 1, 1),
                                       [(1, 1)] * 3, dimension_numbers=dn)
    # pack x: (B, s/2, 2, s/2, 2, s/2, 2, C) -> (B, (s/2)³, 8·C) o_idx-major
    h = s // 2
    xp = x.reshape(2, h, 2, h, 2, h, 2, c_in).transpose(0, 1, 3, 5, 2, 4, 6, 7)
    xp = xp.reshape(2, h, h, h, 8 * c_in)
    got_p = jax.lax.conv_general_dilated(jnp.asarray(xp),
                                         jnp.asarray(pack_conv_kernel_2x(w)),
                                         (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn)
    got = depth_to_space_2x(got_p, c_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_packed_final_decoder_equals_flax():
    from retrieval_fuse_tpu.ops.fused_decoder import PackedFinalDecoder
    nf = 4
    dec = Superresolution08FinalDecoder(nf=nf, layer_order="gcr")
    x = np.random.default_rng(3).standard_normal((2, 16, 16, 16, nf)).astype(np.float32)
    v = dec.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(dec.apply(v, jnp.asarray(x)))
    packed = PackedFinalDecoder(v["params"], nf=nf)
    got = np.asarray(packed(jnp.asarray(x)))
    assert got.shape == ref.shape == (2, 32, 32, 32, 1)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_decomposed_conv2_equals_fullres_conv():
    """The 8 parity-decomposed sub-grid convs summed == SAME conv on the
    full-res grid, including zero-padding boundaries."""
    from retrieval_fuse_tpu.ops.fused_decoder import decomposed_conv2_kernels
    rng = np.random.default_rng(4)
    c_in, c_out, s = 3, 5, 8
    w = rng.standard_normal((3, 3, 3, c_in, c_out)).astype(np.float32)
    x = rng.standard_normal((2, s, s, s, c_in)).astype(np.float32)
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                        ("NDHWC", "DHWIO", "NDHWC"))
    ref = jax.lax.conv_general_dilated(jnp.asarray(x), jnp.asarray(w), (1, 1, 1),
                                       [(1, 1)] * 3, dimension_numbers=dn)
    h = s // 2
    kernels, pads = decomposed_conv2_kernels(w)
    out = 0.0
    import itertools
    for (kern, pad), sub in zip(zip(kernels, pads),
                                itertools.product((0, 1), repeat=3)):
        x_s = jnp.asarray(x[:, sub[0]::2, sub[1]::2, sub[2]::2])  # (B, h³, C)
        out = out + jax.lax.conv_general_dilated(
            x_s, jnp.asarray(kern), (1, 1, 1), list(pad), dimension_numbers=dn)
    got = depth_to_space_2x(out, c_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_decomposed_packed_decoder_equals_flax():
    from retrieval_fuse_tpu.ops.fused_decoder import DecomposedPackedDecoder
    nf = 4
    dec = Superresolution08FinalDecoder(nf=nf, layer_order="gcr")
    x = np.random.default_rng(5).standard_normal((2, 16, 16, 16, nf)).astype(np.float32)
    v = dec.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(dec.apply(v, jnp.asarray(x)))
    got = np.asarray(DecomposedPackedDecoder(v["params"], nf=nf)(jnp.asarray(x)))
    assert got.shape == ref.shape == (2, 32, 32, 32, 1)
    np.testing.assert_allclose(got, ref, atol=2e-5)
