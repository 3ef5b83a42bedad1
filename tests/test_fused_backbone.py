"""Fused serving backbone == the flax Superresolution08UNetBackbone, exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_fuse_tpu.models.refinement import Superresolution08UNetBackbone
from retrieval_fuse_tpu.ops.fused_backbone import FusedSuperres08Backbone


def test_fused_backbone_equals_flax():
    nf, levels = 4, 3
    bb = Superresolution08UNetBackbone(nf=nf, num_levels=levels, layer_order="gcr")
    x = np.random.default_rng(0).standard_normal((2, 8, 8, 8, 1)).astype(np.float32)
    v = bb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(bb.apply(v, jnp.asarray(x)))
    fused = FusedSuperres08Backbone(v["params"], nf=nf, num_levels=levels)
    got = np.asarray(fused(v["params"]["unet"], jnp.asarray(x)))
    assert got.shape == ref.shape == (2, 32, 32, 32, nf)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fused_backbone_flagship_width():
    """nf=16 (the flagship lane geometry: 256/128-lane fused convs and the
    128-lane decomposed conv) on a small batch."""
    nf, levels = 16, 4
    bb = Superresolution08UNetBackbone(nf=nf, num_levels=levels, layer_order="gcr")
    x = np.random.default_rng(1).standard_normal((1, 8, 8, 8, 1)).astype(np.float32)
    v = bb.init(jax.random.PRNGKey(1), jnp.asarray(x))
    ref = np.asarray(bb.apply(v, jnp.asarray(x)))
    fused = FusedSuperres08Backbone(v["params"], nf=nf, num_levels=levels)
    got = np.asarray(fused(v["params"]["unet"], jnp.asarray(x)))
    # wider stack -> more float reassociation from the pre-summed fused
    # kernels; observed max |diff| 7e-5 on O(1) outputs
    np.testing.assert_allclose(got, ref, atol=2e-4)
