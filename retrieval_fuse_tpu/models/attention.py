"""Patch-based K-way attention fusion over retrieved feature volumes.

Parity: reference model/attention.py. Per 2³ feature patch, a query MLP
(theta) embeds the backbone features and a key MLP (phi) embeds each of the K
co-located retrieved patches; scores are dot products; selection is either a
hard straight-through Gumbel-softmax over K (retrieval_mode, x25 score
scaling) or a sharp softmax (sharpness 32·e³·4); a ReLU-of-max switch gates
blending with the backbone features.

TPU-first shape strategy: the whole B·R³-patch axis is one big leading
dimension, so theta/phi/g are single large GEMMs on the MXU (the reference
looped these through nn.Fold/unfold layout ops). Unfold/fold are free
reshapes (ops/fold3d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from retrieval_fuse_tpu.ops.fold3d import unfold3d, fold3d
from retrieval_fuse_tpu.ops.init import torch_kernel_init, torch_bias_init, dirac_noise_init


def _l2_normalize(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Value-identical to x / max(‖x‖, eps) for nonzero rows, with FINITE
    gradients at exactly-zero rows (d‖x‖/dx is NaN at 0; the double-where
    keeps the unused branch finite). Attention features are trained in
    phases 2/3, so the gradient path matters."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    safe = jnp.where(sq > 0, x, 1.0)
    normed = safe * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(safe * safe, axis=axis, keepdims=True), 1e-24))
    return jnp.where(sq > 0, normed, 0.0)


class AttentionFeatureEncoder(nn.Module):
    """MLP nf·e³ -> 128 -> 128 -> 128 -> n_out with LeakyReLU(0.01).

    Parity: reference model/attention.py:29-46 (torch nn.LeakyReLU() default
    slope 0.01, unlike the 0.2 used in the patch encoders).
    """

    n_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        x = x.reshape(b, -1)
        for i, width in enumerate((128, 128, 128)):
            x = nn.Dense(width, kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(x.shape[-1]), name=f"fc{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return nn.Dense(self.n_out, kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(x.shape[-1]), name="out")(x)


def gumbel_softmax(logits: jnp.ndarray, rng, tau: float = 1.0, hard: bool = True) -> jnp.ndarray:
    """Straight-through Gumbel-softmax, semantics of torch.nn.functional.gumbel_softmax."""
    gumbels = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape, minval=1e-20, maxval=1.0) + 1e-20))
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=-1)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(index, logits.shape[-1], dtype=logits.dtype)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


class AttentionBlock(nn.Module):
    """K-way selection attention over co-located patches (ref :49-116)."""

    num_output_channels: int
    patch_extent: int
    K: int
    normalize: bool = True
    use_switching: bool = True
    retrieval_mode: bool = True
    no_output_mapping: bool = True
    blend: bool = True
    cf_feat: int = 32
    init_scale: float = 35.0
    init_shift: float = -27.0
    deterministic_selection: bool = False  # argmax instead of Gumbel sampling

    def setup(self):
        self.theta = AttentionFeatureEncoder(self.cf_feat, name="theta")
        self.phi = AttentionFeatureEncoder(self.cf_feat, name="phi")
        # learned sigmoid-switch parameters: registered for checkpoint parity,
        # unused by the live forward (the reference hardcodes the ReLU switch
        # at model/attention.py:97-99 and leaves these as dead parameters).
        self.sig_scale = self.param("sig_scale", lambda k, s: jnp.ones(s) * self.init_scale, (1,))
        self.sig_shift = self.param("sig_shift", lambda k, s: jnp.ones(s) * self.init_shift, (1,))
        if not self.no_output_mapping:
            c = self.num_output_channels
            self.g = nn.Conv(c, kernel_size=(1, 1, 1), padding="VALID",
                             kernel_init=dirac_noise_init(0.01),
                             bias_init=nn.initializers.zeros, name="g")
            self.o = nn.Conv(c, kernel_size=(1, 1, 1), padding="VALID",
                             kernel_init=dirac_noise_init(0.01),
                             bias_init=nn.initializers.zeros, name="o")

    def get_features(self, x: jnp.ndarray, p: jnp.ndarray):
        """Query/key embeddings for the contrastive side loss (ref :72-82).

        x, p: (B, e, e, e, C) -> two (B, cf_feat) feature mats (L2-normalized
        when `normalize`)."""
        x_feat = self.theta(x)
        p_feat = self.phi(p)
        if self.normalize:
            x_feat = _l2_normalize(x_feat, axis=1)
            p_feat = _l2_normalize(p_feat, axis=1)
        return x_feat, p_feat

    def __call__(self, x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        """x: (B, e, e, e, C); p: (B, K, e, e, e, C) -> (B, e, e, e, C)."""
        b, k = p.shape[0], p.shape[1]
        e, c = self.patch_extent, x.shape[-1]
        x_feat = self.theta(x)                                     # (B, 32)
        p_feat = self.phi(p.reshape(b * k, e, e, e, c)).reshape(b, k, -1)
        if self.normalize:
            x_feat = _l2_normalize(x_feat, axis=1)
            p_feat = _l2_normalize(p_feat, axis=2)
        if self.no_output_mapping:
            g_feat = p.reshape(b, k, -1)
        else:
            g_feat = self.g(p.reshape(b * k, e, e, e, c)).reshape(b, k, -1)

        scores = jnp.einsum("bf,bkf->bk", x_feat, p_feat)
        switch = nn.relu(jnp.max(scores, axis=1, keepdims=True))   # (B, 1)

        if self.retrieval_mode:
            scaled = scores * 25.0
            if self.deterministic_selection:
                idx = jnp.argmax(scaled, axis=-1)
                weights = jax.nn.one_hot(idx, k, dtype=scaled.dtype)
                soft = jax.nn.softmax(scaled, axis=-1)
                weights = weights + soft - jax.lax.stop_gradient(soft)
            else:
                weights = gumbel_softmax(scaled, self.make_rng("gumbel"), tau=1.0, hard=True)
        else:
            sharpness = (self.cf_feat * e ** 3) * 4
            weights = jax.nn.softmax(sharpness * scores, axis=1)

        weighted_sum = jnp.einsum("bk,bkf->bf", weights, g_feat).reshape(b, e, e, e, c)
        patch_attention = weighted_sum if self.no_output_mapping else self.o(weighted_sum)

        sw = switch.reshape(b, 1, 1, 1, 1)
        if self.blend:
            return x * (1.0 - sw) + patch_attention * sw
        return x + patch_attention * sw

    def get_regularization_losses(self):
        if self.use_switching:
            return (self.sig_scale - self.init_scale) ** 2 + (self.sig_shift - self.init_shift) ** 2
        return 0.0


class PatchedAttentionBlock(nn.Module):
    """Unfold 32³ feature grids into R³ patches, attend per location, fold back.

    Parity: reference model/attention.py:119-157. The per-location loop is a
    single batched einsum over the B·R³ axis — embarrassingly parallel and
    shardable across the mesh.
    """

    nf: int
    num_patch_x: int
    patch_extent: int
    num_nearest_neighbors: int
    attention_kwargs: dict

    def setup(self):
        self.attention_blocks_layer = AttentionBlock(
            num_output_channels=self.nf, patch_extent=self.patch_extent,
            K=self.num_nearest_neighbors, name="attention_blocks_layer",
            **self.attention_kwargs)

    def get_features(self, x_predicted, x_target, occupancy):
        """(B, S, S, S, F) x2 + (B, S/2?, ...) occupancy -> per-patch features
        and an any-occupied flag per patch (ref :132-139)."""
        e = self.patch_extent
        x_predicted_feat = unfold3d(x_predicted, e)
        x_target_feat = unfold3d(x_target, e)
        occupancy_ = unfold3d(occupancy, e)
        x_feat_flat, p_feat_flat = self.attention_blocks_layer.get_features(
            x_predicted_feat, x_target_feat)
        occupancy_flat = occupancy_.reshape(x_predicted_feat.shape[0], -1)
        occupancy_flat = jnp.any(occupancy_flat, axis=1)
        return x_feat_flat, p_feat_flat, occupancy_flat

    def __call__(self, x_predicted: jnp.ndarray, x_retrieved: jnp.ndarray) -> jnp.ndarray:
        """x_predicted: (B, S, S, S, F); x_retrieved: (B·K, S, S, S, F)."""
        e, r, k, nf = self.patch_extent, self.num_patch_x, self.num_nearest_neighbors, self.nf
        x_predicted_feat = unfold3d(x_predicted, e)                 # (B·R³, e,e,e,F)
        x_patch_feat = unfold3d(x_retrieved, e)                     # (B·K·R³, e,e,e,F)
        x_patch_feat = x_patch_feat.reshape(-1, k, r ** 3, e, e, e, nf)
        x_patch_feat = x_patch_feat.transpose(0, 2, 1, 3, 4, 5, 6).reshape(-1, k, e, e, e, nf)
        attention_processed = self.attention_blocks_layer(x_predicted_feat, x_patch_feat)
        return fold3d(attention_processed, r, e)
