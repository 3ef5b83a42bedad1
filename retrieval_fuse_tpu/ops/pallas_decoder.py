"""Pallas TPU kernel: the serving decoder tail on the PACKED grid.

The final decoder (models/refinement.Superresolution08FinalDecoder, serving
replacement ops/fused_decoder.FusedFinalDecoder) ends with

    d2s -> GroupNorm -> 3³ conv (nf -> nf) at (2S)³ -> ReLU -> 1x1 head -> tanh

whose 3³ conv carries HALF the decoder FLOPs at nf(=16)/128 MXU lanes — the
r5 ablation put the decoder at 53 ms/batch-256 against a 9.1 ms MXU floor,
and both prior attacks overpaid in FLOPs (dense space-to-depth packing = 8x,
parity decomposition = 4.6x; BENCH_NOTES r2/r5 — each lost on device).

This kernel pays 64/27 ≈ 2.37x instead, at FULL lane utilization, and never
materializes a (2S)³ tensor in HBM:

* Stay on the space-to-depth-packed (S³, 8·nf) grid conv1 already produces
  (o_idx-major channel blocks, ops/fused_decoder.fuse_upsample_conv_kernel).
* A (2S)³ output voxel 2i+o reads 2x-grid taps y = o+k-1 ∈ {-1,0,1,2} per
  dim (k ∈ 3³), i.e. packed source (d, o') = (floor(y/2), y mod 2) — only
  4³ = 64 (d,o') combos per packed position i. Building those 64 shifted
  channel-block slices IN VMEM as an im2col matrix (V, 64·nf) turns conv2
  into ONE (V, 64·nf) @ (64·nf, 8·nf) GEMM: contraction 1024, lanes 128 at
  the flagship nf=16 — the MXU is full in both dims. The packed weight is
  27·nf/64·nf = 42% dense, hence the 2.37x FLOP overhead.
* The 1x1 head is block-diagonal on the packed layout ((8·nf, 8): output
  sub-voxel o reads channel block o), so ReLU -> head GEMM -> tanh fuse into
  the same kernel and the only HBM write is the final (S³, 8) f32 TSDF.

GroupNorm's per-(item, group) statistics are computed outside by one XLA
reduction over conv1's output; its affine is applied (with the conv's SAME
zero-padding in NORMALIZED space) by a single fused XLA affine+pad pass that
writes the kernel's (S+2)-padded input. Everything downstream lives in VMEM.

Value parity with FusedFinalDecoder (and therefore with the reference
decoder, model/refinement.py:udistilled via tests/test_fused_decoder.py) is
pinned in tests/test_pallas_decoder.py.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from retrieval_fuse_tpu.ops.fused_decoder import (
    fuse_upsample_conv_kernel, group_norm, _conv_same)

_YS = (-1, 0, 1, 2)  # 2x-grid tap offsets reachable from a packed position

#: im2col column order, grouped by y2: the y2 shift lands on the SUBLANE
#: dim of the kernel's halo tile, and Mosaic cannot concat operands whose
#: sublane offsets differ ("result/input offset mismatch on non-concat
#: dimension", measured on v5e) — so each y2 group builds its own
#: offset-uniform patch matrix and the GEMM accumulates over the 4 groups.
_COL_GROUPS = tuple(
    tuple((y0, y1, y2) for y0 in _YS for y1 in _YS) for y2 in _YS)


def pack_conv2_imcol_kernel(w: np.ndarray) -> np.ndarray:
    """(3,3,3,nf,nf) SAME conv kernel on the 2x grid -> (64·nf, 8·nf) im2col
    GEMM weight on the packed grid.

    Row blocks follow _COL_GROUPS (y2-major, then y0, y1; source channel c'
    minor) and map to output block (o_idx, c) with w[k], k = y-o+1, wherever
    all k_i ∈ {0,1,2}; 27 of the 64 row blocks are nonzero per column block."""
    w = np.asarray(w)
    nf = w.shape[3]
    assert w.shape == (3, 3, 3, nf, nf), w.shape
    packed = np.zeros((64 * nf, 8 * nf), w.dtype)
    for yi, y in enumerate(y for grp in _COL_GROUPS for y in grp):
        for oi, o in enumerate(itertools.product((0, 1), repeat=3)):
            k = tuple(yy - oo + 1 for yy, oo in zip(y, o))
            if all(0 <= kk <= 2 for kk in k):
                packed[yi * nf:(yi + 1) * nf, oi * nf:(oi + 1) * nf] = w[k]
    return packed


def pack_head_kernel(w: np.ndarray) -> np.ndarray:
    """1x1 head kernel (nf, 1) (or (1,1,1,nf,1)) -> block-diagonal (8·nf, 8):
    packed output sub-voxel o reads channel block o."""
    w = np.asarray(w).reshape(-1)
    nf = w.shape[0]
    packed = np.zeros((8 * nf, 8), w.dtype)
    for o in range(8):
        packed[o * nf:(o + 1) * nf, o] = w
    return packed


def _decoder_tail_kernel(hn_ref, w2_ref, wh_ref, out_ref, tile_ref, sem,
                         *, t0: int, s: int, nf: int, bias_h: float):
    """Grid step = (batch item b, dim-0 tile i0). Input hn (ANY/HBM):
    (B, S+2, S+2, S+2, 8·nf) normalized + zero-padded; output block
    (1, t0, S, S, 8) f32 packed TSDF."""
    b = pl.program_id(0)
    i0 = pl.program_id(1)
    n0 = pl.num_programs(1)

    def issue(step, slot):
        pltpu.make_async_copy(
            hn_ref.at[b, pl.ds(step * t0, t0 + 2)],
            tile_ref.at[slot], sem.at[slot]).start()

    @pl.when(i0 == 0)
    def _():
        issue(i0, 0)

    @pl.when(i0 + 1 < n0)
    def _():
        issue(i0 + 1, (i0 + 1) % 2)

    slot = i0 % 2
    pltpu.make_async_copy(hn_ref.at[b, pl.ds(i0 * t0, t0 + 2)],
                          tile_ref.at[slot], sem.at[slot]).wait()

    w2 = w2_ref[:]                           # (64·nf, 8·nf)
    wh = wh_ref[:]                           # (8·nf, 8)

    # one x0-row at a time keeps each im2col group matrix at (S², 16·nf) —
    # 0.5 MB at the flagship S=32, nf=16 — while the halo tile amortizes
    # over t0 rows; 4 offset-uniform groups accumulate into one f32 result
    # (see _COL_GROUPS for why the split exists). Columns slice the scratch
    # REF directly — materializing the whole halo tile as a value put the
    # 3.5 MB load on the scoped-vmem stack once per unrolled row (22.5 MB
    # total, measured over the 16 MB limit on v5e).
    gnf = 16 * nf
    for r in range(t0):
        z = None
        for gi, grp in enumerate(_COL_GROUPS):
            cols = []
            for y0, y1, y2 in grp:
                d0, o0 = (y0 - (y0 % 2)) // 2, y0 % 2
                d1, o1 = (y1 - (y1 % 2)) // 2, y1 % 2
                d2, o2 = (y2 - (y2 % 2)) // 2, y2 % 2
                oi = (o0 * 4 + o1 * 2 + o2) * nf
                cols.append(tile_ref[slot, r + 1 + d0,
                                     1 + d1: 1 + d1 + s,
                                     1 + d2: 1 + d2 + s,
                                     oi: oi + nf])
            patches = jnp.concatenate(cols, axis=-1).reshape(s * s, gnf)
            zg = jnp.dot(patches, w2[gi * gnf:(gi + 1) * gnf],
                         preferred_element_type=jnp.float32)
            z = zg if z is None else z + zg
        z = jnp.maximum(z, 0.0).astype(w2.dtype)           # ReLU, back to bf16
        out = jnp.dot(z, wh, preferred_element_type=jnp.float32) + bias_h
        out_ref[0, r] = jnp.tanh(out).reshape(s, s, 8)


@functools.partial(jax.jit, static_argnames=("bias_h", "t0", "interpret"))
def packed_decoder_tail(hn_pad: jnp.ndarray, w2_packed: jnp.ndarray,
                        wh_packed: jnp.ndarray, bias_h: float,
                        t0: int = 4, interpret: bool = False) -> jnp.ndarray:
    """hn_pad: (B, S+2, S+2, P, 8·nf) GroupNorm-applied conv1 output,
    zero-padded by 1 (normalized space); the minor spatial dim is padded to
    P = 8·ceil((S+2)/8) because HBM→VMEM DMA slabs must be sublane-aligned
    (Mosaic: "slice shape along dimension 3 must be aligned to tiling (8)",
    measured on v5e). Returns (B, S, S, S, 8) f32 packed TSDF (o_idx-minor)
    = tanh(head(relu(conv2(...)))) of the 2x grid."""
    bsz, sp, _, p_min, c8 = hn_pad.shape
    s = sp - 2
    nf = c8 // 8
    assert p_min % 8 == 0 and p_min >= sp, (p_min, sp)
    t0 = min(t0, s)
    assert s % t0 == 0, (s, t0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(bsz, s // t0),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t0, s, s, 8), lambda b, i: (b, i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, t0 + 2, sp, p_min, c8), hn_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_decoder_tail_kernel, t0=t0, s=s, nf=nf,
                          bias_h=float(bias_h)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, s, s, s, 8), jnp.float32),
        interpret=interpret,
    )(hn_pad, w2_packed, wh_packed)


def depth_to_space_1ch(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, S, S, 8) o_idx-minor packed scalars -> (B, 2S, 2S, 2S, 1)."""
    b, s, _, _, _ = x.shape
    x = x.reshape(b, s, s, s, 2, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6)
    return x.reshape(b, 2 * s, 2 * s, 2 * s, 1)


class CompactPackedDecoder:
    """Drop-in serving replacement for FusedFinalDecoder: GN -> fused
    upsample-conv (XLA, 128 lanes) -> ReLU -> [GN2 stats + affine+pad, XLA]
    -> Pallas packed conv2+head+tanh -> d2s. No (2S)³ HBM intermediates: the
    decoder's HLO temps were the measured b512 OOM blocker (BENCH_NOTES r5).
    """

    def __init__(self, decoder_params: dict, nf: int, dtype=jnp.float32,
                 interpret: bool = False):
        bm = decoder_params["up0"]["basic_module"]
        self.nf = nf
        self.num_groups = nf // 2
        self.interpret = interpret
        self.gn1 = (jnp.asarray(bm["SingleConv1"]["groupnorm"]["scale"], dtype),
                    jnp.asarray(bm["SingleConv1"]["groupnorm"]["bias"], dtype))
        self.w1_fused = jnp.asarray(
            fuse_upsample_conv_kernel(np.asarray(bm["SingleConv1"]["conv"]["kernel"])), dtype)
        self.gn2_scale = jnp.asarray(bm["SingleConv2"]["groupnorm"]["scale"], jnp.float32)
        self.gn2_bias = jnp.asarray(bm["SingleConv2"]["groupnorm"]["bias"], jnp.float32)
        self.w2_packed = jnp.asarray(
            pack_conv2_imcol_kernel(np.asarray(bm["SingleConv2"]["conv"]["kernel"])), dtype)
        self.wh_packed = jnp.asarray(
            pack_head_kernel(np.asarray(decoder_params["final_conv"]["kernel"])), dtype)
        self.b_final = float(np.asarray(decoder_params["final_conv"]["bias"]).reshape(()))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, S, S, S, nf) -> (B, 2S, 2S, 2S, 1) tanh TSDF."""
        nf = self.nf
        h = group_norm(x, *self.gn1, self.num_groups)
        h = jax.nn.relu(_conv_same(h, self.w1_fused))      # (B, S³, 8·nf)

        # GroupNorm-on-2x-grid statistics on the packed layout: per (item,
        # group) over (spatial, all 8 sub-voxel blocks, channels in group) —
        # identical to ops/fused_decoder.group_norm_packed
        b = h.shape[0]
        g = self.num_groups if (nf >= self.num_groups and nf % self.num_groups == 0) else 1
        xg = h.reshape(b, -1, 8, g, nf // g).astype(jnp.float32)
        mean = xg.mean(axis=(1, 2, 4))                     # (B, g)
        var = jnp.square(xg - mean[:, None, None, :, None]).mean(axis=(1, 2, 4))
        rstd = jax.lax.rsqrt(var + 1e-5)
        scale8 = jnp.tile(self.gn2_scale, 8).reshape(8, g, nf // g)
        bias8 = jnp.tile(self.gn2_bias, 8).reshape(8, g, nf // g)
        a = (rstd[:, None, :, None] * scale8).reshape(b, 1, 1, 1, 8 * nf)
        c = (bias8 - (mean * rstd)[:, None, :, None] * scale8).reshape(b, 1, 1, 1, 8 * nf)

        # one fused affine+pad pass writes the kernel input; the pad ring is
        # zero in NORMALIZED space — exactly conv2's SAME padding on 2x. The
        # minor spatial dim pads up to a sublane multiple (DMA alignment,
        # see packed_decoder_tail)
        s = h.shape[1]
        hn = jnp.pad((h * a + c).astype(h.dtype),
                     ((0, 0), (1, 1), (1, 1), (1, (-(s + 2)) % 8 + 1), (0, 0)))
        out = packed_decoder_tail(hn, self.w2_packed, self.wh_packed,
                                  self.b_final, interpret=self.interpret)
        return depth_to_space_1ch(out)
