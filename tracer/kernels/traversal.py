"""Traversal backends over the cluster acceleration structure.

Reference parity: this replaces the reference's divergent per-ray stack
traversal + per-leaf Moller-Trumbore (SURVEY.md R2/R3, the OpenCL hot loop)
with a TPU-native wavefront design (BASELINE: "stackless/short-stack
traversal over a flattened LBVH, wavefront ray batching, SoA triangle
layout"):

  1. rays are tiled into coherent blocks of TR (image-space tiles for
     primary rays, chunks for secondary wavefronts);
  2. bvh.cull produces per-tile candidate cluster lists (conservative);
  3. the hot loop intersects (tile, candidate-cluster) pairs as dense
     (TR, 4) x (4, 3C) products with an elementwise epilogue and a masked
     running-min reduction.

Two implementations of step 3 with identical numerics:
  * `trace_tiles_jnp` — lax.scan over candidate slots; pure jnp; runs
    anywhere; the correctness reference and the differentiable path.
  * `trace_tiles_pallas` — a Pallas/Mosaic kernel over a flattened
    (tile, cluster) work list: scalar-prefetched indices drive the block
    pipeline (cluster blocks stream HBM->VMEM, double-buffered; repeated
    indices on padding items are elided), and the output tile block stays
    resident in VMEM across its consecutive work items (the running min
    never round-trips to HBM).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.bvh.cluster import ClusterAccel
from tracer.bvh.cull import cull_clusters
from tracer.core.types import Ray, Hit, T_FAR

DEFAULT_TILE = 256  # rays per tile (= 2 sublane rows of 128 lanes)
T_MIN = 1e-4


# ---------------------------------------------------------------------------
# Ray tiling
# ---------------------------------------------------------------------------

class Tiling(NamedTuple):
    batch_shape: tuple
    n_rays: int
    tile_hw: tuple | None  # (th, tw, H, W) when image-tiled


def tile_rays(o: jax.Array, d: jax.Array, tr: int = DEFAULT_TILE):
    """(..., 3) ray SoA -> (Ntiles, TR, 3) + tiling info.

    2D (H, W) batches are tiled spatially (16x16 blocks when TR=256) for
    frustum coherence; other shapes are chunked in order. Padding rays have
    d = 0 and can never hit.
    """
    batch_shape = o.shape[:-1]
    if len(batch_shape) == 2:
        H, W = batch_shape
        th = tw = int(tr ** 0.5)
        if th * tw == tr and H % th == 0 and W % tw == 0:
            def fold(x):
                f = x.reshape(H // th, th, W // tw, tw, 3)
                return f.transpose(0, 2, 1, 3, 4).reshape(-1, tr, 3)

            return fold(o), fold(d), Tiling(batch_shape, H * W, (th, tw, H, W))
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = o.shape[0]
    n_pad = -(-n // tr) * tr
    if n_pad != n:
        o = jnp.concatenate([o, jnp.zeros((n_pad - n, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.zeros((n_pad - n, 3), d.dtype)])
    return o.reshape(-1, tr, 3), d.reshape(-1, tr, 3), Tiling(batch_shape, n, None)


def generate_rays_tiled(camera, height: int, width: int, tr: int):
    """Primary rays generated DIRECTLY in the (Ntiles, TR, 3) tiled layout.

    Bit-identical to generate_rays + tile_rays (same arithmetic on the same
    pixel-center values, asserted in tests) but with the spatial fold done
    by integer index math instead of a 5-D transpose — the (H, W) <->
    tile reshuffle of the o/d wavefronts was ~4 ms/frame at 1080p on the
    bench chip for what is an addressing change. Differentiable w.r.t. the
    camera exactly like generate_rays (reference parity: SURVEY.md R1).

    Returns (o_t, d_t, tiling); requires tr a perfect square whose side
    divides both image dimensions (the tile_rays fast-path condition).
    """
    th = tw = int(tr ** 0.5)
    if th * tw != tr or height % th or width % tw:
        from tracer.core.camera import generate_rays

        rays = generate_rays(camera, height, width)
        return tile_rays(rays.o, rays.d, tr)
    ntx = width // tw
    tiles = jnp.arange((height // th) * ntx, dtype=jnp.int32)[:, None]
    slot = jnp.arange(tr, dtype=jnp.int32)[None, :]
    yy = ((tiles // ntx) * th + slot // tw).astype(jnp.float32)
    xx = ((tiles % ntx) * tw + slot % tw).astype(jnp.float32)
    right, up, fwd = camera.basis()
    aspect = width / height
    tan_half = jnp.tan(camera.fov_y * 0.5)
    ndc_x = ((xx + 0.5) / width * 2.0 - 1.0) * aspect * tan_half
    ndc_y = (1.0 - (yy + 0.5) / height * 2.0) * tan_half
    d = (ndc_x[..., None] * right + ndc_y[..., None] * up
         + jnp.broadcast_to(fwd, ndc_x.shape + (3,)))
    o = jnp.broadcast_to(camera.position, d.shape)
    from tracer.core.types import normalize

    return o, normalize(d), Tiling((height, width), height * width,
                                   (th, tw, height, width))


def untile(x: jax.Array, tiling: Tiling):
    """(Ntiles, TR, ...) -> original batch shape."""
    tail = x.shape[2:]
    if tiling.tile_hw is not None:
        th, tw, H, W = tiling.tile_hw
        x = x.reshape(H // th, W // tw, th, tw, *tail)
        perm = (0, 2, 1, 3) + tuple(range(4, 4 + len(tail)))
        return x.transpose(perm).reshape(H, W, *tail)
    x = x.reshape(-1, *tail)[: tiling.n_rays]
    return x.reshape(*tiling.batch_shape, *tail)


def _homog(o: jax.Array, d: jax.Array):
    ones = jnp.ones(o.shape[:-1] + (1,), o.dtype)
    return (
        jnp.concatenate([o, ones], axis=-1),
        jnp.concatenate([d, jnp.zeros_like(ones)], axis=-1),
    )


# ---------------------------------------------------------------------------
# Shared epilogue (field-major layout: cols [0:C)=plane, [C:2C)=u, [2C:3C)=v)
# ---------------------------------------------------------------------------

def _affine_products(o4, d4, w):
    """so, sd = o4 @ w, d4 @ w via explicit broadcast FMA (pure VPU fp32 —
    no MXU bf16 rounding, identical numerics on every backend).

    o4, d4: (..., TR, 4); w: (..., 4, 3C) -> (..., TR, 3C)."""
    so = (
        o4[..., :, 0:1] * w[..., 0:1, :]
        + o4[..., :, 1:2] * w[..., 1:2, :]
        + o4[..., :, 2:3] * w[..., 2:3, :]
        + o4[..., :, 3:4] * w[..., 3:4, :]
    )
    sd = (
        d4[..., :, 0:1] * w[..., 0:1, :]
        + d4[..., :, 1:2] * w[..., 1:2, :]
        + d4[..., :, 2:3] * w[..., 2:3, :]
        + d4[..., :, 3:4] * w[..., 3:4, :]
    )
    return so, sd


def _field_epilogue(so, sd, c, t_min, t_max):
    """(..., 3C) products -> (t, u, v, hit) each (..., C)."""
    den = sd[..., 0:c]
    safe = jnp.abs(den) > 1e-12
    t = -so[..., 0:c] / jnp.where(safe, den, 1.0)
    u = so[..., c : 2 * c] + t * sd[..., c : 2 * c]
    v = so[..., 2 * c : 3 * c] + t * sd[..., 2 * c : 3 * c]
    hit = safe & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_min) & (t < t_max)
    return jnp.where(hit, t, T_FAR), u, v, hit


# ---------------------------------------------------------------------------
# jnp reference / differentiable path
# ---------------------------------------------------------------------------

def trace_tiles_jnp(o_t, d_t, accel: ClusterAccel, cand, counts, t_min=T_MIN):
    """Closest-hit over candidate clusters, lax.scan over candidate slots.

    o_t, d_t: (Ntiles, TR, 3). Returns (t, tri, u, v) each (Ntiles, TR).
    """
    n_tiles, tr, _ = o_t.shape
    c = accel.cluster_size
    o4, d4 = _homog(o_t, d_t)
    k_cap = cand.shape[1]

    def step(carry, k):
        bt, btri, bu, bv = carry
        cidx = cand[:, k]  # (Ntiles,)
        w = accel.tri_w[cidx]  # (Ntiles, 4, 3C)
        ids = accel.tri_ids[cidx]  # (Ntiles, C)
        so, sd = _affine_products(o4, d4, w)
        t, u, v, _ = _field_epilogue(so, sd, c, t_min, T_FAR)
        active = (k < counts)[:, None]
        t = jnp.where(active[..., None], t, T_FAR)
        tmin = jnp.min(t, axis=-1)  # (Ntiles, TR)
        am = jnp.argmin(t, axis=-1)
        onehot = am[..., None] == jnp.arange(c)[None, None, :]
        ub = jnp.sum(jnp.where(onehot, u, 0.0), axis=-1)
        vb = jnp.sum(jnp.where(onehot, v, 0.0), axis=-1)
        idb = jnp.sum(jnp.where(onehot, ids[:, None, :], 0), axis=-1).astype(jnp.int32)
        better = tmin < bt
        return (
            jnp.where(better, tmin, bt),
            jnp.where(better, idb, btri),
            jnp.where(better, ub, bu),
            jnp.where(better, vb, bv),
        ), None

    # Under shard_map the scan carry must carry the same varying-axes type
    # as the body output (which depends on rays AND accel, possibly sharded
    # over different mesh axes). 0*x terms propagate both inputs' axes onto
    # the init without changing values (cannot constant-fold: 0*NaN != 0).
    # d_t must participate: a pinhole wavefront's o_t is a replicated
    # broadcast of the camera position even when the DIRECTIONS are
    # device-varying (shard_map band rendering), and a non-varying init
    # against a varying body output is a scan type error.
    vary_f = (0.0 * o_t[..., 0] + 0.0 * d_t[..., 0]
              + 0.0 * accel.tri_w.reshape(-1)[0] + 0.0 * counts[:, None])
    init = (
        jnp.full((n_tiles, tr), T_FAR, jnp.float32) + vary_f,
        jnp.full((n_tiles, tr), -1, jnp.int32) + vary_f.astype(jnp.int32),
        jnp.zeros((n_tiles, tr), jnp.float32) + vary_f,
        jnp.zeros((n_tiles, tr), jnp.float32) + vary_f,
    )
    # Remat the per-candidate step: without it, reverse-mode AD saves every
    # step's dense (Ntiles, TR, C) intermediates — k_cap x that tensor was
    # an 86 GB residual for the bunny512 grad benchmark. Recomputing the
    # step in the backward pass trades ~2x candidate FLOPs for O(carry)
    # memory (SURVEY.md: jax.checkpoint to trade FLOPs for HBM).
    step = jax.checkpoint(step, prevent_cse=False)
    (bt, btri, bu, bv), _ = jax.lax.scan(step, init, jnp.arange(k_cap, dtype=jnp.int32))
    return bt, btri, bu, bv


def any_hit_tiles_jnp(o_t, d_t, t_max_t, accel: ClusterAccel, cand, counts, t_min=T_MIN):
    """Occlusion over candidate clusters. t_max_t: (Ntiles, TR)."""
    n_tiles, tr, _ = o_t.shape
    c = accel.cluster_size
    o4, d4 = _homog(o_t, d_t)
    k_cap = cand.shape[1]

    def step(occ, k):
        cidx = cand[:, k]
        w = accel.tri_w[cidx]
        so, sd = _affine_products(o4, d4, w)
        _, _, _, hit = _field_epilogue(so, sd, c, t_min, t_max_t[..., None])
        active = (k < counts)[:, None]
        return occ | (jnp.any(hit, axis=-1) & active), None

    # See trace_tiles_jnp: init must carry both inputs' varying axes.
    vary_b = (0.0 * o_t[..., 0] + 0.0 * d_t[..., 0] + 0.0 * t_max_t
              + 0.0 * accel.tri_w.reshape(-1)[0] + 0.0 * counts[:, None]) > 0.0
    occ0 = jnp.zeros((n_tiles, tr), bool) | vary_b
    # Remat: see trace_tiles_jnp (occlusion is boolean so its cotangents
    # are zero anyway, but the saved primals still cost k_cap x dense).
    step = jax.checkpoint(step, prevent_cse=False)
    occ, _ = jax.lax.scan(step, occ0, jnp.arange(k_cap, dtype=jnp.int32))
    return occ


# ---------------------------------------------------------------------------
# Work-list construction (shared by the Pallas kernels)
# ---------------------------------------------------------------------------

# The packed work list lives in SMEM (scalar prefetch), which is ~1MB on
# current TPUs. One s32 word per work item encodes everything the kernel and
# its index maps need:
#   bit 0      valid     (item inside its tile's candidate count)
#   bit 1      first     (first item of its tile -> initialize accumulators)
#   bits 2-18  cluster   (17 bits -> up to 131072 clusters = 16.7M tris)
#   bits 19-30 tile      (12 bits -> up to 4096 tiles per kernel launch)
# Images larger than MAX_CHUNK_TILES tiles are traced as a sequence of
# kernel launches (lax.map over tile chunks), keeping SMEM bounded at any
# resolution.
MAX_CHUNK_TILES = 4096
MAX_CLUSTERS = 1 << 17
MAX_WORK_PER_CALL = 128 * 1024  # 512KB of SMEM for the packed list


def build_worklist(cand, counts, work_cap: int):
    """Flatten per-tile candidate lists into a tile-ordered work list.

    Every tile contributes max(count, 1) items (so each output tile block is
    visited and initialized at least once). Padding items repeat the final
    item (monotone tile order preserved). Returns (tile_of, cluster_of,
    valid, overflow)."""
    n_tiles, k_cap = cand.shape
    eff = jnp.maximum(counts, 1)
    mask = jnp.arange(k_cap, dtype=jnp.int32)[None, :] < eff[:, None]
    flat = mask.reshape(-1)
    total = jnp.sum(eff)
    idx = jnp.nonzero(flat, size=work_cap, fill_value=n_tiles * k_cap - 1)[0].astype(jnp.int32)
    tile_of = idx // k_cap
    k_of = idx % k_cap
    cluster_of = cand[tile_of, k_of]
    in_range = jnp.arange(work_cap, dtype=jnp.int32) < total
    valid = (in_range & (k_of < counts[tile_of])).astype(jnp.int32)
    overflow = total > work_cap
    return tile_of, cluster_of, valid, overflow


def pack_worklist(tile_of, cluster_of, valid):
    """(W,) int32 triples -> single packed s32 word per item (layout above)."""
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), tile_of[:-1]])
    first = (tile_of != prev).astype(jnp.int32)
    return (tile_of << 19) | (cluster_of << 2) | (first << 1) | valid


def _chunk_plan(n_tiles: int, work_cap: int):
    """Split n_tiles into chunks whose packed work lists fit SMEM.

    Returns (chunk_tiles, n_chunks, items_per_tile)."""
    items_per_tile = min(max(1, -(-work_cap // max(n_tiles, 1))), MAX_WORK_PER_CALL)
    ch = min(n_tiles, MAX_CHUNK_TILES, max(1, MAX_WORK_PER_CALL // items_per_tile))
    n_chunks = -(-n_tiles // ch)
    return ch, n_chunks, items_per_tile


def _pad_tiles(x, n_pad_tiles):
    pad = n_pad_tiles - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _closest_kernel(c, t_min, packed,
                    o4_ref, d4_ref, w_ref, ids_ref,
                    bt_ref, btri_ref, bu_ref, bv_ref):
    # Column layout throughout: best-state refs are (1, TR, 1) so lane-axis
    # reductions over C land directly in the output layout (no relayout).
    i = pl.program_id(0)
    word = packed[i]
    first = ((word >> 1) & 1) == 1
    valid = (word & 1) == 1

    @pl.when(first)
    def _():
        bt_ref[:] = jnp.full(bt_ref.shape, T_FAR, jnp.float32)
        btri_ref[:] = jnp.full(btri_ref.shape, -1, jnp.int32)
        bu_ref[:] = jnp.zeros(bu_ref.shape, jnp.float32)
        bv_ref[:] = jnp.zeros(bv_ref.shape, jnp.float32)

    @pl.when(valid)
    def _():
        o4 = o4_ref[0]  # (TR, 4)
        d4 = d4_ref[0]
        w = w_ref[0]  # (4, 3C)
        so, sd = _affine_products(o4, d4, w)
        t, u, v, _ = _field_epilogue(so, sd, c, t_min, T_FAR)
        tmin = jnp.min(t, axis=-1, keepdims=True)  # (TR, 1)
        # First-match one-hot of the minimum (Mosaic-safe argmin).
        iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        am = jnp.min(jnp.where(t == tmin, iota, c), axis=-1, keepdims=True)
        onehot = iota == am
        ub = jnp.sum(jnp.where(onehot, u, 0.0), axis=-1, keepdims=True)
        vb = jnp.sum(jnp.where(onehot, v, 0.0), axis=-1, keepdims=True)
        ids = ids_ref[0]  # (1, C)
        idb = jnp.sum(jnp.where(onehot, ids, 0), axis=-1, keepdims=True).astype(jnp.int32)
        better = tmin < bt_ref[0]  # (TR, 1)
        bt_ref[0] = jnp.where(better, tmin, bt_ref[0])
        btri_ref[0] = jnp.where(better, idb, btri_ref[0])
        bu_ref[0] = jnp.where(better, ub, bu_ref[0])
        bv_ref[0] = jnp.where(better, vb, bv_ref[0])


_TILE_IX = lambda i, p: (p[i] >> 19, 0, 0)
_CLUSTER_IX = lambda i, p: ((p[i] >> 2) & (MAX_CLUSTERS - 1), 0, 0)


def _trace_chunk_pallas(o4, d4, tri_w, ids3, cand, counts, work_cap, t_min, interpret):
    """One kernel launch over <= MAX_CHUNK_TILES tiles."""
    n_tiles, tr, _ = o4.shape
    c = ids3.shape[-1]
    tile_of, cluster_of, valid, overflow = build_worklist(cand, counts, work_cap)
    packed = pack_worklist(tile_of, cluster_of, valid)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(work_cap,),
        in_specs=[
            pl.BlockSpec((1, tr, 4), _TILE_IX),
            pl.BlockSpec((1, tr, 4), _TILE_IX),
            pl.BlockSpec((1, 4, 3 * c), _CLUSTER_IX),
            pl.BlockSpec((1, 1, c), _CLUSTER_IX),
        ],
        out_specs=[
            pl.BlockSpec((1, tr, 1), _TILE_IX),
            pl.BlockSpec((1, tr, 1), _TILE_IX),
            pl.BlockSpec((1, tr, 1), _TILE_IX),
            pl.BlockSpec((1, tr, 1), _TILE_IX),
        ],
    )
    bt, btri, bu, bv = pl.pallas_call(
        functools.partial(_closest_kernel, c, t_min),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tr, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tr, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, tr, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tr, 1), jnp.float32),
        ],
        interpret=interpret,
    )(packed, o4, d4, tri_w, ids3)
    return bt, btri, bu, bv, overflow


def trace_tiles_pallas(o_t, d_t, accel: ClusterAccel, cand, counts,
                       work_cap: int, t_min=T_MIN, interpret: bool = False):
    """Pallas closest-hit over the flattened work list (chunked over tiles
    so the packed SMEM work list stays within budget at any image size)."""
    n_tiles, tr, _ = o_t.shape
    c = accel.cluster_size
    if accel.num_clusters > MAX_CLUSTERS:
        raise ValueError(f"{accel.num_clusters} clusters exceeds packed-worklist "
                         f"capacity {MAX_CLUSTERS}; raise cluster_size")
    o4, d4 = _homog(o_t, d_t)
    ids3 = accel.tri_ids.reshape(-1, 1, c)
    ch, n_chunks, items = _chunk_plan(n_tiles, work_cap)

    if n_chunks == 1:
        bt, btri, bu, bv, overflow = _trace_chunk_pallas(
            o4, d4, accel.tri_w, ids3, cand, counts, ch * items, t_min, interpret)
        return bt[..., 0], btri[..., 0], bu[..., 0], bv[..., 0], overflow

    n_pad = ch * n_chunks
    o4c = _pad_tiles(o4, n_pad).reshape(n_chunks, ch, tr, 4)
    d4c = _pad_tiles(d4, n_pad).reshape(n_chunks, ch, tr, 4)
    candc = _pad_tiles(cand, n_pad).reshape(n_chunks, ch, -1)
    countsc = _pad_tiles(counts, n_pad).reshape(n_chunks, ch)

    def one(args):
        o4i, d4i, candi, countsi = args
        return _trace_chunk_pallas(
            o4i, d4i, accel.tri_w, ids3, candi, countsi, ch * items, t_min, interpret)

    bt, btri, bu, bv, over = jax.lax.map(one, (o4c, d4c, candc, countsc))
    out = lambda x: x.reshape(n_pad, tr)[:n_tiles]
    return (out(bt[..., 0]), out(btri[..., 0]), out(bu[..., 0]), out(bv[..., 0]),
            jnp.any(over))


def _anyhit_kernel(c, t_min, packed,
                   o4_ref, d4_ref, tmax_ref, w_ref, occ_ref):
    i = pl.program_id(0)
    word = packed[i]
    first = ((word >> 1) & 1) == 1
    valid = (word & 1) == 1

    @pl.when(first)
    def _():
        occ_ref[:] = jnp.zeros(occ_ref.shape, jnp.int32)

    @pl.when(valid)
    def _():
        o4 = o4_ref[0]
        d4 = d4_ref[0]
        w = w_ref[0]
        so, sd = _affine_products(o4, d4, w)
        _, _, _, hit = _field_epilogue(so, sd, c, t_min, tmax_ref[0])  # tmax (TR, 1)
        any_hit = jnp.max(hit.astype(jnp.int32), axis=-1, keepdims=True)
        occ_ref[0] = occ_ref[0] | any_hit


def _anyhit_chunk_pallas(o4, d4, tmax3, tri_w, cand, counts, work_cap, t_min, interpret):
    n_tiles, tr, _ = o4.shape
    c = tri_w.shape[-1] // 3
    tile_of, cluster_of, valid, overflow = build_worklist(cand, counts, work_cap)
    packed = pack_worklist(tile_of, cluster_of, valid)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(work_cap,),
        in_specs=[
            pl.BlockSpec((1, tr, 4), _TILE_IX),
            pl.BlockSpec((1, tr, 4), _TILE_IX),
            pl.BlockSpec((1, tr, 1), _TILE_IX),
            pl.BlockSpec((1, 4, 3 * c), _CLUSTER_IX),
        ],
        out_specs=[
            pl.BlockSpec((1, tr, 1), _TILE_IX),
        ],
    )
    (occ,) = pl.pallas_call(
        functools.partial(_anyhit_kernel, c, t_min),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, tr, 1), jnp.int32)],
        interpret=interpret,
    )(packed, o4, d4, tmax3, tri_w)
    return occ, overflow


def any_hit_tiles_pallas(o_t, d_t, t_max_t, accel: ClusterAccel, cand, counts,
                         work_cap: int, t_min=T_MIN, interpret: bool = False):
    n_tiles, tr, _ = o_t.shape
    if accel.num_clusters > MAX_CLUSTERS:
        raise ValueError(f"{accel.num_clusters} clusters exceeds packed-worklist "
                         f"capacity {MAX_CLUSTERS}; raise cluster_size")
    o4, d4 = _homog(o_t, d_t)
    tmax3 = t_max_t[..., None]
    ch, n_chunks, items = _chunk_plan(n_tiles, work_cap)

    if n_chunks == 1:
        occ, overflow = _anyhit_chunk_pallas(
            o4, d4, tmax3, accel.tri_w, cand, counts, ch * items, t_min, interpret)
        return occ[..., 0] != 0, overflow

    n_pad = ch * n_chunks
    o4c = _pad_tiles(o4, n_pad).reshape(n_chunks, ch, tr, 4)
    d4c = _pad_tiles(d4, n_pad).reshape(n_chunks, ch, tr, 4)
    tmaxc = _pad_tiles(tmax3, n_pad).reshape(n_chunks, ch, tr, 1)
    candc = _pad_tiles(cand, n_pad).reshape(n_chunks, ch, -1)
    countsc = _pad_tiles(counts, n_pad).reshape(n_chunks, ch)

    def one(args):
        o4i, d4i, tmi, candi, countsi = args
        return _anyhit_chunk_pallas(
            o4i, d4i, tmi, accel.tri_w, candi, countsi, ch * items, t_min, interpret)

    occ, over = jax.lax.map(one, (o4c, d4c, tmaxc, candc, countsc))
    return occ[..., 0].reshape(n_pad, tr)[:n_tiles] != 0, jnp.any(over)


# ---------------------------------------------------------------------------
# High-level tracers
# ---------------------------------------------------------------------------

def make_accel_tracers(scene, accel: ClusterAccel, use_pallas: bool = False,
                       k_cap: int | None = None, work_items_per_tile: int = 32,
                       tr: int = DEFAULT_TILE, interpret: bool = False):
    """Build (trace_fn, occlude_fn) over the cluster acceleration structure.

    k_cap caps the per-tile candidate list (None = all clusters: exact).
    work_items_per_tile sizes the Pallas work list (average, not per-tile
    max; overflow triggers a visible jax.debug warning, never a crash).
    """
    n_cl = accel.num_clusters
    k = n_cl if k_cap is None else min(k_cap, n_cl)

    # jax.debug.print is a host callback; some PJRT transports (e.g. the
    # remote-TPU tunnel, JAX_PLATFORMS=axon) don't support host send/recv,
    # so the overflow warning degrades to a no-op there. Overflow still
    # never corrupts results beyond truncating the candidate list.
    _callbacks_ok = "axon" not in os.environ.get("JAX_PLATFORMS", "")

    def _warn_overflow(flag, what):
        if not _callbacks_ok:
            return
        jax.lax.cond(
            flag != 0,
            lambda: jax.debug.print(
                "WARNING: tracer {} work-list overflow — image may be incomplete; "
                "raise work_items_per_tile/k_cap", what),
            lambda: None,
        )

    def trace_fn(ray: Ray) -> Hit:
        o_t, d_t, tiling = tile_rays(ray.o, ray.d, tr)
        cand, counts, cap_over = cull_clusters(accel, o_t, d_t, T_FAR, k)
        if use_pallas:
            work_cap = o_t.shape[0] * work_items_per_tile
            bt, btri, bu, bv, wl_over = trace_tiles_pallas(
                o_t, d_t, accel, cand, counts, work_cap, interpret=interpret)
            _warn_overflow(wl_over, "closest-hit")
        else:
            bt, btri, bu, bv = trace_tiles_jnp(o_t, d_t, accel, cand, counts)
        if k < n_cl:
            _warn_overflow(cap_over, "candidate-cap")
        uv = jnp.stack([bu, bv], axis=-1)
        return Hit(t=untile(bt, tiling), tri=untile(btri, tiling), uv=untile(uv, tiling))

    def occlude_fn(ray: Ray, t_max) -> jax.Array:
        o_t, d_t, tiling = tile_rays(ray.o, ray.d, tr)
        if jnp.ndim(t_max) == 0:
            t_max_t = jnp.full(o_t.shape[:2], t_max, jnp.float32)
        else:
            tm3 = jnp.broadcast_to(t_max[..., None], t_max.shape + (3,))
            t_max_t, _, _ = tile_rays(tm3, tm3, tr)
            t_max_t = t_max_t[..., 0]
        cand, counts, cap_over = cull_clusters(accel, o_t, d_t, t_max_t, k)
        if use_pallas:
            work_cap = o_t.shape[0] * work_items_per_tile
            occ, wl_over = any_hit_tiles_pallas(
                o_t, d_t, t_max_t, accel, cand, counts, work_cap, interpret=interpret)
            _warn_overflow(wl_over, "any-hit")
        else:
            occ = any_hit_tiles_jnp(o_t, d_t, t_max_t, accel, cand, counts)
        if k < n_cl:
            _warn_overflow(cap_over, "candidate-cap")
        return untile(occ, tiling)

    return trace_fn, occlude_fn
