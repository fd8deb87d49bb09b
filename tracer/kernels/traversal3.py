"""Third-generation traversal kernels: flat (tile, candidate) pair grid.

STATUS — PARKED (round 3, VERDICT r2 item 10 resolution): the v2 sorted
kernels with G-tile x B-candidate batching (traversal2) run the
1080p/100k-tri bench at ~142 ms/frame, while this pair-grid variant's 1080p
compile hung the Mosaic toolchain (>70 min, killed; scripts/profile_v3.py).
Nothing on the hot path imports this module; it remains as an
interpret-mode-tested reference design (tests/unit/test_traversal3.py) for
data-driven index-map streaming, not a production tier.

Reference parity: same role as kernels.traversal2 — the TPU-native
replacement for the reference's divergent per-ray stack traversal
(SURVEY.md R3). v2 walked each tile's sorted candidate list with a
`lax.while_loop` inside the kernel; measured on-chip, that loop costs
~0.45 us PER CANDIDATE in pure scalar/bookkeeping overhead (slab test,
cross-lane reduces, loop latency) — 5-10x the dense intersection body it
guards. v3 removes the scalar loop entirely:

  * the per-tile candidate lists (already sorted front-to-back by
    bvh.cull.cull_clusters_sorted) are flattened into ONE global pair
    stream ordered (tile, entry-t). The expansion is sort/scatter-free:
    a cumsum over counts + vectorized `searchsorted` + two gathers;
  * the Pallas grid runs over pairs. Mosaic pipelines the per-step DMAs
    (cluster matrix (8, 3C) via an index_map on the prefetched pair
    words; ray blocks re-fetched only when the tile changes), so a
    skipped step costs scalar compares only — no while_loop latency;
  * per-tile state (best-t per ray, early-out bound) lives in scratch
    that persists across grid steps; outputs are revisited in place and
    flushed when the pair stream moves to the next tile;
  * early termination is per-step: the pair's conservative entry-t (high
    bits of the packed word) is compared against the tile's running
    max-best-t bound in SMEM — strictly the same skip rule as v2's loop
    exit, applied per pair;
  * the pair stream is chunked to bound SMEM (scalar-prefetch) usage;
    chunk windows are overlapped by one tile so every tile is fully
    processed by at least one chunk, and chained input/output aliasing
    makes later chunks preserve earlier chunks' finished tiles.

Overflow degrade: if the pair budget (pairs_per_tile * Ntiles) is
exceeded, per-tile counts are uniformly clamped — the DROPPED candidates
are each tile's farthest (lists are sorted front-to-back), so the image
degrades from the far geometry first instead of losing whole tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.bvh.cluster import ClusterAccel
from tracer.bvh.cull import cull_clusters_sorted, CLUSTER_BITS, WORD_INVALID
from tracer.core.types import Ray, Hit, T_FAR
from tracer.kernels.traversal import tile_rays, untile, _homog, T_MIN
from tracer.kernels.traversal2 import (
    _cluster_t, _ray_rows, _slab_enter, recover_hit)


def _pad_w(tri_w):
    """(Ncl, 4, 3C) -> (Ncl, 8, 3C) zero-padded sublane tiles. Local to the
    parked v3 design: its BlockSpec streams one cluster block per pair, so
    it keeps the one-cluster-per-tile layout (traversal2 moved to a packed
    two-clusters-per-tile layout its kernels unpack with _w_half)."""
    import jax.numpy as jnp

    n_cl, rows, w3c = tri_w.shape
    return jnp.concatenate(
        [tri_w, jnp.zeros((n_cl, 8 - rows, w3c), tri_w.dtype)], axis=1)


def _boxes(accel):
    """(Ncl, 8) scalar table: lo.xyz, hi.xyz, pad, pad (v3-local)."""
    import jax.numpy as jnp

    z = jnp.zeros((accel.num_clusters, 2), accel.cluster_lo.dtype)
    return jnp.concatenate([accel.cluster_lo, accel.cluster_hi, z], axis=1)

import numpy as _np

DEFAULT_PAIRS_PER_TILE = 12
# Scalar-prefetch budget per pallas_call: 2 int32 streams of this length.
PAIR_CHUNK = 48 * 1024
_CL_MASK = (1 << CLUSTER_BITS) - 1
_T_FAR_BITS = int(_np.float32(T_FAR).view(_np.int32))


def build_pair_stream(words, counts, p_cap: int):
    """Flatten per-tile sorted candidate lists into a global pair stream.

    words: (Nt, K) packed (entry_t | cluster) sorted ascending per tile
    counts: (Nt,) candidates per tile
    Returns (tiles (p_cap,), pwords (p_cap,), total, overflow). Padding
    pairs point at tile index Nt (a trash row) with WORD_INVALID.
    Every tile emits >= 1 pair (empty tiles emit their WORD_INVALID
    sentinel) so every output block gets initialized.
    """
    n_tiles, k = words.shape
    counts2 = jnp.maximum(counts, 1)
    total0 = jnp.sum(counts2)
    overflow = total0 > p_cap
    # Graceful degrade: uniform per-tile clamp keeps each tile's NEAREST
    # candidates (lists are sorted front-to-back).
    counts2 = jnp.where(overflow,
                        jnp.minimum(counts2, jnp.maximum(p_cap // n_tiles, 1)),
                        counts2)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts2).astype(jnp.int32)])
    total = offs[-1]
    p = jnp.arange(p_cap, dtype=jnp.int32)
    tile = jnp.clip(jnp.searchsorted(offs, p, side="right").astype(jnp.int32) - 1,
                    0, n_tiles - 1)
    kk = jnp.clip(p - offs[tile], 0, k - 1)
    pw = words[tile, kk]
    valid = p < total
    tiles = jnp.where(valid, tile, n_tiles)
    pwords = jnp.where(valid, pw, WORD_INVALID)
    return tiles, pwords, total, overflow


def _pair_closest_kernel(n_cl, c, t_min, tiles, words, boxes,
                         o4_ref, d4_ref, rt_ref, w_ref, bt_in, bid_in,
                         bt_ref, bid_ref, btT, bound):
    p = pl.program_id(0)
    del bt_in, bid_in  # aliased carries; contents preserved, never read
    tr = o4_ref.shape[1]
    t_id = tiles[p]
    new_tile = (p == 0) | (t_id != tiles[jnp.maximum(p - 1, 0)])

    @pl.when(new_tile)
    def _():
        bt_ref[:] = jnp.full(bt_ref.shape, T_FAR, jnp.float32)
        bid_ref[:] = jnp.full(bid_ref.shape, -1, jnp.int32)
        btT[:] = jnp.full(btT.shape, T_FAR, jnp.float32)
        bound[0] = _T_FAR_BITS

    word = words[p]

    @pl.when((word & ~_CL_MASK) < bound[0])
    def _():
        cl = jnp.minimum(word & _CL_MASK, n_cl)
        rt = rt_ref[0]
        enter = _slab_enter(rt, boxes[cl, 0], boxes[cl, 1], boxes[cl, 2],
                            boxes[cl, 3], boxes[cl, 4], boxes[cl, 5])

        @pl.when(jnp.any(enter < btT[0]))
        def _():
            tv = _cluster_t(o4_ref[0], d4_ref[0], w_ref[0], c, t_min, T_FAR)
            tmin = jnp.min(tv, axis=-1, keepdims=True)  # (TR, 1)
            slots = jax.lax.broadcasted_iota(jnp.int32, (tr, c), 1)
            slot = jnp.min(jnp.where(tv == tmin, slots, c), axis=-1,
                           keepdims=True)
            better = tmin < bt_ref[0]
            bt_ref[0] = jnp.where(better, tmin, bt_ref[0])
            bid_ref[0] = jnp.where(better, cl * c + slot, bid_ref[0])
            btT[:] = bt_ref[0].reshape(1, tr)
            bound[0] = jnp.max(
                jax.lax.bitcast_convert_type(btT[0], jnp.int32))


def _pair_anyhit_kernel(n_cl, c, t_min, tiles, words, boxes,
                        o4_ref, d4_ref, tmax_ref, rt_ref, w_ref, occ_in,
                        occ_ref, bound):
    p = pl.program_id(0)
    del occ_in
    tr = o4_ref.shape[1]
    t_id = tiles[p]
    new_tile = (p == 0) | (t_id != tiles[jnp.maximum(p - 1, 0)])
    rt = rt_ref[0]
    tmax_row = rt[7:8]

    @pl.when(new_tile)
    def _():
        occ_ref[:] = jnp.zeros(occ_ref.shape, jnp.float32)
        bound[0] = jnp.max(
            jax.lax.bitcast_convert_type(tmax_row, jnp.int32))

    word = words[p]

    @pl.when((word & ~_CL_MASK) < bound[0])
    def _():
        cl = jnp.minimum(word & _CL_MASK, n_cl)
        enter = _slab_enter(rt, boxes[cl, 0], boxes[cl, 1], boxes[cl, 2],
                            boxes[cl, 3], boxes[cl, 4], boxes[cl, 5])
        touch = (enter < tmax_row) & (occ_ref[0] == 0.0)

        @pl.when(jnp.any(touch))
        def _():
            tv = _cluster_t(o4_ref[0], d4_ref[0], w_ref[0], c, t_min,
                            tmax_ref[0])
            hit_any = jnp.min(tv, axis=-1, keepdims=True) < T_FAR  # (TR, 1)
            occ_ref[:] = jnp.maximum(
                occ_ref[:], hit_any.astype(jnp.float32).reshape(1, 1, tr))
            tm = jnp.where(occ_ref[0] > 0.0, 0.0, tmax_row)
            bound[0] = jnp.max(jax.lax.bitcast_convert_type(tm, jnp.int32))


def _chunk_windows(offs, n_chunks: int, p_stride: int, n_tiles: int):
    """Chunk i covers pairs [A_i, A_i + PAIR_CHUNK) with A_i the largest
    tile boundary <= i*p_stride; consecutive windows overlap by at least
    the straddling tile, so every tile is fully inside some window."""
    starts = []
    for i in range(n_chunks):
        t0 = jnp.clip(
            jnp.searchsorted(offs, jnp.int32(i * p_stride), side="right") - 1,
            0, n_tiles - 1)
        starts.append(offs[t0])
    return starts


def _pad_tile_dim(x):
    return jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)])


def trace_tiles_pairs(o_t, d_t, accel: ClusterAccel, words, counts,
                      t_min=T_MIN, pairs_per_tile: int = DEFAULT_PAIRS_PER_TILE,
                      interpret: bool = False):
    """Closest-hit over the pair grid: (bt, gid, overflow) — bt/gid (Ntiles,
    TR); overflow True when the pairs_per_tile budget truncated candidates
    (callers must surface it; ADVICE r2)."""
    n_tiles, tr, _ = o_t.shape
    c = accel.cluster_size
    n_cl = accel.num_clusters
    o4, d4 = _homog(o_t, d_t)
    rt = _ray_rows(o_t, d_t)
    w_all = jnp.concatenate(
        [_pad_w(accel.tri_w),
         jnp.zeros((1, 8, accel.tri_w.shape[2]), accel.tri_w.dtype)])
    boxes = jnp.concatenate(
        [_boxes(accel),
         jnp.full((1, 8), 2.0 * T_FAR, jnp.float32)])
    o4p, d4p, rtp = _pad_tile_dim(o4), _pad_tile_dim(d4), _pad_tile_dim(rt)

    p_cap = -(-max(pairs_per_tile * n_tiles, 1) // PAIR_CHUNK) * PAIR_CHUNK
    tiles, pwords, total, overflow = _build_stream_clamped(
        words, counts, p_cap, n_tiles)

    bt = jnp.full((n_tiles + 1, tr, 1), T_FAR, jnp.float32)
    bid = jnp.full((n_tiles + 1, tr, 1), -1, jnp.int32)

    kern = functools.partial(_pair_closest_kernel, n_cl, c, t_min)

    def call(tiles_c, words_c, bt, bid):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(tiles_c.shape[0],),
            in_specs=[
                pl.BlockSpec((1, tr, 4), lambda p, t, w, b: (t[p], 0, 0)),
                pl.BlockSpec((1, tr, 4), lambda p, t, w, b: (t[p], 0, 0)),
                pl.BlockSpec((1, 8, tr), lambda p, t, w, b: (t[p], 0, 0)),
                pl.BlockSpec(
                    (1, 8, w_all.shape[2]),
                    lambda p, t, w, b: (jnp.minimum(w[p] & _CL_MASK, n_cl), 0, 0)),
                pl.BlockSpec((1, tr, 1), lambda p, t, w, b: (t[p], 0, 0)),
                pl.BlockSpec((1, tr, 1), lambda p, t, w, b: (t[p], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tr, 1), lambda p, t, w, b: (t[p], 0, 0)),
                pl.BlockSpec((1, tr, 1), lambda p, t, w, b: (t[p], 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((1, tr), jnp.float32),
                            pltpu.SMEM((1,), jnp.int32)],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles + 1, tr, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles + 1, tr, 1), jnp.int32),
            ],
            # Flat arg order: tiles, words, boxes, o4, d4, rt, w, bt, bid.
            input_output_aliases={7: 0, 8: 1},
            interpret=interpret,
        )(tiles_c, words_c, boxes, o4p, d4p, rtp, w_all, bt, bid)

    for tiles_c, words_c in _iter_chunks(tiles, pwords, counts, n_tiles,
                                         p_cap):
        bt, bid = call(tiles_c, words_c, bt, bid)
    return bt[:n_tiles, :, 0], bid[:n_tiles, :, 0], overflow


def any_hit_tiles_pairs(o_t, d_t, t_max_t, accel: ClusterAccel, words, counts,
                        t_min=T_MIN,
                        pairs_per_tile: int = DEFAULT_PAIRS_PER_TILE,
                        interpret: bool = False):
    """Occlusion over the pair grid: ((Ntiles, TR) bool, overflow)."""
    n_tiles, tr, _ = o_t.shape
    c = accel.cluster_size
    n_cl = accel.num_clusters
    o4, d4 = _homog(o_t, d_t)
    tmax3 = t_max_t[..., None]
    rt = _ray_rows(o_t, d_t)
    rt = rt.at[:, 7, :].set(jnp.where(rt[:, 6, :] > 0, t_max_t, 0.0))
    w_all = jnp.concatenate(
        [_pad_w(accel.tri_w),
         jnp.zeros((1, 8, accel.tri_w.shape[2]), accel.tri_w.dtype)])
    boxes = jnp.concatenate(
        [_boxes(accel),
         jnp.full((1, 8), 2.0 * T_FAR, jnp.float32)])
    o4p, d4p = _pad_tile_dim(o4), _pad_tile_dim(d4)
    rtp, tmp = _pad_tile_dim(rt), _pad_tile_dim(tmax3)

    p_cap = -(-max(pairs_per_tile * n_tiles, 1) // PAIR_CHUNK) * PAIR_CHUNK
    tiles, pwords, total, overflow = _build_stream_clamped(
        words, counts, p_cap, n_tiles)

    occ = jnp.zeros((n_tiles + 1, 1, tr), jnp.float32)
    kern = functools.partial(_pair_anyhit_kernel, n_cl, c, t_min)

    def call(tiles_c, words_c, occ):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(tiles_c.shape[0],),
            in_specs=[
                pl.BlockSpec((1, tr, 4), lambda p, t, w, b: (t[p], 0, 0)),
                pl.BlockSpec((1, tr, 4), lambda p, t, w, b: (t[p], 0, 0)),
                pl.BlockSpec((1, tr, 1), lambda p, t, w, b: (t[p], 0, 0)),
                pl.BlockSpec((1, 8, tr), lambda p, t, w, b: (t[p], 0, 0)),
                pl.BlockSpec(
                    (1, 8, w_all.shape[2]),
                    lambda p, t, w, b: (jnp.minimum(w[p] & _CL_MASK, n_cl), 0, 0)),
                pl.BlockSpec((1, 1, tr), lambda p, t, w, b: (t[p], 0, 0)),
            ],
            out_specs=[pl.BlockSpec((1, 1, tr), lambda p, t, w, b: (t[p], 0, 0))],
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )
        (out,) = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((n_tiles + 1, 1, tr), jnp.float32)],
            # Flat arg order: tiles, words, boxes, o4, d4, tmax, rt, w, occ.
            input_output_aliases={8: 0},
            interpret=interpret,
        )(tiles_c, words_c, boxes, o4p, d4p, tmp, rtp, w_all, occ)
        return out

    for tiles_c, words_c in _iter_chunks(tiles, pwords, counts, n_tiles,
                                         p_cap):
        occ = call(tiles_c, words_c, occ)
    return occ[:n_tiles, 0, :] != 0, overflow


def _build_stream_clamped(words, counts, p_cap, n_tiles):
    # _iter_chunks' overlapping-window coverage guarantee requires every
    # tile's candidate list to fit the window overlap (ADVICE r2).
    assert words.shape[1] <= PAIR_CHUNK // 4, (
        f"k_cap {words.shape[1]} > PAIR_CHUNK//4 {PAIR_CHUNK // 4}: "
        "chunk windows could split a tile's pair run")
    return build_pair_stream(words, counts, p_cap)


def _iter_chunks(tiles, pwords, counts, n_tiles, p_cap):
    """Yield (tiles_c, words_c) scalar-prefetch chunks of the pair stream.

    Single chunk when the stream fits; otherwise overlapping windows
    anchored at tile boundaries (see module docstring)."""
    if p_cap <= PAIR_CHUNK:
        yield tiles, pwords
        return
    counts2 = jnp.maximum(counts, 1)
    # Re-derive offs exactly as build_pair_stream did (incl. overflow clamp).
    total0 = jnp.sum(counts2)
    counts2 = jnp.where(total0 > p_cap,
                        jnp.minimum(counts2, jnp.maximum(p_cap // n_tiles, 1)),
                        counts2)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts2).astype(jnp.int32)])
    k_max = PAIR_CHUNK // 4
    p_stride = PAIR_CHUNK - k_max
    n_chunks = -(-p_cap // p_stride)
    starts = _chunk_windows(offs, n_chunks, p_stride, n_tiles)
    idx = jnp.arange(PAIR_CHUNK, dtype=jnp.int32)
    for a in starts:
        sl = jnp.clip(a + idx, 0, p_cap - 1)
        yield tiles[sl], pwords[sl]


def make_pair_tracers(scene, accel: ClusterAccel, k_cap: int = 256,
                      tr: int = 64, interpret: bool = False,
                      t_min=T_MIN,
                      pairs_per_tile: int = DEFAULT_PAIRS_PER_TILE):
    """(trace_fn, occlude_fn) over the pair-grid kernel path — drop-in
    replacement for kernels.traversal2.make_sorted_tracers."""
    k = min(k_cap, accel.num_clusters)
    k = max(8, -(-k // 8) * 8)

    def trace_fn(ray: Ray) -> Hit:
        o_t, d_t, tiling = tile_rays(ray.o, ray.d, tr)
        words, counts, _ = cull_clusters_sorted(accel, o_t, d_t, T_FAR, k)
        bt, gid, _overflow = trace_tiles_pairs(
            o_t, d_t, accel, words, counts, t_min=t_min,
            pairs_per_tile=pairs_per_tile, interpret=interpret)
        return recover_hit(scene, ray, untile(bt, tiling), untile(gid, tiling),
                           accel, t_min=t_min)

    def occlude_fn(ray: Ray, t_max) -> jax.Array:
        o_t, d_t, tiling = tile_rays(ray.o, ray.d, tr)
        if jnp.ndim(t_max) == 0:
            t_max_t = jnp.full(o_t.shape[:2], t_max, jnp.float32)
        else:
            tm3 = jnp.broadcast_to(t_max[..., None], t_max.shape + (3,))
            t_max_t, _, _ = tile_rays(tm3, tm3, tr)
            t_max_t = t_max_t[..., 0]
        words, counts, _ = cull_clusters_sorted(accel, o_t, d_t, t_max_t, k)
        occ, _overflow = any_hit_tiles_pairs(
            o_t, d_t, t_max_t, accel, words, counts, t_min=t_min,
            pairs_per_tile=pairs_per_tile, interpret=interpret)
        return untile(occ, tiling)

    return trace_fn, occlude_fn
