"""HBM-streamed v2 traversal kernels: the >VMEM-resident scene tier.

The v2 sorted kernels (kernels.traversal2) keep the whole packed-pair
scene matrix in VMEM (~6.1 KB/cluster -> ~2048 clusters / ~262k tris max).
Past that, r4 fell back to the v1 work-list tier at 4.6M rays/s (a 10x
cliff — PERF_NOTES.md tier table). This module removes the cliff: the
same per-tile sorted front-to-back candidate walk, but the cluster
matrices stay in HBM and each candidate's (8, 3C) pair block is
demand-fetched into a small VMEM ring buffer with `NBUF`-deep async-DMA
lookahead, so the fetch of candidate k+NBUF overlaps the intersection of
candidate k. Total HBM traffic is candidates/frame * 6 KB — demand-driven,
not scene-size-driven, so throughput tracks the VMEM-resident tier's
candidate economics at any scene size.

Contract mirrors trace_tiles_sorted / any_hit_tiles_sorted exactly
(reference parity: same role as traversal2; SURVEY.md R3/T4).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.bvh.cluster import ClusterAccel
from tracer.core.types import Ray, Hit, T_FAR
from tracer.kernels.traversal import tile_rays, untile, _homog, T_MIN
from tracer.kernels.traversal2 import (
    _CL_MASK, _T_FAR_BITS, _batch_best, _cluster_t, _chunk, _pad_tiles,
    _pad_w, recover_hit, DEFAULT_GROUP)
from tracer.bvh.cull import cull_clusters_sorted2

# DMA lookahead depth: deep enough to hide HBM latency (~1 us) behind the
# ~0.35 us/candidate compute; ring buffer costs NBUF * 6.1 KB of VMEM.
NBUF = 4


def _word_cl(words, base, k, k_cap, n_cl):
    word = words[base + jnp.minimum(k, k_cap - 1)]
    return jnp.minimum(word & _CL_MASK, n_cl - 1)


def _closest_stream_kernel(k_cap, c, t_min, g_sz, batch, n_cl, words,
                           counts, o4_ref, d4_ref, w_hbm, bt_ref, bid_ref,
                           wbuf, sems, btT_ref):
    """Per-tile while_loop closest-hit with HBM-streamed cluster blocks.

    Ring-buffer protocol per tile: NBUF warm-up copies, then each
    iteration waits/intersects/re-arms `batch` slots (the re-arm fetches
    candidate k+NBUF into the slot just freed; index-clamped past the
    count — a harmless re-fetch) and folds the batch with ONE deferred
    reduction (_batch_best). Every started copy is waited: after the loop
    (early-out or exhaustion) the NBUF in-flight copies are drained so no
    semaphore leaks into the next tile."""
    i = pl.program_id(0)
    tr = o4_ref.shape[1]
    bt_ref[:] = jnp.full(bt_ref.shape, T_FAR, jnp.float32)
    bid_ref[:] = jnp.full(bid_ref.shape, -1, jnp.int32)
    btT_ref[:] = jnp.full(btT_ref.shape, T_FAR, jnp.float32)
    slots = jax.lax.broadcasted_iota(jnp.int32, (tr, c), 1)

    for g in range(g_sz):
        tile = i * g_sz + g
        o4 = o4_ref[g]
        d4 = d4_ref[g]
        n = counts[tile]
        base = tile * k_cap

        def copy(k, *, base=base):
            cl = _word_cl(words, base, k, k_cap, n_cl)
            slot = jax.lax.rem(k, NBUF)
            return pltpu.make_async_copy(
                w_hbm.at[cl >> 1], wbuf.at[slot], sems.at[slot])

        @pl.when(n > 0)
        def _run():
            for b in range(NBUF):
                copy(jnp.int32(b)).start()

            def cond(carry, *, n=n, base=base):
                k, bound_bits = carry
                word = words[base + jnp.minimum(k, k_cap - 1)]
                return (k < n) & ((word & ~_CL_MASK) < bound_bits)

            def body(carry, *, g=g, o4=o4, d4=d4, n=n, base=base):
                k, bound_bits = carry
                tvs, bids = [], []
                for j in range(batch):
                    copy(k + j).wait()
                    cl = _word_cl(words, base, k + j, k_cap, n_cl)
                    wp = wbuf[jax.lax.rem(k + j, NBUF)]
                    w = jnp.where((cl & 1) == 1, wp[4:8], wp[0:4])
                    tv = _cluster_t(o4, d4, w, c, t_min, T_FAR)
                    copy(k + j + NBUF).start()  # re-arm the freed slot
                    live = k + j < n
                    tvs.append(jnp.where(live, tv, T_FAR))
                    bids.append(slots + cl * c)
                bt_ref[g], bid_ref[g] = _batch_best(
                    tvs, bids, bt_ref[g], bid_ref[g])
                btT_ref[g:g + 1] = bt_ref[g].reshape(1, tr)
                bt_bits = jax.lax.bitcast_convert_type(btT_ref[g], jnp.int32)
                return k + batch, jnp.max(bt_bits)

            k_end, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(_T_FAR_BITS)))

            # Drain the NBUF copies still in flight.
            def drain(j, k_end):
                copy(k_end + j).wait()
                return k_end
            jax.lax.fori_loop(0, NBUF, drain, k_end)


def _anyhit_stream_kernel(k_cap, c, t_min, g_sz, batch, n_cl, words,
                          counts, o4_ref, d4_ref, tmax_ref, w_hbm, occ_ref,
                          wbuf, sems, occC_ref):
    """Lockstep-group occlusion with HBM-streamed cluster blocks: the G
    tiles of a grid step walk candidate slot k together (one early-out
    bound sync per slot, as in traversal2._anyhit_kernel); each tile
    fetches its own candidate into its own ring lane (G, NBUF, ...)."""
    i = pl.program_id(0)
    tr = o4_ref.shape[1]
    occC_ref[:] = jnp.zeros(occC_ref.shape, jnp.float32)
    base0 = i * g_sz
    n_max = counts[base0]

    def copy(g, k):
        cl = _word_cl(words, (base0 + g) * k_cap, k, k_cap, n_cl)
        slot = jax.lax.rem(k, NBUF)
        return pltpu.make_async_copy(
            w_hbm.at[cl >> 1], wbuf.at[g, slot], sems.at[g, slot])

    def bound_bits():
        tm = jnp.where(occC_ref[:] > 0.0, 0.0, tmax_ref[:])
        return jnp.max(jax.lax.bitcast_convert_type(tm, jnp.int32))

    @pl.when(n_max > 0)
    def _run():
        for g in range(g_sz):
            for b in range(NBUF):
                copy(g, jnp.int32(b)).start()

        def cond(carry):
            k, bound = carry
            e = words[base0 * k_cap + jnp.minimum(k, k_cap - 1)] & ~_CL_MASK
            for g in range(1, g_sz):
                wd = words[(base0 + g) * k_cap + jnp.minimum(k, k_cap - 1)]
                e = jnp.minimum(e, wd & ~_CL_MASK)
            return (k < n_max) & (e < bound)

        def body(carry):
            k, _ = carry
            for g in range(g_sz):
                m = None
                for j in range(batch):
                    copy(g, k + j).wait()
                    cl = _word_cl(words, (base0 + g) * k_cap, k + j,
                                  k_cap, n_cl)
                    wp = wbuf[g, jax.lax.rem(k + j, NBUF)]
                    w = jnp.where((cl & 1) == 1, wp[4:8], wp[0:4])
                    tv = _cluster_t(o4_ref[g], d4_ref[g], w, c, t_min,
                                    tmax_ref[g])
                    copy(g, k + j + NBUF).start()
                    live = k + j < counts[base0 + g]
                    tv = jnp.where(live, tv, T_FAR)
                    m = tv if m is None else jnp.minimum(m, tv)
                hit_any = jnp.min(m, axis=-1, keepdims=True) < T_FAR
                occC_ref[g] = jnp.maximum(occC_ref[g],
                                          hit_any.astype(jnp.float32))
            return k + batch, bound_bits()

        k_end, _ = jax.lax.while_loop(cond, body,
                                      (jnp.int32(0), bound_bits()))

        def drain(j, k_end):
            for g in range(g_sz):
                copy(g, k_end + j).wait()
            return k_end
        jax.lax.fori_loop(0, NBUF, drain, k_end)

    for g in range(g_sz):
        occ_ref[g] = occC_ref[g].reshape(1, tr)


STREAM_BATCH = 2


def trace_tiles_streamed(o_t, d_t, accel: ClusterAccel, words, counts,
                         t_min=T_MIN, interpret: bool = False,
                         group: int = DEFAULT_GROUP,
                         batch: int = STREAM_BATCH):
    """Closest-hit over HBM-resident geometry: (bt, gid) each (Nt, TR)."""
    o4, d4 = _homog(o_t, d_t)
    w_all = _pad_w(accel.tri_w)
    n_tiles, tr, _ = o4.shape
    c = accel.cluster_size
    k_cap = words.shape[1]
    ch, n_chunks = _chunk(n_tiles, k_cap, group)

    def call(o4c, d4c, wordsc, countsc):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(o4c.shape[0] // group,),
            in_specs=[
                pl.BlockSpec((group, tr, 4), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((group, tr, 4), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),  # w stays in HBM
            ],
            out_specs=[
                pl.BlockSpec((group, tr, 1), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((group, tr, 1), lambda i, *_: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((NBUF, 8, 3 * c), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.VMEM((group, tr), jnp.float32),
            ],
        )
        return pl.pallas_call(
            functools.partial(_closest_stream_kernel, k_cap, c, t_min,
                              group, batch, accel.num_clusters),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((o4c.shape[0], tr, 1), jnp.float32),
                jax.ShapeDtypeStruct((o4c.shape[0], tr, 1), jnp.int32),
            ],
            interpret=interpret,
        )(wordsc.reshape(-1), countsc, o4c, d4c, w_all)

    n_pad = ch * n_chunks
    o4c = _pad_tiles(o4, n_pad)
    d4c = _pad_tiles(d4, n_pad)
    wordsc = _pad_tiles(words, n_pad)
    countsc = _pad_tiles(counts, n_pad)
    if n_chunks == 1:
        bt, bid = call(o4c, d4c, wordsc, countsc)
        return bt[:n_tiles, :, 0], bid[:n_tiles, :, 0]
    bt, bid = jax.lax.map(
        lambda a: call(*a),
        (o4c.reshape(n_chunks, ch, tr, 4), d4c.reshape(n_chunks, ch, tr, 4),
         wordsc.reshape(n_chunks, ch, k_cap), countsc.reshape(n_chunks, ch)))
    out = lambda x: x.reshape(n_pad, tr)[:n_tiles]
    return out(bt[..., 0]), out(bid[..., 0])


def any_hit_tiles_streamed(o_t, d_t, t_max_t, accel: ClusterAccel, words,
                           counts, t_min=T_MIN, interpret: bool = False,
                           group: int = DEFAULT_GROUP,
                           batch: int = STREAM_BATCH):
    """Occlusion over HBM-resident geometry: (Nt, TR) bool."""
    from tracer.kernels.traversal2 import _anyhit_prep

    o4, d4, tmax3, order, inv, words_s, counts_s, w_all = _anyhit_prep(
        o_t, d_t, t_max_t, accel, words, counts)
    n_tiles, tr, _ = o4.shape
    c = accel.cluster_size
    k_cap = words_s.shape[1]
    ch, n_chunks = _chunk(n_tiles, k_cap, group)

    def call(o4c, d4c, tmc, wordsc, countsc):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(o4c.shape[0] // group,),
            in_specs=[
                pl.BlockSpec((group, tr, 4), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((group, tr, 4), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((group, tr, 1), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[pl.BlockSpec((group, 1, tr), lambda i, *_: (i, 0, 0))],
            scratch_shapes=[
                pltpu.VMEM((group, NBUF, 8, 3 * c), jnp.float32),
                pltpu.SemaphoreType.DMA((group, NBUF)),
                pltpu.VMEM((group, tr, 1), jnp.float32),
            ],
        )
        (occ,) = pl.pallas_call(
            functools.partial(_anyhit_stream_kernel, k_cap, c, t_min,
                              group, batch, accel.num_clusters),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((o4c.shape[0], 1, tr),
                                            jnp.float32)],
            interpret=interpret,
        )(wordsc.reshape(-1), countsc, o4c, d4c, tmc, w_all)
        return occ

    n_pad = ch * n_chunks
    o4c = _pad_tiles(o4, n_pad)
    d4c = _pad_tiles(d4, n_pad)
    tmc = _pad_tiles(tmax3, n_pad)
    wordsc = _pad_tiles(words_s, n_pad)
    countsc = _pad_tiles(counts_s, n_pad)
    if n_chunks == 1:
        return call(o4c, d4c, tmc, wordsc, countsc)[:n_tiles, 0, :][inv] != 0
    occ = jax.lax.map(
        lambda a: call(*a),
        (o4c.reshape(n_chunks, ch, tr, 4), d4c.reshape(n_chunks, ch, tr, 4),
         tmc.reshape(n_chunks, ch, tr, 1),
         wordsc.reshape(n_chunks, ch, k_cap), countsc.reshape(n_chunks, ch)))
    return (occ[:, :, 0, :].reshape(n_pad, tr)[:n_tiles][inv]) != 0


def make_streamed_tracers_aux(scene, accel: ClusterAccel, k_cap: int = 256,
                              tr: int = 64, s_cap: int = 64,
                              interpret: bool = False, t_min=T_MIN,
                              k_occ: int | None = None):
    """Like make_streamed_tracers, but each tracer also returns its cull's
    aux {"excess", "need_k", "need_s"} so the caller (the streamed render
    fn's sizing loop, via render_wavefront_aux) can escalate caps until
    the frame is exact — the same surfaced-truncation contract as the
    tiled path."""
    k = min(k_cap, accel.num_clusters)
    k = max(8, -(-k // 8) * 8)
    ko = min(k_occ if k_occ is not None else k_cap, accel.num_clusters)
    ko = max(8, -(-ko // 8) * 8)

    def trace_fn(ray: Ray):
        o_t, d_t, tiling = tile_rays(ray.o, ray.d, tr)
        words, counts, excess, need = cull_clusters_sorted2(
            accel, o_t, d_t, T_FAR, k, s_cap)
        bt, gid = trace_tiles_streamed(o_t, d_t, accel, words, counts,
                                       t_min=t_min, interpret=interpret)
        hit = recover_hit(scene, ray, untile(bt, tiling),
                          untile(gid, tiling), accel, t_min=t_min)
        return hit, {"excess": excess, "need_k": need[0], "need_s": need[1]}

    def occlude_fn(ray: Ray, t_max):
        o_t, d_t, tiling = tile_rays(ray.o, ray.d, tr)
        if jnp.ndim(t_max) == 0:
            t_max_t = jnp.full(o_t.shape[:2], t_max, jnp.float32)
        else:
            tm3 = jnp.broadcast_to(t_max[..., None], t_max.shape + (3,))
            t_max_t, _, _ = tile_rays(tm3, tm3, tr)
            t_max_t = t_max_t[..., 0]
        words, counts, excess, need = cull_clusters_sorted2(
            accel, o_t, d_t, t_max_t, ko, s_cap)
        occ = any_hit_tiles_streamed(o_t, d_t, t_max_t, accel, words,
                                     counts, t_min=t_min,
                                     interpret=interpret)
        return untile(occ, tiling), {"excess": excess, "need_k": need[0],
                                     "need_s": need[1]}

    return trace_fn, occlude_fn


def make_streamed_tracers(scene, accel: ClusterAccel, k_cap: int = 256,
                          tr: int = 64, s_cap: int = 64,
                          interpret: bool = False, t_min=T_MIN,
                          k_occ: int | None = None):
    """(trace_fn, occlude_fn) over the streamed kernel path — the
    production tier for scenes past the VMEM-resident cluster budget.
    `k_occ` sets the occlusion pass's own candidate cap (light-origin
    frusta are typically fatter than the camera's; defaults to k_cap)."""
    k = min(k_cap, accel.num_clusters)
    k = max(8, -(-k // 8) * 8)
    ko = min(k_occ if k_occ is not None else k_cap, accel.num_clusters)
    ko = max(8, -(-ko // 8) * 8)

    def trace_fn(ray: Ray) -> Hit:
        o_t, d_t, tiling = tile_rays(ray.o, ray.d, tr)
        words, counts, _overflow, _need = cull_clusters_sorted2(
            accel, o_t, d_t, T_FAR, k, s_cap)
        bt, gid = trace_tiles_streamed(o_t, d_t, accel, words, counts,
                                       t_min=t_min, interpret=interpret)
        return recover_hit(scene, ray, untile(bt, tiling),
                           untile(gid, tiling), accel, t_min=t_min)

    def occlude_fn(ray: Ray, t_max) -> jax.Array:
        o_t, d_t, tiling = tile_rays(ray.o, ray.d, tr)
        if jnp.ndim(t_max) == 0:
            t_max_t = jnp.full(o_t.shape[:2], t_max, jnp.float32)
        else:
            tm3 = jnp.broadcast_to(t_max[..., None], t_max.shape + (3,))
            t_max_t, _, _ = tile_rays(tm3, tm3, tr)
            t_max_t = t_max_t[..., 0]
        words, counts, _overflow, _need = cull_clusters_sorted2(
            accel, o_t, d_t, t_max_t, ko, s_cap)
        occ = any_hit_tiles_streamed(o_t, d_t, t_max_t, accel, words,
                                     counts, t_min=t_min,
                                     interpret=interpret)
        return untile(occ, tiling)

    return trace_fn, occlude_fn
