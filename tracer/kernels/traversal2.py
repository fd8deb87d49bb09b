"""Second-generation traversal kernels: per-tile front-to-back candidate
scan with early termination and per-ray AABB pruning.

Reference parity: this is the TPU-native replacement for the reference's
divergent per-ray stack traversal (SURVEY.md R3) — the role the OpenCL
`while(stack)` loop plays on a GPU is played here by a per-tile sorted
candidate list with a data-dependent `while_loop` that stops as soon as no
remaining cluster can beat every ray's current best hit.

Design (vs kernels.traversal v1, which this supersedes on the hot path):
  * grid = image tiles (not flattened work items): no padding steps, no
    work-list construction pass;
  * candidates arrive pre-sorted front-to-back (bvh.cull.cull_clusters_sorted2
    packs quantized-entry-t | cluster-id into one int32 and sorts — the sort
    IS the traversal order);
  * early termination: the kernel carries a per-tile bound = max over rays of
    the current best t; once the next candidate's conservative entry t
    exceeds it, no remaining candidate (sorted!) can improve any ray;
  * three-tier partition over count-sorted tiles (trace_tiles_split): heavy
    tiles run the generic while-loop kernel, count<=1 tiles (the p50 regime)
    run a straight-line no-while kernel, empty tiles get constants — with
    static partition points sized per scene by the API and out-of-tier
    tiles surfaced as excess, never silently wrong;
  * cluster matrices live whole in VMEM, TWO clusters packed per (8, 128)
    sublane tile (~6.1 KB/cluster — _pad_w/_w_half), so the inner loop is
    pure VPU work with an aligned dynamic slice, no per-item DMA;
  * the kernel tracks only (best-t, best-global-slot) per ray; barycentrics
    and the original triangle id are recovered OUTSIDE the kernel with one
    gather + a single-triangle Moller-Trumbore per ray (cheap, exact).

(The v3 experiment's per-ray in-kernel AABB prune helpers _ray_rows /
_slab_enter remain here for kernels.traversal3, the parked design record.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer.bvh.cluster import ClusterAccel
from tracer.bvh.cull import cull_clusters_sorted2, CLUSTER_BITS
from tracer.core.types import Ray, Hit, T_FAR
from tracer.core.intersect import moller_trumbore
from tracer.kernels.traversal import tile_rays, untile, _homog, T_MIN

import numpy as _np

DEFAULT_K = 256
# SMEM budget for the packed candidate words (plus slack for counts).
MAX_WORDS_PER_CALL = 128 * 1024
_CL_MASK = (1 << CLUSTER_BITS) - 1
_T_FAR_BITS = int(_np.float32(T_FAR).view(_np.int32))  # python int: safe to close over
_BIG = float(T_FAR)  # python float: safe to close over in kernels
_INT_MAX = 2147483647


def _batch_best(tvs, bids, bt_prev, bid_prev):
    """Deferred best-hit reduction over a batch of candidate tv maps.

    tvs: list of (TR, C) t-or-T_FAR maps, one per candidate, in sorted
    (front-to-back) order; bids: matching (TR, C) int32 global-slot maps
    (cluster*C + lane). Returns (bt, bid) updated from (bt_prev, bid_prev).

    Why deferred: reducing per candidate costs two cross-lane reductions
    (t-min + slot-argmin, ~7 shuffle steps each on (TR, 128)) per candidate
    and serializes the candidates through the running-best update. Folding
    the batch first does B-1 elementwise mins + B-1 selects, then TWO
    reductions per batch — and leaves the B _cluster_t dependency chains
    independent so the VPU can interleave them (the products->divide->uv
    chain stalls are the measured wall, PERF_NOTES.md).

    Tie-break: strictly-earlier batches win (strict <); within a batch the
    earliest candidate j wins per lane (first-match select fold). The only
    divergence from the per-candidate original is a bit-equal t achieved by
    DIFFERENT candidates on DIFFERENT lanes of the same tile row, where the
    smaller global slot now wins — unobservable outside exact fp ties
    between distinct triangles."""
    m = tvs[0]
    for tv in tvs[1:]:
        m = jnp.minimum(m, tv)
    bid_lane = bids[-1]
    for j in range(len(tvs) - 2, -1, -1):
        bid_lane = jnp.where(tvs[j] == m, bids[j], bid_lane)
    tmin = jnp.min(m, axis=-1, keepdims=True)
    bid_new = jnp.min(jnp.where(m == tmin, bid_lane, _INT_MAX),
                      axis=-1, keepdims=True)
    better = tmin < bt_prev
    return jnp.where(better, tmin, bt_prev), jnp.where(better, bid_new, bid_prev)


def _products(o4, d4, w, *, shared_o: bool = False):
    """(TR, 4) x (4, 3C) via broadcast FMA on the VPU (fp32-exact).

    Exploits the homogeneous structure: o4[:, 3] == 1 (the w-row is a plain
    bias) and d4[:, 3] == 0 (directions have no translation component), so
    so costs 3 FMAs + 1 add and sd costs 1 mul + 2 FMAs instead of 4 each.

    shared_o=True: every ray in the pass shares ONE exact origin (primary
    rays from the camera, light-origin shadow segments), so the origin-side
    product collapses from (TR, 3C) to a (1, 3C) row computed off ray 0 and
    broadcast in the epilogue — bit-identical results (same values through
    the same ops), ~1/3 fewer product vreg-ops per candidate. The caller
    must guarantee the origins are EXACTLY equal (jnp.broadcast_to of one
    point); per-ray origins with shared_o=True silently use ray 0's.
    """
    o_rows = o4[0:1, :] if shared_o else o4
    so = (w[3:4, :] + o_rows[:, 0:1] * w[0:1, :] + o_rows[:, 1:2] * w[1:2, :]
          + o_rows[:, 2:3] * w[2:3, :])
    sd = (d4[:, 0:1] * w[0:1, :] + d4[:, 1:2] * w[1:2, :]
          + d4[:, 2:3] * w[2:3, :])
    return so, sd


def _cluster_t(o4, d4, w, c, t_min, t_max_col, *, approx: bool = False,
               shared_o: bool = False):
    """Intersect one tile against one cluster -> tv (TR, C): t or T_FAR.

    approx=True uses the VPU's approximate-reciprocal op instead of a
    full divide. Measured on the 100k-tri bench it is ~15% SLOWER end to
    end (Mosaic's divide lowering beats the where+mul+reciprocal chain),
    so production passes keep approx=False; the flag remains for future
    hardware where the trade flips."""
    # NOT the MXU: a (2TR, 8) x (8, 3C) dot at precision=HIGHEST was
    # measured 45% SLOWER end to end (closest 56 -> 82 ms at 1080p/100k) —
    # the K=8-thin fp32 multi-pass matmul loses to these structured
    # broadcast FMAs. See PERF_NOTES.md.
    so, sd = _products(o4, d4, w, shared_o=shared_o)
    den = sd[:, 0:c]
    # RAW IEEE divide, no den == 0 pre-guard: when den is 0 the quotient
    # is +-inf (or NaN for 0/0), u/v become inf/NaN, and every comparison
    # below is then false — `ok` rejects the lane without the old
    # where-select guard. The |den| > 1e-12 test STAYS: recover_hit's
    # classic Moller-Trumbore rejects |det| <= eps hits, so a grazing
    # candidate selected here but rejected there would mask a real
    # farther hit behind it (an r5 review catch; the test costs ~2
    # vreg-ops/column and its removal measured <= noise anyway).
    if approx:
        t = -so[:, 0:c] * pl.reciprocal(den, approx=True)
    else:
        t = -so[:, 0:c] / den
    u = so[:, c:2 * c] + t * sd[:, c:2 * c]
    v = so[:, 2 * c:3 * c] + t * sd[:, 2 * c:3 * c]
    ok = ((jnp.minimum(jnp.minimum(u, v), 1.0 - u - v) >= 0.0)
          & (t > t_min) & (t < t_max_col) & (jnp.abs(den) > 1e-12))
    return jnp.where(ok, t, T_FAR)


def _ray_rows(o_t: jax.Array, d_t: jax.Array) -> jax.Array:
    """(Nt, TR, 3) rays -> (Nt, 8, TR) transposed slab-test rows:
    rows 0..2 = origin xyz, 3..5 = 1/d (0 where |d| == 0), 6 = live flag
    (1.0 where the ray is real, 0.0 for padding), 7 = zero pad.
    Row layout keeps every per-candidate prune op on (1, TR) vectors."""
    oT = jnp.swapaxes(o_t, 1, 2)  # (Nt, 3, TR)
    dT = jnp.swapaxes(d_t, 1, 2)
    inv = jnp.where(dT == 0.0, 0.0, 1.0 / jnp.where(dT == 0.0, 1.0, dT))
    live = jnp.any(dT != 0.0, axis=1, keepdims=True).astype(o_t.dtype)
    pad = jnp.zeros_like(live)
    return jnp.concatenate([oT, inv, live, pad], axis=1)


def _slab_enter(rt, lo0, lo1, lo2, hi0, hi1, hi2):
    """Per-ray AABB slab test in row layout. rt: (8, TR) ray rows.
    Returns entry distance (1, TR): max(t_enter, 0) where the ray's line
    crosses the box, T_FAR where it cannot (or the ray is padding)."""
    enter = jnp.zeros_like(rt[0:1])
    exit_ = jnp.full_like(rt[0:1], T_FAR)
    ok = rt[6:7] > 0.0  # live rays only
    for k, (lo, hi) in enumerate(((lo0, hi0), (lo1, hi1), (lo2, hi2))):
        o = rt[k:k + 1]
        inv = rt[3 + k:4 + k]
        deg = inv == 0.0
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        inside = (o >= lo) & (o <= hi)
        tn = jnp.where(deg, jnp.where(inside, 0.0, _BIG), jnp.minimum(t1, t2))
        tf = jnp.where(deg, jnp.where(inside, _BIG, -_BIG), jnp.maximum(t1, t2))
        enter = jnp.maximum(enter, tn)
        exit_ = jnp.minimum(exit_, tf)
    ok = ok & (enter <= exit_) & (exit_ > 0.0)
    return jnp.where(ok, enter, _BIG)


def _closest_kernel(k_cap, c, t_min, g_sz, batch, n_cl, approx, shared_o,
                    words, counts,
                    o4_ref, d4_ref, w_ref, bt_ref, bid_ref, btT_ref):
    """Closest-hit kernel body: per-tile while_loop, G tiles per grid step.

    Two nested batchings keep the scalar core out of the inner loop:
      * G tiles per grid step (static unroll) amortize per-step pipeline
        machinery and output-block init;
      * B candidates per while_loop iteration, intersected unconditionally
        (no per-candidate predication): the only vector->scalar sync per
        iteration is the early-out bound refresh. Measured on the 100k-tri
        bench scene, per-candidate `pl.when` predication + per-candidate
        bound updates cost more in VPU<->SMEM round trips than the dense
        (TR, 3C) intersection they occasionally skip.

    Unlike the any-hit kernel, the early-out bound stays PER TILE: a
    lockstep group variant was measured 30% slower here, because any tile
    containing a miss ray pins its best-t at T_FAR and a group-coupled
    bound then never terminates early for the other seven tiles.
    """
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

        # The early-out bound is carried as IEEE-754 *bits* of the per-tile
        # max best-t: Mosaic has no scalar bitcast, and for positive floats
        # the int32 bit pattern is order-isomorphic, so the comparison against
        # the word's truncated-t high bits is a plain integer compare.
        def cond(carry, *, n=n, base=base):
            k, bound_bits = carry
            word = words[base + jnp.minimum(k, k_cap - 1)]
            return (k < n) & ((word & ~_CL_MASK) < bound_bits)

        def body(carry, *, g=g, o4=o4, d4=d4, n=n, base=base):
            k, bound_bits = carry
            tvs, bids = [], []
            for j in range(batch):
                # Clamped read: slots past the count replay the last word;
                # their results are masked out via `live`.
                word = words[base + jnp.minimum(k + j, k_cap - 1)]
                cl = jnp.minimum(word & _CL_MASK, n_cl - 1)
                live = k + j < n
                w = _w_half(w_ref, cl)  # (4, 3C) affine-map rows
                tv = _cluster_t(o4, d4, w, c, t_min, T_FAR, approx=approx,
                                shared_o=shared_o)
                tvs.append(jnp.where(live, tv, T_FAR))
                bids.append(slots + cl * c)
            bt_ref[g], bid_ref[g] = _batch_best(tvs, bids, bt_ref[g],
                                                bid_ref[g])
            btT_ref[g:g + 1] = bt_ref[g].reshape(1, tr)
            bt_bits = jax.lax.bitcast_convert_type(btT_ref[g], jnp.int32)
            return k + batch, jnp.max(bt_bits)

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(_T_FAR_BITS)))


def _closest_fast_kernel(k_cap, c, t_min, g_sz, batch, n_cl, shared_o,
                         words, counts,
                         o4_ref, d4_ref, w_ref, bt_ref, bid_ref):
    """Straight-line closest-hit for tiles with count <= batch (the p50 == 1
    regime: 70% of bench tiles hold 13% of the candidate mass). No
    while_loop, no early-out bound, no scratch, no vector->scalar syncs —
    just `batch` unconditional dense intersections per tile. Tiles are
    count-sorted by the caller; any tile with count > batch routed here is
    WRONG and must be counted into the surfaced excess (the API's sizing
    loop then widens the generic region)."""
    i = pl.program_id(0)
    tr = o4_ref.shape[1]
    slots = jax.lax.broadcasted_iota(jnp.int32, (tr, c), 1)
    for g in range(g_sz):
        tile = i * g_sz + g
        o4 = o4_ref[g]
        d4 = d4_ref[g]
        n = counts[tile]
        base = tile * k_cap
        tvs, bids = [], []
        for j in range(batch):
            word = words[base + j]
            cl = jnp.minimum(word & _CL_MASK, n_cl - 1)
            live = j < n
            w = _w_half(w_ref, cl)
            tv = _cluster_t(o4, d4, w, c, t_min, T_FAR, shared_o=shared_o)
            tvs.append(jnp.where(live, tv, T_FAR))
            bids.append(slots + cl * c)
        bt, bid = _batch_best(tvs, bids, jnp.full((tr, 1), T_FAR, jnp.float32),
                              jnp.full((tr, 1), -1, jnp.int32))
        bt_ref[g] = bt
        bid_ref[g] = bid


def _anyhit_kernel(k_cap, c, t_min, g_sz, batch, n_cl, approx, shared_o,
                   words, counts,
                   o4_ref, d4_ref, tmax_ref, w_ref, occ_ref, occC_ref):
    """Occlusion kernel: LOCKSTEP tile groups (see _closest_kernel).
    Occlusion accumulates in column layout (occC scratch, (G, TR, 1)) and is
    written to the (G, 1, TR) row-layout output at the end. Early-out: once
    every ray of the group is occluded (or the sorted entry-t exceeds the
    unoccluded rays' max t_max), remaining candidates are skipped."""
    i = pl.program_id(0)
    tr = o4_ref.shape[1]
    occC_ref[:] = jnp.zeros(occC_ref.shape, jnp.float32)
    base0 = i * g_sz
    n_max = counts[base0]

    def bound_bits():
        # Max t_max over the group's still-unoccluded rays: the sorted
        # words' entry t can't beat it once exceeded; 0 once all occluded.
        tm = jnp.where(occC_ref[:] > 0.0, 0.0, tmax_ref[:])
        return jnp.max(jax.lax.bitcast_convert_type(tm, jnp.int32))

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
            o4 = o4_ref[g]
            d4 = d4_ref[g]
            tmax_col = tmax_ref[g]  # (TR, 1)
            base = (base0 + g) * k_cap
            n = counts[base0 + g]
            # Deferred occlusion reduction (see _batch_best): fold the
            # batch's tv maps with elementwise mins first — ONE cross-lane
            # reduction per batch instead of per candidate, and the B
            # _cluster_t chains stay independent for VPU interleaving.
            m = None
            for j in range(batch):
                word = words[base + jnp.minimum(k + j, k_cap - 1)]
                cl = jnp.minimum(word & _CL_MASK, n_cl - 1)
                live = k + j < n
                w = _w_half(w_ref, cl)
                tv = _cluster_t(o4, d4, w, c, t_min, tmax_col,
                                approx=approx, shared_o=shared_o)
                tv = jnp.where(live, tv, T_FAR)
                m = tv if m is None else jnp.minimum(m, tv)
            hit_any = jnp.min(m, axis=-1, keepdims=True) < T_FAR
            occC_ref[g] = jnp.maximum(occC_ref[g],
                                      hit_any.astype(jnp.float32))
        return k + batch, bound_bits()

    jax.lax.while_loop(cond, body, (jnp.int32(0), bound_bits()))
    for g in range(g_sz):
        occ_ref[g] = occC_ref[g].reshape(1, tr)


def _pad_w(tri_w):
    """(Ncl, 4, 3C) -> (ceil(Ncl/2), 8, 3C): TWO clusters per (8, 128)
    Mosaic sublane tile — cluster 2i in rows 0:4, cluster 2i+1 in rows 4:8.

    Dynamic indexing on dim 0 stays tile-aligned (no alignment proof
    needed) and, unlike the old zero-padded (Ncl, 8, 3C) layout, none of
    the VMEM is wasted: the scene matrix halves to ~6.1 KB/cluster, which
    is what lets the ~1930-cluster sponza1080 scene stay VMEM-resident
    (the padded layout was 22.9 MB against the 16 MB scoped-vmem limit).
    Kernels select the half with _w_half."""
    n_cl, rows, w3c = tri_w.shape
    n_pair = -(-n_cl // 2)
    padded = jnp.concatenate(
        [tri_w, jnp.zeros((n_pair * 2 - n_cl, rows, w3c), tri_w.dtype)])
    return padded.reshape(n_pair, 2 * rows, w3c)


def _w_half(w_ref, cl):
    """Fetch cluster `cl`'s (4, 3C) affine-map rows from the paired layout:
    one aligned (8, 3C) load + a scalar-predicated row select."""
    wp = w_ref[cl >> 1]
    return jnp.where((cl & 1) == 1, wp[4:8], wp[0:4])


DEFAULT_GROUP = 8
# Candidates intersected per while_loop iteration (between early-out checks).
# B=2 measured fastest for a FULL-range closest pass (p50 == 1 tiles
# included; B=1: +25%, B=8: +45%). With the three-tier split absorbing the
# small tiles, the count>1 generic region preferred B=3 in r4; the r5
# deferred batch reduction (_batch_best: one cross-lane reduce pair per
# batch instead of per candidate) moved the optimum to B=4 (closest-split
# 44.8 -> 39.6 ms; B=6 equal within noise). Any-hit is insensitive to B
# (lockstep loop is n_max-bound): 38.5-39.4 across B=4/6/8.
DEFAULT_BATCH = 2
SPLIT_BATCH = 4
# Shared-origin passes (primary closest, light-origin shadows) halve the
# product work per candidate, which moves the closest generic-region
# optimum to a deeper batch: measured with shared_o B=4 37.9 / B=6 37.0 /
# B=8 36.6 / B=12 38.2 ms, so B=8. The any-hit pass stays at 4 (measured
# 34.9 / 35.1 / 36.2 at B=4/6/8 shared — n_max-bound, as before).
SPLIT_BATCH_SHARED = 8
ANYHIT_BATCH = 4


def _chunk(n_tiles: int, k_cap: int, group: int):
    """Tiles per pallas_call (multiple of `group`) and number of calls."""
    ch = min(n_tiles, max(1, MAX_WORDS_PER_CALL // k_cap))
    ch = max(group, ch // group * group)
    return ch, -(-n_tiles // ch)


def _pad_tiles(x, n):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])


def trace_tiles_sorted(o_t, d_t, accel: ClusterAccel, words, counts,
                       t_min=T_MIN, interpret: bool = False,
                       group: int = DEFAULT_GROUP, batch: int = DEFAULT_BATCH,
                       shared_o: bool = False):
    """Closest-hit: (bt, gid) each (Ntiles, TR); gid = sorted-order global
    triangle slot (cluster*C + slot), -1 on miss."""
    o4, d4 = _homog(o_t, d_t)
    w_all = _pad_w(accel.tri_w)
    return _run_sorted_region(o4, d4, words, counts, accel, t_min, interpret,
                              group, batch, w_all, shared_o)


def _run_sorted_region(o4, d4, words, counts, accel: ClusterAccel, t_min,
                       interpret, group, batch, w_all, shared_o=False):
    """Generic while-loop closest-hit over a (possibly pre-sorted) tile
    slice; the chunked pallas_call machinery shared by trace_tiles_sorted
    (whole image) and trace_tiles_split (heavy region)."""
    n_tiles, tr, _ = o4.shape
    c = accel.cluster_size
    k_cap = words.shape[1]
    ch, n_chunks = _chunk(n_tiles, k_cap, group)

    def call(o4c, d4c, wordsc, countsc):
        # NOTE: no per-cluster AABB scalar operand — SMEM rows are padded
        # to ~512 B, so an (Ncl, 8) table would burn Ncl/2 KB of the 1 MB
        # SMEM budget (it capped the VMEM-resident tier at C=128 and
        # overflowed SMEM at C=64; the v2 kernels never read it).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(o4c.shape[0] // group,),
            in_specs=[
                pl.BlockSpec((group, tr, 4), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((group, tr, 4), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((group, tr, 1), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((group, tr, 1), lambda i, *_: (i, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((group, tr), jnp.float32)],
        )
        return pl.pallas_call(
            functools.partial(_closest_kernel, k_cap, c, t_min, group, batch,
                              accel.num_clusters, False, shared_o),
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


def _run_fast_region(o4, d4, words, counts, accel, t_min, interpret, group,
                     batch, w_all, shared_o=False):
    """Run _closest_fast_kernel over pre-sorted tile slices. Only the first
    `batch` candidate words per tile ship to SMEM (8-aligned slice)."""
    n_tiles, tr, _ = o4.shape
    c = accel.cluster_size
    kf = max(8, -(-batch // 8) * 8)
    words = words[:, :kf]
    ch, n_chunks = _chunk(n_tiles, kf, group)

    def call(o4c, d4c, wordsc, countsc):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(o4c.shape[0] // group,),
            in_specs=[
                pl.BlockSpec((group, tr, 4), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((group, tr, 4), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((group, tr, 1), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((group, tr, 1), lambda i, *_: (i, 0, 0)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_closest_fast_kernel, kf, c, t_min, group,
                              batch, accel.num_clusters, shared_o),
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
         wordsc.reshape(n_chunks, ch, kf), countsc.reshape(n_chunks, ch)))
    out = lambda x: x.reshape(n_pad, tr)[:n_tiles]
    return out(bt[..., 0]), out(bid[..., 0])


def _round_group(v: int, group: int) -> int:
    return -(-v // group) * group


# Fast-tier shape: candidates per tile handled by the straight-line kernel
# and tiles per grid step. batch=1 covers count<=1 (the p50 regime) with
# half the unconditional dense work of batch=2; a larger group amortizes
# per-grid-step pipeline machinery over the tiny straight-line bodies.
FAST_BATCH = 1
FAST_GROUP = 8


# Word width of the mid (non-ultra) generic region when the ultra tier is
# active, and the count threshold `need_ultra` is always measured against.
# (A second, smaller mid width was measured strictly NEGATIVE — width-only
# region splits save no dense work; see PERF_NOTES "width-only ultra
# tiers".)
ULTRA_K = 256


def trace_tiles_split(o_t, d_t, accel: ClusterAccel, words, counts,
                      split: int, zero_split: int,
                      t_min=T_MIN, interpret: bool = False,
                      group: int = DEFAULT_GROUP, batch: int | None = None,
                      fast_batch: int = FAST_BATCH,
                      fast_group: int = FAST_GROUP,
                      ultra_split: int = 0, k_mid: int | None = None,
                      shared_o: bool = False):
    """Closest-hit over count-sorted tiles, up to four tiers:

      [0, ultra_split)     generic kernel, FULL word width k_cap ("ultra":
                           the few grazing-frustum tiles whose candidate
                           list legitimately reaches the whole cluster
                           list; active only when k_mid is not None);
      [ultra, split)       generic while-loop kernel at width k_mid (the
                           heavy-but-normal tiles) — with k_mid == None
                           this region runs at full width (three-tier r4
                           behavior);
      [split, zero_split)  straight-line fast kernel (count <= fast_batch);
      [zero_split, Ntiles) no kernel at all — miss constants (count == 0).

    Why the ultra tier: pallas_call chunking ships MAX_WORDS_PER_CALL
    words per launch, so a scene whose max tile count forces k_cap to the
    full cluster list (sponza's grazing corridor tiles) drags EVERY tile
    to that width — ~490 launches of 66 tiles at 1080p. Narrowing the
    non-ultra region to k_mid=256 restores ~512 tiles/launch for the bulk
    (VERDICT r4 next #4 / PERF_NOTES "ultra-k").

    `ultra_split`/`split`/`zero_split` are STATIC partition points (rounded
    to `group`); tiles landing below their tier's assumption produce wrong
    results and are counted into the returned excess, so the caller's
    sizing loop can widen the regions and recompile — the same
    measure-escalate contract as the k-caps. Returns
    (bt, gid, excess, (need_split, need_zero, need_ultra)) with needs =
    exact tile counts that would make this frame's excess zero
    (need_ultra = tiles with count > ULTRA_K, measured against the
    constant so the caller can decide to enable the tier).
    """
    if batch is None:
        batch = SPLIT_BATCH_SHARED if shared_o else SPLIT_BATCH
    n_tiles, tr, _ = o_t.shape
    order = jnp.argsort(-counts).astype(jnp.int32)
    inv = jnp.argsort(order).astype(jnp.int32)
    o4, d4 = _homog(o_t, d_t)
    o4, d4 = o4[order], d4[order]
    words_s, counts_s = words[order], counts[order]
    w_all = _pad_w(accel.tri_w)

    gr = max(group, fast_group)
    P = min(_round_group(max(split, 0), gr), _round_group(n_tiles, gr))
    Z = min(_round_group(max(zero_split, P), gr), _round_group(n_tiles, gr))
    P = min(P, n_tiles)
    Z = min(Z, n_tiles)
    U = 0
    if k_mid is not None:
        U = min(_round_group(max(ultra_split, 0), gr), P)

    need_split = jnp.sum(counts > fast_batch)
    need_zero = jnp.sum(counts > 0)
    need_ultra = jnp.sum(counts > ULTRA_K)
    # Each out-of-tier tile counted once: mid-region tiles needing more
    # than k_mid words, fast-tier tiles too heavy for the straight-line
    # kernel, plus zero-tier tiles that aren't empty.
    excess = (jnp.sum(counts_s[P:Z] > fast_batch) + jnp.sum(counts_s[Z:] > 0)
              ).astype(jnp.int32)
    if k_mid is not None:
        excess = excess + jnp.sum(counts_s[U:P] > k_mid).astype(jnp.int32)

    parts_bt, parts_bid = [], []
    if U > 0:
        bt_u, bid_u = _run_sorted_region(
            o4[:U], d4[:U], words_s[:U], counts_s[:U], accel, t_min,
            interpret, group, batch, w_all, shared_o)
        parts_bt.append(bt_u)
        parts_bid.append(bid_u)
    if P > U:
        wmid = words_s[U:P]
        cmid = counts_s[U:P]
        if k_mid is not None and k_mid < wmid.shape[1]:
            wmid = wmid[:, :max(8, -(-k_mid // 8) * 8)]
            # Clamp so the while loop stays in-bounds; over-k_mid tiles
            # here are wrong-and-surfaced via excess.
            cmid = jnp.minimum(cmid, k_mid)
        bt_g, bid_g = _run_sorted_region(
            o4[U:P], d4[U:P], wmid, cmid, accel, t_min,
            interpret, group, batch, w_all, shared_o)
        parts_bt.append(bt_g)
        parts_bid.append(bid_g)
    if Z > P:
        bt_f, bid_f = _run_fast_region(
            o4[P:Z], d4[P:Z], words_s[P:Z], counts_s[P:Z], accel, t_min,
            interpret, fast_group, fast_batch, w_all, shared_o)
        parts_bt.append(bt_f)
        parts_bid.append(bid_f)
    if n_tiles > Z:
        parts_bt.append(jnp.full((n_tiles - Z, tr), T_FAR, jnp.float32))
        parts_bid.append(jnp.full((n_tiles - Z, tr), -1, jnp.int32))
    bt = jnp.concatenate(parts_bt)[inv]
    bid = jnp.concatenate(parts_bid)[inv]
    return bt, bid, excess, (need_split, need_zero, need_ultra)


def any_hit_tiles_sorted(o_t, d_t, t_max_t, accel: ClusterAccel, words, counts,
                         t_min=T_MIN, interpret: bool = False,
                         group: int = DEFAULT_GROUP, batch: int = ANYHIT_BATCH,
                         shared_o: bool = False):
    """Occlusion: (Ntiles, TR) bool."""
    o4, d4, tmax3, order, inv, words_s, counts_s, w_all = _anyhit_prep(
        o_t, d_t, t_max_t, accel, words, counts)
    occ = _run_anyhit_region(o4, d4, tmax3, words_s, counts_s, accel, t_min,
                             interpret, group, batch, w_all, shared_o)
    return occ[inv]


def any_hit_tiles_graded(o_t, d_t, t_max_t, accel: ClusterAccel, words,
                         counts, b1_split: int, zero_split: int,
                         t_min=T_MIN, interpret: bool = False,
                         group: int = DEFAULT_GROUP,
                         batch: int = ANYHIT_BATCH,
                         ultra_split: int = 0, k_mid: int | None = None,
                         shared_o: bool = False):
    """Batch-graded occlusion over count-sorted tiles:

      [0, ultra_split)       lockstep kernel at B=batch, FULL word width
                             (active only when k_mid is not None — see
                             trace_tiles_split's ultra tier rationale);
      [ultra, b1_split)      lockstep kernel at B=batch, width k_mid;
      [b1_split, zero_split) the SAME kernel at B=1 — at B=4 every tile in
                             a group burns ceil(n_max/4)*4 candidate slots,
                             so the count<=1 majority wasted 3 dense passes
                             each (measured: 41.7 -> 36.8 ms at 1080p);
      [zero_split, Ntiles)   no kernel — unoccluded constants.

    Unlike the (removed) straight-line fast tier, a mis-sized b1_split only
    costs SPEED — all kernel regions run the full while loop and are
    correct for any count within their word width. The zero tier and (with
    k_mid) over-width tiles below the ultra region can be wrong; both are
    counted into excess. Returns (occ (Ntiles, TR) bool, excess,
    (need_b1, need_zero, need_ultra))."""
    n_tiles, tr, _ = o_t.shape
    o4, d4, tmax3, order, inv, words_s, counts_s, w_all = _anyhit_prep(
        o_t, d_t, t_max_t, accel, words, counts)
    S = min(_round_group(max(b1_split, 0), group),
            _round_group(n_tiles, group))
    Z = min(_round_group(max(zero_split, S), group),
            _round_group(n_tiles, group))
    S = min(S, n_tiles)
    Z = min(Z, n_tiles)
    U = 0
    if k_mid is not None:
        U = min(_round_group(max(ultra_split, 0), group), S)

    need_b1 = jnp.sum(counts > 1)
    need_zero = jnp.sum(counts > 0)
    need_ultra = jnp.sum(counts > ULTRA_K)
    excess = jnp.sum(counts_s[Z:] > 0).astype(jnp.int32)
    if k_mid is not None:
        excess = excess + jnp.sum(counts_s[U:Z] > k_mid).astype(jnp.int32)

    km8 = None if k_mid is None else max(8, -(-k_mid // 8) * 8)

    def mid(words_r, counts_r):
        if k_mid is not None and km8 < words_r.shape[1]:
            return words_r[:, :km8], jnp.minimum(counts_r, k_mid)
        return words_r, counts_r

    parts = []
    if U > 0:
        parts.append(_run_anyhit_region(
            o4[:U], d4[:U], tmax3[:U], words_s[:U], counts_s[:U], accel,
            t_min, interpret, group, batch, w_all, shared_o))
    if S > U:
        w_m, c_m = mid(words_s[U:S], counts_s[U:S])
        parts.append(_run_anyhit_region(
            o4[U:S], d4[U:S], tmax3[U:S], w_m, c_m, accel,
            t_min, interpret, group, batch, w_all, shared_o))
    if Z > S:
        w_m, c_m = mid(words_s[S:Z], counts_s[S:Z])
        parts.append(_run_anyhit_region(
            o4[S:Z], d4[S:Z], tmax3[S:Z], w_m, c_m,
            accel, t_min, interpret, group, 1, w_all, shared_o))
    if n_tiles > Z:
        parts.append(jnp.zeros((n_tiles - Z, tr), bool))
    occ = jnp.concatenate(parts)[inv]
    return occ, excess, (need_b1, need_zero, need_ultra)


def _anyhit_prep(o_t, d_t, t_max_t, accel, words, counts):
    """Shared any-hit preamble: padding-ray t_max zeroing + count sort."""
    o4, d4 = _homog(o_t, d_t)
    # Padding rays (d == 0) get t_max 0 so they can't inflate the early-out
    # bound; they can never hit anyway (den == 0 -> miss).
    valid = jnp.any(d_t != 0.0, axis=-1)
    tmax3 = jnp.where(valid, t_max_t, 0.0)[..., None]
    # Count-sort tiles for lockstep groups (see trace_tiles_sorted).
    order = jnp.argsort(-counts).astype(jnp.int32)
    inv = jnp.argsort(order).astype(jnp.int32)
    return (o4[order], d4[order], tmax3[order], order, inv,
            words[order], counts[order], _pad_w(accel.tri_w))


def _run_anyhit_region(o4, d4, tmax3, words, counts, accel, t_min, interpret,
                       group, batch, w_all, shared_o=False):
    """Chunked pallas_call over a pre-sorted tile slice -> (n, TR) bool.

    NOTE: a three-tier split (no-while fast kernel + zero fill, mirroring
    trace_tiles_split) was built and measured 8% SLOWER than this single
    lockstep pass (47.7 vs 44.2 ms at 1080p/100k): the G=8 lockstep
    while_loop already costs ~nothing for small/zero-count groups (n_max
    of the sorted group bounds the loop), so the split only added launch
    and reassembly overhead. Removed; see PERF_NOTES.md."""
    n_tiles, tr, _ = o4.shape
    c = accel.cluster_size
    k_cap = words.shape[1]
    ch, n_chunks = _chunk(n_tiles, k_cap, group)

    def call(o4c, d4c, tmc, wordsc, countsc):
        in_specs = [
            pl.BlockSpec((group, tr, 4), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((group, tr, 4), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((group, tr, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        out_specs = [pl.BlockSpec((group, 1, tr), lambda i, *_: (i, 0, 0))]
        body = functools.partial(_anyhit_kernel, k_cap, c, t_min, group,
                                 batch, accel.num_clusters, False, shared_o)
        scratch = [pltpu.VMEM((group, tr, 1), jnp.float32)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(o4c.shape[0] // group,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        (occ,) = pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((o4c.shape[0], 1, tr), jnp.float32)],
            interpret=interpret,
        )(wordsc.reshape(-1), countsc, o4c, d4c, tmc, w_all)
        return occ

    n_pad = ch * n_chunks
    o4c = _pad_tiles(o4, n_pad)
    d4c = _pad_tiles(d4, n_pad)
    tmc = _pad_tiles(tmax3, n_pad)
    wordsc = _pad_tiles(words, n_pad)
    countsc = _pad_tiles(counts, n_pad)
    if n_chunks == 1:
        return call(o4c, d4c, tmc, wordsc, countsc)[:n_tiles, 0, :] != 0

    occ = jax.lax.map(
        lambda a: call(*a),
        (o4c.reshape(n_chunks, ch, tr, 4), d4c.reshape(n_chunks, ch, tr, 4),
         tmc.reshape(n_chunks, ch, tr, 1),
         wordsc.reshape(n_chunks, ch, k_cap), countsc.reshape(n_chunks, ch)))
    return occ[:, :, 0, :].reshape(n_pad, tr)[:n_tiles] != 0


def recover_hit(scene, ray: Ray, bt, gid, accel: ClusterAccel, t_min=T_MIN) -> Hit:
    """Map kernel output (best-t, sorted global slot) back to a full Hit:
    original triangle id + exact (t, u, v) via one single-triangle
    Moller-Trumbore per ray (the kernel's t is only used for selection)."""
    valid = gid >= 0
    gid_safe = jnp.maximum(gid, 0)
    tri = jnp.where(valid, accel.tri_ids.reshape(-1)[gid_safe], -1)
    tri_safe = jnp.maximum(tri, 0)
    idx = scene.tris[tri_safe]
    v0 = scene.verts[idx[..., 0]]
    v1 = scene.verts[idx[..., 1]]
    v2 = scene.verts[idx[..., 2]]
    # Relaxed barycentric bounds: recovery must not veto the kernel's
    # affine-formulation selection over fp rounding (see mt_from_edges).
    t, u, v, hitm = moller_trumbore(ray.o, ray.d, v0, v1, v2, t_min=t_min,
                                    bary_eps=1e-5)
    valid = valid & hitm
    uv = jnp.stack([u, v], axis=-1)
    return Hit(
        t=jnp.where(valid, t, T_FAR),
        tri=jnp.where(valid, tri, -1),
        uv=jnp.where(valid[..., None], uv, 0.0),
    )


def make_sorted_tracers(scene, accel: ClusterAccel, k_cap: int = DEFAULT_K,
                        tr: int = 64, interpret: bool = False,
                        t_min=T_MIN):
    """(trace_fn, occlude_fn) over the sorted front-to-back kernel path."""
    k = min(k_cap, accel.num_clusters)
    # Round up so lane-dim slicing stays aligned; sentinel-padded.
    k = max(8, -(-k // 8) * 8)

    def trace_fn(ray: Ray) -> Hit:
        o_t, d_t, tiling = tile_rays(ray.o, ray.d, tr)
        words, counts, _overflow, _need = cull_clusters_sorted2(
            accel, o_t, d_t, T_FAR, k)
        bt, gid = trace_tiles_sorted(o_t, d_t, accel, words, counts,
                                     t_min=t_min, interpret=interpret)
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
        words, counts, _overflow, _need = cull_clusters_sorted2(
            accel, o_t, d_t, t_max_t, k)
        occ = any_hit_tiles_sorted(o_t, d_t, t_max_t, accel, words, counts,
                                   t_min=t_min, interpret=interpret)
        return untile(occ, tiling)

    return trace_fn, occlude_fn
