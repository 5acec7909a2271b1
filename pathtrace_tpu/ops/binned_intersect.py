"""Per-ray binned triangle traversal (ray-stream binning).

The per-tile front-to-back traversal in pallas_intersect.py tests every
cluster that ANY ray of a 1024-lane tile enters. Measured on the 70k-triangle
mesh scene (BASELINE config 4) with bounce rays originating on the surface:
a ray enters 13.5 clusters on average, but a direction-sorted tile's union is
~185 of 274 — ≈7% pair utilization, and the tri kernels dominate the pool
iteration (docs/PERFORMANCE.md).

This module restores per-ray traversal order (the tri-kernel answer to the
reference's per-ray recursive descent, world.rs:270-290) while staying
SIMD-shaped:

  round r:   every live ray selects its r-th nearest *entered* cluster
             (extract-min over a per-ray (C,) entry-distance row, visited
             clusters cleared to +inf);
             the wave is sorted by that cluster id (multi-payload lax.sort,
             dead rays keyed to the sentinel C so they pool at the end);
             a Pallas kernel sweeps the sorted wave: each 1024-lane tile
             spans a contiguous id range [first..last], DMAs exactly those
             clusters and tests them with the id-match folded into the value
             domain; results are unsorted back by the carried original index.
  stop:      a ray is resolved once its current best hit is closer than the
             entry distance of its next unvisited cluster (the same bound
             the reference's early-out uses per ray); the loop ends when
             every ray is resolved.

Every ray therefore pays exactly the clusters it enters (plus sort overhead),
independent of what its tile-mates need. Math and epsilons match
ops.pallas_intersect exactly (Möller–Trumbore, shape.rs:161-198).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_intersect import (
    _cdiv,
    _pad_rows,
    _out_struct,
    _select_winner,
    _safe_inv,
)

_INF = float("inf")
RAY_TILE = 1024


def _cluster_entries(o, d, t_min, t_max, cluster_min, cluster_max):
    """Conservative entry distance of each ray into each cluster AABB:
    (N, C) with +inf where the [t_min, t_max] segment misses the box."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)          # (N,3)
    a = (cluster_min[None, :, :] - o[:, None, :]) * inv[:, None, :]
    b = (cluster_max[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = jnp.maximum(jnp.max(jnp.minimum(a, b), axis=-1), t_min[:, None])
    tf = jnp.minimum(jnp.min(jnp.maximum(a, b), axis=-1), t_max[:, None])
    # Inverted (empty) padding boxes pass the min/max slab formulation —
    # exclude them by validity, not geometry (same gotcha as _keys_prepass).
    valid = (cluster_min[:, 0] <= cluster_max[:, 0])[None, :]
    return jnp.where((tn <= tf) & valid, tn, _INF)


def _id_bits(n_clusters: int) -> int:
    bits = 1
    while (1 << bits) <= n_clusters:
        bits += 1
    return bits


def _pack_keys(entries, n_clusters):
    """Pack (entry distance, cluster id) into one monotone int32 key.

    The entry is a positive f32 (>= t_min > 0) whose int32 bitcast is
    order-preserving; the low ``bits`` mantissa bits are replaced by the
    cluster id. One min-reduce per round then yields both the nearest
    cluster and a *truncated-down* (conservative) entry bound — truncation
    can only keep a ray live an extra round, never resolve it early."""
    bits = _id_bits(n_clusters)
    idmask = jnp.int32((1 << bits) - 1)
    e = jax.lax.bitcast_convert_type(entries.astype(jnp.float32), jnp.int32)
    ids = jnp.arange(entries.shape[1], dtype=jnp.int32)[None, :]
    return (e & ~idmask) | ids, idmask


def _packed_bound(x):
    """int32 bitcast of a positive-float bound (exact, order-preserving)."""
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


# ---------------------------------------------------------------------------
# Round kernels: sorted-by-cluster wave, contiguous id span per tile
# ---------------------------------------------------------------------------

def _round_closest_kernel(o_ref, d_ref, tmin_ref, tup_ref, key_ref, tri_ref,
                          t_ref, i_ref, n_ref, m_ref, st_t, st_i,
                          tri_tile_ref, dma_sem, *, n_clusters, prim_tile):
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0:1, :]
    t_up = tup_ref[0:1, :]
    ckey = key_ref[0:1, :]                       # sorted cluster ids

    st_t[:, :] = jnp.full(t_min.shape, _INF)
    st_i[:, :] = jnp.full(t_min.shape, -1, jnp.int32)
    n_ref[:, :] = jnp.zeros((3, t_min.shape[1]), t_min.dtype)
    m_ref[:, :] = jnp.zeros(t_min.shape, jnp.int32)

    first = jnp.min(ckey)
    # Span over LIVE lanes only: dead/padded lanes carry the sentinel key
    # n_clusters, and a max over them would make the one boundary tile per
    # round sweep every cluster to the end of the table (correctness was
    # unaffected — ckey == s gates matches — but each extra cluster paid a
    # DMA plus a full MT test).
    last = jnp.max(jnp.where(ckey < n_clusters, ckey, -1))

    def test_cluster(s, buf):
        tile = tri_tile_ref.at[buf]
        cp = pltpu.make_async_copy(
            tri_ref.at[pl.ds(s * prim_tile, prim_tile)], tile, dma_sem.at[buf]
        )
        cp.start()
        cp.wait()
        v0x = tile[:, 0:1]; v0y = tile[:, 1:2]; v0z = tile[:, 2:3]
        e1x = tile[:, 3:4]; e1y = tile[:, 4:5]; e1z = tile[:, 5:6]
        e2x = tile[:, 6:7]; e2y = tile[:, 7:8]; e2z = tile[:, 8:9]
        nx = tile[:, 9:10]; ny = tile[:, 10:11]; nz = tile[:, 11:12]
        matid = tile[:, 12:13]

        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / a
        sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok = (
            (jnp.abs(a) >= 1e-8)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= t_min) & (t <= t_up)
            & (ckey == s)                     # lanes of this cluster only
        )
        ts = jnp.where(ok, t, _INF)

        best_t = st_t[0:1, :]
        tmin_tile = jnp.min(ts, axis=0, keepdims=True)
        arg = jnp.argmin(ts, axis=0).astype(jnp.int32)[None, :]
        better = tmin_tile < best_t

        row_iota = jax.lax.broadcasted_iota(jnp.int32, ts.shape, 0)
        mask_f = ((row_iota == arg) & better).astype(ts.dtype)
        snx, sny, snz, sm = _select_winner(mask_f, (nx, ny, nz, matid))

        st_i[:, :] = jnp.where(better, s * prim_tile + arg, st_i[0:1, :])
        st_t[:, :] = jnp.where(better, tmin_tile, best_t)
        nrm = jnp.concatenate([snx, sny, snz], axis=0)
        n_ref[0:3, :] = jnp.where(better, nrm, n_ref[0:3, :])
        m_ref[:, :] = jnp.where(
            better, sm, m_ref[0:1, :].astype(ts.dtype)
        ).astype(jnp.int32)

    @pl.when(first < n_clusters)     # tile not entirely dead
    def _():
        def cond(carry):
            s, _ = carry
            return s <= last

        def body(carry):
            s, i = carry
            test_cluster(s, i % 2)
            return (s + 1, i + 1)

        jax.lax.while_loop(cond, body, (first, jnp.int32(0)))

    t_ref[:, :] = st_t[0:1, :]
    i_ref[:, :] = st_i[0:1, :]


def _round_anyhit_kernel(o_ref, d_ref, tmin_ref, tmax_ref, key_ref, tri_ref,
                         occ_ref, tri_tile_ref, dma_sem,
                         *, n_clusters, prim_tile):
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0:1, :]
    t_max = tmax_ref[0:1, :]
    ckey = key_ref[0:1, :]

    occ_ref[:, :] = jnp.zeros(t_min.shape, jnp.int32)
    first = jnp.min(ckey)
    # Live-lane span only (see _round_closest_kernel).
    last = jnp.max(jnp.where(ckey < n_clusters, ckey, -1))

    def test_cluster(s, buf):
        tile = tri_tile_ref.at[buf]
        cp = pltpu.make_async_copy(
            tri_ref.at[pl.ds(s * prim_tile, prim_tile)], tile, dma_sem.at[buf]
        )
        cp.start()
        cp.wait()
        v0x = tile[:, 0:1]; v0y = tile[:, 1:2]; v0z = tile[:, 2:3]
        e1x = tile[:, 3:4]; e1y = tile[:, 4:5]; e1z = tile[:, 5:6]
        e2x = tile[:, 6:7]; e2y = tile[:, 7:8]; e2z = tile[:, 8:9]
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / a
        sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok = (
            (jnp.abs(a) >= 1e-8)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= t_min) & (t <= t_max)
            & (ckey == s)
        )
        hit = jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)
        occ_ref[:, :] = occ_ref[0:1, :] | hit

    @pl.when(first < n_clusters)
    def _():
        def cond(carry):
            s, _ = carry
            return s <= last

        def body(carry):
            s, i = carry
            test_cluster(s, i % 2)
            return (s + 1, i + 1)

        jax.lax.while_loop(cond, body, (first, jnp.int32(0)))


def _pack_tri_table(v0, e1, e2, tri_normal, tri_mat, rows, dtype, anyhit):
    if anyhit:
        cols = [v0, e1, e2, jnp.zeros((v0.shape[0], 119), dtype)]
    else:
        cols = [v0, e1, e2, tri_normal, tri_mat.astype(dtype)[:, None],
                jnp.zeros((v0.shape[0], 115), dtype)]
    return _pad_rows(jnp.concatenate(cols, axis=1), rows)


def _run_round_closest(o, d, t_min_b, t_up, ckey, tri, n_clusters, prim_tile,
                       interpret):
    n = o.shape[0]
    n_pad = _cdiv(n, RAY_TILE) * RAY_TILE
    o_t = _pad_rows(o, n_pad).T
    d_t = _pad_rows(d, n_pad, fill=1.0).T
    tmin_r = _pad_rows(t_min_b[:, None], n_pad, fill=_INF).T
    tup_r = _pad_rows(t_up[:, None], n_pad).T
    key_r = _pad_rows(ckey[:, None], n_pad, fill=n_clusters).T

    grid = (n_pad // RAY_TILE,)
    t, i, nrm, m = pl.pallas_call(
        functools.partial(_round_closest_kernel, n_clusters=n_clusters,
                          prim_tile=prim_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_struct((1, n_pad), o.dtype, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
            _out_struct((3, n_pad), o.dtype, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, RAY_TILE), o.dtype),
            pltpu.VMEM((1, RAY_TILE), jnp.int32),
            pltpu.VMEM((2, prim_tile, 128), o.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(o_t, d_t, tmin_r, tup_r, key_r.astype(jnp.int32), tri)
    return t[0, :n], i[0, :n], nrm[:, :n].T, m[0, :n]


def _run_round_anyhit(o, d, t_min_b, t_max_b, ckey, tri, n_clusters,
                      prim_tile, interpret):
    n = o.shape[0]
    n_pad = _cdiv(n, RAY_TILE) * RAY_TILE
    o_t = _pad_rows(o, n_pad).T
    d_t = _pad_rows(d, n_pad, fill=1.0).T
    tmin_r = _pad_rows(t_min_b[:, None], n_pad, fill=1.0).T
    tmax_r = _pad_rows(t_max_b[:, None], n_pad).T
    key_r = _pad_rows(ckey[:, None], n_pad, fill=n_clusters).T

    grid = (n_pad // RAY_TILE,)
    occ = pl.pallas_call(
        functools.partial(_round_anyhit_kernel, n_clusters=n_clusters,
                          prim_tile=prim_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((1, n_pad), jnp.int32, o, d),
        scratch_shapes=[
            pltpu.VMEM((2, prim_tile, 128), o.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(o_t, d_t, tmin_r, tmax_r, key_r.astype(jnp.int32), tri)
    return occ[0, :n] != 0


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------

def _sort_wave(keyr, cols):
    """Sort scalar columns by the int32 round key; returns sorted columns."""
    return jax.lax.sort((keyr, *cols), num_keys=1)[1:]


@functools.partial(jax.jit, static_argnames=("interpret", "prim_tile"))
def triangle_closest_binned(o, d, t_min, t_max, v0, e1, e2, tri_normal,
                            tri_mat, cluster_min, cluster_max,
                            interpret=False, prim_tile=256):
    """Closest triangle hit with per-ray front-to-back cluster traversal.

    Same return contract as pallas_intersect.triangle_closest:
    ``(t (N,), global idx (N,), outward normal (N,3), mat (N,))``.
    """
    n = o.shape[0]
    dtype = o.dtype
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, dtype), (n,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, dtype), (n,))
    t_rows = _cdiv(v0.shape[0], prim_tile) * prim_tile
    n_clusters = t_rows // prim_tile
    tri = _pack_tri_table(v0, e1, e2, tri_normal, tri_mat, t_rows, dtype,
                          anyhit=False)

    entries = _cluster_entries(o, d, t_min_b, t_max_b,
                               cluster_min[:n_clusters], cluster_max[:n_clusters])
    keys0, idmask = _pack_keys(entries, n_clusters)

    state = dict(
        o=o, d=d, t_min=t_min_b, t_max=t_max_b, keys=keys0,
        kmin=jnp.min(keys0, axis=1),
        best_t=jnp.full((n,), _INF, dtype),
        best_i=jnp.full((n,), -1, jnp.int32),
        best_n=jnp.zeros((n, 3), dtype),
        best_m=jnp.zeros((n,), jnp.int32),
    )

    def live_of(st):
        bound = jnp.minimum(st["best_t"], st["t_max"])
        return (st["kmin"] & ~idmask) < _packed_bound(bound)

    def phase(st, stop_below):
        m = st["o"].shape[0]
        idx0 = jnp.arange(m, dtype=jnp.int32)

        def cond(carry):
            return carry[-1] > stop_below

        def body(carry):
            st = dict(zip(names, carry[:-1]))
            kidx = st["kmin"] & idmask
            bound = jnp.minimum(st["best_t"], st["t_max"])
            live = (st["kmin"] & ~idmask) < _packed_bound(bound)
            keyr = jnp.where(live, kidx, n_clusters)
            o_, d_ = st["o"], st["d"]

            (skey, so0, so1, so2, sd0, sd1, sd2, stmn, stup, sidx) = _sort_wave(
                keyr,
                (keyr, o_[:, 0], o_[:, 1], o_[:, 2],
                 d_[:, 0], d_[:, 1], d_[:, 2],
                 st["t_min"], bound, idx0),
            )
            os_ = jnp.stack([so0, so1, so2], axis=1)
            ds_ = jnp.stack([sd0, sd1, sd2], axis=1)
            rt, ri, rn, rm = _run_round_closest(
                os_, ds_, stmn, stup, skey, tri, n_clusters, prim_tile,
                interpret
            )
            (ut, ui, un0, un1, un2, um) = jax.lax.sort(
                (sidx, rt, ri, rn[:, 0], rn[:, 1], rn[:, 2], rm), num_keys=1
            )[1:]
            better = ut < st["best_t"]
            st["best_t"] = jnp.where(better, ut, st["best_t"])
            st["best_i"] = jnp.where(better, ui, st["best_i"])
            st["best_n"] = jnp.where(better[:, None],
                                     jnp.stack([un0, un1, un2], axis=1),
                                     st["best_n"])
            st["best_m"] = jnp.where(better, um, st["best_m"])

            # Clear the visited cluster (live rays only) and fold the next
            # round's extract-min into the same pass. The cleared sentinel
            # must stay >= the packed +inf bound even with the id bits
            # stripped, hence int32-max rather than float-max.
            st["keys"] = jnp.where(live[:, None] & (st["keys"] == st["kmin"][:, None]),
                                   jnp.int32(0x7FFFFFFF), st["keys"])
            st["kmin"] = jnp.min(st["keys"], axis=1)
            lc = jnp.sum(live_of(st).astype(jnp.int32))
            return tuple(st[k] for k in names) + (lc,)

        names = list(st.keys())
        lc0 = jnp.sum(live_of(st).astype(jnp.int32))
        out = jax.lax.while_loop(
            cond, body, tuple(st[k] for k in names) + (lc0,)
        )
        return dict(zip(names, out[:-1]))

    def compact(st, m):
        """Pack live rays (at most m of them) into an m-lane state; returns
        the compacted state plus the original indices for the merge-back."""
        n_ = st["o"].shape[0]
        idx0 = jnp.arange(n_, dtype=jnp.int32)
        deadkey = (~live_of(st)).astype(jnp.int32)
        cols = [st["o"][:, 0], st["o"][:, 1], st["o"][:, 2],
                st["d"][:, 0], st["d"][:, 1], st["d"][:, 2],
                st["t_min"], st["t_max"], st["kmin"],
                st["best_t"], st["best_i"],
                st["best_n"][:, 0], st["best_n"][:, 1], st["best_n"][:, 2],
                st["best_m"]]
        out = jax.lax.sort((deadkey, idx0, *cols), num_keys=1)
        sidx = out[1][:m]
        c = [a[:m] for a in out[2:]]
        return dict(
            o=jnp.stack(c[0:3], axis=1), d=jnp.stack(c[3:6], axis=1),
            t_min=c[6], t_max=c[7], keys=st["keys"][sidx], kmin=c[8],
            best_t=c[9], best_i=c[10],
            best_n=jnp.stack(c[11:14], axis=1), best_m=c[14],
        ), sidx

    def merge_back(st, sub, sidx):
        for k in ("best_t", "best_i", "best_m"):
            st[k] = st[k].at[sidx].set(sub[k])
        st["best_n"] = st["best_n"].at[sidx].set(sub["best_n"])
        return st

    # Cascade: full-wave rounds while >1/4 of rays are live, then the live
    # tail compacts 4x (and then 16x) so the long thin tail of deep
    # traversals stops paying full-wave sorts (live decay measured in
    # docs/PERFORMANCE.md: ~25% by round 11, ~6% by round 16, tail to ~44).
    if n >= 4096:
        state = phase(state, n // 4)
        sub, sidx = compact(state, n // 4)
        if n // 4 >= 4096:
            sub = phase(sub, n // 16)
            sub2, sidx2 = compact(sub, n // 16)
            sub2 = phase(sub2, 0)
            sub = merge_back(sub, sub2, sidx2)
        else:
            sub = phase(sub, 0)
        state = merge_back(state, sub, sidx)
    else:
        state = phase(state, 0)
    return state["best_t"], state["best_i"], state["best_n"], state["best_m"]


@functools.partial(jax.jit, static_argnames=("interpret", "prim_tile"))
def triangle_anyhit_binned(o, d, t_min, t_max, v0, e1, e2,
                           cluster_min, cluster_max,
                           interpret=False, prim_tile=256):
    """Occlusion against the triangle soup with per-ray cluster traversal.
    Returns a bool (N,) mask; near-first order settles rays fastest."""
    n = o.shape[0]
    dtype = o.dtype
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, dtype), (n,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, dtype), (n,))
    t_rows = _cdiv(v0.shape[0], prim_tile) * prim_tile
    n_clusters = t_rows // prim_tile
    tri = _pack_tri_table(v0, e1, e2, None, None, t_rows, dtype, anyhit=True)

    entries = _cluster_entries(o, d, t_min_b, t_max_b,
                               cluster_min[:n_clusters], cluster_max[:n_clusters])
    keys0, idmask = _pack_keys(entries, n_clusters)
    exhausted = jnp.int32(0x7F800000)    # packed +inf, id bits stripped

    state = dict(
        o=o, d=d, t_min=t_min_b, t_max=t_max_b, keys=keys0,
        kmin=jnp.min(keys0, axis=1),
        occ=jnp.zeros((n,), bool),
    )

    def live_of(st):
        return ~st["occ"] & ((st["kmin"] & ~idmask) < exhausted)

    def phase(st, stop_below):
        m = st["o"].shape[0]
        idx0 = jnp.arange(m, dtype=jnp.int32)

        def cond(carry):
            return carry[-1] > stop_below

        def body(carry):
            st = dict(zip(names, carry[:-1]))
            kidx = st["kmin"] & idmask
            live = live_of(st)
            keyr = jnp.where(live, kidx, n_clusters)
            o_, d_ = st["o"], st["d"]

            (skey, so0, so1, so2, sd0, sd1, sd2, stmn, stmx, sidx) = _sort_wave(
                keyr,
                (keyr, o_[:, 0], o_[:, 1], o_[:, 2],
                 d_[:, 0], d_[:, 1], d_[:, 2],
                 st["t_min"], st["t_max"], idx0),
            )
            os_ = jnp.stack([so0, so1, so2], axis=1)
            ds_ = jnp.stack([sd0, sd1, sd2], axis=1)
            r_occ = _run_round_anyhit(
                os_, ds_, stmn, stmx, skey, tri, n_clusters, prim_tile,
                interpret
            )
            (u_occ,) = jax.lax.sort(
                (sidx, r_occ.astype(jnp.int32)), num_keys=1
            )[1:]
            st["occ"] = st["occ"] | (u_occ != 0)

            st["keys"] = jnp.where(
                live[:, None] & (st["keys"] == st["kmin"][:, None]),
                jnp.int32(0x7FFFFFFF), st["keys"])
            st["kmin"] = jnp.min(st["keys"], axis=1)
            lc = jnp.sum(live_of(st).astype(jnp.int32))
            return tuple(st[k] for k in names) + (lc,)

        names = list(st.keys())
        lc0 = jnp.sum(live_of(st).astype(jnp.int32))
        out = jax.lax.while_loop(
            cond, body, tuple(st[k] for k in names) + (lc0,)
        )
        return dict(zip(names, out[:-1]))

    def compact(st, m):
        n_ = st["o"].shape[0]
        idx0 = jnp.arange(n_, dtype=jnp.int32)
        deadkey = (~live_of(st)).astype(jnp.int32)
        cols = [st["o"][:, 0], st["o"][:, 1], st["o"][:, 2],
                st["d"][:, 0], st["d"][:, 1], st["d"][:, 2],
                st["t_min"], st["t_max"], st["kmin"],
                st["occ"].astype(jnp.int32)]
        out = jax.lax.sort((deadkey, idx0, *cols), num_keys=1)
        sidx = out[1][:m]
        c = [a[:m] for a in out[2:]]
        return dict(
            o=jnp.stack(c[0:3], axis=1), d=jnp.stack(c[3:6], axis=1),
            t_min=c[6], t_max=c[7], keys=st["keys"][sidx], kmin=c[8],
            occ=c[9] != 0,
        ), sidx

    if n >= 4096:
        state = phase(state, n // 4)
        sub, sidx = compact(state, n // 4)
        if n // 4 >= 4096:
            sub = phase(sub, n // 16)
            sub2, sidx2 = compact(sub, n // 16)
            sub2 = phase(sub2, 0)
            sub["occ"] = sub["occ"].at[sidx2].set(sub2["occ"])
        else:
            sub = phase(sub, 0)
        state["occ"] = state["occ"].at[sidx].set(sub["occ"])
    else:
        state = phase(state, 0)
    return state["occ"]
