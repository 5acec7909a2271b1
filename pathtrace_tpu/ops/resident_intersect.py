"""Per-ray mesh traversal with a VMEM-resident lane-transposed triangle table.

Third-generation triangle traversal (after the per-tile streaming kernels in
ops/pallas_intersect.py and the sort-per-round binned cascade in
ops/binned_intersect.py), built from two round-2 measurements
(docs/PERFORMANCE.md):

  * every (tile, cluster) visit paid a ~5 us constant dominated by the
    serialized per-cluster HBM DMA plus Mosaic loop overhead, and
  * a lane-transposed (16, T) triangle table is small enough to live in VMEM
    for the whole kernel (4.5 MB at 70k triangles — an in-kernel (16, P)
    slice + transpose probe measured ~2.9 us/visit with the DMA eliminated).

Layout: the table keeps triangles on the 128-wide *lane* axis (16 sublane
rows: v0 | e1 | e2 | normal | mat), so VMEM stores exactly 16 rows with no
k -> 128 lane padding; each cluster visit slices (16, prim_tile) columns and
transposes in-kernel to the (prim_tile, 16) operand the broadcast
Möller–Trumbore needs.

Traversal runs ENTIRELY inside one kernel dispatch (the binned cascade paid a
multi-payload lax.sort + unsort round trip per round — measured to lose
in-pool, docs/PERFORMANCE.md): per ray tile the kernel computes every
cluster's conservative entry distance (slab test, (C, W) broadcast into VMEM
scratch), then loops rounds per 128..512-lane *subtile*: each live lane picks
its nearest unvisited cluster (min + argmin over the C rows of its entry
column), the subtile sweeps the contiguous [first..last] span of chosen
cluster ids (lanes gated by ``chosen == s``), winners resolve their normal
and material via the exact bf16x3 MXU one-hot select while the slice is
resident, and the chosen rows are cleared to +inf. A lane is resolved when
its best hit is nearer than its next unvisited entry — the same per-ray
early-out economics as the reference's recursive descent
(/root/reference/src/world.rs:270-290, rendering.rs:104-133), vectorized.

Narrow subtiles keep the spans honest: rays are wave-sorted by origin-block +
direction octant once per trace (ops/intersect.py:_ray_sort_key — the same
sort the per-tile path uses), so the 128..512 lanes of a subtile traverse
nearly identical cluster sequences and the span sweep tests few clusters no
lane wants. Cluster granularity is decoupled from the build-time constant:
AABBs are derived from the (morton-ordered) triangle geometry at trace time
for any ``prim_tile`` divisor, so the resident path defaults to finer
64-triangle clusters (4x fewer pair tests per visit; the DMA constant that
made fine clusters lose is gone).

Math and epsilons match ops.pallas_intersect exactly (Möller–Trumbore,
shape.rs:161-198: 1e-8 parallel reject, inclusive barycentric bounds, closed
[t_min, t_max]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_intersect import (
    _cdiv,
    _lift_vma,
    _out_struct,
    _pad_rows,
    _select_winner,
)

_INF = float("inf")

RAY_TILE = 1024
SUB_W = 256          # lanes per independent traversal span (multiple of 128)
# Triangles per cluster visit: must be a multiple of 128 (the table lives on
# the lane axis and Mosaic dynamic lane slices need 128 alignment) — already
# 2x finer than the streaming kernels' 256-row clusters.
PRIM_TILE = 128

# Row indices of the lane-transposed triangle table.
_R_V0, _R_E1, _R_E2, _R_N, _R_MAT = 0, 3, 6, 9, 12
_TAB_ROWS = 16


def _pack_table(v0, e1, e2, tri_normal, tri_mat, rows, dtype, anyhit):
    """(T,3)x4 + (T,) -> (16, rows) lane-transposed table; padding columns are
    all-zero (degenerate MT rejects them via |a| < 1e-8)."""
    if anyhit:
        cols = [v0, e1, e2]
    else:
        cols = [v0, e1, e2, tri_normal, tri_mat.astype(dtype)[:, None]]
    tab = _pad_rows(jnp.concatenate(cols, axis=1), rows)    # (rows, 9|13)
    return _pad_rows(tab.T, _TAB_ROWS)                      # (16, rows)


def _derived_aabbs(v0, e1, e2, rows, prim_tile, dtype):
    """Per-cluster AABBs at any granularity, from the morton-ordered triangle
    soup itself: (C_pad8, 8) [min | max | 0 0]. Padding rows (both the
    partial last cluster's tail and the sublane-pad rows) contribute
    inverted boxes so they are never entered."""
    p1 = v0 + e1
    p2 = v0 + e2
    pmin = _pad_rows(jnp.minimum(jnp.minimum(v0, p1), p2), rows, fill=_INF)
    pmax = _pad_rows(jnp.maximum(jnp.maximum(v0, p1), p2), rows, fill=-_INF)
    c = rows // prim_tile
    cmin = pmin.reshape(c, prim_tile, 3).min(axis=1)
    cmax = pmax.reshape(c, prim_tile, 3).max(axis=1)
    aabb = jnp.concatenate([cmin, cmax, jnp.zeros((c, 2), dtype)], axis=1)
    c_pad = max(8, _cdiv(c, 8) * 8)
    pad = jnp.concatenate(
        [jnp.full((c_pad - c, 3), _INF, dtype),
         jnp.full((c_pad - c, 3), -_INF, dtype),
         jnp.zeros((c_pad - c, 2), dtype)], axis=1)
    return jnp.concatenate([aabb, pad], axis=0), c_pad


def _mt_columns(cols, anyhit):
    v0x, v0y, v0z = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]
    e1x, e1y, e1z = cols[:, 3:4], cols[:, 4:5], cols[:, 5:6]
    e2x, e2y, e2z = cols[:, 6:7], cols[:, 7:8], cols[:, 8:9]
    if anyhit:
        return (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, None, None)
    nx, ny, nz = cols[:, 9:10], cols[:, 10:11], cols[:, 11:12]
    matid = cols[:, 12:13]
    return (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
            (nx, ny, nz), matid)


def _mt_ts(cols9, ox, oy, oz, dx, dy, dz, t_min, t_hi, gate):
    """Möller–Trumbore over a (P, W) block; returns hit t with inf misses.
    Epsilons exactly as shape.rs:161-198 (see module docstring)."""
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = cols9
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / a
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
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
        & (t >= t_min) & (t <= t_hi)
        & gate
    )
    return jnp.where(ok, t, _INF)


def _entries_block(aabb_ref, ox, oy, oz, dx, dy, dz, t_min, t_up):
    """(C, W) conservative cluster entry distances for one subtile's rays."""
    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-20, 1e-20, c)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    mnx, mny, mnz = aabb_ref[:, 0:1], aabb_ref[:, 1:2], aabb_ref[:, 2:3]
    mxx, mxy, mxz = aabb_ref[:, 3:4], aabb_ref[:, 4:5], aabb_ref[:, 5:6]
    ax, bx = (mnx - ox) * ix, (mxx - ox) * ix
    ay, by = (mny - oy) * iy, (mxy - oy) * iy
    az, bz = (mnz - oz) * iz, (mxz - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
        jnp.maximum(jnp.minimum(az, bz), t_min),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
        jnp.minimum(jnp.maximum(az, bz), t_up),
    )
    # Inverted (empty) padding boxes pass the slab min/max formulation —
    # exclude by validity, not geometry (same gotcha as binned_intersect).
    valid = mnx <= mxx
    return jnp.where((tn <= tf) & valid, tn, _INF)


def _resident_closest_kernel(o_ref, d_ref, tmin_ref, tup_ref, aabb_ref,
                             tri_ref, t_ref, i_ref, n_ref, m_ref, ent,
                             *, c_rows, prim_tile, sub_w):
    t_ref[:, :] = jnp.full(t_ref.shape, _INF)
    i_ref[:, :] = jnp.full(i_ref.shape, -1, jnp.int32)
    n_ref[:, :] = jnp.zeros(n_ref.shape, n_ref.dtype)
    m_ref[:, :] = jnp.zeros(m_ref.shape, jnp.int32)

    width = o_ref.shape[1]
    for j in range(width // sub_w):
        sl = slice(j * sub_w, (j + 1) * sub_w)
        ox, oy, oz = o_ref[0:1, sl], o_ref[1:2, sl], o_ref[2:3, sl]
        dx, dy, dz = d_ref[0:1, sl], d_ref[1:2, sl], d_ref[2:3, sl]
        t_min = tmin_ref[0:1, sl]
        t_up = tup_ref[0:1, sl]
        ent[:, sl] = _entries_block(aabb_ref, ox, oy, oz, dx, dy, dz,
                                    t_min, t_up)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (c_rows, sub_w), 0)

        def round_body(carry):
            e = ent[:, sl]                                     # (C, W)
            emin = jnp.min(e, axis=0, keepdims=True)           # (1, W)
            best = t_ref[0:1, sl]
            bound = jnp.minimum(best, t_up)
            live = emin < bound
            arg = jnp.argmin(e, axis=0).astype(jnp.int32)[None, :]
            wanted = jnp.where(live, arg, c_rows)
            first = jnp.min(wanted)
            last = jnp.max(jnp.where(live, arg, -1))

            def sweep(s, _):
                base = s * prim_tile
                cols = tri_ref[:, pl.ds(base, prim_tile)].T    # (P, 16)
                mt = _mt_columns(cols, anyhit=False)
                cur_best = t_ref[0:1, sl]
                t_hi = jnp.minimum(cur_best, t_up)
                ts = _mt_ts(mt[:9], ox, oy, oz, dx, dy, dz,
                            t_min, t_hi, wanted == s)
                tmin_tile = jnp.min(ts, axis=0, keepdims=True)
                argp = jnp.argmin(ts, axis=0).astype(jnp.int32)[None, :]
                better = tmin_tile < cur_best
                row_iota = jax.lax.broadcasted_iota(jnp.int32, ts.shape, 0)
                mask_f = ((row_iota == argp) & better).astype(ts.dtype)
                nxyz, matid = mt[9], mt[10]
                snx, sny, snz, sm = _select_winner(mask_f, (*nxyz, matid))
                t_ref[0:1, sl] = jnp.where(better, tmin_tile, cur_best)
                i_ref[0:1, sl] = jnp.where(
                    better, base + argp, i_ref[0:1, sl]
                )
                nrm = jnp.concatenate([snx, sny, snz], axis=0)
                n_ref[0:3, sl] = jnp.where(better, nrm, n_ref[0:3, sl])
                m_ref[0:1, sl] = jnp.where(
                    better, sm, m_ref[0:1, sl].astype(ts.dtype)
                ).astype(jnp.int32)
                return 0

            @pl.when(last >= 0)
            def _():
                jax.lax.fori_loop(first, last + 1, sweep, 0)

            # Clear the visited rows (chosen this round) to +inf and decide
            # whether any lane still has a nearer-than-best cluster left.
            e2 = jnp.where(iota_c == wanted, _INF, e)
            ent[:, sl] = e2
            nmin = jnp.min(e2, axis=0, keepdims=True)
            nbound = jnp.minimum(t_ref[0:1, sl], t_up)
            more = jnp.any(nmin < nbound)
            return jnp.where(more, carry + 1, jnp.int32(-1))

        e0 = ent[:, sl]
        live0 = jnp.any(
            jnp.min(e0, axis=0, keepdims=True)
            < jnp.minimum(t_ref[0:1, sl], t_up)
        )

        @pl.when(live0)
        def _():
            jax.lax.while_loop(
                lambda c: c >= 0, round_body, jnp.int32(0)
            )


def _resident_anyhit_kernel(o_ref, d_ref, tmin_ref, tmax_ref, aabb_ref,
                            tri_ref, occ_ref, ent,
                            *, c_rows, prim_tile, sub_w):
    occ_ref[:, :] = jnp.zeros(occ_ref.shape, jnp.int32)

    width = o_ref.shape[1]
    for j in range(width // sub_w):
        sl = slice(j * sub_w, (j + 1) * sub_w)
        ox, oy, oz = o_ref[0:1, sl], o_ref[1:2, sl], o_ref[2:3, sl]
        dx, dy, dz = d_ref[0:1, sl], d_ref[1:2, sl], d_ref[2:3, sl]
        t_min = tmin_ref[0:1, sl]
        t_max = tmax_ref[0:1, sl]
        ent[:, sl] = _entries_block(aabb_ref, ox, oy, oz, dx, dy, dz,
                                    t_min, t_max)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (c_rows, sub_w), 0)

        def round_body(carry):
            e = ent[:, sl]
            emin = jnp.min(e, axis=0, keepdims=True)
            occ = occ_ref[0:1, sl]
            live = (occ == 0) & (emin < t_max)
            arg = jnp.argmin(e, axis=0).astype(jnp.int32)[None, :]
            wanted = jnp.where(live, arg, c_rows)
            first = jnp.min(wanted)
            last = jnp.max(jnp.where(live, arg, -1))

            def sweep(s, _):
                base = s * prim_tile
                cols = tri_ref[:, pl.ds(base, prim_tile)].T
                mt = _mt_columns(cols, anyhit=True)
                ts = _mt_ts(mt[:9], ox, oy, oz, dx, dy, dz,
                            t_min, t_max, wanted == s)
                hit = jnp.any(ts < _INF, axis=0, keepdims=True)
                occ_ref[0:1, sl] = occ_ref[0:1, sl] | hit.astype(jnp.int32)
                return 0

            @pl.when(last >= 0)
            def _():
                jax.lax.fori_loop(first, last + 1, sweep, 0)

            e2 = jnp.where(iota_c == wanted, _INF, e)
            ent[:, sl] = e2
            nmin = jnp.min(e2, axis=0, keepdims=True)
            more = jnp.any((occ_ref[0:1, sl] == 0) & (nmin < t_max))
            return jnp.where(more, carry + 1, jnp.int32(-1))

        live0 = jnp.any(
            (occ_ref[0:1, sl] == 0)
            & (jnp.min(ent[:, sl], axis=0, keepdims=True) < t_max)
        )

        @pl.when(live0)
        def _():
            jax.lax.while_loop(
                lambda c: c >= 0, round_body, jnp.int32(0)
            )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "prim_tile", "sub_w", "ray_tile"),
)
def triangle_closest_resident(o, d, t_min, t_max, v0, e1, e2, tri_normal,
                              tri_mat, interpret=False,
                              prim_tile=PRIM_TILE, sub_w=SUB_W,
                              ray_tile=RAY_TILE):
    """Closest triangle hit, resident-table persistent traversal.

    Same return contract as pallas_intersect.triangle_closest:
    ``(t (N,), global row idx (N,), outward normal (N,3), mat (N,))``.
    Callers should pre-sort the wave spatially (ops/intersect.py does) so
    subtiles stay span-coherent; results are exact in any order.
    """
    n = o.shape[0]
    dtype = o.dtype
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, dtype), (n,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, dtype), (n,))
    t_rows = _cdiv(v0.shape[0], prim_tile) * prim_tile
    tri = _pack_table(v0, e1, e2, tri_normal, tri_mat, t_rows, dtype,
                      anyhit=False)
    aabb, c_rows = _derived_aabbs(v0, e1, e2, t_rows, prim_tile, dtype)

    n_pad = _cdiv(n, ray_tile) * ray_tile
    o_t = _pad_rows(o, n_pad).T
    d_t = _pad_rows(d, n_pad, fill=1.0).T
    tmin_r = _pad_rows(t_min_b[:, None], n_pad, fill=_INF).T
    tup_r = _pad_rows(t_max_b[:, None], n_pad).T
    tmin_r, tup_r, aabb, tri = _lift_vma((o_t, d_t), tmin_r, tup_r, aabb, tri)

    grid = (n_pad // ray_tile,)

    def spec(k):
        return pl.BlockSpec((k, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    t, i, nrm, m = pl.pallas_call(
        functools.partial(_resident_closest_kernel, c_rows=c_rows,
                          prim_tile=prim_tile, sub_w=sub_w),
        grid=grid,
        in_specs=[
            spec(3), spec(3), spec(1), spec(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # aabb (C, 8), resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri (16, T), resident
        ],
        out_specs=[spec(1), spec(1), spec(3), spec(1)],
        out_shape=[
            _out_struct((1, n_pad), dtype, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
            _out_struct((3, n_pad), dtype, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
        ],
        scratch_shapes=[pltpu.VMEM((c_rows, ray_tile), dtype)],
        interpret=interpret,
    )(o_t, d_t, tmin_r, tup_r, aabb, tri)
    return t[0, :n], i[0, :n], nrm[:, :n].T, m[0, :n]


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "prim_tile", "sub_w", "ray_tile"),
)
def triangle_anyhit_resident(o, d, t_min, t_max, v0, e1, e2, interpret=False,
                             prim_tile=PRIM_TILE, sub_w=SUB_W,
                             ray_tile=RAY_TILE):
    """Occlusion against the triangle soup, resident-table traversal.
    Returns a bool (N,) mask; near-first visit order settles lanes fastest."""
    n = o.shape[0]
    dtype = o.dtype
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, dtype), (n,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, dtype), (n,))
    t_rows = _cdiv(v0.shape[0], prim_tile) * prim_tile
    tri = _pack_table(v0, e1, e2, None, None, t_rows, dtype, anyhit=True)
    aabb, c_rows = _derived_aabbs(v0, e1, e2, t_rows, prim_tile, dtype)

    n_pad = _cdiv(n, ray_tile) * ray_tile
    o_t = _pad_rows(o, n_pad).T
    d_t = _pad_rows(d, n_pad, fill=1.0).T
    tmin_r = _pad_rows(t_min_b[:, None], n_pad, fill=_INF).T
    tmax_r = _pad_rows(t_max_b[:, None], n_pad, fill=-_INF).T
    tmin_r, tmax_r, aabb, tri = _lift_vma((o_t, d_t), tmin_r, tmax_r, aabb, tri)

    grid = (n_pad // ray_tile,)

    def spec(k):
        return pl.BlockSpec((k, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    occ = pl.pallas_call(
        functools.partial(_resident_anyhit_kernel, c_rows=c_rows,
                          prim_tile=prim_tile, sub_w=sub_w),
        grid=grid,
        in_specs=[
            spec(3), spec(3), spec(1), spec(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=spec(1),
        out_shape=_out_struct((1, n_pad), jnp.int32, o, d),
        scratch_shapes=[pltpu.VMEM((c_rows, ray_tile), dtype)],
        interpret=interpret,
    )(o_t, d_t, tmin_r, tmax_r, aabb, tri)
    return occ[0, :n] != 0
