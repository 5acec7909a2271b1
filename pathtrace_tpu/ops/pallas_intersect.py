"""Fused Pallas TPU kernels for ray–primitive intersection.

The jnp bruteforce path (ops/intersect.py) materializes (N, P)-shaped
intermediates in HBM — at production wave sizes the traversal is pure HBM
bandwidth. These kernels keep a tile of rays in registers and stream the
primitive soup through VMEM, so each ray tile reads HBM exactly once and the
(rays × prims) intersection math never leaves the chip.

Layout: rays live on the 128-wide lane axis, primitives on the sublane axis —
every op is a rank-2 (prim_tile, ray_tile) VPU broadcast of (prim_tile, 1)
primitive scalars against (1, ray_tile) ray components.

Traversal is a two-level hierarchy executed per ray tile (the TPU answer to
the reference's linear scan, world.rs:270-290, and the BASELINE "LBVH" row):
primitives are morton-clustered at build time (models/scene.py) and the
kernel runs

  1. a *prepass* computing each cluster's conservative entry distance for
     this tile (slab test of the cluster AABB against all rays, reduced to
     the min entry over rays that enter at all; inf when no ray enters);
  2. a *front-to-back main loop*: extract-min over the remaining keys, stop
     the whole traversal once the nearest unvisited cluster lies beyond
     every ray's current best (``kmin >= max_r min(best_t_r, t_max_r)``),
     re-test the chosen cluster against the tightened per-ray bounds, and
     only then stream its rows (VMEM slice for spheres, HBM DMA for
     triangles) through the exact intersection math.

The kernels also resolve the winning primitive's shading data **in-kernel**
(outward normal and material id, selected with an argmin mask while the tile
is still resident) — a TPU gather of (N,) values from primitive tables
measured ~2 ms per array at production sizes, so hit records must leave the
kernel fully formed.

Math matches the reference exactly (same epsilons/ranges as ops.intersect):
half-b quadratic with near-then-far root selection (shape.rs:53-89) and
Möller–Trumbore with the 1e-8 parallel reject and inclusive barycentric
bounds (shape.rs:161-198), with one documented deviation: ray directions are
assumed unit length (a = d·d = 1), which camera/BSDF sampling guarantees.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 1024      # rays per grid step (lane axis, multiple of 128)
PRIM_TILE = 256     # primitives per inner iteration (sublane axis, multiple of 8)
KEY_LANES = 128      # clusters per prepass chunk / keys-buffer row
_DEBUG_NO_EARLYOUT = False  # diagnostic: visit every entered cluster in order
_INF = float("inf")  # plain python float: jnp constants can't be captured by kernels


def _cdiv(a, b):
    return (a + b - 1) // b


def _out_struct(shape, dtype, *ray_arrays):
    """Out-shape struct whose varying-mesh-axes are the union over the ray
    inputs, so the kernels lower under ``shard_map(check_vma=True)``. The
    union matters: primary rays share one camera origin (an invariant
    broadcast) while their directions vary per device — the hit record varies
    over every axis any ray component does."""
    vma = frozenset().union(*(jax.typeof(a).vma for a in ray_arrays))
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _lift_vma(like_arrays, *xs):
    """Lift replicated operands to the union varying-mesh-axes of the ray
    arrays. Under ``shard_map`` the rays vary over the device mesh while
    scene tables and scalar-broadcast range rows are replicated; kernels
    that compare the two (every traversal does) fail shard_map's
    varying-axes check unless the replicated side is explicitly pcast.
    No-op (and zero-cost) outside shard_map, where every vma is empty."""
    want = frozenset().union(*(jax.typeof(a).vma for a in like_arrays))
    out = []
    for x in xs:
        missing = tuple(want - jax.typeof(x).vma)
        out.append(
            jax.lax.pcast(x, missing, to="varying") if missing else x
        )
    return out


def _pad_rows(a, rows, fill=0.0):
    pad = rows - a.shape[0]
    if pad == 0:
        return a
    return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), constant_values=fill)


def _select_winner(mask_f, cols):
    """Sum-select per-lane winning rows: ``mask_f`` is a one-hot (P, R) float
    mask; each entry of ``cols`` is (P, 1) per-primitive data.

    Implemented as one (k, P) @ (P, R) dot so the contraction runs on the MXU
    concurrently with the VPU quadratic math (measured 12% kernel speedup vs
    k separate masked sum-reductions). Exact: each output column has at most
    one nonzero product (value x 1.0)."""
    cat = jnp.concatenate(cols, axis=1)                      # (P, k)

    def dot(a):
        return jax.lax.dot_general(
            a, mask_f, (((0,), (0,)), ((), ())),
            preferred_element_type=mask_f.dtype,
        )

    # A plain f32 dot defaults to bf16 operand rounding on the MXU, which
    # corrupted the selected centers enough to break normals and the image
    # checksum (~19% longer paths). The one-hot contraction has no
    # accumulation, so splitting each value into three bf16-exact pieces
    # (8+8+8 mantissa bits >= f32's 24) makes the select exact regardless of
    # how the Mosaic version at hand treats the precision attribute: each
    # piece's product against the 0/1 mask is exact in bf16, and the f32
    # recombine loses at most 1 ulp.
    b0 = cat.astype(jnp.bfloat16).astype(cat.dtype)
    r1 = cat - b0
    b1 = r1.astype(jnp.bfloat16).astype(cat.dtype)
    b2 = r1 - b1
    sel = dot(b0) + dot(b1) + dot(b2)                        # (k, R)
    return [sel[i : i + 1, :] for i in range(len(cols))]


def _pack_aabbs(cluster_min, cluster_max, n_real, n_rows, dtype):
    """(C,3)+(C,3) → padded (n_rows, 8) [min|max|pad].

    Rows < ``n_real`` with no data become open boxes (always entered); rows
    >= ``n_real`` are inverted empty boxes (never entered, so the traversal
    never picks a cluster index past the real table).
    """
    if cluster_min is None:
        a = jnp.concatenate(
            [jnp.full((n_real, 3), -_INF, dtype), jnp.full((n_real, 3), _INF, dtype),
             jnp.zeros((n_real, 2), dtype)], axis=1)
    else:
        a = jnp.concatenate(
            [cluster_min.astype(dtype), cluster_max.astype(dtype),
             jnp.zeros((cluster_min.shape[0], 2), dtype)], axis=1)[:n_real]
    pad = n_rows - a.shape[0]
    if pad > 0:  # extra clusters are empty (inverted box)
        empty = jnp.concatenate(
            [jnp.full((pad, 3), _INF, dtype), jnp.full((pad, 3), -_INF, dtype),
             jnp.zeros((pad, 2), dtype)], axis=1)
        a = jnp.concatenate([a, empty], axis=0)
    return a[:n_rows]


def _safe_inv(d):
    tiny = 1e-20
    return 1.0 / jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)


def _slab_range(bmin, bmax, o, inv_d, t_min, t_upper):
    """Slab test of cluster AABB rows against the ray tile.

    ``bmin``/``bmax`` are 3-tuples of (C, 1) columns; returns ``(tnear, tfar)``
    of shape (C, R). Entered iff tnear <= tfar. Empty clusters carry inverted
    boxes (+inf/-inf) and never pass.
    """
    (ox, oy, oz), (ix, iy, iz) = o, inv_d
    x1 = (bmin[0] - ox) * ix
    x2 = (bmax[0] - ox) * ix
    y1 = (bmin[1] - oy) * iy
    y2 = (bmax[1] - oy) * iy
    z1 = (bmin[2] - oz) * iz
    z2 = (bmax[2] - oz) * iz
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(x1, x2), jnp.minimum(y1, y2)),
        jnp.maximum(jnp.minimum(z1, z2), t_min),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(x1, x2), jnp.maximum(y1, y2)),
        jnp.minimum(jnp.maximum(z1, z2), t_upper),
    )
    return tnear, tfar


def _aabb_cols(aabb_ref, a, b):
    """Static row-slice of the packed AABB table as (C,1) column tuples."""
    bmin = (aabb_ref[a:b, 0:1], aabb_ref[a:b, 1:2], aabb_ref[a:b, 2:3])
    bmax = (aabb_ref[a:b, 3:4], aabb_ref[a:b, 4:5], aabb_ref[a:b, 5:6])
    return bmin, bmax


def _keys_prepass(aabb_ref, keys_ref, o, inv_d, t_min, t_max, *,
                  krows, n_real, row0=0, aabb_row0=0):
    """Fill ``keys_ref`` rows [row0, row0+krows) with each cluster's
    conservative entry distance over the tile (inf when no ray enters its
    AABB). Statically unrolled in 128-cluster chunks so every store has a
    static row index.

    Lanes >= ``n_real`` are forced to inf: inverted "empty" padding boxes
    actually PASS the min/max slab formulation (per-axis min of ±inf slabs
    is always -inf, so tnear degenerates to t_min) — they must be excluded
    by index, not by geometry.
    """
    for k in range(krows):
        bmin, bmax = _aabb_cols(
            aabb_ref, aabb_row0 + k * KEY_LANES, aabb_row0 + (k + 1) * KEY_LANES
        )
        tnear, tfar = _slab_range(bmin, bmax, o, inv_d, t_min, t_max)  # (128, R)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (KEY_LANES, 1), 0) + k * KEY_LANES
            < n_real
        )
        key = jnp.min(jnp.where((tnear <= tfar) & valid, tnear, _INF), axis=1)
        keys_ref[row0 + k : row0 + k + 1, :] = key[None, :]


def _extract_min(keys_ref, krows, row0=0):
    """(kmin, class-relative cluster index of kmin) over the keys buffer.
    The index is derived with a where/iota/min reduction (portable scalar
    argmin)."""
    kv = keys_ref[row0 : row0 + krows, :]
    kmin = jnp.min(kv)
    rows = jax.lax.broadcasted_iota(jnp.int32, kv.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, kv.shape, 1)
    flat = rows * KEY_LANES + cols
    idx = jnp.min(jnp.where(kv == kmin, flat, jnp.int32(2**30)))
    return kmin, idx


def _clear_key(keys_ref, idx, krows, row0=0):
    """Set key ``idx`` (class-relative) to +inf via a masked full-buffer
    write — a dynamic 2-D scalar store does not reliably lower in Mosaic."""
    kv = keys_ref[row0 : row0 + krows, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, kv.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, kv.shape, 1)
    flat = rows * KEY_LANES + cols
    keys_ref[row0 : row0 + krows, :] = jnp.where(flat == idx, _INF, kv)


# ---------------------------------------------------------------------------
# Sphere kernel
# ---------------------------------------------------------------------------

def _sphere_kernel(o_ref, d_ref, tmin_ref, tmax_ref, c_ref, k_ref, aux_ref,
                   aabb_ref, t_ref, i_ref, n_ref, m_ref, st_t, st_i, st_g,
                   keys,
                   *, prim_tiles, prim_tile, krows):
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]   # (1, R)
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0:1, :]
    t_max = tmax_ref[0:1, :]

    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz
    o3 = (ox, oy, oz)
    inv_d = (_safe_inv(dx), _safe_inv(dy), _safe_inv(dz))

    st_t[:, :] = jnp.full(t_min.shape, _INF)
    st_i[:, :] = jnp.full(t_min.shape, -1, jnp.int32)
    st_g[:, :] = jnp.zeros((4, t_min.shape[1]), t_min.dtype)
    m_ref[:, :] = jnp.zeros(t_min.shape, jnp.int32)

    def test_cluster(s, live_mask=None):
        sl = pl.ds(s * prim_tile, prim_tile)
        cx = c_ref[sl, 0:1]   # (P, 1)
        cy = c_ref[sl, 1:2]
        cz = c_ref[sl, 2:3]
        k = k_ref[sl, 0:1]    # |c|^2 - r^2 (NaN for padding rows)
        inv_r = aux_ref[sl, 0:1]   # 1/radius (0 for padding)
        matid = aux_ref[sl, 1:2]   # material id as f32

        cd = cx * dx + cy * dy + cz * dz            # (P, R)
        co = cx * ox + cy * oy + cz * oz
        half_b = od - cd
        c = oo - 2.0 * co + k
        disc = half_b * half_b - c                   # a == 1 (unit directions)
        # sqrt(disc<0) = NaN and every NaN comparison below is false, so the
        # no-real-root case needs no explicit mask; padding rows carry k=NaN
        # and die the same way. Root choice: the near root unless it is in
        # front of t_min (then the far root — we are inside the sphere); a
        # near root beyond t_max fails the window test with the far root
        # necessarily farther — exactly shape.rs:77-86.
        sq = jnp.sqrt(disc)
        root1 = -half_b - sq
        t_c = jnp.where(root1 >= t_min, root1, -half_b + sq)
        ok = (t_c >= t_min) & (t_c <= t_max)
        ts = jnp.where(ok, t_c, _INF)
        if live_mask is not None:
            # Mask folded into values (NOT @pl.when: predication around this
            # loop proved unreliable on this Mosaic version — see main loop).
            ts = jnp.where(live_mask, ts, _INF)

        best_t = st_t[0:1, :]
        tmin_tile = jnp.min(ts, axis=0, keepdims=True)           # (1, R)
        arg = jnp.argmin(ts, axis=0).astype(jnp.int32)[None, :]
        better = tmin_tile < best_t

        row_iota = jax.lax.broadcasted_iota(jnp.int32, ts.shape, 0)
        mask_f = ((row_iota == arg) & better).astype(ts.dtype)
        scx, scy, scz, sir, sm = _select_winner(mask_f, (cx, cy, cz, inv_r, matid))

        st_i[:, :] = jnp.where(better, s * prim_tile + arg, st_i[0:1, :])
        st_t[:, :] = jnp.where(better, tmin_tile, best_t)
        geo = jnp.concatenate([scx, scy, scz, sir], axis=0)      # (4, R)
        st_g[0:4, :] = jnp.where(better, geo, st_g[0:4, :])
        m_ref[:, :] = jnp.where(better, sm, m_ref[0:1, :].astype(ts.dtype)).astype(jnp.int32)

    if prim_tiles == 1:
        test_cluster(0)
    else:
        # Front-to-back traversal, predication-free: a while_loop walks the
        # keys in ascending order and every iteration runs the full cluster
        # test with the early-out folded into the VALUE domain (ts := inf
        # when this iteration is past the early-out). @pl.when around this
        # loop's side effects miscompiled (phantom winner writes).
        _keys_prepass(aabb_ref, keys, o3, inv_d, t_min, t_max,
                      krows=krows, n_real=prim_tiles)

        def cond(carry):
            i, done_i = carry
            return (i < prim_tiles) & (done_i == 0)

        def body(carry):
            i, _ = carry
            kmin, s = _extract_min(keys, krows)
            # Post-exhaustion s indexes an arbitrary inf key, possibly a
            # padded cluster: clamp so the table slice stays in range.
            s = jnp.minimum(s, jnp.int32(prim_tiles - 1))
            worst = jnp.max(jnp.minimum(st_t[0:1, :], t_max))
            if _DEBUG_NO_EARLYOUT:
                worst = jnp.asarray(_INF, t_min.dtype)
            active = kmin < worst
            _clear_key(keys, s, krows)
            # Re-test the cluster against the bounds tightened since the
            # prepass; skip the whole cluster when no ray can improve in it.
            row = pl.ds(s, 1)
            b0 = (aabb_ref[row, 0:1], aabb_ref[row, 1:2], aabb_ref[row, 2:3])
            b1 = (aabb_ref[row, 3:4], aabb_ref[row, 4:5], aabb_ref[row, 5:6])
            tnear, tfar = _slab_range(
                b0, b1, o3, inv_d, t_min, jnp.minimum(t_max, st_t[0:1, :])
            )

            @pl.when(active & jnp.any(tnear <= tfar))
            def _():
                test_cluster(s)

            return (i + 1, jnp.where(active, jnp.int32(0), jnp.int32(1)))

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

    best_t = st_t[0:1, :]
    best_i = st_i[0:1, :]
    hit = best_i >= 0
    tt = jnp.where(hit, best_t, 0.0)
    bir = st_g[3:4, :]
    nx = (ox + tt * dx - st_g[0:1, :]) * bir
    ny = (oy + tt * dy - st_g[1:2, :]) * bir
    nz = (oz + tt * dz - st_g[2:3, :]) * bir
    t_ref[:, :] = jnp.where(hit, best_t, _INF)
    i_ref[:, :] = best_i
    n_ref[0:1, :] = nx
    n_ref[1:2, :] = ny
    n_ref[2:3, :] = nz


@functools.partial(jax.jit, static_argnames=("interpret", "ray_tile", "prim_tile"))
def sphere_closest(o, d, t_min, t_max, centers, radius, sph_mat=None,
                   cluster_min=None, cluster_max=None,
                   interpret=False, ray_tile=RAY_TILE, prim_tile=PRIM_TILE):
    """Closest sphere hit for a ray wave.

    Returns ``(t (N,), idx (N,), outward_normal (N,3), mat (N,))`` with
    ``idx = -1`` / ``t = inf`` for misses.
    """
    n = o.shape[0]
    n_pad = _cdiv(n, ray_tile) * ray_tile
    s_pad = _cdiv(centers.shape[0], prim_tile) * prim_tile
    prim_tiles = s_pad // prim_tile
    krows = _cdiv(prim_tiles, KEY_LANES)
    if sph_mat is None:
        sph_mat = jnp.zeros((centers.shape[0],), jnp.int32)

    o_t = _pad_rows(o, n_pad).T          # (3, N)
    d_t = _pad_rows(d, n_pad, fill=1.0).T
    # Padding rays carry t_min=+inf: they can never hit, never enter a
    # cluster AABB (keeping prepass keys honest), and never hold the
    # early-out open (min(best_t, t_max=0) == 0 for them).
    tmin_r = _pad_rows(jnp.broadcast_to(t_min, (n,))[:, None], n_pad, fill=_INF).T
    tmax_r = _pad_rows(jnp.broadcast_to(t_max, (n,))[:, None], n_pad).T
    c_p = _pad_rows(centers, s_pad, fill=1e9)
    # Precompute k = |c|^2 - r^2 per sphere (the ray-independent part of the
    # quadratic's c term); rows with radius <= 0 (builder padding) get k=NaN,
    # which the kernel's NaN-propagation turns into guaranteed misses with
    # zero per-pair masking cost.
    k_p = _pad_rows(
        jnp.where(
            radius > 0.0,
            jnp.sum(centers * centers, axis=-1) - radius * radius,
            jnp.nan,
        )[:, None],
        s_pad,
        fill=float("nan"),
    )
    inv_r = jnp.where(radius > 0, 1.0 / jnp.where(radius > 0, radius, 1.0), 0.0)
    aux = _pad_rows(
        jnp.stack([inv_r, sph_mat.astype(o.dtype)], axis=1), s_pad
    )  # (S, 2)
    aabb = _pack_aabbs(cluster_min, cluster_max, prim_tiles, krows * KEY_LANES, o.dtype)

    grid = (n_pad // ray_tile,)
    t_out, i_out, n_out, m_out = pl.pallas_call(
        functools.partial(_sphere_kernel, prim_tiles=prim_tiles,
                          prim_tile=prim_tile, krows=krows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # centers resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k = |c|²-r² resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # aux (1/r, mat)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cluster AABBs
        ],
        out_specs=[
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_struct((1, n_pad), o.dtype, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
            _out_struct((3, n_pad), o.dtype, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, ray_tile), o.dtype),
            pltpu.VMEM((1, ray_tile), jnp.int32),
            pltpu.VMEM((4, ray_tile), o.dtype),
            pltpu.VMEM((max(krows, 1), KEY_LANES), o.dtype),
        ],
        interpret=interpret,
    )(o_t, d_t, tmin_r, tmax_r, c_p, k_p, aux, aabb)
    return t_out[0, :n], i_out[0, :n], n_out[:, :n].T, m_out[0, :n]


# ---------------------------------------------------------------------------
# Triangle kernel (Möller–Trumbore)
# ---------------------------------------------------------------------------

def _triangle_kernel(o_ref, d_ref, tmin_ref, tmax_ref, tri_ref, aabb_ref,
                     t_ref, i_ref, n_ref, m_ref, st_t, st_i, keys,
                     tri_tile_ref, dma_sem,
                     *, prim_tiles, prim_tile, krows):
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0:1, :]
    t_max = tmax_ref[0:1, :]
    o3 = (ox, oy, oz)
    inv_d = (_safe_inv(dx), _safe_inv(dy), _safe_inv(dz))

    st_t[:, :] = jnp.full(t_min.shape, _INF)
    st_i[:, :] = jnp.full(t_min.shape, -1, jnp.int32)
    n_ref[:, :] = jnp.zeros((3, t_min.shape[1]), t_min.dtype)
    m_ref[:, :] = jnp.zeros(t_min.shape, jnp.int32)

    def start_fetch(s, buf=0):
        # Stream this cluster's rows from HBM: a (T, 13) table resident in
        # VMEM would be lane-padded 13 -> 128 (~14x waste, OOM at 70k tris).
        # Double-buffered by iteration parity (WAR safety on the scratch).
        pltpu.make_async_copy(
            tri_ref.at[pl.ds(s * prim_tile, prim_tile)],
            tri_tile_ref.at[buf], dma_sem.at[buf]
        ).start()

    def wait_fetch(s, buf=0):
        pltpu.make_async_copy(
            tri_ref.at[pl.ds(s * prim_tile, prim_tile)],
            tri_tile_ref.at[buf], dma_sem.at[buf]
        ).wait()

    def fetch_cluster(s, buf=0):
        start_fetch(s, buf)
        wait_fetch(s, buf)

    def test_cluster(s, live_mask=None, buf=0):
        # Cluster rows were DMA'd into tri_tile_ref[buf] by fetch_cluster.
        tile = tri_tile_ref.at[buf]
        v0x = tile[:, 0:1]; v0y = tile[:, 1:2]; v0z = tile[:, 2:3]
        e1x = tile[:, 3:4]; e1y = tile[:, 4:5]; e1z = tile[:, 5:6]
        e2x = tile[:, 6:7]; e2y = tile[:, 7:8]; e2z = tile[:, 8:9]
        nx = tile[:, 9:10]; ny = tile[:, 10:11]; nz = tile[:, 11:12]
        matid = tile[:, 12:13]

        # h = d × e2 (P, R)
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / a
        sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
        u = f * (sx * hx + sy * hy + sz * hz)
        # q = s × e1
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
        )
        ts = jnp.where(ok, t, _INF)
        if live_mask is not None:
            ts = jnp.where(live_mask, ts, _INF)   # value-folded predication

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
        m_ref[:, :] = jnp.where(better, sm, m_ref[0:1, :].astype(ts.dtype)).astype(jnp.int32)

    if prim_tiles == 1:
        fetch_cluster(0)
        test_cluster(0)
    else:
        # Front-to-back traversal with a software-pipelined cluster DMA: the
        # fetch for the NEXT cluster starts before the current cluster's MT
        # test, hiding the HBM copy latency behind the vector work (the
        # serialized start+wait measured as a large share of the ~5 us/visit
        # kernel constant). Every started DMA is waited exactly once: the
        # carried ``act`` flag is precisely "a fetch for s_cur is in flight".
        _keys_prepass(aabb_ref, keys, o3, inv_d, t_min, t_max,
                      krows=krows, n_real=prim_tiles)

        def next_candidate():
            kmin, s = _extract_min(keys, krows)
            s = jnp.minimum(s, jnp.int32(prim_tiles - 1))
            worst = jnp.max(jnp.minimum(st_t[0:1, :], t_max))
            if _DEBUG_NO_EARLYOUT:
                worst = jnp.asarray(_INF, t_min.dtype)
            act = kmin < worst
            _clear_key(keys, s, krows)
            return s, act

        s0, act0 = next_candidate()

        @pl.when(act0)
        def _():
            start_fetch(s0, buf=0)

        def cond(carry):
            _, act, _ = carry
            return act

        def body(carry):
            s_cur, _, i = carry
            buf = i % 2
            # Extract and launch the next fetch while s_cur's DMA flies.
            s_nxt, act_pre = next_candidate()

            @pl.when(act_pre)
            def _():
                start_fetch(s_nxt, buf=(i + 1) % 2)

            wait_fetch(s_cur, buf=buf)
            # Re-test s_cur against bounds tightened since the prepass; the
            # whole-cluster skip keeps the MT sweep off clusters no ray can
            # improve in (the DMA already happened — only compute is saved).
            row = pl.ds(s_cur, 1)
            b0 = (aabb_ref[row, 0:1], aabb_ref[row, 1:2], aabb_ref[row, 2:3])
            b1 = (aabb_ref[row, 3:4], aabb_ref[row, 4:5], aabb_ref[row, 5:6])
            tnear, tfar = _slab_range(
                b0, b1, o3, inv_d, t_min, jnp.minimum(t_max, st_t[0:1, :])
            )

            @pl.when(jnp.any(tnear <= tfar))
            def _():
                test_cluster(s_cur, buf=buf)

            # The prefetch decision used the pre-test bounds; tightening from
            # s_cur's test can only make skipping MORE valid, and a fetched-
            # but-skipped cluster costs a wasted copy, not correctness: the
            # next iteration re-evaluates nothing for s_nxt except its test
            # gate. NOTE: act_pre must gate the next WAIT, so it is carried.
            return (s_nxt, act_pre, i + 1)

        jax.lax.while_loop(cond, body, (s0, act0, jnp.int32(0)))

    t_ref[:, :] = st_t[0:1, :]
    i_ref[:, :] = st_i[0:1, :]


@functools.partial(jax.jit, static_argnames=("interpret", "ray_tile", "prim_tile"))
def triangle_closest(o, d, t_min, t_max, v0, e1, e2, tri_normal=None,
                     tri_mat=None, cluster_min=None, cluster_max=None,
                     interpret=False, ray_tile=RAY_TILE, prim_tile=PRIM_TILE):
    """Closest triangle hit for a ray wave.

    Returns ``(t (N,), idx (N,), outward_normal (N,3), mat (N,))``.
    """
    n = o.shape[0]
    n_pad = _cdiv(n, ray_tile) * ray_tile
    t_rows = _cdiv(v0.shape[0], prim_tile) * prim_tile
    prim_tiles = t_rows // prim_tile
    krows = _cdiv(prim_tiles, KEY_LANES)
    if tri_normal is None:
        cr = jnp.cross(e1, e2)
        nrm = jnp.linalg.norm(cr, axis=-1, keepdims=True)
        tri_normal = jnp.where(nrm > 0, cr / jnp.where(nrm > 0, nrm, 1.0), 0.0)
    if tri_mat is None:
        tri_mat = jnp.zeros((v0.shape[0],), jnp.int32)

    o_t = _pad_rows(o, n_pad).T
    d_t = _pad_rows(d, n_pad, fill=1.0).T
    tmin_r = _pad_rows(jnp.broadcast_to(t_min, (n,))[:, None], n_pad, fill=_INF).T
    tmax_r = _pad_rows(jnp.broadcast_to(t_max, (n,))[:, None], n_pad).T
    # Packed triangle table (T, 128): v0 | e1 | e2 | normal | mat | lane pad.
    # Rows zero-padded (a == 0 → parallel reject); lanes padded to the native
    # 128-wide tiling so per-cluster DMA slices only the leading dim.
    tri = _pad_rows(
        jnp.concatenate(
            [v0, e1, e2, tri_normal, tri_mat.astype(o.dtype)[:, None],
             jnp.zeros((v0.shape[0], 115), o.dtype)], axis=1
        ),
        t_rows,
    )
    aabb = _pack_aabbs(cluster_min, cluster_max, prim_tiles, krows * KEY_LANES, o.dtype)

    grid = (n_pad // ray_tile,)
    t_out, i_out, n_out, m_out = pl.pallas_call(
        functools.partial(_triangle_kernel, prim_tiles=prim_tiles,
                          prim_tile=prim_tile, krows=krows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # triangle table, DMA'd per tile
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cluster AABBs
        ],
        out_specs=[
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_struct((1, n_pad), o.dtype, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
            _out_struct((3, n_pad), o.dtype, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, ray_tile), o.dtype),
            pltpu.VMEM((1, ray_tile), jnp.int32),
            pltpu.VMEM((max(krows, 1), KEY_LANES), o.dtype),
            pltpu.VMEM((2, prim_tile, 128), o.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(o_t, d_t, tmin_r, tmax_r, tri, aabb)
    return t_out[0, :n], i_out[0, :n], n_out[:, :n].T, m_out[0, :n]


# ---------------------------------------------------------------------------
# Any-hit (shadow) kernels — no closest-hit bookkeeping, just occlusion
# ---------------------------------------------------------------------------

def _anyhit_kernel(o_ref, d_ref, tmin_ref, tmax_ref, c_ref, k_ref, tri_ref,
                   sph_aabb_ref, tri_aabb_ref, occ_ref, keys,
                   tri_tile_ref, dma_sem,
                   *, sph_tiles, tri_tiles, sph_prim_tile, tri_prim_tile,
                   sph_krows, tri_krows):
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0:1, :]
    t_max = tmax_ref[0:1, :]
    o3 = (ox, oy, oz)

    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz
    inv_d = (_safe_inv(dx), _safe_inv(dy), _safe_inv(dz))

    occ_ref[:, :] = jnp.zeros(t_min.shape, jnp.int32)
    # A lane is settled when occluded or degenerate (t_max < t_min covers
    # padding lanes); a class sweep stops once every lane settles.
    settled0 = (t_max < t_min).astype(jnp.int32)

    def all_settled():
        return jnp.min(occ_ref[0:1, :] | settled0) > 0

    def sph_cluster(s, live_mask=None):
        sl = pl.ds(s * sph_prim_tile, sph_prim_tile)
        cx = c_ref[sl, 0:1]; cy = c_ref[sl, 1:2]; cz = c_ref[sl, 2:3]
        k = k_ref[sl, 0:1]    # |c|^2 - r^2, NaN for padding rows
        cd = cx * dx + cy * dy + cz * dz
        co = cx * ox + cy * oy + cz * oz
        half_b = od - cd
        c = oo - 2.0 * co + k
        disc = half_b * half_b - c
        # NaN sqrt (no real root / padding row) fails every comparison below;
        # root choice identical to the closest-hit kernel (shape.rs:77-86).
        sq = jnp.sqrt(disc)
        root1 = -half_b - sq
        t_c = jnp.where(root1 >= t_min, root1, -half_b + sq)
        ok = (t_c >= t_min) & (t_c <= t_max)
        hit = jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)
        if live_mask is not None:
            hit = jnp.where(live_mask, hit, 0)   # value-folded predication
        occ_ref[:, :] = occ_ref[0:1, :] | hit

    def tri_start(s, buf=0):
        pltpu.make_async_copy(
            tri_ref.at[pl.ds(s * tri_prim_tile, tri_prim_tile)],
            tri_tile_ref.at[buf], dma_sem.at[buf]
        ).start()

    def tri_wait(s, buf=0):
        pltpu.make_async_copy(
            tri_ref.at[pl.ds(s * tri_prim_tile, tri_prim_tile)],
            tri_tile_ref.at[buf], dma_sem.at[buf]
        ).wait()

    def tri_test(s, live_mask=None, buf=0):
        tile = tri_tile_ref.at[buf]
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
        )
        hit = jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)
        if live_mask is not None:
            hit = jnp.where(live_mask, hit, 0)
        occ_ref[:, :] = occ_ref[0:1, :] | hit

    def tri_cluster(s, live_mask=None, buf=0):
        tri_start(s, buf)
        tri_wait(s, buf)
        tri_test(s, live_mask, buf)

    def run_sph_class():
        """Front-to-back ordered occlusion sweep over the sphere class,
        predication-free (while_loop + value-folded masks): near-first order
        drains lanes fastest, and the sweep stops once all lanes settle."""
        if sph_tiles == 1:
            sph_cluster(0, None)
            return

        def cond(carry):
            i, done_i = carry
            return (i < sph_tiles) & (done_i == 0)

        def body(carry):
            i, _ = carry
            kmin, s = _extract_min(keys, sph_krows, row0=0)
            s = jnp.minimum(s, jnp.int32(sph_tiles - 1))
            active = kmin < _INF
            _clear_key(keys, s, sph_krows, row0=0)
            sph_cluster(s, active)
            stop = jnp.logical_not(active) | all_settled()
            return (i + 1, jnp.where(stop, jnp.int32(1), jnp.int32(0)))

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

    def run_tri_class():
        """Triangle sweep with software-pipelined cluster DMA (next fetch
        launched before the current test — see _triangle_kernel). The
        carried ``act`` flag is exactly "a fetch for s_cur is in flight",
        so every started DMA is waited once."""
        if tri_tiles == 1:
            tri_cluster(0, jnp.logical_not(all_settled()))
            return

        def next_candidate():
            kmin, s = _extract_min(keys, tri_krows, row0=sph_krows)
            s = jnp.minimum(s, jnp.int32(tri_tiles - 1))
            act = (kmin < _INF) & jnp.logical_not(all_settled())
            _clear_key(keys, s, tri_krows, row0=sph_krows)
            return s, act

        s0, act0 = next_candidate()

        @pl.when(act0)
        def _():
            tri_start(s0, buf=0)

        def cond(carry):
            _, act, _ = carry
            return act

        def body(carry):
            s_cur, _, i = carry
            buf = i % 2
            s_nxt, act_pre = next_candidate()

            @pl.when(act_pre)
            def _():
                tri_start(s_nxt, buf=(i + 1) % 2)

            tri_wait(s_cur, buf=buf)
            tri_test(s_cur, None, buf=buf)
            return (s_nxt, act_pre, i + 1)

        jax.lax.while_loop(cond, body, (s0, act0, jnp.int32(0)))

    # Prepass keys for both classes share one buffer: sphere rows first.
    if sph_tiles > 1:
        _keys_prepass(sph_aabb_ref, keys, o3, inv_d, t_min, t_max,
                      krows=sph_krows, n_real=sph_tiles)
    if tri_tiles > 1:
        _keys_prepass(tri_aabb_ref, keys, o3, inv_d, t_min, t_max,
                      krows=tri_krows, n_real=tri_tiles, row0=sph_krows)

    run_sph_class()
    run_tri_class()


@functools.partial(jax.jit, static_argnames=(
    "interpret", "ray_tile", "prim_tile", "sph_prim_tile", "tri_prim_tile",
    "transposed"))
def any_hit(o, d, t_min, t_max, centers, radius, v0, e1, e2,
            sph_cluster=None, tri_cluster=None,
            interpret=False, ray_tile=256, prim_tile=PRIM_TILE,
            sph_prim_tile=None, tri_prim_tile=None, transposed=False):
    # ray_tile default is half the closest-hit kernels': this kernel holds
    # BOTH primitive classes' tile temporaries in VMEM at once, and wide
    # tiles blow the 16 MB scoped-vmem budget on 70k-triangle scenes.
    """Occlusion query over both primitive classes in one fused kernel.

    Same hit criteria as the closest-hit kernels (shape.rs:53-89, 161-198);
    returns a bool (N,) mask. ~40% cheaper than closest-hit: no root
    selection, no argmin, no winner resolve — just an OR-reduction, swept
    front-to-back with an all-lanes-occluded early-out.

    ``sph_prim_tile`` / ``tri_prim_tile`` override ``prim_tile`` per class so
    small scenes can run each class as ONE right-sized tile: the per-cluster
    while_loop machinery (extract-min, settled checks, loop latency) costs
    ~3x the raw sweep math for a 488-sphere scene.
    """
    sph_prim_tile = sph_prim_tile or prim_tile
    tri_prim_tile = tri_prim_tile or prim_tile
    n = o.shape[1] if transposed else o.shape[0]
    n_pad = _cdiv(n, ray_tile) * ray_tile
    s_pad = _cdiv(centers.shape[0], sph_prim_tile) * sph_prim_tile
    t_rows = _cdiv(v0.shape[0], tri_prim_tile) * tri_prim_tile
    sph_tiles = s_pad // sph_prim_tile
    tri_tiles = t_rows // tri_prim_tile
    sph_krows = _cdiv(sph_tiles, KEY_LANES)
    tri_krows = _cdiv(tri_tiles, KEY_LANES)

    if transposed:
        # Kernel-layout inputs: o/d (3, N), ranges (N,) — the production
        # pool's zero-transpose shadow path. Lane padding (for small pools)
        # keeps pads settled via an empty [1, 0] range.
        def lane_pad(a, fill):
            pad = n_pad - a.shape[-1]
            if pad == 0:
                return a
            return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)],
                           constant_values=fill)

        o_t = lane_pad(o, 0.0)
        d_t = lane_pad(d, 1.0)
        tmin_r = lane_pad(jnp.broadcast_to(t_min, (n,))[None, :], 1.0)
        tmax_r = lane_pad(jnp.broadcast_to(t_max, (n,))[None, :], 0.0)
    else:
        o_t = _pad_rows(o, n_pad).T
        d_t = _pad_rows(d, n_pad, fill=1.0).T
        tmin_r = _pad_rows(
            jnp.broadcast_to(t_min, (n,))[:, None], n_pad, fill=1.0
        ).T
        tmax_r = _pad_rows(jnp.broadcast_to(t_max, (n,))[:, None], n_pad).T
    c_p = _pad_rows(centers, s_pad, fill=1e9)
    k_p = _pad_rows(
        jnp.where(
            radius > 0.0,
            jnp.sum(centers * centers, axis=-1) - radius * radius,
            jnp.nan,
        )[:, None],
        s_pad,
        fill=float("nan"),
    )
    tri = _pad_rows(
        jnp.concatenate([v0, e1, e2, jnp.zeros((v0.shape[0], 119), o.dtype)], axis=1),
        t_rows,
    )
    sph_aabb = _pack_aabbs(*(sph_cluster or (None, None)), sph_tiles,
                           sph_krows * KEY_LANES, o.dtype)
    tri_aabb = _pack_aabbs(*(tri_cluster or (None, None)), tri_tiles,
                           tri_krows * KEY_LANES, o.dtype)

    grid = (n_pad // ray_tile,)
    occ = pl.pallas_call(
        functools.partial(
            _anyhit_kernel,
            sph_tiles=sph_tiles,
            tri_tiles=tri_tiles,
            sph_prim_tile=sph_prim_tile,
            tri_prim_tile=tri_prim_tile,
            sph_krows=sph_krows,
            tri_krows=tri_krows,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # triangle table, DMA'd per tile
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sphere cluster AABBs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # triangle cluster AABBs
        ],
        out_specs=pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=_out_struct((1, n_pad), jnp.int32, o, d),
        scratch_shapes=[
            pltpu.VMEM((sph_krows + tri_krows, KEY_LANES), o.dtype),
            pltpu.VMEM((2, tri_prim_tile, 128), o.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(o_t, d_t, tmin_r, tmax_r, c_p, k_p, tri, sph_aabb, tri_aabb)
    return occ[0, :n] != 0


# ---------------------------------------------------------------------------
# Fused small-scene closest-hit kernel: one pass over spheres AND triangles
# ---------------------------------------------------------------------------

def _combined_small_kernel(o_ref, d_ref, tmin_ref, tmax_ref, c_ref, k_ref,
                           aux_ref, tri_ref, t_ref, i_ref, n_ref, m_ref,
                           *, num_tris):
    """Closest hit over one right-sized sphere tile plus one small triangle
    tile, fully resolved in-kernel (global prim id, outward normal, mat).

    Small scenes (the default-spheres / many-spheres benches) previously paid
    two kernel dispatches plus an XLA merge per trace; fused, the ray tile's
    transposed inputs load once and the winner select runs once.
    """
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0:1, :]
    t_max = tmax_ref[0:1, :]

    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz

    # ---- Triangles (small tile; zero-edge padding rows self-reject) ----
    v0x = tri_ref[:, 0:1]; v0y = tri_ref[:, 1:2]; v0z = tri_ref[:, 2:3]
    e1x = tri_ref[:, 3:4]; e1y = tri_ref[:, 4:5]; e1z = tri_ref[:, 5:6]
    e2x = tri_ref[:, 6:7]; e2y = tri_ref[:, 7:8]; e2z = tri_ref[:, 8:9]
    tnx = tri_ref[:, 9:10]; tny = tri_ref[:, 10:11]; tnz = tri_ref[:, 11:12]
    tmat = tri_ref[:, 12:13]

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
    )
    ts = jnp.where(ok, t, _INF)
    tri_t = jnp.min(ts, axis=0, keepdims=True)
    tri_arg = jnp.argmin(ts, axis=0).astype(jnp.int32)[None, :]
    tri_hit = tri_t < _INF
    row_iota = jax.lax.broadcasted_iota(jnp.int32, ts.shape, 0)
    mask_f = ((row_iota == tri_arg) & tri_hit).astype(ts.dtype)
    snx, sny, snz, stm = _select_winner(mask_f, (tnx, tny, tnz, tmat))

    # ---- Spheres (single right-sized tile, NaN-padded k) ----
    cx = c_ref[:, 0:1]; cy = c_ref[:, 1:2]; cz = c_ref[:, 2:3]
    k = k_ref[:, 0:1]
    inv_r = aux_ref[:, 0:1]
    smat = aux_ref[:, 1:2]
    cd = cx * dx + cy * dy + cz * dz
    co = cx * ox + cy * oy + cz * oz
    half_b = od - cd
    c = oo - 2.0 * co + k
    disc = half_b * half_b - c
    sq = jnp.sqrt(disc)
    root1 = -half_b - sq
    t_c = jnp.where(root1 >= t_min, root1, -half_b + sq)
    oks = (t_c >= t_min) & (t_c <= jnp.minimum(t_max, tri_t))
    tss = jnp.where(oks, t_c, _INF)
    sph_t = jnp.min(tss, axis=0, keepdims=True)
    sph_arg = jnp.argmin(tss, axis=0).astype(jnp.int32)[None, :]
    sph_hit = sph_t < tri_t  # strictly closer than the triangle winner
    rows = jax.lax.broadcasted_iota(jnp.int32, tss.shape, 0)
    mask_s = ((rows == sph_arg) & sph_hit).astype(tss.dtype)
    scx, scy, scz, sir, ssm = _select_winner(mask_s, (cx, cy, cz, inv_r, smat))

    # ---- Merge (sphere wins ties broken toward triangles like the XLA
    #      merge's sph_t < tri_t) ----
    best_t = jnp.where(sph_hit, sph_t, tri_t)
    hit = sph_hit | tri_hit
    tt = jnp.where(hit, best_t, 0.0)
    px = ox + tt * dx
    py = oy + tt * dy
    pz = oz + tt * dz
    nx = jnp.where(sph_hit, (px - scx) * sir, snx)
    ny = jnp.where(sph_hit, (py - scy) * sir, sny)
    nz = jnp.where(sph_hit, (pz - scz) * sir, snz)
    prim = jnp.where(
        sph_hit, num_tris + sph_arg, jnp.where(tri_hit, tri_arg, -1)
    )
    mat = jnp.where(sph_hit, ssm, stm)

    t_ref[:, :] = jnp.where(hit, best_t, _INF)
    i_ref[:, :] = prim
    n_ref[0:1, :] = nx
    n_ref[1:2, :] = ny
    n_ref[2:3, :] = nz
    m_ref[:, :] = mat.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret", "ray_tile", "num_tris"))
def combined_closest_small(o, d, t_min, t_max, centers, radius, sph_mat,
                           v0, e1, e2, tri_normal, tri_mat, num_tris,
                           interpret=False, ray_tile=RAY_TILE):
    """Fused closest hit for small scenes (spheres <= 512, tris <= 64).

    Returns ``(t (N,), GLOBAL prim id (N,), outward normal (N,3), mat (N,))``
    with triangles occupying ids [0, num_tris) and spheres above, matching
    the scene's global-id convention (models/scene.py).
    """
    n = o.shape[0]
    n_pad = _cdiv(n, ray_tile) * ray_tile
    s_pad = _cdiv(centers.shape[0], 8) * 8
    t_rows = _cdiv(v0.shape[0], 8) * 8

    o_t = _pad_rows(o, n_pad).T
    d_t = _pad_rows(d, n_pad, fill=1.0).T
    tmin_r = _pad_rows(jnp.broadcast_to(t_min, (n,))[:, None], n_pad, fill=_INF).T
    tmax_r = _pad_rows(jnp.broadcast_to(t_max, (n,))[:, None], n_pad).T
    c_p = _pad_rows(centers, s_pad, fill=1e9)
    k_p = _pad_rows(
        jnp.where(
            radius > 0.0,
            jnp.sum(centers * centers, axis=-1) - radius * radius,
            jnp.nan,
        )[:, None],
        s_pad,
        fill=float("nan"),
    )
    inv_r = jnp.where(radius > 0, 1.0 / jnp.where(radius > 0, radius, 1.0), 0.0)
    aux = _pad_rows(jnp.stack([inv_r, sph_mat.astype(o.dtype)], axis=1), s_pad)
    tri = _pad_rows(
        jnp.concatenate(
            [v0, e1, e2, tri_normal, tri_mat.astype(o.dtype)[:, None]], axis=1
        ),
        t_rows,
    )

    grid = (n_pad // ray_tile,)
    t_out, i_out, n_out, m_out = pl.pallas_call(
        functools.partial(_combined_small_kernel, num_tris=num_tris),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_struct((1, n_pad), o.dtype, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
            _out_struct((3, n_pad), o.dtype, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
        ],
        interpret=interpret,
    )(o_t, d_t, tmin_r, tmax_r, c_p, k_p, aux, tri)
    return t_out[0, :n], i_out[0, :n], n_out[:, :n].T, m_out[0, :n]
