"""Two-level BVH mesh traversal, single-dispatch union sweep (generation 4).

The hierarchical answer to the reference's O(N) linear scan
(/root/reference/src/world.rs:270-290): triangles are morton-ordered at build
(models/scene.py), grouped into 128-triangle *leaves*, and leaves into
16-leaf *supergroups* — a fixed-topology two-level LBVH whose AABBs are
derived from the soup at trace time, so any granularity works without a
Scene-format change.

Why not a classic per-ray stack descent: TPU lanes can't gather per-lane node
addresses profitably, and the third-generation kernel (resident_intersect.py)
showed the real costs are (a) per-(tile,cluster) visit constants and (b) how
many visits a subtile pays. Its one-cluster-per-lane-per-round loop re-visits
a cluster every round some lane picks it, and pays a full (C, W) min/argmin/
clear pass per round. This kernel instead sweeps the *union* of entered
nodes, once each, in aggregated front-to-back order:

  per 256-lane subtile:
    group entries   (G, W) slab tests, computed once  (G = C/16 ≈ 35 @ 70k)
    round loop:     pick the nearest group any live lane enters (packed
                    (entry,id) int32 key, one min-reduce — conservative
                    mantissa truncation can only visit早, never skip);
                    compute its 16 leaf entries (16, W) on the fly;
                    unrolled leaf sweep, each leaf gated per lane by
                    ``leaf_entry < min(best_t, t_max)`` — the reference's
                    per-ray early-out bound (rendering.rs:104-133),
                    re-tightened after every leaf; clear the group.
    stop:           when no live lane has an unvisited group nearer than
                    its bound.

Each (subtile, leaf) pair is visited at most once; group-level culling means
leaf entry math only runs for entered supergroups (shadow rays and local
bounces skip most of the scene). The triangle table is the lane-transposed
(16, T) layout proven in resident_intersect.py, VMEM-resident up to
VMEM_TABLE_BUDGET (4.5 MB at 70k tris); above it the SAME traversal streams
one supergroup per DMA from HBM (bitwise-identical results, unbounded scene
size — see the ``stream`` parameter).

Math and epsilons match ops.pallas_intersect exactly (Möller–Trumbore,
shape.rs:161-198: 1e-8 parallel reject, inclusive barycentric bounds, closed
[t_min, t_max]).
"""

from __future__ import annotations

import functools
import os

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
from .pallas_shade import _bf16_split3, _trunc_split3
from .resident_intersect import (
    _TAB_ROWS,
    _derived_aabbs,
    _mt_columns,
    _mt_ts,
    _pack_table,
)

_INF = float("inf")

RAY_TILE = 1024
SUB_W = 256        # lanes per independent traversal span (multiple of 128)
PRIM_TILE = 128    # triangles per leaf (lane-axis slices need 128 alignment)
GROUP = 16         # leaves per supergroup

# Packed +inf with the id bits stripped (see _packed_group_key).
_EXHAUSTED = 0x7F800000

# --- MXU Möller–Trumbore (round 5) -----------------------------------------
# All four MT determinants are LINEAR in a 10-feature per-lane vector once
# the per-triangle constants are precomputed (Plücker-style): with
# group-local o' = o - g and w' = o' × d,
#   a    = det[e1, d, e2]      =  (e2 × e1) · d
#   s·h  = (o'-v0')·(d × e2)   =  e2 · w' − (e2 × v0') · d
#   d·q  = d·((o'-v0') × e1)   = −e1 · w' + (e1 × v0') · d
#   e2·q = (o'-v0')·(e1 × e2)  =  Ne · o' − Ne·v0'          (Ne = e1 × e2)
# so one (3P, MT_K) @ (MT_K, W) dot per leaf replaces the ~49-op/(pair) VPU
# chain of _mt_ts with ~14 VPU ops (reciprocal, three muls, the accept
# compares) — the determinant math rides the otherwise-idle MXU. f32-grade
# accuracy via the 6-block bf16 split scheme proven on the sphere quadratic
# tables (pallas_shade._sphere_quad_tables); the recentering keeps the e2·q
# cancellation error at leaf-local scale. Validated offline on the 70k knot
# (examples/mt_mxu_probe.py): acceptance flips vs the VPU f32 chain ~1e-7 of
# pairs, hit-t agreement to ~1e-6 relative — the documented knife-edge
# determinism contract (docs/ARCHITECTURE.md), same as the sphere sweep.
MT_FEATS = 10
# Contraction width: 6 * MT_FEATS = 60, padded to the 128-lane tile (Mosaic
# rejects 64-lane DMA slices: "slice shape along dimension 1 must be aligned
# to tiling (128)"). The K padding waste is structural; the table stays lean
# by carrying only THREE determinant planes [s·h | d·q | e2·q] — `a` is a
# 5-op VPU dot against a packed (e2 × e1) column (rows 13:16 of the closest
# table / the ne table for any-hit), which cuts the coefficient DMA and the
# dot M by 25% at zero accuracy cost.
MT_K = 128
# Dot contraction width: the dot only needs the 60 live columns; when 64,
# the kernels slice the loaded 128-lane block to [0:64] so the MXU dot runs
# half the K tiles (the table/DMA stays 128-wide for slice alignment).
# Import-time env knob for A/B.
MT_KD = int(os.environ.get("PT_BVH_MTKD", "128"))


def env_params() -> dict:
    """Trace-time tuning knobs for in-pool A/B sweeps (the pool call sites in
    ops/intersect.py splat these): PT_BVH_SUBW / PT_BVH_GROUP /
    PT_BVH_PRIM_TILE override the traversal's static geometry. Unset → {}
    so explicit keyword callers are unaffected."""
    out = {}
    for env, kw in (("PT_BVH_SUBW", "sub_w"), ("PT_BVH_GROUP", "group"),
                    ("PT_BVH_PRIM_TILE", "prim_tile"),
                    ("PT_BVH_LANEGATE", "lane_gate")):
        v = os.environ.get(env)
        if v:
            out[kw] = int(v)
    v = os.environ.get("PT_BVH_MXU")
    if v is not None:
        out["mxu"] = bool(int(v))
    return out


def _group_aabbs(laabb, c_rows, group, dtype):
    """Supergroup AABBs by reducing leaf AABBs over ``group``-row blocks.

    Leaf padding rows carry inverted boxes (+inf/-inf), so a padding group's
    reduction stays inverted and is never entered. Returns ``(gaabb (G_pad,
    8), n_groups, g_pad)`` with G_pad a multiple of 8.
    """
    n_groups = _cdiv(c_rows, group)
    rows = n_groups * group
    pad = rows - laabb.shape[0]
    if pad < 0:
        # _derived_aabbs pads leaf rows to a multiple of 8, which can exceed
        # a whole number of groups; the surplus rows are inverted padding.
        laabb = laabb[:rows]
        pad = 0
    if pad:
        laabb = jnp.concatenate(
            [
                laabb,
                jnp.concatenate(
                    [
                        jnp.full((pad, 3), _INF, dtype),
                        jnp.full((pad, 3), -_INF, dtype),
                        jnp.zeros((pad, 2), dtype),
                    ],
                    axis=1,
                ),
            ],
            axis=0,
        )
    blocks = laabb.reshape(n_groups, group, 8)
    gmin = blocks[:, :, 0:3].min(axis=1)
    gmax = blocks[:, :, 3:6].max(axis=1)
    gaabb = jnp.concatenate([gmin, gmax, jnp.zeros((n_groups, 2), dtype)], axis=1)
    g_pad = max(8, _cdiv(n_groups, 8) * 8)
    if g_pad > n_groups:
        gaabb = jnp.concatenate(
            [
                gaabb,
                jnp.concatenate(
                    [
                        jnp.full((g_pad - n_groups, 3), _INF, dtype),
                        jnp.full((g_pad - n_groups, 3), -_INF, dtype),
                        jnp.zeros((g_pad - n_groups, 2), dtype),
                    ],
                    axis=1,
                ),
            ],
            axis=0,
        )
    return laabb, gaabb, n_groups, g_pad


def _entries_from(box, ox, oy, oz, dx, dy, dz, t_min, t_up):
    """(rows, W) conservative entry distances from a (rows, 8) AABB block
    (value or ref slice): +inf where the [t_min, t_up] segment misses."""
    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-20, 1e-20, c)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    mnx, mny, mnz = box[:, 0:1], box[:, 1:2], box[:, 2:3]
    mxx, mxy, mxz = box[:, 3:4], box[:, 4:5], box[:, 5:6]
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


def _id_bits(n: int) -> int:
    bits = 1
    while (1 << bits) <= n:
        bits += 1
    return bits


def _packed_group_key(e_live, g_rows):
    """Pack (entry, group id) into one int32 per (G, W) cell so a single
    min-reduce yields both the nearest entered group and a conservative
    (truncated-down) bound. Entries are positive floats, so the int32
    bitcast is order-preserving; the low ``bits`` mantissa bits carry the
    group id (truncation can only visit a group early, never skip one).
    +inf packs to 0x7F8000xx whose value bits still compare == _EXHAUSTED."""
    bits = _id_bits(g_rows)
    idmask = jnp.int32((1 << bits) - 1)
    eb = jax.lax.bitcast_convert_type(e_live, jnp.int32)
    ids = jax.lax.broadcasted_iota(jnp.int32, e_live.shape, 0)
    return (eb & ~idmask) | ids, idmask


def _stream_dma(tabs, gid, buf):
    """Copy descriptors for supergroup ``gid``'s block of every streamed
    table into buffer ``buf`` (reconstructed identically for start and wait,
    double-buffer pattern). Each entry of ``tabs`` is ``(src_ref, scratch,
    sem, axis, rows_per_group)``: axis 1 slices the lane axis (the
    lane-transposed (16, T) layout), axis 0 the sublane axis ((T, 16) rows
    layout / the (4T, MT_K) MXU coefficient table)."""
    cps = []
    for src, dst, sem, axis, rpg in tabs:
        sl = pl.ds(gid * rpg, rpg)
        s = src.at[sl, :] if axis == 0 else src.at[:, sl]
        cps.append(pltpu.make_async_copy(s, dst.at[buf], sem.at[buf]))
    return cps


def _stream_start(tabs, gid, buf):
    for cp in _stream_dma(tabs, gid, buf):
        cp.start()


def _stream_wait(tabs, gid, buf):
    for cp in _stream_dma(tabs, gid, buf):
        cp.wait()


def _stream_fetch(tabs, gstar, keys, idmask, alive, pf, pbuf):
    """Stream-mode fetch of ``gstar``'s block(s) with next-group prefetch.

    The prefetch candidate is the second-nearest entered group (second
    min of the packed keys) — the true next visit unless this round's sweep
    bounds it out, in which case the DMA is wasted but never wrong. Returns
    ``(cur, new_pf, new_pbuf)``: the buffer holding gstar's block and the
    carried prefetch state ((group id or -1, buffer)); the caller drains any
    outstanding prefetch after the round loop exits. All streamed tables
    move together (one buffer index, one prefetch decision).
    """
    hitp = pf == gstar
    cur = jnp.where(hitp, pbuf, jnp.where(pf >= 0, pbuf ^ 1, 0))
    ids = keys & idmask
    keys2 = jnp.where(ids == gstar, jnp.int32(0x7FFFFFFF), keys)
    kmin2 = jnp.min(keys2)
    gnext = kmin2 & idmask
    have_next = (kmin2 & ~idmask) < _EXHAUSTED

    @pl.when(alive & hitp)
    def _():
        _stream_wait(tabs, gstar, cur)

    @pl.when(alive & ~hitp)
    def _():
        @pl.when(pf >= 0)
        def _():  # drain the mispredicted prefetch before reusing state
            _stream_wait(tabs, pf, pbuf)
        _stream_start(tabs, gstar, cur)
        _stream_wait(tabs, gstar, cur)

    @pl.when(alive & have_next)
    def _():
        _stream_start(tabs, gnext, cur ^ 1)

    new_pf = jnp.where(alive, jnp.where(have_next, gnext, jnp.int32(-1)), pf)
    new_pbuf = jnp.where(alive & have_next, cur ^ 1, pbuf)
    return cur, new_pf, new_pbuf


def _mt_coeff_table(v0, e1, e2, t_rows, prim_tile, group, dtype):
    """MXU Möller–Trumbore coefficient table + supergroup centroid table.

    Returns ``(coef (3*t_rows, MT_K) bf16, gcent (G_pad8, 8) f32)``. Leaf
    ``l`` occupies coef rows ``[l*3*P, (l+1)*3*P)`` as three P-row planes
    [s·h | d·q | e2·q] whose columns are the 6-block bf16 split of the
    10 per-triangle coefficients (see the MT_FEATS comment at the top);
    ``a`` stays on the VPU from the packed e2×e1 column.
    v0 is recentered on its supergroup's AABB midpoint — the same
    cancellation-control trick as the sphere quad tables — and ``gcent``
    carries those midpoints for the kernel's matching feature recenter.
    Padding triangles are all-zero so a == 0 rejects them via |a| < 1e-8,
    exactly like the VPU table's zero columns."""
    n_tris = v0.shape[0]
    v0p = _pad_rows(v0, t_rows)
    e1p = _pad_rows(e1, t_rows)
    e2p = _pad_rows(e2, t_rows)
    gsz = group * prim_tile
    ng = t_rows // gsz
    p1 = v0p + e1p
    p2 = v0p + e2p
    valid = (jnp.arange(t_rows) < n_tris)[:, None]
    lo = jnp.where(valid, jnp.minimum(jnp.minimum(v0p, p1), p2), _INF)
    hi = jnp.where(valid, jnp.maximum(jnp.maximum(v0p, p1), p2), -_INF)
    glo = lo.reshape(ng, gsz, 3).min(axis=1)
    ghi = hi.reshape(ng, gsz, 3).max(axis=1)
    g = jnp.where(glo[:, 0:1] <= ghi[:, 0:1], 0.5 * (glo + ghi), 0.0)
    v0l = v0p - jnp.repeat(g, gsz, axis=0)
    ne = jnp.cross(e1p, e2p)
    z3 = jnp.zeros_like(ne)
    z1 = jnp.zeros((t_rows, 1), v0p.dtype)
    planes = [
        jnp.concatenate([-jnp.cross(e2p, v0l), e2p, z3, z1], axis=1),
        jnp.concatenate([jnp.cross(e1p, v0l), -e1p, z3, z1], axis=1),
        jnp.concatenate(
            [z3, z3, ne, -jnp.sum(ne * v0l, axis=1, keepdims=True)], axis=1
        ),
    ]
    coef = jnp.stack(planes, axis=0).astype(dtype)     # (3, t_rows, F)
    n_leaves = t_rows // prim_tile
    coef = coef.reshape(3, n_leaves, prim_tile, MT_FEATS).transpose(1, 0, 2, 3)
    coef = coef.reshape(3 * t_rows, MT_FEATS)
    # _trunc_split3, not the cast split: XLA folds f32->bf16->f32 round trips
    # when the table build is traced into the consumer jit (measured round-3
    # hazard, pallas_shade._trunc_split3 docstring).
    s0, s1, s2 = _trunc_split3(coef)
    ck = jnp.concatenate([s0, s0, s0, s1, s1, s2], axis=1)     # (4t, 6F)
    ck = jnp.pad(ck, [(0, 0), (0, MT_K - ck.shape[1])]).astype(jnp.bfloat16)
    g_pad = max(8, _cdiv(ng, 8) * 8)
    gcent = _pad_rows(
        jnp.concatenate([g, jnp.zeros((ng, 5), v0p.dtype)], axis=1), g_pad
    )
    return ck, gcent


def _mt_features(ox, oy, oz, dx, dy, dz, gcx, gcy, gcz):
    """(MT_KD, W) bf16 split-block feature stack for the MXU MT dot: built
    once per round, amortized over the supergroup's entered-leaf sweeps."""
    oxc, oyc, ozc = ox - gcx, oy - gcy, oz - gcz
    wx = oyc * dz - ozc * dy
    wy = ozc * dx - oxc * dz
    wz = oxc * dy - oyc * dx
    one = jnp.ones_like(ox)
    phi = jnp.concatenate(
        [dx, dy, dz, wx, wy, wz, oxc, oyc, ozc, one], axis=0
    )                                                   # (MT_FEATS, W)
    p0, p1, p2 = _bf16_split3(phi)
    zpad = jnp.zeros((MT_KD - 6 * MT_FEATS, ox.shape[1]), ox.dtype)
    return jnp.concatenate(
        [p0, p1, p2, p0, p1, p0, zpad], axis=0
    ).astype(jnp.bfloat16)


def _mt_ts_mxu(a, outq, prim_tile, t_min, t_hi, gate):
    """Accept chain over one leaf's (3P, W) MXU determinant planes plus the
    VPU-computed ``a``; same epsilons and comparison order as _mt_ts
    (shape.rs:161-198)."""
    p = prim_tile
    f = 1.0 / a
    u = f * outq[0:p]
    v = f * outq[p : 2 * p]
    t = f * outq[2 * p : 3 * p]
    ok = (
        (jnp.abs(a) >= 1e-8)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= t_min) & (t <= t_hi)
        & gate
    )
    return jnp.where(ok, t, _INF)


def _bvh_closest_kernel(o_ref, d_ref, tmin_ref, tup_ref, gaabb_ref, laabb_ref,
                        tri_ref, *refs,
                        g_rows, group, prim_tile, sub_w, stream, streamc,
                        rows_layout, lane_gate, mxu, counters=False):
    if mxu:
        coef_ref, gcent_ref, refs = refs[0], refs[1], refs[2:]
    t_ref, i_ref, n_ref, m_ref, *outs_scratch = refs
    if counters:
        # Diagnostic outputs (see triangle_closest_bvh(counters=True)):
        # per-subtile round and leaf-sweep totals, broadcast over the
        # subtile's lanes of two extra (1, W) int32 rows.
        rounds_ref, sweeps_ref, ge, *scratch = outs_scratch
        rounds_ref[:, :] = jnp.zeros(rounds_ref.shape, jnp.int32)
        sweeps_ref[:, :] = jnp.zeros(sweeps_ref.shape, jnp.int32)
    else:
        ge, *scratch = outs_scratch
    tabs = []
    if stream:
        gbuf, dma_sem, *scratch = scratch
        tabs.append((
            tri_ref, gbuf, dma_sem,
            0 if rows_layout else 1, group * prim_tile,
        ))
    if mxu and streamc:
        cbuf, csem = scratch
        tabs.append((coef_ref, cbuf, csem, 0, 3 * group * prim_tile))
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
        ge[:, sl] = _entries_from(gaabb_ref[:, :], ox, oy, oz, dx, dy, dz,
                                  t_min, t_up)

        def round_body(carry):
            rounds, pf, pbuf = carry
            bound = jnp.minimum(t_ref[0:1, sl], t_up)
            e = ge[:, sl]                                       # (G, W)
            e_live = jnp.where(e < bound, e, _INF)
            keys, idmask = _packed_group_key(e_live, g_rows)
            kmin = jnp.min(keys)                                # scalar
            gstar = kmin & idmask
            alive = (kmin & ~idmask) < _EXHAUSTED

            if tabs:
                # One DMA per supergroup (16 leaves = group*prim_tile
                # triangles, 16x the old per-cluster DMA amortization) with
                # double-buffered prefetch of the next-nearest entered group
                # so the transfer overlaps this group's sweep.
                cur, pf, pbuf = _stream_fetch(
                    tabs, gstar, keys, idmask, alive, pf, pbuf,
                )

            @pl.when(alive)
            def _():
                if counters:
                    rounds_ref[0:1, sl] = rounds_ref[0:1, sl] + 1
                if mxu:
                    # Round-invariant MXU feature stack: one recenter +
                    # cross + split per visited supergroup, amortized over
                    # its entered-leaf dots.
                    gcx = gcent_ref[pl.ds(gstar, 1), 0:1]
                    gcy = gcent_ref[pl.ds(gstar, 1), 1:2]
                    gcz = gcent_ref[pl.ds(gstar, 1), 2:3]
                    phi_ext = _mt_features(
                        ox, oy, oz, dx, dy, dz, gcx, gcy, gcz
                    )
                lb = laabb_ref[pl.ds(gstar * group, group), :]  # (group, 8)
                # 128-lane half gating: the subtile's lanes split into
                # vreg-width halves, each sweeping a leaf only if one of ITS
                # lanes enters it — the union a half never enters is skipped
                # (~35% of sweep lane-work on bounce waves,
                # examples/bvh_order_probe.py). Bitwise-identical per lane:
                # same leaves, same front-to-back order, disjoint lanes.
                # Every half-width value derives from aligned ref reads —
                # lane-offset slices of full-width values broadcast into
                # (P, W) planes are an invalid Mosaic layout. The triangle
                # block load/transpose is hoisted per leaf, shared by halves.
                halves = []
                for h in range(sub_w // lane_gate):
                    hsl = slice(j * sub_w + h * lane_gate,
                                j * sub_w + (h + 1) * lane_gate)
                    rh = (o_ref[0:1, hsl], o_ref[1:2, hsl], o_ref[2:3, hsl],
                          d_ref[0:1, hsl], d_ref[1:2, hsl], d_ref[2:3, hsl],
                          tmin_ref[0:1, hsl], tup_ref[0:1, hsl])
                    le = _entries_from(lb, *rh)
                    halves.append((hsl, rh, le))

                for k in range(group):                          # unrolled
                    gates = []
                    for hsl, rh, le in halves:
                        cur_best = t_ref[0:1, hsl]
                        t_hi = jnp.minimum(cur_best, rh[7])
                        gates.append((le[k:k + 1, :] < t_hi, cur_best, t_hi))
                    enter = jnp.any(gates[0][0])
                    for g, _, _ in gates[1:]:
                        enter = enter | jnp.any(g)

                    @pl.when(enter)
                    def _():
                        base = (gstar * group + k) * prim_tile
                        if stream and rows_layout:
                            cols = gbuf[cur][
                                k * prim_tile:(k + 1) * prim_tile, :
                            ]
                        elif stream:
                            cols = gbuf[cur][
                                :, k * prim_tile:(k + 1) * prim_tile
                            ].T
                        else:
                            cols = tri_ref[:, pl.ds(base, prim_tile)].T
                        mt = _mt_columns(cols, anyhit=False)
                        if mxu:
                            # One MXU dot gives the three MT determinant
                            # planes for the leaf; `cols`/`mt` stay for the
                            # winner's normal/material rows and the packed
                            # e2×e1 column that the VPU `a` dot reads.
                            if streamc:
                                cblk = cbuf[cur][
                                    k * 3 * prim_tile:(k + 1) * 3 * prim_tile,
                                    :,
                                ]
                            else:
                                cblk = coef_ref[
                                    pl.ds((gstar * group + k) * 3 * prim_tile,
                                          3 * prim_tile), :,
                                ]
                            if MT_KD < MT_K:
                                cblk = cblk[:, 0:MT_KD]
                            outq = jax.lax.dot_general(
                                cblk, phi_ext, (((1,), (0,)), ((), ())),
                                preferred_element_type=ox.dtype,
                            )
                            ce0 = cols[:, 13:14]
                            ce1 = cols[:, 14:15]
                            ce2 = cols[:, 15:16]

                        for (hsl, rh, le), (gate, cur_best, t_hi) in zip(
                            halves, gates
                        ):
                            @pl.when(jnp.any(gate))
                            def _():
                                if counters:
                                    sweeps_ref[0:1, hsl] = (
                                        sweeps_ref[0:1, hsl] + 1
                                    )
                                if mxu:
                                    a_p = (ce0 * rh[3] + ce1 * rh[4]
                                           + ce2 * rh[5])
                                    ts = _mt_ts_mxu(a_p, outq, prim_tile,
                                                    rh[6], t_hi, gate)
                                else:
                                    ts = _mt_ts(mt[:9], rh[0], rh[1], rh[2],
                                                rh[3], rh[4], rh[5], rh[6],
                                                t_hi, gate)
                                tmin_tile = jnp.min(ts, axis=0, keepdims=True)
                                argp = jnp.argmin(ts, axis=0).astype(
                                    jnp.int32
                                )[None, :]
                                better = tmin_tile < cur_best
                                row_iota = jax.lax.broadcasted_iota(
                                    jnp.int32, ts.shape, 0
                                )
                                mask_f = ((row_iota == argp) & better).astype(
                                    ts.dtype
                                )
                                nxyz, matid = mt[9], mt[10]
                                snx, sny, snz, sm = _select_winner(
                                    mask_f, (*nxyz, matid)
                                )
                                t_ref[0:1, hsl] = jnp.where(
                                    better, tmin_tile, cur_best
                                )
                                i_ref[0:1, hsl] = jnp.where(
                                    better, base + argp, i_ref[0:1, hsl]
                                )
                                nrm = jnp.concatenate([snx, sny, snz], axis=0)
                                n_ref[0:3, hsl] = jnp.where(
                                    better, nrm, n_ref[0:3, hsl]
                                )
                                m_ref[0:1, hsl] = jnp.where(
                                    better, sm,
                                    m_ref[0:1, hsl].astype(ts.dtype)
                                ).astype(jnp.int32)

                iota_g = jax.lax.broadcasted_iota(jnp.int32, e.shape, 0)
                ge[:, sl] = jnp.where(iota_g == gstar, _INF, e)

            return (jnp.where(alive, rounds + 1, jnp.int32(-1)), pf, pbuf)

        _, pf_end, pbuf_end = jax.lax.while_loop(
            lambda c: c[0] >= 0, round_body,
            (jnp.int32(0), jnp.int32(-1), jnp.int32(0)),
        )
        if tabs:
            # Drain the last outstanding prefetch (wasted by termination).
            @pl.when(pf_end >= 0)
            def _():
                _stream_wait(tabs, pf_end, pbuf_end)


def _bvh_anyhit_kernel(o_ref, d_ref, tmin_ref, tmax_ref, gaabb_ref, laabb_ref,
                       tri_ref, *refs,
                       g_rows, group, prim_tile, sub_w, stream, streamc,
                       rows_layout, lane_gate, mxu):
    # In mxu mode tri_ref IS the coefficient table (the occlusion test needs
    # no other per-triangle payload beyond the packed e2×e1 column in the
    # small ne table feeding the VPU `a` dot); `stream` then governs the ne
    # table's transport and streamc the coefficient table's.
    if mxu:
        net_ref, gcent_ref, refs = refs[0], refs[1], refs[2:]
    occ_ref, ge, *scratch = refs
    tabs = []
    if stream:
        src = net_ref if mxu else tri_ref
        gbuf, dma_sem, *scratch = scratch
        tabs.append((
            src, gbuf, dma_sem,
            0 if rows_layout else 1, group * prim_tile,
        ))
    if mxu and streamc:
        cbuf, csem = scratch
        tabs.append((tri_ref, cbuf, csem, 0, 3 * group * prim_tile))
    occ_ref[:, :] = jnp.zeros(occ_ref.shape, jnp.int32)

    width = o_ref.shape[1]
    for j in range(width // sub_w):
        sl = slice(j * sub_w, (j + 1) * sub_w)
        ox, oy, oz = o_ref[0:1, sl], o_ref[1:2, sl], o_ref[2:3, sl]
        dx, dy, dz = d_ref[0:1, sl], d_ref[1:2, sl], d_ref[2:3, sl]
        t_min = tmin_ref[0:1, sl]
        t_max = tmax_ref[0:1, sl]
        ge[:, sl] = _entries_from(gaabb_ref[:, :], ox, oy, oz, dx, dy, dz,
                                  t_min, t_max)

        def round_body(carry):
            rounds, pf, pbuf = carry
            live = (occ_ref[0:1, sl] == 0)
            e = ge[:, sl]
            e_live = jnp.where(live & (e < t_max), e, _INF)
            keys, idmask = _packed_group_key(e_live, g_rows)
            kmin = jnp.min(keys)
            gstar = kmin & idmask
            alive = (kmin & ~idmask) < _EXHAUSTED

            if tabs:
                cur, pf, pbuf = _stream_fetch(
                    tabs, gstar, keys, idmask, alive, pf, pbuf,
                )

            @pl.when(alive)
            def _():
                if mxu:
                    gcx = gcent_ref[pl.ds(gstar, 1), 0:1]
                    gcy = gcent_ref[pl.ds(gstar, 1), 1:2]
                    gcz = gcent_ref[pl.ds(gstar, 1), 2:3]
                    phi_ext = _mt_features(
                        ox, oy, oz, dx, dy, dz, gcx, gcy, gcz
                    )
                lb = laabb_ref[pl.ds(gstar * group, group), :]
                # 128-lane half gating (see the closest kernel; same aligned
                # ref-read discipline — lane-offset slices don't lower).
                halves = []
                for h in range(sub_w // lane_gate):
                    hsl = slice(j * sub_w + h * lane_gate,
                                j * sub_w + (h + 1) * lane_gate)
                    rh = (o_ref[0:1, hsl], o_ref[1:2, hsl], o_ref[2:3, hsl],
                          d_ref[0:1, hsl], d_ref[1:2, hsl], d_ref[2:3, hsl],
                          tmin_ref[0:1, hsl], tmax_ref[0:1, hsl])
                    le = _entries_from(lb, *rh)
                    halves.append((hsl, rh, le))

                for k in range(group):                          # unrolled
                    gates = []
                    for hsl, rh, le in halves:
                        gates.append(
                            (occ_ref[0:1, hsl] == 0) & (le[k:k + 1, :] < rh[7])
                        )
                    enter = jnp.any(gates[0])
                    for g in gates[1:]:
                        enter = enter | jnp.any(g)

                    @pl.when(enter)
                    def _():
                        base = (gstar * group + k) * prim_tile
                        if mxu:
                            if streamc:
                                cblk = cbuf[cur][
                                    k * 3 * prim_tile:(k + 1) * 3 * prim_tile,
                                    :,
                                ]
                            else:
                                cblk = tri_ref[
                                    pl.ds((gstar * group + k) * 3 * prim_tile,
                                          3 * prim_tile), :,
                                ]
                            if MT_KD < MT_K:
                                cblk = cblk[:, 0:MT_KD]
                            outq = jax.lax.dot_general(
                                cblk, phi_ext, (((1,), (0,)), ((), ())),
                                preferred_element_type=ox.dtype,
                            )
                            if stream:
                                ncols = gbuf[cur][
                                    :, k * prim_tile:(k + 1) * prim_tile
                                ].T
                            else:
                                ncols = net_ref[:, pl.ds(base, prim_tile)].T
                            ce0 = ncols[:, 0:1]
                            ce1 = ncols[:, 1:2]
                            ce2 = ncols[:, 2:3]
                            mt = None
                        elif stream and rows_layout:
                            cols = gbuf[cur][
                                k * prim_tile:(k + 1) * prim_tile, :
                            ]
                            mt = _mt_columns(cols, anyhit=True)
                        elif stream:
                            cols = gbuf[cur][
                                :, k * prim_tile:(k + 1) * prim_tile
                            ].T
                            mt = _mt_columns(cols, anyhit=True)
                        else:
                            cols = tri_ref[:, pl.ds(base, prim_tile)].T
                            mt = _mt_columns(cols, anyhit=True)

                        for (hsl, rh, le), gate in zip(halves, gates):
                            @pl.when(jnp.any(gate))
                            def _():
                                if mxu:
                                    a_p = (ce0 * rh[3] + ce1 * rh[4]
                                           + ce2 * rh[5])
                                    ts = _mt_ts_mxu(a_p, outq, prim_tile,
                                                    rh[6], rh[7], gate)
                                else:
                                    ts = _mt_ts(mt[:9], rh[0], rh[1], rh[2],
                                                rh[3], rh[4], rh[5], rh[6],
                                                rh[7], gate)
                                hit = jnp.any(ts < _INF, axis=0, keepdims=True)
                                occ_ref[0:1, hsl] = (
                                    occ_ref[0:1, hsl] | hit.astype(jnp.int32)
                                )

                iota_g = jax.lax.broadcasted_iota(jnp.int32, e.shape, 0)
                ge[:, sl] = jnp.where(iota_g == gstar, _INF, e)

            return (jnp.where(alive, rounds + 1, jnp.int32(-1)), pf, pbuf)

        _, pf_end, pbuf_end = jax.lax.while_loop(
            lambda c: c[0] >= 0, round_body,
            (jnp.int32(0), jnp.int32(-1), jnp.int32(0)),
        )
        if tabs:
            @pl.when(pf_end >= 0)
            def _():
                _stream_wait(tabs, pf_end, pbuf_end)


def _prep(o, d, t_min, t_max, v0, e1, e2, tri_normal, tri_mat, dtype,
          prim_tile, group, ray_tile, anyhit, layout="cols"):
    n = o.shape[0]
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, dtype), (n,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, dtype), (n,))
    c_real = _cdiv(v0.shape[0], prim_tile)
    n_groups = _cdiv(c_real, group)
    # Table padded to a whole number of groups so every unrolled leaf slice
    # of a *visited* group is in bounds (padding leaves are all-zero ->
    # rejected by |a| < 1e-8; padding groups carry inverted boxes and are
    # never visited at all).
    t_rows = n_groups * group * prim_tile
    packer = _pack_table_rows if layout == "rows" else _pack_table
    tri = packer(v0, e1, e2, tri_normal, tri_mat, t_rows, dtype, anyhit)
    laabb, _ = _derived_aabbs(v0, e1, e2, t_rows, prim_tile, dtype)
    laabb, gaabb, n_groups, g_pad = _group_aabbs(
        laabb, t_rows // prim_tile, group, dtype
    )

    n_pad = _cdiv(n, ray_tile) * ray_tile
    o_t = _pad_rows(o, n_pad).T
    d_t = _pad_rows(d, n_pad, fill=1.0).T
    tmin_r = _pad_rows(t_min_b[:, None], n_pad, fill=_INF).T
    tup_r = _pad_rows(t_max_b[:, None], n_pad, fill=-_INF).T
    return tri, laabb, gaabb, g_pad, o_t, d_t, tmin_r, tup_r, n_pad


# Above this table size the triangle table streams from HBM (one DMA per
# supergroup visit) instead of living VMEM-resident for the whole kernel —
# the traversal itself is identical. ~6 MB leaves room for the entry scratch,
# AABBs and the compiler's own buffers inside the 16 MB VMEM.
VMEM_TABLE_BUDGET = int(os.environ.get("PT_BVH_VMEM_BUDGET", str(6 * 2**20)))


def _pack_table_rows(v0, e1, e2, tri_normal, tri_mat, rows, dtype, anyhit):
    """(rows, 16) triangle table, triangles on the SUBLANE axis: the rows
    layout for HBM streaming — leaf slices need no in-kernel transpose.
    Never held VMEM-resident whole (lanes would pad 16 -> 128, 8x waste)."""
    if anyhit:
        cols = [v0, e1, e2]
    else:
        cols = [v0, e1, e2, tri_normal, tri_mat.astype(dtype)[:, None]]
    tab = _pad_rows(jnp.concatenate(cols, axis=1), rows)    # (rows, 9|13)
    return jnp.pad(tab, [(0, 0), (0, _TAB_ROWS - tab.shape[1])])


def _resolve_stream(stream, t_rows, dtype):
    if stream is not None:
        return stream
    return _TAB_ROWS * t_rows * jnp.dtype(dtype).itemsize > VMEM_TABLE_BUDGET


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "prim_tile", "group", "sub_w", "ray_tile", "stream",
        "layout", "counters", "lane_gate", "mxu", "mt_stream",
    ),
)
def triangle_closest_bvh(o, d, t_min, t_max, v0, e1, e2, tri_normal, tri_mat,
                         interpret=False, prim_tile=PRIM_TILE, group=GROUP,
                         sub_w=SUB_W, ray_tile=RAY_TILE, stream=None,
                         layout="cols", counters=False, lane_gate=0,
                         mxu=False, mt_stream=None):
    """Closest triangle hit via the two-level union-sweep traversal.

    Same return contract as pallas_intersect.triangle_closest:
    ``(t (N,), global row idx (N,), outward normal (N,3), mat (N,))``.
    Callers should pre-sort the wave spatially (ops/intersect.py does) so
    subtiles stay union-coherent; results are exact in any order.

    ``stream=None`` auto-selects: tables over VMEM_TABLE_BUDGET stream from
    HBM one supergroup per visit (unbounded scene size), smaller tables stay
    VMEM-resident for the whole dispatch.

    ``mxu=True`` runs the leaf sweeps as MXU determinant dots (see the MT_K
    comment at the top): hit decisions agree with the VPU form except on
    documented knife-edge lanes (~1e-7 of pairs); lane_gate is ignored (the
    dot spans the full subtile).
    """
    n = o.shape[0]
    dtype = o.dtype
    tri, laabb, gaabb, g_pad, o_t, d_t, tmin_r, tup_r, n_pad = _prep(
        o, d, t_min, t_max, v0, e1, e2, tri_normal, tri_mat, dtype,
        prim_tile, group, ray_tile, anyhit=False, layout=layout,
    )
    if layout == "rows":
        if stream is False:
            raise ValueError("layout='rows' is HBM-streamed only")
        stream = True
    else:
        stream = _resolve_stream(stream, tri.shape[1], dtype)
    streamc = False
    if mxu:
        t_rows = tri.shape[0] if layout == "rows" else tri.shape[1]
        coef, gcent = _mt_coeff_table(
            v0, e1, e2, t_rows, prim_tile, group, dtype
        )
        gcent = _pad_rows(gcent, g_pad)
        streamc = (
            coef.shape[0] * MT_K * 2 > VMEM_TABLE_BUDGET
            if mt_stream is None else mt_stream
        )
        # Rows 13:16 of the packed table are padding — carry e2×e1 there so
        # the kernel's VPU `a` dot rides the table that already moves for
        # the winner's normal/material rows (zero extra transport).
        ce = _pad_rows(
            jnp.cross(e2.astype(dtype), e1.astype(dtype)), t_rows
        )
        tri = (
            tri.at[:, 13:16].set(ce)
            if layout == "rows" else tri.at[13:16, :].set(ce.T)
        )
    tmin_r, tup_r, gaabb, laabb, tri = _lift_vma(
        (o_t, d_t), tmin_r, tup_r, gaabb, laabb, tri
    )
    if mxu:
        coef, gcent = _lift_vma((o_t, d_t), coef, gcent)
    # Closest-hit padding lanes: t_max = +inf would keep them live forever;
    # give them an inverted [inf, -inf] range instead (tup fill above).

    grid = (n_pad // ray_tile,)

    def spec(k):
        return pl.BlockSpec((k, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    tri_spec = pl.BlockSpec(
        memory_space=pltpu.ANY if stream else pltpu.VMEM
    )
    in_specs = [
        spec(3), spec(3), spec(1), spec(1),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # gaabb (G, 8), resident
        pl.BlockSpec(memory_space=pltpu.VMEM),   # laabb (C, 8), resident
        tri_spec,                                # tri (16, T)
    ]
    inputs = [o_t, d_t, tmin_r, tup_r, gaabb, laabb, tri]
    if mxu:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY if streamc else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gcent (G, 8)
        ]
        inputs += [coef, gcent]
    scratch = [pltpu.VMEM((g_pad, ray_tile), dtype)]
    if stream:
        gshape = (
            (2, group * prim_tile, _TAB_ROWS)
            if layout == "rows"
            else (2, _TAB_ROWS, group * prim_tile)
        )
        scratch += [
            pltpu.VMEM(gshape, dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if streamc:
        scratch += [
            pltpu.VMEM((2, 3 * group * prim_tile, MT_K), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    out_specs = [spec(1), spec(1), spec(3), spec(1)]
    out_shape = [
        _out_struct((1, n_pad), dtype, o, d),
        _out_struct((1, n_pad), jnp.int32, o, d),
        _out_struct((3, n_pad), dtype, o, d),
        _out_struct((1, n_pad), jnp.int32, o, d),
    ]
    if counters:
        out_specs += [spec(1), spec(1)]
        out_shape += [
            _out_struct((1, n_pad), jnp.int32, o, d),
            _out_struct((1, n_pad), jnp.int32, o, d),
        ]
    res = pl.pallas_call(
        functools.partial(_bvh_closest_kernel, g_rows=g_pad, group=group,
                          prim_tile=prim_tile, sub_w=sub_w, stream=stream,
                          streamc=streamc, rows_layout=layout == "rows",
                          lane_gate=(sub_w if mxu
                                     else min(lane_gate or sub_w, sub_w)),
                          mxu=mxu, counters=counters),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    t, i, nrm, m = res[:4]
    if counters:
        # Per-subtile diagnostics, one value per sub_w span of the padded
        # wave: (rounds, half-gated leaf sweeps — the sum of the subtile's
        # per-lane_gate-half sweep counts, i.e. lane-work units of
        # lane_gate x prim_tile MT tests).
        lg = min(lane_gate or sub_w, sub_w)
        sw = res[5][0, ::lg].reshape(-1, sub_w // lg).sum(axis=1)
        return (t[0, :n], i[0, :n], nrm[:, :n].T, m[0, :n],
                res[4][0, ::sub_w], sw)
    return t[0, :n], i[0, :n], nrm[:, :n].T, m[0, :n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "prim_tile", "group", "sub_w", "ray_tile", "stream",
        "layout", "lane_gate", "mxu", "mt_stream",
    ),
)
def triangle_anyhit_bvh(o, d, t_min, t_max, v0, e1, e2, interpret=False,
                        prim_tile=PRIM_TILE, group=GROUP, sub_w=SUB_W,
                        ray_tile=RAY_TILE, stream=None, layout="cols",
                        lane_gate=0, mxu=False, mt_stream=None):
    """Occlusion against the triangle soup, two-level union-sweep traversal.
    Returns a bool (N,) mask; near-first group order settles lanes fastest.
    ``stream`` as in :func:`triangle_closest_bvh`. With ``mxu=True`` the
    coefficient table IS the only per-triangle table (occlusion needs no
    winner payload), riding the tri operand slot."""
    n = o.shape[0]
    dtype = o.dtype
    tri, laabb, gaabb, g_pad, o_t, d_t, tmin_r, tmax_r, n_pad = _prep(
        o, d, t_min, t_max, v0, e1, e2, None, None, dtype,
        prim_tile, group, ray_tile, anyhit=True, layout=layout,
    )
    if layout == "rows":
        if stream is False:
            raise ValueError("layout='rows' is HBM-streamed only")
        if mxu:
            raise ValueError("layout='rows' and mxu are mutually exclusive")
        stream = True
    else:
        stream = _resolve_stream(stream, tri.shape[1], dtype)
    streamc = False
    net = None
    if mxu:
        t_rows = tri.shape[1]
        coef, gcent = _mt_coeff_table(
            v0, e1, e2, t_rows, prim_tile, group, dtype
        )
        gcent = _pad_rows(gcent, g_pad)
        streamc = (
            coef.shape[0] * MT_K * 2 > VMEM_TABLE_BUDGET
            if mt_stream is None else mt_stream
        )
        tri = coef           # the determinant table replaces the MT table
        # Small ne table (8, T), rows 0:3 = e2×e1 for the VPU `a` dot;
        # `stream` now governs ITS transport (the 16-row rule is the
        # conservative stand-in so the wrapper knob keeps meaning "does the
        # per-triangle f32 table fit VMEM").
        ce = _pad_rows(jnp.cross(e2.astype(dtype), e1.astype(dtype)), t_rows)
        net = _pad_rows(ce.T, 8)
    tmin_r, tmax_r, gaabb, laabb, tri = _lift_vma(
        (o_t, d_t), tmin_r, tmax_r, gaabb, laabb, tri
    )
    if mxu:
        net, gcent = _lift_vma((o_t, d_t), net, gcent)

    grid = (n_pad // ray_tile,)

    def spec(k):
        return pl.BlockSpec((k, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    tri_spec = pl.BlockSpec(
        memory_space=pltpu.ANY if (streamc if mxu else stream) else pltpu.VMEM
    )
    in_specs = [
        spec(3), spec(3), spec(1), spec(1),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        tri_spec,
    ]
    inputs = [o_t, d_t, tmin_r, tmax_r, gaabb, laabb, tri]
    if mxu:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY if stream else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gcent
        ]
        inputs += [net, gcent]
    scratch = [pltpu.VMEM((g_pad, ray_tile), dtype)]
    if stream:
        gshape = (
            (2, group * prim_tile, _TAB_ROWS)
            if layout == "rows"
            else (2, 8 if mxu else _TAB_ROWS, group * prim_tile)
        )
        scratch += [
            pltpu.VMEM(gshape, dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if streamc:
        scratch += [
            pltpu.VMEM((2, 3 * group * prim_tile, MT_K), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    occ = pl.pallas_call(
        functools.partial(_bvh_anyhit_kernel, g_rows=g_pad, group=group,
                          prim_tile=prim_tile, sub_w=sub_w, stream=stream,
                          streamc=streamc, rows_layout=layout == "rows",
                          lane_gate=(sub_w if mxu
                                     else min(lane_gate or sub_w, sub_w)),
                          mxu=mxu),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec(1),
        out_shape=_out_struct((1, n_pad), jnp.int32, o, d),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    return occ[0, :n] != 0
