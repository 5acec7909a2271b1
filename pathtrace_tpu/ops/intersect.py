"""Batched ray–scene intersection.

The reference intersects by a linear scan of boxed trait objects keeping the
closest hit (world.rs:270-290). Here a whole wave of rays is tested against
tiles of the SoA primitive arrays with one broadcasted Möller–Trumbore /
half-b-quadratic expression per tile, reduced by a running argmin inside
``lax.scan`` — bounded VMEM footprint at any scene size, and the same API later
swaps in the Pallas/MXU kernels and the LBVH without touching callers.

Epsilon conventions are the reference's exactly: 1e-8 parallel reject
(shape.rs:168), closed ``[t_min, t_max]`` range tests (shape.rs:77-79, 190),
inclusive barycentric bounds ``0≤u≤1``, ``v≥0``, ``u+v≤1`` (shape.rs:176-184).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import struct

from ..models.scene import Scene
from ..utils import vec

_INF = jnp.inf


@struct.dataclass
class Hit:
    """SoA hit record for a wave of rays: the reference's ``Option<HitRecord>``
    (base.rs:5-34) with the miss encoded as ``prim == -1`` / ``t == inf``."""

    t: jnp.ndarray           # (N,)
    prim: jnp.ndarray        # (N,) int32 global prim id, -1 = miss
    point: jnp.ndarray       # (N, 3)
    normal: jnp.ndarray      # (N, 3) face-forwarded shading normal
    front_face: jnp.ndarray  # (N,) bool
    mat: jnp.ndarray         # (N,) int32 material id (undefined on miss)

    @property
    def valid(self) -> jnp.ndarray:
        return self.prim >= 0


def _round_tile(n: int, tile: int) -> int:
    return max(tile, ((n + tile - 1) // tile) * tile)


def _pad_rows(a: jnp.ndarray, rows: int, fill: float = 0.0) -> jnp.ndarray:
    pad = rows - a.shape[0]
    if pad == 0:
        return a
    cfg = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, cfg, constant_values=fill)


def triangle_hit_ts(v0, e1, e2, o, d, t_min, t_max):
    """Möller–Trumbore over a full (N rays × T tris) broadcast
    (shape.rs:161-198). Returns hit distances ``(N, T)`` with inf for miss."""
    h = vec.cross(d[:, None, :], e2[None, :, :])            # (N,T,3)
    a = vec.dot(e1[None, :, :], h)                          # (N,T)
    s = o[:, None, :] - v0[None, :, :]
    f = 1.0 / a
    u = f * vec.dot(s, h)
    q = vec.cross(s, e1[None, :, :])
    v = f * vec.dot(d[:, None, :], q)
    t = f * vec.dot(e2[None, :, :], q)
    ok = (
        (jnp.abs(a) >= 1e-8)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= t_min) & (t <= t_max)
    )
    return jnp.where(ok, t, _INF)


def sphere_hit_ts(center, radius, o, d, t_min, t_max):
    """Half-b quadratic, nearest root in range else far root (shape.rs:53-89).
    Returns hit distances ``(N, S)`` with inf for miss."""
    oc = o[:, None, :] - center[None, :, :]                 # (N,S,3)
    a = vec.dot(d, d)[:, None]                              # (N,1)
    half_b = vec.dot(oc, d[:, None, :])                     # (N,S)
    c = vec.dot(oc, oc) - (radius * radius)[None, :]
    disc = half_b * half_b - a * c
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    root1 = (-half_b - sqrtd) / a
    root2 = (-half_b + sqrtd) / a
    live = (disc >= 0.0) & (radius > 0.0)[None, :]  # radius 0 marks padding rows
    ok1 = live & (root1 >= t_min) & (root1 <= t_max)
    ok2 = live & (root2 >= t_min) & (root2 <= t_max)
    return jnp.where(ok1, root1, jnp.where(ok2, root2, _INF))


def sphere_hit_ts_mxu(center, radius, o, d, t_min, t_max):
    """MXU formulation of the half-b quadratic: the ray⊗sphere coupling terms
    ``d·c`` and ``o·c`` are (N,3)@(3,S) matmuls, so no (N,S,3) temporaries ever
    materialize — the elementwise tail runs on (N,S) planes only. Same math
    and range semantics as :func:`sphere_hit_ts` (shape.rs:53-89)."""
    dc = jnp.dot(d, center.T, preferred_element_type=o.dtype,
                 precision=jax.lax.Precision.HIGHEST)            # (N,S)
    oc = jnp.dot(o, center.T, preferred_element_type=o.dtype,
                 precision=jax.lax.Precision.HIGHEST)            # (N,S)
    od = vec.dot(o, d)[:, None]
    oo = vec.dot(o, o)[:, None]
    cc = vec.dot(center, center)[None, :]
    a = vec.dot(d, d)[:, None]

    half_b = od - dc
    c = oo - 2.0 * oc + cc - (radius * radius)[None, :]
    disc = half_b * half_b - a * c
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    root1 = (-half_b - sqrtd) / a
    root2 = (-half_b + sqrtd) / a
    live = (disc >= 0.0) & (radius > 0.0)[None, :]
    ok1 = live & (root1 >= t_min) & (root1 <= t_max)
    ok2 = live & (root2 >= t_min) & (root2 <= t_max)
    return jnp.where(ok1, root1, jnp.where(ok2, root2, _INF))


def triangle_hit_ts_mxu(v0, e1, e2, o, d, t_min, t_max):
    """MXU formulation of the triangle test via Plücker side-products.

    For directed edges (v0→v1, v1→v2, v2→v0) with Plücker coords (e, m=a×b),
    the signed side test against ray (d, q=o×d) is ``w = d·m + q·e`` — linear
    in per-triangle constants ⊗ per-ray features, i.e. one (N,6)@(6,3T)
    matmul. A hit needs all three w of one sign; t comes from the plane
    equation. Accepts the same hits as Möller–Trumbore (shape.rs:161-198)
    including its |a|<1e-8 parallel reject (a ≡ -n·d)."""
    dtype = o.dtype
    va = v0
    vb = v0 + e1
    vc = v0 + e2
    n = vec.cross(e1, e2)                       # unnormalized normal (T,3)
    npl = vec.dot(n, v0)                        # plane offset (T,)

    # Edge Plücker moments m = a×b for each directed edge.
    m_ab = vec.cross(va, vb)
    m_bc = vec.cross(vb, vc)
    m_ca = vec.cross(vc, va)
    e_ab = vb - va
    e_bc = vc - vb
    e_ca = va - vc

    # Triangle feature matrix (6, 3T+2T): side tests + [n·o term, n·d term]
    feats = jnp.concatenate(
        [
            jnp.concatenate([m_ab, e_ab], axis=1),   # (T,6)
            jnp.concatenate([m_bc, e_bc], axis=1),
            jnp.concatenate([m_ca, e_ca], axis=1),
        ],
        axis=0,
    )                                                # (3T, 6)

    q = vec.cross(o, d)                              # (N,3)
    ray_feats = jnp.concatenate([d, q], axis=1)      # (N,6)
    w = jnp.dot(ray_feats, feats.T, preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)  # (N,3T)
    t_count = v0.shape[0]
    w0 = w[:, :t_count]
    w1 = w[:, t_count : 2 * t_count]
    w2 = w[:, 2 * t_count :]

    n_dot_d = jnp.dot(d, n.T, preferred_element_type=dtype,
                      precision=jax.lax.Precision.HIGHEST)       # (N,T)
    n_dot_o = jnp.dot(o, n.T, preferred_element_type=dtype,
                      precision=jax.lax.Precision.HIGHEST)       # (N,T)
    t = (npl[None, :] - n_dot_o) / n_dot_d

    eps = jnp.asarray(0.0, dtype)
    same_sign = ((w0 >= eps) & (w1 >= eps) & (w2 >= eps)) | (
        (w0 <= -eps) & (w1 <= -eps) & (w2 <= -eps)
    )
    ok = (
        same_sign
        & (jnp.abs(n_dot_d) >= 1e-8)   # MT parallel reject: a == -n·d
        & (t >= t_min)
        & (t <= t_max)
    )
    return jnp.where(ok, t, _INF)


def _closest_over_tiles(prim_arrays, hit_fn, o, d, t_min, t_max, tile, base_id):
    """Scan primitive tiles, carrying the running (closest t, prim id)."""
    n_rows = prim_arrays[0].shape[0]
    rows = _round_tile(n_rows, tile)
    tiles = [ _pad_rows(a, rows).reshape((rows // tile, tile) + a.shape[1:])
              for a in prim_arrays ]
    n = o.shape[0]

    def body(carry, xs):
        best_t, best_p = carry
        idx, arrs = xs
        ts = hit_fn(*arrs, o, d, t_min, jnp.minimum(t_max, best_t[:, None]))  # (N, tile)
        tmin_tile = jnp.min(ts, axis=1)
        arg = jnp.argmin(ts, axis=1).astype(jnp.int32)
        better = tmin_tile < best_t
        best_p = jnp.where(better, base_id + idx * tile + arg, best_p)
        best_t = jnp.where(better, tmin_tile, best_t)
        return (best_t, best_p), None

    init = (jnp.full((n,), _INF, o.dtype), jnp.full((n,), -1, jnp.int32))
    n_tiles = rows // tile
    if n_tiles == 1:
        (best_t, best_p), _ = body(init, (jnp.int32(0), [a[0] for a in tiles]))
        return best_t, best_p
    (best_t, best_p), _ = jax.lax.scan(
        body, init, (jnp.arange(n_tiles, dtype=jnp.int32), tiles)
    )
    return best_t, best_p


# Process-wide override for the "auto" method (None = platform default).
# Set via set_default_method("binned") before tracing to route big-mesh
# traversal through the per-ray binned kernels everywhere (pool included).
_METHOD_OVERRIDE: str | None = None


def set_default_method(method: str | None) -> None:
    """Override what ``method="auto"`` resolves to (None restores the
    platform default).

    The override is read at *trace* time and jit cache keys don't include
    it, so changing it after the renderers have been traced would silently
    keep the old method; the caches are dropped here so the next call
    re-traces with the new default."""
    global _METHOD_OVERRIDE
    if method != _METHOD_OVERRIDE:
        _METHOD_OVERRIDE = method
        jax.clear_caches()


def default_method() -> str:
    """Pallas kernels on real accelerators; jnp broadcast on CPU (where the
    Pallas interpreter would be the slow path)."""
    if _METHOD_OVERRIDE is not None:
        return _METHOD_OVERRIDE
    return "pallas" if jax.default_backend() != "cpu" else "bruteforce"


# "auto"'s winner for big-triangle scenes, ANY wave coherence: the two-level
# BVH union sweep. Round-4 in-pool measurements on the 70k-tri scene (SAH
# build + entered-group sort key, identical checksums): bvh 4.22 Mrays/s vs
# pallas flat 3.44 vs binned 0.77; round 2's binned-wins-on-incoherent-waves
# result predates the hierarchy and no longer holds. Measured, not
# theoretical — update with measurements, not intuition.
BIG_TRI_METHOD = "bvh"


def resolve_auto(method: str, num_tris: int, coherent: bool | None) -> str:
    """Resolve ``method="auto"`` given the wave's coherence hint.

    Scenes with at least RAY_SORT_MIN_TRIS triangles route to the BVH union
    sweep for every wave class (primary, bounce, and the pool's mixed waves
    all measured faster there); small scenes keep the platform default whose
    one-tile sweeps have no per-visit constants to amortize. An explicit
    :func:`set_default_method` override always wins."""
    if method != "auto":
        return method
    resolved = default_method()
    if (
        _METHOD_OVERRIDE is None
        and num_tris >= RAY_SORT_MIN_TRIS
        and resolved in ("pallas", "pallas_interpret")
    ):
        suffix = "_interpret" if resolved == "pallas_interpret" else ""
        return BIG_TRI_METHOD + suffix
    return resolved


# Sort rays before tracing once the triangle soup is at least this large:
# the per-tile cluster culling in the Pallas kernels only skips work when the
# 512 rays of a tile are spatially coherent, which bounce waves are not.
RAY_SORT_MIN_TRIS = 4096


def _lift_tree(want, *trees):
    """Lift every floating/int array leaf of the given pytrees to the
    varying-mesh-axes set ``want`` (jax.lax.pcast to='varying'): shard_map's
    varying-axes check requires kernel operands to agree, and scene tables
    are replicated while rays vary. Type-level only; zero cost."""
    def lift(a):
        missing = tuple(want - jax.typeof(a).vma)
        return jax.lax.pcast(a, missing, to="varying") if missing else a

    out = tuple(jax.tree_util.tree_map(lift, t) for t in trees)
    return out if len(out) > 1 else out[0]


def _ray_sort_key(scene: Scene, o, d, t_min, t_max):
    """Spatial+directional bin key: 3-bit direction octant above a block code
    of the origin within the scene bounds. Sorting a wave by this key makes
    kernel ray-tiles coherent so cluster AABB culling fires on bounce rays.

    The top bit marks rays whose [t_min, t_max] segment misses the global
    scene AABB entirely: they sort to the end, concentrating into tiles whose
    cluster prepass is all-inf — those tiles' traversal loops exit on the
    first iteration instead of scanning every cluster for nothing."""
    lo = jnp.minimum(
        jnp.min(scene.tri_cluster_min, axis=0), jnp.min(scene.sph_cluster_min, axis=0)
    )
    hi = jnp.maximum(
        jnp.max(scene.tri_cluster_max, axis=0), jnp.max(scene.sph_cluster_max, axis=0)
    )
    span = jnp.maximum(hi - lo, 1e-6)
    p = jnp.clip((o - lo) / span, 0.0, 1.0)

    # Block order (x-major 7-bit grid) rather than a true morton interleave —
    # the key only needs to group nearby rays into the same kernel ray tile.
    mx = (p[:, 0] * 127).astype(jnp.uint32)
    my = (p[:, 1] * 127).astype(jnp.uint32)
    mz = (p[:, 2] * 127).astype(jnp.uint32)
    morton = (mx << 14) | (my << 7) | mz  # block order (x-major) — coherent enough
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32) * 4
        + (d[:, 1] >= 0).astype(jnp.uint32) * 2
        + (d[:, 2] >= 0).astype(jnp.uint32)
    )
    # Conservative slab test of the global AABB over [t_min, t_max].
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    a = (lo[None, :] - o) * inv
    b = (hi[None, :] - o) * inv
    tnear = jnp.maximum(jnp.max(jnp.minimum(a, b), axis=1), t_min)
    tfar = jnp.minimum(jnp.min(jnp.maximum(a, b), axis=1), t_max)
    miss = (tnear > tfar).astype(jnp.uint32)

    # Primary key: the ray's two nearest *entered* supergroups (8 consecutive
    # 256-row triangle clusters ≈ one BVH supergroup). Grouping lanes by the
    # regions they actually traverse beats any position/direction proxy —
    # measured 1.6x (bounce) to 4.6x (primary) fewer union-sweep leaf visits
    # on the 70k knot than the octant|origin key alone, which stays as the
    # tie-break below. Rays that enter nothing get id 0x3FFF and sort last
    # within their miss class.
    cmn, cmx = scene.tri_cluster_min, scene.tri_cluster_max
    nc = cmn.shape[0]
    gblk = 8
    ng = -(-nc // gblk)
    pad = ng * gblk - nc
    if pad:
        cmn = jnp.concatenate([cmn, jnp.full((pad, 3), jnp.inf, cmn.dtype)])
        cmx = jnp.concatenate([cmx, jnp.full((pad, 3), -jnp.inf, cmx.dtype)])
    gmn = cmn.reshape(ng, gblk, 3).min(axis=1)
    gmx = cmx.reshape(ng, gblk, 3).max(axis=1)
    ga = (gmn[:, None, :] - o[None]) * inv[None]       # (G, N, 3)
    gb = (gmx[:, None, :] - o[None]) * inv[None]
    gtn = jnp.maximum(jnp.minimum(ga, gb).max(axis=2), t_min[None])
    gtf = jnp.minimum(jnp.maximum(ga, gb).min(axis=2), t_max[None])
    gvalid = (gmn[:, 0] <= gmx[:, 0])[:, None]
    ge = jnp.where((gtn <= gtf) & gvalid, gtn, jnp.inf)  # (G, N)
    sentinel = jnp.uint32(0x3FFF)
    iota = jax.lax.broadcasted_iota(jnp.int32, ge.shape, 0)
    g1 = jnp.argmin(ge, axis=0).astype(jnp.int32)
    e1v = jnp.min(ge, axis=0)
    ge2 = jnp.where(iota == g1[None, :], jnp.inf, ge)
    g2 = jnp.argmin(ge2, axis=0).astype(jnp.int32)
    e2v = jnp.min(ge2, axis=0)
    g1k = jnp.where(jnp.isfinite(e1v), jnp.minimum(g1, 0x3FFF).astype(jnp.uint32), sentinel)
    g2k = jnp.where(jnp.isfinite(e2v), jnp.minimum(g2, 0x3FFF).astype(jnp.uint32), sentinel)
    key_hi = (miss << 30) | (g1k << 15) | g2k
    return key_hi, (octant << 21) | morton


def _sort_rays_by_key(key, o, d, t_min_b, t_max_b):
    """Reorder a ray wave by ``key`` (a tuple of major-to-minor uint32 keys)
    with one multi-payload ``lax.sort`` (measured ~13x cheaper than argsort +
    gathered reorders at production wave sizes). Returns the sorted wave plus
    each sorted lane's original index, which :func:`_unsort` uses to restore
    caller order."""
    n = o.shape[0]
    idx0 = jnp.arange(n, dtype=jnp.int32)
    keys = key if isinstance(key, tuple) else (key,)
    out = jax.lax.sort(
        (*keys, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         t_min_b, t_max_b, idx0),
        num_keys=len(keys),
    )
    (ox, oy, oz, dx, dy, dz, tmn, tmx, idx) = out[len(keys):]
    return (
        jnp.stack([ox, oy, oz], axis=1),
        jnp.stack([dx, dy, dz], axis=1),
        tmn,
        tmx,
        idx,
    )


def _unsort(idx, *payloads):
    """Invert a :func:`_sort_rays_by_key` reorder: one ``lax.sort`` keyed on
    the carried original indices (unique, so ordering is exact)."""
    cols = []
    shapes = []
    for p in payloads:
        if p.ndim == 2:
            cols.extend(p[:, j] for j in range(p.shape[1]))
            shapes.append(p.shape[1])
        else:
            cols.append(p)
            shapes.append(0)
    out = jax.lax.sort((idx, *cols), num_keys=1)[1:]
    res = []
    k = 0
    for s in shapes:
        if s:
            res.append(jnp.stack(out[k : k + s], axis=1))
            k += s
        else:
            res.append(out[k])
            k += 1
    return res


def intersect(
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    t_max,
    tile: int | None = None,
    method: str = "auto",
    sort_rays: bool | None = None,
    coherent: bool | None = None,
) -> Hit:
    """Closest hit for a wave of rays.

    ``t_min``/``t_max`` are scalars or per-ray ``(N,)`` arrays (shadow rays pass
    ``dist - 1e-3``, rendering.rs:62-65).

    ``method``:
      * ``"pallas"`` — fused TPU kernels (ops/pallas_intersect.py): ray tiles
        resident in VMEM, primitive soup streamed on-chip, no HBM temps.
        The production path (~2.5-5x the jnp broadcast).
      * ``"binned"`` — pallas, but triangles traverse with per-RAY
        front-to-back cluster order (ops/binned_intersect.py): each round
        sorts the wave by every ray's nearest unvisited cluster. Exact same
        hits; measured 1.3x the per-tile kernels on pure surface-origin
        bounce waves of the 70k-tri scene (opt-in: costs 3 extra kernel
        compiles and only pays on large incoherent meshes).
      * ``"bruteforce"`` — (N, tile) jnp broadcasts reduced under lax.scan.
      * ``"mxu"`` — matmul formulation. Kept as an experiment: its K=3
        matmuls underutilize the systolic array and compile slowly at
        HIGHEST precision; not selected automatically.
      * ``"auto"`` — pallas on TPU, bruteforce on CPU; with a
        ``coherent=False`` hint (bounce/shadow waves of the wavefront
        integrator), big-triangle scenes route to the per-ray traversal
        that wins on incoherent waves (see :func:`resolve_auto`).
    """
    method = resolve_auto(method, scene.tri_v0.shape[0], coherent)
    binned = method in ("binned", "binned_interpret")
    resident = method in ("resident", "resident_interpret")
    bvh = method in ("bvh", "bvh_interpret")
    if binned or resident or bvh:
        method = (
            "pallas"
            if method in ("binned", "resident", "bvh")
            else "pallas_interpret"
        )
    n = o.shape[0]
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, o.dtype), (n,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, o.dtype), (n,))

    t_rows_real = scene.tri_v0.shape[0]
    s_rows = scene.sph_center.shape[0]

    if method in ("pallas", "pallas_interpret"):
        from . import pallas_intersect as pk
        from ..models.scene import SPH_CLUSTER_SIZE

        interp = method == "pallas_interpret"
        # shard_map: rays vary over the device mesh while the scene is
        # replicated; kernels compare the two everywhere, so lift the scene
        # (and the scalar-broadcast range rows) to the rays' varying axes.
        # Type-level only — no data moves; no-op outside shard_map.
        want = jax.typeof(o).vma | jax.typeof(d).vma
        if want:
            scene, t_min_b, t_max_b = _lift_tree(want, scene, t_min_b, t_max_b)
        if sort_rays is None:
            sort_rays = (not binned) and t_rows_real >= RAY_SORT_MIN_TRIS
        idx = None
        o0, d0 = o, d
        if sort_rays:
            key = _ray_sort_key(scene, o, d, t_min_b, t_max_b)
            o, d, t_min_b, t_max_b, idx = _sort_rays_by_key(
                key, o, d, t_min_b, t_max_b
            )
        # Tiny primitive tables get a right-sized tile instead of paying for a
        # full 256-row cluster of padding (measured ~1.5 ms/call of pure
        # padding work for a 2-triangle scene at production wave sizes).
        # Spheres skip the cluster traversal machinery entirely up to 512
        # rows: a single right-sized tile measured faster than 2x256
        # front-to-back clusters on the 488-sphere bench scene (0.141 vs
        # 0.151 ms) — incoherent bounce waves enter every cluster anyway,
        # so the extract-min/early-out apparatus is pure overhead there.
        tri_small = t_rows_real <= 64
        sph_small = s_rows <= 512
        def run_tri(tmax):
            if bvh and not tri_small:
                import os as _os

                from . import bvh_intersect as bv

                return bv.triangle_closest_bvh(
                    o, d, t_min_b, tmax, scene.tri_v0, scene.tri_e1,
                    scene.tri_e2, scene.tri_normal, scene.tri_mat,
                    interpret=interp,
                    # A/B knob (trace time): rows = streamed no-transpose.
                    layout=_os.environ.get("PT_BVH_LAYOUT", "cols"),
                    # Round-5 default: the MXU Möller–Trumbore form (closest
                    # measured +19% bounce / +84% primary on the 70k knot;
                    # any-hit stays on the VPU form — its cheaper sweep loses
                    # to the per-leaf dot). PT_BVH_MXU=0/1 overrides both.
                    **{"mxu": True, **bv.env_params()},
                )
            if resident and not tri_small:
                from . import resident_intersect as rs

                return rs.triangle_closest_resident(
                    o, d, t_min_b, tmax, scene.tri_v0, scene.tri_e1,
                    scene.tri_e2, scene.tri_normal, scene.tri_mat,
                    interpret=interp,
                )
            if binned and not tri_small:
                from . import binned_intersect as bn

                return bn.triangle_closest_binned(
                    o, d, t_min_b, tmax, scene.tri_v0, scene.tri_e1,
                    scene.tri_e2, scene.tri_normal, scene.tri_mat,
                    scene.tri_cluster_min, scene.tri_cluster_max,
                    interpret=interp,
                )
            return pk.triangle_closest(
                o, d, t_min_b, tmax, scene.tri_v0, scene.tri_e1, scene.tri_e2,
                scene.tri_normal, scene.tri_mat,
                cluster_min=None if tri_small else scene.tri_cluster_min,
                cluster_max=None if tri_small else scene.tri_cluster_max,
                prim_tile=_round_tile(t_rows_real, 8) if tri_small else 256,
                interpret=interp,
            )

        def run_sph(tmax):
            return pk.sphere_closest(
                o, d, t_min_b, tmax, scene.sph_center, scene.sph_radius,
                scene.sph_mat,
                cluster_min=None if sph_small else scene.sph_cluster_min,
                cluster_max=None if sph_small else scene.sph_cluster_max,
                prim_tile=_round_tile(s_rows, 8) if sph_small else SPH_CLUSTER_SIZE,
                interpret=interp,
            )

        if tri_small and sph_small:
            # Small scenes: one fused kernel resolves both classes and the
            # winner in a single pass — saves a dispatch, the XLA merge
            # selects, and a duplicate set of transposed ray inputs
            # (measured ~12% of the bench-scene pool iteration).
            t, prim, outward, mat = pk.combined_closest_small(
                o, d, t_min_b, t_max_b,
                scene.sph_center, scene.sph_radius, scene.sph_mat,
                scene.tri_v0, scene.tri_e1, scene.tri_e2,
                scene.tri_normal, scene.tri_mat,
                num_tris=t_rows_real,
                interpret=interp,
            )
            if idx is not None:
                t, prim, outward, mat = _unsort(idx, t, prim, outward, mat)
            valid = prim >= 0
            mat = jnp.where(valid, mat, 0)
            point = o0 + d0 * jnp.where(valid, t, 0.0)[:, None]
            front_face = vec.dot(d0, outward) < 0.0
            normal = jnp.where(front_face[:, None], outward, -outward)
            return Hit(
                t=jnp.where(valid, t, _INF),
                prim=prim,
                point=point,
                normal=normal,
                front_face=front_face,
                mat=mat,
            )

        # Run the smaller class first and cap the bigger kernel's t_max with
        # its per-ray results: a ground quad or sky dome bounds every ray,
        # which is what lets the bigger kernel's front-to-back early-out fire
        # (a single all-miss ray would otherwise hold its tile's bound at inf).
        if t_rows_real <= s_rows:
            tri_t, tri_p, tri_n, tri_m = run_tri(t_max_b)
            sph_t, sph_p, sph_n, sph_m = run_sph(jnp.minimum(t_max_b, tri_t))
        else:
            sph_t, sph_p, sph_n, sph_m = run_sph(t_max_b)
            tri_t, tri_p, tri_n, tri_m = run_tri(jnp.minimum(t_max_b, sph_t))
        sph_p = jnp.where(sph_p >= 0, sph_p + t_rows_real, -1)

        # Hit records come out of the kernels fully formed — no gathers.
        sph_better = sph_t < tri_t
        t = jnp.where(sph_better, sph_t, tri_t)
        prim = jnp.where(sph_better, sph_p, tri_p)
        outward = jnp.where(sph_better[:, None], sph_n, tri_n)
        mat = jnp.where(sph_better, sph_m, tri_m)
        if idx is not None:
            # One payload-sort keyed on the carried original indices restores
            # the caller's ray order; derived fields are computed afterwards
            # from the caller's own o/d.
            t, prim, outward, mat = _unsort(idx, t, prim, outward, mat)
        valid = prim >= 0
        mat = jnp.where(valid, mat, 0)
        point = o0 + d0 * jnp.where(valid, t, 0.0)[:, None]
        front_face = vec.dot(d0, outward) < 0.0
        normal = jnp.where(front_face[:, None], outward, -outward)
        return Hit(
            t=jnp.where(valid, t, _INF),
            prim=prim,
            point=point,
            normal=normal,
            front_face=front_face,
            mat=mat,
        )
    else:
        t_min2 = t_min_b[:, None]
        t_max2 = t_max_b[:, None]
        mxu = method == "mxu"
        tri_tile = tile or (256 if mxu else 1024)
        sph_tile = tile or (512 if mxu else 1024)
        tri_t, tri_p = _closest_over_tiles(
            (scene.tri_v0, scene.tri_e1, scene.tri_e2),
            triangle_hit_ts_mxu if mxu else triangle_hit_ts,
            o, d, t_min2, t_max2, min(tri_tile, _round_tile(t_rows_real, 8)), 0,
        )
        sph_t, sph_p = _closest_over_tiles(
            (scene.sph_center, scene.sph_radius),
            sphere_hit_ts_mxu if mxu else sphere_hit_ts,
            o, d, t_min2, t_max2, min(sph_tile, _round_tile(s_rows, 8)),
            scene.tri_v0.shape[0],
        )

    sph_better = sph_t < tri_t
    t = jnp.where(sph_better, sph_t, tri_t)
    prim = jnp.where(sph_better, sph_p, tri_p)
    valid = prim >= 0

    point = o + d * jnp.where(valid, t, 0.0)[:, None]

    # Outward normal by primitive kind, then face-forward (base.rs:19-33).
    t_rows = scene.tri_v0.shape[0]
    is_tri = (prim >= 0) & (prim < t_rows)
    tri_idx = jnp.clip(prim, 0, t_rows - 1)
    sph_idx = jnp.clip(prim - t_rows, 0, scene.sph_center.shape[0] - 1)
    n_tri = scene.tri_normal[tri_idx]
    c = scene.sph_center[sph_idx]
    r = scene.sph_radius[sph_idx]
    n_sph = (point - c) / jnp.where(r > 0, r, 1.0)[:, None]
    outward = jnp.where(is_tri[:, None], n_tri, n_sph)

    front_face = vec.dot(d, outward) < 0.0
    normal = jnp.where(front_face[:, None], outward, -outward)
    mat = scene.prim_mat(jnp.maximum(prim, 0))

    return Hit(
        t=jnp.where(valid, t, _INF),
        prim=prim,
        point=point,
        normal=normal,
        front_face=front_face,
        mat=mat,
    )


def occluded(
    scene: Scene, o, d, t_min, t_max, tile: int | None = None,
    method: str = "auto", coherent: bool | None = None,
) -> jnp.ndarray:
    """Boolean visibility test (shadow rays, rendering.rs:62-65).

    On accelerators this is a dedicated fused any-hit kernel over both
    primitive classes (no closest-hit bookkeeping); on CPU it reuses the
    bruteforce closest-hit path. ``coherent`` as in :func:`intersect`
    (shadow waves are incoherent — the wavefront integrator hints False).
    """
    method = resolve_auto(method, scene.tri_v0.shape[0], coherent)
    binned = method in ("binned", "binned_interpret")
    resident = method in ("resident", "resident_interpret")
    bvh = method in ("bvh", "bvh_interpret")
    if binned or resident or bvh:
        method = (
            "pallas"
            if method in ("binned", "resident", "bvh")
            else "pallas_interpret"
        )
    if method in ("pallas", "pallas_interpret"):
        from . import pallas_intersect as pk

        n = o.shape[0]
        t_min_b = jnp.broadcast_to(jnp.asarray(t_min, o.dtype), (n,))
        t_max_b = jnp.broadcast_to(jnp.asarray(t_max, o.dtype), (n,))
        want = jax.typeof(o).vma | jax.typeof(d).vma
        if want:  # shard_map: see the matching lift in intersect()
            scene, t_min_b, t_max_b = _lift_tree(want, scene, t_min_b, t_max_b)
        t_rows_real = scene.tri_v0.shape[0]
        s_rows = scene.sph_center.shape[0]
        from ..models.scene import SPH_CLUSTER_SIZE
        idx = None
        if (not binned) and t_rows_real >= RAY_SORT_MIN_TRIS:
            key = _ray_sort_key(scene, o, d, t_min_b, t_max_b)
            o, d, t_min_b, t_max_b, idx = _sort_rays_by_key(
                key, o, d, t_min_b, t_max_b
            )
        # Per-class tile sizing: small tables run as ONE right-sized tile
        # with no cluster machinery (the per-cluster extract-min/settled
        # checks measured ~3x the raw sweep math at 488 spheres); big tables
        # keep 256-row clusters with the front-to-back early-out sweep.
        sph_onetile = s_rows <= 512
        tri_onetile = t_rows_real <= 64
        sph_prim_tile = _round_tile(s_rows, 8) if sph_onetile else SPH_CLUSTER_SIZE
        tri_prim_tile = _round_tile(t_rows_real, 8) if tri_onetile else 256
        sph_cluster = (
            None if sph_onetile
            else (scene.sph_cluster_min, scene.sph_cluster_max)
        )
        tri_cluster = (
            None if tri_onetile
            else (scene.tri_cluster_min, scene.tri_cluster_max)
        )
        if (binned or resident or bvh) and not tri_onetile:
            if bvh:
                import os as _os

                from . import bvh_intersect as bv

                tri_occ = bv.triangle_anyhit_bvh(
                    o, d, t_min_b, t_max_b, scene.tri_v0, scene.tri_e1,
                    scene.tri_e2, interpret=method == "pallas_interpret",
                    layout=_os.environ.get("PT_BVH_LAYOUT", "cols"),
                    **bv.env_params(),
                )
            elif resident:
                from . import resident_intersect as rs

                tri_occ = rs.triangle_anyhit_resident(
                    o, d, t_min_b, t_max_b, scene.tri_v0, scene.tri_e1,
                    scene.tri_e2, interpret=method == "pallas_interpret",
                )
            else:
                from . import binned_intersect as bn

                tri_occ = bn.triangle_anyhit_binned(
                    o, d, t_min_b, t_max_b, scene.tri_v0, scene.tri_e1,
                    scene.tri_e2, scene.tri_cluster_min,
                    scene.tri_cluster_max,
                    interpret=method == "pallas_interpret",
                )
            zero3 = jnp.zeros((1, 3), o.dtype)  # spheres only: dead tri row
            sph_occ = pk.any_hit(
                o, d, t_min_b, t_max_b,
                scene.sph_center, scene.sph_radius,
                zero3, zero3, zero3,
                sph_cluster=sph_cluster,
                sph_prim_tile=sph_prim_tile,
                tri_prim_tile=8,
                ray_tile=1024,
                interpret=method == "pallas_interpret",
            )
            occ = tri_occ | sph_occ
            if idx is not None:  # resident runs on the sorted wave
                (occ,) = _unsort(idx, occ.astype(jnp.int32))
                occ = occ != 0
            return occ
        occ = pk.any_hit(
            o, d, t_min_b, t_max_b,
            scene.sph_center, scene.sph_radius,
            scene.tri_v0, scene.tri_e1, scene.tri_e2,
            sph_cluster=sph_cluster,
            tri_cluster=tri_cluster,
            sph_prim_tile=sph_prim_tile,
            tri_prim_tile=tri_prim_tile,
            # Wide lane tiles only blow the VMEM budget when a big triangle
            # table's scratch shares the kernel; small scenes get full
            # 1024-lane tiles (measured 22% faster than 512 at 488 spheres).
            ray_tile=1024 if t_rows_real <= 8192 else 256,
            interpret=method == "pallas_interpret",
        )
        if idx is not None:
            (occ,) = _unsort(idx, occ.astype(jnp.int32))
            occ = occ != 0
        return occ
    return intersect(scene, o, d, t_min, t_max, tile=tile, method=method).valid


def occluded_transposed(
    scene: Scene, o_t, d_t, t_min, t_max, method: str = "auto"
) -> jnp.ndarray:
    """Kernel-layout :func:`occluded`: ``o_t``/``d_t`` are (3, N), ranges
    scalar or (N,), result (N,) bool — no pad/transpose traffic on the way
    into the any-hit kernel. Used by the pool's fused path, whose state
    lives in kernel layout; small scenes only (no ray sorting)."""
    if method == "auto":
        method = default_method()
    if method not in ("pallas", "pallas_interpret"):
        return occluded(scene, o_t.T, d_t.T, t_min, t_max, method=method)
    from . import pallas_intersect as pk
    from ..models.scene import SPH_CLUSTER_SIZE

    t_rows_real = scene.tri_v0.shape[0]
    s_rows = scene.sph_center.shape[0]
    sph_onetile = s_rows <= 512
    tri_onetile = t_rows_real <= 64
    return pk.any_hit(
        o_t, d_t, t_min, t_max,
        scene.sph_center, scene.sph_radius,
        scene.tri_v0, scene.tri_e1, scene.tri_e2,
        sph_cluster=(
            None if sph_onetile
            else (scene.sph_cluster_min, scene.sph_cluster_max)
        ),
        tri_cluster=(
            None if tri_onetile
            else (scene.tri_cluster_min, scene.tri_cluster_max)
        ),
        sph_prim_tile=_round_tile(s_rows, 8) if sph_onetile else SPH_CLUSTER_SIZE,
        tri_prim_tile=_round_tile(t_rows_real, 8) if tri_onetile else 256,
        ray_tile=1024 if t_rows_real <= 8192 else 256,
        transposed=True,
        interpret=method == "pallas_interpret",
    )
