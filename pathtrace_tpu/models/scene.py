"""Device-resident structure-of-arrays scene representation.

The reference stores a ``Vec<Object>`` of boxed shape+material trait objects and
intersects them with a linear scan of virtual calls (world.rs:270-290,
object.rs:9-31). On TPU that becomes parallel flat arrays: a triangle soup, a
sphere list, a material table, and a light-primitive index list — everything a
wave of rays needs, gatherable by integer id with zero indirection.

Primitive ids are global: ``0..T-1`` are triangles, ``T..T+S-1`` are spheres.
All arrays are padded to at least one element (degenerate, far away, never hit)
so every jitted shape is static and non-empty.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils import vec
from . import materials as mat

# Primitives are morton-sorted and grouped into clusters of this many rows;
# the Pallas kernels use one cluster per tile, so these must match the
# prim_tile the intersection layer passes. Spheres use finer clusters: their
# per-row test is cheap, so a smaller tile buys more AABB-cull opportunities.
CLUSTER_SIZE = 256       # triangles
SPH_CLUSTER_SIZE = 256   # spheres


def _morton3(p: np.ndarray) -> np.ndarray:
    """30-bit morton code of points normalized to [0,1)^3."""
    def expand(v):
        v = np.clip((v * 1023.0), 0, 1023).astype(np.uint32)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (expand(p[:, 0]) << 2) | (expand(p[:, 1]) << 1) | expand(p[:, 2])


def _morton_order(centroids: np.ndarray) -> np.ndarray:
    if centroids.shape[0] <= 1:
        return np.arange(centroids.shape[0])
    lo = centroids.min(axis=0)
    span = np.maximum(centroids.max(axis=0) - lo, 1e-12)
    return np.argsort(_morton3((centroids - lo) / span), kind="stable")


# Triangle ordering granularity: recursive splits land on multiples of this
# so every 128-row BVH leaf (and every 256-row flat cluster) is one subtree
# of the split — the unit whose AABB tightness the kernels cull against.
SPLIT_LEAF = 128


def _split_order(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray,
                 sah: bool = True) -> np.ndarray:
    """Top-down longest-axis split order for triangles (SAH or median).

    Replaces the global morton order for triangle soups: sorting each node's
    triangles along its longest centroid axis and splitting at a
    SPLIT_LEAF-aligned position (surface-area-heuristic pick, or the aligned
    median) roughly halves leaf-AABB overlap vs morton on curved meshes —
    measured 1.9x fewer union-sweep leaf visits on the 70k-tri knot
    (docs/PERFORMANCE.md round 4). Pure host-side numpy at build time; the
    kernels are unchanged (they derive leaf/cluster AABBs from row order).
    """
    n = len(p0)
    if n <= 1:
        return np.arange(n)
    cent = (p0 + p1 + p2) / 3.0
    tmn = np.minimum(np.minimum(p0, p1), p2)
    tmx = np.maximum(np.maximum(p0, p1), p2)
    out = []

    def area(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]

    def rec(idx):
        if len(idx) <= SPLIT_LEAF:
            out.append(idx)
            return
        c = cent[idx]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        sidx = idx[np.argsort(c[:, ax], kind="stable")]
        if sah:
            mn, mx = tmn[sidx], tmx[sidx]
            pre_mn = np.minimum.accumulate(mn)
            pre_mx = np.maximum.accumulate(mx)
            suf_mn = np.minimum.accumulate(mn[::-1])[::-1]
            suf_mx = np.maximum.accumulate(mx[::-1])[::-1]
            ks = np.arange(SPLIT_LEAF, len(idx), SPLIT_LEAF)
            cost = area(pre_mn[ks - 1], pre_mx[ks - 1]) * ks + \
                area(suf_mn[ks], suf_mx[ks]) * (len(idx) - ks)
            k = int(ks[np.argmin(cost)])
        else:
            k = (len(idx) // 2 // SPLIT_LEAF) * SPLIT_LEAF or SPLIT_LEAF
        rec(sidx[:k])
        rec(sidx[k:])

    rec(np.arange(n))
    return np.concatenate(out)


def _cluster_aabbs(pmin: np.ndarray, pmax: np.ndarray, rows: int, cluster: int):
    """Per-cluster AABBs for `rows` padded rows; empty clusters inverted."""
    n_clusters = max(rows // cluster, 1)
    cmin = np.full((n_clusters, 3), np.inf)
    cmax = np.full((n_clusters, 3), -np.inf)
    for c in range(n_clusters):
        a, b = c * cluster, min((c + 1) * cluster, pmin.shape[0])
        if a < pmin.shape[0]:
            cmin[c] = pmin[a:b].min(axis=0)
            cmax[c] = pmax[a:b].max(axis=0)
    return cmin, cmax


@struct.dataclass
class Scene:
    # Triangles: v0 plus edge vectors (Möller–Trumbore operands, shape.rs:163-164)
    tri_v0: jnp.ndarray   # (T, 3)
    tri_e1: jnp.ndarray   # (T, 3)
    tri_e2: jnp.ndarray   # (T, 3)
    tri_normal: jnp.ndarray  # (T, 3) unit geometric normal normalize(e1×e2)
    tri_area: jnp.ndarray    # (T,)  |e1×e2|/2
    tri_mat: jnp.ndarray  # (T,) int32

    # Spheres
    sph_center: jnp.ndarray  # (S, 3)
    sph_radius: jnp.ndarray  # (S,)
    sph_mat: jnp.ndarray     # (S,) int32

    # Material table
    mat_kind: jnp.ndarray       # (M,) int32 (materials.KIND_*)
    mat_color: jnp.ndarray      # (M, 3) albedo / specular color
    mat_emission: jnp.ndarray   # (M, 3)
    mat_roughness: jnp.ndarray  # (M,)
    mat_metallic: jnp.ndarray   # (M,)
    mat_ior: jnp.ndarray        # (M,)

    # Morton-clustered acceleration data: per 256-prim cluster AABBs
    # (empty clusters carry an inverted box that can never be hit).
    tri_cluster_min: jnp.ndarray  # (Ct, 3)
    tri_cluster_max: jnp.ndarray  # (Ct, 3)
    sph_cluster_min: jnp.ndarray  # (Cs, 3)
    sph_cluster_max: jnp.ndarray  # (Cs, 3)

    # Emissive primitive ids (auto-detected, world.rs:213-225)
    light_prims: jnp.ndarray  # (L,) int32
    # Packed per-light geometry+emission rows so light sampling needs one
    # one-hot matmul instead of ~10 gathers. Columns:
    #   0: is_tri | 1:4 v0/center | 4: radius (sphere) | 4:7 e1 (tri)
    #   7:10 e2 | 10:13 normal | 13 area | 14:17 emission
    light_geom: jnp.ndarray  # (L, 17)

    num_tris: int = struct.field(pytree_node=False)
    num_spheres: int = struct.field(pytree_node=False)
    num_lights: int = struct.field(pytree_node=False)
    # Static lane-presence flags: the masked-lane BSDF dispatch evaluates
    # every lane for every ray, so scenes that lack a material kind skip
    # that lane's math entirely at trace time. The Oren-Nayar lane is the
    # expensive one to run for nothing (two atan2 + trig per ray, measured
    # ~30% of the shading glue); its flag and has_mirror default True so a
    # hand-built Scene keeps those lanes. has_pbr is the exception: it
    # defaults False (the lane is the costliest and the reference's
    # PBRMaterial is dead code) — a hand-built Scene whose material table
    # contains KIND_PBR rows MUST set has_pbr=True itself, or those rows
    # fall through to the Mirror lane. SceneBuilder sets all three flags
    # from the actual material list.
    has_pbr: bool = struct.field(pytree_node=False, default=False)
    has_oren_nayar: bool = struct.field(pytree_node=False, default=True)
    has_mirror: bool = struct.field(pytree_node=False, default=True)
    # Static light-class flags (round 5): the megakernel's NEE sampler and
    # MIS bsdf-side pdf evaluate BOTH the triangle (sqrt-warp area) and the
    # sphere (cone) lanes per ray and where3-merge by is_tri. A scene whose
    # lights are all one class skips the other lane at trace time — bitwise
    # identical (the merge with an all-false/all-true predicate IS the kept
    # lane). Defaults keep both lanes so hand-built Scenes stay correct.
    has_tri_lights: bool = struct.field(pytree_node=False, default=True)
    has_sph_lights: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_prims(self) -> int:
        return self.num_tris + self.num_spheres

    def prim_mat(self, prim: jnp.ndarray) -> jnp.ndarray:
        """Material id for a global primitive id (clipped gather; padded rows
        are never selected by a valid hit)."""
        t = self.tri_mat.shape[0]
        is_tri = prim < t
        tm = self.tri_mat[jnp.clip(prim, 0, t - 1)]
        sm = self.sph_mat[jnp.clip(prim - t, 0, self.sph_mat.shape[0] - 1)]
        return jnp.where(is_tri, tm, sm)


class SceneBuilder:
    """Python scene-construction API mirroring ``World::new`` ergonomics
    (world.rs:65-241) but producing the SoA device scene."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self._tris: List[Tuple[np.ndarray, np.ndarray, np.ndarray, int]] = []
        self._sphs: List[Tuple[np.ndarray, float, int]] = []
        self._mats: List[mat.Material] = []

    def _mat_id(self, m: mat.Material) -> int:
        try:
            return self._mats.index(m)
        except ValueError:
            self._mats.append(m)
            return len(self._mats) - 1

    def add_triangle(self, v0, v1, v2, material: mat.Material) -> "SceneBuilder":
        mid = self._mat_id(material)
        self._tris.append(
            (np.asarray(v0, np.float64), np.asarray(v1, np.float64), np.asarray(v2, np.float64), mid)
        )
        return self

    def add_quad(self, v0, v1, v2, v3, material: mat.Material) -> "SceneBuilder":
        """Two triangles (v0,v1,v2) and (v0,v2,v3)."""
        self.add_triangle(v0, v1, v2, material)
        self.add_triangle(v0, v2, v3, material)
        return self

    def add_sphere(self, center, radius: float, material: mat.Material) -> "SceneBuilder":
        mid = self._mat_id(material)
        self._sphs.append((np.asarray(center, np.float64), float(radius), mid))
        return self

    def add_mesh(self, vertices, faces, material: mat.Material) -> "SceneBuilder":
        """Triangle mesh: ``vertices (V,3)`` float, ``faces (F,3)`` int."""
        vertices = np.asarray(vertices, np.float64)
        faces = np.asarray(faces, np.int64)
        mid = self._mat_id(material)
        for f in faces:
            self._tris.append((vertices[f[0]], vertices[f[1]], vertices[f[2]], mid))
        return self

    def build(self) -> Scene:
        dtype = self.dtype
        num_tris = len(self._tris)
        num_sphs = len(self._sphs)

        # Pad with one degenerate primitive so shapes are never empty:
        # a zero-edge triangle never passes Möller–Trumbore's parallel test,
        # and a zero-radius sphere at 1e9 never intersects scene rays.
        tris = self._tris or []
        sphs = self._sphs or []
        mats = list(self._mats) or [mat.Lambertian((0.0, 0.0, 0.0))]

        # Spatially order primitives so consecutive rows are local — each
        # CLUSTER_SIZE-row kernel tile / 128-row BVH leaf then has a tight
        # AABB the intersection kernels can cull against. Triangles get the
        # SAH split order (2.0x faster BVH traversal than morton on the 70k
        # knot, measured); spheres keep morton (their clusters are already
        # near-isotropic). Light auto-detection below runs on the reordered
        # lists, so light ids need no remapping.
        # SAH ordering only pays off once leaves are numerous (< ~4 leaves
        # there is nothing to split); keeping morton below the threshold also
        # keeps small scenes' primitive order — and thus light order and the
        # pinned golden-oracle artifact — byte-stable across rounds.
        if num_tris > 512:
            p0 = np.stack([t[0] for t in tris])
            p1 = np.stack([t[1] for t in tris])
            p2 = np.stack([t[2] for t in tris])
            tris = [tris[i] for i in _split_order(p0, p1, p2)]
        elif num_tris > 1:
            cent = np.stack([(t[0] + t[1] + t[2]) / 3.0 for t in tris])
            tris = [tris[i] for i in _morton_order(cent)]
        if num_sphs > 1:
            cent = np.stack([s[0] for s in sphs])
            sphs = [sphs[i] for i in _morton_order(cent)]

        t_pad = max(num_tris, 1)
        s_pad = max(num_sphs, 1)

        tri_v0 = np.zeros((t_pad, 3)); tri_e1 = np.zeros((t_pad, 3)); tri_e2 = np.zeros((t_pad, 3))
        tri_mat_arr = np.zeros((t_pad,), np.int32)
        for i, (v0, v1, v2, mid) in enumerate(tris):
            tri_v0[i] = v0; tri_e1[i] = v1 - v0; tri_e2[i] = v2 - v0
            tri_mat_arr[i] = mid
        tri_cross = np.cross(tri_e1, tri_e2)
        tri_norm = np.linalg.norm(tri_cross, axis=-1, keepdims=True)
        tri_normal = np.where(tri_norm > 0, tri_cross / np.where(tri_norm > 0, tri_norm, 1.0), 0.0)
        tri_area = tri_norm[:, 0] * 0.5

        sph_center = np.full((s_pad, 3), 1e9); sph_radius = np.zeros((s_pad,))
        sph_mat_arr = np.zeros((s_pad,), np.int32)
        for i, (c, r, mid) in enumerate(sphs):
            sph_center[i] = c; sph_radius[i] = r
            sph_mat_arr[i] = mid

        # Cluster AABBs over the kernel-padded row counts.
        tri_pts = np.stack([tri_v0, tri_v0 + tri_e1, tri_v0 + tri_e2])  # (3,T,3)
        tri_cmin, tri_cmax = _cluster_aabbs(
            tri_pts.min(axis=0)[:num_tris],
            tri_pts.max(axis=0)[:num_tris],
            -(-t_pad // CLUSTER_SIZE) * CLUSTER_SIZE,
            CLUSTER_SIZE,
        )
        sph_cmin, sph_cmax = _cluster_aabbs(
            (sph_center - sph_radius[:, None])[:num_sphs],
            (sph_center + sph_radius[:, None])[:num_sphs],
            -(-s_pad // SPH_CLUSTER_SIZE) * SPH_CLUSTER_SIZE,
            SPH_CLUSTER_SIZE,
        )

        rows = [mat.material_row(m) for m in mats]
        mat_kind = np.asarray([r[0] for r in rows], np.int32)
        mat_color = np.asarray([r[1] for r in rows])
        mat_emission = np.asarray([r[2] for r in rows])
        mat_roughness = np.asarray([r[3] for r in rows])
        mat_metallic = np.asarray([r[4] for r in rows])
        mat_ior = np.asarray([r[5] for r in rows])

        # Auto-detect lights by probing material emission (world.rs:213-225).
        # Global prim ids use the PADDED triangle row count as the sphere
        # offset — the same namespace ops.intersect assigns hit prim ids in.
        light_ids: List[int] = []
        for i, (_, _, _, mid) in enumerate(tris):
            if mat.is_emissive(mats[mid]):
                light_ids.append(i)
        for i, (_, _, mid) in enumerate(sphs):
            if mat.is_emissive(mats[mid]):
                light_ids.append(t_pad + i)
        num_lights = len(light_ids)
        light_prims = np.asarray(light_ids or [0], np.int32)

        light_geom = np.zeros((max(num_lights, 1), 17))
        for li, pid in enumerate(light_ids):
            if pid < t_pad:
                mid = int(tri_mat_arr[pid])
                light_geom[li, 0] = 1.0
                light_geom[li, 1:4] = tri_v0[pid]
                light_geom[li, 4:7] = tri_e1[pid]
                light_geom[li, 7:10] = tri_e2[pid]
                light_geom[li, 10:13] = tri_normal[pid]
                light_geom[li, 13] = tri_area[pid]
            else:
                si = pid - t_pad
                mid = int(sph_mat_arr[si])
                light_geom[li, 1:4] = sph_center[si]
                light_geom[li, 4] = sph_radius[si]
            light_geom[li, 14:17] = mat_emission[mid]

        return Scene(
            tri_v0=jnp.asarray(tri_v0, dtype),
            tri_e1=jnp.asarray(tri_e1, dtype),
            tri_e2=jnp.asarray(tri_e2, dtype),
            tri_normal=jnp.asarray(tri_normal, dtype),
            tri_area=jnp.asarray(tri_area, dtype),
            tri_mat=jnp.asarray(tri_mat_arr),
            sph_center=jnp.asarray(sph_center, dtype),
            sph_radius=jnp.asarray(sph_radius, dtype),
            sph_mat=jnp.asarray(sph_mat_arr),
            mat_kind=jnp.asarray(mat_kind),
            mat_color=jnp.asarray(mat_color, dtype),
            mat_emission=jnp.asarray(mat_emission, dtype),
            mat_roughness=jnp.asarray(mat_roughness, dtype),
            mat_metallic=jnp.asarray(mat_metallic, dtype),
            mat_ior=jnp.asarray(mat_ior, dtype),
            tri_cluster_min=jnp.asarray(tri_cmin, dtype),
            tri_cluster_max=jnp.asarray(tri_cmax, dtype),
            sph_cluster_min=jnp.asarray(sph_cmin, dtype),
            sph_cluster_max=jnp.asarray(sph_cmax, dtype),
            light_prims=jnp.asarray(light_prims),
            light_geom=jnp.asarray(light_geom, dtype),
            num_tris=num_tris,
            num_spheres=num_sphs,
            num_lights=num_lights,
            has_pbr=any(isinstance(m, mat.PBRMaterial) for m in mats),
            has_oren_nayar=any(
                isinstance(m, (mat.OrenNayar, mat.PBRMaterial)) for m in mats
            ),
            has_mirror=any(isinstance(m, mat.Mirror) for m in mats),
            has_tri_lights=any(pid < t_pad for pid in light_ids),
            has_sph_lights=any(pid >= t_pad for pid in light_ids),
        )
