"""Offline union-sweep cost replay for candidate ray orderings (round 5).

The mesh wall (docs/PERFORMANCE.md round 4): per 256-lane subtile the BVH
union sweep pays ~19-23 leaf sweeps where the per-ray ideal is ~2 — pure lane
divergence. This probe replays the traversal's cost model in numpy on
realistic waves and scores candidate wave orderings WITHOUT touching the TPU:

  sweeps(order) = sum over 256-lane subtiles of |union of per-ray
                  ideal-bound entered-leaf sets|
  rounds(order) = same at supergroup granularity
  half-gated    = sweeps counted per 128-lane half (models a kernel that
                  skips a leaf for a half-subtile none of whose lanes enter)

Per-ray sets use the *ideal* bound (final closest t), the same optimistic
model round 4 validated against in-kernel counters (18.8 predicted vs 22.8
measured on the bounce wave).

Run on CPU: python examples/bvh_order_probe.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pathtrace_tpu.models import scenes

N = 65536
PRIM_TILE = 128
GROUP = 16
SUB_W = 256


def leaf_aabbs(scene):
    v0 = np.asarray(scene.tri_v0, np.float64)
    e1 = np.asarray(scene.tri_e1, np.float64)
    e2 = np.asarray(scene.tri_e2, np.float64)
    T = v0.shape[0]
    C = -(-T // PRIM_TILE)
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # (T, 3, 3)
    lo = np.full((C * PRIM_TILE, 3), np.inf)
    hi = np.full((C * PRIM_TILE, 3), -np.inf)
    lo[:T] = pts.min(axis=1)
    hi[:T] = pts.max(axis=1)
    lo = lo.reshape(C, PRIM_TILE, 3).min(axis=1)
    hi = hi.reshape(C, PRIM_TILE, 3).max(axis=1)
    return lo, hi, T, C


def entries(lo, hi, o, d, t_min, t_max):
    """(C, n) conservative AABB entry distances; inf where missed."""
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    a = (lo[:, None, :] - o[None]) * inv[None]
    b = (hi[:, None, :] - o[None]) * inv[None]
    tn = np.maximum(np.minimum(a, b).max(axis=2), t_min)
    tf = np.minimum(np.maximum(a, b).min(axis=2), t_max)
    valid = (lo[:, 0] <= hi[:, 0])[:, None]
    return np.where((tn <= tf) & valid, tn, np.inf)


def closest_t(scene, o, d, t_min, leaf_lo, leaf_hi, C):
    """Exact closest-hit t by testing every line-entered leaf's triangles
    (batched per leaf over its entering rays)."""
    v0 = np.asarray(scene.tri_v0, np.float64)
    e1 = np.asarray(scene.tri_e1, np.float64)
    e2 = np.asarray(scene.tri_e2, np.float64)
    T = v0.shape[0]
    best = np.full(o.shape[0], np.inf)
    ent = entries(leaf_lo, leaf_hi, o, d, t_min, np.inf)  # (C, n)
    for c in range(C):
        rs = np.nonzero(np.isfinite(ent[c]))[0]
        if rs.size == 0:
            continue
        s = slice(c * PRIM_TILE, min((c + 1) * PRIM_TILE, T))
        a, b1, b2 = v0[s], e1[s], e2[s]
        ro, rd = o[rs], d[rs]
        # Moller-Trumbore, batched (tris, rays)
        p = np.cross(rd[None, :, :], b2[:, None, :])
        det = np.einsum("tc,trc->tr", b1, p)
        ok = np.abs(det) > 1e-8
        invd = 1.0 / np.where(ok, det, 1.0)
        tv = ro[None] - a[:, None]
        u = np.einsum("trc,trc->tr", tv, p) * invd
        q = np.cross(tv, b1[:, None, :])
        v = np.einsum("rc,trc->tr", rd, q) * invd
        t = np.einsum("tc,trc->tr", b2, q) * invd
        hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= t_min[rs][None])
        t = np.where(hit, t, np.inf)
        best[rs] = np.minimum(best[rs], t.min(axis=0))
    return best


def waves(scene, key):
    cam = scenes.mesh_scene_camera(320, 205)
    n = 320 * 205
    pix = jnp.arange(N, dtype=jnp.int32) % n
    from pathtrace_tpu.utils import rng as rng_ops

    keys = rng_ops.pixel_sample_keys(rng_ops.base_key(1), pix, 0)
    jit = rng_ops.primary_jitter(keys)
    o_p, d_p = cam.generate_rays(pix % 320, 204 - pix // 320, jit)

    # Bounce-like: origins on the mesh surface (from primary hits), cosine dirs.
    hp = np.asarray(o_p) + np.asarray(closest_primary(scene, o_p, d_p))[:, None] * np.asarray(d_p)
    rng = np.random.default_rng(7)
    d_b = rng.normal(size=(N, 3))
    d_b /= np.linalg.norm(d_b, axis=1, keepdims=True)
    # Shadow-like: from surface toward a fixed light point + jitter.
    light = np.asarray(
        [float(scene.sph_center[0, 0]), float(scene.sph_center[0, 1]) + 3.0,
         float(scene.sph_center[0, 2])]
    )
    d_s = light[None] + rng.normal(size=(N, 3)) * 0.3 - hp
    d_s /= np.linalg.norm(d_s, axis=1, keepdims=True)
    return {
        "primary": (np.asarray(o_p, np.float64), np.asarray(d_p, np.float64)),
        "bounce": (hp, d_b),
        "shadow": (hp, d_s),
    }


def closest_primary(scene, o, d):
    lo, hi, T, C = leaf_aabbs(scene)
    t = closest_t(scene, np.asarray(o, np.float64), np.asarray(d, np.float64),
                  np.full(o.shape[0], 1e-3), lo, hi, C)
    # Fall back to a mid-scene distance for misses so bounce origins exist.
    t = np.where(np.isfinite(t), t, 5.0)
    return t


def score(order, ent_bounded, C, label, G):
    """Total leaf sweeps / rounds / half-gated lane-halves for an ordering."""
    e = ent_bounded[:, order]  # (C, N)
    n = e.shape[1]
    ns = n // SUB_W
    entered = np.isfinite(e)
    sub = entered[:, : ns * SUB_W].reshape(C, ns, SUB_W)
    u_leaf = sub.any(axis=2).sum()
    half = entered[:, : ns * SUB_W].reshape(C, ns, 2, 128)
    u_half = half.any(axis=3).sum()
    grp = entered[: (C // GROUP) * GROUP].reshape(G, GROUP, n)[:, :, : ns * SUB_W]
    g_sub = grp.any(axis=1).reshape(G, ns, SUB_W).any(axis=2).sum()
    print(
        f"  {label:34s} sweeps/subtile {u_leaf / ns:6.2f}  "
        f"half-lanes {u_half / ns / 2:6.2f}  rounds {g_sub / ns:5.2f}"
    )
    return u_leaf / ns


def main():
    scene = scenes.mesh_scene()
    lo, hi, T, C = leaf_aabbs(scene)
    G = C // GROUP + (C % GROUP > 0)
    Cpad = G * GROUP
    if Cpad > C:
        lo = np.concatenate([lo, np.full((Cpad - C, 3), np.inf)])
        hi = np.concatenate([hi, np.full((Cpad - C, 3), -np.inf)])
        C = Cpad
    glo = lo.reshape(G, GROUP, 3).min(axis=1)
    ghi = hi.reshape(G, GROUP, 3).max(axis=1)

    for name, (o, d) in waves(scene, 1).items():
        t_min = np.full(N, 1e-3)
        tb = closest_t(scene, o, d, t_min, lo, hi, C)
        t_cap = np.where(np.isfinite(tb), tb, 4.0 if name == "shadow" else np.inf)
        ent = entries(lo, hi, o, d, t_min, t_cap)     # ideal-bound leaf sets
        # Key features come from what a PREPASS can actually compute: the
        # line-entered sets over [t_min, t_max] (shadow rays have a real
        # t_max; closest rays don't). Scoring stays on the ideal sets.
        t_line = np.full(N, 4.0) if name == "shadow" else np.full(N, np.inf)
        lent = entries(lo, hi, o, d, t_min, t_line)
        gent = entries(glo, ghi, o, d, t_min, t_line)  # group sets (prepass)
        per_ray = np.isfinite(ent).sum(axis=0).mean()
        print(f"{name}: per-ray ideal leaf visits {per_ray:.2f}")

        # Per-ray features for keys
        g1 = np.argmin(gent, axis=0)
        g1e = gent.min(axis=0)
        gent2 = gent.copy()
        gent2[g1, np.arange(N)] = np.inf
        g2 = np.argmin(gent2, axis=0)
        g2 = np.where(np.isfinite(gent2.min(axis=0)), g2, G)
        g1 = np.where(np.isfinite(g1e), g1, G)
        l1 = np.argmin(lent, axis=0)
        l1e = lent.min(axis=0)
        ent2 = lent.copy()
        ent2[l1, np.arange(N)] = np.inf
        l2 = np.argmin(ent2, axis=0)
        l2 = np.where(np.isfinite(ent2.min(axis=0)), l2, C)
        l1 = np.where(np.isfinite(l1e), l1, C)
        mask = np.isfinite(gent).T  # (N, G) entered-group bitmask (prepass)
        mask_bits = np.packbits(mask, axis=1)
        mask_key = np.array([bytes(r) for r in mask_bits])
        lmask = np.isfinite(lent).T
        lmask_bits = np.packbits(lmask, axis=1)
        lmask_key = np.array([bytes(r) for r in lmask_bits])
        imask = np.isfinite(ent).T  # ideal-bound mask (oracle upper bound)
        imask_key = np.array([bytes(r) for r in np.packbits(imask, axis=1)])
        # First-K entered leaf ids in *id* order — the sort-friendly
        # approximation of mask-lex (per-ray sets average ~2 leaves, so K=4
        # captures nearly every set whole). Missing slots fill with C.
        def first_k(m, K):
            ids = np.where(m, np.arange(m.shape[1])[None, :], m.shape[1])
            ids.sort(axis=1)
            return [ids[:, j] for j in range(K)]

        f4 = first_k(lmask, 4)
        f6 = first_k(lmask, 6)

        rng = np.random.default_rng(3)
        octant = (d[:, 0] >= 0) * 4 + (d[:, 1] >= 0) * 2 + (d[:, 2] >= 0)
        morton = ((o - o.min(0)) / (np.ptp(o, 0) + 1e-9) * 127).astype(np.int64)
        blk = (morton[:, 0] << 14) | (morton[:, 1] << 7) | morton[:, 2]

        score(np.argsort(rng.permutation(N), kind="stable"), ent, C, "random", G)
        score(np.lexsort((blk, octant, g2, g1)), ent, C, "g1,g2 chain (CURRENT)", G)
        score(np.lexsort((lmask_key,)), ent, C, "leaf-mask lex (line)", G)
        score(np.lexsort((imask_key,)), ent, C, "leaf-mask lex (IDEAL oracle)", G)
        score(np.lexsort((blk, octant) + tuple(reversed(f4))), ent, C,
              "first-4 leaf ids", G)
        score(np.lexsort((blk, octant) + tuple(reversed(f6))), ent, C,
              "first-6 leaf ids", G)
        score(np.lexsort(tuple(reversed(f4))), ent, C, "first-4 (no tiebreak)", G)

        # Group-level variants: everything below needs only the (G, N)
        # slab pass the production key already pays (16x cheaper than the
        # leaf-level (C, N) pass the keys above require).
        gent3 = gent2.copy()
        gent3[np.minimum(g2, G - 1), np.arange(N)] = np.inf
        g3 = np.argmin(gent3, axis=0)
        g3 = np.where(np.isfinite(gent3.min(axis=0)), g3, G)
        gent4 = gent3.copy()
        gent4[np.minimum(g3, G - 1), np.arange(N)] = np.inf
        g4 = np.argmin(gent4, axis=0)
        g4 = np.where(np.isfinite(gent4.min(axis=0)), g4, G)
        score(np.lexsort((blk, octant, g4, g3, g2, g1)), ent, C,
              "g1..g4 chain (entry order)", G)
        gf4 = first_k(mask, 4)
        score(np.lexsort((blk, octant) + tuple(reversed(gf4))), ent, C,
              "group first-4 (id order)", G)
        score(np.lexsort((blk, octant, mask_key)), ent, C,
              "group-mask lex", G)
        score(np.lexsort((blk, octant, g2, g1, mask_key)), ent, C,
              "group-mask lex, g1,g2 major", G)


if __name__ == "__main__":
    main()
