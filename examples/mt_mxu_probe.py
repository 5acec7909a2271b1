"""Numerical validation of the MXU Moller-Trumbore formulation (round 5).

The BVH union sweep's per-leaf MT chain is ~49 VPU ops/(tri,ray) pair. All
four MT numerators are LINEAR in a 10-feature per-lane vector once the
per-triangle constants are precomputed (Plucker-style):

  phi  = [d(3), w' = (o-g) x d (3), o' = o-g (3), 1]     (g = group centroid)
  a    = det[e1, d, e2]      =  (e2 x e1) . d
  s.h  = (o'-v0').(d x e2)   =  e2 . w'        - (e2 x v0') . d
  d.q  = d.((o'-v0') x e1)   = -e1 . w'        + (e1 x v0') . d
  e2.q = (o'-v0').(e1 x e2)  =  Ne . o' - Ne.v0'           (Ne = e1 x e2)

so one (4P, K) @ (K, W) MXU dot per leaf replaces the VPU chain, leaving
~13 VPU ops/pair (reciprocal, 3 muls, compares). This probe checks, on the
real 70k-triangle knot with realistic rays, how far the bf16x3 split-block
dot (the _trunc_split3 scheme proven on the sphere quadratic tables,
pallas_shade.py:1234-1257) sits from the f32 VPU chain and from f64 truth:

  * relative error of a, u, v, t vs f64
  * acceptance-decision flips vs the f32 VPU chain (knife-edge budget)
  * closest-hit prim/t disagreements on full leaf sweeps

Run on CPU: python examples/mt_mxu_probe.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pathtrace_tpu.models import scenes

N = 16384
PRIM = 128


def trunc_split3(a):
    a = a.astype(np.float32)
    ui = a.view(np.uint32)
    b0 = (ui & np.uint32(0xFFFF0000)).view(np.float32)
    r1 = a - b0
    b1 = (r1.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
    b2 = r1 - b1
    return b0, b1, b2


def split_dot(C, phi):
    """Emulate the TPU 6-block bf16 split dot: C (M, K) f32 coeffs,
    phi (K, W) f32 features -> (M, W) f32 with bf16-rounded operands per
    block and f32 accumulation (MXU semantics)."""
    c0, c1, c2 = trunc_split3(C)
    p0, p1, p2 = trunc_split3(phi)
    blocks = [(c0, p0), (c0, p1), (c0, p2), (c1, p0), (c1, p1), (c2, p0)]
    acc = np.zeros((C.shape[0], phi.shape[1]), np.float32)
    for cb, pb in blocks:
        acc += cb.astype(np.float32) @ pb.astype(np.float32)
    return acc


def mt_vpu_f32(v0, e1, e2, o, d):
    """The kernel's exact f32 MT op order (pallas_intersect._mt_ts)."""
    f32 = np.float32
    v0, e1, e2, o, d = (x.astype(f32) for x in (v0, e1, e2, o, d))
    hx = d[:, 1, None] * e2[None, :, 2] - d[:, 2, None] * e2[None, :, 1]
    hy = d[:, 2, None] * e2[None, :, 0] - d[:, 0, None] * e2[None, :, 2]
    hz = d[:, 0, None] * e2[None, :, 1] - d[:, 1, None] * e2[None, :, 0]
    a = e1[None, :, 0] * hx + e1[None, :, 1] * hy + e1[None, :, 2] * hz
    f = f32(1.0) / a
    sx = o[:, 0, None] - v0[None, :, 0]
    sy = o[:, 1, None] - v0[None, :, 1]
    sz = o[:, 2, None] - v0[None, :, 2]
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1[None, :, 2] - sz * e1[None, :, 1]
    qy = sz * e1[None, :, 0] - sx * e1[None, :, 2]
    qz = sx * e1[None, :, 1] - sy * e1[None, :, 0]
    v = f * (d[:, 0, None] * qx + d[:, 1, None] * qy + d[:, 2, None] * qz)
    t = f * (e2[None, :, 0] * qx + e2[None, :, 1] * qy + e2[None, :, 2] * qz)
    return a, u, v, t


def mt_mxu(v0, e1, e2, o, d, g):
    """The proposed MXU path: coeff table in f32 (built f64->f32), split dot."""
    f32 = np.float32
    v0p = (v0 - g).astype(f32).astype(np.float64)
    e1 = e1.astype(f32).astype(np.float64)
    e2 = e2.astype(f32).astype(np.float64)
    ne = np.cross(e1, e2)
    # Coefficient rows (built in f64, stored f32 — XLA-land table build).
    Ca = np.concatenate([np.cross(e2, e1), np.zeros_like(ne), np.zeros_like(ne),
                         np.zeros((len(v0), 1))], axis=1)
    Csh = np.concatenate([-np.cross(e2, v0p), e2, np.zeros_like(ne),
                          np.zeros((len(v0), 1))], axis=1)
    Cdq = np.concatenate([np.cross(e1, v0p), -e1, np.zeros_like(ne),
                          np.zeros((len(v0), 1))], axis=1)
    Ctq = np.concatenate([np.zeros_like(ne), np.zeros_like(ne), ne,
                          -(ne * v0p).sum(1, keepdims=True)], axis=1)
    C = np.concatenate([Ca, Csh, Cdq, Ctq], axis=0).astype(f32)  # (4P, 10)

    op = (o - g).astype(f32)
    df = d.astype(f32)
    w = np.cross(op, df).astype(f32)
    phi = np.concatenate([df, w, op, np.ones((len(o), 1), f32)], axis=1).T
    out = split_dot(C, phi.astype(f32))               # (4P, W)
    P = len(v0)
    a = out[:P].T
    f = f32(1.0) / a
    u = f * out[P:2 * P].T
    v = f * out[2 * P:3 * P].T
    t = f * out[3 * P:].T
    return a, u, v, t


def main():
    scene = scenes.mesh_scene()
    v0 = np.asarray(scene.tri_v0, np.float64)
    e1 = np.asarray(scene.tri_e1, np.float64)
    e2 = np.asarray(scene.tri_e2, np.float64)
    T = v0.shape[0]
    rng = np.random.default_rng(11)

    # Rays aimed at random triangle interior points from random nearby origins
    # (guarantees a dense mix of hits and near-misses).
    ti = rng.integers(0, T, N)
    uu = rng.random(N); vv = rng.random(N)
    flip = uu + vv > 1
    uu = np.where(flip, 1 - uu, uu); vv = np.where(flip, 1 - vv, vv)
    target = v0[ti] + uu[:, None] * e1[ti] + vv[:, None] * e2[ti]
    o = target + rng.normal(size=(N, 3)) * 2.0
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    flips_total = 0
    err = {k: 0.0 for k in "auvt"}
    t_hit_vpu = np.full(N, np.inf)
    t_hit_mxu = np.full(N, np.inf)
    p_hit_vpu = np.full(N, -1)
    p_hit_mxu = np.full(N, -1)
    n_acc = 0
    for base in range(0, T - PRIM + 1, PRIM)[:]:
        sl = slice(base, base + PRIM)
        g = (v0[sl].min(0) + v0[sl].max(0)) / 2
        a64, u64, v64, t64 = (x.astype(np.float64) for x in mt_vpu_f32(
            v0[sl].astype(np.float64), e1[sl], e2[sl], o, d))
        # f64 truth
        def mt64(v0s, e1s, e2s):
            h = np.cross(d[:, None, :], e2s[None])
            a = (e1s[None] * h).sum(-1)
            s = o[:, None, :] - v0s[None]
            u = (s * h).sum(-1) / a
            q = np.cross(s, e1s[None])
            v = (d[:, None, :] * q).sum(-1) / a
            t = (e2s[None] * q).sum(-1) / a
            return a, u, v, t
        aT, uT, vT, tT = mt64(v0[sl], e1[sl], e2[sl])
        av, uv_, vv_, tv = mt_vpu_f32(v0[sl], e1[sl], e2[sl], o, d)
        am, um, vm, tm = mt_mxu(v0[sl], e1[sl], e2[sl], o, d, g)

        def acc(a, u, v, t):
            return (np.abs(a) >= 1e-8) & (u >= 0) & (u <= 1) & (v >= 0) & \
                   (u + v <= 1) & (t >= 1e-3)
        A_v = acc(av, uv_, vv_, tv)
        A_m = acc(am, um, vm, tm)
        flips_total += int((A_v != A_m).sum())
        n_acc += A_v.size
        scale = np.abs(aT) + 1e-30
        err["a"] = max(err["a"], np.nanmax(np.abs(am - aT) / scale))
        hitT = acc(aT, uT, vT, tT)
        if hitT.any():
            for k, m_, T_ in (("u", um, uT), ("v", vm, vT), ("t", tm, tT)):
                err[k] = max(err[k], np.nanmax(np.abs((m_ - T_))[hitT]))
        tv_w = np.where(A_v, tv, np.inf)
        tm_w = np.where(A_m, tm, np.inf)
        jv = tv_w.argmin(1); jm = tm_w.argmin(1)
        bv = tv_w[np.arange(N), jv]; bm = tm_w[np.arange(N), jm]
        upd = bv < t_hit_vpu
        p_hit_vpu = np.where(upd, base + jv, p_hit_vpu)
        t_hit_vpu = np.minimum(t_hit_vpu, bv)
        updm = bm < t_hit_mxu
        p_hit_mxu = np.where(updm, base + jm, p_hit_mxu)
        t_hit_mxu = np.minimum(t_hit_mxu, bm)

    prim_diff = int((p_hit_vpu != p_hit_mxu).sum())
    both = np.isfinite(t_hit_vpu) & np.isfinite(t_hit_mxu)
    t_rel = np.abs(t_hit_vpu - t_hit_mxu)[both] / np.maximum(t_hit_vpu[both], 1e-9)
    print(f"pairs tested: {n_acc:.3e}  acceptance flips vs VPU-f32: "
          f"{flips_total} ({flips_total / n_acc:.2e})")
    print(f"max |a| rel err vs f64: {err['a']:.2e}  "
          f"max |u,v| abs err on hits: {max(err['u'], err['v']):.2e}  "
          f"max |t| abs err on hits: {err['t']:.2e}")
    print(f"closest-hit prim disagreements: {prim_diff}/{N} "
          f"({prim_diff / N:.2e}); max rel t diff where both hit: "
          f"{t_rel.max() if both.any() else 0:.2e}")
    print(f"hit rate vpu {np.isfinite(t_hit_vpu).mean():.3f} "
          f"mxu {np.isfinite(t_hit_mxu).mean():.3f}")


if __name__ == "__main__":
    main()
