"""In-kernel MXU offload experiments for the sphere closest-hit kernel.

The single-tile sphere kernel spends ~1/3 of its per-pair ops on the winner
resolve (one-hot masked sum-select of 5 per-sphere columns) and ~1/3 on the
ray-sphere coupling dots (cd, co). Both are matmul-shaped; this measures
whether handing them to the MXU (concurrent with the VPU quadratic) wins.

Variant A: current kernel (VPU everything)
Variant B: winner resolve as (5,P)@(P,R) dot    [exact: one-hot operand]
Variant C: B + coupling terms as (P,3)@(3,2R) dot
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.models import scenes
from pathtrace_tpu.ops import pallas_intersect as pk

N = 16384
REPS = 200
_INF = float("inf")


def _kernel(o_ref, d_ref, tmin_ref, tmax_ref, c_ref, k_ref, aux_ref,
            t_ref, i_ref, n_ref, m_ref, *, mode):
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_min = tmin_ref[0:1, :]
    t_max = tmax_ref[0:1, :]
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz

    cx = c_ref[:, 0:1]
    cy = c_ref[:, 1:2]
    cz = c_ref[:, 2:3]
    k = k_ref[:, 0:1]
    inv_r = aux_ref[:, 0:1]
    matid = aux_ref[:, 1:2]

    if mode >= 2:
        # coupling terms on the MXU: (P,3) @ (3, 2R) -> [cd | co]
        rays = jnp.concatenate(
            [jnp.concatenate([dx, ox], 1),
             jnp.concatenate([dy, oy], 1),
             jnp.concatenate([dz, oz], 1)], axis=0)     # (3, 2R)
        both = jax.lax.dot_general(
            c_ref[:, 0:3], rays, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        R = dx.shape[1]
        cd = both[:, :R]
        co = both[:, R:]
    else:
        cd = cx * dx + cy * dy + cz * dz
        co = cx * ox + cy * oy + cz * oz

    half_b = od - cd
    c = oo - 2.0 * co + k
    disc = half_b * half_b - c
    sq = jnp.sqrt(disc)
    root1 = -half_b - sq
    t_c = jnp.where(root1 >= t_min, root1, -half_b + sq)
    ok = (t_c >= t_min) & (t_c <= t_max)
    ts = jnp.where(ok, t_c, _INF)

    tmin_tile = jnp.min(ts, axis=0, keepdims=True)
    arg = jnp.argmin(ts, axis=0).astype(jnp.int32)[None, :]
    hit = tmin_tile < _INF

    row_iota = jax.lax.broadcasted_iota(jnp.int32, ts.shape, 0)
    mask_f = ((row_iota == arg) & hit).astype(ts.dtype)

    if mode >= 1:
        cols = jnp.concatenate([cx, cy, cz, inv_r, matid], axis=1)  # (P,5)
        sel = jax.lax.dot_general(
            cols, mask_f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                     # (5,R)
        scx, scy, scz = sel[0:1, :], sel[1:2, :], sel[2:3, :]
        sir, sm = sel[3:4, :], sel[4:5, :]
    else:
        def selw(col):
            return jnp.sum(mask_f * col, axis=0, keepdims=True)
        scx, scy, scz, sir, sm = (selw(c) for c in (cx, cy, cz, inv_r, matid))

    tt = jnp.where(hit, tmin_tile, 0.0)
    t_ref[:, :] = jnp.where(hit, tmin_tile, _INF)
    i_ref[:, :] = jnp.where(hit, arg, -1)
    n_ref[0:1, :] = (ox + tt * dx - scx) * sir
    n_ref[1:2, :] = (oy + tt * dy - scy) * sir
    n_ref[2:3, :] = (oz + tt * dz - scz) * sir
    m_ref[:, :] = sm.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mode", "ray_tile"))
def sphere_variant(o, d, t_min, t_max, centers, radius, sph_mat,
                   mode=0, ray_tile=1024):
    n = o.shape[0]
    n_pad = pk._cdiv(n, ray_tile) * ray_tile
    s_pad = pk._cdiv(centers.shape[0], 8) * 8
    o_t = pk._pad_rows(o, n_pad).T
    d_t = pk._pad_rows(d, n_pad, fill=1.0).T
    tmin_r = pk._pad_rows(jnp.broadcast_to(t_min, (n,))[:, None], n_pad, fill=_INF).T
    tmax_r = pk._pad_rows(jnp.broadcast_to(t_max, (n,))[:, None], n_pad).T
    c_p = pk._pad_rows(centers, s_pad, fill=1e9)
    k_p = pk._pad_rows(
        jnp.where(radius > 0.0, jnp.sum(centers * centers, -1) - radius * radius,
                  jnp.nan)[:, None], s_pad, fill=float("nan"))
    inv_r = jnp.where(radius > 0, 1.0 / jnp.where(radius > 0, radius, 1.0), 0.0)
    aux = pk._pad_rows(jnp.stack([inv_r, sph_mat.astype(o.dtype)], 1), s_pad)

    grid = (n_pad // ray_tile,)
    t, i, nrm, m = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
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
            jax.ShapeDtypeStruct((1, n_pad), o.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((3, n_pad), o.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
    )(o_t, d_t, tmin_r, tmax_r, c_p, k_p, aux)
    return t[0, :n], i[0, :n], nrm[:, :n].T, m[0, :n]


def timeit(name, fn, inputs):
    def step(carry, i):
        o, d, a, b = inputs
        o = o + carry * 1e-6
        r = fn(o, d, a, b)
        leaf = jax.tree.leaves(r)[0].astype(jnp.float32)
        s = jnp.sum(jnp.where(jnp.isfinite(leaf), leaf, 0.0))
        return carry + s * 1e-20, None
    run = jax.jit(lambda n: jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n))[0],
                  static_argnums=0)
    float(run(2)); float(run(REPS))
    t0 = time.perf_counter(); float(run(2)); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); v = float(run(REPS)); tl = time.perf_counter() - t0
    dt = (tl - ts) / (REPS - 2)
    print(f"{name:44s} {dt*1e3:8.3f} ms/iter  (sink {v:.3g})")


def main():
    scene = scenes.many_spheres()
    key = jax.random.PRNGKey(11)
    o = jax.random.uniform(key, (N, 3), jnp.float32, -3, 3)
    d = jax.random.normal(jax.random.fold_in(key, 1), (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tmin = jnp.full((N,), 1e-3, jnp.float32)
    tmax = jnp.full((N,), jnp.inf, jnp.float32)

    args = (scene.sph_center, scene.sph_radius, scene.sph_mat)
    fa = lambda o, d, a, b: sphere_variant(o, d, a, b, *args, mode=0)
    fb = lambda o, d, a, b: sphere_variant(o, d, a, b, *args, mode=1)
    fc = lambda o, d, a, b: sphere_variant(o, d, a, b, *args, mode=2)

    ta, ia, na, ma = fa(o, d, tmin, tmax)
    tb, ib, nb, mb = fb(o, d, tmin, tmax)
    tc, ic, nc, mc = fc(o, d, tmin, tmax)
    print("B == A:", bool(jnp.all(ia == ib)), float(jnp.nanmax(jnp.abs(
        jnp.where(jnp.isfinite(ta), ta - tb, 0.0)))))
    print("C == A:", bool(jnp.all(ia == ic)), float(jnp.nanmax(jnp.abs(
        jnp.where(jnp.isfinite(ta), ta - tc, 0.0)))))

    timeit("A: VPU everything", fa, (o, d, tmin, tmax))
    timeit("B: winner resolve on MXU", fb, (o, d, tmin, tmax))
    timeit("C: B + coupling dots on MXU", fc, (o, d, tmin, tmax))


if __name__ == "__main__":
    main()
