"""Minimal Mosaic probe: sphere-quadratic disc via bf16-split MXU dot vs the
VPU half-b chain, inside ONE Pallas kernel, on the real TPU.

Isolates the megakernel's use_quad path: if the two disagree structurally
here, the bug is in the Mosaic dot lowering / table handling, not in the
megakernel plumbing.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.models import scenes
from pathtrace_tpu.ops import pallas_shade as ps


def _kernel(o_ref, d_ref, sph_ref, quad_ref, quadg_ref, mxu_ref, vpu_ref,
            hb_mxu_ref, hb_vpu_ref):
    import pathtrace_tpu.ops.pallas_shade as ps
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz

    one_r = jnp.ones_like(ox)
    zpad = jnp.zeros((ps._QUAD_K - 6 * ps._QUAD_FEATS, ox.shape[1]), ox.dtype)
    n_blocks = quad_ref.shape[0] // (2 * ps._QUAD_CB)
    disc_b, hb_b = [], []
    for c in range(n_blocks):
        gx = quadg_ref[c:c + 1, 0:1]
        gy = quadg_ref[c:c + 1, 1:2]
        gz = quadg_ref[c:c + 1, 2:3]
        oxc, oyc, ozc = ox - gx, oy - gy, oz - gz
        odc = oxc * dx + oyc * dy + ozc * dz
        ooc = oxc * oxc + oyc * oyc + ozc * ozc
        phi = jnp.concatenate([
            dx * dx, dy * dy, dz * dz, dx * dy, dx * dz, dy * dz,
            odc * dx, odc * dy, odc * dz, oxc, oyc, ozc,
            odc * odc - ooc, one_r, dx, dy, dz,
        ], axis=0)
        p0, p1, p2 = ps._bf16_split3(phi)
        phi_ext = jnp.concatenate(
            [p0, p1, p2, p0, p1, p0, zpad], axis=0
        ).astype(jnp.bfloat16)
        base = c * 2 * ps._QUAD_CB
        pairs = jax.lax.dot_general(
            quad_ref[base:base + 2 * ps._QUAD_CB, :], phi_ext,
            (((1,), (0,)), ((), ())), preferred_element_type=ox.dtype,
        )
        disc_b.append(pairs[:ps._QUAD_CB, :])
        hb_b.append(odc - pairs[ps._QUAD_CB:, :])
    p_rows = sph_ref.shape[0]
    mxu_ref[:, :] = jnp.concatenate(disc_b, axis=0)[:p_rows, :]
    hb_mxu_ref[:, :] = jnp.concatenate(hb_b, axis=0)[:p_rows, :]

    cx = sph_ref[:, 0:1]; cy = sph_ref[:, 1:2]; cz = sph_ref[:, 2:3]
    kq = sph_ref[:, 3:4]
    cd = cx * dx + cy * dy + cz * dz
    co = cx * ox + cy * oy + cz * oz
    half_b = od - cd
    cterm = oo - 2.0 * co + kq
    vpu_ref[:, :] = half_b * half_b - cterm
    hb_vpu_ref[:, :] = half_b


def main():
    sc = scenes.many_spheres()
    tables = ps.build_tables(sc)
    P = tables.sph.shape[0]
    W = 256
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (3, W), minval=-60., maxval=60.)
    d = jax.random.normal(jax.random.fold_in(key, 1), (3, W))
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)

    outs = pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((P, W), jnp.float32)] * 4,
        interpret="--interpret" in sys.argv,
    )(o, d, tables.sph, tables.quad, tables.quadg)
    mxu, vpu, cd_m, cd_v = (np.asarray(x) for x in outs)
    dd = np.abs(mxu - vpu)
    dc = np.abs(cd_m - cd_v)
    print("disc: max abs diff", np.nanmax(dd), "mean", np.nanmean(dd))
    print("hb  : max abs diff", np.nanmax(dc), "mean", np.nanmean(dc))
    i, j = np.unravel_index(np.nanargmax(dd), dd.shape)
    print("worst disc at sphere", i, "ray", j, ":", mxu[i, j], "vs", vpu[i, j])
    i, j = np.unravel_index(np.nanargmax(dc), dc.shape)
    print("worst cd at sphere", i, "ray", j, ":", cd_m[i, j], "vs", cd_v[i, j])
    # per-sphere-row error profile (is it row-structured?)
    rowmax = np.nanmax(dd, axis=1)
    bad = np.argsort(-rowmax)[:10]
    print("worst rows:", bad.tolist(), rowmax[bad].tolist())


if __name__ == "__main__":
    main()
