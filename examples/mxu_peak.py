"""Measure the chip's effective MXU bf16 throughput at the sweep's dot shape.

Speed-of-light probe for the quadratic-form sphere sweeps
(ops/pallas_shade.py): the megakernel and the quad any-hit each issue
(2*CB*NC, 128) @ (128, W) bf16 dots with f32 accumulation. This kernel
iterates exactly that shape on VMEM-resident operands with no HBM traffic in
the timed loop, so the measured FLOP/s is the ceiling the sweeps are judged
against (docs/PERFORMANCE.md speed-of-light section).

Four independent chains hide result latency; each chain's next X depends on
its previous Y so no iteration can be elided. Prints one JSON line.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

M, K, W = 1024, 128, 1024   # the sweep's per-tile dot: 4 blocks x 256 rows
CHAINS = 4
ITERS = 256                 # dots per chain per kernel call


def _kernel(a_ref, x_ref, o_ref):
    a = a_ref[:, :]

    def one(x):
        y = jax.lax.dot_general(
            a, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                    # (M, W) f32
        # Feed the top K rows back as the next operand — a real data
        # dependency the compiler cannot elide; the cast is the same
        # bf16 rounding the production sweep's operands pay.
        return y[:K, :].astype(jnp.bfloat16)

    chains = tuple(
        x_ref[:, :] * jnp.bfloat16(1.0 + 0.001 * c) for c in range(CHAINS)
    )

    def body(i, carry):
        return tuple(one(x) for x in carry)

    chains = jax.lax.fori_loop(0, ITERS, body, chains)
    acc = chains[0].astype(jnp.float32)
    for c in chains[1:]:
        acc = acc + c.astype(jnp.float32)
    o_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=())
def run(a, x):
    return pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, W), jnp.float32),
    )(a, x)


def main() -> None:
    key = jax.random.PRNGKey(0)
    a = (jax.random.normal(key, (M, K)) * 0.1).astype(jnp.bfloat16)
    x = (jax.random.normal(jax.random.fold_in(key, 1), (K, W)) * 0.1).astype(
        jnp.bfloat16
    )
    float(jnp.sum(run(a, x)))  # compile + warm
    reps = 8
    t0 = time.perf_counter()
    s = 0.0
    for r in range(reps):
        s += float(jnp.sum(run(a * jnp.bfloat16(1.0 + 0.01 * r), x)))
    dt = time.perf_counter() - t0
    flops = 2.0 * M * K * W * ITERS * CHAINS * reps
    print(json.dumps({
        "dot_shape": f"({M},{K})@({K},{W})",
        "tflops": round(flops / dt / 1e12, 1),
        "wall_s": round(dt, 3),
        "per_dot_us": round(dt / (ITERS * CHAINS * reps) * 1e6, 2),
        "checksum": s,
    }))


if __name__ == "__main__":
    main()
