"""Measure the chip's effective VPU f32 throughput ceiling.

Speed-of-light probe for the intersection kernels (docs/PERFORMANCE.md):
a Pallas kernel iterates a fused multiply-add chain on a VMEM-resident
(256, 1024) f32 block — the same operand shape as one (cluster, ray-tile)
sweep step — with no HBM traffic inside the timed loop. The measured
FMA/s is the ceiling against which the sweeps' pair-test rate is judged.

Four independent chains hide the FMA latency; K iterations amortize kernel
entry. Prints ops/s counting one multiply-add as TWO flops.
"""

import functools
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

ROWS, LANES = 256, 1024
K = 512  # fma-chain iterations per kernel call


def _kernel(x_ref, o_ref):
    x = x_ref[:, :]
    a0 = x
    a1 = x * 1.0001
    a2 = x * 0.9999
    a3 = x + 0.1

    def body(i, carry):
        a0, a1, a2, a3 = carry
        # 4 independent FMA chains (latency hiding); multipliers chosen so
        # values stay finite.
        a0 = a0 * 1.000001 + 0.5
        a1 = a1 * 0.999999 - 0.5
        a2 = a2 * 1.000002 + 0.25
        a3 = a3 * 0.999998 - 0.25
        return a0, a1, a2, a3

    a0, a1, a2, a3 = jax.lax.fori_loop(0, K, body, (a0, a1, a2, a3))
    o_ref[:, :] = a0 + a1 + a2 + a3


@functools.partial(jax.jit)
def run(x):
    return pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )(x)


def main():
    print(jax.devices())
    x = jnp.ones((ROWS, LANES), jnp.float32) * 0.5
    run(x).block_until_ready()  # compile
    reps = 50
    best = float("inf")
    for r in range(5):
        xs = [x + 1e-6 * (r * reps + i) for i in range(reps)]
        t0 = time.perf_counter()
        outs = [run(xi) for xi in xs]
        float(jnp.sum(outs[-1]))
        dt = (time.perf_counter() - t0) / reps
        best = min(best, dt)
    fmas = ROWS * LANES * K * 4
    print(
        f"per-call {best*1e6:.1f} us  "
        f"FMA/s {fmas/best:.3e}  f32 flops/s {2*fmas/best:.3e}"
    )


if __name__ == "__main__":
    main()
