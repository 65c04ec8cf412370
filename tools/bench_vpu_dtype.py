"""Micro-benchmark: does the v5e VPU run bf16 elementwise math at 2x f32?

Decides whether a bf16 pair-math path in the fused trace kernel
(render_kernel._pair_math, currently VPU-roofline-bound in f32 - RESULTS.md
round 3) is worth the accuracy risk.  Runs a Pallas kernel that loops a
pair-math-shaped op mix (mul/add/sub chains + one exp) over a resident
[256, 512] block REPS times, in f32 and bf16, and prints ns per elementwise
op per lane-row.  Scalar-fetch timed (axon lazy-execution rule).
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--cols", type=int, default=512)
    ap.add_argument("--reps", type=int, default=512,
                    help="in-kernel fori iterations over the block")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C, REPS = args.rows, args.cols, args.reps

    def kernel(x_ref, o_ref, *, dtype):
        x = x_ref[:].astype(dtype)
        half = jnp.asarray(0.5, dtype)

        def body(i, acc):
            # ~12 elementwise ops shaped like the intersection math
            a = acc * x + half
            b = a * a - x
            c = b * acc + a
            d = jnp.maximum(c, half)
            return d * jnp.exp(-jnp.minimum(d, half))

        acc = jax.lax.fori_loop(0, REPS, body, x)
        o_ref[:] = acc.astype(jnp.float32)

    @partial(jax.jit, static_argnames=("dtype",))
    def run(x, dtype):
        out = pl.pallas_call(
            partial(kernel, dtype=dtype),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        )(x)
        return out.sum()  # scalar fetch only

    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (R, C)),
                    jnp.float32)
    results = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        s = float(run(x, dt))  # compile + warmup (forces axon execution)
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(args.iters):
            acc += float(run(x, dt))
        dt_s = (time.perf_counter() - t0) / args.iters
        ops = R * C * REPS * 12
        results[name] = dt_s
        print(f"{name}: {dt_s*1e6:.1f} us/call  "
              f"{ops/dt_s/1e12:.3f} Tops elementwise  (checksum {s:.3e})")
    print(f"bf16 speedup over f32: {results['f32']/results['bf16']:.2f}x")


if __name__ == "__main__":
    main()
