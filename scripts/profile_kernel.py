"""Time the Pallas GJ+ADMM kernel alone on synthetic SPD data.

Modes (--mode):
  static  - same inputs every call (XLA may elide nothing; baseline)
  fresh   - a new gradient vector each call + checksum (defeats caching)
  chained - each call consumes the previous solution (serialized stream)
  iter0   - iters=0: measures transpose + DMA + Gauss-Jordan factor only
All modes also report per-ADMM-iteration cost from a (50-iter - 10-iter)/40
difference where applicable.
"""
import argparse
import json
import os
import time

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.ops.pallas.admm_kernel import solve_scaled_batch, N, M, NB


def make_data(batch):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    a = jax.random.normal(ks[0], (batch, N, N)) * 0.1
    k_mat = jnp.einsum("bij,bkj->bik", a, a) + 5.0 * jnp.eye(N)
    q = jax.random.normal(ks[1], (batch, N))
    c = jax.random.normal(ks[2], (batch, NB, 5, 3))
    l = -jnp.abs(jax.random.normal(ks[3], (batch, M))) - 1.0
    u = jnp.abs(jax.random.normal(ks[4], (batch, M))) + 1.0
    rho = jnp.full((batch, M), 0.1)
    x = jnp.zeros((batch, N))
    z = jnp.zeros((batch, M))
    y = jnp.zeros((batch, M))
    return k_mat, q, c, l, u, rho, x, z, y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fresh",
                    choices=["static", "fresh", "chained", "iter0"])
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    k_mat, q, c, l, u, rho, x, z, y = make_data(args.batch)

    def run(iters):
        f = jax.jit(lambda *a: solve_scaled_batch(
            *a, iters=iters, sigma=1e-6, relax=1.6))
        if args.mode == "chained":
            xs, zs, ys = f(k_mat, q, c, l, u, rho, x, z, y)
            float(xs.sum())
            t0 = time.perf_counter()
            for _ in range(args.reps):
                xs, zs, ys = f(k_mat, q, c, l, u, rho, xs, zs, ys)
            float(xs.sum())
            return (time.perf_counter() - t0) / args.reps * 1000.0
        if args.mode == "fresh":
            qs = [jax.random.normal(jax.random.PRNGKey(100 + i),
                                    (args.batch, N)) for i in range(args.reps)]
            out = f(k_mat, qs[0], c, l, u, rho, x, z, y)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            sums = [f(k_mat, qs[i], c, l, u, rho, x, z, y)[0].sum()
                    for i in range(args.reps)]
            jax.block_until_ready(sums)
            return (time.perf_counter() - t0) / args.reps * 1000.0
        out = f(k_mat, q, c, l, u, rho, x, z, y)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(k_mat, q, c, l, u, rho, x, z, y)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps * 1000.0

    if args.mode == "iter0":
        t = run(0)
        print(json.dumps({"mode": args.mode, "batch": args.batch,
                          "kernel_iter0_ms": round(t, 3)}))
        return
    t50, t10 = run(50), run(10)
    per = (t50 - t10) / 40
    print(json.dumps({
        "mode": args.mode, "batch": args.batch,
        "kernel50_ms": round(t50, 3), "kernel10_ms": round(t10, 3),
        "per_iter_ms": round(per, 4),
        "factor_dma_ms": round(t10 - 10 * per, 3)}))


if __name__ == "__main__":
    main()
