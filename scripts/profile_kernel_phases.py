"""In-kernel phase timing for the fused QP kernel: stripped pallas_call
variants isolate DMA, masking, Ruiz, K assembly, Gauss-Jordan and ADMM.

Also A/Bs the HBM tile layout: lane-sliced SoA DMA (production) vs
batch-major contiguous DMA + in-VMEM transpose.
"""
import os, time, json, functools
import jax
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rl_mpc_locomotion_tpu.ops.pallas import admm_kernel
from rl_mpc_locomotion_tpu.ops.pallas.fused_qp import _ruiz_in_vmem

N, M, NB, TR = admm_kernel.N, admm_kernel.M, admm_kernel.NB, admm_kernel.TR
B = 4096


def timeit(body, q0, iters=20):
    """In-executable slope timing: ``body`` maps chained q -> next q and is
    repeated with lax.fori_loop INSIDE one jit (the axon relay's
    block_until_ready is unreliable for dispatch-level chaining — repeated
    kernels must live in a single executable to be timed). Per-call cost
    is the slope between a 3-rep and a (3+iters)-rep executable."""

    def make(k):
        @jax.jit
        def run(q, *ex):
            return jax.lax.fori_loop(0, k, lambda i, qq: body(qq, *ex), q)
        return run

    short, long_ = make(3), make(3 + iters)
    jax.block_until_ready(short(q0[0], *q0[1:]))
    jax.block_until_ready(long_(q0[0], *q0[1:]))
    t0 = time.perf_counter()
    jax.block_until_ready(short(q0[0], *q0[1:]))
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(long_(q0[0], *q0[1:]))
    t_l = time.perf_counter() - t0
    return (t_l - t_s) / iters * 1000.0


def make_variant(stage: str):
    """stage in dma, mask, ruiz, kgj, admm1, admm50."""

    def kern(p_hbm, q_ref, c_ref, x_out, kbuf, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(p_hbm.at[:, :, pl.ds(t * TR, TR)],
                                    kbuf, sem)
        dma.start()
        dma.wait()
        q = q_ref[:, :]
        if stage == "dma":
            x_out[:, :] = q + kbuf[0, :, :]
            return
        mask = jnp.ones((N, TR), jnp.float32)
        kbuf[:, :, :] = (kbuf[:, :, :] * mask.reshape(N, 1, TR)
                         * mask.reshape(1, N, TR))
        iota_i = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
        on_diag = (iota_i == iota_j).astype(jnp.float32)
        kbuf[:, :, :] = kbuf[:, :, :] + on_diag * (1.0 - mask).reshape(1, N, TR)
        if stage == "mask":
            x_out[:, :] = q + kbuf[0, :, :]
            return
        cs = c_ref[:, :, :, :]
        q_s, cs, d, e, c_cost = _ruiz_in_vmem(kbuf, q, cs, 3)
        if stage == "ruiz":
            x_out[:, :] = q_s + kbuf[0, :, :]
            return
        rho = jnp.full((M, TR), 0.1, jnp.float32)
        rho_b = rho.reshape(NB, 5, 1, TR)
        a_blk = cs * rho_b
        blk = sum(a_blk[:, mm:mm + 1, :, :].reshape(NB, 3, 1, TR)
                  * cs[:, mm:mm + 1, :, :].reshape(NB, 1, 3, TR)
                  for mm in range(5))
        eye3 = jnp.eye(3, dtype=jnp.float32).reshape(1, 3, 3, 1)
        blk = blk + 1e-6 * eye3
        for k in range(NB):
            r0 = 3 * k
            kbuf[r0:r0 + 3, r0:r0 + 3, :] = (
                kbuf[r0:r0 + 3, r0:r0 + 3, :]
                + blk[k:k + 1, :, :, :].reshape(3, 3, TR))
        admm_kernel.gj_invert_inplace(kbuf)
        if stage == "kgj":
            x_out[:, :] = q_s + kbuf[0, :, :]
            return
        n_it = 1 if stage == "admm1" else 50

        def kinv_apply(rhs):
            return jnp.sum(kbuf[:, :, :] * rhs.reshape(1, N, TR), axis=1)

        x = jnp.zeros((N, TR), jnp.float32)
        z = jnp.zeros((M, TR), jnp.float32)
        y = jnp.zeros((M, TR), jnp.float32)
        lb = jnp.full((M, TR), -1.0, jnp.float32)
        ub = jnp.full((M, TR), 1.0, jnp.float32)
        x, z, y = admm_kernel._admm_math(n_it, 1e-6, 1.6, kinv_apply, cs,
                                         q_s, lb, ub, rho, x, z, y)
        x_out[:, :] = x

    vec_spec = lambda dim: pl.BlockSpec((dim, TR), lambda t: (0, t),
                                        memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((NB, 5, 3, TR), lambda t: (0, 0, 0, t),
                          memory_space=pltpu.VMEM)

    def run(q_soa, p_soa, c_soa):
        # traceable body (no jit) — repeated by timeit's in-jit fori_loop
        out = pl.pallas_call(
            kern, grid=(B // TR,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), vec_spec(N), c_spec],
            out_specs=vec_spec(N),
            out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
            scratch_shapes=[pltpu.VMEM((N, N, TR), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=48 * 1024 * 1024),
        )(p_soa, q_soa, c_soa)
        return 1e-12 * out  # next chained q

    return run


def make_bm_dma(transpose: bool):
    """Batch-major P (B, N, N): contiguous tile DMA, optional in-VMEM
    transpose to (N, N, TR)."""

    def kern(p_hbm, q_ref, x_out, *scratch):
        # p_hbm is (B, N, NP128): minor dim padded to the 128 lane tiling
        # so the batch-major tile slice is Mosaic-legal
        ptile, sem = scratch[0], scratch[-1]
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(p_hbm.at[pl.ds(t * TR, TR), :, :],
                                    ptile, sem)
        dma.start()
        dma.wait()
        if transpose:
            kbuf = scratch[1]
            kbuf[:, :, :] = jnp.transpose(ptile[:, :, :], (1, 2, 0))
            x_out[:, :] = q_ref[:, :] + kbuf[0, :N, :]
        else:
            x_out[:, :] = q_ref[:, :] + jnp.transpose(ptile[:, :, 0], (1, 0))

    vec_spec = lambda dim: pl.BlockSpec((dim, TR), lambda t: (0, t),
                                        memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((TR, N, NP128), jnp.float32)]
    if transpose:
        scratch.append(pltpu.VMEM((N, NP128, TR), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA)

    def run(q_soa, p_bm):
        out = pl.pallas_call(
            kern, grid=(B // TR,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), vec_spec(N)],
            out_specs=vec_spec(N),
            out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
        )(p_bm, q_soa)
        return 1e-12 * out

    return run


NP128 = 128
key = jax.random.PRNGKey(0)
p_bm = jax.random.normal(key, (B, N, N), jnp.float32)
p_bm_pad = jnp.pad(p_bm, ((0, 0), (0, 0), (0, NP128 - N)))
p_soa = jnp.moveaxis(p_bm, 0, -1) + 0.0
c_soa = jnp.ones((NB, 5, 3, B), jnp.float32) * 0.3
p_soa, p_bm_pad, c_soa = jax.block_until_ready((p_soa, p_bm_pad, c_soa))

q_init = jnp.zeros((N, B), jnp.float32)
res = {}
for stage in ("dma", "mask", "ruiz", "kgj", "admm1", "admm50"):
    f = make_variant(stage)
    res[stage + "_ms"] = timeit(f, (q_init, p_soa, c_soa))
    print(stage, round(res[stage + "_ms"], 2), flush=True)
res["bm_dma_ms"] = timeit(make_bm_dma(False), (q_init, p_bm_pad))
print("bm_dma", round(res["bm_dma_ms"], 2), flush=True)
res["bm_dma_T_ms"] = timeit(make_bm_dma(True), (q_init, p_bm_pad))
print(json.dumps({k: round(v, 2) for k, v in res.items()}))
