"""Pallas TPU kernel: batched Cholesky + ADMM for the GRF QP.

Why: XLA's batched (4096, 120, 120) Cholesky + triangular solves cost
~125 ms on a v5e — ~85% of the QP solve. This kernel reformulates the whole
factor-and-iterate phase in a robots-in-lanes (structure-of-arrays) layout:

  K stored as (n, n, TR) with TR = 128 robots in the lane dimension.

Every step of the factorization is then a *vector* op across 128 robots on
the VPU — dense linear algebra with no per-robot sequential bottleneck and
no MXU involvement (a 120-wide matvec per robot cannot tile the MXU; 128
robots per lane saturate the VPU instead).

Algorithm (all in one VMEM-resident buffer per robot tile):
 1. Right-looking Cholesky with symmetric rank-1 updates. Because K is
    symmetric and the update outer(col, col) is symmetric, the buffer keeps
    L in the lower triangle and L^T in the upper triangle for free, so both
    the column slice (120,1,TR) and the row slice (1,120,TR) of the pivot
    are available without transposes.
 2. In-place forward substitution producing W = L^-1 in the lower triangle
    (row i of W only overwrites columns <= i, so the upper-triangle L^T
    entries that later rows need as L[i,j] = (L^T)[j,i] stay intact).
 3. OSQP ADMM iterations using x~ = W^T (W rhs): two masked single-pass
    broadcast-multiply-reduce ops per iteration, never touching HBM.

The public entry is `solve_scaled`, a single-robot function wrapped in
jax.custom_vmap: unbatched calls fall back to the XLA path; under vmap the
whole batch runs through this kernel. The Ruiz equilibration, K assembly and
unscaling stay in (cheap) vmapped XLA in ops/qp.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 120          # QP variables (h=10 * 4 legs * 3)
M = 200          # constraints (h*4 blocks of 5)
NB = 40          # constraint blocks
TR = 128         # robots per tile (lane dimension)


def _admm_math(iters: int, sigma: float, relax: float, kinv_apply,
               c_blocks, q_s, l_s, u_s, rho, x, z, y):
    """Shared ADMM iteration body; kinv_apply solves K x = rhs.

    Shapes here are feature-major SoA: q_s (N, tr), c_blocks (NB,5,3,tr),
    bounds/rho/z/y (M, tr). Works for both the in-kernel and reference
    paths.
    """
    rho_inv = 1.0 / rho

    def c_apply(v):       # (N,tr) -> (M,tr)
        v3 = v.reshape(NB, 1, 3, v.shape[-1])
        return jnp.sum(c_blocks * v3, axis=2).reshape(M, v.shape[-1])

    def ct_apply(w):      # (M,tr) -> (N,tr)
        w5 = w.reshape(NB, 5, 1, w.shape[-1])
        return jnp.sum(c_blocks * w5, axis=1).reshape(N, w.shape[-1])

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q_s + ct_apply(rho * z - y)
        x_t = kinv_apply(rhs)
        z_t = c_apply(x_t)
        x_new = relax * x_t + (1.0 - relax) * x
        z_r = relax * z_t + (1.0 - relax) * z
        z_new = jnp.clip(z_r + rho_inv * y, l_s, u_s)
        y_new = y + rho * (z_r - z_new)
        return x_new, z_new, y_new

    return jax.lax.fori_loop(0, iters, body, (x, z, y))


def _chol_admm_kernel(iters: int, sigma: float, relax: float,
                      k_hbm, q_ref, c_ref, l_ref, u_ref, rho_ref,
                      x0_ref, z0_ref, y0_ref,
                      x_out, z_out, y_out,
                      kbuf, sem):
    """One robot tile: K (N,N,TR) DMA'd to VMEM, factored, inverted,
    iterated."""
    t = pl.program_id(0)

    # ---- fetch K tile (manual DMA; single-buffered, no pipelining) -----
    dma = pltpu.make_async_copy(
        k_hbm.at[:, :, pl.ds(t * TR, TR)], kbuf, sem)
    dma.start()
    dma.wait()

    i_row = jax.lax.broadcasted_iota(jnp.int32, (N, 1, 1), 0)   # i index
    j_col = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)   # j index

    # ---- 1. Cholesky (right-looking, symmetric storage) ----------------
    def chol_step(k, _):
        dkk = jax.lax.rsqrt(jnp.maximum(kbuf[pl.ds(k, 1), pl.ds(k, 1), :],
                                        1e-12))      # (1,1,TR) = 1/sqrt
        col = kbuf[:, pl.ds(k, 1), :] * dkk          # (N,1,TR)
        row = kbuf[pl.ds(k, 1), :, :] * dkk          # (1,N,TR)
        col_m = jnp.where(i_row > k, col, 0.0)
        row_m = jnp.where(j_col > k, row, 0.0)
        # write L column k (below diag), diag = sqrt, keep above (L^T)
        diag_val = 1.0 / dkk
        kbuf[:, pl.ds(k, 1), :] = jnp.where(
            i_row > k, col_m,
            jnp.where(i_row == k, diag_val, kbuf[:, pl.ds(k, 1), :]))
        # write L^T row k (right of diag), keep left (L)
        kbuf[pl.ds(k, 1), :, :] = jnp.where(
            j_col > k, row_m,
            jnp.where(j_col == k, diag_val, kbuf[pl.ds(k, 1), :, :]))
        # symmetric rank-1 update of the (k+1:, k+1:) submatrix
        kbuf[:, :, :] = kbuf[:, :, :] - col_m * row_m
        return 0

    jax.lax.fori_loop(0, N, chol_step, 0)

    # ---- 2. in-place W = L^-1 (lower triangle) -------------------------
    # Row i of W = (e_i - sum_{j<i} L[i,j] W[j,:]) / L[i,i], where
    # L[i,j] is read from the upper triangle as (L^T)[j,i] = kbuf[j,i].
    # The W rows living in the buffer still carry stale L^T entries right
    # of their diagonal (those entries are read as L[i,j] by later steps),
    # so the accumulation masks the buffer to its lower triangle, where
    # true W is nonzero.
    lower_tri = (i_row >= j_col).astype(jnp.float32)  # (N,N,1)

    def linv_step(i, _):
        lcol = kbuf[:, pl.ds(i, 1), :]               # (N,1,TR): [j,i]
        lcol_m = jnp.where(i_row < i, lcol, 0.0)     # L[i,j] for j<i
        acc = jnp.sum(lcol_m * (kbuf[:, :, :] * lower_tri), axis=0,
                      keepdims=True)                  # (1,N,TR)
        diag = kbuf[pl.ds(i, 1), pl.ds(i, 1), :]     # L[i,i] (1,1,TR)
        e_i = jnp.where(j_col == i, 1.0, 0.0)
        w_row = (e_i - acc) / diag
        kbuf[pl.ds(i, 1), :, :] = jnp.where(
            j_col <= i, w_row, kbuf[pl.ds(i, 1), :, :])
        return 0

    jax.lax.fori_loop(0, N, linv_step, 0)

    # zero the stale upper-triangle L^T row by row so kinv_apply needs no
    # (N,N) mask (a lane-padded (N,N,1) mask would alone cost 7.4 MB VMEM)
    def clear_upper(i, _):
        kbuf[pl.ds(i, 1), :, :] = jnp.where(
            j_col <= i, kbuf[pl.ds(i, 1), :, :], 0.0)
        return 0

    jax.lax.fori_loop(0, N, clear_upper, 0)

    def kinv_apply(rhs):
        # u = W rhs ; x~ = W^T u  (kbuf now holds exactly W, lower tri)
        u = jnp.sum(kbuf[:, :, :] * rhs.reshape(1, N, TR), axis=1)  # (N,TR)
        xt = jnp.sum(kbuf[:, :, :] * u.reshape(N, 1, TR), axis=0)   # (N,TR)
        return xt

    x, z, y = _admm_math(iters, sigma, relax, kinv_apply,
                         c_ref[:, :, :, :], q_ref[:, :], l_ref[:, :],
                         u_ref[:, :], rho_ref[:, :], x0_ref[:, :],
                         z0_ref[:, :], y0_ref[:, :])
    x_out[:, :] = x
    z_out[:, :] = z
    y_out[:, :] = y


def solve_scaled_batch(k_mat, q_s, c_s, l_s, u_s, rho, x, z, y,
                       iters: int, sigma: float, relax: float,
                       interpret: bool = False):
    """Batched scaled-QP solve via the Pallas kernel.

    Args are batch-major: k_mat (B,N,N), q_s (B,N), c_s (B,NB,5,3),
    l_s/u_s/rho/z/y (B,M), x (B,N). Returns (x,z,y) batch-major.
    """
    b = k_mat.shape[0]
    b_pad = ((b + TR - 1) // TR) * TR

    def pad(a):
        return jnp.pad(a, [(0, b_pad - b)] + [(0, 0)] * (a.ndim - 1))

    # pad K with identity so the factorization stays defined
    k_p = pad(k_mat)
    if b_pad > b:
        eye = jnp.broadcast_to(jnp.eye(N, dtype=k_mat.dtype),
                               (b_pad - b, N, N))
        k_p = k_p.at[b:].set(eye)
    rho_p = pad(rho)
    rho_p = jnp.where(rho_p == 0, 1.0, rho_p)  # padded rows: avoid 1/0

    # to SoA (features major, robots last)
    k_soa = jnp.moveaxis(k_p, 0, -1)                    # (N,N,Bp)
    q_soa = jnp.moveaxis(pad(q_s), 0, -1)               # (N,Bp)
    c_soa = jnp.moveaxis(pad(c_s), 0, -1)               # (NB,5,3,Bp)
    l_soa = jnp.moveaxis(pad(l_s), 0, -1)
    u_soa = jnp.moveaxis(pad(u_s), 0, -1)
    rho_soa = jnp.moveaxis(rho_p, 0, -1)
    x_soa = jnp.moveaxis(pad(x), 0, -1)
    z_soa = jnp.moveaxis(pad(z), 0, -1)
    y_soa = jnp.moveaxis(pad(y), 0, -1)

    grid = (b_pad // TR,)
    vec_spec = lambda d: pl.BlockSpec((d, TR), lambda t: (0, t),
                                      memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((NB, 5, 3, TR), lambda t: (0, 0, 0, t),
                          memory_space=pltpu.VMEM)

    kernel = functools.partial(_chol_admm_kernel, iters, sigma, relax)
    x_o, z_o, y_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # K stays in HBM
            vec_spec(N), c_spec, vec_spec(M), vec_spec(M), vec_spec(M),
            vec_spec(N), vec_spec(M), vec_spec(M),
        ],
        out_specs=(vec_spec(N), vec_spec(M), vec_spec(M)),
        out_shape=(
            jax.ShapeDtypeStruct((N, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((M, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((M, b_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, N, TR), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # kbuf (N*N*TR*4 = 7.4 MB) + one full-size elementwise temporary
            # in kinv_apply + IO blocks
            vmem_limit_bytes=30 * 1024 * 1024),
        interpret=interpret,
    )(k_soa, q_soa, c_soa, l_soa, u_soa, rho_soa, x_soa, z_soa, y_soa)

    x_b = jnp.moveaxis(x_o, -1, 0)[:b]
    z_b = jnp.moveaxis(z_o, -1, 0)[:b]
    y_b = jnp.moveaxis(y_o, -1, 0)[:b]
    return x_b, z_b, y_b
