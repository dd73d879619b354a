"""Unified profiling tool for the TPU MPC stack (one flag-driven CLI
replacing the round-1/2 one-off microbenchmarks).

Subcommands:
  period        MPC-period cost attribution through the full control step:
                no-solve tick, production period, ADMM-iteration and Ruiz
                sweeps. Scan-chained chip time at --batch.
  qp-knobs      same attribution through bench.py itself (the most
                end-to-end probe): QP-config knob deltas vs production.
  qp-phases     solve-tick split: XLA prep (A/B -> expm -> condensation ->
                Hessian) vs fused-kernel cost, plus SoA layout overhead.
  kernel        raw Pallas GJ+ADMM kernel on synthetic SPD data
                (static/fresh/chained/iter0 timing modes, per-iter slope).
  kernel-phases in-kernel phase isolation (DMA / mask / Ruiz / K+GJ /
                ADMM) via stripped pallas_call variants, plus the
                batch-major-DMA layout A/B.
  inverse       batched (B,120,120) SPD inverse: in-kernel VPU GJ vs XLA
                (linalg.inv, Cholesky+triangular, blocked-GJ matmuls).
  panels        Gauss-Jordan panel-width sweep (explicit panel_width arg).
  timing-sanity validate the timing harness itself on the axon relay
                (same-input vs fresh vs chained; block_until_ready vs
                host fetch) — run this first when numbers look absurd.

Timing discipline (learned the hard way on the axon TPU relay, see
timing-sanity): the relay memoizes byte-identical dispatches and
block_until_ready is unreliable across executables, so every measurement
here either (a) chains the value INSIDE one jitted executable
(lax.scan/fori_loop) and reports the slope between a short and a long
variant, or (b) chains dispatch outputs into the next call's inputs.
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp


# --------------------------------------------------------------------------
# shared timing helpers
# --------------------------------------------------------------------------

def slope_timeit(body, chain0, iters=20, base=3):
    """In-executable slope timing: ``body`` maps chained value -> next
    chained value; it is repeated with lax.fori_loop inside ONE jit.
    Per-call cost = slope between a ``base``-rep and a (base+iters)-rep
    executable. Extra positional operands ride along untimed."""
    def make(k):
        @jax.jit
        def run(q, *ex):
            return jax.lax.fori_loop(0, k, lambda i, qq: body(qq, *ex), q)
        return run

    short, long_ = make(base), make(base + iters)
    jax.block_until_ready(short(chain0[0], *chain0[1:]))
    jax.block_until_ready(long_(chain0[0], *chain0[1:]))
    t0 = time.perf_counter()
    jax.block_until_ready(short(chain0[0], *chain0[1:]))
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(long_(chain0[0], *chain0[1:]))
    t_l = time.perf_counter() - t0
    return (t_l - t_s) / iters * 1000.0


def chained_dispatch_timeit(step, carry0, reps=5, inner=8):
    """Dispatch-chained timing: ``step`` is one jitted executable whose
    output feeds the next call (so the relay cannot memoize). Returns best
    per-inner-step ms over ``reps`` dispatches; ``step`` itself should scan
    ``inner`` links internally."""
    carry = step(carry0)
    jax.block_until_ready(jax.tree.leaves(carry)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = step(carry)
        jax.block_until_ready(jax.tree.leaves(carry)[0])
        best = min(best, (time.perf_counter() - t0) / inner * 1000.0)
    return best


# --------------------------------------------------------------------------
# control-step fixtures
# --------------------------------------------------------------------------

def control_fixture(batch, qp_cfg):
    from rl_mpc_locomotion_tpu.control import runner
    from rl_mpc_locomotion_tpu.control.types import ControlConfig
    from rl_mpc_locomotion_tpu.models import robots

    params = robots.aliengo_params()
    cfg = ControlConfig(qp=qp_cfg)
    state = jax.vmap(lambda _: runner.init_state(params, cfg))(
        jnp.arange(batch))
    dof_q = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32),
                     (batch, 4)).reshape(batch, 12)
    dof_qd = jnp.zeros((batch, 12), jnp.float32)
    body = jnp.tile(jnp.array([0, 0, 0.35, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0],
                              jnp.float32), (batch, 1))
    commands = jnp.tile(jnp.array([0.5, 0.0, 0.0], jnp.float32), (batch, 1))
    return params, cfg, state, (dof_q, dof_qd, body, commands)


def period_measure(batch, qp_cfg, gates, k=10, reps=6):
    """Scan-chained MPC-period time (ms) for a (gate1, gate2) tick pair."""
    from rl_mpc_locomotion_tpu.control import runner

    params, cfg, state0, io = control_fixture(batch, qp_cfg)

    def tick(state, gate):
        new_state, tau, _ = jax.vmap(
            lambda s, q, qd, b, c: runner.min_step(
                params, cfg, s, q, qd, b, c, solve_gate=gate))(state, *io)
        return new_state, tau

    @jax.jit
    def run(state):
        def period(state, _):
            state, _ = tick(state, jnp.bool_(gates[0]))
            state, tau = tick(state, jnp.bool_(gates[1]))
            return state, tau[0, 0]
        return jax.lax.scan(period, state, None, length=k)

    state, probe = run(state0)
    jax.block_until_ready(probe)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        state, probe = run(state)
        jax.block_until_ready(probe)
        best = min(best, (time.perf_counter() - t0) / k * 1000.0)
    return best


# --------------------------------------------------------------------------
# subcommands
# --------------------------------------------------------------------------

def cmd_period(args):
    from rl_mpc_locomotion_tpu.ops.qp import production_qp_config
    prod = production_qp_config()
    out = {}
    out["no_solve_x2"] = period_measure(args.batch, prod, (False, False))
    out["prod"] = period_measure(args.batch, prod, (False, True))
    for n in args.iters_sweep:
        out[f"iters{n}"] = period_measure(args.batch,
                                          prod._replace(iters=n),
                                          (False, True))
    for r in args.ruiz_sweep:
        out[f"ruiz{r}"] = period_measure(args.batch,
                                         prod._replace(ruiz_iters=r),
                                         (False, True))
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


def cmd_qp_knobs(args):
    from bench import bench
    from rl_mpc_locomotion_tpu.ops.qp import production_qp_config
    prod = production_qp_config()
    variants = {
        "prod": prod,
        "iters1": prod._replace(iters=1),
        "ruiz0": prod._replace(ruiz_iters=0),
        "ruiz1": prod._replace(ruiz_iters=1),
        "norho": prod._replace(deferred_rho=False),
    }
    which = args.variants or list(variants)
    out = {}
    for name in which:
        r = bench(batch=args.batch, qp_cfg=variants[name], iters=20)
        out[name] = r["detail"]["mpc_period_ms"]
        print(name, out[name], flush=True)
    print(json.dumps(out))


def _qp_prep_fns(params, h):
    from rl_mpc_locomotion_tpu.ops import rotations as rot
    from rl_mpc_locomotion_tpu.ops import srb_dynamics as srb

    def prep_ab(rpy, foot_positions, mpc_table, weights, commands, com_z):
        gravity_vec = jnp.array([0.0, 0.0, 1.0], jnp.float32)
        r_feet = (rot.rot_x(rpy[0]).T @ rot.rot_y(rpy[1]).T
                  @ rot.rot_z(rpy[2]).T)
        foot_world = foot_positions @ r_feet.T
        rotation = rot.rpy_to_rot(rpy).T
        inv_inertia = jnp.linalg.inv(params.body_inertia)
        inv_inertia_world = rotation @ inv_inertia @ rotation.T
        a_mat = srb.build_a_mat(rpy, gravity_vec)
        b_mat = srb.build_b_mat(1.0 / params.body_mass, inv_inertia_world,
                                foot_world)
        return srb.discretize_exact(a_mat, b_mat, 0.02)

    def prep_condense(*a):
        a_exp, b_exp = prep_ab(*a)
        return srb.condense(a_exp, b_exp, h)

    def prep_full(rpy, foot_positions, mpc_table, weights, commands, com_z):
        com_position = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), com_z])
        a_exp, b_exp = prep_ab(rpy, foot_positions, mpc_table, weights,
                               commands, com_z)
        a_qp, b_qp = srb.condense(a_exp, b_exp, h)
        x0 = srb.build_state_vec(rpy, com_position, jnp.zeros(3),
                                 jnp.zeros(3))
        x_des = srb.build_desired_states(
            rpy, com_position, jnp.array([0., 0., params.body_height]),
            jnp.array([commands[0], commands[1], 0.]), jnp.zeros(3),
            jnp.array([0., 0., commands[2]]), 0.02, h)
        p_mat, q_vec = srb.build_qp_cost(a_qp, b_qp, x0, x_des, weights,
                                         1e-5, h)
        lb, ub = srb.constraint_bounds(mpc_table, params.body_mass,
                                       params.friction_coeff, h)
        mask = jnp.repeat(mpc_table.reshape(-1), 3)
        return p_mat, q_vec, lb, ub, mask

    return prep_ab, prep_condense, prep_full


def cmd_qp_phases(args):
    from rl_mpc_locomotion_tpu.models import robots
    from rl_mpc_locomotion_tpu.ops import srb_dynamics as srb
    from rl_mpc_locomotion_tpu.ops.pallas.fused_qp import fused_solve_batch

    b, h = args.batch, 10
    params = robots.aliengo_params()
    prep_ab, prep_condense, prep_full = _qp_prep_fns(params, h)

    rpy = jnp.tile(jnp.array([0.01, -0.02, 0.1], jnp.float32), (b, 1))
    foot = jnp.tile(jnp.array([[0.2, -0.15, -0.3], [0.2, 0.15, -0.3],
                               [-0.2, -0.15, -0.3], [-0.2, 0.15, -0.3]],
                              jnp.float32), (b, 1, 1))
    table = jnp.tile((jnp.arange(h * 4).reshape(h, 4) % 2)
                     .astype(jnp.float32), (b, 1, 1))
    w = jnp.tile(jnp.asarray(params.mpc_weights, jnp.float32)[None], (b, 1))
    cmds = jnp.tile(jnp.array([0.5, 0.0, 0.0], jnp.float32), (b, 1))
    com_z = jnp.full((b,), 0.35, jnp.float32)

    def chain_prep(f):
        @jax.jit
        def step(cz):
            out = jax.vmap(f)(rpy, foot, table, w, cmds, cz)
            leaf = jax.tree.leaves(out)[0]
            return 0.35 + 1e-12 * leaf.reshape(b, -1)[:, 0]
        return step

    res = {}
    res["prep_ab_ms"] = slope_timeit(chain_prep(prep_ab), (com_z,))
    print("prep_ab", round(res["prep_ab_ms"], 2), flush=True)
    res["prep_condense_ms"] = slope_timeit(chain_prep(prep_condense),
                                           (com_z,))
    print("prep_condense", round(res["prep_condense_ms"], 2), flush=True)
    res["prep_ms"] = slope_timeit(chain_prep(prep_full), (com_z,))
    print("prep", round(res["prep_ms"], 2), flush=True)

    p, q, lb, ub, mask = jax.block_until_ready(
        jax.jit(jax.vmap(prep_full))(rpy, foot, table, w, cmds, com_z))
    c = jnp.tile(srb.friction_cone_block(params.friction_coeff)[None, None],
                 (b, h * 4, 1, 1))
    x0 = jnp.zeros((b, 120), jnp.float32)
    z0 = jnp.zeros((b, 200), jnp.float32)
    y0 = jnp.zeros((b, 200), jnp.float32)
    rm = jnp.ones((b,), jnp.float32)

    def chain_kernel(iters, ruiz):
        def step(xc):
            out = fused_solve_batch(p, q, c, lb, ub, mask, xc, z0, y0, rm,
                                    iters=iters, sigma=1e-6, relax=1.6,
                                    rho_base=0.1, rho_eq_scale=1e3,
                                    ruiz_iters=ruiz, deferred_rho=True)
            return 1e-6 * out[0]
        return step

    res["kernel_full_ms"] = slope_timeit(chain_kernel(50, 3), (x0,))
    print("kernel_full", round(res["kernel_full_ms"], 2), flush=True)
    res["kernel_i1_ms"] = slope_timeit(chain_kernel(1, 3), (x0,))
    print("kernel_i1", round(res["kernel_i1_ms"], 2), flush=True)
    res["kernel_r0_ms"] = slope_timeit(chain_kernel(1, 0), (x0,))
    print("kernel_r0", round(res["kernel_r0_ms"], 2), flush=True)

    def soa_only(x):
        ps = jnp.moveaxis(p + x[:, :, None] * 1e-20, 0, -1)
        return 1e-12 * ps[0, 0, :][:, None] * jnp.ones((1, 120), jnp.float32)

    res["soa_ms"] = slope_timeit(soa_only, (x0,))
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


def cmd_kernel(args):
    from rl_mpc_locomotion_tpu.ops.pallas.admm_kernel import (
        solve_scaled_batch, N, M, NB)

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    b = args.batch
    a = jax.random.normal(ks[0], (b, N, N)) * 0.1
    k_mat = jnp.einsum("bij,bkj->bik", a, a) + 5.0 * jnp.eye(N)
    q = jax.random.normal(ks[1], (b, N))
    c = jax.random.normal(ks[2], (b, NB, 5, 3))
    lo = -jnp.abs(jax.random.normal(ks[3], (b, M))) - 1.0
    hi = jnp.abs(jax.random.normal(ks[4], (b, M))) + 1.0
    rho = jnp.full((b, M), 0.1)
    x = jnp.zeros((b, N))
    z = jnp.zeros((b, M))
    y = jnp.zeros((b, M))

    def run(iters):
        f = jax.jit(lambda *aa: solve_scaled_batch(
            *aa, iters=iters, sigma=1e-6, relax=1.6))
        if args.mode == "chained":
            xs, zs, ys = f(k_mat, q, c, lo, hi, rho, x, z, y)
            float(xs.sum())
            t0 = time.perf_counter()
            for _ in range(args.reps):
                xs, zs, ys = f(k_mat, q, c, lo, hi, rho, xs, zs, ys)
            float(xs.sum())
            return (time.perf_counter() - t0) / args.reps * 1000.0
        if args.mode == "fresh":
            qs = [jax.random.normal(jax.random.PRNGKey(100 + i), (b, N))
                  for i in range(args.reps)]
            out = f(k_mat, qs[0], c, lo, hi, rho, x, z, y)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            sums = [f(k_mat, qs[i], c, lo, hi, rho, x, z, y)[0].sum()
                    for i in range(args.reps)]
            jax.block_until_ready(sums)
            return (time.perf_counter() - t0) / args.reps * 1000.0
        out = f(k_mat, q, c, lo, hi, rho, x, z, y)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(k_mat, q, c, lo, hi, rho, x, z, y)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps * 1000.0

    if args.mode == "iter0":
        print(json.dumps({"mode": args.mode, "batch": b,
                          "kernel_iter0_ms": round(run(0), 3)}))
        return
    t50, t10 = run(50), run(10)
    per = (t50 - t10) / 40
    print(json.dumps({
        "mode": args.mode, "batch": b,
        "kernel50_ms": round(t50, 3), "kernel10_ms": round(t10, 3),
        "per_iter_ms": round(per, 4),
        "factor_dma_ms": round(t10 - 10 * per, 3)}))


def _stripped_kernel_runner(stage, b, panel_width=None):
    """Stripped fused-kernel variant isolating phases up to ``stage``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rl_mpc_locomotion_tpu.ops.pallas import admm_kernel
    from rl_mpc_locomotion_tpu.ops.pallas.fused_qp import _ruiz_in_vmem

    N, M, NB, TR = (admm_kernel.N, admm_kernel.M, admm_kernel.NB,
                    admm_kernel.TR)

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
        kbuf[:, :, :] = (kbuf[:, :, :]
                         + on_diag * (1.0 - mask).reshape(1, N, TR))
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
        admm_kernel.gj_invert_inplace(kbuf, panel_width=panel_width)
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
        out = pl.pallas_call(
            kern, grid=(b // TR,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), vec_spec(N),
                      c_spec],
            out_specs=vec_spec(N),
            out_shape=jax.ShapeDtypeStruct((N, b), jnp.float32),
            scratch_shapes=[pltpu.VMEM((N, N, TR), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=48 * 1024 * 1024),
        )(p_soa, q_soa, c_soa)
        return 1e-12 * out

    return run


def _kernel_phase_data(b):
    from rl_mpc_locomotion_tpu.ops.pallas import admm_kernel
    N, NB = admm_kernel.N, admm_kernel.NB
    key = jax.random.PRNGKey(0)
    p_bm = jax.random.normal(key, (b, N, N), jnp.float32)
    p_soa = jnp.moveaxis(p_bm, 0, -1) + 0.0
    c_soa = jnp.ones((NB, 5, 3, b), jnp.float32) * 0.3
    q_init = jnp.zeros((N, b), jnp.float32)
    return jax.block_until_ready((q_init, p_soa, c_soa)), p_bm


def cmd_kernel_phases(args):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rl_mpc_locomotion_tpu.ops.pallas import admm_kernel

    N, TR = admm_kernel.N, admm_kernel.TR
    b = args.batch
    (q_init, p_soa, c_soa), p_bm = _kernel_phase_data(b)

    res = {}
    for stage in ("dma", "mask", "ruiz", "kgj", "admm1", "admm50"):
        f = _stripped_kernel_runner(stage, b)
        res[stage + "_ms"] = slope_timeit(f, (q_init, p_soa, c_soa))
        print(stage, round(res[stage + "_ms"], 2), flush=True)

    # layout A/B: batch-major contiguous DMA (+ optional in-VMEM transpose)
    NP128 = 128
    p_bm_pad = jnp.pad(p_bm, ((0, 0), (0, 0), (0, NP128 - N)))

    def make_bm_dma(transpose):
        def kern(p_hbm, q_ref, x_out, *scratch):
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
                x_out[:, :] = q_ref[:, :] + jnp.transpose(
                    ptile[:, :, 0], (1, 0))

        vec_spec = lambda dim: pl.BlockSpec((dim, TR), lambda t: (0, t),
                                            memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((TR, N, NP128), jnp.float32)]
        if transpose:
            scratch.append(pltpu.VMEM((N, NP128, TR), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA)

        def run(q_soa, p_pad):
            out = pl.pallas_call(
                kern, grid=(b // TR,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY), vec_spec(N)],
                out_specs=vec_spec(N),
                out_shape=jax.ShapeDtypeStruct((N, b), jnp.float32),
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(p_pad, q_soa)
            return 1e-12 * out
        return run

    res["bm_dma_ms"] = slope_timeit(make_bm_dma(False), (q_init, p_bm_pad))
    print("bm_dma", round(res["bm_dma_ms"], 2), flush=True)
    res["bm_dma_T_ms"] = slope_timeit(make_bm_dma(True), (q_init, p_bm_pad))
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


def cmd_panels(args):
    """GJ panel-width sweep via the stripped 'kgj' variant (factor
    dominates there); panel_width is now an explicit argument."""
    b = args.batch
    (q_init, p_soa, c_soa), _ = _kernel_phase_data(b)
    out = {}
    for w in args.widths:
        if 120 % w != 0:
            print(f"np{w}: skipped (does not divide 120)", flush=True)
            continue
        f = _stripped_kernel_runner("kgj", b, panel_width=w)
        out[f"np{w}"] = round(slope_timeit(f, (q_init, p_soa, c_soa)), 3)
        print(f"np{w}", out[f"np{w}"], flush=True)
    print(json.dumps(out))


def cmd_inverse(args):
    b, n = args.batch, 120
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (b, n, n), jnp.float32) * 0.1
    k0 = jnp.einsum('bij,bkj->bik', g, g) + 10.0 * jnp.eye(n)

    def chain(fn):
        # in-executable chain (slope_timeit): the dispatch-chained scan
        # variant measured ~0 on the axon relay even with data-dependent
        # carries — only slope timing inside ONE jit is trustworthy here
        def step(k):
            kinv = fn(k)
            return k + 1e-8 * kinv
        return slope_timeit(step, (k0,), iters=10)

    with jax.default_matmul_precision("float32"):
        out = {}
        out["linalg_inv"] = chain(jnp.linalg.inv)
        out["cholesky_only"] = chain(lambda k: jnp.linalg.cholesky(k) + 0.0)

        def cho_inv(k):
            low = jnp.linalg.cholesky(k)
            eye = jnp.broadcast_to(jnp.eye(n, dtype=k.dtype), k.shape)
            linv = jax.lax.linalg.triangular_solve(low, eye, left_side=True,
                                                   lower=True)
            return jnp.einsum('bki,bkj->bij', linv, linv)
        out["chol_triinv"] = chain(cho_inv)

        def blocked_gj(k, bs=24):
            inv = jnp.broadcast_to(jnp.eye(n, dtype=k.dtype), k.shape)
            m = jnp.concatenate([k, inv], axis=2)
            for k0_ in range(0, n, bs):
                piv = m[:, k0_:k0_ + bs, :]
                d = m[:, k0_:k0_ + bs, k0_:k0_ + bs]
                dinv = jnp.linalg.inv(d)
                piv = jnp.einsum('bij,bjk->bik', dinv, piv)
                rest = m - jnp.einsum('bik,bkj->bij',
                                      m[:, :, k0_:k0_ + bs], piv)
                m = jnp.concatenate([rest[:, :k0_], piv, rest[:, k0_ + bs:]],
                                    axis=1)
            return m[:, :, n:]
        out["blocked_gj24"] = chain(blocked_gj)
        out["blocked_gj40"] = chain(lambda k: blocked_gj(k, bs=40))
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


def cmd_timing_sanity(args):
    import numpy as np
    n = 8192
    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)

    # 1. same-input vs fresh vs chained (dispatch memoization probe)
    f = jax.jit(lambda a: a @ a)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(x)
    jax.block_until_ready(out)
    print("same_input_ms", round((time.perf_counter() - t0) / 10 * 1e3, 3))

    xs = [jax.device_put(x * (1 + i * 1e-6)) for i in range(10)]
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    outs = [f(xi) for xi in xs]
    jax.block_until_ready(outs)
    print("fresh_input_ms", round((time.perf_counter() - t0) / 10 * 1e3, 3))

    g = jax.jit(lambda a: (a @ a) * 1e-5)
    jax.block_until_ready(g(x))
    y = x
    t0 = time.perf_counter()
    for _ in range(10):
        y = g(y)
    jax.block_until_ready(y)
    print("chained_ms", round((time.perf_counter() - t0) / 10 * 1e3, 3))

    # 2. is block_until_ready real? compare against forced host fetches
    for tag, sync in (("block", jax.block_until_ready),
                      ("fetch1", lambda v: np.asarray(v[:1, :1])),
                      ("fetch_scalar", lambda v: float(jnp.sum(v)))):
        y = x
        t0 = time.perf_counter()
        for _ in range(5):
            y = g(y)
        sync(y)
        dt = (time.perf_counter() - t0) / 5 * 1e3
        print(tag, round(dt, 3), "ms/matmul")

    # 3. which op shapes time as ~0 (relay elision bisect)
    variants = {
        "sq": jax.jit(lambda a: a @ a),
        "sq_scaled": jax.jit(lambda a: (a @ a) * 1e-5),
        "two_ops": jax.jit(lambda a: a @ (a * 1e-3)),
    }
    for tag, fn in variants.items():
        jax.block_until_ready(fn(x))
        y = x
        t0 = time.perf_counter()
        for _ in range(5):
            y = fn(y)
        jax.block_until_ready(y)
        print(tag, round((time.perf_counter() - t0) / 5 * 1e3, 3), "ms/call",
              "val", float(jnp.mean(jnp.abs(y[:8, :8]))))


def main(argv=None):
    p = argparse.ArgumentParser(prog="profile.py", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("period", help="MPC-period attribution")
    sp.add_argument("--batch", type=int, default=4096)
    sp.add_argument("--iters-sweep", type=int, nargs="*",
                    default=[1, 10, 25, 50])
    sp.add_argument("--ruiz-sweep", type=int, nargs="*", default=[0, 1])
    sp.set_defaults(fn=cmd_period)

    sp = sub.add_parser("qp-knobs", help="knob deltas through bench.py")
    sp.add_argument("--batch", type=int, default=4096)
    sp.add_argument("variants", nargs="*")
    sp.set_defaults(fn=cmd_qp_knobs)

    sp = sub.add_parser("qp-phases", help="XLA prep vs kernel split")
    sp.add_argument("--batch", type=int, default=4096)
    sp.set_defaults(fn=cmd_qp_phases)

    sp = sub.add_parser("kernel", help="raw GJ+ADMM kernel timing")
    sp.add_argument("--mode", default="fresh",
                    choices=["static", "fresh", "chained", "iter0"])
    sp.add_argument("--batch", type=int, default=4096)
    sp.add_argument("--reps", type=int, default=10)
    sp.set_defaults(fn=cmd_kernel)

    sp = sub.add_parser("kernel-phases", help="in-kernel phase isolation")
    sp.add_argument("--batch", type=int, default=4096)
    sp.set_defaults(fn=cmd_kernel_phases)

    sp = sub.add_parser("panels", help="GJ panel-width sweep")
    sp.add_argument("--batch", type=int, default=4096)
    sp.add_argument("widths", type=int, nargs="*", default=[8, 4, 2])
    sp.set_defaults(fn=cmd_panels)

    sp = sub.add_parser("inverse", help="batched SPD inverse: XLA options")
    sp.add_argument("--batch", type=int, default=4096)
    sp.set_defaults(fn=cmd_inverse)

    sp = sub.add_parser("timing-sanity", help="validate the timing harness")
    sp.set_defaults(fn=cmd_timing_sanity)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
