"""Batched OSQP-style ADMM solver for the ground-reaction-force QP.

Replaces the reference's native OSQP / qpOASES solve
(convex_MPC/mpc_osqp.cc:690-947) with a fixed-iteration, branch-free ADMM
that vmaps over thousands of robots and runs entirely on-device.

Problem:  min  1/2 x^T P x + q^T x   s.t.  l <= C x <= u
with x the stacked GRFs (h*12), C the friction-pyramid constraint matrix
(h*4 identical 5x3 blocks on the diagonal, mpc_osqp.cc:437-447).

Design (OSQP, arXiv:1711.08013, re-derived for TPU):
- modified Ruiz equilibration (fixed small iteration count, branch-free),
- per-row rho with an equality boost (OSQP uses rho*1e3 for l==u rows; the
  swing-leg rows here are exactly that),
- one KKT matrix K = P + sigma I + C^T diag(rho) C, factored once per solve
  via an explicit SPD inverse; iterations are then pure batched matvecs,
- over-relaxation alpha = 1.6,
- optional one-shot adaptive-rho restart (mirrors OSQP's
  adaptive_rho_interval=25, mpc_osqp.cc:710),
- optional penalty-method "polish" step (OSQP's polish, settings at
  mpc_osqp.cc:709) that re-solves with the detected active set for a
  high-accuracy primal.

Swing legs: the reference's qpOASES path eliminates swing-leg variables
(mpc_osqp.cc:832-904). Here they are masked instead: their rows/cols of P are
replaced by identity, q zeroed, and their bounds are already [0,0], which
pins them to zero with no dynamic shapes — the batch-friendly equivalent.

The x-update matvecs are einsum('ij,j->i') per robot; under vmap XLA lowers
them to VPU multiply-reduce over the batch, which is the right unit for
120-wide vectors (the MXU wants >=128 lanes *per operand*). The Pallas
variant (ops/pallas/admm_kernel.py) keeps K resident in VMEM across all
iterations to remove the HBM round-trip per iteration.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPConfig(NamedTuple):
    sigma: float = 1e-6
    rho: float = 0.1
    rho_eq_scale: float = 1e3
    relax: float = 1.6          # over-relaxation alpha
    iters: int = 50             # iterations before the (optional) rho update
    iters2: int = 50            # iterations after the rho update
    adaptive_rho: bool = True
    deferred_rho: bool = False  # adapt rho across solves via QPState.rho_mult
    ruiz_iters: int = 10
    polish: bool = True
    polish_delta: float = 1e-6
    active_tol: float = 1e-4
    use_pallas: bool = False    # factor+iterate via the TPU Pallas kernel
                                # when vmapped (ops/pallas/admm_kernel.py)


def production_qp_config() -> "QPConfig":
    """The validated real-time TPU configuration: 24-iteration ADMM with
    receding-horizon-shifted warm starts and *deferred* rho adaptation,
    through the Pallas kernel.

    Rho adaptation is load-bearing across robots: with a fixed rho the
    heavier/stiffer A1 (mass x3, inertia x10) stalls at ~55% of the required
    stance force and sinks regardless of iteration count; the OSQP rho
    rescale fixes it. Deferring the rescale to the next solve
    (QPState.rho_mult) keeps one factorization per solve — rho converges per
    robot within a few 50 Hz MPC periods. Polish stays off (accuracy knob
    for offline use; tests/test_qp.py pins tolerances).

    Iteration budget (r5 re-sweep, with shift_warm_start active): the
    unshifted r3 config needed 40 iters (A1 behavioral cliff at 38). The
    receding-horizon shift moves the whole envelope: per-solve divergences
    appear at <=12 iters and the first closed-loop fall (Go1) at 10; 16 is
    clean on flat trot for all three robots. 24 keeps a 2x margin over the
    divergence onset while cutting the ADMM phase cost 40% (each iter
    ~0.11 ms at batch 4096 on v5e; each Ruiz pass ~0.28 ms —
    scripts/profile.py period)."""
    return QPConfig(iters=24, iters2=0, adaptive_rho=False,
                    deferred_rho=True, polish=False, ruiz_iters=2,
                    use_pallas=True)


class QPState(NamedTuple):
    """Warm-start state carried across MPC solves (unscaled).

    rho_mult is the deferred adaptive-rho memory: the OSQP rho rescale
    computed from this solve's residuals is applied to the *next* solve, so
    each solve factors K exactly once while rho still converges per robot
    over a few MPC periods (QPConfig.deferred_rho).
    """
    x: jnp.ndarray         # (n,)
    z: jnp.ndarray         # (m,)
    y: jnp.ndarray         # (m,)
    rho_mult: jnp.ndarray  # () carried rho scaling


def init_qp_state(n: int, m: int) -> QPState:
    return QPState(x=jnp.zeros(n, jnp.float32), z=jnp.zeros(m, jnp.float32),
                   y=jnp.zeros(m, jnp.float32),
                   rho_mult=jnp.float32(1.0))


def shift_warm_start(state: QPState, horizon: int = 10) -> QPState:
    """Advance the warm start by one MPC step-block (receding-horizon
    shift).

    Consecutive solves see horizons offset by exactly one gait segment
    (the contact table advances one row per solve), so the previous
    solution shifted by one step-block — 12 GRF variables / 20 constraint
    rows — is a much better initial iterate than the unshifted one. The
    last block is duplicated for the newly revealed step. Standard MPC
    warm-starting; the reference's OSQP path reuses its workspace
    UNSHIFTED (mpc_osqp.cc:757-778), so this strictly improves on it.
    Measured effect (flat-trot Aliengo, production config): relative
    primal/dual residuals drop ~3x at fixed 40 iterations, and the A1
    behavioral cliff moves from 38 to <=32 iterations.
    """
    nb = state.x.shape[0] // horizon   # 12 vars per step
    mb = state.z.shape[0] // horizon   # 20 constraint rows per step
    x = jnp.concatenate([state.x[nb:], state.x[-nb:]])
    z = jnp.concatenate([state.z[mb:], state.z[-mb:]])
    y = jnp.concatenate([state.y[mb:], state.y[-mb:]])
    return state._replace(x=x, z=z, y=y)


def _apply_c(c_blocks, x):
    """C @ x with block-diagonal C. c_blocks (nb,5,3), x (nb*3,) -> (nb*5,)."""
    nb = c_blocks.shape[0]
    return jnp.einsum('kij,kj->ki', c_blocks, x.reshape(nb, 3)).reshape(-1)


def _apply_ct(c_blocks, y):
    """C^T @ y. y (nb*5,) -> (nb*3,)."""
    nb = c_blocks.shape[0]
    return jnp.einsum('kij,ki->kj', c_blocks, y.reshape(nb, 5)).reshape(-1)


def _ct_diag_c(c_blocks, d):
    """C^T diag(d) C as (nb,3,3) diagonal blocks. d (nb*5,)."""
    nb = c_blocks.shape[0]
    dd = d.reshape(nb, 5)
    return jnp.einsum('kij,ki,kil->kjl', c_blocks, dd, c_blocks)


def _add_block_diag(mat, blocks):
    """Add (nb,3,3) blocks onto the diagonal of (nb*3, nb*3) mat.

    Expressed as a broadcast-multiply against eye(nb) rather than an indexed
    scatter — batched scatters lower to serial updates on TPU and dominated
    the K-assembly cost.
    """
    nb = blocks.shape[0]
    n = nb * 3
    eye = jnp.eye(nb, dtype=mat.dtype)
    dense = jnp.einsum('bc,bij->bicj', eye, blocks).reshape(n, n)
    return mat + dense


def ruiz_equilibrate(p_mat, q_vec, c_blocks, iters: int):
    """Modified Ruiz equilibration of [[P C^T],[C 0]] plus cost scaling.

    Returns (p_s, q_s, c_s, d, e, c_cost): scaled data, variable scaling d
    (n,), constraint scaling e (m,), and cost scaling c_cost. The scaled
    problem's solution unscales as x = d * x_s, y = e * y_s / c_cost.
    """
    nb = c_blocks.shape[0]
    n = p_mat.shape[0]
    d = jnp.ones(n, p_mat.dtype)
    e = jnp.ones(nb * 5, p_mat.dtype)
    c_cost = jnp.asarray(1.0, p_mat.dtype)
    p_s, q_s, c_s = p_mat, q_vec, c_blocks

    def body(_, carry):
        p_s, q_s, c_s, d, e, c_cost = carry
        # infinity norms of the columns of [[P],[C]] (per variable) and of
        # C^T (per constraint row)
        col_p = jnp.max(jnp.abs(p_s), axis=0)                       # (n,)
        col_c = jnp.max(jnp.abs(c_s), axis=1).reshape(nb, 3)        # per var blk
        col_c_full = jnp.zeros_like(col_p).reshape(nb, 3)
        col_c_full = jnp.maximum(col_c_full, col_c)
        col = jnp.maximum(col_p, col_c_full.reshape(-1))
        row_c = jnp.max(jnp.abs(c_s), axis=2).reshape(-1)           # (m,)
        delta_d = 1.0 / jnp.sqrt(jnp.maximum(col, 1e-8))
        delta_e = 1.0 / jnp.sqrt(jnp.maximum(row_c, 1e-8))
        p_s = delta_d[:, None] * p_s * delta_d[None, :]
        q_s = delta_d * q_s
        c_s = (delta_e.reshape(nb, 5)[:, :, None] * c_s *
               delta_d.reshape(nb, 1, 3))
        d = d * delta_d
        e = e * delta_e
        # cost scaling (OSQP sec 5.1): gamma = 1/max(mean col norm of P, |q|_inf)
        colp = jnp.mean(jnp.max(jnp.abs(p_s), axis=0))
        qinf = jnp.max(jnp.abs(q_s))
        gamma = 1.0 / jnp.maximum(jnp.maximum(colp, qinf), 1e-8)
        p_s = gamma * p_s
        q_s = gamma * q_s
        c_cost = c_cost * gamma
        return p_s, q_s, c_s, d, e, c_cost

    p_s, q_s, c_s, d, e, c_cost = jax.lax.fori_loop(
        0, iters, body, (p_s, q_s, c_s, d, e, c_cost))
    return p_s, q_s, c_s, d, e, c_cost


def _spd_inverse(k_mat):
    """Inverse of an SPD matrix via Cholesky (batched-friendly)."""
    lo = jnp.linalg.cholesky(k_mat)
    eye = jnp.eye(k_mat.shape[0], dtype=k_mat.dtype)
    li = jax.scipy.linalg.solve_triangular(lo, eye, lower=True)
    return li.T @ li


@functools.lru_cache(maxsize=None)
def _make_scaled_solver(iters: int, sigma: float, relax: float,
                        use_pallas: bool):
    """Factor-and-iterate on the *scaled* problem as a custom-vmap op.

    Single-robot calls use the XLA path (SPD inverse + fori ADMM). Under
    vmap with use_pallas, the whole batch is routed to the robots-in-lanes
    Pallas kernel — XLA's batched Cholesky is the bottleneck it replaces.
    """

    @jax.custom_batching.custom_vmap
    def solve_scaled(k_mat, q_s, c_blocks, l_s, u_s, rho, x, z, y):
        k_inv = _spd_inverse(k_mat)
        return _admm_iters(k_inv, None, q_s, c_blocks, l_s, u_s, rho, sigma,
                           relax, iters, x, z, y)

    @solve_scaled.def_vmap
    def _rule(axis_size, in_batched, k_mat, q_s, c_blocks, l_s, u_s, rho,
              x, z, y):
        args = [k_mat, q_s, c_blocks, l_s, u_s, rho, x, z, y]
        args = [a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        if use_pallas:
            from .pallas.admm_kernel import solve_scaled_batch
            out = solve_scaled_batch(*args, iters=iters, sigma=sigma,
                                     relax=relax)
        else:
            out = jax.vmap(lambda *a: solve_scaled.fun(*a))(*args)
        return out, (True, True, True)

    return solve_scaled


def _admm_iters(k_inv, p_s, q_s, c_s, l_s, u_s, rho, sigma, relax, n_iters,
                x, z, y):
    """Run n_iters fixed ADMM iterations (OSQP alg. 1) on scaled data."""
    rho_inv = 1.0 / rho

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q_s + _apply_ct(c_s, rho * z - y)
        x_t = k_inv @ rhs
        z_t = _apply_c(c_s, x_t)
        x_new = relax * x_t + (1.0 - relax) * x
        z_r = relax * z_t + (1.0 - relax) * z
        z_new = jnp.clip(z_r + rho_inv * y, l_s, u_s)
        y_new = y + rho * (z_r - z_new)
        return x_new, z_new, y_new

    return jax.lax.fori_loop(0, n_iters, body, (x, z, y))


def solve_qp(p_mat, q_vec, c_blocks, lb, ub, state: QPState, cfg: QPConfig,
             mask=None):
    """Solve one QP. All args single-robot; vmap for the batch.

    ``mask``: optional (n,) {0,1} swing-variable mask. When given, p/q are
    *raw* and the masking (mask_swing_variables) is applied inside — fused
    into the Pallas kernel on the batched fast path. When None, p/q must be
    pre-masked by the caller.

    Returns (x, new_state, diagnostics dict).

    Runs under float32 matmul precision: the TPU MXU's default bf16 passes
    (~3 decimal digits) are not enough for the KKT solve.
    """
    with jax.default_matmul_precision("float32"):
        if _fused_eligible(cfg):
            m = jnp.ones(p_mat.shape[0], p_mat.dtype) if mask is None else mask
            solver = _make_fused_solver(cfg)
            x_u, z_u, y_u, rm, viol, res = solver(
                p_mat, q_vec, c_blocks, lb, ub, m,
                state.x, state.z, state.y, state.rho_mult)
            return (x_u, QPState(x=x_u, z=z_u, y=y_u, rho_mult=rm),
                    {"primal_violation": viol, "pri_res": res[0],
                     "dua_res": res[1]})
        if mask is not None:
            p_mat = p_mat * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            q_vec = q_vec * mask
        return _solve_qp_impl(p_mat, q_vec, c_blocks, lb, ub, state, cfg)


def solve_qp_chain(s_chain, q_vec, weights, alpha, c_blocks, lb, ub,
                   state: QPState, cfg: QPConfig, mask=None, horizon=10):
    """Solve the MPC QP from the condensation chain (production path).

    ``s_chain`` (h, 13, 12) = A^k B and ``weights`` (13,) replace the dense
    Hessian: on the batched Pallas path P is built inside the fused kernel
    (srb_dynamics.condense_chain docstring), so neither B_qp nor P ever
    exists in HBM; elsewhere P = hessian_from_chain and the solve proceeds
    as solve_qp. Same returns as solve_qp.
    """
    from .srb_dynamics import hessian_from_chain

    with jax.default_matmul_precision("float32"):
        if _fused_eligible(cfg):
            m = (jnp.ones(q_vec.shape[0], q_vec.dtype) if mask is None
                 else mask)
            solver = _make_fused_chain_solver(cfg, float(alpha))
            x_u, z_u, y_u, rm, viol, res = solver(
                s_chain, weights, q_vec, c_blocks, lb, ub, m,
                state.x, state.z, state.y, state.rho_mult)
            return (x_u, QPState(x=x_u, z=z_u, y=y_u, rho_mult=rm),
                    {"primal_violation": viol, "pri_res": res[0],
                     "dua_res": res[1]})
        p_mat = hessian_from_chain(s_chain, weights, alpha, horizon)
        if mask is not None:
            p_mat = (p_mat * mask[:, None] * mask[None, :]
                     + jnp.diag(1.0 - mask))
            q_vec = q_vec * mask
        return _solve_qp_impl(p_mat, q_vec, c_blocks, lb, ub, state, cfg)


@functools.lru_cache(maxsize=None)
def _make_fused_chain_solver(cfg: QPConfig, alpha: float):
    """Chain-input whole-solve custom-vmap op (see _make_fused_solver)."""
    xla_cfg = cfg._replace(use_pallas=False)

    @jax.custom_batching.custom_vmap
    def solve_full(s, w, q, c, lb, ub, mask, x, z, y, rho_mult):
        from .srb_dynamics import hessian_from_chain
        p = hessian_from_chain(s, w, alpha, s.shape[0])
        pm = p * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        qm = q * mask
        x_u, st, diag = _solve_qp_impl(pm, qm, c, lb, ub,
                                       QPState(x, z, y, rho_mult), xla_cfg)
        return (x_u, st.z, st.y, st.rho_mult, diag["primal_violation"],
                jnp.stack([diag["pri_res"], diag["dua_res"]]))

    @solve_full.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if bt else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, bt in zip(args, in_batched)]
        from .pallas.fused_qp import fused_solve_chain_batch
        out = fused_solve_chain_batch(
            *args, alpha=alpha, iters=cfg.iters, sigma=cfg.sigma,
            relax=cfg.relax, rho_base=cfg.rho,
            rho_eq_scale=cfg.rho_eq_scale, ruiz_iters=cfg.ruiz_iters,
            deferred_rho=cfg.deferred_rho)
        return out, (True,) * 6

    return solve_full


def _fused_eligible(cfg: QPConfig) -> bool:
    """The fused Pallas kernel covers the production solve shape: fixed
    iterations with optional deferred rho. Polish / immediate adaptive-rho
    (the offline-accuracy knobs) stay on the XLA path."""
    return cfg.use_pallas and not cfg.adaptive_rho and not cfg.polish


@functools.lru_cache(maxsize=None)
def _make_fused_solver(cfg: QPConfig):
    """Whole-solve custom-vmap op: unbatched calls run the XLA pipeline;
    under vmap the entire batch (mask -> Ruiz -> K -> factor -> ADMM ->
    rho rescale -> unscale) runs in the fused Pallas kernel."""
    xla_cfg = cfg._replace(use_pallas=False)

    @jax.custom_batching.custom_vmap
    def solve_full(p, q, c, lb, ub, mask, x, z, y, rho_mult):
        pm = p * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        qm = q * mask
        x_u, st, diag = _solve_qp_impl(pm, qm, c, lb, ub,
                                       QPState(x, z, y, rho_mult), xla_cfg)
        return (x_u, st.z, st.y, st.rho_mult, diag["primal_violation"],
                jnp.stack([diag["pri_res"], diag["dua_res"]]))

    @solve_full.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if bt else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, bt in zip(args, in_batched)]
        from .pallas.fused_qp import fused_solve_batch
        out = fused_solve_batch(
            *args, iters=cfg.iters, sigma=cfg.sigma, relax=cfg.relax,
            rho_base=cfg.rho, rho_eq_scale=cfg.rho_eq_scale,
            ruiz_iters=cfg.ruiz_iters, deferred_rho=cfg.deferred_rho)
        return out, (True,) * 6

    return solve_full


def _solve_qp_impl(p_mat, q_vec, c_blocks, lb, ub, state: QPState,
                   cfg: QPConfig):
    n = p_mat.shape[0]
    eq_row = (ub - lb) < 1e-9

    p_s, q_s, c_s, d, e, c_cost = ruiz_equilibrate(
        p_mat, q_vec, c_blocks, cfg.ruiz_iters)
    l_s, u_s = e * lb, e * ub

    base_rho = cfg.rho * state.rho_mult if cfg.deferred_rho else cfg.rho
    rho = jnp.where(eq_row, base_rho * cfg.rho_eq_scale, base_rho)

    # warm start: scale previous solution into the new scaling
    x = state.x / d
    z = e * state.z
    y = c_cost * (state.y / e)

    def build_k(rho):
        k = p_s + cfg.sigma * jnp.eye(n, dtype=p_s.dtype)
        return _add_block_diag(k, _ct_diag_c(c_s, rho))

    solver = _make_scaled_solver(cfg.iters, cfg.sigma, cfg.relax,
                                 cfg.use_pallas)
    x, z, y = solver(build_k(rho), q_s, c_s, l_s, u_s, rho, x, z, y)

    def residuals(x, z, y):
        # OSQP relative primal/dual residuals on the scaled problem; the
        # ratio drives the rho rescale (eq. 20), the values themselves are
        # the per-solve convergence telemetry (QP margin story).
        cx = _apply_c(c_s, x)
        pri = jnp.max(jnp.abs(cx - z))
        pri_rel = pri / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(cx)),
                                                jnp.max(jnp.abs(z))), 1e-8)
        px = p_s @ x
        cty = _apply_ct(c_s, y)
        dua = jnp.max(jnp.abs(px + q_s + cty))
        dua_rel = dua / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(px)),
                        jnp.maximum(jnp.max(jnp.abs(cty)),
                                    jnp.max(jnp.abs(q_s)))), 1e-8)
        return pri_rel, dua_rel

    def rho_rescale(pri_rel, dua_rel):
        scale = jnp.sqrt(pri_rel / jnp.maximum(dua_rel, 1e-10))
        return jnp.clip(scale, 1e-2, 1e2)

    rho_mult = state.rho_mult
    pri_rel, dua_rel = residuals(x, z, y)
    if cfg.adaptive_rho:
        # immediate restart: re-factor with the rescaled rho this solve
        rho2 = jnp.clip(rho * rho_rescale(pri_rel, dua_rel), 1e-6, 1e6)
        solver2 = _make_scaled_solver(cfg.iters2, cfg.sigma, cfg.relax,
                                      cfg.use_pallas)
        x, z, y = solver2(build_k(rho2), q_s, c_s, l_s, u_s, rho2, x, z, y)
        pri_rel, dua_rel = residuals(x, z, y)
    elif cfg.deferred_rho:
        # deferred: remember the rescale for the NEXT solve (single factor
        # per solve; rho converges per robot over a few MPC periods)
        rho_mult = jnp.clip(rho_mult * rho_rescale(pri_rel, dua_rel),
                            1e-3, 1e3)

    if cfg.polish:
        x = _polish(p_s, q_s, c_s, l_s, u_s, x, y, z, cfg)

    # unscale
    x_u = d * x
    z_u = _apply_c(c_blocks, x_u)
    y_u = (e / c_cost) * y

    viol = jnp.maximum(jnp.max(jnp.maximum(lb - z_u, z_u - ub)), 0.0)
    diag = {"primal_violation": viol, "pri_res": pri_rel,
            "dua_res": dua_rel}
    return x_u, QPState(x=x_u, z=z_u, y=y_u, rho_mult=rho_mult), diag


def _polish(p_s, q_s, c_s, l_s, u_s, x, y, z, cfg: QPConfig):
    """Penalty-method polish: re-solve on the detected active set.

    OSQP's polish solves the equality-KKT of the active constraints exactly;
    a direct port would need dynamic shapes, so we use a stiff quadratic
    penalty (weight 1/delta) on active rows — equivalent up to O(delta) and
    fully batched. The polished x is kept only where it does not increase the
    worst constraint violation.
    """
    low_active = y < -cfg.active_tol
    upp_active = y > cfg.active_tol
    eq_active = (u_s - l_s) < 1e-9  # equality rows are always active
    active = jnp.logical_or(jnp.logical_or(low_active, upp_active), eq_active)
    target = jnp.where(upp_active, u_s, l_s)

    w = active.astype(p_s.dtype) / cfg.polish_delta
    n = p_s.shape[0]
    k = p_s + cfg.sigma * jnp.eye(n, dtype=p_s.dtype)
    k = _add_block_diag(k, _ct_diag_c(c_s, w))
    rhs = -q_s + _apply_ct(c_s, w * target) + cfg.sigma * x
    x_pol = _spd_inverse(k) @ rhs

    def worst_violation(xx):
        cx = _apply_c(c_s, xx)
        return jnp.max(jnp.maximum(l_s - cx, cx - u_s))

    keep = worst_violation(x_pol) <= worst_violation(x) + 1e-6
    return jnp.where(keep, x_pol, x)


def mask_swing_variables(p_mat, q_vec, contact_step0, horizon=10):
    """Pin swing-leg GRFs to zero via P/q masking.

    contact_step0: (h, 4) contact table; a variable is active iff its
    (step, leg) is in contact. Batch-friendly equivalent of the reference's
    variable elimination (mpc_osqp.cc:832-904).
    """
    mask = jnp.repeat(contact_step0.reshape(-1), 3)  # (h*12,)
    pm = p_mat * mask[:, None] * mask[None, :]
    pm = pm + jnp.diag(1.0 - mask)
    qm = q_vec * mask
    return pm, qm, mask
