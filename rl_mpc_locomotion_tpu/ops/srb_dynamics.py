"""Single-rigid-body MPC dynamics: linearization, exact discretization, and
dense QP condensation — pure jnp, fully vmappable.

This replaces the Eigen pipeline in the reference's native solver
(convex_MPC/mpc_osqp.cc): CalculateAMat (:299-322), CalculateBMat (:324-336),
CalculateExponentials (:338-351), CalculateQpMats (:353-435), the state /
desired-state assembly (:630-659) and constraint bounds (:449-477).

TPU-first design notes:
- The reference computes exp([A B; 0 0] dt) with a dense 25x25 Padé expm. The
  continuous A here is *nilpotent* (A^3 = 0: gravity->velocity->position and
  omega->rpy are the only couplings), so the matrix exponential has an exact
  closed form:  A_exp = I + A dt + A^2 dt^2/2,
                B_exp = (I dt + A dt^2/2 + A^2 dt^3/6) B.
  No iteration, no Padé — three matmuls, exact to fp precision.
- The condensed Hessian is built as one batched triple product
  P = 2 B_qp^T diag(w) B_qp + alpha I rather than the reference's O(h^2)
  block recursion (mpc_osqp.cc:353-435): on the MXU a single (120x130)x
  (130x120) matmul beats any blockwise scalar recursion.

State layout (13): (roll, pitch, yaw, x, y, z, wx, wy, wz, vx, vy, vz, -g),
mpc_osqp.cc:126-132.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotations import rpy_to_rot, skew

STATE_DIM = 13
ACTION_DIM = 12  # 4 legs x 3D GRF
GRAVITY = 9.8  # mpc_osqp.cc:54
F_MAX_SCALE = 10.0  # mpc_osqp.cc:55
F_MIN_SCALE = 0.1   # mpc_osqp.cc:56


def build_a_mat(rpy, ground_normal):
    """Continuous-time A (13x13). mpc_osqp.cc:299-322.

    Rows 0-2: angular velocity -> rpy rate (yaw/pitch trig); rows 3-5:
    velocity; rows 9-11: gravity column scaled by the ground normal
    (slope-aware gravity).
    """
    cy, sy = jnp.cos(rpy[2]), jnp.sin(rpy[2])
    cp, tp = jnp.cos(rpy[1]), jnp.tan(rpy[1])
    w2rpy = jnp.stack([
        jnp.stack([cy / cp, sy / cp, jnp.zeros_like(cy)]),
        jnp.stack([-sy, cy, jnp.zeros_like(cy)]),
        jnp.stack([cy * tp, sy * tp, jnp.ones_like(cy)]),
    ])
    a = jnp.zeros((STATE_DIM, STATE_DIM), jnp.float32)
    a = a.at[0:3, 6:9].set(w2rpy)
    a = a.at[3, 9].set(1.0)
    a = a.at[4, 10].set(1.0)
    a = a.at[5, 11].set(1.0)
    a = a.at[9:12, 12].set(ground_normal)
    return a


def build_b_mat(inv_mass, inv_inertia_world, foot_positions_world):
    """Continuous-time B (13x12). mpc_osqp.cc:324-336.

    Rows 6-8: I_w^-1 [r_i]x per leg; rows 9-11: 1/m on the diagonal.
    Built from stacked blocks (no scatter ops — batches cleanly).
    """
    skews = jax.vmap(skew)(foot_positions_world)                # (4,3,3)
    torque = jnp.einsum('ij,ljk->ilk', inv_inertia_world, skews)  # (3,4,3)
    torque_rows = torque.reshape(3, ACTION_DIM)
    force_rows = jnp.tile(jnp.eye(3, dtype=jnp.float32), (1, 4)) * inv_mass
    return jnp.concatenate([
        jnp.zeros((6, ACTION_DIM), jnp.float32),
        torque_rows,
        force_rows,
        jnp.zeros((1, ACTION_DIM), jnp.float32),
    ], axis=0)


def discretize_exact(a, b, dt):
    """Exact ZOH discretization using nilpotency of A (A^3 == 0).

    Replaces CalculateExponentials' 25x25 expm (mpc_osqp.cc:338-351) with the
    closed form; exact because the only chains in A are
    g -> v -> pos and omega -> rpy (length <= 2).
    """
    eye = jnp.eye(STATE_DIM, dtype=a.dtype)
    a2 = a @ a
    a_exp = eye + dt * a + (0.5 * dt * dt) * a2
    int_exp = dt * eye + (0.5 * dt * dt) * a + (dt * dt * dt / 6.0) * a2
    b_exp = int_exp @ b
    return a_exp, b_exp


def condense(a_exp, b_exp, horizon=10, compat_last_aqp_zero=True):
    """Unroll X_{k+1} = A X_k + B u_k into [X_1..X_h] = A_qp x0 + B_qp U.

    Returns (a_qp (h*13, 13), b_qp (h*13, h*12)).

    ``compat_last_aqp_zero`` reproduces a quirk of the reference: its a_qp
    fill loop stops one block early (mpc_osqp.cc:360-364, `i < horizon-1`),
    leaving the final block row of A_qp zero. That zero propagates into the
    gradient via state_diff (mpc_osqp.cc:681), so to match reference GRFs we
    keep it; pass False for the mathematically-correct unroll.
    """
    # A^1..A^h and A^k B, unrolled (h is small and static): under vmap a
    # lax.scan would run 2h sequential batched-matmul loop iterations whose
    # per-step launch overhead dominates the (13x13) matmul cost at large
    # batch; unrolling gives XLA one straight-line region to schedule.
    # The A^(k+1) = A @ A^k chain also pairs each power with A^k B in the
    # same step so both unrolls share the h-long dependency chain.
    powers_l = [a_exp]
    anb_l = [b_exp]
    for _ in range(horizon - 1):
        powers_l.append(a_exp @ powers_l[-1])
        anb_l.append(a_exp @ anb_l[-1])
    if compat_last_aqp_zero:
        powers_l[horizon - 1] = jnp.zeros_like(powers_l[horizon - 1])
    a_qp = jnp.stack(powers_l).reshape(horizon * STATE_DIM, STATE_DIM)
    anb = jnp.stack(anb_l)
    # anb[k] = A^k B, k = 0..h-1 (mpc_osqp.cc:368-373)

    # Lower-block-triangular B_qp: block (i, j) = A^(i-j) B for j <= i —
    # assembled with one gather instead of h^2/2 dynamic-update-slices
    # (which dominated the batched QP build cost).
    i_idx = jnp.arange(horizon)[:, None]
    j_idx = jnp.arange(horizon)[None, :]
    delta = jnp.clip(i_idx - j_idx, 0, horizon - 1)      # (h, h)
    blocks = anb[delta]                                   # (h, h, 13, 12)
    blocks = jnp.where((i_idx >= j_idx)[:, :, None, None], blocks, 0.0)
    b_qp = blocks.transpose(0, 2, 1, 3).reshape(horizon * STATE_DIM,
                                                horizon * ACTION_DIM)
    return a_qp, b_qp


def condense_blocks(a_exp, b_exp, horizon=10, compat_last_aqp_zero=True):
    """Condensation kept in block form: (a_qp (h*13,13), blocks (h,h,13,12))
    with blocks[i,j] = A^(i-j) B for j <= i else 0 — the lower-triangular
    block structure of B_qp WITHOUT the dense (h*13, h*12) materialization.

    NOT the production path: the idea was to skip condense()'s
    (i,13,j,12)->(130,120) relayout, but the paired 4D einsum in
    build_qp_cost_blocks measured 3.4x SLOWER end-to-end on a v5e (107 ms
    vs 31 ms MPC period at batch 4096) — XLA lowers the small-dim
    'iacr,ibcs->arbs' contraction far worse than the dense matmul.
    Kept (with its equivalence test) as a documented dead end."""
    powers_l = [a_exp]
    anb_l = [b_exp]
    for _ in range(horizon - 1):
        powers_l.append(a_exp @ powers_l[-1])
        anb_l.append(a_exp @ anb_l[-1])
    if compat_last_aqp_zero:
        powers_l[horizon - 1] = jnp.zeros_like(powers_l[horizon - 1])
    a_qp = jnp.stack(powers_l).reshape(horizon * STATE_DIM, STATE_DIM)
    anb = jnp.stack(anb_l)
    i_idx = jnp.arange(horizon)[:, None]
    j_idx = jnp.arange(horizon)[None, :]
    delta = jnp.clip(i_idx - j_idx, 0, horizon - 1)
    blocks = anb[delta]                                   # (h, h, 13, 12)
    blocks = jnp.where((i_idx >= j_idx)[:, :, None, None], blocks, 0.0)
    return a_qp, blocks


def build_qp_cost_blocks(a_qp, blocks, x0, x_des, weights, alpha,
                         horizon=10):
    """build_qp_cost on the block form: the Hessian contraction
    P[(a,r),(b,s)] = 2 sum_{i,c} blocks[i,a,c,r] w[c] blocks[i,b,c,s] runs
    as one einsum whose (a,r,b,s) output reshapes to (120,120) for free
    (contiguous), replacing condense()'s dense-B_qp transpose + matmul.
    Numerically identical to build_qp_cost (same sums, MXU f32)."""
    w = weights                                            # (13,)
    wb = blocks * w[None, None, :, None]
    p4 = jnp.einsum('iacr,ibcs->arbs', wb, blocks)
    n = horizon * ACTION_DIM
    p_mat = 2.0 * p4.reshape(n, n) + alpha * jnp.eye(n, dtype=blocks.dtype)
    state_diff = (a_qp @ x0 - x_des).reshape(horizon, STATE_DIM)
    wsd = state_diff * w[None, :]
    q_vec = 2.0 * jnp.einsum('iacr,ic->ar', blocks, wsd).reshape(n)
    return p_mat, q_vec


def condense_chain(a_exp, b_exp, horizon=10, compat_last_aqp_zero=True):
    """The raw condensation ingredients WITHOUT materializing B_qp:
    (a_qp (h*13, 13), s (h, 13, 12)) with s[k] = A^k B.

    B_qp is lower-block-triangular with block (i, j) = s[i-j], so every
    condensed quantity reduces to sums over the chain:
      P[a,b] = 2 sum_{i>=max(a,b)} s[i-a]^T Q s[i-b]
             = 2 * T[|a-b|, h-1-max(a,b)]   (transposed when a<b),
      T[d,j] = sum_{k<=j} M[k, k+d],  M[k,d] = s[k]^T Q s[d]
      q[a]   = 2 sum_k s[k]^T (w * sd[k+a])
    — the batched form of the reference's O(h^2) CalculateQpMats recursion
    (mpc_osqp.cc:353-435). The production path evaluates P *inside* the
    fused Pallas kernel (ops/pallas/fused_qp.fused_solve_chain_batch: one
    13-term rank-1 VMEM pass + block suffix sums), so the (120, 130) B_qp
    and the (120, 120) P never round-trip through HBM; XLA keeps only this
    tiny chain (10 sequential 13x13 matmuls) and the gradient.

    ``compat_last_aqp_zero`` keeps the reference's zero final A_qp block
    (see condense()); it only affects q via state_diff.
    """
    h = horizon
    powers_l = [a_exp]
    anb_l = [b_exp]
    for _ in range(h - 1):
        powers_l.append(a_exp @ powers_l[-1])
        anb_l.append(a_exp @ anb_l[-1])
    if compat_last_aqp_zero:
        powers_l[h - 1] = jnp.zeros_like(powers_l[h - 1])
    a_qp = jnp.stack(powers_l).reshape(h * STATE_DIM, STATE_DIM)
    s = jnp.stack(anb_l)                               # (h, 13, 12)
    return a_qp, s


def gradient_from_chain(s, a_qp, x0, x_des, weights, horizon=None):
    """q = 2 B_qp^T Q (A_qp x0 - x_des) from the chain: tiny einsum.

    Dims derive from s (h, state, act) so shrunken test sizes work."""
    h, sd, ad = s.shape
    state_diff = (a_qp @ x0 - x_des).reshape(h, sd)
    wsd = state_diff * weights[None, :]
    a_i = jnp.arange(h)[:, None]
    k_i = jnp.arange(h)[None, :]
    ak = a_i + k_i                                     # (a, k) source step
    wsd_sh = jnp.where((ak < h)[:, :, None],
                       wsd[jnp.clip(ak, 0, h - 1)], 0.0)   # (a, k, 13)
    return 2.0 * jnp.einsum('kcr,akc->ar', s, wsd_sh).reshape(h * ad)


def hessian_from_chain(s, weights, alpha, horizon=None):
    """P = 2 B_qp^T Q B_qp + alpha I evaluated from the chain (XLA path;
    reference for the in-kernel build — see condense_chain docstring)."""
    h, sd, ad = s.shape
    w = weights
    u = (s * w[None, :, None]).transpose(0, 2, 1).reshape(h * ad, sd)
    v = s.transpose(0, 2, 1).reshape(h * ad, sd)
    m2 = u @ v.T                                       # (h*12, h*12)
    m4 = m2.reshape(h, ad, h, ad).transpose(0, 2, 1, 3)

    k_i = jnp.arange(h)[None, :]
    d_i = jnp.arange(h)[:, None]
    tgt = jnp.clip(k_i + d_i, 0, h - 1)
    dg = m4[jnp.broadcast_to(k_i, (h, h)), tgt]        # (d, k, 12, 12)
    dg = jnp.where(((k_i + d_i) < h)[:, :, None, None], dg, 0.0)
    csum = jnp.cumsum(dg, axis=1)                      # (d, j, 12, 12)

    a_i = jnp.arange(h)[:, None]
    b_i = jnp.arange(h)[None, :]
    delta = jnp.abs(a_i - b_i)
    jj = h - 1 - jnp.maximum(a_i, b_i)
    blocks = csum[delta, jj]                           # (a, b, 12, 12)
    blocks = jnp.where((a_i >= b_i)[:, :, None, None], blocks,
                       jnp.swapaxes(blocks, -1, -2))
    n = h * ad
    return (2.0 * blocks.transpose(0, 2, 1, 3).reshape(n, n)
            + alpha * jnp.eye(n, dtype=s.dtype))


def condense_cost(a_exp, b_exp, x0, x_des, weights, alpha, horizon=10,
                  compat_last_aqp_zero=True):
    """(P, q) directly from the A^k B chain (see condense_chain). Equals
    condense() + build_qp_cost() to f32 precision."""
    a_qp, s = condense_chain(a_exp, b_exp, horizon, compat_last_aqp_zero)
    p_mat = hessian_from_chain(s, weights, alpha, horizon)
    q_vec = gradient_from_chain(s, a_qp, x0, x_des, weights, horizon)
    return p_mat, q_vec


def build_qp_cost(a_qp, b_qp, x0, x_des, weights, alpha, horizon=10):
    """Condensed dense QP cost: P = 2 B^T Q B + alpha I, q = 2 B^T Q (A x0 - xd).

    Matches mpc_osqp.cc:430-434 exactly: the Hessian is doubled *before* the
    alpha regularizer is added (so the diagonal gets alpha, not 2 alpha), and
    the gradient is 2 B_qp^T Q (A_qp x0 - x_des) (:681-683).
    """
    w = jnp.tile(weights, horizon)  # (h*13,)
    wb = w[:, None] * b_qp          # diag(w) @ B_qp
    p_mat = 2.0 * (b_qp.T @ wb)
    p_mat = p_mat + alpha * jnp.eye(b_qp.shape[1], dtype=b_qp.dtype)
    state_diff = a_qp @ x0 - x_des
    q_vec = 2.0 * (b_qp.T @ (w * state_diff))
    return p_mat, q_vec


def build_state_vec(rpy, position, omega, velocity):
    """13-dim state (mpc_osqp.cc:630-633)."""
    return jnp.concatenate([
        rpy, position, omega, velocity, jnp.array([-GRAVITY], jnp.float32)
    ])


def build_desired_states(com_rpy, com_position, desired_position,
                         desired_velocity, desired_rpy, desired_omega,
                         dt, horizon=10):
    """(h*13,) desired trajectory. mpc_osqp.cc:635-659.

    Yaw and xy-position are integrated forward from the *current* yaw / xy by
    dt*(i+1) times the commanded rates; z is held at the desired height; roll/
    pitch and all rates are held; desired vz is 0.
    """
    i1 = (jnp.arange(horizon, dtype=jnp.float32) + 1.0) * dt  # (h,)
    roll = jnp.full((horizon,), desired_rpy[0])
    pitch = jnp.full((horizon,), desired_rpy[1])
    yaw = com_rpy[2] + i1 * desired_omega[2]
    x = com_position[0] + i1 * desired_velocity[0]
    y = com_position[1] + i1 * desired_velocity[1]
    z = jnp.full((horizon,), desired_position[2])
    wx = jnp.full((horizon,), desired_omega[0])
    wy = jnp.full((horizon,), desired_omega[1])
    wz = jnp.full((horizon,), desired_omega[2])
    vx = jnp.full((horizon,), desired_velocity[0])
    vy = jnp.full((horizon,), desired_velocity[1])
    vz = jnp.zeros((horizon,))
    g = jnp.full((horizon,), -GRAVITY)
    per_step = jnp.stack([roll, pitch, yaw, x, y, z, wx, wy, wz, vx, vy, vz, g],
                         axis=1)  # (h, 13)
    return per_step.reshape(-1)


def friction_cone_block(mu):
    """The 5x3 per-(leg,step) constraint block (mpc_osqp.cc:437-447):
    4 friction-pyramid rows (+-fx + mu fz >= 0, +-fy + mu fz >= 0) and fz.
    Identical for every leg/step — the whole constraint matrix is
    block-diagonal with this block, which we exploit instead of materializing
    the (200, 120) matrix.
    """
    return jnp.array([
        [-1.0, 0.0, mu],
        [1.0, 0.0, mu],
        [0.0, -1.0, mu],
        [0.0, 1.0, mu],
        [0.0, 0.0, 1.0],
    ], jnp.float32)


def constraint_bounds(contact_table, mass, mu, horizon=10):
    """(h*4*5,) lower/upper bounds. mpc_osqp.cc:449-477.

    contact_table: (h, 4) in {0,1}. fz in [0.1, 10] * m*g * contact; friction
    rows in [0, (mu+1) * fz_max * contact].
    """
    fz_max = mass * GRAVITY * F_MAX_SCALE
    fz_min = mass * GRAVITY * F_MIN_SCALE
    c = contact_table.reshape(horizon * 4)  # (h*4,)
    lb = jnp.stack([jnp.zeros_like(c)] * 4 + [fz_min * c], axis=1)  # (h*4, 5)
    fric_ub = (mu + 1.0) * fz_max * c
    ub = jnp.stack([fric_ub] * 4 + [fz_max * c], axis=1)
    return lb.reshape(-1), ub.reshape(-1)


def apply_constraint(x, mu, horizon=10):
    """C @ x without materializing C: x (h*12,) -> (h*4*5,).

    C is block-diag of identical 5x3 blocks, so this is one shared-weight
    matmul — MXU-friendly when batched over robots.
    """
    g = friction_cone_block(mu)  # (5,3)
    xb = x.reshape(horizon * 4, 3)
    return (xb @ g.T).reshape(-1)


def apply_constraint_t(y, mu, horizon=10):
    """C^T @ y: y (h*4*5,) -> (h*12,)."""
    g = friction_cone_block(mu)
    yb = y.reshape(horizon * 4, 5)
    return (yb @ g).reshape(-1)
