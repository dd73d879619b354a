"""Split the MPC solve-tick cost: XLA prep vs fused-kernel phases.

Phases timed separately (each its own jit, batch 4096):
  prep        build_a/b -> condense -> P,q -> bounds (the XLA side)
  soa         pad + moveaxis batch-major -> robots-in-lanes (pure layout)
  kernel_full fused kernel, production iters/ruiz
  kernel_i1   fused kernel, 1 ADMM iter (fixed costs: DMA+mask+Ruiz+K+GJ)
  kernel_r0   fused kernel, 1 iter + ruiz 0 (fixed costs minus Ruiz)
"""
import os, time, json
import jax
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
import numpy as np

from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.ops import srb_dynamics as srb
from rl_mpc_locomotion_tpu.ops import rotations as rot
from rl_mpc_locomotion_tpu.ops.pallas.fused_qp import fused_solve_batch

B = 4096
H = 10
params = robots.aliengo_params()


def timeit(fn, chain0, iters=20):
    """Chained slope timing (see profile_kernel_phases.timeit): ``fn`` must
    be ONE jitted executable mapping the chained value to the next chained
    value — on the axon relay, chains whose link spans multiple executables
    report ~0. Per-call cost is the slope between a 5-call and a
    (5+iters)-call run."""
    def run(k):
        c = chain0
        for _ in range(k):
            c = fn(c)
        jax.block_until_ready(c)

    run(2)
    t0 = time.perf_counter()
    run(5)
    t5 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(5 + iters)
    tlong = time.perf_counter() - t0
    return (tlong - t5) / iters * 1000.0


def prep_one(rpy, foot_positions, mpc_table, weights, commands, com_z):
    gravity_vec = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    com_position = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), com_z])
    r_feet = (rot.rot_x(rpy[0]).T @ rot.rot_y(rpy[1]).T @ rot.rot_z(rpy[2]).T)
    foot_world = foot_positions @ r_feet.T
    rotation = rot.rpy_to_rot(rpy).T
    inv_inertia = jnp.linalg.inv(params.body_inertia)
    inv_inertia_world = rotation @ inv_inertia @ rotation.T
    a_mat = srb.build_a_mat(rpy, gravity_vec)
    b_mat = srb.build_b_mat(1.0 / params.body_mass, inv_inertia_world, foot_world)
    a_exp, b_exp = srb.discretize_exact(a_mat, b_mat, 0.02)
    a_qp, b_qp = srb.condense(a_exp, b_exp, H)
    x0 = srb.build_state_vec(rpy, com_position, jnp.zeros(3), jnp.zeros(3))
    x_des = srb.build_desired_states(rpy, com_position,
                                     jnp.array([0., 0., params.body_height]),
                                     jnp.array([commands[0], commands[1], 0.]),
                                     jnp.zeros(3),
                                     jnp.array([0., 0., commands[2]]),
                                     0.02, H)
    p_mat, q_vec = srb.build_qp_cost(a_qp, b_qp, x0, x_des, weights, 1e-5, H)
    lb, ub = srb.constraint_bounds(mpc_table, params.body_mass,
                                   params.friction_coeff, H)
    mask = jnp.repeat(mpc_table.reshape(-1), 3)
    return p_mat, q_vec, lb, ub, mask


rpy = jnp.tile(jnp.array([0.01, -0.02, 0.1], jnp.float32), (B, 1))
foot = jnp.tile(jnp.array([[0.2, -0.15, -0.3], [0.2, 0.15, -0.3],
                           [-0.2, -0.15, -0.3], [-0.2, 0.15, -0.3]],
                          jnp.float32), (B, 1, 1))
table = jnp.tile((jnp.arange(H * 4).reshape(H, 4) % 2).astype(jnp.float32),
                 (B, 1, 1))
w = jnp.tile(jnp.asarray(params.mpc_weights, jnp.float32)[None], (B, 1))
cmds = jnp.tile(jnp.array([0.5, 0.0, 0.0], jnp.float32), (B, 1))
com_z = jnp.full((B,), 0.35, jnp.float32)

def prep_ab(rpy, foot_positions, mpc_table, weights, commands, com_z):
    gravity_vec = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    r_feet = (rot.rot_x(rpy[0]).T @ rot.rot_y(rpy[1]).T @ rot.rot_z(rpy[2]).T)
    foot_world = foot_positions @ r_feet.T
    rotation = rot.rpy_to_rot(rpy).T
    inv_inertia = jnp.linalg.inv(params.body_inertia)
    inv_inertia_world = rotation @ inv_inertia @ rotation.T
    a_mat = srb.build_a_mat(rpy, gravity_vec)
    b_mat = srb.build_b_mat(1.0 / params.body_mass, inv_inertia_world, foot_world)
    return srb.discretize_exact(a_mat, b_mat, 0.02)


def prep_condense(*args):
    a_exp, b_exp = prep_ab(*args)
    return srb.condense(a_exp, b_exp, H)


prep = jax.jit(jax.vmap(prep_one))
res = {}


def chain_prep(f):
    # single-executable link: vmapped prep + next-chained-com_z derivation
    # fused into one jit
    @jax.jit
    def step(cz):
        out = jax.vmap(f)(rpy, foot, table, w, cmds, cz)
        leaf = jax.tree.leaves(out)[0]
        return 0.35 + 1e-12 * leaf.reshape(B, -1)[:, 0]
    return step


res["prep_ab_ms"] = timeit(chain_prep(prep_ab), com_z)
print("prep_ab", res, flush=True)
res["prep_condense_ms"] = timeit(chain_prep(prep_condense), com_z)
print("prep_condense", res, flush=True)
res["prep_ms"] = timeit(chain_prep(prep_one), com_z)
print("prep", res, flush=True)

p, q, lb, ub, mask = jax.block_until_ready(prep(rpy, foot, table, w, cmds, com_z))
c = jnp.tile(srb.friction_cone_block(params.friction_coeff)[None, None],
             (B, H * 4, 1, 1))
x0 = jnp.zeros((B, 120), jnp.float32)
z0 = jnp.zeros((B, 200), jnp.float32)
y0 = jnp.zeros((B, 200), jnp.float32)
rm = jnp.ones((B,), jnp.float32)


def make_kernel(iters, ruiz):
    def f(p, q, c, lb, ub, mask, x, z, y, rm):
        return fused_solve_batch(p, q, c, lb, ub, mask, x, z, y, rm,
                                 iters=iters, sigma=1e-6, relax=1.6,
                                 rho_base=0.1, rho_eq_scale=1e3,
                                 ruiz_iters=ruiz, deferred_rho=True)
    return jax.jit(f)


def chain_kernel(iters, ruiz):
    # single-executable link: fused solve + warm-start derivation in one jit
    @jax.jit
    def step(xc):
        out = fused_solve_batch(p, q, c, lb, ub, mask, xc, z0, y0, rm,
                                iters=iters, sigma=1e-6, relax=1.6,
                                rho_base=0.1, rho_eq_scale=1e3,
                                ruiz_iters=ruiz, deferred_rho=True)
        return 1e-6 * out[0]
    return step


res["kernel_full_ms"] = timeit(chain_kernel(50, 3), x0)
print("kfull", res, flush=True)
res["kernel_i1_ms"] = timeit(chain_kernel(1, 3), x0)
print("ki1", res, flush=True)
res["kernel_r0_ms"] = timeit(chain_kernel(1, 0), x0)
print("kr0", res, flush=True)


@jax.jit
def soa_only(x):
    ps = jnp.moveaxis(p + x[:, :, None] * 1e-20, 0, -1)
    return 1e-12 * ps[0, 0, :][:, None] * jnp.ones((1, 120), jnp.float32)


res["soa_ms"] = timeit(soa_only, x0)
print(json.dumps({k: round(v, 2) for k, v in res.items()}))
