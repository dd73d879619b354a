"""A/B demo: default-weight FSM controller vs the RL weight policy.

Headless port of test/RL_MPC_show.py (:1-135): two Aliengos on the same
terrain, one driven with the robot's default MPC weights, one with weights
predicted online by the (optionally checkpointed) policy network.

Run:  python examples/rl_mpc_show.py [checkpoint_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_locomotion_tpu.control import runner, weight_policy
from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.control.weight_policy import WeightPolicy
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.ops.qp import production_qp_config
from rl_mpc_locomotion_tpu.sim import physics, terrain


def main(checkpoint=None, seconds: float = 4.0):
    params = robots.aliengo_params()
    cfg = ControlConfig(qp=production_qp_config()._replace(use_pallas=False))
    pcfg = physics.PhysicsConfig()
    ter = terrain.flat()
    policy = WeightPolicy(checkpoint=checkpoint)
    commands = jnp.array([0.5, 0.0, 0.0], jnp.float32)

    q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)
    pstate = jax.vmap(lambda _: physics.init_state(params, q0, 0.345))(
        jnp.arange(2))
    cstate = jax.vmap(lambda _: runner.init_state(params, cfg))(jnp.arange(2))
    passive_iters = jnp.zeros(2, jnp.int32)

    @jax.jit
    def tick(pstate, cstate, passive_iters, prev_action):
        # policy inference for lane 1 happens IN the jitted tick (the
        # reference runs its policy at ~100 Hz; an eager per-tick vmap
        # re-traces the MLP every call and is ~1000x slower)
        body1 = physics.root_state_vector(
            jax.tree.map(lambda x: x[1], pstate))
        w1, a1 = weight_policy.policy_step(
            policy.model, policy.params, body1, pstate.q[1], pstate.qd[1],
            commands, prev_action)
        weights = jnp.stack([jnp.asarray(params.mpc_weights), w1])

        def one(ps, cs, pi, w):
            body = physics.root_state_vector(ps)
            cs, tau, pi, m = runner.fsm_step(params, cfg, cs, pi, ps.q,
                                             ps.qd, body, commands,
                                             mpc_weights=w, control_mode=1)
            ps, _, _ = physics.step(params, pcfg, ter, ps, tau)
            return ps, cs, pi
        ps, cs, pi = jax.vmap(one)(pstate, cstate, passive_iters, weights)
        return ps, cs, pi, a1

    prev_action = jnp.zeros(12, jnp.float32)
    for t in range(int(seconds * 100)):
        pstate, cstate, passive_iters, prev_action = tick(
            pstate, cstate, passive_iters, prev_action)
        if t % 100 == 0:
            pos = np.asarray(pstate.pos)
            print(f"t={t/100:4.1f}s  default[x={pos[0,0]:+.2f} "
                  f"z={pos[0,2]:.3f}]  policy[x={pos[1,0]:+.2f} "
                  f"z={pos[1,2]:.3f}]")
    pos = np.asarray(pstate.pos)
    print(f"final: default x={pos[0,0]:.2f}, policy x={pos[1,0]:.2f}")
    return bool((pos[:, 2] > 0.15).all())


if __name__ == "__main__":
    ckpt = sys.argv[1] if len(sys.argv) > 1 else None
    raise SystemExit(0 if main(ckpt) else 1)
