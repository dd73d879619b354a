"""Multi-robot / multi-terrain MPC integration demo.

Headless port of test/MPC_terrain_show.py (:1-137): six robots
(2x Aliengo, 2x A1, 2x Go1) running FSM controllers simultaneously on a
mixed-terrain heightfield — the integration exercise for heterogeneous
batches, the FSM, and terrain handling, without a viewer or gamepad
(commands are scripted).

Run:  python examples/mpc_terrain_show.py [--render out.gif]
(--render replaces the reference's live Isaac viewer with the offline
skeleton animation of robot 0, utils/viewer.py)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_locomotion_tpu.control import runner
from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.ops.qp import production_qp_config
from rl_mpc_locomotion_tpu.sim import physics, terrain


def main(seconds: float = 4.0, render: str | None = None):
    registry = robots.robot_registry()
    robot_ids = jnp.array([0, 0, 2, 2, 1, 1], jnp.int32)  # Aliengo/A1/Go1 x2
    n = len(robot_ids)
    # flat_ground=False enables the least-squares ground-normal estimator
    # (slope-aware MPC gravity), as the reference demo does on its
    # slope+stair terrain
    cfg = ControlConfig(flat_ground=False,
                        qp=production_qp_config()._replace(use_pallas=False))
    pcfg = physics.PhysicsConfig()
    ter = terrain.uneven_patches(seed=0)

    # spread spawn lanes across the terrain quadrants (rough side y<0,
    # stair side y>0), like the reference demo's env grid
    lane_y = jnp.array([-0.6, 0.6, -1.8, 1.8, -3.0, 3.0], jnp.float32)

    def make_one(rid, y):
        p = robots.select_robot(registry, rid)
        q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)
        ps = physics.init_state(p, q0, height=p.body_height + 0.03)
        ps = ps._replace(pos=ps.pos.at[1].set(y))
        return ps, runner.init_state(p, cfg)

    pstate, cstate = jax.vmap(make_one)(robot_ids, lane_y)
    passive_iters = jnp.zeros(n, jnp.int32)
    commands = jnp.tile(jnp.array([0.4, 0.0, 0.0], jnp.float32), (n, 1))

    @jax.jit
    def tick(pstate, cstate, passive_iters):
        def one(rid, ps, cs, pi, cmd):
            p = robots.select_robot(registry, rid)
            body = physics.root_state_vector(ps)
            cs, tau, pi, m = runner.fsm_step(p, cfg, cs, pi, ps.q, ps.qd,
                                             body, cmd, control_mode=1)
            ps, _, _ = physics.step(p, pcfg, ter, ps, tau)
            return ps, cs, pi, m
        return jax.vmap(one)(robot_ids, pstate, cstate, passive_iters,
                             commands)

    names = ["Aliengo", "Aliengo", "A1", "A1", "Go1", "Go1"]
    frames = [] if render else None
    for t in range(int(seconds * 100)):
        pstate, cstate, passive_iters, m = tick(pstate, cstate,
                                                passive_iters)
        if frames is not None:
            from rl_mpc_locomotion_tpu.utils.viewer import record_frame
            env0 = jax.tree.map(lambda x: x[0], pstate)
            frames.append(record_frame(
                robots.select_robot(registry, int(robot_ids[0])), env0))
        if t % 100 == 0:
            pos = np.asarray(pstate.pos)
            print(f"t={t/100:4.1f}s  " + "  ".join(
                f"{names[i]}[x={pos[i,0]:+.2f} z={pos[i,2]:.2f}]"
                for i in range(n)))
    pos = np.asarray(pstate.pos)
    upright = pos[:, 2] > 0.12
    moved = pos[:, 0] > 0.3
    print(f"upright: {upright.sum()}/6, moved forward: {moved.sum()}/6")
    if frames:
        from rl_mpc_locomotion_tpu.utils.viewer import render as render_fn
        print("rendering", render_fn(frames, ter, render))
    return bool(upright.all())


if __name__ == "__main__":
    _render = None
    if "--render" in sys.argv:
        i = sys.argv.index("--render")
        _render = sys.argv[i + 1] if len(sys.argv) > i + 1 else "show.gif"
    raise SystemExit(0 if main(render=_render) else 1)
