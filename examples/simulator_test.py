"""Sim sanity check: one Aliengo held in a stand pose by joint PD.

Headless port of test/simulator_test.py (:1-86): verifies sim setup, joint
conventions and the stand configuration without any MPC in the loop.

Run:  python examples/simulator_test.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.sim import physics, terrain


def main(seconds: float = 3.0):
    params = robots.aliengo_params()
    pcfg = physics.PhysicsConfig()
    ter = terrain.flat()
    stand = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)
    state = physics.init_state(params, stand, height=0.345)

    kp, kd = 60.0, 2.0

    @jax.jit
    def tick(state):
        tau = kp * (stand - state.q) - kd * state.qd
        return physics.step(params, pcfg, ter, state, tau)[0]

    ticks = int(seconds * 100)
    for t in range(ticks):
        state = tick(state)
        if t % 50 == 0:
            print(f"t={t/100:4.1f}s  z={float(state.pos[2]):.3f}  "
                  f"q_err={float(jnp.abs(state.q - stand).max()):.4f}  "
                  f"upright w={float(state.quat[0]):.4f}")
    z = float(state.pos[2])
    ok = 0.25 < z < 0.40 and float(state.quat[0]) > 0.99
    print("PASS: robot stands" if ok else f"FAIL: z={z:.3f}")
    return ok


if __name__ == "__main__":
    raise SystemExit(0 if main() else 1)
