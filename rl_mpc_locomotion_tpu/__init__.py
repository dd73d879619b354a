"""rl_mpc_locomotion_tpu — a TPU-native quadruped RL+MPC locomotion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
silvery107/rl-mpc-locomotion (MIT-Cheetah-style convex-MPC locomotion with an
RL weight policy):

- ``ops``      pure-jnp math core: rotations, gait phase arithmetic, Bezier
               swing trajectories, leg kinematics, SRB dynamics condensation,
               and the batched ADMM GRF-QP solver (XLA + Pallas kernels).
- ``models``   robot constant pytrees (A1/Go1/Aliengo) and policy networks.
- ``control``  the jittable control stack: state estimator, locomotion
               planner, leg controller, FSM-as-data, robot runners.
- ``sim``      JAX physics (SRB + kinematic legs), terrain, RL environment.
- ``rl``       PPO training (rsl_rl recipe) on-device.
- ``parallel`` device-mesh sharding of rollouts and training.
- ``utils``    configs, logging, checkpointing.

Everything is a pure function over pytrees; the whole control loop vmaps over
thousands of robots and shards over a TPU mesh.
"""

__version__ = "0.1.0"
