"""Learning evidence test (slow): PPO on the MPC-in-the-loop env must
IMPROVE, not just run — the round-1 gap ("compiles and one step is finite"
is not "trains"). Mirrors the reference capability of train.py:61-81
(reward climbing over iterations) at smoke scale.

Calibration (CPU, 32 envs): reward/step climbs ~0.0002 -> ~0.008 over 60
iterations, monotonically in trend. The assertion leaves wide margin.
"""
import numpy as np
import pytest

from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.rl import train as train_mod
from rl_mpc_locomotion_tpu.rl.ppo import PPOConfig
from rl_mpc_locomotion_tpu.sim.env import EnvConfig


@pytest.mark.slow
def test_reward_improves_over_training():
    cfg = train_mod.TrainConfig(num_envs=32, max_iterations=60, seed=0,
                                ppo=PPOConfig(), env=EnvConfig())
    params = robots.aliengo_params()
    _, hist = train_mod.train(params, cfg, log_fn=lambda s: None)
    rs = [h["mean_reward"] for h in hist]
    assert all(np.isfinite(rs)), rs
    first = float(np.mean(rs[:2]))
    last = float(np.mean(rs[-2:]))
    # measured: first ~0.002, last ~0.0075 — require a 2x improvement and
    # an absolute gain, so noise can't pass
    assert last > 2.0 * first, f"no learning: first {first}, last {last}"
    assert last - first > 0.002, f"gain too small: {first} -> {last}"


def test_resume_is_true_continuation(tmp_path):
    """Checkpoint at iteration N, resume, run M more -> bit-identical params
    to an uninterrupted N+M run (SURVEY §5: checkpoints carry params,
    optimizer, env state, and RNG — so a restart changes nothing)."""
    import jax

    cfg = train_mod.TrainConfig(num_envs=8, max_iterations=4, seed=3,
                                save_interval=2, ppo=PPOConfig(),
                                env=EnvConfig())
    params = robots.aliengo_params()
    quiet = lambda s: None

    d = str(tmp_path / "run")
    ts_straight, _ = train_mod.train(params, cfg, log_fn=quiet,
                                     checkpoint_dir=d, max_iterations=4)
    # resume from the midpoint checkpoint (saved after iteration 2) and run
    # the remaining 2 iterations
    ts_resumed, _ = train_mod.train(params, cfg, log_fn=quiet,
                                    max_iterations=2, resume_from=d + "/model_2")
    same = jax.tree.map(lambda a, b: bool(np.array_equal(np.asarray(a),
                                                         np.asarray(b))),
                        ts_straight.params, ts_resumed.params)
    assert all(jax.tree.leaves(same)), "resumed params diverge from straight run"
    same_opt = jax.tree.map(lambda a, b: bool(np.array_equal(np.asarray(a),
                                                             np.asarray(b))),
                            ts_straight.opt_state, ts_resumed.opt_state)
    assert all(jax.tree.leaves(same_opt)), "optimizer state diverges"


def test_resume_without_env_snapshot_falls_back(tmp_path):
    """A bare-TrainState checkpoint (pre-env-snapshot format) still resumes
    — with freshly reset episodes."""
    from rl_mpc_locomotion_tpu.utils import checkpoint as ckpt

    cfg = train_mod.TrainConfig(num_envs=4, max_iterations=1, seed=0,
                                ppo=PPOConfig(), env=EnvConfig())
    params = robots.aliengo_params()
    quiet = lambda s: None
    ts, _ = train_mod.train(params, cfg, log_fn=quiet, max_iterations=1)
    d = str(tmp_path / "legacy")
    ckpt.save_checkpoint(d, 1, ts)  # no env_snapshot sibling
    ts2, hist = train_mod.train(params, cfg, log_fn=quiet, max_iterations=1,
                                resume_from=d)
    assert np.isfinite(hist[-1]["mean_reward"])
