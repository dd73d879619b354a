"""Multi-device sharding tests on the virtual 8-device CPU mesh: the full
sharded PPO train step (rollout + pmean grad reduction) and equivalence with
the single-device path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rl_mpc_locomotion_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_mesh_creation(eight_devices):
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("env",)


def test_dryrun_multichip(eight_devices):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)


def test_entry_compiles(eight_devices):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as graft
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state, torques, metrics = out
    assert torques.shape == (32, 12)
    assert np.isfinite(np.asarray(torques)).all()


def test_sharded_env_step_matches_local(eight_devices):
    """vmapped env stepping gives identical results with and without
    sharding constraints."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rl_mpc_locomotion_tpu.control.types import ControlConfig
    from rl_mpc_locomotion_tpu.models import robots
    from rl_mpc_locomotion_tpu.ops.qp import QPConfig
    from rl_mpc_locomotion_tpu.sim import env as env_mod, terrain

    params = robots.aliengo_params()
    cfg = env_mod.EnvConfig(control=ControlConfig(
        qp=QPConfig(iters=5, iters2=0, adaptive_rho=False, polish=False,
                    ruiz_iters=1)))
    ter = terrain.flat(extent=20.0, cell=0.2)
    mesh = make_mesh(8)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states = jax.vmap(lambda k: env_mod.reset(params, cfg, k))(keys)
    actions = jnp.zeros((8, 12))

    step = jax.jit(jax.vmap(lambda s, a: env_mod.step(params, cfg, ter, s, a)))
    _, obs_local, rew_local, _, _ = step(states, actions)

    shard = NamedSharding(mesh, P("env"))
    states_sh = jax.tree.map(lambda x: jax.device_put(x, shard), states)
    actions_sh = jax.device_put(actions, shard)
    _, obs_sh, rew_sh, _, _ = step(states_sh, actions_sh)

    np.testing.assert_allclose(np.asarray(obs_local), np.asarray(obs_sh),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rew_local), np.asarray(rew_sh),
                               atol=1e-6)
