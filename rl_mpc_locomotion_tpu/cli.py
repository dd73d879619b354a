"""Command-line entry points: play / train / bench.

Replaces RL_MPC_Locomotion.py (play, :13-130) and RL_Environment/train.py
(:30-93). No Isaac Gym viewer — `play` runs the closed-loop JAX sim headless
and streams state telemetry (optionally to the native logger); `train` runs
on-device PPO; `bench` is the perf harness.

Usage:
  python -m rl_mpc_locomotion_tpu.cli play --robot Aliengo --mode Min \
      --num-envs 4 --gait trot --vx 0.5 --seconds 5
  python -m rl_mpc_locomotion_tpu.cli train --task Aliengo --num-envs 512 \
      --max-iterations 1000 --checkpoint runs/aliengo
  python -m rl_mpc_locomotion_tpu.cli bench --batch 4096
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the full train step takes minutes
    to compile (TPU or CPU); cache hits make repeated CLI runs start in
    seconds. Same setup bench.py uses; off only if the dir can't be made."""
    import jax
    cache = os.environ.get(
        "RL_MPC_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

ROBOT_IDS = {"aliengo": 0, "go1": 1, "a1": 2}
GAIT_IDS = {"trot": 0, "bound": 1, "pronk": 2, "pace": 3, "gallop": 5,
            "walk": 6, "trotrun": 7}
MODES = ("Min", "Fsm", "Policy")
TERRAINS = ("flat", "slope", "stairs", "rough", "uneven")


def gamepad_tick_update(gamepad):
    """Per-tick gamepad poll (RL_MPC_Locomotion.py:89-105 equivalent).

    Returns (commands (3,) float32, gait_id, control_mode, estop). The
    e-stop is the latched ``estop_flagged`` attribute (LB+RB), not part of
    the command vector.
    """
    commands = gamepad.get_command()
    return (np.asarray(commands, np.float32), int(gamepad.get_gait()),
            int(gamepad.get_mode()), bool(gamepad.estop_flagged))


def _make_terrain(name: str):
    from .sim import terrain
    return {
        "flat": terrain.flat,
        "slope": terrain.slope_platform,
        "stairs": terrain.stairs,
        "rough": terrain.random_uniform,
        "uneven": terrain.uneven_patches,
    }[name]()


def cmd_play(args):
    import jax
    import jax.numpy as jnp

    from .control import runner
    from .control.types import ControlConfig
    from .models import robots
    from .sim import physics, terrain as terrain_mod

    params = {"aliengo": robots.aliengo_params, "go1": robots.go1_params,
              "a1": robots.a1_params}[args.robot.lower()]()
    cfg = ControlConfig(flat_ground=(args.terrain == "flat"))
    pcfg = physics.PhysicsConfig()
    ter = _make_terrain(args.terrain)
    gait_id = GAIT_IDS[args.gait.lower()]
    commands = jnp.array([args.vx, args.vy, args.yaw_rate], jnp.float32)

    n = args.num_envs
    q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)
    init_h = float(params.body_height) + 0.03
    pstate = jax.vmap(lambda _: physics.init_state(params, q0, init_h))(
        jnp.arange(n))
    cstate = jax.vmap(lambda _: runner.init_state(params, cfg))(jnp.arange(n))

    if args.mode == "Policy":
        # policy inference runs INSIDE the jitted tick (policy_fsm_step):
        # one compiled program per tick, ~100 Hz-class like the reference's
        # deployment (docs/2-development_log.md:127). A host-side eager
        # vmap here would re-trace the MLP every tick (measured ~4 s/tick).
        from .control.weight_policy import WeightPolicy, policy_fsm_step
        policy = WeightPolicy(checkpoint=args.checkpoint)
    else:
        policy = None

    passive_iters = jnp.zeros(n, jnp.int32)

    @jax.jit
    def tick(pstate, cstate, passive_iters, prev_action, control_mode,
             commands, gait_id):
        # scalar QP gate: when no robot is in LOCOMOTION, lax.cond skips the
        # MPC solve for the whole fleet (parked-in-recovery fleets previously
        # paid the dominant QP cost for nothing). Robots entering locomotion
        # this tick don't run it yet (2-tick transition protocol), so the
        # state read at tick start is safe.
        from .control import fsm as fsm_mod
        any_loco = jnp.any(cstate.fsm.state == fsm_mod.LOCOMOTION)
        # ... and only on ticks where some robot's MPC schedule fires
        # (per-robot counters mask the commit inside locomotion.step)
        any_want = jnp.any(
            (cstate.loco.iteration_counter + 1)
            % cfg.iterations_between_mpc == 0)
        any_loco = jnp.logical_and(any_loco, any_want)

        def one(ps, cs, pi, pa):
            body = physics.root_state_vector(ps)
            if args.mode == "Policy":
                cs, tau, pa, pi, m = policy_fsm_step(
                    params, cfg, policy.model, policy.params, cs, pa,
                    ps.q, ps.qd, body, commands, gait_id, control_mode,
                    pi, solve_gate=any_loco)
            elif args.mode == "Fsm":
                cs, tau, pi, m = runner.fsm_step(
                    params, cfg, cs, pi, ps.q, ps.qd, body, commands,
                    gait_id=gait_id, control_mode=control_mode,
                    solve_gate=any_loco)
            else:
                cs, tau, m = runner.min_step(
                    params, cfg, cs, ps.q, ps.qd, body, commands,
                    gait_id=gait_id, solve_gate=any_want)
            ps, _, _ = physics.step(params, pcfg, ter, ps, tau)
            return ps, cs, pi, pa, m
        return jax.vmap(one, in_axes=(0, 0, 0, 0))(pstate, cstate,
                                                   passive_iters, prev_action)

    ticks = int(args.seconds / cfg.dt)
    render_frames = [] if args.render else None
    telemetry = None
    if args.telemetry:
        # native ring-buffer logger; frame mirrors the reference's MPC log
        # (Logger.py + ConvexMPCLocomotion.py:192-215)
        from .utils.native_runtime import TelemetryLogger
        fields = (["tick", "x", "y", "z", "vx", "com_z_est", "mpc_loss"]
                  + [f"f_{l}{a}" for l in range(4) for a in "xyz"])
        telemetry = TelemetryLogger(args.telemetry, frame_size=len(fields),
                                    field_names=fields)
    # gamepad (RL_MPC_Locomotion.py:89-91): left stick vx/vy, right stick
    # yaw, LB cycles gait, RB cycles mode, LB+RB e-stop; scripted commands
    # otherwise
    gamepad = None
    if args.gamepad:
        from .utils.native_runtime import Gamepad
        gamepad = Gamepad()
        if not gamepad.connected:
            print("[play] no gamepad at /dev/input/js0 — using scripted "
                  "commands")
            gamepad = None

    # unsafe handling mirrors RL_MPC_Locomotion.py:103-105: on the
    # locomotionUnsafe flag, command RECOVERY_STAND for a while, then
    # restore the requested mode.
    control_mode = jnp.int32(1)  # LOCOMOTION
    gait_arr = jnp.int32(gait_id)
    recovery_until = -1
    prev_action = jnp.zeros((n, 12), jnp.float32)
    t0 = time.time()
    for t in range(ticks):
        if gamepad is not None:
            cmd, gid, mode, estop = gamepad_tick_update(gamepad)
            if estop:
                print("[play] e-stop (LB+RB)")
                break
            commands = jnp.asarray(cmd)
            gait_arr = jnp.int32(gid)
            control_mode = jnp.int32(mode)
        pstate, cstate, passive_iters, prev_action, metrics = tick(
            pstate, cstate, passive_iters, prev_action, control_mode,
            commands, gait_arr)
        if args.mode in ("Fsm", "Policy"):
            unsafe = bool(np.any(np.asarray(
                cstate.fsm.locomotion_unsafe)))
            if unsafe and t > recovery_until:
                print(f"[play] t={t * cfg.dt:.2f}s locomotion unsafe -> "
                      "RECOVERY_STAND")
                control_mode = jnp.int32(2)
                recovery_until = t + int(2.0 / cfg.dt)
                cstate = cstate._replace(fsm=cstate.fsm._replace(
                    locomotion_unsafe=jnp.zeros_like(
                        cstate.fsm.locomotion_unsafe)))
            elif t == recovery_until:
                control_mode = jnp.int32(1)
        if render_frames is not None:
            from .utils.viewer import record_frame
            env0 = jax.tree.map(lambda x: x[0], pstate)
            render_frames.append(record_frame(params, env0))
        if telemetry is not None:
            pos0 = np.asarray(pstate.pos[0])
            frame = np.concatenate([
                [t, pos0[0], pos0[1], pos0[2], float(pstate.v[0, 0]),
                 float(metrics["com_z"][0]),
                 float(metrics["mpc_loss"][0])],
                np.asarray(metrics["f_ff"][0]).reshape(-1)]).astype(
                    np.float32)
            telemetry.push(frame)
        if t % args.log_every == 0:
            pos = np.asarray(pstate.pos)
            print(f"t={t * cfg.dt:6.2f}s  env0 pos="
                  f"[{pos[0, 0]:+.2f} {pos[0, 1]:+.2f} {pos[0, 2]:+.3f}] "
                  f"vx={float(pstate.v[0, 0]):+.2f} "
                  f"com_z={float(metrics['com_z'][0]):.3f}")
    if telemetry is not None:
        telemetry.flush()
        telemetry.close()
        print(f"[play] telemetry written to {args.telemetry}")
    if render_frames:
        from .utils.viewer import render
        out = render(render_frames, ter, args.render, dt=cfg.dt)
        print(f"[play] animation written to {out}")
    wall = time.time() - t0
    # speed factor: simulated seconds per wall second (>1 = faster than RT)
    rt = ticks * cfg.dt / wall
    print(f"[play] {ticks} ticks x {n} envs in {wall:.1f}s "
          f"({ticks * n / wall:.0f} robot-ticks/s, {rt:.2f}x real-time — "
          f"{'faster' if rt >= 1.0 else 'slower'} than real-time)")


def yaml_scalar(text: str):
    """Parse a CLI override value with YAML scalar rules ('3'->int, etc.)."""
    import yaml
    return yaml.safe_load(text)


def cmd_train(args):
    import jax as _jax

    from .control.types import ControlConfig
    from .models import robots
    from .ops.qp import production_qp_config
    from .rl import train as train_mod
    from .rl.ppo import PPOConfig
    from .sim.env import EnvConfig

    from .utils.seeding import set_seed
    set_seed(args.seed)  # host-side RNGs (python/numpy); device randomness
    # flows from PRNGKey(cfg.seed) inside train()

    if args.robots:
        # heterogeneous batch: cycle the listed robots over the envs
        # (stacked per-env RobotParams, SURVEY §7)
        ids = [robots.ROBOT_NAMES[r.strip().lower()]
               for r in args.robots.split(",")]
        ids = (ids * (args.num_envs // len(ids) + 1))[:args.num_envs]
        params = train_mod.stacked_robot_params(ids)
    else:
        params = {"aliengo": robots.aliengo_params, "go1": robots.go1_params,
                  "a1": robots.a1_params}[args.task.lower()]()
    # Pallas solver on TPU; XLA path elsewhere
    qp = production_qp_config()._replace(
        use_pallas=_jax.default_backend() == "tpu")
    dr = None
    if args.dr:
        from .sim.randomize import DomainRandomization
        dr = DomainRandomization()
    cfg = train_mod.TrainConfig(
        num_envs=args.num_envs,
        max_iterations=args.max_iterations or 5000,
        seed=args.seed,
        ppo=PPOConfig(),
        # non-flat terrain activates the slope-aware MPC path (plane-fit
        # ground normal), matching the reference's DEFAULT training
        # condition Parameters.flat_ground=False (Parameters.py:22,
        # tasks/aliengo.py:135-143)
        env=EnvConfig(control=ControlConfig(
            qp=qp, flat_ground=(args.terrain == "flat")), dr=dr),
    )
    if args.config:
        # YAML overlay (cfg/*.yaml) + dotted-key CLI overrides, the Hydra
        # config.yaml equivalent (utils/config.py)
        from .utils.config import load_config
        overrides = dict(kv.split("=", 1) for kv in args.override)
        overrides = {k: yaml_scalar(v) for k, v in overrides.items()}
        cfg = load_config(cfg, args.config, overrides)
        if isinstance(cfg.env.dr, dict):
            # YAML spec-dict -> DomainRandomization (generic DR engine)
            import dataclasses as _dc
            from .sim.randomize import from_dict
            cfg = _dc.replace(cfg, env=_dc.replace(
                cfg.env, dr=from_dict(cfg.env.dr)))
    elif args.override:
        from .utils.config import apply_overrides
        cfg = apply_overrides(
            cfg, {k: yaml_scalar(v) for k, v in
                  (kv.split("=", 1) for kv in args.override)})
    mesh = None
    if args.multi_device:
        import jax
        import numpy as np
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("env",))
    ter = _make_terrain(args.terrain)
    from .utils.profiling import device_trace
    resume_from = args.resume
    if resume_from == "":  # bare --resume: latest run in the save dir
        if not args.checkpoint:
            raise SystemExit("--resume without a path needs --checkpoint")
        resume_from = args.checkpoint
    with device_trace(args.profile_dir):
        train_mod.train(params, cfg, ter, mesh=mesh,
                        checkpoint_dir=args.checkpoint,
                        log_dir=args.log_dir,
                        resume_from=resume_from)


def cmd_bench(args):
    sys.path.insert(0, ".")
    from bench import bench
    print(json.dumps(bench(batch=args.batch)))


def cmd_eval(args):
    """A/B eval: trained weight policy vs default MPC weights
    (test/RL_MPC_show.py:73-84 made quantitative; rl/evaluate.py)."""
    import jax as _jax

    from .control.types import ControlConfig
    from .control.weight_policy import WeightPolicy
    from .models import robots
    from .ops.qp import production_qp_config
    from .rl import evaluate as eval_mod
    from .sim.env import EnvConfig

    from .sim.env import num_obs

    params = {"aliengo": robots.aliengo_params, "go1": robots.go1_params,
              "a1": robots.a1_params}[args.task.lower()]()
    qp = production_qp_config()._replace(
        use_pallas=_jax.default_backend() == "tpu")
    dr = None
    if args.dr:
        from .sim.randomize import DomainRandomization
        dr = DomainRandomization()
    cfg = EnvConfig(control=ControlConfig(
        qp=qp, flat_ground=(args.terrain == "flat")), dr=dr,
        obs_robot_id=args.obs_robot_id)
    ter = _make_terrain(args.terrain)
    policy = WeightPolicy(checkpoint=args.checkpoint, num_obs=num_obs(cfg))
    sweep = None
    if args.sweep:
        sweep = [(0.5, 0.0, 0.0), (1.0, 0.0, 0.0), (-0.5, 0.0, 0.0),
                 (0.0, 0.5, 0.0), (0.5, 0.0, 0.5), (1.5, 0.0, 0.0)]
    seeds = tuple(int(s) for s in args.seeds.split(",")) if args.seeds \
        else None
    res = eval_mod.ab_compare(params, cfg, ter, policy.params, policy.model,
                              num_envs=args.num_envs,
                              num_steps=int(args.seconds / cfg.control.dt),
                              seed=args.seed, command_sweep=sweep,
                              seeds=seeds)
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"[eval] written to {args.out}")


def main(argv=None):
    _enable_compilation_cache()
    p = argparse.ArgumentParser(prog="rl_mpc_locomotion_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("play", help="run controllers in the JAX sim")
    pp.add_argument("--robot", default="Aliengo",
                    choices=["Aliengo", "A1", "Go1", "aliengo", "a1", "go1"])
    pp.add_argument("--mode", default="Min", choices=MODES)
    pp.add_argument("--num-envs", type=int, default=1)
    pp.add_argument("--gait", default="trot", choices=list(GAIT_IDS))
    pp.add_argument("--terrain", default="flat", choices=TERRAINS)
    pp.add_argument("--vx", type=float, default=0.5)
    pp.add_argument("--vy", type=float, default=0.0)
    pp.add_argument("--yaw-rate", type=float, default=0.0)
    pp.add_argument("--seconds", type=float, default=5.0)
    pp.add_argument("--log-every", type=int, default=50)
    pp.add_argument("--checkpoint", default=None)
    pp.add_argument("--telemetry", default=None, metavar="PATH",
                    help="write per-tick MPC telemetry (native logger)")
    pp.add_argument("--render", default=None, metavar="GIF",
                    help="render env0's rollout to a .gif/.mp4 animation "
                         "(offline viewer, utils/viewer.py)")
    pp.add_argument("--gamepad", action="store_true",
                    help="drive commands from /dev/input/js0 (native reader)")
    pp.set_defaults(fn=cmd_play)

    pt = sub.add_parser("train", help="PPO weight-policy training")
    pt.add_argument("--task", default="Aliengo")
    pt.add_argument("--robots", default=None, metavar="LIST",
                    help="comma list for a heterogeneous batch, e.g. "
                         "'aliengo,go1,a1' (cycled over --num-envs; "
                         "overrides --task)")
    pt.add_argument("--config", default=None, metavar="YAML",
                    help="TrainConfig YAML overlay (e.g. cfg/aliengo.yaml)")
    pt.add_argument("--override", action="append", default=[],
                    metavar="KEY=VAL",
                    help="dotted config override, e.g. ppo.learning_rate=3e-4")
    pt.add_argument("--num-envs", type=int, default=512)
    pt.add_argument("--max-iterations", type=int, default=None,
                    help="PPO iterations (default 5000; YAML/--override win "
                         "when this flag is omitted)")
    pt.add_argument("--seed", type=int, default=1)
    # default = rough: the reference trains on random-uniform terrain with
    # the slope-aware MPC path active (Parameters.flat_ground=False,
    # RL_Environment/tasks/aliengo.py:135-143)
    pt.add_argument("--terrain", default="rough", choices=TERRAINS)
    pt.add_argument("--dr", action="store_true",
                    help="enable domain randomization (per-env friction/"
                         "mass/damping/contact-stiffness draws)")
    pt.add_argument("--checkpoint", default=None)
    pt.add_argument("--resume", nargs="?", const="", default=None,
                    metavar="PATH",
                    help="resume from a checkpoint (model_<i> path or run "
                         "dir; bare --resume uses the --checkpoint dir)")
    pt.add_argument("--multi-device", action="store_true")
    pt.add_argument("--log-dir", default=None, metavar="DIR",
                    help="write metrics.jsonl + TensorBoard scalars here")
    pt.add_argument("--profile-dir", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace here")
    pt.set_defaults(fn=cmd_train)

    pb = sub.add_parser("bench", help="MPC solves/s benchmark")
    pb.add_argument("--batch", type=int, default=4096)
    pb.set_defaults(fn=cmd_bench)

    pe = sub.add_parser("eval", help="A/B: trained policy vs default weights")
    pe.add_argument("--task", default="Aliengo")
    pe.add_argument("--checkpoint", default=None,
                    help="checkpoint path or run dir (default: random init)")
    pe.add_argument("--num-envs", type=int, default=64)
    pe.add_argument("--seconds", type=float, default=5.0)
    pe.add_argument("--seed", type=int, default=0)
    pe.add_argument("--seeds", default=None, metavar="S0,S1,...",
                    help="multi-seed eval: comma list; reports mean+-95%% CI")
    pe.add_argument("--obs-robot-id", action="store_true",
                    help="robot-one-hot conditioned checkpoint (obs 48+3)")
    pe.add_argument("--terrain", default="flat", choices=TERRAINS)
    pe.add_argument("--dr", action="store_true",
                    help="evaluate under domain randomization")
    pe.add_argument("--sweep", action="store_true",
                    help="also run a fixed command sweep")
    pe.add_argument("--out", default=None, metavar="JSON",
                    help="write results here")
    pe.set_defaults(fn=cmd_eval)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
