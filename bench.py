"""Headline benchmark: convex-MPC solves/s on one chip.

Runs the FULL Min-mode control step (estimator -> gait -> foot placement ->
condensed QP build -> batched ADMM solve -> leg torques) for a batch of
robots in lockstep, where every MPC tick solves the QP for every robot, and
reports steady-state MPC solves per second.

Baseline: the reference does ~1k solves/s/core (1 ms qpOASES per solve,
docs/2-development_log.md:62-73, BASELINE.md) with zero batching.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import jax

# persistent compilation cache: the Pallas solver kernel is expensive to
# compile; cache hits make repeated bench runs start in seconds
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from rl_mpc_locomotion_tpu.control import runner
from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.ops.qp import QPConfig, production_qp_config

BASELINE_SOLVES_PER_S = 1000.0  # reference: ~1 ms/solve qpOASES, 1 core

# ---- physical sanity floor ------------------------------------------------
# One ADMM iteration per robot touches at least the P matvec (n^2 MACs) and
# the A / A^T products (2*m*n MACs): 2*(120^2 + 2*200*120) ~ 125 kFLOP.
# Dividing by an above-peak 2e14 FLOP/s (v5e bf16 peak ~197 TFLOP/s; the
# solver runs f32, peak ~half that) gives a period floor NO real measurement
# can beat. The broken-barrier failure mode this guards against reports
# periods ~1000x below it (e.g. 0.015 ms at batch 8192, the stale r3
# SWEEP.json row), so the margin is enormous in both directions.
_FLOPS_PER_QP_ITER = 2 * (120 * 120 + 2 * 200 * 120)
_ABOVE_PEAK_FLOPS = 2.0e14


def physical_floor_ms(batch: int, qp_iters: int) -> float:
    """Lower bound on one MPC period (ms) on any current TPU chip."""
    return batch * qp_iters * _FLOPS_PER_QP_ITER / _ABOVE_PEAK_FLOPS * 1e3


def bench(batch: int = 4096, warmup: int = 2, iters: int = 100,
          periods_per_dispatch: int = 10,
          qp_cfg: QPConfig | None = None) -> dict:
    """Times K MPC periods per dispatch with ``lax.scan`` so the number is
    the CHIP's steady-state period, not the host->device tunnel's dispatch
    round-trip (on the axon relay a per-period host loop adds ~30 ms of
    pure transport per call at batch 4096 — measured 56 ms/period host-loop
    vs 22 ms/period device-side for identical compute). A real deployment
    keeps the whole control loop on device (sim/env.py does), so the
    scanned measurement is the honest one; the single-dispatch latency is
    still reported as ``host_dispatch_ms`` for transparency.
    """
    params = robots.aliengo_params()
    # production solver config: warm-started fixed-iteration ADMM through
    # the Pallas robots-in-lanes kernel
    qp_cfg = qp_cfg or production_qp_config()
    cfg = ControlConfig(qp=qp_cfg)

    state = jax.vmap(lambda _: runner.init_state(params, cfg))(
        jnp.arange(batch))
    dof_q = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32),
                     (batch, 4)).reshape(batch, 12)
    dof_qd = jnp.zeros((batch, 12), jnp.float32)
    body = jnp.tile(jnp.array([0, 0, 0.35, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0],
                              jnp.float32), (batch, 1))
    commands = jnp.tile(jnp.array([0.5, 0.0, 0.0], jnp.float32), (batch, 1))

    def tick(state, gate):
        new_state, tau, _ = jax.vmap(
            lambda s, q, qd, b, c: runner.min_step(
                params, cfg, s, q, qd, b, c, solve_gate=gate))(
            state, dof_q, dof_qd, body, commands)
        return new_state, tau

    @jax.jit
    def two_ticks(state):
        """One MPC period = 2 control ticks; the QP solves on the 2nd
        (scalar-gated so the no-solve tick skips the QP entirely)."""
        state, _ = tick(state, jnp.bool_(False))
        state, tau = tick(state, jnp.bool_(True))
        return state, tau

    kk = periods_per_dispatch

    def make_run(k):
        @jax.jit
        def run(state):
            def period(state, _):
                state, _ = tick(state, jnp.bool_(False))
                state, tau = tick(state, jnp.bool_(True))
                return state, tau[0, 0]  # tiny carry-out; rest stays on chip
            state, probe = jax.lax.scan(period, state, None, length=k)
            return state, probe
        return run

    run_short, run_long = make_run(kk), make_run(4 * kk)

    def sync(v):
        """Force completion via a host fetch of one scalar.

        jax.block_until_ready alone is NOT a reliable completion barrier
        on the axon relay: at batch 8192 it returned in ~15 us for a
        10-period dispatch (559M solves/s — physically impossible), and
        the timing-sanity history (scripts/profile.py) shows the same for
        other large executables. A scalar device->host fetch cannot
        complete before the producing computation has."""
        return float(jax.device_get(v.reshape(-1)[-1]))

    # align counters so the gated tick is the solve tick; also compiles
    state, _ = two_ticks(state)
    for _ in range(warmup):
        state, probe = run_short(state)
        sync(probe)
        state, probe = run_long(state)
        sync(probe)

    # Paired-slope timing: each sample times a kk-period dispatch and a
    # 4kk-period dispatch back to back and takes the slope
    # (t_long - t_short) / 3kk. The tunnel round-trip (~30 ms on axon) and
    # dispatch overhead appear in BOTH terms and cancel, so the sample is
    # pure chip time — matching production, where the control loop runs
    # on-device under lax.scan with no per-period host sync. Each sample
    # still averages 3kk consecutive periods (JAX has no in-graph clock to
    # stamp individual scan steps), so the p99 is a tail over 30-period
    # means; per-period spikes shorter than that are averaged down — the
    # key names say so.
    samples = []
    t_short_ms = []
    rejected = 0
    for _ in range(iters):
        t0 = time.perf_counter()
        state, probe = run_short(state)
        sync(probe)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, probe = run_long(state)
        sync(probe)
        t_l = time.perf_counter() - t0
        # sanity: the long dispatch runs 4x the periods of the short one.
        # t_long <= t_short means a completion barrier failed (the r3
        # broken-barrier signature) or the host clock jumped — either way
        # the sample is garbage, not data.
        if t_l <= t_s:
            rejected += 1
            continue
        samples.append((t_l - t_s) / (3 * kk))
        t_short_ms.append(t_s * 1000.0)
    if rejected > iters // 2:
        raise RuntimeError(
            f"bench: {rejected}/{iters} samples had long-dispatch <= "
            "short-dispatch — the completion barrier is not working on "
            "this backend; refusing to report a number")

    # Transport-stall rejection for the TAIL statistics: a tunnel stall
    # landing inside a long dispatch inflates that sample's slope by
    # hundreds of ms (observed p99 994 ms on a congested session) even
    # though the chip work per period is constant. Samples beyond 3x the
    # median slope are physically impossible as chip time and are dropped
    # before computing the p99 that drives the real-time verdict; the
    # count is surfaced so a noisy session is visible in the artifact.
    all_ms = sorted(s * 1000.0 for s in samples)
    med_all = all_ms[len(all_ms) // 2]
    samples_ms = [s for s in all_ms if s <= 3.0 * med_all]
    stall_rejected = len(all_ms) - len(samples_ms)
    n = len(samples_ms)
    mean_ms = sum(samples_ms) / n
    p99_ms = samples_ms[min(n - 1, int(0.99 * n))]
    p50_ms = samples_ms[n // 2]
    # headline basis = MEDIAN slope: the chip work per period is constant,
    # so sample spread is transport noise — and a single tunnel stall
    # landing inside a long dispatch inflates that sample's slope by
    # hundreds of ms (observed: p50 20.05 / p99 994 on a congested
    # session). The mean is reported alongside; a large mean/p50 gap
    # flags a noisy session, not a slow chip.
    period_ms = p50_ms
    solves_per_s = batch / (period_ms / 1000.0)
    qp_iters = qp_cfg.iters + qp_cfg.iters2
    floor_ms = physical_floor_ms(batch, qp_iters)
    if period_ms < floor_ms:
        raise RuntimeError(
            f"bench: measured period {period_ms:.4f} ms is below the "
            f"physical floor {floor_ms:.4f} ms for batch {batch} at "
            f"{qp_iters} QP iters — the measurement is impossible "
            "(broken completion barrier); refusing to report it")
    # tunnel round-trip estimate: short-dispatch wall minus its chip time
    rtt_ms = sorted(t_short_ms)[len(t_short_ms) // 2] - kk * period_ms
    return {
        "metric": "mpc_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "detail": {
            "batch": batch,
            "mpc_period_ms": round(period_ms, 3),
            "period_slope_mean_ms": round(mean_ms, 3),
            "period_slope_p99_ms": round(p99_ms, 3),
            "period_slope_p50_ms": round(p50_ms, 3),
            "slope_samples": n,
            "periods_per_sample": 3 * kk,
            "tunnel_rtt_ms": round(rtt_ms, 3),
            "control_ticks_per_s": round(2 * solves_per_s, 1),
            "realtime_budget_ms": 20.0,
            "qp_iters": qp_iters,
            "physical_floor_ms": round(floor_ms, 4),
            "rejected_samples": rejected,
            "stall_rejected_samples": stall_rejected,
        },
    }


def sweep(batches=(512, 1024, 2048, 2560, 3072, 4096, 8192),
          iters: int = 50) -> dict:
    """Latency-vs-batch sweep: finds the largest real-time-feasible batch
    (p99 dispatch-mean period within the 20 ms budget). Each batch is a
    fresh compile, so this is run on demand (bench.py --sweep), not by the
    driver. Writes SWEEP.json at the repo root.

    Every row passes bench()'s per-sample slope rejection and the
    physical-floor assertion, so an impossible row (the stale r3 SWEEP's
    0.015 ms batch-8192 entry) can no longer be written — bench() raises
    instead and the failed batch is recorded under "failed"."""
    rows, failed = [], []
    for b in batches:
        try:
            r = bench(batch=b, iters=iters)
        except RuntimeError as e:
            failed.append({"batch": b, "error": str(e)})
            print(json.dumps(failed[-1]))
            continue
        d = r["detail"]
        rows.append({"batch": b, "period_ms": d["mpc_period_ms"],
                     "p50_ms": d["period_slope_p50_ms"],
                     "p99_ms": d["period_slope_p99_ms"],
                     "solves_per_s": r["value"],
                     "physical_floor_ms": d["physical_floor_ms"],
                     "rejected_samples": d["rejected_samples"],
                     "stall_rejected_samples": d["stall_rejected_samples"],
                     "realtime": d["period_slope_p99_ms"] <= 20.0})
        print(json.dumps(rows[-1]))
    rt = [r["batch"] for r in rows if r["realtime"]]
    result = {
        "methodology": "paired-slope (RTT-immune), scalar-fetch barrier, "
                       "per-sample slope rejection + 3x-median stall "
                       "rejection + physical-floor guard",
        "realtime_budget_ms": 20.0,
        "largest_realtime_batch": max(rt) if rt else None,
        "rows": rows,
        "failed": failed,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SWEEP.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"largest_realtime_batch": result[
        "largest_realtime_batch"]}))
    return result


def bench_train(num_envs: int = 512, warmup: int = 2, iters: int = 10,
                terrain: str = "rough", dr: bool = True) -> dict:
    """Training-throughput benchmark: env-steps/s and ms per PPO iteration
    (rollout of 24 steps over ``num_envs`` envs + update) on one chip.

    This is the number multi-chip scaling exists for. Calibration: the
    reference trains 512 Isaac envs on one GPU (docs/2-development_log.md:
    116) at unreported throughput; its per-env serial CPU controller loop
    (tasks/aliengo.py:252-256) was the bottleneck by design.

    Timing: each PPO iteration is a single large dispatch (~0.5-2 s), so
    the ~36 ms tunnel RTT is <5% here; a scalar fetch of the iteration's
    mean reward is the completion barrier (same rationale as bench()).
    """
    from rl_mpc_locomotion_tpu.rl import train as train_mod
    from rl_mpc_locomotion_tpu.rl.ppo import PPOConfig
    from rl_mpc_locomotion_tpu.sim import terrain as terrain_mod
    from rl_mpc_locomotion_tpu.sim.env import EnvConfig
    from rl_mpc_locomotion_tpu.models.actor_critic import ActorCritic
    from rl_mpc_locomotion_tpu.rl import ppo as ppo_mod
    from rl_mpc_locomotion_tpu.sim import env as env_mod
    from rl_mpc_locomotion_tpu.sim.randomize import DomainRandomization

    params = robots.aliengo_params()
    qp = production_qp_config()._replace(
        use_pallas=jax.default_backend() == "tpu")
    cfg = train_mod.TrainConfig(
        num_envs=num_envs, seed=0, ppo=PPOConfig(),
        env=EnvConfig(control=ControlConfig(
            qp=qp, flat_ground=(terrain == "flat")),
            dr=DomainRandomization() if dr else None))
    ter = {"flat": terrain_mod.flat, "rough": terrain_mod.random_uniform}[
        terrain]()
    model = ActorCritic(num_actions=env_mod.NUM_ACTIONS)
    rng = jax.random.PRNGKey(0)
    rng, init_key, env_key = jax.random.split(rng, 3)
    train_state = ppo_mod.init_train_state(init_key, model, env_mod.NUM_OBS,
                                           cfg.ppo)
    step_fn, reset_batch = train_mod.make_train_step(params, cfg, ter, model)
    env_state, obs = reset_batch(env_key)
    tick = jnp.int32(0)

    def sync(metrics):
        return float(jax.device_get(metrics["mean_reward"]))

    for _ in range(warmup):
        train_state, env_state, obs, tick, metrics = step_fn(
            train_state, env_state, obs, tick)
        sync(metrics)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        train_state, env_state, obs, tick, metrics = step_fn(
            train_state, env_state, obs, tick)
        sync(metrics)
        times.append(time.perf_counter() - t0)
    times_ms = sorted(t * 1000.0 for t in times)
    it_ms = sum(times_ms) / len(times_ms)
    steps_per_iter = cfg.ppo.num_steps * num_envs
    return {
        "metric": "train_env_steps_per_s",
        "value": round(steps_per_iter / (it_ms / 1000.0), 1),
        "unit": "env-steps/s/chip",
        "detail": {
            "num_envs": num_envs,
            "ppo_iteration_ms": round(it_ms, 1),
            "ppo_iteration_p99_ms": round(
                times_ms[min(len(times_ms) - 1,
                             int(0.99 * len(times_ms)))], 1),
            "rollout_steps": cfg.ppo.num_steps,
            "terrain": terrain,
            "dr": dr,
            "iters_timed": iters,
        },
    }


def train_sweep(env_counts=(512, 2048, 4096), iters: int = 10) -> dict:
    """Writes TRAINBENCH.json: train throughput vs env count, one chip."""
    rows = []
    for n in env_counts:
        r = bench_train(num_envs=n, iters=iters)
        rows.append({"num_envs": n, "env_steps_per_s": r["value"],
                     "ppo_iteration_ms": r["detail"]["ppo_iteration_ms"],
                     "ppo_iteration_p99_ms": r["detail"][
                         "ppo_iteration_p99_ms"]})
        print(json.dumps(rows[-1]))
    result = {"terrain": "rough", "dr": True,
              "rollout_steps": 24, "rows": rows}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "TRAINBENCH.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    import sys
    if "--sweep" in sys.argv:
        sweep()
    elif "--train-sweep" in sys.argv:
        train_sweep()
    elif "--train" in sys.argv:
        print(json.dumps(bench_train()))
    else:
        result = bench()
        print(json.dumps(result))
