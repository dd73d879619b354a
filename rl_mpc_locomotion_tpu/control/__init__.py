"""Jittable control stack: estimator, locomotion planner, leg controller,
FSM-as-data, robot runners."""

from . import leg_controller, locomotion, runner, state_estimator, types  # noqa: F401
