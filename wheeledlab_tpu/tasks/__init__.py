"""Task registry — the gym.register equivalent
(reference wheeledlab_tasks/__init__.py:14-63). Task ids keep the reference
names minus the "Isaac-" vendor prefix; the old ids are accepted as aliases."""

from __future__ import annotations

from typing import Any, Dict, Optional

from ..utils.config import TASKS, apply_overrides
from .drift.task import DriftTaskCfg, make_drift_env


def _register_all():
    if "MushrDriftRL-v0" in TASKS:
        return

    # Play variants mirror the reference (mushr_drift_env_cfg.py:410-430,
    # mushr_visual_env_cfg.py:455-470): rewards, curriculum and terminations
    # stripped (set to None in the reference play cfgs), deterministic resets
    # (dist_noise=0, yaw_noise=0); DR events and obs corruption stay ON
    # (sim2real realism).
    TASKS.register("MushrDriftRL-v0", {
        "cfg": DriftTaskCfg(),
        "play_cfg": DriftTaskCfg(pos_noise=0.0, yaw_noise=0.0,
                                 terminations_enabled=False,
                                 rewards_enabled=False),
        "make": make_drift_env,
    })
    TASKS.register("F1TenthDriftRL-v0", {
        "cfg": DriftTaskCfg(robot="f1tenth", num_envs=256),
        "play_cfg": DriftTaskCfg(robot="f1tenth", num_envs=256,
                                 pos_noise=0.0, yaw_noise=0.0,
                                 terminations_enabled=False,
                                 rewards_enabled=False),
        "make": make_drift_env,
    })

    try:
        from .elevation.task import ElevationTaskCfg, make_elevation_env

        # the reference's MushrElevationPlayEnvCfg (:472-474) strips nothing
        # (empty subclass); terminations/rewards are stripped here for
        # consistency with the other play variants
        TASKS.register("MushrElevationRL-v0", {
            "cfg": ElevationTaskCfg(),
            "play_cfg": ElevationTaskCfg(terminations_enabled=False,
                                         rewards_enabled=False),
            "make": make_elevation_env,
        })
    except ImportError:
        pass

    try:
        from .visual.task import VisualTaskCfg, make_visual_env

        TASKS.register("MushrVisualRL-v0", {
            "cfg": VisualTaskCfg(),
            "play_cfg": VisualTaskCfg(terminations_enabled=False,
                                      rewards_enabled=False),
            "make": make_visual_env,
        })
    except ImportError:
        pass


def resolve_task(task_name: str) -> Dict[str, Any]:
    _register_all()
    name = task_name.removeprefix("Isaac-")
    return TASKS.get(name)


def make_env(task_name: str, num_envs: Optional[int] = None,
             overrides: Optional[Dict[str, Any]] = None, play: bool = False):
    entry = resolve_task(task_name)
    cfg = entry["play_cfg"] if play else entry["cfg"]
    if num_envs is not None:
        cfg = cfg.replace(num_envs=num_envs)
    if overrides:
        cfg = apply_overrides(cfg, dict(overrides))
    env = entry["make"](cfg)
    env.task_cfg = cfg  # the resolved task-level cfg, for introspection/play
    return env
