"""The fused manager runtime — TPU-native replacement for IsaacLab's
`ManagerBasedRLEnv` + its action/obs/reward/termination/event/curriculum/
command managers (SURVEY.md §2b row 4).

The reference evaluates its declarative term system with a Python interpreter
every step; here the same term system is *compiled*: a task is a `TaskModel`
of pure term functions, and `WheeledEnv.step` composes them into ONE jitted
function — physics decimation (`lax.scan`), interval events, rewards
(weighted sum), terminations, masked auto-reset, curriculum (weights as traced
state), observations + noise — `vmap`'d over envs.

Manager ordering mirrors the reference exactly (SURVEY.md hard part (d)):
rewards/terminations are computed on the post-physics state *before* reset;
observations are computed *after* reset. Reward terms are scaled by
`weight * step_dt`, matching IsaacLab's RewardManager.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..sim.actions import ActionMapCfg, action_to_targets
from ..sim.dynamics import step as sim_step
from ..sim.terrain import Heightfield
from ..sim.types import VehicleParams, VehicleState
from ..utils import math as wmath
from ..utils.config import configclass


@configclass
class EnvCfg:
    """Static env-level config (parity: ManagerBasedRLEnvCfg fields used by
    the reference, e.g. mushr_drift_env_cfg.py:369-404)."""

    num_envs: int = 1024
    sim_dt: float = 0.005
    decimation: int = 4
    episode_length_s: float = 5.0
    action: ActionMapCfg = ActionMapCfg()
    enable_corruption: bool = True  # observation noise on/off (play: off)
    events_enabled: bool = True     # DR + pushes on/off (play variants)
    use_pallas: str = "auto"        # "auto" | "on" | "off": fused physics
                                    # kernel (flat terrain only)

    @property
    def step_dt(self) -> float:
        return self.sim_dt * self.decimation

    @property
    def max_episode_length(self) -> int:
        return int(round(self.episode_length_s / self.step_dt))


class StepCtx(NamedTuple):
    """Everything a term function may read — the counterpart of the `env`
    handle the reference passes to its mdp term fns."""

    vehicle: VehicleState          # batched [B]
    params: VehicleParams          # batched [B]
    terrain: Heightfield
    body_lin_vel: jax.Array        # [B, 3] base_lin_vel (body frame)
    body_ang_vel: jax.Array        # [B, 3] base_ang_vel (body frame)
    last_action: jax.Array         # [B, 2] raw policy action
    prev_vehicle: VehicleState     # state before this step's physics
    command: jax.Array             # [B, C] task commands (zeros if unused)
    step_count: jax.Array          # [B] episode step counter
    common_step: jax.Array         # [] global step counter
    terminated: Optional[jax.Array]  # [B] non-timeout dones (None before computed)
    time_out: Optional[jax.Array]    # [B]
    term_flags: Optional[Dict[str, jax.Array]]  # per-name termination flags
    aux: Any                       # ContactAux from physics


class RewardTerm(NamedTuple):
    name: str
    weight: float                  # initial weight (curriculum may change it)
    fn: Callable[[StepCtx], jax.Array]


class CurriculumTerm(NamedTuple):
    """Parity: increase_reward_weight_over_time
    (reference wheeledlab/envs/mdp/curriculums.py:10-35)."""

    reward_term_name: str
    increase: float
    episodes_per_increase: int
    max_increases: int


class PushEvent(NamedTuple):
    """Interval push event (parity: mdp.push_by_setting_velocity at
    reference mushr_drift_env_cfg.py:121-143). Adds a uniform random delta to
    root velocity every `interval_range_s` seconds."""

    interval_range_s: Tuple[float, float]
    lin_x: Tuple[float, float] = (0.0, 0.0)
    lin_y: Tuple[float, float] = (0.0, 0.0)
    yaw: Tuple[float, float] = (0.0, 0.0)


class CommandCfg(NamedTuple):
    """Uniform 2D goal command, resampled on a timer (parity:
    UniformPose2dCommandCfg, reference mushr_elevation_env_cfg.py:425-435)."""

    pos_x: Tuple[float, float]
    pos_y: Tuple[float, float]
    heading: Tuple[float, float]
    resampling_time_s: float


class TaskModel(NamedTuple):
    """A task = pure functions + constants. The compiled counterpart of the
    reference's per-task cfg trees (DriftRewardsCfg etc.)."""

    cfg: EnvCfg
    terrain: Heightfield
    obs_dim: int
    init_params: Callable[[jax.Array, int], VehicleParams]  # startup DR
    sample_spawn: Callable[[jax.Array, int], VehicleState]  # reset event
    reward_terms: Tuple[RewardTerm, ...]
    termination_fns: Dict[str, Callable[[StepCtx], jax.Array]]  # non-timeout
    observe: Callable[[StepCtx, jax.Array], jax.Array]
    curriculum: Tuple[CurriculumTerm, ...] = ()
    pushes: Tuple[PushEvent, ...] = ()
    command: Optional[CommandCfg] = None
    command_dim: int = 3
    terrain_atlas: Optional[object] = None  # PatchAtlas for fast rough-terrain
                                            # contact (see sim/terrain.py)
    contact_atlas: Optional[object] = None  # smaller-patch PatchAtlas for the
    # wheel-contact path only (obs scans need the big window; contact needs
    # wheel reach + per-step travel). The fused heightfield kernel's corner
    # extraction cost scales with p^2 rows, so a p=12 contact patch is ~4x
    # cheaper than the p=24 scan patch. None -> terrain_atlas serves both.
    metric_fns: Dict[str, Callable[[StepCtx], jax.Array]] = {}
    # ^ task-success metrics ([B] floats), surfaced per step in
    # `info["metrics/<name>"]` and averaged into training metrics — the
    # machine-checkable learning evidence the reference only had via W&B
    # curves (README.md:88). Evaluated on the post-termination, pre-reset ctx.
    render_grid: Optional[Tuple[Any, float]] = None
    # ^ (grid2d np.ndarray, cell_m): top-down background for video rendering
    # (elevation heightfield / visual traversability map); None -> oval track.
    fused_step: Optional[Callable] = None
    # ^ optional whole-control-step Pallas fast path:
    # (env, EnvState, action) -> (EnvState, StepOutput), semantics identical
    # to the generic step below. Used when the Pallas backend is active
    # (tasks/drift/fused.py — physics + epilogue in one kernel).
    colormap: Optional[Any] = None
    # ^ visual task's world ColorMap (tasks/visual/camera.py) — exposed for
    # playback tools and the world-side color-DR tests.


class EnvState(struct.PyTreeNode):
    vehicle_mem: Any
    # ^ the vehicle state in its CARRY representation: a VehicleState pytree
    # on the generic XLA path, or the packed (NUM_STATE, B) row matrix on
    # the Pallas paths — keeping the rollout scan carry in the kernel's
    # lane-major layout removes the per-step pack/unpack transposes at the
    # kernel boundary (r3 trace: ~1.8 ms per 128-step rollout at 16k envs).
    # Read `.vehicle` (a property) for the AoS view; under jit the unpack
    # transposes fuse into row selects wherever only components are read.
    params: VehicleParams
    packed_params: Optional[jax.Array]  # (NUM_PARAM, B) row-matrix cache for
    # the Pallas physics path. Params are fixed after reset (startup DR only,
    # like the reference's startup events), so packing them once here instead
    # of every control step removes a (45, B) broadcast+concatenate from the
    # hot loop (~1 ms per 128-step rollout at 16k envs). None on the XLA path.
    key: jax.Array
    step_count: jax.Array          # [B] int32
    common_step: jax.Array         # [] int32 (global, like common_step_counter)
    reward_weights: jax.Array      # [n_terms] f32 — curriculum state
    last_action: jax.Array         # [B, 2]
    command: jax.Array             # [B, C]
    command_timer: jax.Array       # [B] int32 steps until resample
    push_timers: jax.Array         # [n_push, B] int32 control steps until next push
    ep_return: jax.Array           # [B] running episode reward (logging)
    ep_len: jax.Array              # [B] int32

    @property
    def vehicle(self) -> VehicleState:
        """AoS view of the vehicle state, whatever the carry representation."""
        if isinstance(self.vehicle_mem, VehicleState):
            return self.vehicle_mem
        from ..sim.soa import unpack_state

        return unpack_state(self.vehicle_mem)

    def with_vehicle(self, vehicle: VehicleState) -> "EnvState":
        """Functional vehicle update preserving the carry representation."""
        if isinstance(self.vehicle_mem, VehicleState):
            return self.replace(vehicle_mem=vehicle)
        from ..sim.soa import pack_state

        return self.replace(vehicle_mem=pack_state(vehicle))


class StepOutput(NamedTuple):
    obs: jax.Array
    reward: jax.Array
    done: jax.Array               # terminated | time_out
    time_out: jax.Array           # for rsl_rl-style bootstrap
    info: Dict[str, jax.Array]    # episode stats + per-term rewards


def _uniform(key, shape, lo, hi):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


class WheeledEnv:
    """Functional env: `reset(key) -> (state, obs)`,
    `step(state, action) -> (state, StepOutput)`. Both are pure and jittable;
    batching over `cfg.num_envs` is internal (vmap'd physics)."""

    def __init__(self, task: TaskModel):
        self.task = task
        self.cfg = task.cfg
        self.num_envs = task.cfg.num_envs
        self.obs_dim = task.obs_dim
        self.action_dim = 2
        self.max_episode_length = task.cfg.max_episode_length
        self._reward_names = [t.name for t in task.reward_terms]
        flat = task.terrain.is_flat
        hf_capable = not flat and task.terrain_atlas is not None
        auto_ok = (task.cfg.num_envs % 128 == 0
                   and jax.default_backend() not in ("cpu", "gpu"))
        if task.cfg.use_pallas == "on":
            # "on" picks the kernel matching the terrain: flat tasks get the
            # flat fused kernel, heightfield tasks the patch-resident one
            self._use_pallas = flat
            self._use_pallas_hf = hf_capable
        elif task.cfg.use_pallas == "off":
            self._use_pallas = False
            self._use_pallas_hf = False
        else:  # auto: an actual TPU backend + lane-aligned batch
            self._use_pallas = flat and auto_ok
            self._use_pallas_hf = hf_capable and auto_ok
        # tests set this True (with use_pallas="on") to run the Pallas
        # kernels in interpreter mode on CPU
        self._pallas_interpret = False

    # ------------------------------------------------------------------ reset

    def reset(self, key: jax.Array) -> Tuple[EnvState, jax.Array]:
        task, cfg = self.task, self.cfg
        n = self.num_envs
        k_params, k_spawn, k_obs, k_cmd, k_push, k_state = jax.random.split(key, 6)
        params = task.init_params(k_params, n)
        vehicle = task.sample_spawn(k_spawn, n)
        command = self._sample_command(k_cmd, n)
        push_timers = self._init_push_timers(k_push, n)
        packed_params = None
        vehicle_mem = vehicle
        if self._use_pallas or self._use_pallas_hf:
            from ..sim.soa import pack_params, pack_state

            packed_params = pack_params(params, task.terrain.friction)
            vehicle_mem = pack_state(vehicle)   # lane-major carry
        state = EnvState(
            vehicle_mem=vehicle_mem,
            params=params,
            packed_params=packed_params,
            key=k_state,
            step_count=jnp.zeros((n,), jnp.int32),
            common_step=jnp.zeros((), jnp.int32),
            reward_weights=jnp.array(
                [t.weight for t in task.reward_terms], jnp.float32),
            last_action=jnp.zeros((n, 2), jnp.float32),
            command=command,
            command_timer=jnp.full((n,), self._command_steps(), jnp.int32),
            push_timers=push_timers,
            ep_return=jnp.zeros((n,), jnp.float32),
            ep_len=jnp.zeros((n,), jnp.int32),
        )
        ctx = self._make_ctx(state, state.vehicle, None)
        obs = task.observe(ctx, k_obs)
        return state, obs

    # ------------------------------------------------------------------- step

    def step(self, state: EnvState, action: jax.Array) -> Tuple[EnvState, StepOutput]:
        task, cfg = self.task, self.cfg
        if self._use_pallas and task.fused_step is not None:
            # whole-step fused kernel (physics + rewards/terminations/reset/
            # obs in one pallas_call) — same semantics as the path below
            return task.fused_step(self, state, action)
        n = self.num_envs
        key, k_push, k_spawn, k_obs, k_cmd, k_cmd2 = jax.random.split(state.key, 6)

        prev_vehicle = state.vehicle   # lazy AoS view (property)

        # 1. action -> joint targets (action manager)
        steer_t, wheel_t = action_to_targets(action, cfg.action)

        # 2. physics decimation loop (PhysX-equivalent). Two backends with
        # identical math: the fused Pallas kernel (flat ground, state resident
        # in VMEM across substeps) or the general vmapped XLA path.
        if self._use_pallas or self._use_pallas_hf:
            from ..sim.soa import pack_state, unpack_state

            mem = (state.vehicle_mem
                   if not isinstance(state.vehicle_mem, VehicleState)
                   else pack_state(state.vehicle_mem))

            if self._use_pallas_hf:
                from ..ops.pallas_substep_hf import pallas_step_hf

                atlas = task.contact_atlas or task.terrain_atlas
                nx, ny = atlas.grid_shape
                cell = float(atlas.cell)  # host_const numpy -> static

                def phys(m, p, st, wt):
                    # patch extraction (atlas row gather) stays in XLA; the
                    # kernel holds the extracted rows in VMEM for all
                    # `decimation` substeps
                    patch, org = atlas.extract_rows(m[0], m[1])
                    return pallas_step_hf(
                        m, p, patch, org, st, wt, cfg.sim_dt, cfg.decimation,
                        p=atlas.p, nx=nx, ny=ny, cell=cell,
                        interpret=self._pallas_interpret)
            else:
                from ..ops.pallas_substep import pallas_step

                def phys(m, p, st, wt):
                    return pallas_step(
                        m, p, st, wt, cfg.sim_dt, cfg.decimation,
                        interpret=self._pallas_interpret)

            from ..parallel.mesh import ambient_data_shards

            if ambient_data_shards() > 1:
                # data mesh active: shard-map the kernel over local env
                # blocks (pallas_call has no GSPMD partitioning rule)
                from jax.sharding import PartitionSpec as P

                from ..parallel.mesh import DATA_AXIS
                row = P(None, DATA_AXIS)
                phys = jax.shard_map(phys, in_specs=(row,) * 4,
                                     out_specs=row, check_vma=False)
            packed = phys(mem, state.packed_params, steer_t.T, wheel_t.T)
            vehicle, aux = unpack_state(packed), None
        else:
            vehicle, aux = jax.vmap(
                sim_step, in_axes=(0, 0, None, 0, 0, None, None, None)
            )(state.vehicle, state.params, task.terrain, steer_t, wheel_t,
              cfg.sim_dt, cfg.decimation,
              task.contact_atlas or task.terrain_atlas)

        # 3. interval events: velocity pushes
        vehicle, push_timers = self._apply_pushes(
            k_push, vehicle, state.push_timers)

        step_count = state.step_count + 1
        common_step = state.common_step + 1

        # 4. commands: timed resample
        command, command_timer = self._update_command(
            k_cmd, state.command, state.command_timer)

        # reward/termination ctx sees the action applied THIS step as
        # last_action (IsaacLab action_manager semantics)
        ctx = self._make_ctx(
            state.replace(vehicle_mem=vehicle, command=command,
                          step_count=step_count, common_step=common_step,
                          last_action=action),
            prev_vehicle, aux)

        # 5. terminations (before reset; parity with termination_manager)
        time_out = step_count >= self.max_episode_length
        term_flags = {name: fn(ctx) for name, fn in task.termination_fns.items()}
        terminated = jnp.zeros((n,), bool)
        for v in term_flags.values():
            terminated = terminated | v
        done = terminated | time_out
        ctx = ctx._replace(terminated=terminated, time_out=time_out,
                           term_flags=term_flags)

        # 6. rewards (pre-reset state, weights * step_dt; parity with
        #    reward_manager.compute)
        term_values = [t.fn(ctx) for t in task.reward_terms]
        reward = jnp.zeros((n,), jnp.float32)
        per_term = {}
        for i, (t, val) in enumerate(zip(task.reward_terms, term_values)):
            r = state.reward_weights[i] * val * cfg.step_dt
            per_term[f"rew/{t.name}"] = r
            reward = reward + r

        # episode stats (before reset zeroes them)
        ep_return = state.ep_return + reward
        ep_len = state.ep_len + 1

        # 7. auto-reset: masked blend of fresh spawns into done envs
        spawn = task.sample_spawn(k_spawn, n)
        blend = lambda new, old: jnp.where(
            done.reshape((n,) + (1,) * (old.ndim - 1)), new, old)
        vehicle = jax.tree_util.tree_map(blend, spawn, vehicle)
        step_count = jnp.where(done, 0, step_count)
        new_command = self._sample_command(k_cmd2, n)
        command = jax.tree_util.tree_map(blend, new_command, command)
        command_timer = jnp.where(done, self._command_steps(), command_timer)
        last_action = jnp.where(done[:, None], 0.0, action)

        # 8. curriculum: traced weight schedule (parity: curriculums.py:10-35)
        reward_weights = self._curriculum_weights(state.reward_weights,
                                                  common_step)

        if self._use_pallas or self._use_pallas_hf:
            from ..sim.soa import pack_state as _pack

            vehicle_out = _pack(vehicle)
        else:
            vehicle_out = vehicle
        new_state = EnvState(
            vehicle_mem=vehicle_out, params=state.params,
            packed_params=state.packed_params, key=key,
            step_count=step_count, common_step=common_step,
            reward_weights=reward_weights, last_action=last_action,
            command=command, command_timer=command_timer,
            push_timers=push_timers,
            ep_return=jnp.where(done, 0.0, ep_return),
            ep_len=jnp.where(done, 0, ep_len),
        )

        # 9. observations (post-reset; parity with observation_manager order)
        obs_ctx = self._make_ctx(new_state, prev_vehicle, aux)
        obs = task.observe(obs_ctx, k_obs)

        info = {
            "episode_return": ep_return,      # valid where done
            "episode_length": ep_len.astype(jnp.float32),
            **per_term,
        }
        for name, v in term_flags.items():
            info[f"done/{name}"] = v
        info["done/time_out"] = time_out
        for name, fn in task.metric_fns.items():
            info[f"metrics/{name}"] = fn(ctx)
        return new_state, StepOutput(obs=obs, reward=reward, done=done,
                                     time_out=time_out, info=info)

    # ---------------------------------------------------------------- helpers

    def _make_ctx(self, state: EnvState, prev_vehicle: VehicleState,
                  aux) -> StepCtx:
        v = state.vehicle
        body_lin = wmath.quat_rotate_inverse(v.quat, v.lin_vel)
        body_ang = wmath.quat_rotate_inverse(v.quat, v.ang_vel)
        return StepCtx(
            vehicle=v, params=state.params, terrain=self.task.terrain,
            body_lin_vel=body_lin, body_ang_vel=body_ang,
            last_action=state.last_action, prev_vehicle=prev_vehicle,
            command=state.command, step_count=state.step_count,
            common_step=state.common_step, terminated=None, time_out=None,
            term_flags=None, aux=aux)

    def _curriculum_weights(self, weights: jax.Array,
                            common_step: jax.Array) -> jax.Array:
        """Recompute weights in closed form from the global step counter —
        the traced-state equivalent of the reference's in-place cfg mutation.
        Exact closed form of the reference's mutation loop (which fires at the
        start of every `episodes_per`-th episode, "discounting the first
        episode", and — due to its early-return ordering — performs up to
        `max_increases + 1` total increases):
        n_inc(e) = min((e + 1) // episodes_per, max_increases + 1)."""
        task = self.task
        if not task.curriculum:
            return weights
        episodes = common_step // self.max_episode_length
        new = weights
        for cur in task.curriculum:
            idx = self._reward_names.index(cur.reward_term_name)
            base = task.reward_terms[idx].weight
            n_inc = jnp.minimum((episodes + 1) // cur.episodes_per_increase,
                                cur.max_increases + 1)
            new = new.at[idx].set(base + cur.increase * n_inc.astype(jnp.float32))
        return new

    def _init_push_timers(self, key: jax.Array, n: int) -> jax.Array:
        pushes = self.task.pushes
        if not pushes or not self.cfg.events_enabled:
            return jnp.zeros((max(len(pushes), 1), n), jnp.int32)
        keys = jax.random.split(key, len(pushes))
        timers = [self._sample_interval(k, p, n) for k, p in zip(keys, pushes)]
        return jnp.stack(timers)

    def _sample_interval(self, key, push: PushEvent, n: int) -> jax.Array:
        lo = max(int(round(push.interval_range_s[0] / self.cfg.step_dt)), 1)
        hi = max(int(round(push.interval_range_s[1] / self.cfg.step_dt)), lo + 1)
        return jax.random.randint(key, (n,), lo, hi)

    def _apply_pushes(self, key, vehicle: VehicleState, timers: jax.Array):
        pushes = self.task.pushes
        if not pushes or not self.cfg.events_enabled:
            return vehicle, timers
        n = self.num_envs
        lin_vel, ang_vel = vehicle.lin_vel, vehicle.ang_vel
        new_timers = []
        for i, push in enumerate(pushes):
            key, k_delta, k_int = jax.random.split(key, 3)
            timer = timers[i] - 1
            fire = timer <= 0
            kx, ky, kz = jax.random.split(k_delta, 3)
            dx = _uniform(kx, (n,), push.lin_x[0], push.lin_x[1])
            dy = _uniform(ky, (n,), push.lin_y[0], push.lin_y[1])
            dyaw = _uniform(kz, (n,), push.yaw[0], push.yaw[1])
            delta_lin = jnp.stack([dx, dy, jnp.zeros_like(dx)], -1)
            delta_ang = jnp.stack(
                [jnp.zeros_like(dyaw), jnp.zeros_like(dyaw), dyaw], -1)
            lin_vel = jnp.where(fire[:, None], lin_vel + delta_lin, lin_vel)
            ang_vel = jnp.where(fire[:, None], ang_vel + delta_ang, ang_vel)
            timer = jnp.where(fire, self._sample_interval(k_int, push, n), timer)
            new_timers.append(timer)
        vehicle = vehicle.replace(lin_vel=lin_vel, ang_vel=ang_vel)
        return vehicle, jnp.stack(new_timers)

    def _command_steps(self) -> int:
        cmd = self.task.command
        if cmd is None:
            return 1
        return max(int(round(cmd.resampling_time_s / self.cfg.step_dt)), 1)

    def _sample_command(self, key, n: int) -> jax.Array:
        cmd = self.task.command
        if cmd is None:
            return jnp.zeros((n, self.task.command_dim), jnp.float32)
        kx, ky, kh = jax.random.split(key, 3)
        x = _uniform(kx, (n,), cmd.pos_x[0], cmd.pos_x[1])
        y = _uniform(ky, (n,), cmd.pos_y[0], cmd.pos_y[1])
        h = _uniform(kh, (n,), cmd.heading[0], cmd.heading[1])
        return jnp.stack([x, y, h], -1)

    def _update_command(self, key, command, timer):
        if self.task.command is None:
            return command, timer
        timer = timer - 1
        fire = timer <= 0
        fresh = self._sample_command(key, self.num_envs)
        command = jnp.where(fire[:, None], fresh, command)
        timer = jnp.where(fire, self._command_steps(), timer)
        return command, timer
