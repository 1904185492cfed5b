"""The vectorized env framework: TPU-native `VecTask`.

Replaces `/root/reference/isaacgymenvs/tasks/base/vec_task.py` (Env base
`:60-162`, VecTask runtime `:165-490`). The reference's mutable buffers +
indexed C++ writes become a single pure function over an :class:`EnvState`
pytree:

  step : (Task, EnvState, actions) -> EnvState'

with the canonical ordering of `VecTask.step` (`vec_task.py:313-359`):
action DR noise -> clip(actions) -> pre_physics -> physics substeps ->
post_physics (obs/reward/done) -> timeout bookkeeping -> obs DR noise ->
clip(obs). Auto-reset of done envs happens via masked `where` at the start
of the next step (the reference resets at the top of `post_physics_step`,
`gogoro_new.py:377-379` — same semantics, no host sync, no indexed writes).

Every env owns a deterministic PRNG stream derived from (seed, env_id,
episode count) — the capability upgrade over PhysX non-determinism noted in
SURVEY.md §5.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.models.robot import ModelParams, RobotModel
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams, build_step_fn


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    """Complete env-side state: physics + episode bookkeeping + task extras.

    Buffer parity with `VecTask.allocate_buffers` (`vec_task.py:254-277`):
    obs_buf, rew_buf, reset_buf, progress_buf, timeout_buf (+ randomize_buf
    folded into `dr_step`), plus the physics state the reference keeps on the
    C++ side.
    """
    q: jnp.ndarray            # (B, nq)
    qd: jnp.ndarray           # (B, nv)
    params: ModelParams       # batched per-env model params (DR target)
    obs: jnp.ndarray          # (B, num_obs)
    states: jnp.ndarray       # (B, num_states) privileged critic obs
                              # (asymmetric actor-critic states_buf,
                              # vec_task.py:264-267; (B, 0) when unused)
    reward: jnp.ndarray       # (B,)
    done: jnp.ndarray         # (B,) 1.0 where env must reset next step
    timeout: jnp.ndarray      # (B,) 1.0 where done was due to episode length
    progress: jnp.ndarray     # (B,) int32 steps since reset
    net_contact: jnp.ndarray  # (B, nb, 3) per-body net contact force
    net_torque: jnp.ndarray   # (B, nb, 3) net contact torque about the body
                              # origin (world frame) — the missing half of
                              # the 6-DOF force-sensor reading
                              # (create_asset_force_sensor, humanoid.py:163)
    key: jnp.ndarray          # single PRNG key driving all streams
    episode: jnp.ndarray      # (B,) int32 episode counter (PRNG stream salt)
    global_step: jnp.ndarray  # scalar int32, steps since init (DR schedules)
    last_rand: jnp.ndarray    # (B,) int32 global_step of last DR application
    episode_return: jnp.ndarray       # (B,) running sum of rewards this episode
    last_episode_return: jnp.ndarray  # (B,) return of the last finished episode
    task: Any                 # task-specific pytree (commands, buffers, ...)
    metrics: Any              # dict of (B,) episode accumulators
    # correlated DR noise standard samples, redrawn at DR events
    # (vec_task.py:612-620 `corr`); empty tuple when DR noise is off
    dr_corr: Any = ()


class Task:
    """Base class for task definitions (the L4 layer, SURVEY.md §1).

    Subclasses configure `model`, `sim_params`, `num_obs`, `num_actions`,
    `max_episode_length`, `clip_actions`, `clip_obs` and implement the four
    pure methods below — the direct analogs of the reference task API
    (`create_sim/_create_envs` -> __init__, `reset_idx`, `pre_physics_step`,
    `post_physics_step`).
    """

    model: RobotModel
    sim_params: SimParams
    num_obs: int
    num_actions: int
    num_states: int = 0          # asymmetric actor-critic privileged obs
    # multi-agent (MA_VecTask, multi_vec_task.py:102-125): when > 1 the
    # engine allocates obs (B, A, num_obs), reward (B, A) and actions
    # arrive as (B, A, num_actions); done/reset stay per-env (the
    # reference's shared reset_buf)
    num_agents: int = 1
    max_episode_length: int = 1000
    clip_actions: float = 1.0    # Env clip bounds (vec_task.py:107-108)
    clip_obs: float = jnp.inf
    control_freq_inv: int = 1    # physics steps per control step (vec_task.py:332)
    # optional declarative DR config (reference randomization_params schema)
    dr_config: Optional[dict] = None
    # tasks that read EnvState.net_torque (6-DOF force sensors) MUST set
    # this so the physics backend accumulates per-body contact torque;
    # when False the fused kernel skips it (tests/test_fused.py enforces
    # the contract by source scan)
    uses_net_torque: bool = False
    # the body ids those sensors actually cover (set alongside
    # uses_net_torque once body ids are known): torque is accumulated ONLY
    # for these bodies, and net_torque reads as zero elsewhere. None =
    # all-body accumulation (legacy contract).
    net_torque_bodies: Optional[tuple] = None

    def __init__(self, num_envs: int, seed: int = 42):
        self.num_envs = num_envs
        self.seed = seed

    # ---- to implement ----
    def default_task_state(self, key) -> Any:
        """Initial task pytree (batched)."""
        return ()

    def reset_fn(self, key, params: ModelParams, task: Any):
        """Single-env reset: returns (q, qd, params, task).

        Receives this env's PRNG key, its current params and task state;
        returns fresh physics + task state (parity: `reset_idx`).
        """
        raise NotImplementedError

    def pre_physics(self, state: EnvState, actions: jnp.ndarray):
        """Batched: actions -> (Controls, body_wrench_w, task') ."""
        raise NotImplementedError

    def post_physics(self, state: EnvState, prev_task: Any):
        """Batched: fresh physics state -> (obs, reward, done, task', metrics).

        `done` excludes the timeout condition; the engine ORs in
        progress >= max_episode_length - 1 and records `timeout`
        (parity: vec_task.py:345 + value_bootstrap semantics).
        """
        raise NotImplementedError

    # ---- optional hooks ----
    def observation_noise(self, key, obs, task_state):
        return obs

    def action_noise(self, key, actions):
        return actions

    def compute_states(self, state: "EnvState", task_state) -> jnp.ndarray:
        """Privileged critic observations (asymmetric actor-critic,
        `shadow_hand.py:124-130` states_buf). Called after post_physics when
        num_states > 0; default: empty."""
        B = state.q.shape[0]
        return jnp.zeros((B, 0))


def mask_select_with(mask, new, old, B):
    """Masked pytree select along the env axis."""
    def sel(n, o):
        m = mask.reshape((B,) + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)
    return jax.tree.map(sel, new, old)


def _env_keys(key, episode, salt):
    """Per-env keys: fold in env id and episode counter — deterministic,
    collision-free streams."""
    n = episode.shape[0]
    ids = jnp.arange(n, dtype=jnp.uint32)
    base = jax.random.fold_in(key, salt)
    return jax.vmap(lambda i, e: jax.random.fold_in(jax.random.fold_in(base, i), e))(
        ids, episode.astype(jnp.uint32))


class VecEnv:
    """Binds a Task to jitted init/step functions.

    Usage:
        env = VecEnv(task)
        state = env.reset(jax.random.key(seed))
        state = env.step(state, actions)      # jitted, donates state
    """

    def __init__(self, task: Task, ground_height_fn=None,
                 stagger_episodes: bool = False):
        # stagger_episodes: randomize each env's initial episode phase so
        # timeouts desynchronize. With all envs spawned at progress 0 (the
        # reference behavior), a policy that stops falling makes every env
        # time out on the SAME step — at small env counts the whole batch
        # resets in one wave and per-step reward sawtooths with the
        # episode phase (the r3 Gogoro "epoch-49 collapse": the third
        # synchronized wave, kl spike 0.13 from the distribution jump).
        self.task = task
        self.stagger_episodes = stagger_episodes
        self.model = task.model
        # net-torque spec: tasks that read EnvState.net_torque declare the
        # body ids their sensors cover (net_torque_bodies); the fused kernel
        # accumulates torque ONLY for those bodies. Tasks that set only
        # uses_net_torque=True get all-body accumulation (old contract).
        tq_bodies = getattr(task, "net_torque_bodies", None)
        if tq_bodies is not None:
            need_torque = tuple(int(b) for b in tq_bodies)
            mask = np.zeros((task.model.nb,), np.float32)
            mask[list(need_torque)] = 1.0
            # the XLA fallback computes all-body torque; mask it so both
            # backends present identical net_torque (zeros off-sensor)
            self._tq_mask = jnp.asarray(mask)[None, :, None]
        else:
            need_torque = getattr(task, "uses_net_torque", False)
            self._tq_mask = None
        self.physics_step = build_step_fn(
            task.model, task.sim_params,
            ground_height_fn=ground_height_fn,
            attractors=getattr(task, "attractors", None),
            need_torque=need_torque)
        self.num_envs = task.num_envs
        self.num_obs = task.num_obs
        self.num_actions = task.num_actions
        # domain randomization (task.dr_config follows the reference's
        # randomization_params schema; see engine/dr.py)
        from thormang_isaacgym_tpu.engine.dr import make_dr_fn, make_noise_fn
        dr_cfg = task.dr_config or {}
        self._dr_fn, self._dr_active = make_dr_fn(dr_cfg, task.model)
        self._dr_freq = int(dr_cfg.get("frequency", 600))
        self._obs_noise_fn = make_noise_fn(dr_cfg.get("observations"))
        self._act_noise_fn = make_noise_fn(dr_cfg.get("actions"))
        self._dr_any = (self._dr_active or self._obs_noise_fn is not None
                        or self._act_noise_fn is not None)
        self._step = jax.jit(self.step_fn, donate_argnums=(0,))
        self._reset = jax.jit(self.init_fn)

    # ------------------------------------------------------------------
    def _draw_corr(self, key, B):
        """Standard correlated-noise samples per env (redrawn at DR events,
        engine/dr.py docstring). Dict keyed 'obs'/'act'; () when unused."""
        task = self.task
        out = {}
        cfg = task.dr_config or {}
        for name, fn, dim in (("obs", self._obs_noise_fn, task.num_obs),
                              ("act", self._act_noise_fn, task.num_actions)):
            spec = cfg.get({"obs": "observations", "act": "actions"}[name])
            if fn is None or not spec or "range_correlated" not in spec:
                continue
            # fixed per-channel salts — Python hash() is salted per process
            # (PYTHONHASHSEED) and would break cross-process replay
            # determinism of correlated DR noise
            k = jax.random.fold_in(key, {"obs": 101, "act": 102}[name])
            if spec.get("distribution", "uniform") in ("gaussian", "normal"):
                out[name] = jax.random.normal(k, (B, dim))
            else:
                out[name] = jax.random.uniform(k, (B, dim))
        return out if out else ()

    def init_fn(self, key) -> EnvState:
        task = self.task
        B = task.num_envs
        key, sub = jax.random.split(key)
        params0 = task.model.default_params().batch(B)
        task_state = task.default_task_state(sub)
        episode = jnp.zeros(B, jnp.int32)
        keys = _env_keys(key, episode, 0)
        q, qd, params, task_state = jax.vmap(task.reset_fn)(keys, params0, task_state)
        progress0 = jnp.zeros(B, jnp.int32)
        if self.stagger_episodes:
            key, sub_p = jax.random.split(key)
            progress0 = jax.random.randint(
                sub_p, (B,), 0, max(int(task.max_episode_length) - 1, 1))
        if self._dr_active:
            base = task.model.default_params().batch(B)
            params = jax.vmap(
                lambda k, p, b: self._dr_fn(k, p, b, 0, setup=True)
            )(keys, params, base)
        A = getattr(task, "num_agents", 1)
        obs_shape = (B, A, task.num_obs) if A > 1 else (B, task.num_obs)
        rew_shape = (B, A) if A > 1 else (B,)
        state = EnvState(
            q=q, qd=qd, params=params,
            obs=jnp.zeros(obs_shape),
            states=jnp.zeros((B, task.num_states)),
            reward=jnp.zeros(rew_shape),
            done=jnp.zeros(B),
            timeout=jnp.zeros(B),
            progress=progress0,
            net_contact=jnp.zeros((B, task.model.nb, 3)),
            net_torque=jnp.zeros((B, task.model.nb, 3)),
            key=key,
            episode=episode,
            global_step=jnp.asarray(0, jnp.int32),
            last_rand=jnp.zeros(B, jnp.int32),
            episode_return=jnp.zeros(B),
            last_episode_return=jnp.zeros(B),
            task=task_state,
            metrics={},
            dr_corr=self._draw_corr(jax.random.fold_in(key, 31), B),
        )
        # populate initial obs (+ privileged states)
        obs, _, _, task_state, metrics = task.post_physics(state, task_state)
        states = task.compute_states(state, task_state) if task.num_states \
            else state.states
        return dataclasses.replace(state, obs=jnp.clip(obs, -task.clip_obs, task.clip_obs),
                                   states=states, task=task_state,
                                   metrics=metrics)

    # ------------------------------------------------------------------
    def step_fn(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        # shape-polymorphic in the env axis: under shard_map each shard sees
        # its local slice, so B comes from the state, not the task config
        task = self.task
        B = state.q.shape[0]
        key = jax.random.fold_in(state.key, 1)

        # ---- 1. masked auto-reset of envs done on the previous step ----
        do_reset = state.done > 0
        episode = state.episode + do_reset.astype(jnp.int32)
        keys = _env_keys(key, episode, 17)
        q_r, qd_r, params_r, task_r = jax.vmap(task.reset_fn)(keys, state.params, state.task)

        def mask_select(new, old):
            def sel(n, o):
                m = do_reset.reshape((B,) + (1,) * (n.ndim - 1))
                return jnp.where(m, n, o)
            return jax.tree.map(sel, new, old)

        q = mask_select(q_r, state.q)
        qd = mask_select(qd_r, state.qd)
        params = mask_select(params_r, state.params)
        task_state = mask_select(task_r, state.task)
        # pre-step sanitize: a corrupted (non-finite) carried state swaps in
        # the freshly-sampled reset state, so the quarantine rollback below
        # always has a finite anchor
        bad_pre = jnp.logical_not(
            jnp.isfinite(q).all(-1) & jnp.isfinite(qd).all(-1))
        q = jnp.where(bad_pre[:, None], q_r, q)
        qd = jnp.where(bad_pre[:, None], qd_r, qd)
        progress = jnp.where(do_reset | bad_pre, 0, state.progress)
        last_rand = state.last_rand

        # frequency-gated DR on reset (vec_task.py:547-566)
        dr_corr = state.dr_corr
        if self._dr_any:
            due = do_reset & (state.global_step - state.last_rand >= self._dr_freq)
            if self._dr_active:
                base = task.model.default_params().batch(B)
                dr_keys = _env_keys(jax.random.fold_in(key, 23), episode, 29)
                gs = state.global_step
                params_dr = jax.vmap(
                    lambda k, p, b: self._dr_fn(k, p, b, gs, setup=False)
                )(dr_keys, params, base)
                params = mask_select_with(due, params_dr, params, B)
            if dr_corr:
                fresh = self._draw_corr(jax.random.fold_in(key, 37), B)
                dr_corr = mask_select_with(due, fresh, dr_corr, B)
            last_rand = jnp.where(due, state.global_step, state.last_rand)

        episode_return = jnp.where(do_reset, 0.0, state.episode_return)
        state = dataclasses.replace(
            state, q=q, qd=qd, params=params, task=task_state,
            progress=progress, episode=episode, last_rand=last_rand,
            episode_return=episode_return, dr_corr=dr_corr,
            global_step=state.global_step + 1)

        # ---- 2. action noise + clip (vec_task.py:324-327) ----
        actions = task.action_noise(jax.random.fold_in(key, 2), actions)
        if self._act_noise_fn is not None:
            corr = dr_corr.get("act") if dr_corr else None
            actions = self._act_noise_fn(jax.random.fold_in(key, 5), actions,
                                         corr, state.global_step)
        actions = jnp.clip(actions, -task.clip_actions, task.clip_actions)

        # ---- 3. pre-physics + physics ----
        ctrl, wrench, task_state = task.pre_physics(state, actions)
        state = dataclasses.replace(state, task=task_state)
        q_pre, qd_pre = state.q, state.qd
        q, qd = q_pre, qd_pre
        for _ in range(task.control_freq_inv):
            q, qd, net = self.physics_step(state.params, q, qd, ctrl, wrench)
        # failure quarantine (SURVEY.md §5 failure detection): a numeric
        # blowup in one env must not poison the batch — non-finite states
        # roll back to the pre-step state (finite by induction), the env is
        # force-reset, and its reward is zeroed below
        blown = jnp.logical_not(
            jnp.isfinite(q).all(-1) & jnp.isfinite(qd).all(-1))
        q = jnp.where(blown[:, None], q_pre, q)
        qd = jnp.where(blown[:, None], jnp.zeros_like(qd), qd)
        net = jnp.where(blown[:, None, None], jnp.zeros_like(net), net)
        progress = state.progress + 1
        net_tq = net[..., 3:6]
        if self._tq_mask is not None:
            net_tq = net_tq * self._tq_mask
        state = dataclasses.replace(state, q=q, qd=qd, progress=progress,
                                    net_contact=net[..., 0:3],
                                    net_torque=net_tq)

        # ---- 4. post-physics: obs / reward / done ----
        obs, reward, done_task, task_state, metrics = task.post_physics(state, task_state)
        reward = jnp.where(blown, 0.0, reward) if reward.ndim == 1 \
            else jnp.where(blown[:, None], 0.0, reward)
        done_task = jnp.where(blown, 1.0, done_task.astype(jnp.float32))
        timeout = (progress >= task.max_episode_length - 1)
        done = jnp.where(timeout, 1.0, done_task.astype(jnp.float32))

        # ---- 5. obs noise + clip (vec_task.py:353-357) ----
        obs = task.observation_noise(jax.random.fold_in(key, 3), obs, task_state)
        if self._obs_noise_fn is not None:
            corr = dr_corr.get("obs") if dr_corr else None
            obs = self._obs_noise_fn(jax.random.fold_in(key, 7), obs,
                                     corr, state.global_step)
        obs = jnp.clip(obs, -task.clip_obs, task.clip_obs)
        states = task.compute_states(
            dataclasses.replace(state, task=task_state), task_state) \
            if task.num_states else state.states

        # episode-return bookkeeping (the reference's episode_sums ->
        # extras["episode"] pattern, anymal_terrain.py:152-156); multi-agent
        # rewards (B, A) accumulate as the per-env agent mean
        episode_return = state.episode_return + (
            reward.mean(-1) if reward.ndim == 2 else reward)
        last_episode_return = jnp.where(
            done > 0, episode_return, state.last_episode_return)

        return dataclasses.replace(
            state, obs=obs, states=states, reward=reward, done=done,
            timeout=jnp.logical_and(timeout, done_task < 0.5).astype(jnp.float32),
            episode_return=episode_return,
            last_episode_return=last_episode_return,
            task=task_state, key=key, metrics=metrics)

    # ------------------------------------------------------------------
    def reset(self, key) -> EnvState:
        return self._reset(key)

    def step(self, state: EnvState, actions: jnp.ndarray) -> EnvState:
        return self._step(state, actions)
