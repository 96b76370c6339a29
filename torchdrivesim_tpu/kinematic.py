"""
Kinematic models as pure functions over batched agent tensors.

The reference (`torchdrivesim/kinematic.py`) implements kinematic models as
mutable objects and combines heterogeneous agents by boolean-mask splitting
of the batch (`kinematic.py:197-217`), which produces dynamic shapes. The
TPU-native design instead:

* keeps agent state as a plain ``(..., 4)`` array ``(x, y, psi, v)``;
* implements each model as a pure function ``step(state, action, params, dt)``;
* handles heterogeneous agents by evaluating *all* models on *all* agents and
  selecting per-agent results with ``jnp.where`` keyed on an integer model id
  (cheap at a handful of models, fully fused by XLA, no gathers or dynamic
  shapes).

Actions are always carried in a ``(..., 4)`` buffer (the maximum action size
across models); models with smaller action spaces read a prefix.

A thin object facade mirroring the reference class names (``KinematicBicycle``
etc.) lives at the bottom for API familiarity; it stores the state/params
explicitly and delegates to the pure functions.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from torchdrivesim_tpu.utils import as_batch_index, host_repeat, rotate

STATE_SIZE = 4   #: (x, y, psi, v)
ACTION_BUF = 4   #: unified action buffer width (max over models)

# Model ids (used in `model_ids` arrays for heterogeneous simulation).
TELEPORT = 0                 #: action is the next state (ref: `kinematic.py:317`)
SIMPLE = 1                   #: action is d(state)/dt (ref: `kinematic.py:328`)
ORIENTED = 2                 #: SIMPLE with agent-frame xy action (ref: `kinematic.py:379`)
BICYCLE = 3                  #: kinematic bicycle (accel, steering) (ref: `kinematic.py:400`)
BICYCLE_NO_REVERSING = 4     #: bicycle clamped to stop at v=0 (ref: `kinematic.py:509`)
BICYCLE_BY_DISPLACEMENT = 5  #: bicycle driven by velocity vector (ref: `kinematic.py:526`)
BICYCLE_BY_ORIENTED_DISPLACEMENT = 6  #: agent-frame variant (ref: `kinematic.py:573`)
NUM_MODELS = 7

MODEL_ACTION_SIZE = {
    TELEPORT: 4, SIMPLE: 4, ORIENTED: 4, BICYCLE: 2, BICYCLE_NO_REVERSING: 2,
    BICYCLE_BY_DISPLACEMENT: 2, BICYCLE_BY_ORIENTED_DISPLACEMENT: 2,
}


@struct.dataclass
class KinematicParams:
    """
    Per-agent and global kinematic parameters, as one PyTree.

    ``lr`` is the bicycle rear-axis offset per agent, broadcastable to the
    agent-state batch shape (ref: `kinematic.py:404`, stored NaN-safe).
    Normalization factors match the reference defaults
    (`kinematic.py:338,415,530`).
    """
    lr: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones(()))
    dt: float = struct.field(pytree_node=False, default=0.1)
    left_handed: bool = struct.field(pytree_node=False, default=False)
    max_acceleration: float = struct.field(pytree_node=False, default=5.0)
    max_steering: float = struct.field(pytree_node=False, default=float(np.pi / 2))
    max_dx: float = struct.field(pytree_node=False, default=20.0)
    max_dpsi: float = struct.field(pytree_node=False, default=float(10 * np.pi))
    max_dv: float = struct.field(pytree_node=False, default=5.0)


def pack_state(x, y, psi, speed) -> jnp.ndarray:
    """Stack state components into (..., 4) (ref: `kinematic.py:137`)."""
    return jnp.stack([x, y, psi, speed], axis=-1)


def unpack_state(state: jnp.ndarray):
    """Split (..., 4) state into components (ref: `kinematic.py:144`)."""
    return state[..., 0], state[..., 1], state[..., 2], state[..., 3]


# ----------------------------------------------------------------------------
# Normalization
# ----------------------------------------------------------------------------

def _simple_norm_factor(params: KinematicParams) -> jnp.ndarray:
    return jnp.array([params.max_dx, params.max_dx, params.max_dpsi, params.max_dv])


def _bicycle_norm_factor(params: KinematicParams) -> jnp.ndarray:
    return jnp.array([params.max_acceleration, params.max_steering])


def normalize_action(model_id: int, action: jnp.ndarray, params: KinematicParams) -> jnp.ndarray:
    """Scale a raw action into [-1, 1] units for the given model."""
    if model_id in (SIMPLE, ORIENTED):
        return action / _simple_norm_factor(params)
    if model_id in (BICYCLE, BICYCLE_NO_REVERSING):
        return action / _bicycle_norm_factor(params)
    if model_id in (BICYCLE_BY_DISPLACEMENT, BICYCLE_BY_ORIENTED_DISPLACEMENT):
        return action / jnp.array([params.max_dx, params.max_dx])
    return action


def denormalize_action(model_id: int, action: jnp.ndarray, params: KinematicParams) -> jnp.ndarray:
    """Inverse of :func:`normalize_action`."""
    if model_id in (SIMPLE, ORIENTED):
        return action * _simple_norm_factor(params)
    if model_id in (BICYCLE, BICYCLE_NO_REVERSING):
        return action * _bicycle_norm_factor(params)
    if model_id in (BICYCLE_BY_DISPLACEMENT, BICYCLE_BY_ORIENTED_DISPLACEMENT):
        return action * jnp.array([params.max_dx, params.max_dx])
    return action


# ----------------------------------------------------------------------------
# Per-model step functions (pure; state (..., 4), action (..., k))
# ----------------------------------------------------------------------------

def teleport_step(state, action, params, dt):
    """Action is the next state (ref: `kinematic.py:321`)."""
    del state, params, dt
    return action[..., :STATE_SIZE]


def simple_step(state, action, params: KinematicParams, dt):
    """Action is the (normalized) state derivative (ref: `kinematic.py:362`)."""
    action = denormalize_action(SIMPLE, action[..., :4], params)
    return state + action * dt


def oriented_step(state, action, params: KinematicParams, dt):
    """Like simple, with xy action in the agent frame (ref: `kinematic.py:384`)."""
    psi = state[..., 2:3]
    xy = rotate(action[..., :2], psi)
    action = jnp.concatenate([xy, action[..., 2:4]], axis=-1)
    return simple_step(state, action, params, dt)


def _bicycle_core(state, a, beta, params: KinematicParams, dt):
    """
    Shared bicycle update (ref: `kinematic.py:462-477`).

    ``lr`` is sanitized against NaN/0 (pedestrians carry NaN lr, ref:
    `behavior/iai.py:113`): under compute-all-and-select dispatch the bicycle
    branch runs on every agent, and a NaN here would poison the gradients of
    non-bicycle agents through ``jnp.where``.
    """
    if params.left_handed:
        beta = -beta
    x, y, psi, v = unpack_state(state)
    lr = jnp.broadcast_to(params.lr, v.shape)
    lr = jnp.where(jnp.isnan(lr) | (lr == 0), 1.0, lr)
    v = v + a * dt
    x = x + v * jnp.cos(psi + beta) * dt
    y = y + v * jnp.sin(psi + beta) * dt
    psi = psi + (v / lr) * jnp.sin(beta) * dt
    return pack_state(x, y, psi, v)


def bicycle_step(state, action, params: KinematicParams, dt):
    """Kinematic bicycle step; action (accel, steering) (ref: `kinematic.py:462`)."""
    action = denormalize_action(BICYCLE, action[..., :2], params)
    return _bicycle_core(state, action[..., 0], action[..., 1], params, dt)


def bicycle_no_reversing_step(state, action, params: KinematicParams, dt):
    """Bicycle that stops rather than reversing (ref: `kinematic.py:513-523`)."""
    action = denormalize_action(BICYCLE, action[..., :2], params)
    acc, beta = action[..., 0], action[..., 1]
    v = state[..., 3]
    reversing = v + acc * dt < 0
    acc = jnp.where(reversing, -v / dt, acc)
    return _bicycle_core(state, acc, beta, params, dt)


def bicycle_fit_action(future_state, current_state, params: KinematicParams, dt) -> jnp.ndarray:
    """
    Inverse bicycle dynamics with reversing handling
    (ref: `kinematic.py:479-506`). Returns the *normalized* (accel, steering).
    """
    f_x, f_y, _, _ = unpack_state(future_state)
    c_x, c_y, c_psi, c_v = unpack_state(current_state)
    vx = (f_x - c_x) / dt
    vy = (f_y - c_y) / dt
    v = jnp.sqrt(vx ** 2 + vy ** 2)
    beta = jnp.arctan2(vy, vx) - c_psi * jnp.sign(jnp.abs(v))
    beta = jnp.remainder(beta + np.pi, 2 * np.pi) - np.pi
    reversing = jnp.sign(jnp.cos(beta)) == -1
    v = jnp.sqrt(vx ** 2 + vy ** 2) * jnp.where(reversing, -1.0, 1.0)
    beta = jnp.where(reversing, beta - np.pi * jnp.sign(beta), beta)
    a = (v - c_v) / dt
    if params.left_handed:
        beta = -beta
    action = jnp.stack([a, beta], axis=-1)
    return normalize_action(BICYCLE, action, params)


def bicycle_by_displacement_step(state, action, params: KinematicParams, dt):
    """Bicycle driven by a velocity-vector action (ref: `kinematic.py:546-558`)."""
    xy = action[..., :2] * params.max_dx
    dx, dy = xy[..., 0], xy[..., 1]
    x, y, psi, v = unpack_state(state)
    target = pack_state(x + dx * dt, y + dy * dt, psi, v)
    bicycle_action = bicycle_fit_action(target, state, params, dt)
    return bicycle_step(state, bicycle_action, params, dt)


def bicycle_by_oriented_displacement_step(state, action, params: KinematicParams, dt):
    """Agent-frame variant of displacement-driven bicycle (ref: `kinematic.py:577`)."""
    psi = state[..., 2:3]
    xy = rotate(action[..., :2], psi)
    action = jnp.concatenate([xy, action[..., 2:]], axis=-1)
    return bicycle_by_displacement_step(state, action, params, dt)


_STEP_FNS = {
    TELEPORT: teleport_step,
    SIMPLE: simple_step,
    ORIENTED: oriented_step,
    BICYCLE: bicycle_step,
    BICYCLE_NO_REVERSING: bicycle_no_reversing_step,
    BICYCLE_BY_DISPLACEMENT: bicycle_by_displacement_step,
    BICYCLE_BY_ORIENTED_DISPLACEMENT: bicycle_by_oriented_displacement_step,
}


# ----------------------------------------------------------------------------
# Per-model fit_action functions
# ----------------------------------------------------------------------------

def _pad_action(action: jnp.ndarray) -> jnp.ndarray:
    pad = ACTION_BUF - action.shape[-1]
    if pad > 0:
        action = jnp.concatenate(
            [action, jnp.zeros(action.shape[:-1] + (pad,), action.dtype)], axis=-1)
    return action


def teleport_fit_action(future_state, current_state, params, dt):
    del current_state, params, dt
    return future_state


def simple_fit_action(future_state, current_state, params, dt):
    action = (future_state - current_state) / dt
    return normalize_action(SIMPLE, action, params)


def oriented_fit_action(future_state, current_state, params, dt):
    parent = simple_fit_action(future_state, current_state, params, dt)
    psi = current_state[..., 2:3]
    xy = rotate(parent[..., :2], -psi)
    return jnp.concatenate([xy, parent[..., 2:]], axis=-1)


def bicycle_by_displacement_fit_action(future_state, current_state, params, dt):
    xf, yf = future_state[..., 0], future_state[..., 1]
    xp, yp = current_state[..., 0], current_state[..., 1]
    action = jnp.stack([(xf - xp) / dt, (yf - yp) / dt], axis=-1)
    return action / params.max_dx


def bicycle_by_oriented_displacement_fit_action(future_state, current_state, params, dt):
    action = bicycle_by_displacement_fit_action(future_state, current_state, params, dt)
    psi = current_state[..., 2:3]
    return rotate(action[..., :2], -psi)


_FIT_FNS = {
    TELEPORT: teleport_fit_action,
    SIMPLE: simple_fit_action,
    ORIENTED: oriented_fit_action,
    BICYCLE: bicycle_fit_action,
    BICYCLE_NO_REVERSING: bicycle_fit_action,
    BICYCLE_BY_DISPLACEMENT: bicycle_by_displacement_fit_action,
    BICYCLE_BY_ORIENTED_DISPLACEMENT: bicycle_by_oriented_displacement_fit_action,
}


# ----------------------------------------------------------------------------
# Heterogeneous (compound) dispatch: compute-all-and-select
# ----------------------------------------------------------------------------

def step(state: jnp.ndarray, action: jnp.ndarray, params: KinematicParams,
         model_ids: Optional[jnp.ndarray] = None, dt: Optional[float] = None,
         single_model: Optional[int] = None) -> jnp.ndarray:
    """
    Advance agent states one step.

    Args:
        state: (..., 4) agent states.
        action: (..., Ac) actions; Ac may be any model's action size or the
            unified ``ACTION_BUF``.
        params: kinematic parameters PyTree.
        model_ids: (...) int array of per-agent model ids. If ``None``,
            ``single_model`` must be given and is applied to all agents
            (traced as a single branch -- zero dispatch overhead).
        dt: time delta, defaults to ``params.dt``.
        single_model: static model id used when ``model_ids`` is None.
    Returns:
        (..., 4) next states.

    Replaces the reference's dynamic-shape batch splitting
    (`kinematic.py:197-201`) with a compute-all-and-select pattern that
    XLA fuses into one elementwise kernel.
    """
    if dt is None:
        dt = params.dt
    action = _pad_action(action)
    if model_ids is None:
        assert single_model is not None
        return _STEP_FNS[single_model](state, action, params, dt)
    used = _models_in_use(model_ids)
    out = state
    first = True
    for mid in used:
        candidate = _STEP_FNS[mid](state, action, params, dt)
        if first and len(used) == 1:
            return candidate
        sel = (model_ids == mid)[..., None]
        out = jnp.where(sel, candidate, out)
        first = False
    return out


def fit_action(future_state: jnp.ndarray, current_state: jnp.ndarray,
               params: KinematicParams, model_ids: Optional[jnp.ndarray] = None,
               dt: Optional[float] = None, single_model: Optional[int] = None) -> jnp.ndarray:
    """
    Inverse dynamics: the action that would (approximately) reach
    ``future_state`` from ``current_state``. Output padded to ``ACTION_BUF``.
    """
    if dt is None:
        dt = params.dt
    if model_ids is None:
        assert single_model is not None
        return _pad_action(_FIT_FNS[single_model](future_state, current_state, params, dt))
    used = _models_in_use(model_ids)
    out = jnp.zeros(future_state.shape[:-1] + (ACTION_BUF,), future_state.dtype)
    for mid in used:
        candidate = _pad_action(_FIT_FNS[mid](future_state, current_state, params, dt))
        sel = (model_ids == mid)[..., None]
        out = jnp.where(sel, candidate, out)
    return out


def _models_in_use(model_ids) -> Tuple[int, ...]:
    """
    Static set of models to evaluate. When `model_ids` is a concrete
    (non-traced) array we restrict evaluation to the ids actually present;
    under tracing we evaluate every registered model (still cheap and fused).
    """
    try:
        concrete = np.asarray(model_ids)
    except Exception:  # traced value inside jit: evaluate all models
        return tuple(range(NUM_MODELS))
    return tuple(int(i) for i in np.unique(concrete))


# ----------------------------------------------------------------------------
# Object facade mirroring reference class names (thin, explicit-state)
# ----------------------------------------------------------------------------

@dataclasses.dataclass
class KinematicModel:
    """
    Facade with the reference's interface (`kinematic.py:20-157`), holding
    explicit state and delegating to the pure functions above. ``state`` is a
    (..., 4) array. Unlike the reference this object is cheap to copy and its
    methods never mutate shared tensors.
    """
    dt: float = 0.1
    state: Optional[jnp.ndarray] = None
    params: KinematicParams = None
    model_id: int = SIMPLE

    def __post_init__(self):
        if self.params is None:
            self.params = KinematicParams(dt=self.dt)
        else:
            self.params = self.params.replace(dt=self.dt)

    @property
    def action_size(self) -> int:
        return MODEL_ACTION_SIZE[self.model_id]

    @property
    def state_size(self) -> int:
        return STATE_SIZE

    @property
    def batch_size(self) -> int:
        return int(np.prod(self.state.shape[:-1])) if self.state is not None else 0

    pack_state = staticmethod(pack_state)
    unpack_state = staticmethod(unpack_state)

    def flattening(self, batch_shape) -> None:
        """Flatten batch dims of per-agent params (ref: `kinematic.py:105`)."""
        if self.params.lr.ndim > 1:
            self.params = self.params.replace(lr=self.params.lr.reshape(-1))

    def unflattening(self, batch_shape) -> None:
        if self.params.lr.ndim >= 1:
            self.params = self.params.replace(
                lr=self.params.lr.reshape(tuple(batch_shape)))

    def map_param(self, f) -> None:
        """Apply a function to per-agent params (ref: `kinematic.py:117`)."""
        self.params = self.params.replace(lr=f(self.params.lr))

    def set_state(self, state):
        # host input stays host (scenario construction); device stays device
        self.state = state if isinstance(state, jnp.ndarray) \
            else np.asarray(state)

    def get_state(self):
        return self.state

    def get_params(self):
        """Dictionary of model parameters (ref: `kinematic.py:93-97`)."""
        return {}

    def set_params(self, **kwargs):
        """Set custom model parameters (ref: `kinematic.py:99-103`).

        Unlike the reference's silent ``pass``, unknown parameter names are
        rejected so a subclass that forgets to override this doesn't have its
        parameters silently dropped.
        """
        known = self.get_params()
        unknown = sorted(k for k in kwargs if k not in known)
        if unknown:
            raise ValueError(
                f"{type(self).__name__} does not accept kinematic "
                f"parameters {unknown}; known parameters: "
                f"{sorted(known)} (override set_params/get_params "
                "in the subclass)")

    def step(self, action, dt=None):
        self.state = step(self.state, jnp.asarray(action), self.params,
                          single_model=self.model_id, dt=dt)

    def fit_action(self, future_state, current_state=None, dt=None):
        if current_state is None:
            current_state = self.state
        act = fit_action(jnp.asarray(future_state), jnp.asarray(current_state),
                         self.params, single_model=self.model_id, dt=dt)
        return act[..., :self.action_size]

    def normalize_action(self, action):
        return normalize_action(self.model_id, action, self.params)

    def denormalize_action(self, action):
        return denormalize_action(self.model_id, action, self.params)

    def copy(self, other=None):
        import copy as _copy
        out = _copy.copy(self) if other is None else other
        out.state = self.state
        out.params = self.params
        out.model_id = self.model_id
        return out

    def to(self, device=None):
        return self

    def extend(self, n: int):
        self.state = _extend_array(self.state, n)
        self.params = self.params.replace(lr=_extend_array(self.params.lr, n))

    def select_batch_elements(self, idx):
        idx = as_batch_index(idx)
        self.state = self.state[idx]
        if self.params.lr.ndim > 0:
            self.params = self.params.replace(lr=self.params.lr[idx])


def _extend_array(x, n: int):
    """extend semantics of the reference (`kinematic.py:150-153`): repeat each
    batch element n times contiguously (unsqueeze+expand+flatten)."""
    if x is None or x.ndim == 0:
        return x
    return host_repeat(x, n)


class TeleportingKinematicModel(KinematicModel):
    def __init__(self, dt=0.1, state=None, params=None):
        super().__init__(dt=dt, state=state, params=params, model_id=TELEPORT)


class SimpleKinematicModel(KinematicModel):
    def __init__(self, max_dx=20, max_dpsi=10 * np.pi, max_dv=5, dt=0.1, state=None):
        params = KinematicParams(dt=dt, max_dx=max_dx, max_dpsi=max_dpsi, max_dv=max_dv)
        super().__init__(dt=dt, state=state, params=params, model_id=SIMPLE)


class OrientedKinematicModel(SimpleKinematicModel):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.model_id = ORIENTED


class KinematicBicycle(KinematicModel):
    def __init__(self, max_acceleration=5, max_steering=np.pi / 2, dt=0.1,
                 left_handed=False, state=None):
        params = KinematicParams(dt=dt, max_acceleration=max_acceleration,
                                 max_steering=max_steering, left_handed=left_handed)
        super().__init__(dt=dt, state=state, params=params, model_id=BICYCLE)

    @property
    def left_handed(self):
        return self.params.left_handed

    @left_handed.setter
    def left_handed(self, value: bool):
        self.params = self.params.replace(left_handed=bool(value))

    def get_params(self):
        return {'lr': self.params.lr}

    def set_params(self, **kwargs):
        super().set_params(**{k: v for k, v in kwargs.items() if k != 'lr'})
        assert 'lr' in kwargs
        lr = kwargs['lr']
        if not isinstance(lr, jnp.ndarray):
            lr = np.asarray(lr)
        self.params = self.params.replace(lr=lr)


class BicycleNoReversing(KinematicBicycle):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.model_id = BICYCLE_NO_REVERSING


class BicycleByDisplacement(KinematicBicycle):
    def __init__(self, max_dx=20, dt=0.1, state=None):
        super().__init__(dt=dt, state=state)
        self.params = self.params.replace(max_dx=max_dx)
        self.model_id = BICYCLE_BY_DISPLACEMENT

    def step_from_xy(self, xy, dt=None):
        """Step from a normalized world-frame velocity action, ignoring any
        extra action channels (ref: `kinematic.py:550-558`, where ``step``
        delegates to this after slicing the first two channels)."""
        self.state = step(self.state, jnp.asarray(xy)[..., :2], self.params,
                          single_model=BICYCLE_BY_DISPLACEMENT, dt=dt)


class BicycleByOrientedDisplacement(BicycleByDisplacement):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.model_id = BICYCLE_BY_ORIENTED_DISPLACEMENT

    def step_from_xy(self, xy, dt=None):
        """Agent-frame variant (ref: `kinematic.py:577-580`)."""
        self.state = step(self.state, jnp.asarray(xy)[..., :2], self.params,
                          single_model=BICYCLE_BY_ORIENTED_DISPLACEMENT,
                          dt=dt)


class CompoundKinematicModel(KinematicModel):
    """
    Heterogeneous agents: per-agent integer model ids select among the pure
    model functions (ref class: `kinematic.py:160`, rebuilt without batch
    splitting). ``model_assignments`` holds *model ids* (values from the
    module-level constants), not indices into a model list.
    """
    def __init__(self, model_assignments: jnp.ndarray, params: Optional[KinematicParams] = None,
                 dt: float = 0.1, state=None):
        super().__init__(dt=dt, state=state, params=params)
        self.model_assignments = jnp.asarray(model_assignments)

    @property
    def action_size(self) -> int:
        return ACTION_BUF

    @property
    def batch_assignments(self) -> jnp.ndarray:
        """Flattened model ids (ref: `kinematic.py:186`)."""
        return self.model_assignments.reshape(-1)

    @property
    def batch_shape(self):
        return self.model_assignments.shape

    def get_params(self):
        """The shared per-agent parameter table. The reference's compound
        routes params to sub-models (`kinematic.py:261-281`); here all model
        functions read one shared ``KinematicParams``, so ``lr`` (used by the
        bicycle family) is the per-agent parameter to expose."""
        return {'lr': self.params.lr}

    def set_params(self, **kwargs):
        super().set_params(**{k: v for k, v in kwargs.items() if k != 'lr'})
        if 'lr' in kwargs:
            lr = kwargs['lr']
            if not isinstance(lr, jnp.ndarray):
                lr = np.asarray(lr)
            self.params = self.params.replace(lr=lr)

    def step(self, action, dt=None):
        self.state = step(self.state, jnp.asarray(action), self.params,
                          model_ids=self.model_assignments, dt=dt)

    def fit_action(self, future_state, current_state=None, dt=None):
        if current_state is None:
            current_state = self.state
        return fit_action(jnp.asarray(future_state), jnp.asarray(current_state),
                          self.params, model_ids=self.model_assignments, dt=dt)

    def extend(self, n: int):
        super().extend(n)
        self.model_assignments = _extend_array(self.model_assignments, n)

    def select_batch_elements(self, idx):
        super().select_batch_elements(idx)
        self.model_assignments = self.model_assignments[as_batch_index(idx)]
