"""
Numerical and GRADIENT parity against the reference PyTorch implementation.

The reference checkout (read-only) runs on CPU torch; its pure-torch
components are the ground truth these tests compare against, including the
headline requirement that rollout gradients match to 1e-4.

All tests skip when the reference checkout is unavailable.
"""
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, 'torchdrivesim')),
    reason='reference checkout not available')

if os.path.isdir(os.path.join(REFERENCE, 'torchdrivesim')):
    sys.path.append(REFERENCE)
    # the reference imports shapely at module scope but only uses it in the
    # CPU nograd collision path; stub it so the module imports
    if 'shapely' not in sys.modules:
        shapely = types.ModuleType('shapely')
        geometry = types.ModuleType('shapely.geometry')
        geometry.Polygon = object
        shapely.geometry = geometry
        sys.modules['shapely'] = shapely
        sys.modules['shapely.geometry'] = geometry
    # the reference's renderer factory imports omegaconf at module scope;
    # only dataclass configs are exercised here
    if 'omegaconf' not in sys.modules:
        omegaconf = types.ModuleType('omegaconf')
        omegaconf.DictConfig = dict
        omegaconf.OmegaConf = types.SimpleNamespace(
            to_container=lambda *a, **k: {}, structured=lambda x: x)
        omegaconf.SCMode = types.SimpleNamespace(INSTANTIATE=None)
        sys.modules['omegaconf'] = omegaconf
    import torch
    import torchdrivesim._iou_utils as ref_iou
    import torchdrivesim.goals as ref_goals
    import torchdrivesim.kinematic as ref_kinematic
    import torchdrivesim.infractions as ref_infractions
    import torchdrivesim.traffic_controls as ref_controls

import torchdrivesim_tpu.kinematic as K
from torchdrivesim_tpu.goals import WaypointGoal
from torchdrivesim_tpu.ops.box import box2corners, iou_differentiable
from torchdrivesim_tpu.ops.collision import (
    bbox2discs, collision_detection_with_discs,
)
from torchdrivesim_tpu.ops.point_mesh import point_to_triangles_distance_sq
from torchdrivesim_tpu.traffic_controls import TrafficLightControl


def _rand_states(rng, b, a):
    return np.stack([
        rng.uniform(-100, 100, (b, a)), rng.uniform(-100, 100, (b, a)),
        rng.uniform(-np.pi, np.pi, (b, a)), rng.uniform(-3, 15, (b, a)),
    ], axis=-1).astype(np.float32)


class TestKinematicParity:
    def test_bicycle_step(self):
        rng = np.random.RandomState(0)
        b, a = 4, 5
        states = _rand_states(rng, b, a)
        actions = rng.uniform(-1, 1, (b, a, 2)).astype(np.float32)
        lr = rng.uniform(0.8, 2.5, (b, a)).astype(np.float32)

        ref = ref_kinematic.KinematicBicycle(dt=0.1)
        ref.set_params(lr=torch.from_numpy(lr))
        ref.set_state(torch.from_numpy(states))
        ref.step(torch.from_numpy(actions))
        want = ref.get_state().numpy()

        mine = K.KinematicBicycle(dt=0.1)
        mine.set_params(lr=jnp.asarray(lr))
        mine.set_state(jnp.asarray(states))
        mine.step(jnp.asarray(actions))
        np.testing.assert_allclose(np.asarray(mine.get_state()), want,
                                   rtol=1e-5, atol=1e-4)

    def test_bicycle_fit_action(self):
        rng = np.random.RandomState(1)
        b, a = 4, 5
        cur = _rand_states(rng, b, a)
        fut = cur + rng.uniform(-1, 1, cur.shape).astype(np.float32)

        ref = ref_kinematic.KinematicBicycle(dt=0.1)
        ref.set_params(lr=torch.ones(b, a))
        ref.set_state(torch.from_numpy(cur))
        want = ref.fit_action(torch.from_numpy(fut)).numpy()

        mine = K.KinematicBicycle(dt=0.1)
        mine.set_params(lr=jnp.ones((b, a)))
        mine.set_state(jnp.asarray(cur))
        got = np.asarray(mine.fit_action(jnp.asarray(fut)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_bicycle_no_reversing(self):
        rng = np.random.RandomState(2)
        b, a = 3, 4
        states = _rand_states(rng, b, a)
        states[..., 3] = np.abs(states[..., 3]) * 0.1  # small speeds
        actions = rng.uniform(-1, 1, (b, a, 2)).astype(np.float32)

        ref = ref_kinematic.BicycleNoReversing(dt=0.1)
        ref.set_params(lr=torch.ones(b, a))
        ref.set_state(torch.from_numpy(states))
        ref.step(torch.from_numpy(actions))
        want = ref.get_state().numpy()

        mine = K.BicycleNoReversing(dt=0.1)
        mine.set_params(lr=jnp.ones((b, a)))
        mine.set_state(jnp.asarray(states))
        mine.step(jnp.asarray(actions))
        np.testing.assert_allclose(np.asarray(mine.get_state()), want,
                                   rtol=1e-5, atol=1e-4)

    def test_simple_and_oriented(self):
        rng = np.random.RandomState(3)
        b, a = 3, 4
        states = _rand_states(rng, b, a)
        actions = rng.uniform(-1, 1, (b, a, 4)).astype(np.float32)
        for ref_cls, my_cls in [
                (ref_kinematic.SimpleKinematicModel, K.SimpleKinematicModel),
                (ref_kinematic.OrientedKinematicModel, K.OrientedKinematicModel)]:
            ref = ref_cls(dt=0.1)
            ref.set_state(torch.from_numpy(states))
            ref.step(torch.from_numpy(actions))
            want = ref.get_state().numpy()
            mine = my_cls(dt=0.1)
            mine.set_state(jnp.asarray(states))
            mine.step(jnp.asarray(actions))
            np.testing.assert_allclose(np.asarray(mine.get_state()), want,
                                       rtol=1e-5, atol=1e-3)

    def test_rollout_gradients_match_to_1e4(self):
        """The BASELINE criterion: gradients through a 40-step differentiable
        rollout match the PyTorch reference to 1e-4."""
        rng = np.random.RandomState(4)
        b, a, horizon = 2, 3, 40
        states = _rand_states(rng, b, a)
        states[..., 3] = rng.uniform(0, 8, (b, a))
        actions = rng.uniform(-0.3, 0.3, (horizon, b, a, 2)).astype(np.float32)
        lr = rng.uniform(1.0, 2.0, (b, a)).astype(np.float32)

        # reference: torch autograd through 40 steps
        ref = ref_kinematic.KinematicBicycle(dt=0.1)
        ref.set_params(lr=torch.from_numpy(lr))
        actions_t = torch.from_numpy(actions.copy()).requires_grad_(True)
        ref.set_state(torch.from_numpy(states))
        for t in range(horizon):
            ref.step(actions_t[t])
        loss_t = (ref.get_state()[..., :2] ** 2).sum()
        loss_t.backward()
        want_grad = actions_t.grad.numpy()

        # ours: jax.grad through a lax.scan
        params = K.KinematicParams(lr=jnp.asarray(lr), dt=0.1)

        def loss_fn(acts):
            def body(s, a_):
                s = K.step(s, a_, params, single_model=K.BICYCLE)
                return s, None
            final, _ = jax.lax.scan(body, jnp.asarray(states), acts)
            return jnp.sum(final[..., :2] ** 2)

        got_grad = np.asarray(jax.grad(loss_fn)(jnp.asarray(actions)))
        scale = np.abs(want_grad).max()
        np.testing.assert_allclose(got_grad / scale, want_grad / scale,
                                   atol=1e-4)


class TestIoUParity:
    def _boxes(self, seed, b=2, n=16):
        rng = np.random.RandomState(seed)
        return np.stack([
            rng.uniform(-5, 5, (b, n)), rng.uniform(-5, 5, (b, n)),
            rng.uniform(1, 6, (b, n)), rng.uniform(1, 3, (b, n)),
            rng.uniform(-np.pi, np.pi, (b, n)),
        ], axis=-1).astype(np.float32)

    def test_corners(self):
        boxes = self._boxes(0)
        want = ref_iou.box2corners_th(torch.from_numpy(boxes)).numpy()
        got = np.asarray(box2corners(jnp.asarray(boxes)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_iou_values(self):
        b1 = self._boxes(1)
        b2 = self._boxes(2)
        b2[..., :2] = b1[..., :2] + np.random.RandomState(3).uniform(
            -3, 3, b1[..., :2].shape)
        want = ref_iou.iou_differentiable_fast(
            torch.from_numpy(b1), torch.from_numpy(b2)).numpy()
        got = np.asarray(iou_differentiable(jnp.asarray(b1), jnp.asarray(b2)))
        np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want),
                                   atol=2e-3)

    def test_iou_gradients(self):
        b1 = self._boxes(4, b=1, n=8)
        b2 = b1.copy()
        b2[..., 0] += 1.0
        t1 = torch.from_numpy(b1.copy()).requires_grad_(True)
        ref_val = ref_iou.iou_differentiable_fast(t1, torch.from_numpy(b2))
        ref_val.sum().backward()
        want = t1.grad.numpy()

        got = np.asarray(jax.grad(
            lambda x: jnp.sum(iou_differentiable(x, jnp.asarray(b2))))(
            jnp.asarray(b1)))
        scale = np.abs(want).max() + 1e-8
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-3)


class TestCollisionParity:
    def test_discs(self):
        rng = np.random.RandomState(5)
        b, a = 3, 7
        box1 = np.stack([
            rng.uniform(-20, 20, (b, a)), rng.uniform(-20, 20, (b, a)),
            rng.uniform(2, 6, (b, a)), rng.uniform(1, 3, (b, a)),
            rng.uniform(-np.pi, np.pi, (b, a)),
        ], axis=-1).astype(np.float32)
        box2 = box1 + rng.uniform(-4, 4, box1.shape).astype(np.float32) * \
            np.asarray([1, 1, 0, 0, 1], np.float32)
        want = ref_infractions.collision_detection_with_discs(
            torch.from_numpy(box1), torch.from_numpy(box2)).numpy()
        got = np.asarray(collision_detection_with_discs(
            jnp.asarray(box1), jnp.asarray(box2)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bbox2discs(self):
        rng = np.random.RandomState(6)
        box = np.stack([
            rng.uniform(-20, 20, (5,)), rng.uniform(-20, 20, (5,)),
            rng.uniform(2, 6, (5,)), rng.uniform(1, 3, (5,)),
            rng.uniform(-np.pi, np.pi, (5,)),
        ], axis=-1).astype(np.float32)
        want_c, want_r = ref_infractions.bbox2discs(torch.from_numpy(box))
        got_c, got_r = bbox2discs(jnp.asarray(box))
        np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_r), want_r.numpy(),
                                   rtol=1e-5, atol=1e-6)


class TestOffroadParity:
    def test_point_to_mesh_distance(self):
        rng = np.random.RandomState(7)
        n_pts, n_tris = 16, 12
        pts2 = rng.uniform(-10, 10, (n_pts, 2)).astype(np.float32)
        tris2 = rng.uniform(-10, 10, (n_pts, n_tris, 3, 2)).astype(np.float32)
        # reference computes in 3D with z=0
        pts3 = np.concatenate([pts2, np.zeros((n_pts, 1), np.float32)], -1)
        tris3 = np.concatenate(
            [tris2, np.zeros((n_pts, n_tris, 3, 1), np.float32)], -1)
        want = ref_infractions.point_to_mesh_distance_pt(
            torch.from_numpy(pts3), torch.from_numpy(tris3)).numpy()[:, 0] \
            if ref_infractions.point_to_mesh_distance_pt(
                torch.from_numpy(pts3), torch.from_numpy(tris3)).ndim == 2 \
            else ref_infractions.point_to_mesh_distance_pt(
                torch.from_numpy(pts3), torch.from_numpy(tris3)).numpy()
        got = np.asarray(jax.vmap(
            lambda p, t: point_to_triangles_distance_sq(p[None], t)[0])(
            jnp.asarray(pts2), jnp.asarray(tris2)))
        np.testing.assert_allclose(got, np.asarray(want).reshape(-1),
                                   rtol=1e-3, atol=1e-4)


class TestGoalsParity:
    def test_waypoint_step(self):
        rng = np.random.RandomState(8)
        b, a, n, m = 2, 3, 4, 2
        wps = rng.uniform(-20, 20, (b, a, n, m, 2)).astype(np.float32)
        mask = rng.rand(b, a, n, m) > 0.2
        agents = np.concatenate([
            wps[:, :, 0, 0] + rng.uniform(-3, 3, (b, a, 2)),
            np.zeros((b, a, 2))], axis=-1).astype(np.float32)

        ref = ref_goals.WaypointGoal(torch.from_numpy(wps.copy()),
                                     torch.from_numpy(mask.copy()))
        ref.step(torch.from_numpy(agents), threshold=2.0)
        mine = WaypointGoal(jnp.asarray(wps), jnp.asarray(mask))
        mine.step(jnp.asarray(agents), threshold=2.0)
        np.testing.assert_array_equal(np.asarray(mine.state),
                                      ref.state.numpy())
        np.testing.assert_array_equal(np.asarray(mine.mask), ref.mask.numpy())
        np.testing.assert_allclose(np.asarray(mine.get_waypoints()),
                                   ref.get_waypoints().numpy(), atol=1e-6)


class TestTrafficControlParity:
    def test_light_violations(self):
        rng = np.random.RandomState(9)
        b, n_lights, a = 2, 5, 6
        pos = np.stack([
            rng.uniform(-30, 30, (b, n_lights)), rng.uniform(-30, 30, (b, n_lights)),
            rng.uniform(1, 3, (b, n_lights)), rng.uniform(3, 6, (b, n_lights)),
            rng.uniform(-np.pi, np.pi, (b, n_lights)),
        ], axis=-1).astype(np.float32)
        agents = np.stack([
            rng.uniform(-30, 30, (b, a)), rng.uniform(-30, 30, (b, a)),
            rng.uniform(3, 6, (b, a)), rng.uniform(1.5, 2.5, (b, a)),
            rng.uniform(-np.pi, np.pi, (b, a)),
        ], axis=-1).astype(np.float32)
        states = rng.randint(0, 3, (b, n_lights))

        ref = ref_controls.TrafficLightControl(torch.from_numpy(pos))
        ref.set_state(torch.from_numpy(states))
        want = ref.compute_violation(torch.from_numpy(agents)).numpy()

        mine = TrafficLightControl(jnp.asarray(pos))
        mine.set_state(jnp.asarray(states))
        got = np.asarray(mine.compute_violation(jnp.asarray(agents)))
        np.testing.assert_array_equal(got, want)


class TestCompoundKinematicParity:
    def test_mixed_models_step(self):
        """Heterogeneous dispatch (compute-all-and-select) must match the
        reference's batch-splitting CompoundKinematicModel."""
        rng = np.random.RandomState(11)
        n = 8  # flat batch of agents
        states = np.stack([
            rng.uniform(-50, 50, (n,)), rng.uniform(-50, 50, (n,)),
            rng.uniform(-np.pi, np.pi, (n,)), rng.uniform(0, 10, (n,)),
        ], axis=-1).astype(np.float32)
        actions = rng.uniform(-1, 1, (n, 4)).astype(np.float32)
        lr = rng.uniform(1.0, 2.0, (n,)).astype(np.float32)
        assignments = np.asarray([0, 1, 0, 1, 1, 0, 0, 1])

        bike_idx = assignments == 0
        simple_idx = assignments == 1
        ref_bike = ref_kinematic.KinematicBicycle(dt=0.1)
        ref_bike.set_params(lr=torch.from_numpy(lr[bike_idx]))
        ref_bike.set_state(torch.from_numpy(states[bike_idx]))
        ref_simple = ref_kinematic.SimpleKinematicModel(dt=0.1)
        ref_simple.set_state(torch.from_numpy(states[simple_idx]))
        ref = ref_kinematic.CompoundKinematicModel(
            [ref_bike, ref_simple], torch.from_numpy(assignments))
        ref.step(torch.from_numpy(actions))
        want = ref.get_state().numpy()

        ids = np.where(assignments == 0, K.BICYCLE, K.SIMPLE)
        mine = K.CompoundKinematicModel(
            model_assignments=jnp.asarray(ids),
            params=K.KinematicParams(lr=jnp.asarray(lr), dt=0.1))
        mine.set_state(jnp.asarray(states))
        mine.step(jnp.asarray(actions))
        got = np.asarray(mine.get_state())
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_mixed_models_fit_action(self):
        rng = np.random.RandomState(12)
        n = 6
        cur = np.stack([
            rng.uniform(-20, 20, (n,)), rng.uniform(-20, 20, (n,)),
            rng.uniform(-1, 1, (n,)), rng.uniform(0, 5, (n,)),
        ], axis=-1).astype(np.float32)
        fut = cur + rng.uniform(-0.5, 0.5, cur.shape).astype(np.float32)
        assignments = np.asarray([0, 1, 1, 0, 1, 0])
        lr = np.ones(n, np.float32)

        bike_idx = assignments == 0
        ref_bike = ref_kinematic.KinematicBicycle(dt=0.1)
        ref_bike.set_params(lr=torch.from_numpy(lr[bike_idx]))
        ref_bike.set_state(torch.from_numpy(cur[bike_idx]))
        ref_simple = ref_kinematic.SimpleKinematicModel(dt=0.1)
        ref_simple.set_state(torch.from_numpy(cur[assignments == 1]))
        ref = ref_kinematic.CompoundKinematicModel(
            [ref_bike, ref_simple], torch.from_numpy(assignments))
        want = ref.fit_action(torch.from_numpy(fut)).numpy()

        ids = np.where(assignments == 0, K.BICYCLE, K.SIMPLE)
        mine = K.CompoundKinematicModel(
            model_assignments=jnp.asarray(ids),
            params=K.KinematicParams(lr=jnp.asarray(lr), dt=0.1))
        mine.set_state(jnp.asarray(cur))
        got = np.asarray(mine.fit_action(jnp.asarray(fut)))
        # the reference pads bicycle's 2-wide action to width 4 with zeros
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
