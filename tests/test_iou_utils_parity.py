"""
Parity of `torchdrivesim_tpu.iou_utils` (the reference-shaped IoU surface)
against the reference's `_iou_utils.py`, function by function, on random
oriented boxes at map-scale coordinates.
"""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, 'torchdrivesim')),
    reason='reference checkout not available')

if os.path.isdir(os.path.join(REFERENCE, 'torchdrivesim')):
    sys.path.append(REFERENCE)

from torchdrivesim_tpu import iou_utils as U  # noqa: E402


def _random_boxes(seed, b=3, n=8, scale=400.0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-scale, scale, size=(b, n, 2)).astype(np.float32)
    wh = rng.uniform(1.0, 6.0, size=(b, n, 2)).astype(np.float32)
    a = rng.uniform(-np.pi, np.pi, size=(b, n, 1)).astype(np.float32)
    return np.concatenate([xy, wh, a], axis=-1)


def _overlapping_pairs(seed, b=3, n=16):
    """box2 = box1 perturbed a little, so most pairs genuinely overlap."""
    rng = np.random.default_rng(seed)
    box1 = _random_boxes(seed, b, n)
    box2 = box1.copy()
    box2[..., :2] += rng.uniform(-2.0, 2.0, size=(b, n, 2)).astype(np.float32)
    box2[..., 4:] += rng.uniform(-0.8, 0.8, size=(b, n, 1)).astype(np.float32)
    return box1, box2


def test_box2corners_th_matches_reference():
    import torch
    from torchdrivesim import _iou_utils as R
    box = _random_boxes(0)
    ref = R.box2corners_th(torch.tensor(box)).numpy()
    ours = np.asarray(U.box2corners_th(jnp.asarray(box)))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_box_intersection_th_matches_reference():
    import torch
    from torchdrivesim import _iou_utils as R
    box1, box2 = _overlapping_pairs(1)
    c1 = R.box2corners_th(torch.tensor(box1))
    c2 = R.box2corners_th(torch.tensor(box2))
    ref_i, ref_m = R.box_intersection_th(c1, c2)
    our_i, our_m = U.box_intersection_th(jnp.asarray(c1.numpy()),
                                         jnp.asarray(c2.numpy()))
    np.testing.assert_array_equal(np.asarray(our_m), ref_m.numpy())
    # only masked-in points are meaningful (masked-out are zeroed)
    np.testing.assert_allclose(np.asarray(our_i), ref_i.numpy(), atol=5e-3)


def test_box_in_box_matches_reference():
    import torch
    from torchdrivesim import _iou_utils as R
    box1, box2 = _overlapping_pairs(2)
    c1 = R.box2corners_th(torch.tensor(box1))
    c2 = R.box2corners_th(torch.tensor(box2))
    ref12, ref21 = R.box_in_box_th(c1, c2)
    our12, our21 = U.box_in_box_th(jnp.asarray(c1.numpy()),
                                   jnp.asarray(c2.numpy()))
    np.testing.assert_array_equal(np.asarray(our12), ref12.numpy().astype(bool))
    np.testing.assert_array_equal(np.asarray(our21), ref21.numpy().astype(bool))


def test_oriented_box_intersection_2d_area_matches_reference():
    import torch
    from torchdrivesim import _iou_utils as R
    box1, box2 = _overlapping_pairs(3)
    c1 = R.box2corners_th(torch.tensor(box1))
    c2 = R.box2corners_th(torch.tensor(box2))
    ref_area, _ = R.oriented_box_intersection_2d(c1, c2)
    our_area, our_sel = U.oriented_box_intersection_2d(
        jnp.asarray(c1.numpy()), jnp.asarray(c2.numpy()))
    np.testing.assert_allclose(np.asarray(our_area), ref_area.numpy(),
                               atol=5e-2, rtol=1e-3)
    assert our_sel.shape == (3, 16, 9, 2)


def test_identical_boxes_full_overlap():
    """Coincident boxes (8 duplicated candidate vertices, all boundary).

    Boundary corners can flip out of the containment test under float32
    cancellation — a property inherited from the reference
    (`_iou_utils.py:104-113`), which yields less than the full w*h area for
    some coincident boxes. The contract is reference parity, bit for bit.
    """
    import torch
    from torchdrivesim import _iou_utils as R
    box = _random_boxes(4, b=2, n=4, scale=20.0)
    c = U.box2corners_th(jnp.asarray(box))
    area, _ = U.oriented_box_intersection_2d(c, c)
    tc = R.box2corners_th(torch.tensor(box))
    ref_area, _ = R.oriented_box_intersection_2d(tc, tc)
    np.testing.assert_allclose(np.asarray(area), ref_area.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_identical_boxes_parity_at_map_scale():
    import torch
    from torchdrivesim import _iou_utils as R
    box = _random_boxes(4, b=2, n=4, scale=400.0)
    tc = R.box2corners_th(torch.tensor(box))
    ref12 = R.box1_in_box2(tc, tc)
    our12 = U.box1_in_box2(jnp.asarray(tc.numpy()), jnp.asarray(tc.numpy()))
    np.testing.assert_array_equal(np.asarray(our12),
                                  ref12.numpy().astype(bool))


def test_disjoint_boxes_zero_area():
    box1 = _random_boxes(5, b=2, n=4)
    box2 = box1.copy()
    box2[..., 0] += 1000.0   # far apart
    c1 = U.box2corners_th(jnp.asarray(box1))
    c2 = U.box2corners_th(jnp.asarray(box2))
    area, _ = U.oriented_box_intersection_2d(c1, c2)
    np.testing.assert_allclose(np.asarray(area), 0.0, atol=1e-6)


def test_iou_differentiable_fast_matches_reference():
    import torch
    from torchdrivesim import _iou_utils as R
    box1, box2 = _overlapping_pairs(6)
    ref = R.iou_differentiable_fast(torch.tensor(box1), torch.tensor(box2))
    ours = U.iou_differentiable_fast(jnp.asarray(box1), jnp.asarray(box2))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               atol=1e-3, rtol=1e-3)


def test_iou_gradients_match_reference():
    import torch
    from torchdrivesim import _iou_utils as R
    import jax
    box1, box2 = _overlapping_pairs(7, b=1, n=8)

    t1 = torch.tensor(box1, requires_grad=True)
    t2 = torch.tensor(box2)
    R.iou_differentiable_fast(t1, t2).sum().backward()
    ref_grad = t1.grad.numpy()

    our_grad = jax.grad(
        lambda b: jnp.sum(U.iou_differentiable_fast(b, jnp.asarray(box2))))(
            jnp.asarray(box1))
    np.testing.assert_allclose(np.asarray(our_grad), ref_grad,
                               atol=5e-2, rtol=5e-2)


def test_sort_indices_is_jittable():
    import jax
    box1, box2 = _overlapping_pairs(8, b=2, n=4)
    c1 = U.box2corners_th(jnp.asarray(box1))
    c2 = U.box2corners_th(jnp.asarray(box2))
    area_jit, _ = jax.jit(U.oriented_box_intersection_2d)(c1, c2)
    area_eager, _ = U.oriented_box_intersection_2d(c1, c2)
    # ordering of near-coincident vertices can differ between eager and
    # jitted argsort under fusion; area differences stay at the epsilon of
    # the duplicated vertices
    np.testing.assert_allclose(np.asarray(area_jit), np.asarray(area_eager),
                               rtol=2e-2, atol=1e-2)
