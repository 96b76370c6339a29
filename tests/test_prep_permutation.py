"""
The permutation-matmul operand prep (``ops.rasterize.prep_sorted_prim_coefs``)
must be equivalent to the lax.sort path (``sort_prims_rowmajor_with_masks``
followed by the fused kernel's ``_prep_prims``):

* band-chunk occupancy masks: bit-identical;
* packed rank|RGB values: bit-identical for every live prim (the matmul
  path sentinels off-screen-but-valid prims the sort path keeps; those can
  never win an on-screen pixel);
* coefficient tensors: bit-identical for every live prim;
* rendered pixels through the fused kernel (interpret mode): bit-identical.

The one-hot matmul permutes payloads at the BIT level (bitcast to uint32,
split into four bf16-exact byte planes, one default-precision dot,
reassemble -- ``_permute_rows``) so 32-bit payloads survive the MXU pass
exactly; these tests would catch a precision regression.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchdrivesim_tpu.ops.pallas_rasterize import _prep_prims
from torchdrivesim_tpu.ops.rasterize import (
    prep_sorted_prim_coefs, sort_prims_rowmajor_with_masks)

from torchdrivesim_tpu.ops.pallas_rasterize import band_rows

SENT = 0x7FFFFFFF
RES, CAP, CHUNK = 128, 56, 8
N_BANDS = RES // band_rows(RES)   # tile-size dependent (TDS_PIXELS_PER_TILE)


def _scene(seed, b, q, t, degenerate=False, ties=True):
    rng = np.random.RandomState(seed)
    quads = jnp.asarray(rng.uniform(-40, 170, (b, q, 4, 2)).astype(np.float32))
    if q:
        # real parallelograms: c2 = c1 + c3 - c0
        quads = quads.at[:, :, 2].set(
            quads[:, :, 1] + quads[:, :, 3] - quads[:, :, 0])
    if degenerate and q > 2:
        quads = quads.at[:, 1].set(quads[:, 1, 0:1])
    z = lambda n: (np.round(rng.uniform(0, 3, (b, n)))
                   if ties else rng.uniform(0, 3, (b, n))).astype(np.float32)
    tris = jnp.asarray(rng.uniform(-40, 170, (b, t, 3, 2)).astype(np.float32))
    return (quads, jnp.asarray(z(q)), jnp.asarray(rng.rand(b, q, 3).astype(np.float32)),
            tris, jnp.asarray(z(t)), jnp.asarray(rng.rand(b, t, 3).astype(np.float32)))


def _both(scene, chunk=CHUNK):
    quads, qz, qcol, tris, tz, tcol = scene
    prep = prep_sorted_prim_coefs(quads, qz, qcol, tris, tz, tcol,
                                  RES, CAP, N_BANDS, chunk)
    assert prep is not None
    sq_s, qz_s, qcol_s, qmask_o = sort_prims_rowmajor_with_masks(
        quads, qz, qcol, RES, CAP, N_BANDS, chunk)
    st_s, tz_s, tcol_s, tmask_o = sort_prims_rowmajor_with_masks(
        tris, tz, tcol, RES, CAP, N_BANDS, chunk)
    old = _prep_prims(sq_s, qz_s, qcol_s, st_s, tz_s, tcol_s)
    return prep, old + (qmask_o, tmask_o)


@pytest.mark.parametrize('q,t,degenerate', [
    (44, 24, True), (1, 24, False), (0, 8, False), (13, 0, False),
    (44, 3, True)])
def test_operand_equivalence(q, t, degenerate):
    prep, old = _both(_scene(q * 31 + t, 3, q, t, degenerate=degenerate))
    qcoef_n, qpk_n, qmask_n, tcoef_n, tpk_n, tmask_n = prep
    qcoef_o, qpk_o, tcoef_o, tpk_o, qmask_o, tmask_o = old
    np.testing.assert_array_equal(np.asarray(qmask_n), np.asarray(qmask_o))
    np.testing.assert_array_equal(np.asarray(tmask_n), np.asarray(tmask_o))
    for new, old_pk in [(qpk_n, qpk_o), (tpk_n, tpk_o)]:
        new, old_pk = np.asarray(new)[..., 0], np.asarray(old_pk)[..., 0]
        live = new != SENT
        np.testing.assert_array_equal(new[live], old_pk[live])
    for new, old_cf, pk in [(qcoef_n, qcoef_o, qpk_n),
                            (tcoef_n, tcoef_o, tpk_n)]:
        new, old_cf = np.asarray(new), np.asarray(old_cf)
        live = np.asarray(pk)[..., 0] != SENT
        m = np.broadcast_to(live[:, None, :, None], new.shape)
        np.testing.assert_array_equal(new[m], old_cf[m])


@pytest.mark.parametrize('chunk,q,t', [
    (16, 17, 20),   # qp=24: floor(24/16)=1 chunk used to drop prims 16..23
    (16, 24, 9),    # qp=24 exactly on the old failing boundary
    (4, 13, 6),     # chunk < 8 with non-multiple prim counts
])
def test_operand_equivalence_nondefault_chunk(chunk, q, t):
    """Regression: chunk counts must use CEIL division -- with chunk=16 and
    a 8-padded prim count of 24, floor division produced a 1-chunk mask
    that silently skipped prims ranked >= 16 in the fused kernel."""
    prep, old = _both(_scene(q * 7 + t + chunk, 3, q, t), chunk=chunk)
    qcoef_n, qpk_n, qmask_n, tcoef_n, tpk_n, tmask_n = prep
    qcoef_o, qpk_o, tcoef_o, tpk_o, qmask_o, tmask_o = old
    np.testing.assert_array_equal(np.asarray(qmask_n), np.asarray(qmask_o))
    np.testing.assert_array_equal(np.asarray(tmask_n), np.asarray(tmask_o))
    # every live prim must be covered by a mask column (the old bug left
    # high-ranked prims with no column => never rendered)
    for pk, mask in [(qpk_n, qmask_n), (tpk_n, tmask_n)]:
        live_rows = np.asarray(pk)[..., 0] != SENT           # (B, P)
        n_cols = np.asarray(mask).shape[-1]
        assert n_cols * chunk >= live_rows.sum(axis=1).max()
    for new, old_pk in [(qpk_n, qpk_o), (tpk_n, tpk_o)]:
        new, old_pk = np.asarray(new)[..., 0], np.asarray(old_pk)[..., 0]
        live = new != SENT
        np.testing.assert_array_equal(new[live], old_pk[live])


def test_over_cap_returns_none():
    scene = _scene(7, 2, CAP + 4, 8)
    assert prep_sorted_prim_coefs(*scene, RES, CAP, N_BANDS, CHUNK) is None


def test_fused_pixels_bit_identical(monkeypatch):
    """Interpret-mode fused kernel: new prep vs sorted-corner path."""
    import functools

    import torchdrivesim_tpu.ops.pallas_fused as PF
    import torchdrivesim_tpu.ops.pallas_warp as PW
    from torchdrivesim_tpu.ops.grids import Grid2D

    for mod in (PF, PW):
        monkeypatch.setattr(mod.pl, 'pallas_call', functools.partial(
            mod.pl.pallas_call, interpret=True))

    b = 4
    scene = _scene(11, b, 20, 12, degenerate=True)
    quads, qz, qcol, tris, tz, tcol = scene
    rng = np.random.RandomState(3)
    mip = Grid2D(
        data=jnp.asarray((rng.randint(0, 2 ** 24, (256, 256, 1))
                          ).astype(np.int32)),
        origin=np.asarray([-60.0, -60.0], np.float32),
        cell_size=np.float32(2.0 / 70 * PW.MIP_FACTOR * 128 / 128))
    cam_xy = jnp.asarray(rng.uniform(-5, 5, (b, 2)).astype(np.float32))
    th = rng.uniform(0, 6.28, b).astype(np.float32)
    cam_sc = jnp.stack([jnp.asarray(np.sin(th)), jnp.asarray(np.cos(th))], -1)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    scale = 2.0 / 70

    # screen-space prims (the renderer transforms before prep; here the
    # synthetic corners are already screen coords)
    prep = prep_sorted_prim_coefs(quads, qz, qcol, tris, tz, tcol,
                                  RES, CAP, N_BANDS, CHUNK)
    qcoef, qpk, qmask, tcoef, tpk, tmask = prep
    img_new = PF.render_coefs_fused_pallas(
        mip, cam_xy, cam_sc, scale, bg, qcoef, qpk, tcoef, tpk,
        qmask, tmask)

    sq_s, qz_s, qcol_s, qmask_o = sort_prims_rowmajor_with_masks(
        quads, qz, qcol, RES, CAP, N_BANDS, CHUNK)
    st_s, tz_s, tcol_s, tmask_o = sort_prims_rowmajor_with_masks(
        tris, tz, tcol, RES, CAP, N_BANDS, CHUNK)
    img_old = PF.render_prims_fused_pallas(
        mip, cam_xy, cam_sc, scale, bg, sq_s, qz_s, qcol_s,
        st_s, tz_s, tcol_s, qmask_o, tmask_o)
    np.testing.assert_array_equal(np.asarray(img_new), np.asarray(img_old))
    assert float(jnp.max(img_new)) > 0
