"""
The XLA/Pallas rasterizer backend: renders RGB meshes (and optionally
composites them over a baked background texture) fully on-device.

This single backend replaces the reference's pytorch3d / nvdiffrast / cv2
renderers (`torchdrivesim/rendering/{pytorch3d,nvdiffrast,cv2}.py`). Output
follows the reference's visual convention: camera forward points up in the
image, lower rendering level on top, colors in [0, 255].

Two compute paths:
* the MXU Pallas kernel (`ops/pallas_rasterize.py`) -- default on TPU for
  hard rendering of culled dynamic faces over a baked background;
* the XLA rasterizer (`ops/rasterize.py`) -- full-mesh renders, soft
  (differentiable) mode, and non-TPU backends.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)
_warned_fallback_res = set()
_warned_shard_batch = set()


def _warn_prep_fallback(n_prims: int, cap: int) -> None:
    """One-time notice that the permutation-matmul operand prep declined a
    scene (>127 prims or per-type over ``cap``) and the renderer is paying
    the multi-operand sort path's layout-copy tax (~0.2 ms/step at batch
    256). Mirrors the res-fallback warning convention."""
    key = ('prep', n_prims)
    if key not in _warned_fallback_res:
        _warned_fallback_res.add(key)
        logger.warning(
            'permutation-prep fallback: %d prims exceed the one-hot '
            'permute budget (127, or per-type cap %d); using the '
            'multi-operand sort path (~0.2 ms/step layout-copy tax at '
            'batch 256)', n_prims, cap)

from torchdrivesim_tpu.mesh import RGBMesh
from torchdrivesim_tpu.ops.grids import Grid2D
from torchdrivesim_tpu.ops.rasterize import (
    _face_arrays, camera_rows_cols, cull_faces_to_view, cull_prims_to_view,
    rasterize_hard, rasterize_soft, sample_background,
    sample_background_packed,
)
from torchdrivesim_tpu.rendering.base import (
    BirdviewRenderer, Cameras, JaxRendererConfig, Resolution,
)


def _on_tpu() -> bool:
    backend = jax.default_backend()
    return backend in ('tpu', 'axon')


def pack_rgb8_chw(image: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, H, W) float [0, 255] -> (B, H, W) int32 0x00BBGGRR."""
    q = jnp.clip(jnp.round(image), 0, 255).astype(jnp.int32)
    return q[:, 0] | (q[:, 1] << 8) | (q[:, 2] << 16)


def unpack_rgb8_chw(packed: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) int32 0x00BBGGRR -> (B, 3, H, W) float [0, 255].

    Cheap on purpose: when the consumer is a reduction or an elementwise op,
    XLA fuses the decode so the float image never touches HBM."""
    return jnp.stack([packed & 255, (packed >> 8) & 255,
                      (packed >> 16) & 255], axis=1).astype(jnp.float32)


def image_checksum(image: jnp.ndarray) -> jnp.ndarray:
    """Scalar checksum of a rendered image in either output format:
    float channels, or packed RGB8 int32 (decoded lazily -- XLA fuses the
    unpack into the reduction, so the float image never touches HBM)."""
    if image.dtype == jnp.int32:
        return jnp.sum(unpack_rgb8_chw(image))
    return jnp.sum(image)


def _expand_subcameras(sq, st, qz, qcol, tz, tcol, cam_xy, cam_sc,
                       size, sub, scale, left_handed, n=2):
    """
    n x n sub-camera decomposition for resolutions above the 128-px warp
    window: tile (i, j) of a ``size``-px view is itself a ``sub``-px
    view (``sub = size // n``) at the SAME pixels-per-meter, centered on
    the tile's world center. Prim screen coordinates shift by the
    tile origin in pixel space; camera centers shift by the rotated
    pixel offset in world space (the exact inverse of the screen transform
    in ``ops.pallas_warp.warp_coefficients``: pixel (r, c) maps to
    ``cam + R(psi) @ (forward, left)`` with ``forward = (size/2 - r)/ppm``,
    ``left = lh * (size/2 - c)/ppm``), so each tile renders the
    identical scene content.

    Returns the per-sub-view arrays with the tile index FASTEST in the
    leading dim (row-major: (i, j) -> n*i + j), so fused camera programs
    render whole images.
    """
    bl = qz.shape[0]
    nt = n * n
    ppm = scale * size / 2.0                 # output pixels per meter
    offs = np.asarray([[i * sub, j * sub] for i in range(n)
                       for j in range(n)], np.float32)          # (nt, 2)
    sq_sub = (sq[:, None] - offs[None, :, None, None, :]).reshape(
        (bl * nt,) + sq.shape[1:])
    st_sub = (st[:, None] - offs[None, :, None, None, :]).reshape(
        (bl * nt,) + st.shape[1:])
    rep = lambda a: jnp.repeat(a, nt, axis=0)
    lh = -1.0 if left_handed else 1.0
    # tile center pixel = offs + sub/2; its (forward, left) offset from
    # the full-view center (pixel size/2), rotated into world coordinates
    off_f = (size / 2.0 - offs[:, 0] - sub / 2.0) / ppm          # (nt,)
    off_l = lh * (size / 2.0 - offs[:, 1] - sub / 2.0) / ppm
    sin, cos = cam_sc[:, 0:1], cam_sc[:, 1:2]                    # (bl, 1)
    cx = cam_xy[:, 0:1] + cos * off_f[None] - sin * off_l[None]  # (bl, nt)
    cy = cam_xy[:, 1:2] + sin * off_f[None] + cos * off_l[None]
    cam_xy_sub = jnp.stack([cx, cy], axis=-1).reshape(bl * nt, 2)
    return (sq_sub, st_sub, rep(qz), rep(qcol), rep(tz), rep(tcol),
            cam_xy_sub, rep(cam_sc))


def _assemble_quadrants(image, size, n=2):
    """Stitch n x n tile renders (tile fastest in the leading dim,
    row-major) back into full frames; float (B*n^2, 3, s, s) or packed
    (B*n^2, s, s) int32 input."""
    s = size // n
    bl = image.shape[0] // (n * n)
    if image.ndim == 3:
        return image.reshape(bl, n, n, s, s).transpose(
            0, 1, 3, 2, 4).reshape(bl, size, size)
    return image.reshape(bl, n, n, 3, s, s).transpose(
        0, 3, 1, 4, 2, 5).reshape(bl, 3, size, size)


def _pad_camera_shift(cam_xy, cam_sc, size, size_pad, ppm, left_handed):
    """Camera centers for the pad-to-supported-res-and-crop path: the
    returned centers make the TOP-LEFT ``size`` x ``size`` crop of a
    ``size_pad``-px render (at the same pixels-per-meter) show exactly the
    requested view. Same screen-transform inverse as
    :func:`_expand_subcameras` with tile offset (0, 0)."""
    lh = -1.0 if left_handed else 1.0
    d = (size_pad - size) / 2.0 / ppm
    sin, cos = cam_sc[:, 0], cam_sc[:, 1]
    cx = cam_xy[:, 0] - (cos * d - sin * lh * d)
    cy = cam_xy[:, 1] - (sin * d + cos * lh * d)
    return jnp.stack([cx, cy], axis=-1)


class JaxRenderer(BirdviewRenderer):
    """
    Rasterizes RGB meshes per frame. If :attr:`background_texture` is set,
    only dynamic faces need to be in the mesh; they are composited over the
    sampled texture -- the fast path used by the simulator.
    """
    def __init__(self, cfg: JaxRendererConfig, *args,
                 background_texture: Optional[Grid2D] = None, **kwargs):
        super().__init__(cfg, *args, **kwargs)
        self.cfg: JaxRendererConfig = cfg
        self._background_texture = None
        self._packed_texture = None
        self.background_texture = background_texture
        #: optional ``jax.sharding.Mesh``: when set, the Pallas fast paths
        #: run under ``jax.shard_map`` over the mesh's first axis so each
        #: device rasterizes only its local batch shard. Required for true
        #: partitioning: under plain jit XLA treats ``pallas_call`` as an
        #: opaque custom call and REPLICATES it (all-gathers the inputs and
        #: renders the full batch on every device). See docs/design.md.
        self.shard_mesh = None

    @property
    def background_texture(self) -> Optional[Grid2D]:
        return self._background_texture

    @background_texture.setter
    def background_texture(self, texture: Optional[Grid2D]):
        from torchdrivesim_tpu.ops.rasterize import (
            pack_texture_rgb8, pack_texture_rgb8_quad)
        self._background_texture = texture
        self._packed_texture = pack_texture_rgb8(texture) \
            if texture is not None else None
        self._quad_texture = pack_texture_rgb8_quad(texture) \
            if texture is not None else None
        self._mip_pyramid = None
        if texture is not None and _on_tpu():
            from torchdrivesim_tpu.ops.pallas_warp import build_mip_pyramid
            self._mip_pyramid = build_mip_pyramid(texture)

    def copy(self):
        other = super().copy()
        other._background_texture = self._background_texture
        other._packed_texture = self._packed_texture
        other._quad_texture = getattr(self, '_quad_texture', None)
        other._mip_pyramid = getattr(self, '_mip_pyramid', None)
        other.shard_mesh = getattr(self, 'shard_mesh', None)
        return other

    def _shard_wrap(self, fn, batch: int):
        """Wrap a batch-parallel render function in ``jax.shard_map`` over
        :attr:`shard_mesh`'s first axis (identity when no mesh is set).

        Every argument and the output must carry the batch on dim 0. XLA
        cannot partition ``pallas_call`` on its own -- under plain jit the
        SPMD partitioner replicates it (all-gather + full-batch render per
        device) -- so this wrapper is what makes the fast path actually
        scale across chips."""
        mesh = getattr(self, 'shard_mesh', None)
        if mesh is None:
            return fn
        n = mesh.devices.size
        if batch % n != 0:
            if batch not in _warned_shard_batch:
                _warned_shard_batch.add(batch)
                logger.warning(
                    "render batch %d is not divisible by the %d-device "
                    "shard_mesh; the Pallas render runs replicated "
                    "(all-gathered) on every device instead of partitioned.",
                    batch, n)
            return fn
        from jax.sharding import PartitionSpec
        spec = PartitionSpec(mesh.axis_names[0])
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, and none is needed -- the kernel is per-batch-element
        return jax.shard_map(fn, mesh=mesh, in_specs=spec, out_specs=spec,
                             check_vma=False)

    def _pad_res_target(self, size: int) -> Optional[int]:
        """Padded fast-path resolution for a size the Pallas kernels can't
        tile directly (e.g. 100): render at the next multiple of 16 at the
        SAME pixels-per-meter with the camera shifted so the top-left
        ``size`` x ``size`` crop is exactly the requested view (matching
        `torchdrivesim/rendering/base.py:167-204`, where every square res
        takes a fast backend). Applies in BOTH hard mode (band-tiling
        constraint, `supports_res`) and differentiable mode (soft-kernel
        pixel constraint, `supports_soft`; gradients of a crop are exact,
        and softmax blending is per-pixel so cropped pixels match the
        direct render bit-for-bit). None when the size is already served
        or the fast path is off."""
        from torchdrivesim_tpu.ops.pallas_rasterize import supports_res
        if not self.cfg.use_pallas or not _on_tpu() or size < 4:
            return None
        if self.cfg.differentiable:
            from torchdrivesim_tpu.ops.pallas_soft import supports_soft
            served = supports_soft(0, size)
            ok = lambda r: supports_soft(0, r)
        else:
            served = supports_res(size)
            ok = supports_res
        if served:
            return None
        pad = -(-size // 16) * 16
        return pad if ok(pad) else None

    def _pad_cameras(self, cameras: Cameras, size: int, pad_to: int
                     ) -> Cameras:
        ppm = cameras.scale * size / 2.0
        cam_xy = _pad_camera_shift(cameras.xy, cameras.sc, size, pad_to,
                                   ppm, self.cfg.left_handed_coordinates)
        return Cameras(cam_xy, cameras.sc, cameras.scale * size / pad_to)

    def _use_pallas(self, res: int) -> bool:
        if not self.cfg.use_pallas or self.cfg.differentiable:
            return False
        # the Pallas raster paths tile the image into whole-vector-register
        # pixel bands: resolutions without such a tiling (supports_res; any
        # multiple of 16 has one) take the XLA fallback instead of hitting
        # in-kernel asserts
        from torchdrivesim_tpu.ops.pallas_rasterize import supports_res
        if not supports_res(res):
            if _on_tpu() and res not in _warned_fallback_res:
                _warned_fallback_res.add(res)
                logger.warning(
                    "res=%d is outside the Pallas fast path (needs a "
                    "whole-vreg band tiling; any multiple of 16 works); "
                    "falling back to the XLA rasterizer, which runs at "
                    "gather speed on TPU (~3x slower).", res)
            return False
        return _on_tpu()

    def _warp_mip(self, scale: float, size: int):
        """The mip level for the warp kernels, or None when the warp path
        can't serve this camera (resolution without a whole-vreg band
        tiling, above 128 px -- see :meth:`_tiled_mip` -- or a view too
        wide for the coarsest mip)."""
        from torchdrivesim_tpu.ops.pallas_rasterize import supports_res
        pyramid = getattr(self, '_mip_pyramid', None)
        if pyramid is None or size > 128 or not supports_res(size):
            return None
        from torchdrivesim_tpu.ops.pallas_warp import MIP_FACTOR, select_mip
        fov = 2.0 / scale
        mip = select_mip(pyramid, fov=fov, res=size)
        if mip.cell_size < fov * MIP_FACTOR / size:
            return None   # coarsest level still can't cover the rotated view
        return mip

    def _tiled_mip(self, scale: float, size: int):
        """Mip + sub-view size + tile count for the n x n sub-camera
        decomposition serving resolutions above 128: each tile of the image
        is an independent (size/n)-pixel view at the SAME texels-per-pixel
        (the mip rule ``cell >= fov*MIP_FACTOR/size`` equals the per-tile
        rule ``cell >= sub_fov*MIP_FACTOR/sub_size``), so the
        256-texel-window warp machinery serves it unchanged. n is the
        smallest divisor of ``size`` whose sub-views fit the 128-px window
        (2x2 up to 256, 3x3 to 384, 4x4 to 512, ...). Returns
        (mip, sub_size, n) or None."""
        from torchdrivesim_tpu.ops.pallas_rasterize import supports_res
        pyramid = getattr(self, '_mip_pyramid', None)
        if pyramid is None or size <= 128:
            return None
        n = next((k for k in range(2, size // 16 + 1)
                  if size % k == 0 and size // k <= 128
                  and supports_res(size // k)), None)
        if n is None:
            return None
        from torchdrivesim_tpu.ops.pallas_warp import MIP_FACTOR, select_mip
        fov = 2.0 / scale
        mip = select_mip(pyramid, fov=fov, res=size)
        if mip.cell_size < fov * MIP_FACTOR / size:
            return None
        return mip, size // n, n

    def render_rgb_mesh_chw(self, mesh: RGBMesh, res: Resolution,
                            cameras: Cameras,
                            background_texture: Optional[Grid2D] = None
                            ) -> jnp.ndarray:
        """Produce a channels-first (B, 3, H, W) float image in [0, 255]."""
        assert res.width == res.height, "only square resolutions are supported"
        size = res.width
        pad_to = self._pad_res_target(size) \
            if background_texture is None else None
        if pad_to is not None:
            image = self.render_rgb_mesh_chw(
                mesh, Resolution(pad_to, pad_to),
                self._pad_cameras(cameras, size, pad_to))
            return image[..., :size, :size]
        scale = cameras.scale
        bg_color = jnp.asarray(self.get_color('background'), jnp.float32) / 255.0
        texture = background_texture if background_texture is not None \
            else self.background_texture
        use_pallas = self._use_pallas(size)
        fast_sampling = (texture is not None and not self.cfg.differentiable
                         and self._packed_texture is not None
                         and background_texture is None)
        # differentiable mode: the warp kernel with the finite-difference
        # pose VJP replaces the per-pixel bilinear gather (the gather is
        # the dominant IL training cost -- see warp_background_diff)
        diff_fast = (texture is not None and self.cfg.differentiable
                     and self.cfg.use_pallas and _on_tpu()
                     and self.cfg.diff_fast_background
                     and background_texture is None)
        soft_pallas = False
        if self.cfg.differentiable and self.cfg.soft_blend == 'softmax':
            from torchdrivesim_tpu.ops.pallas_soft import supports_soft
            soft_pallas = (self.cfg.use_pallas and _on_tpu()
                           and supports_soft(mesh.faces.shape[1], size))
            if (self.cfg.use_pallas and _on_tpu() and not soft_pallas
                    and ('soft', size) not in _warned_fallback_res):
                _warned_fallback_res.add(('soft', size))
                logger.warning(
                    "differentiable render (faces=%d, res=%d) is outside "
                    "the Pallas soft-kernel fast path (needs res*res %% 128 "
                    "== 0); falling back to the XLA softmax rasterizer, "
                    "whose autodiff backward runs ~6x the forward on TPU.",
                    mesh.faces.shape[1], size)

        def _render(verts, faces, attrs, cam_xy, cam_sc):
            # runs per batch shard under shard_map when shard_mesh is set;
            # every shape below derives from the LOCAL leading dim
            bl = cam_xy.shape[0]
            # background, in the layout the chosen rasterizer wants
            mip = self._warp_mip(scale, size) \
                if (fast_sampling and use_pallas) or diff_fast else None
            if mip is not None and diff_fast:
                from torchdrivesim_tpu.ops.pallas_warp import (
                    warp_background_diff)
                # the warp output is checkpoint_name'd 'tds_bg_warp' INSIDE
                # its custom_vjp so `utils.il_remat_policy` saves the VJP
                # residual itself (no kernel re-run on the backward sweep)
                background = warp_background_diff(
                    mip, cam_xy, cam_sc, scale, bg_color,
                    left_handed=self.cfg.left_handed_coordinates, res=size)
                # the soft rasterizers take channels-last backgrounds
                background = jnp.transpose(background, (0, 2, 3, 1))
            elif mip is not None:
                from torchdrivesim_tpu.ops.pallas_warp import (
                    warp_background_pallas)
                background = warp_background_pallas(
                    mip, cam_xy, cam_sc, scale, bg_color,
                    left_handed=self.cfg.left_handed_coordinates, res=size)
            elif texture is not None:
                if fast_sampling:
                    background = sample_background_packed(
                        self._packed_texture, cam_xy, cam_sc, scale, size,
                        bg_color,
                        left_handed=self.cfg.left_handed_coordinates,
                        downsample=self.cfg.background_downsample,
                        chw=use_pallas)
                elif (self.cfg.differentiable and background_texture is None
                      and getattr(self, '_quad_texture', None) is not None):
                    # one 4-channel gather per pixel instead of 12 scattered
                    # floats; same bilinear weights, so pose gradients match
                    from torchdrivesim_tpu.ops.rasterize import \
                        sample_background_quad
                    background = sample_background_quad(
                        self._quad_texture, cam_xy, cam_sc, scale, size,
                        bg_color,
                        left_handed=self.cfg.left_handed_coordinates)
                else:
                    background = sample_background(
                        texture, cam_xy, cam_sc, scale, size, bg_color,
                        left_handed=self.cfg.left_handed_coordinates)
                    if use_pallas:
                        background = jnp.transpose(background, (0, 3, 1, 2))
            else:
                shape = (bl, 3, size, size) if use_pallas \
                    else (bl, size, size, 3)
                bg_b = bg_color[None, :, None, None] if use_pallas \
                    else bg_color
                background = jnp.broadcast_to(bg_b, shape)

            rc = camera_rows_cols(verts[..., :2], cam_xy, cam_sc, scale, size,
                                  left_handed=self.cfg.left_handed_coordinates)
            sv = jnp.concatenate([rc, verts[..., 2:3]], axis=-1)
            cull = self.cfg.cull_max_faces if texture is not None else 0

            if self.cfg.differentiable:
                if self.cfg.soft_blend == 'softmax':
                    if soft_pallas:
                        # custom-VJP kernel: backward ~7x faster than XLA's
                        # autodiff of the chunked accumulator (no HBM
                        # residuals)
                        from torchdrivesim_tpu.ops.pallas_soft import (
                            rasterize_softmax_pallas)
                        image = rasterize_softmax_pallas(
                            sv, faces, attrs, size, background,
                            sigma=self.cfg.soft_sigma)
                    else:
                        from torchdrivesim_tpu.ops.rasterize import (
                            rasterize_softmax)
                        image = rasterize_softmax(sv, faces, attrs, size,
                                                  background,
                                                  sigma=self.cfg.soft_sigma)
                else:
                    image = rasterize_soft(sv, faces, attrs, size,
                                           background,
                                           sigma=self.cfg.soft_sigma)
                from jax.ad_checkpoint import checkpoint_name
                # named so remat policies can save the rendered frame (the
                # consumer's -- e.g. a policy CNN's -- VJP needs it, and
                # saving it keeps the soft kernel forward out of the
                # backward pass); 40 steps of (B, 3, 64, 64) is ~30 MB
                image = checkpoint_name(image, 'tds_soft_image')
                return jnp.transpose(image, (0, 3, 1, 2)) * 255.0
            if use_pallas:
                from torchdrivesim_tpu.ops.pallas_rasterize import (
                    rasterize_hard_pallas)
                corners, z, color = _face_arrays(sv, faces, attrs)
                if cull:
                    corners, z, color = cull_faces_to_view(corners, z, color,
                                                           size, cull)
                image = rasterize_hard_pallas(corners, z, color, size,
                                              background)
                return image * 255.0
            image = rasterize_hard(sv, faces, attrs, size, background,
                                   face_chunk=self.cfg.face_chunk,
                                   cull_to=cull)
            return jnp.transpose(image, (0, 3, 1, 2)) * 255.0

        # shard_map whenever a Pallas kernel is on the path (hard raster,
        # warp, diff-fast background, or the soft custom-VJP kernel): XLA
        # replicates opaque pallas_calls under plain jit, and shard_map
        # composes with custom_vjp, so sharded TRAINING partitions too
        # (pinned by tests/test_parallel.py)
        fn = self._shard_wrap(_render, cameras.xy.shape[0]) \
            if (use_pallas or diff_fast or soft_pallas) else _render
        return fn(mesh.verts, mesh.faces, mesh.attrs, cameras.xy, cameras.sc)

    def render_faces_chw(self, corners: jnp.ndarray, z: jnp.ndarray,
                         colors: jnp.ndarray, res: Resolution,
                         cameras: Cameras) -> jnp.ndarray:
        """
        Render a dynamic face set (world-space corners (B, F, 3, 2),
        priorities z (B, F), flat colors (B, F, 3)) composited over the baked
        background -- the gather-free fast path (pairs with
        ``BirdviewRGBMeshGenerator.generate_faces``).

        Returns:
            (B, 3, H, W) float image in [0, 255].
        """
        assert res.width == res.height
        size = res.width
        pad_to = self._pad_res_target(size)
        if pad_to is not None:
            image = self.render_faces_chw(
                corners, z, colors, Resolution(pad_to, pad_to),
                self._pad_cameras(cameras, size, pad_to))
            return image[..., :size, :size]
        b, f = z.shape
        cam_xy, cam_sc, scale = cameras.xy, cameras.sc, cameras.scale
        bg_color = jnp.asarray(self.get_color('background'), jnp.float32) / 255.0
        use_pallas = self._use_pallas(size)
        lh = self.cfg.left_handed_coordinates

        def _render(corners, z, colors, cam_xy, cam_sc):
            bl = z.shape[0]
            mip = self._warp_mip(scale, size) if use_pallas else None
            if mip is not None:
                from torchdrivesim_tpu.ops.pallas_warp import (
                    warp_background_pallas)
                background = warp_background_pallas(
                    mip, cam_xy, cam_sc, scale, bg_color,
                    left_handed=lh, res=size)
            elif self._packed_texture is not None:
                background = sample_background_packed(
                    self._packed_texture, cam_xy, cam_sc, scale, size,
                    bg_color, left_handed=lh,
                    downsample=self.cfg.background_downsample, chw=True)
            else:
                background = jnp.broadcast_to(
                    bg_color[None, :, None, None], (bl, 3, size, size))
            rc = camera_rows_cols(corners.reshape(bl, f * 3, 2), cam_xy,
                                  cam_sc, scale, size, left_handed=lh)
            sc_corners = rc.reshape(bl, f, 3, 2)
            zl, colorsl = z, colors
            if self.cfg.cull_max_faces:
                sc_corners, zl, colorsl = cull_faces_to_view(
                    sc_corners, zl, colorsl, size, self.cfg.cull_max_faces)
            if use_pallas:
                from torchdrivesim_tpu.ops.pallas_rasterize import (
                    rasterize_hard_pallas)
                image = rasterize_hard_pallas(sc_corners, zl, colorsl, size,
                                              background)
            else:
                from torchdrivesim_tpu.ops.rasterize import (
                    rasterize_hard_faces)
                hwc = jnp.transpose(background, (0, 2, 3, 1))
                image = rasterize_hard_faces(sc_corners, zl, colorsl, size,
                                             hwc,
                                             face_chunk=self.cfg.face_chunk)
                image = jnp.transpose(image, (0, 3, 1, 2))
            return image * 255.0

        fn = self._shard_wrap(_render, b) if use_pallas else _render
        return fn(corners, z, colors, cam_xy, cam_sc)

    def render_prims_chw(self, quads: jnp.ndarray, qz: jnp.ndarray,
                         qcolors: jnp.ndarray, tris: jnp.ndarray,
                         tz: jnp.ndarray, tcolors: jnp.ndarray,
                         res: Resolution, cameras: Cameras,
                         packed: bool = False) -> jnp.ndarray:
        """
        Render typed primitives (world-space quads in cycle order + triangles,
        from ``BirdviewRGBMeshGenerator.generate_prims``) over the baked
        background. Quads cost half their triangle pair in the kernel.

        Args:
            packed: return the image as (B, H, W) int32 0x00BBGGRR instead
                of float channels (identical 8-bit color content, a third of
                the HBM traffic; decode with :func:`unpack_rgb8_chw`). On
                the fused TPU path the kernel emits the packed image
                directly; other paths pack the float image.

        Returns:
            (B, 3, H, W) float image in [0, 255], or (B, H, W) int32 when
            ``packed``.
        """
        assert res.width == res.height
        size = res.width
        pad_to = self._pad_res_target(size)
        if pad_to is not None:
            image = self.render_prims_chw(
                quads, qz, qcolors, tris, tz, tcolors,
                Resolution(pad_to, pad_to),
                self._pad_cameras(cameras, size, pad_to), packed=packed)
            return image[..., :size, :size]
        b, q = qz.shape
        t = tz.shape[1]
        cam_xy, cam_sc, scale = cameras.xy, cameras.sc, cameras.scale
        bg_color = jnp.asarray(self.get_color('background'), jnp.float32) / 255.0
        use_pallas = self._use_pallas(size)
        mip = self._warp_mip(scale, size) if use_pallas else None
        tiled = self._tiled_mip(scale, size) if use_pallas else None
        lh = self.cfg.left_handed_coordinates

        if use_pallas:
            def _fast(quads, qz, qcolors, tris, tz, tcolors, cam_xy, cam_sc):
                # one device's batch shard when running under shard_map;
                # every shape below derives from the LOCAL leading dim
                bl = qz.shape[0]
                from torchdrivesim_tpu.ops.pallas_rasterize import (
                    n_bands_for, rasterize_hard_pallas_prims_banded)
                from torchdrivesim_tpu.ops.rasterize import (
                    sort_prims_rowmajor_with_masks)
                sq = camera_rows_cols(
                    quads.reshape(bl, q * 4, 2), cam_xy, cam_sc, scale, size,
                    left_handed=lh).reshape(bl, q, 4, 2)
                st = camera_rows_cols(
                    tris.reshape(bl, max(t, 1) * 3, 2)
                    if t else jnp.zeros((bl, 3, 2)),
                    cam_xy, cam_sc, scale, size,
                    left_handed=lh).reshape(bl, max(t, 1), 3, 2)
                if t == 0:
                    st = st[:, :0]
                if tiled is not None:
                    # res > 128: render n*n independent (size/n)-px
                    # tile views through the same fused kernel (prim
                    # coords shift in pixel space; sub-cameras recenter in
                    # world space), then stitch -- each tile gets its
                    # own prim budget and band masks
                    mip_k, size_k, n_tile = tiled
                    (sq, st, qz_l, qcol_l, tz_l, tcol_l, cam_xy_l,
                     cam_sc_l) = _expand_subcameras(
                        sq, st, qz, qcolors, tz, tcolors, cam_xy, cam_sc,
                        size, size_k, scale, lh, n=n_tile)
                    scale_k = scale * size / size_k
                else:
                    mip_k, size_k, scale_k = mip, size, scale
                    qz_l, qcol_l, tz_l, tcol_l = qz, qcolors, tz, tcolors
                    cam_xy_l, cam_sc_l = cam_xy, cam_sc
                # band masking: prims sort row-major (visible first,
                # gather-free lax.sort) and each kernel row-band skips
                # whole 8-prim chunks that cannot touch it -- per-pixel work
                # tracks LOCAL density (typically a handful of prims)
                # instead of the camera budget; the screen stats ride
                # through the sort so the masks need no second pass over
                # the corner tensor
                n_bands = n_bands_for(size_k)
                cap = min(max(8, self.cfg.band_budget), 56)
                if mip_k is not None:
                    # fused kernel: warp + rasterize + composite in one
                    # program, no background HBM round trip (bit-exact vs
                    # the split path). Operand prep defaults by LOCAL
                    # batch size: the permutation-matmul prep (no
                    # multi-operand sort, no stack/unstack layout copies)
                    # wins below ~512 cameras (headline B=256: 293k vs
                    # 253k) but its O(B N^2) rank + byte-plane matmuls
                    # lose to the sort at B=1024 (RL config: 388k vs
                    # 441k). TDS_PREP=permute|sort overrides for A/B.
                    from torchdrivesim_tpu.ops.pallas_fused import (
                        _CHUNK as prim_chunk, render_coefs_fused_pallas,
                        render_prims_fused_pallas)
                    from torchdrivesim_tpu.ops.rasterize import (
                        prep_sorted_prim_coefs)
                    prep = None
                    prep_mode = os.environ.get('TDS_PREP', 'auto')
                    if prep_mode == 'auto':
                        prep_mode = 'permute' if qz_l.shape[0] <= 512 \
                            else 'sort'
                    if prep_mode != 'sort':
                        prep = prep_sorted_prim_coefs(
                            sq, qz_l, qcol_l, st, tz_l, tcol_l, size_k,
                            cap, n_bands, chunk=prim_chunk)
                        if prep is None:
                            _warn_prep_fallback(
                                qz_l.shape[1] + tz_l.shape[1], cap)
                    if prep is not None:
                        qcoef, qpk, qmask, tcoef, tpk, tmask = prep
                        image = render_coefs_fused_pallas(
                            mip_k, cam_xy_l, cam_sc_l, scale_k, bg_color,
                            qcoef, qpk, tcoef, tpk, qmask, tmask,
                            res=size_k, left_handed=lh,
                            packed_output=packed)
                    else:
                        sq_s, qz_s, qcol_s, qmask = \
                            sort_prims_rowmajor_with_masks(
                                sq, qz_l, qcol_l, size_k, cap, n_bands,
                                chunk=prim_chunk)
                        st_s, tz_s, tcol_s, tmask = \
                            sort_prims_rowmajor_with_masks(
                                st, tz_l, tcol_l, size_k, cap, n_bands,
                                chunk=prim_chunk)
                        image = render_prims_fused_pallas(
                            mip_k, cam_xy_l, cam_sc_l, scale_k, bg_color,
                            sq_s, qz_s, qcol_s, st_s, tz_s, tcol_s, qmask,
                            tmask, res=size_k, left_handed=lh,
                            packed_output=packed)
                    if tiled is not None:
                        image = _assemble_quadrants(image, size, n=n_tile)
                    if packed:
                        return image
                else:
                    sq_s, qz_s, qcol_s, qmask = \
                        sort_prims_rowmajor_with_masks(
                            sq, qz_l, qcol_l, size_k, cap, n_bands)
                    st_s, tz_s, tcol_s, tmask = \
                        sort_prims_rowmajor_with_masks(
                            st, tz_l, tcol_l, size_k, cap, n_bands)
                    if self._packed_texture is not None:
                        background = sample_background_packed(
                            self._packed_texture, cam_xy, cam_sc, scale,
                            size, bg_color, left_handed=lh,
                            downsample=self.cfg.background_downsample,
                            chw=True)
                    else:
                        background = jnp.broadcast_to(
                            bg_color[None, :, None, None],
                            (bl, 3, size, size))
                    image = rasterize_hard_pallas_prims_banded(
                        sq_s, qz_s, qcol_s, st_s, tz_s, tcol_s, size,
                        background, qmask, tmask)
                if packed:
                    return pack_rgb8_chw(image * 255.0)
                return image * 255.0

            return self._shard_wrap(_fast, b)(
                quads, qz, qcolors, tris, tz, tcolors, cam_xy, cam_sc)

        if self._packed_texture is not None:
            background = sample_background_packed(
                self._packed_texture, cam_xy, cam_sc, scale, size, bg_color,
                left_handed=lh,
                downsample=self.cfg.background_downsample, chw=True)
        else:
            background = jnp.broadcast_to(
                bg_color[None, :, None, None], (b, 3, size, size))
        sq = camera_rows_cols(quads.reshape(b, q * 4, 2), cam_xy, cam_sc,
                              scale, size, left_handed=lh).reshape(b, q, 4, 2)
        st = camera_rows_cols(tris.reshape(b, max(t, 1) * 3, 2)
                              if t else jnp.zeros((b, 3, 2)),
                              cam_xy, cam_sc, scale, size,
                              left_handed=lh).reshape(b, max(t, 1), 3, 2)
        if t == 0:
            st = st[:, :0]
        # cap each prim type at half the face budget (the cull keeps the
        # view-nearest prims, so only off-screen content is dropped) --
        # and within the packed 7-bit rank space across both types
        keep = min(max(8, (self.cfg.cull_max_faces or 64) // 2), 56)
        sq, qz, qcolors = cull_prims_to_view(sq, qz, qcolors, size, keep)
        st, tz, tcolors = cull_prims_to_view(st, tz, tcolors, size, keep)
        # XLA fallback: expand quads to their two triangles
        from torchdrivesim_tpu.ops.rasterize import rasterize_hard_faces
        t1 = sq[:, :, jnp.asarray([0, 1, 2])]
        t2 = sq[:, :, jnp.asarray([0, 2, 3])]
        corners = jnp.concatenate([t1, t2, st], axis=1)
        z = jnp.concatenate([qz, qz + 1e-5, tz], axis=1)
        colors = jnp.concatenate([qcolors, qcolors, tcolors], axis=1)
        hwc = jnp.transpose(background, (0, 2, 3, 1))
        image = rasterize_hard_faces(corners, z, colors, size, hwc,
                                     face_chunk=self.cfg.face_chunk)
        image = jnp.transpose(image, (0, 3, 1, 2))
        if packed:
            return pack_rgb8_chw(image * 255.0)
        return image * 255.0

    def render_rgb_mesh(self, mesh: RGBMesh, res: Resolution, cameras: Cameras,
                        background_texture: Optional[Grid2D] = None) -> jnp.ndarray:
        """(B, H, W, 3) float image in [0, 255] (ABC-compatible layout)."""
        chw = self.render_rgb_mesh_chw(mesh, res, cameras, background_texture)
        return jnp.transpose(chw, (0, 2, 3, 1))

    def render_frame(self, rgb_mesh: RGBMesh, camera_xy: jnp.ndarray,
                     camera_sc: jnp.ndarray, res: Optional[Resolution] = None,
                     fov: Optional[float] = None) -> jnp.ndarray:
        """Channels-first end to end: skips the HWC round trip of the ABC."""
        scale = (2.0 / fov) if fov is not None else self.scale
        camera_xy = camera_xy.reshape(-1, 2)
        camera_sc = camera_sc.reshape(-1, 2)
        if res is None:
            res = self.res
        return self.render_rgb_mesh_chw(
            rgb_mesh, res, Cameras(camera_xy, camera_sc, scale))
