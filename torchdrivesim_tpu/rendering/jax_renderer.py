"""
The XLA rasterizer backend: renders RGB meshes (and optionally composites
them over a baked background texture) fully on-device.

This single backend replaces the reference's pytorch3d / nvdiffrast / cv2
renderers (`torchdrivesim/rendering/{pytorch3d,nvdiffrast,cv2}.py`). Output
follows the reference's visual convention: camera forward points up in the
image, lower rendering level on top, colors in [0, 255].
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from torchdrivesim_tpu.mesh import RGBMesh
from torchdrivesim_tpu.ops.grids import Grid2D
from torchdrivesim_tpu.ops.rasterize import (
    camera_rows_cols, rasterize_hard, rasterize_soft, sample_background,
)
from torchdrivesim_tpu.rendering.base import (
    BirdviewRenderer, Cameras, JaxRendererConfig, Resolution,
)


class JaxRenderer(BirdviewRenderer):
    """
    Rasterizes a full RGB mesh per frame. If :attr:`background_texture` is
    set (see ``bake_background_texture``), callers can render only dynamic
    faces and composite them over the sampled texture -- the fast path used
    by the simulator.
    """
    def __init__(self, cfg: JaxRendererConfig, *args,
                 background_texture: Optional[Grid2D] = None, **kwargs):
        super().__init__(cfg, *args, **kwargs)
        self.cfg: JaxRendererConfig = cfg
        self.background_texture = background_texture

    def copy(self):
        other = super().copy()
        other.background_texture = self.background_texture
        return other

    def render_rgb_mesh(self, mesh: RGBMesh, res: Resolution, cameras: Cameras,
                        background_texture: Optional[Grid2D] = None) -> jnp.ndarray:
        assert res.width == res.height, "only square resolutions are supported"
        size = res.width
        cam_xy = cameras.xy
        cam_sc = cameras.sc
        scale = cameras.scale
        bg_color = jnp.asarray(self.get_color('background'), jnp.float32) / 255.0
        texture = background_texture if background_texture is not None \
            else self.background_texture
        if texture is not None:
            background = sample_background(
                texture, cam_xy, cam_sc, scale, size, bg_color,
                left_handed=self.cfg.left_handed_coordinates)
        else:
            background = jnp.broadcast_to(
                bg_color, (cam_xy.shape[0], size, size, 3))

        # screen-space vertices: (row, col) + priority z
        rc = camera_rows_cols(mesh.verts[..., :2], cam_xy, cam_sc, scale, size,
                              left_handed=self.cfg.left_handed_coordinates)
        sv = jnp.concatenate([rc, mesh.verts[..., 2:3]], axis=-1)
        if self.cfg.differentiable:
            image = rasterize_soft(sv, mesh.faces, mesh.attrs, size, background,
                                   sigma=self.cfg.soft_sigma)
        else:
            image = rasterize_hard(sv, mesh.faces, mesh.attrs, size, background,
                                   face_chunk=self.cfg.face_chunk)
        return image * 255.0
