"""
Renderer registry and factory (mirrors `torchdrivesim/rendering/__init__.py`):
the config subclass (or its ``backend`` string) selects the implementation.
"""
import enum
from typing import Optional, Union

from torchdrivesim_tpu.rendering.base import (
    BirdviewRenderer, Cameras, CV2RendererConfig, DummyRenderer,
    DummyRendererConfig, JaxRendererConfig, NvdiffrastRendererConfig,
    Pytorch3DRendererConfig, RendererConfig, get_default_color_map,
    get_default_rendering_levels,
)
from torchdrivesim_tpu.rendering.jax_renderer import JaxRenderer

_BACKENDS = {
    'default': (JaxRendererConfig, JaxRenderer),
    'jax': (JaxRendererConfig, JaxRenderer),
    'dummy': (DummyRendererConfig, DummyRenderer),
    # migration shims: the reference's backend zoo collapses into the XLA
    # rasterizer (`rendering/{cv2,pytorch3d,nvdiffrast}.py`); their config
    # classes remain accepted so reference configs work unchanged
    'cv2': (JaxRendererConfig, JaxRenderer),
    'pytorch3d': (JaxRendererConfig, JaxRenderer),
    'nvdiffrast': (JaxRendererConfig, JaxRenderer),
}


def renderer_from_config(cfg: Union[RendererConfig, dict],
                         **kwargs) -> BirdviewRenderer:
    """
    Build a renderer from a config object or a plain dict with a ``backend``
    key (semantics of `rendering/__init__.py:18-50`; the pytorch3d / cv2 /
    nvdiffrast backends collapse into the XLA rasterizer here).
    """
    if isinstance(cfg, dict):
        backend = cfg.get('backend', 'default')
        cfg_cls, _ = _BACKENDS.get(backend, _BACKENDS['default'])
        fields = {k: v for k, v in cfg.items() if k in cfg_cls.__dataclass_fields__}
        cfg = cfg_cls(**fields)
    backend = getattr(cfg, 'backend', 'default')
    cfg_cls, renderer_cls = _BACKENDS.get(backend, _BACKENDS['default'])
    if not isinstance(cfg, cfg_cls):
        # lift a base config into the backend's config type
        common = {k: getattr(cfg, k) for k in RendererConfig.__dataclass_fields__
                  if k != 'backend'}
        lifted = cfg_cls(**common)
        # reference pytorch3d configs default to soft (differentiable)
        # blending (`rendering/pytorch3d.py:43`)
        if (isinstance(cfg, Pytorch3DRendererConfig)
                and isinstance(lifted, JaxRendererConfig)):
            blend = getattr(cfg.differentiable_rendering, 'value',
                            cfg.differentiable_rendering)
            lifted.differentiable = str(blend) in ('soft', 'sigmoid')
        cfg = lifted
    return renderer_cls(cfg, **kwargs)


class RenderingBlend(enum.Enum):
    """
    Blend-mode names of the reference's pytorch3d backend
    (`rendering/pytorch3d.py:27-35`). 'hard' maps to hard coverage;
    'soft' and 'sigmoid' both map to the differentiable soft rasterizer.
    """
    hard = 'hard'
    soft = 'soft'
    sigmoid = 'sigmoid'


class Pytorch3DNotFound(ImportError):
    """Kept for except-clause compatibility (`rendering/pytorch3d.py`);
    never raised here — the XLA rasterizer is always available."""


class NvdiffrastNotFound(ImportError):
    """Kept for except-clause compatibility (`rendering/nvdiffrast.py`);
    never raised here — the XLA rasterizer is always available."""


class CV2Renderer(JaxRenderer):
    """Migration shim for the reference's OpenCV renderer class
    (`rendering/cv2.py:18`); renders via the XLA rasterizer."""


class Pytorch3DRenderer(JaxRenderer):
    """Migration shim for the reference's pytorch3d renderer class
    (`rendering/pytorch3d.py:76`); renders via the XLA rasterizer. Pass a
    `JaxRendererConfig(differentiable=True)` (or a `Pytorch3DRendererConfig`
    through `renderer_from_config`) for the soft-blend behavior."""


class NvdiffrastRenderer(JaxRenderer):
    """Migration shim for the reference's nvdiffrast renderer class
    (`rendering/nvdiffrast.py:68`); renders via the XLA rasterizer."""


__all__ = [
    'BirdviewRenderer', 'Cameras', 'CV2Renderer', 'CV2RendererConfig',
    'DummyRenderer', 'DummyRendererConfig', 'JaxRenderer',
    'JaxRendererConfig', 'NvdiffrastNotFound', 'NvdiffrastRenderer',
    'NvdiffrastRendererConfig', 'Pytorch3DNotFound', 'Pytorch3DRenderer',
    'Pytorch3DRendererConfig', 'RendererConfig', 'RenderingBlend',
    'get_default_color_map', 'get_default_rendering_levels',
    'renderer_from_config',
]
