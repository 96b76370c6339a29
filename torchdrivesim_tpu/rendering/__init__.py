"""
Renderer registry and factory (mirrors `torchdrivesim/rendering/__init__.py`):
the config subclass (or its ``backend`` string) selects the implementation.
"""
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
            lifted.differentiable = str(blend) == 'soft'
        cfg = lifted
    return renderer_cls(cfg, **kwargs)


__all__ = [
    'BirdviewRenderer', 'Cameras', 'CV2RendererConfig', 'DummyRenderer',
    'DummyRendererConfig', 'JaxRenderer', 'JaxRendererConfig',
    'NvdiffrastRendererConfig', 'Pytorch3DRendererConfig', 'RendererConfig',
    'get_default_color_map', 'get_default_rendering_levels',
    'renderer_from_config',
]
