"""
Renderer registry and factory (mirrors `torchdrivesim/rendering/__init__.py`):
the config subclass (or its ``backend`` string) selects the implementation.
"""
from typing import Optional, Union

from torchdrivesim_tpu.rendering.base import (
    BirdviewRenderer, Cameras, DummyRenderer, DummyRendererConfig,
    JaxRendererConfig, RendererConfig, get_default_color_map,
    get_default_rendering_levels,
)
from torchdrivesim_tpu.rendering.jax_renderer import JaxRenderer

_BACKENDS = {
    'default': (JaxRendererConfig, JaxRenderer),
    'jax': (JaxRendererConfig, JaxRenderer),
    'dummy': (DummyRendererConfig, DummyRenderer),
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
        cfg = cfg_cls(**common)
    return renderer_cls(cfg, **kwargs)


__all__ = [
    'BirdviewRenderer', 'Cameras', 'DummyRenderer', 'DummyRendererConfig',
    'JaxRenderer', 'JaxRendererConfig', 'RendererConfig',
    'get_default_color_map', 'get_default_rendering_levels',
    'renderer_from_config',
]
