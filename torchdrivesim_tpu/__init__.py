"""
torchdrivesim_tpu: a TPU-native, fully differentiable 2D driving simulator.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`inverted-ai/torchdrivesim` (reference: /root/reference). The simulation state
is an immutable PyTree, every step/observe/infraction computation is a pure
jittable function, full rollouts compile under ``jax.lax.scan``, and the
bird's-eye-view renderer is a TPU rasterizer (baked background texture +
fused dynamic-triangle rasterization) instead of OpenCV/pytorch3d/nvdiffrast.

Resource lookup mirrors the reference (`torchdrivesim/__init__.py:5-9`):
map folders are searched in ``TDS_RESOURCE_PATH`` directories first, then in
the bundled ``resources/maps``.
"""
import os

__version__ = "0.1.0"

# Reliable backend override: site-customized accelerator plugins can ignore
# JAX_PLATFORMS, but jax.config always wins. TDS_PLATFORM=cpu forces CPU
# (used by example smoke tests and CPU-only CI).
if os.environ.get('TDS_PLATFORM'):
    import jax as _jax
    _jax.config.update('jax_platforms', os.environ['TDS_PLATFORM'])

def assert_pytorch3d_available():
    """
    Reference-API shim (`torchdrivesim/__init__.py:12-16`): the reference
    raises when its pytorch3d rasterizer is missing. Here the XLA rasterizer
    is always available, so this never raises; kept so code written against
    the reference imports and runs unchanged.
    """


if 'TDS_RESOURCE_PATH' in os.environ:
    _resource_path = [p for p in os.environ['TDS_RESOURCE_PATH'].split(':') if p]
else:
    _resource_path = []
_resource_path += [os.path.join(x, 'resources/maps') for x in __path__]
