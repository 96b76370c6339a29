"""
Policy networks that consume BEV images.

Counterparts of the example networks in the reference (the IL CNN at
`examples/imitation_learning.py:192-233` and the RL actor-critic at
`examples/rl_example.py:131-204`), written as flax modules in NCHW->NHWC
convention with bfloat16-friendly conv stacks for the TPU MXU.
"""
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BirdviewCNNPolicy(nn.Module):
    """
    Small CNN mapping a BEV image to a (normalized) action, used for
    imitation learning through the differentiable simulator.

    Inputs are (B, C, H, W) float images in [0, 255] (the simulator's render
    convention); outputs are (B, action_size) actions in [-1, 1].
    """
    action_size: int = 2
    features: Sequence[int] = (32, 64, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(image, (0, 2, 3, 1)) / 255.0  # NCHW -> NHWC, [0,1]
        x = x.astype(self.dtype)
        for feat in self.features:
            x = nn.Conv(feat, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(128, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.action_size, dtype=jnp.float32)(x)
        return jnp.tanh(x)


class ActorCritic(nn.Module):
    """
    Actor-critic for PPO over BEV observations (spec:
    `examples/rl_example.py:131-204`): shared conv torso, Gaussian policy
    head with state-independent log-std, and a value head.
    """
    action_size: int = 2
    features: Sequence[int] = (32, 64, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = jnp.transpose(image, (0, 2, 3, 1)) / 255.0
        x = x.astype(self.dtype)
        for feat in self.features:
            x = nn.Conv(feat, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(256, dtype=self.dtype)(x)
        x = nn.relu(x).astype(jnp.float32)
        mean = jnp.tanh(nn.Dense(self.action_size)(x))
        log_std = self.param('log_std', nn.initializers.constant(-0.5),
                             (self.action_size,))
        value = nn.Dense(1)(x)[..., 0]
        return mean, jnp.broadcast_to(log_std, mean.shape), value
