"""Neural policy models trained through the simulator (IL / RL examples)."""
from torchdrivesim_tpu.models.policy import ActorCritic, BirdviewCNNPolicy

__all__ = ['ActorCritic', 'BirdviewCNNPolicy']
