"""NPC behavior: replay from logs, heuristic placement, IAI API bridge."""
from torchdrivesim_tpu.behavior.common import InitializationFailedError

__all__ = ['InitializationFailedError']
