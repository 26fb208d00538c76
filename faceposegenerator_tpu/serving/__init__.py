"""TPU-native serving: fixed-shape request batching + LoRA hot-swap."""

from .engine import GenerationRequest, GenerationResult, QueueFull, SamplerServer
from .rolling import RollingServer

__all__ = [
    "GenerationRequest", "GenerationResult", "QueueFull", "SamplerServer",
    "RollingServer",
]
