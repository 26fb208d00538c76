"""TPU-native serving: fixed-shape request batching + LoRA hot-swap."""

from .engine import GenerationRequest, GenerationResult, SamplerServer

__all__ = ["GenerationRequest", "GenerationResult", "SamplerServer"]
