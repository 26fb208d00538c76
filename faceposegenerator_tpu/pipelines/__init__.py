from .presets import PRESETS, Preset, get_preset
from .txt2img import StableDiffusionPipeline
