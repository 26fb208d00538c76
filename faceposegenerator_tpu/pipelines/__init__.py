from .txt2img import StableDiffusionPipeline
