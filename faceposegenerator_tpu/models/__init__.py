from . import clip_text, unet2d, vae, iresnet, mtcnn
