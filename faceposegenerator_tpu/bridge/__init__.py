from .torch_weights import (
    load_safetensors,
    convert_unet_state_dict,
    convert_vae_state_dict,
    convert_clip_text_state_dict,
    convert_iresnet_state_dict,
    load_sd21_params,
)
