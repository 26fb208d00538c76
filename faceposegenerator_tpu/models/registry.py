"""Backbone registry: name → (init, apply, cfg).

Behavioral rebuild of `get_model` (`ArcFace_files/backbones/__init__.py:5-85`):
r18/r34/r50/r100/r200/r2060, mbf (MobileFaceNet), vit_t/s/b/l (Face ViT).
Every entry exposes the same functional surface:
    init(key)                     -> (params, state)
    apply(params, state, images)  -> (B, num_features) fp32 embeddings
"""

from __future__ import annotations

from typing import Callable, Tuple

from . import iresnet, mobilefacenet, vit_face


def get_model(name: str, num_features: int = 512, **kw) -> Tuple[Callable, Callable, object]:
    name = name.lower()
    if name in iresnet.DEPTHS:
        cfg = iresnet.IResNetConfig(
            depths=iresnet.DEPTHS[name], num_features=num_features,
            remat=(name == "r2060") or kw.pop("remat", False), **kw,
        )

        def init(key):
            return iresnet.init(key, cfg)

        def apply(params, state, images, **akw):
            out = iresnet.apply(params, state, images, cfg, **akw)
            return out[0] if isinstance(out, tuple) else out

        return init, apply, cfg

    if name == "mbf":
        cfg = mobilefacenet.MBFConfig(num_features=num_features, **kw)

        def init(key):
            return mobilefacenet.init(key, cfg)

        def apply(params, state, images, **akw):
            return mobilefacenet.apply(params, state, images, cfg, **akw)

        return init, apply, cfg

    if name in vit_face.VIT_CONFIGS:
        base = vit_face.VIT_CONFIGS[name]
        import dataclasses

        cfg = dataclasses.replace(base, num_features=num_features, **kw)

        def init(key):
            return vit_face.init(key, cfg)

        def apply(params, state, images, **akw):
            return vit_face.apply(params, state, images, cfg, **akw)

        return init, apply, cfg

    raise ValueError(f"unknown backbone {name!r}")
