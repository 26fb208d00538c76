"""dgm-eval-style quality evaluation: encoders → representations → metrics.

Behavioral rebuild of the vendored layer6ai `dgm-eval` package the reference
drives (`Evaluation/dgm-eval/dgm_eval/__main__.py:17-90,142-231,308-371`):

  python -m faceposegenerator_tpu.evaluation.dgm <real_dir> <gen_dir...> \
      --model arcface --metrics fd kd prdc vendi authpct --nsample 10000

  - encoder registry (`models/load_encoder.py:14-25`): here "pixel"
    (resized raw pixels), "arcface" (IResNet embedder — weightless fallback
    is random-init), and a pluggable callable interface for externally
    provided encoders (DINOv2 etc. need downloaded weights the reference
    pulls from torch.hub — supply via `register_encoder`).
  - representations (`representations.py:14-110`): batched encode of image
    dirs with nsample subsampling (only when the dataset exceeds
    nsample+2000 — reference quirk, `dataloaders.py`), integer-aware
    filename ordering, .npz caching keyed by encoder+dir.
  - per-pair score JSON + aggregate output (`__main__.py:234-281`).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
from typing import Callable, Dict, List, Optional

import numpy as np

from .metrics import (
    authpct,
    ct_score,
    fls,
    frechet_distance,
    frechet_distance_inf,
    kernel_distance,
    prdc,
    sliced_wasserstein,
    vendi_score,
    per_class_vendi,
)

_ENCODERS: Dict[str, Callable[..., Callable]] = {}


def register_encoder(name: str, factory: Callable[..., Callable]):
    """factory(**kw) -> encode_fn((B,H,W,3) uint8 -> (B,D) np.ndarray)."""
    _ENCODERS[name] = factory



def _resize_norm_preprocess(size: int, mean, std, resample: str = "bicubic"):
    """uint8 batch → encoder-input preprocessing (GradCAM image path)."""

    def preprocess(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        rs = Image.BICUBIC if resample == "bicubic" else Image.BILINEAR
        imgs = np.stack(
            [np.asarray(Image.fromarray(b).resize((size, size), rs), np.float32) for b in batch]
        )
        return (imgs / 255.0 - mean) / std

    return preprocess


def _pixel_encoder(size: int = 32, **kw):
    def encode(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        out = []
        for img in batch:
            small = np.asarray(
                Image.fromarray(img).resize((size, size), Image.BILINEAR), np.float32
            )
            out.append(small.reshape(-1) / 255.0)
        return np.stack(out)

    return encode


def _arcface_encoder(weights_path: Optional[str] = None, **kw):
    import jax

    from ..core.precision import DEFAULT_POLICY
    from ..models import iresnet

    cfg = iresnet.config_for("r100")
    if weights_path and os.path.exists(weights_path):
        from ..bridge.torch_weights import convert_iresnet_state_dict, load_torch_pth

        params, state = convert_iresnet_state_dict(load_torch_pth(weights_path), cfg)
    else:
        params, state = iresnet.init(jax.random.key(0), cfg)

    @jax.jit
    def fwd(x):
        e, _ = iresnet.apply(params, state, x, cfg, policy=DEFAULT_POLICY, train=False)
        return e

    def encode(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        imgs = np.stack(
            [
                np.asarray(Image.fromarray(b).resize((112, 112), Image.BILINEAR), np.float32)
                for b in batch
            ]
        )
        x = (imgs / 255.0 - 0.5) / 0.5
        return np.asarray(fwd(x))

    return encode


def _dinov2_encoder(weights_path: Optional[str] = None, arch: str = "vitl14", **kw):
    """The reference's PRIMARY encoder: DINOv2 feeding 224² bicubic-resized,
    imagenet-normalized images; feature = final-LN CLS token
    (`dgm_eval/models/dinov2.py:31-59`). `weights_path` may point to a hub or
    transformers-format checkpoint (.safetensors/.pth/.bin); absent weights
    fall back to random init so the pipeline stays runnable offline."""
    import jax

    from ..core.precision import DEFAULT_POLICY
    from ..models import dinov2

    cfg = {
        "vitl14": dinov2.VITL14_CONFIG,
        "vitb14": dinov2.VITB14_CONFIG,
        "vits14": dinov2.VITS14_CONFIG,
    }[arch]
    if weights_path and os.path.exists(weights_path):
        from ..bridge.torch_weights import (
            convert_dinov2_state_dict,
            load_safetensors,
            load_torch_pth,
        )

        loader = load_safetensors if weights_path.endswith(".safetensors") else load_torch_pth
        params = convert_dinov2_state_dict(loader(weights_path), cfg)
    else:
        params = dinov2.init(jax.random.key(0), cfg)

    @jax.jit
    def fwd(x):
        return dinov2.cls_feature(params, x, cfg, policy=DEFAULT_POLICY)

    imagenet_mean = np.array([0.485, 0.456, 0.406], np.float32)
    imagenet_std = np.array([0.229, 0.224, 0.225], np.float32)

    def encode(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        imgs = np.stack(
            [
                np.asarray(Image.fromarray(b).resize((224, 224), Image.BICUBIC), np.float32)
                for b in batch
            ]
        )
        x = (imgs / 255.0 - imagenet_mean) / imagenet_std
        return np.asarray(fwd(x))

    def preprocess(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        imgs = np.stack(
            [
                np.asarray(Image.fromarray(b).resize((224, 224), Image.BICUBIC), np.float32)
                for b in batch
            ]
        )
        return (imgs / 255.0 - imagenet_mean) / imagenet_std

    # GradCAM support (`--heatmaps`): the tap-capable encode + the uint8 →
    # encoder-input preprocessing, attached for evaluation.heatmaps
    from .heatmaps import make_dinov2_gradcam_encoder

    encode.gradcam_encode = make_dinov2_gradcam_encoder(params, cfg)
    encode.gradcam_preprocess = preprocess
    return encode


register_encoder("pixel", _pixel_encoder)
register_encoder("arcface", _arcface_encoder)
register_encoder("dinov2", _dinov2_encoder)


def _file_order_key(name: str):
    """Integer-aware ordering (`dataloaders.py` get_order quirk)."""
    nums = re.findall(r"\d+", os.path.basename(name))
    return (int(nums[0]) if nums else 0, name)


def list_dataset_images(path: str) -> List[str]:
    out = []
    for root, _, files in os.walk(path):
        for f in files:
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp")):
                out.append(os.path.join(root, f))
    return sorted(out, key=_file_order_key)


def image_labels(paths: List[str], root: str) -> np.ndarray:
    """Class labels from the first-level subdirectory (conditional layout)."""
    labels = []
    for p in paths:
        rel = os.path.relpath(p, root)
        parts = rel.split(os.sep)
        labels.append(parts[0] if len(parts) > 1 else "0")
    uniq = {l: i for i, l in enumerate(sorted(set(labels)))}
    return np.asarray([uniq[l] for l in labels])


def compute_representations(
    path: str,
    encoder: Callable,
    encoder_name: str,
    nsample: int = 10000,
    seed: int = 0,
    batch_size: int = 64,
    cache_dir: Optional[str] = None,
):
    """Returns (reps (N,D), labels (N,)). Subsamples only when the dataset
    exceeds nsample+2000 (reference quirk)."""
    paths = list_dataset_images(path)
    if len(paths) > nsample + 2000:
        rng = np.random.default_rng(seed)
        idx = np.sort(rng.choice(len(paths), nsample, replace=False))
        paths = [paths[i] for i in idx]

    cache_path = None
    if cache_dir:
        digest = hashlib.sha1(
            json.dumps([encoder_name, path, nsample, seed, len(paths)]).encode()
        ).hexdigest()[:16]
        cache_path = os.path.join(cache_dir, f"reps_{encoder_name}_{digest}.npz")
        if os.path.exists(cache_path):
            data = np.load(cache_path, allow_pickle=False)
            return data["reps"], data["labels"]

    from PIL import Image

    reps = []
    for start in range(0, len(paths), batch_size):
        chunk = paths[start : start + batch_size]
        batch = np.stack(
            [np.asarray(Image.open(p).convert("RGB"), np.uint8) for p in chunk]
        )
        reps.append(encoder(batch))
    reps = np.concatenate(reps) if reps else np.zeros((0, 1))
    labels = image_labels(paths, path)

    if cache_path:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(cache_path, reps=reps, labels=labels)
    return reps, labels


def compute_scores(
    metrics: List[str],
    reps_real: np.ndarray,
    reps_gen: np.ndarray,
    labels_gen: Optional[np.ndarray] = None,
    nearest_k: int = 5,
    seed: int = 0,
    reps_test: Optional[np.ndarray] = None,
) -> Dict:
    """Metric dispatch (reference `compute_scores:142-231`). `ct` and `fls`
    need a held-out test set (reference `:198-225`)."""
    scores: Dict = {}
    for m in metrics:
        if m in ("ct", "fls") and reps_test is None:
            continue  # reference also skips these without a test path
        if m == "ct":
            scores.update(ct_score(reps_real, reps_test, reps_gen, seed=seed))
            continue
        if m == "fls":
            scores.update(fls(reps_real, reps_test, reps_gen))
            continue
        if m == "fd":
            scores["fd"] = frechet_distance(reps_real, reps_gen)
        elif m == "fd_infinity":
            scores["fd_infinity"] = frechet_distance_inf(reps_real, reps_gen, seed=seed)
        elif m in ("kd", "kid", "mmd"):
            mean, std = kernel_distance(reps_real, reps_gen, seed=seed)
            scores["kd_value"] = mean
            scores["kd_variance"] = std
        elif m == "prdc":
            # realism only when requested, like the reference
            # (`__main__.py:171-180`) — it is per-sample (aligned with file
            # order), not an aggregate, so it is opt-in
            want_realism = "realism" in metrics
            out = prdc(reps_real, reps_gen, nearest_k=nearest_k, realism=want_realism)
            if want_realism:
                out["realism"] = np.asarray(out["realism"]).tolist()
            scores.update(out)
        elif m == "realism":
            if "prdc" not in metrics:
                raise ValueError("metric 'realism' requires 'prdc'")
        elif m == "vendi":
            scores["vendi"] = vendi_score(reps_gen)
            if labels_gen is not None and len(set(labels_gen.tolist())) > 1:
                scores["per_class_vendi"] = per_class_vendi(reps_gen, labels_gen)["mean_vendi"]
        elif m == "authpct":
            scores["authpct"] = authpct(reps_real, reps_gen)
        elif m == "sw":
            scores["sw_approx"] = sliced_wasserstein(reps_real, reps_gen, seed=seed)
        else:
            raise ValueError(f"unknown metric {m!r}")
    return scores


def _write_gradcam_grid(gen_path, encoder, reps_real, reps_gen, out_png,
                        nsample, seed, count):
    """Reference `--heatmaps` behavior (`__main__.py:358-364` →
    `heatmaps/heatmaps.py visualize_heatmaps`): sample images from the
    generated set, compute leave-one-out FD-sensitivity GradCAMs at the
    encoder's target layer, write one overlay grid PNG."""
    from PIL import Image

    from ..pipelines.sweep import save_image_grid
    from .heatmaps import GradCAM, overlay_heatmap

    paths = list_dataset_images(gen_path)
    if len(paths) > nsample + 2000:  # mirror compute_representations' subsample
        rng = np.random.default_rng(seed)
        idx = np.sort(rng.choice(len(paths), nsample, replace=False))
        paths = [paths[i] for i in idx]
    rnd = np.random.RandomState(seed)
    k = min(count, len(paths))
    sel = rnd.choice(np.arange(len(paths)), size=k, replace=False)
    cam = GradCAM(encoder.gradcam_encode, reps_real, reps_gen)
    tiles = []
    for i in sel:
        u8 = np.asarray(Image.open(paths[int(i)]).convert("RGB"), np.uint8)
        inp = encoder.gradcam_preprocess(u8[None])
        heat, _ = cam.get_map(inp, int(i))
        tiles.append(overlay_heatmap(u8, heat))
    save_image_grid(np.stack(tiles), out_png, per_row=max(1, int(round(k ** 0.5))))


def main(argv=None):
    ap = argparse.ArgumentParser(description="dgm-eval equivalent")
    ap.add_argument("path", nargs="+", help="real dir followed by generated dir(s)")
    ap.add_argument("--model", default="pixel", help="encoder name")
    ap.add_argument("--metrics", nargs="+", default=["fd", "kd", "prdc", "vendi", "authpct"])
    ap.add_argument("--nsample", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--nearest_k", type=int, default=5)
    ap.add_argument("--output_dir", default="dgm_eval_out")
    ap.add_argument("--arcface_weights", default=None)
    ap.add_argument(
        "--encoder_weights", default=None,
        help="checkpoint for the chosen encoder (dinov2/arcface; .safetensors/.pth)",
    )
    ap.add_argument("--test_path", default=None, help="held-out set for ct/fls")
    ap.add_argument(
        "--heatmaps", action="store_true",
        help="write FD-sensitivity GradCAM overlay grids (reference "
             "`--heatmaps`; inception/dinov2/mae/swav/clip/convnext)",
    )
    ap.add_argument("--heatmaps_count", type=int, default=16)
    args = ap.parse_args(argv)

    weights = args.encoder_weights or args.arcface_weights
    encoder = _ENCODERS[args.model](weights_path=weights)
    real_path, gen_paths = args.path[0], args.path[1:]
    reps_real, _ = compute_representations(
        real_path, encoder, args.model, args.nsample, args.seed, args.batch_size,
        cache_dir=args.output_dir,
    )
    reps_test = None
    if args.test_path:
        reps_test, _ = compute_representations(
            args.test_path, encoder, args.model, args.nsample, args.seed,
            args.batch_size, cache_dir=args.output_dir,
        )
    os.makedirs(args.output_dir, exist_ok=True)
    all_scores = {}
    for gen in gen_paths:
        reps_gen, labels_gen = compute_representations(
            gen, encoder, args.model, args.nsample, args.seed, args.batch_size,
            cache_dir=args.output_dir,
        )
        scores = compute_scores(
            args.metrics, reps_real, reps_gen, labels_gen, args.nearest_k,
            args.seed, reps_test=reps_test,
        )
        name = os.path.basename(os.path.normpath(gen))
        all_scores[name] = scores
        with open(os.path.join(args.output_dir, f"scores_{name}.json"), "w") as f:
            json.dump(scores, f, indent=2)
        print(json.dumps({name: scores}))
        if args.heatmaps:
            if not hasattr(encoder, "gradcam_encode"):
                print(json.dumps({"heatmaps": f"unsupported for encoder {args.model!r}"}))
            else:
                out_png = os.path.join(
                    args.output_dir, f"heatmaps_{args.model}_{name}_{args.seed}.png"
                )
                _write_gradcam_grid(
                    gen, encoder, reps_real, reps_gen, out_png,
                    nsample=args.nsample, seed=args.seed,
                    count=args.heatmaps_count,
                )
                print(json.dumps({"heatmaps": out_png}))
    with open(os.path.join(args.output_dir, "aggregate.json"), "w") as f:
        json.dump(all_scores, f, indent=2)
    return all_scores


if __name__ == "__main__":
    main()


def _inception_encoder(weights_path: Optional[str] = None, **kw):
    """The dgm-eval registry default: FID InceptionV3 2048-d final-avgpool
    features over [0,1] inputs bilinear-resized to 299² then scaled to
    [-1,1] (`dgm_eval/models/inception.py:161-186`). Weights: a pytorch-fid
    `pt_inception` checkpoint (or torchvision inception state dict); random
    init fallback keeps the pipeline runnable offline."""
    import jax

    from ..models import inception_v3

    if weights_path and os.path.exists(weights_path):
        from ..bridge.torch_weights import (
            convert_inception_state_dict,
            load_safetensors,
            load_torch_pth,
        )

        loader = load_safetensors if weights_path.endswith(".safetensors") else load_torch_pth
        params = convert_inception_state_dict(loader(weights_path))
    else:
        params = inception_v3.init(jax.random.key(0))

    @jax.jit
    def fwd(x):
        return inception_v3.apply(params, x)

    def encode(batch: np.ndarray) -> np.ndarray:
        x = np.asarray(batch, np.float32) / 255.0
        return np.asarray(fwd(x))

    from .heatmaps import make_inception_gradcam_encoder

    encode.gradcam_encode = make_inception_gradcam_encoder(params)
    encode.gradcam_preprocess = lambda batch: np.asarray(batch, np.float32) / 255.0
    return encode


register_encoder("inception", _inception_encoder)


def _clip_encoder(weights_path: Optional[str] = None, arch: str = "vitb32", **kw):
    """dgm-eval 'clip' encoder: ln_post(CLS) features (no projection —
    depth=0 default, `dgm_eval/models/clip.py:40-70`) over 224² bicubic +
    CLIP-normalized images."""
    import jax

    from ..core.precision import DEFAULT_POLICY
    from ..models import clip_vision

    cfg = {"vitb32": clip_vision.VITB32_CLIP_CONFIG, "vitl14": clip_vision.VITL14_CLIP_CONFIG}[arch]
    if weights_path and os.path.exists(weights_path):
        from ..bridge.torch_weights import (
            convert_clip_vision_state_dict,
            load_safetensors,
            load_torch_pth,
        )

        loader = load_safetensors if weights_path.endswith(".safetensors") else load_torch_pth
        params = convert_clip_vision_state_dict(loader(weights_path), cfg)
    else:
        params = clip_vision.init(jax.random.key(0), cfg)

    @jax.jit
    def fwd(x):
        return clip_vision.cls_feature(params, x, cfg, policy=DEFAULT_POLICY)

    clip_mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    clip_std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def encode(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        imgs = np.stack(
            [
                np.asarray(Image.fromarray(b).resize((cfg.image_size, cfg.image_size), Image.BICUBIC), np.float32)
                for b in batch
            ]
        )
        x = (imgs / 255.0 - clip_mean) / clip_std
        return np.asarray(fwd(x))

    def preprocess(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        imgs = np.stack(
            [
                np.asarray(Image.fromarray(b).resize((cfg.image_size, cfg.image_size), Image.BICUBIC), np.float32)
                for b in batch
            ]
        )
        return (imgs / 255.0 - clip_mean) / clip_std

    from .heatmaps import make_clip_gradcam_encoder

    encode.gradcam_encode = make_clip_gradcam_encoder(params, cfg)
    encode.gradcam_preprocess = preprocess
    return encode


register_encoder("clip", _clip_encoder)


def _resnet_ssl_encoder(weights_path: Optional[str] = None, **kw):
    """SwAV's torchvision ResNet-50: 2048-d avgpool features over 224²
    imagenet-normalized inputs (`dgm_eval/models/swav.py:290-372`)."""
    import jax

    from ..models import resnet50

    if weights_path and os.path.exists(weights_path):
        from ..bridge.torch_weights import (
            convert_resnet50_state_dict,
            load_safetensors,
            load_torch_pth,
        )

        loader = load_safetensors if weights_path.endswith(".safetensors") else load_torch_pth
        params = convert_resnet50_state_dict(loader(weights_path))
    else:
        params = resnet50.init(jax.random.key(0))

    @jax.jit
    def fwd(x):
        return resnet50.apply(params, x)

    imagenet_mean = np.array([0.485, 0.456, 0.406], np.float32)
    imagenet_std = np.array([0.229, 0.224, 0.225], np.float32)

    def encode(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        imgs = np.stack(
            [
                np.asarray(Image.fromarray(b).resize((224, 224), Image.BILINEAR), np.float32)
                for b in batch
            ]
        )
        x = (imgs / 255.0 - imagenet_mean) / imagenet_std
        return np.asarray(fwd(x))

    from .heatmaps import make_swav_gradcam_encoder

    encode.gradcam_encode = make_swav_gradcam_encoder(params)
    encode.gradcam_preprocess = _resize_norm_preprocess(
        224, imagenet_mean, imagenet_std, resample="bilinear"
    )
    return encode


def _mae_encoder(weights_path: Optional[str] = None, **kw):
    """MAE ViT-L/16: final-norm CLS features (timm forward_features,
    global_pool=False — `dgm_eval/models/mae.py:34-70`)."""
    import jax

    from ..core.precision import DEFAULT_POLICY
    from ..models import dinov2

    cfg = dinov2.MAE_VITL16_CONFIG
    if weights_path and os.path.exists(weights_path):
        from ..bridge.torch_weights import (
            convert_dinov2_state_dict,
            load_safetensors,
            load_torch_pth,
        )

        loader = load_safetensors if weights_path.endswith(".safetensors") else load_torch_pth
        sd = loader(weights_path)
        sd = sd.get("model", sd)  # MAE checkpoints nest under "model"
        params = convert_dinov2_state_dict(sd, cfg)
    else:
        params = dinov2.init(jax.random.key(0), cfg)

    @jax.jit
    def fwd(x):
        return dinov2.cls_feature(params, x, cfg, policy=DEFAULT_POLICY)

    imagenet_mean = np.array([0.485, 0.456, 0.406], np.float32)
    imagenet_std = np.array([0.229, 0.224, 0.225], np.float32)

    def encode(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        imgs = np.stack(
            [
                np.asarray(Image.fromarray(b).resize((224, 224), Image.BICUBIC), np.float32)
                for b in batch
            ]
        )
        x = (imgs / 255.0 - imagenet_mean) / imagenet_std
        return np.asarray(fwd(x))

    from .heatmaps import make_dinov2_gradcam_encoder

    encode.gradcam_encode = make_dinov2_gradcam_encoder(params, cfg)
    encode.gradcam_preprocess = _resize_norm_preprocess(224, imagenet_mean, imagenet_std)
    return encode


def _simclr_encoder(weights_path: Optional[str] = None, **kw):
    """SimCLRv2 r50_1x_sk1 (selective-kernel ResNet) 2048-d avgpool features
    (`dgm_eval/models/simclr.py:16-200`); inputs 224², ToTensor scale only
    (the SimCLR transform applies no mean/std normalization)."""
    import jax

    from ..models import simclr_resnet

    if weights_path and os.path.exists(weights_path):
        from ..bridge.torch_weights import convert_simclr_state_dict, load_torch_pth

        params = convert_simclr_state_dict(load_torch_pth(weights_path))
    else:
        params = simclr_resnet.init(jax.random.key(0))

    @jax.jit
    def fwd(x):
        return simclr_resnet.apply(params, x)

    def encode(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        imgs = np.stack(
            [
                np.asarray(Image.fromarray(b).resize((224, 224), Image.BILINEAR), np.float32)
                for b in batch
            ]
        )
        return np.asarray(fwd(imgs / 255.0))

    return encode


register_encoder("swav", _resnet_ssl_encoder)
register_encoder("simclr", _simclr_encoder)
register_encoder("mae", _mae_encoder)
register_encoder("sinception", _inception_encoder)  # same arch, SwAV-trained weights


def _convnext_encoder(weights_path: Optional[str] = None, **kw):
    """dgm-eval 'convnext' encoder: timm convnext_large features —
    forward_features → global pool → head LN (1536-d) over 224²
    imagenet-normalized inputs (`dgm_eval/models/convnext.py:78-84`)."""
    import jax

    from ..models import convnext

    cfg = convnext.CONVNEXT_LARGE
    if weights_path and os.path.exists(weights_path):
        from ..bridge.torch_weights import (
            convert_convnext_state_dict,
            load_safetensors,
            load_torch_pth,
        )

        loader = load_safetensors if weights_path.endswith(".safetensors") else load_torch_pth
        params = convert_convnext_state_dict(loader(weights_path), cfg)
    else:
        params = convnext.init(jax.random.key(0), cfg)

    @jax.jit
    def fwd(x):
        return convnext.apply(params, x, cfg)

    imagenet_mean = np.array([0.485, 0.456, 0.406], np.float32)
    imagenet_std = np.array([0.229, 0.224, 0.225], np.float32)

    def encode(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        imgs = np.stack(
            [
                np.asarray(Image.fromarray(b).resize((224, 224), Image.BICUBIC), np.float32)
                for b in batch
            ]
        )
        x = (imgs / 255.0 - imagenet_mean) / imagenet_std
        return np.asarray(fwd(x))

    from .heatmaps import make_convnext_gradcam_encoder

    encode.gradcam_encode = make_convnext_gradcam_encoder(params, cfg)
    encode.gradcam_preprocess = _resize_norm_preprocess(224, imagenet_mean, imagenet_std)
    return encode


register_encoder("convnext", _convnext_encoder)


def _data2vec_encoder(weights_path: Optional[str] = None, **kw):
    """dgm-eval 'data2vec' encoder: Data2VecVision (BEiT) pooler_output —
    LayerNorm(mean of patch tokens) (`dgm_eval/models/data2vec.py:35-60`;
    224² inputs with the model's image processor normalization ≈ imagenet
    halves: mean/std 0.5)."""
    import jax

    from ..models import data2vec_vision

    cfg = data2vec_vision.D2V_LARGE_CONFIG
    if weights_path and os.path.exists(weights_path):
        from ..bridge.torch_weights import (
            convert_data2vec_state_dict,
            load_safetensors,
            load_torch_pth,
        )

        loader = load_safetensors if weights_path.endswith(".safetensors") else load_torch_pth
        params = convert_data2vec_state_dict(loader(weights_path), cfg)
    else:
        params = data2vec_vision.init(jax.random.key(0), cfg)

    @jax.jit
    def fwd(x):
        return data2vec_vision.pooled_feature(params, x, cfg)

    def encode(batch: np.ndarray) -> np.ndarray:
        from PIL import Image

        imgs = np.stack(
            [
                np.asarray(Image.fromarray(b).resize((224, 224), Image.BICUBIC), np.float32)
                for b in batch
            ]
        )
        x = (imgs / 255.0 - 0.5) / 0.5  # BEiT image processor normalization
        return np.asarray(fwd(x))

    return encode


register_encoder("data2vec", _data2vec_encoder)
