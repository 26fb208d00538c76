"""Named, quality-gated acceleration presets.

The framework ships several opt-in acceleration levers (DPM-Solver++
few-step sampling, DeepCache, guidance interval, w8a8 int8 quantization
with static activation scales, int8 VAE decode) that each were measured
individually on-chip during rounds 3-4 (`perf/r3*_queue.jsonl`,
`perf/r4*_queue.jsonl`).  A production user should not have to re-derive
the winning composition: this module names the measured champion stacks
and binds each one to its quality measurement (`cli accel-report
--preset <name>` renders the exact-vs-preset PSNR / identity-cosine /
bit-identity report for the SAME mode string via `Preset.mode_spec()`).

The reference stack has its own few-step precedent — validation sampling
swaps DDPM for DPMSolverMultistepScheduler (`train_ID-Booth.py:155`,
inside the :140-155 validation block) while the inference op point stays
30-step DDPM (`inference_ID-Booth.py:48-50`).  The presets generalize
that: the EXACT path (30-step DDPM+CFG) stays the default everywhere; a
preset is an explicit, named opt-in.

Measured anchors (v5e-lite single chip, exact default 2.086 img/s,
exact batch-1 latency 0.608 s):

  turbo    throughput stack — DPM-Solver++ 15 steps x DeepCache-3 x
           guidance interval (2,10) x w8a8 int8 UNet (static act scales)
           x int8 VAE decode body. Measured **7.663 img/s (3.67x the
           2.088 same-day exact control)** in `perf/r4d_queue.jsonl`,
           with quality AT PARITY with the previous DPM-20 turbo on the
           on-chip probe (18.26 vs 18.19 dB PSNR-vs-exact, same inputs,
           `perf/r4i_quality.jsonl`) — the step frontier dominated every
           other lever (dpm20 full cross: 6.254, `perf/r4a_queue.jsonl`;
           4.768 was the round-3 best without the VAE/interval legs).
  latency  batch-1 stack — 30-step DDPM x DeepCache-3 x guidance
           interval (5,20), bf16 (quantization is a THROUGHPUT lever:
           batch-1 w8a8 measured negative-to-neutral, perf/r3as).
           0.354 s/img vs 0.608 exact (`perf/r3an_queue.jsonl`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

CALIBRATION_PROMPT = "face portrait photo of sks person"


@dataclass(frozen=True)
class Preset:
    """A named acceleration stack.

    `scheduler`/`steps` replace the sampler program; `deepcache_*`,
    `cfg_interval` are `sample()` kwargs; `quantize` is a pipeline
    transform (`pipe.quantize`), with `quant_calibrate_steps > 0`
    freezing STATIC activation scales via `pipe.calibrate_quant`.
    """

    name: str
    scheduler: str  # "ddpm" | "dpm"
    steps: int
    deepcache_interval: int = 1
    deepcache_depth: int = 1
    cfg_interval: Optional[Tuple[int, int]] = None
    quantize: Optional[str] = None  # "w8a8" | "w8a8+vae"
    quant_calibrate_steps: int = 0
    # Quality gate (cli parity-all): the preset's accel-report mean PSNR
    # must clear `seed_floor + gate_psnr_margin_db`, where seed_floor is
    # the PSNR between two exact renders at DIFFERENT seeds — the
    # unrelated-sample floor measured on the SAME weights the report runs
    # on. Floor-relative gates are the only form the available evidence
    # supports (VERDICT r4 #4): absolute dB thresholds calibrated on
    # random probe weights do not transfer to real checkpoints, but the
    # margin above "a different image entirely" does.
    gate_psnr_margin_db: float = 3.0
    gate_min_identity_cos: float = 0.90
    note: str = ""

    def sample_kwargs(self) -> dict:
        """kwargs for `pipe(...)` / `sample(...)` / `run_sweep(...)`."""
        kw: dict = {}
        if self.deepcache_interval > 1:
            kw["deepcache_interval"] = self.deepcache_interval
            if self.deepcache_depth != 1:  # 1 = sample()'s default
                kw["deepcache_depth"] = self.deepcache_depth
        if self.cfg_interval is not None:
            kw["cfg_interval"] = self.cfg_interval
        return kw

    def server_kwargs(self) -> dict:
        """kwargs for `SamplerServer(...)` (scheduler + sampler knobs)."""
        kw = self.sample_kwargs()
        kw["scheduler"] = self.scheduler
        kw["num_inference_steps"] = self.steps
        return kw

    def apply(self, pipe, calibrate: bool = True, **calib_kw) -> dict:
        """Apply the pipeline-level parts (scheduler swap, quantization,
        static-scale calibration) and return `sample_kwargs()`.  With
        `calibrate=False` the quantized tree keeps dynamic activation
        scales (same numerics class, a measured ~9% slower — use when a
        calibration pass is unaffordable, e.g. unit tests).  `calib_kw`
        forwards to `pipe.calibrate_quant` (own prompts / shapes)."""
        pipe.set_scheduler(self.scheduler)
        if self.quantize:
            pipe.quantize(self.quantize)
            if calibrate and self.quant_calibrate_steps > 0:
                calib_kw.setdefault("prompt", [CALIBRATION_PROMPT])
                pipe.calibrate_quant(
                    steps=self.quant_calibrate_steps, **calib_kw
                )
        return self.sample_kwargs()

    def mode_spec(self) -> str:
        """The `cli accel-report --mode` string measuring EXACTLY this
        preset (`evaluation/accel_report.parse_mode` round-trips it) —
        the knob and its quality measurement stay bound together."""
        parts = []
        if (self.scheduler, self.steps) != ("ddpm", 30):
            parts.append(f"scheduler={self.scheduler}:{self.steps}")
        if self.deepcache_interval > 1:
            spec = f"deepcache={self.deepcache_interval}"
            if self.deepcache_depth != 1:
                spec += f":{self.deepcache_depth}"
            parts.append(spec)
        if self.cfg_interval is not None:
            parts.append(f"cfg_interval={self.cfg_interval[0]}:{self.cfg_interval[1]}")
        if self.quantize:
            spec = "quantize=w8a8"
            if self.quantize.endswith("+vae"):
                spec += ",vae"  # ','→'+' inside parse_mode's quantize value
            if self.quant_calibrate_steps > 0:
                spec += f":static:{self.quant_calibrate_steps}"
            parts.append(spec)
        return "+".join(parts) if parts else "exact"


# Measured champion stacks — see module docstring for the perf rows.
PRESETS: Dict[str, Preset] = {
    "turbo": Preset(
        name="turbo",
        scheduler="dpm",
        steps=15,
        deepcache_interval=3,
        cfg_interval=(2, 10),
        quantize="w8a8+vae",
        quant_calibrate_steps=8,
        note="throughput champion: DPM++(15) x DeepCache-3 x "
             "cfg_interval(2,10) x static-w8a8 x int8-VAE; 7.663 img/s "
             "measured (3.67x the 2.088 same-day exact control, "
             "perf/r4d_queue.jsonl dpm15_dc3_civ_quant; quality at parity "
             "with the previous DPM-20 stack on the on-chip probe, "
             "perf/r4i_quality.jsonl)",
    ),
    "latency": Preset(
        name="latency",
        scheduler="ddpm",
        steps=30,
        deepcache_interval=3,
        cfg_interval=(5, 20),
        note="batch-1 p50 champion: DDPM-30 x DeepCache-3 x "
             "cfg_interval(5,20), bf16; 0.354 s/img vs 0.608 exact "
             "(perf/r3an_queue.jsonl; w8a8 at batch 1 is neutral-to-"
             "negative so the latency preset stays unquantized)",
    ),
}


def get_preset(name: str) -> Preset:
    try:
        return PRESETS[name]
    except KeyError:
        raise ValueError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        ) from None
