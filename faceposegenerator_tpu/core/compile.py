"""Per-compile XLA option forwarding (TPU).

Env `XLA_FLAGS` is a dead end in the axon environment: TPU-only flags crash
the local process (its CPU XLA fatals on unknown flags in
`parse_flags_from_env`) and the terminal overrides libtpu init args. But
jit `compiler_options` travel inside the compile request itself and ARE
forwarded and validated by the remote compiler (measured:
perf/r3f_vmem_probe.jsonl — a bogus option name errors remotely, and
`xla_tpu_scoped_vmem_limit_kib=65536` lifts the 16 MB scoped-VMEM default,
unlocking flash-attention blocks >1024 that otherwise fail compile).

Knobs (only injected when set, so CPU tests never see TPU-only options):
  TPU_SCOPED_VMEM_KIB=65536   scoped-VMEM limit for Pallas/fusion scratch
  XLA_COMPILER_OPTIONS='{"xla_…": "…"}'   arbitrary forwarded options
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax


def compiler_options_from_env() -> Optional[dict]:
    opts: dict = {}
    kib = os.environ.get("TPU_SCOPED_VMEM_KIB")
    if kib:
        opts["xla_tpu_scoped_vmem_limit_kib"] = str(int(kib))
    extra = os.environ.get("XLA_COMPILER_OPTIONS")
    if extra:
        opts.update(json.loads(extra))
    return opts or None


def jit(fn=None, **jit_kwargs):
    """`jax.jit` that forwards env-selected XLA compiler options.

    Usable as `jit(fn, static_argnames=…)` or as a decorator factory.
    """
    if fn is None:
        return lambda f: jit(f, **jit_kwargs)
    opts = compiler_options_from_env()
    if opts:
        jit_kwargs.setdefault("compiler_options", opts)
    return jax.jit(fn, **jit_kwargs)
