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

import hashlib
import json
import os
from typing import Optional

import jax


def machine_scoped_cache_dir(root: str = "~/.cache/jax_comp_cache") -> str:
    """Persistent-compile-cache dir keyed by THIS host's CPU feature set.

    The environment restarts across machine types; a CPU AOT cache entry
    compiled elsewhere loads with mismatched machine features ("+prefer-no-
    scatter is not supported on the host machine … could lead to execution
    errors such as SIGILL") — i.e. a cross-host cache can silently kill the
    process that trusts it. Scoping the directory by a cpuinfo-flags hash
    makes entries single-host by construction. (TPU programs are unaffected
    either way: the axon remote compiler ignores the persistent cache.)"""
    try:
        with open("/proc/cpuinfo") as f:
            tag_src = next(l for l in f if l.startswith("flags"))
    except (OSError, StopIteration):  # non-Linux fallback
        import platform

        tag_src = f"{platform.machine()}-{platform.processor()}"
    tag = hashlib.sha1(tag_src.encode()).hexdigest()[:12]
    return os.path.expanduser(os.path.join(root, tag))


def compiler_options_from_env() -> Optional[dict]:
    opts: dict = {}
    kib = os.environ.get("TPU_SCOPED_VMEM_KIB")
    if kib:
        opts["xla_tpu_scoped_vmem_limit_kib"] = str(int(kib))
    extra = os.environ.get("XLA_COMPILER_OPTIONS")
    if extra:
        opts.update(json.loads(extra))
    return opts or None


def jit(fn=None, *, tpu_default_options: Optional[dict] = None, **jit_kwargs):
    """`jax.jit` that forwards env-selected XLA compiler options.

    Usable as `jit(fn, static_argnames=…)` or as a decorator factory.

    `tpu_default_options`: per-program compiler options applied ONLY when
    the backend is TPU (resolved lazily at first call, so CPU tests and
    TPU-only option names coexist); env options merge on top and win.
    This exists because good options are PROGRAM-SPECIFIC: the
    experimental fusion cost model is +2% on the sampler but −33% on the
    iresnet embed program (perf/r3p_options.jsonl, perf/r3r_fcm.jsonl) —
    there is deliberately no global default.
    """
    if fn is None:
        return lambda f: jit(f, tpu_default_options=tpu_default_options,
                             **jit_kwargs)
    if tpu_default_options:
        return _LazyJit(fn, tpu_default_options, jit_kwargs)
    opts = compiler_options_from_env()
    if opts:
        jit_kwargs.setdefault("compiler_options", opts)
    return jax.jit(fn, **jit_kwargs)


class _LazyJit:
    """Defers jax.jit until first call so the backend check (TPU vs CPU)
    happens after the test harness / sitecustomize has pinned the platform.
    Delegates everything else (e.g. `_cache_size`) to the jitted callable."""

    def __init__(self, fn, tpu_default_options, jit_kwargs):
        self._fn = fn
        self._defaults = dict(tpu_default_options)
        self._kw = jit_kwargs
        self._jitted = None
        self.__wrapped__ = fn

    def _resolve(self):
        if self._jitted is None:
            opts = dict(self._defaults) if jax.default_backend() == "tpu" else {}
            opts.update(compiler_options_from_env() or {})
            kw = dict(self._kw)
            if opts:
                kw["compiler_options"] = opts
            self._jitted = jax.jit(self._fn, **kw)
        return self._jitted

    def __call__(self, *args, **kwargs):
        return self._resolve()(*args, **kwargs)

    def __getattr__(self, name):
        return getattr(self._resolve(), name)
