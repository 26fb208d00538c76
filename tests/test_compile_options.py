"""core.compile: env-selected per-compile XLA options (TPU_SCOPED_VMEM_KIB /
XLA_COMPILER_OPTIONS). The forwarding mechanism itself was proven on the
real TPU (perf/r3f_vmem_probe.jsonl: bogus option names are rejected by the
REMOTE compiler, and a 64 MB scoped-VMEM limit admits flash blocks whose
compile OOMs at the 16 MB default); here we pin the env parsing and that
the wrapper is a transparent jax.jit when no options are set."""

import jax
import jax.numpy as jnp
import pytest

from faceposegenerator_tpu.core import compile as cc


def test_no_env_returns_none(monkeypatch):
    monkeypatch.delenv("TPU_SCOPED_VMEM_KIB", raising=False)
    monkeypatch.delenv("XLA_COMPILER_OPTIONS", raising=False)
    assert cc.compiler_options_from_env() is None


def test_scoped_vmem_env(monkeypatch):
    monkeypatch.setenv("TPU_SCOPED_VMEM_KIB", "65536")
    assert cc.compiler_options_from_env() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"
    }


def test_json_options_merge(monkeypatch):
    monkeypatch.setenv("TPU_SCOPED_VMEM_KIB", "32768")
    monkeypatch.setenv("XLA_COMPILER_OPTIONS", '{"xla_foo": "bar"}')
    assert cc.compiler_options_from_env() == {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_foo": "bar",
    }


def test_bad_vmem_value_raises(monkeypatch):
    monkeypatch.setenv("TPU_SCOPED_VMEM_KIB", "lots")
    with pytest.raises(ValueError):
        cc.compiler_options_from_env()


def test_jit_wrapper_transparent_without_env(monkeypatch):
    monkeypatch.delenv("TPU_SCOPED_VMEM_KIB", raising=False)
    monkeypatch.delenv("XLA_COMPILER_OPTIONS", raising=False)

    @cc.jit(static_argnames=("n",))
    def f(x, n):
        return x * n

    out = f(jnp.arange(4.0), n=3)
    assert jax.numpy.allclose(out, jnp.arange(4.0) * 3)
    # decorator-factory and direct forms agree
    g = cc.jit(lambda x: x + 1)
    assert float(g(jnp.float32(1.0))) == 2.0


def test_flash_kernel_vmem_budget(monkeypatch):
    """ops.flash_attention._kernel_compiler_params: kernel-local
    vmem_limit_bytes is set only when the block sizes need more than the
    16 MB default scoped-VMEM (fp32 score tile = bq*bk*4 B), and
    FLASH_VMEM_MB forces the budget."""
    from faceposegenerator_tpu.ops import flash_attention as fa

    if fa.pltpu is None:
        pytest.skip("pallas tpu module unavailable")
    monkeypatch.delenv("FLASH_VMEM_MB", raising=False)
    # small blocks (the bwd default 512): estimate under 16 MB → no override
    params = fa._kernel_compiler_params(512, 512, interpret=False)
    assert params.vmem_limit_bytes is None
    # 2048x4096 (the tuned default at S=4096): needs a raised budget
    params = fa._kernel_compiler_params(2048, 4096, interpret=False)
    assert params.vmem_limit_bytes == 3 * 2048 * 4096 * 4 + 8 * 1024 * 1024
    # forced budget wins
    monkeypatch.setenv("FLASH_VMEM_MB", "48")
    params = fa._kernel_compiler_params(1024, 1024, interpret=False)
    assert params.vmem_limit_bytes == 48 * 1024 * 1024
    # interpret mode (CPU tests) never sets compiler params
    assert fa._kernel_compiler_params(4096, 4096, interpret=True) is None


def test_tpu_default_options_lazy(monkeypatch):
    """jit(tpu_default_options=…) resolves lazily: on CPU the TPU-only
    option must NOT be passed (it would fail the CPU compiler), attributes
    like _cache_size delegate, and env options merge on top."""
    monkeypatch.delenv("XLA_COMPILER_OPTIONS", raising=False)
    monkeypatch.delenv("TPU_SCOPED_VMEM_KIB", raising=False)

    calls = []

    @cc.jit(tpu_default_options={"xla_tpu_only_thing": "true"},
            static_argnames=("n",))
    def f(x, n):
        calls.append(1)
        return x * n

    # CPU backend: option dropped, call works, cache delegation works
    assert float(f(jnp.float32(2.0), n=3)) == 6.0
    assert f._cache_size() == 1
    assert float(f(jnp.float32(4.0), n=3)) == 12.0
    assert f._cache_size() == 1 and len(calls) == 1  # no retrace
