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
