"""Runtime helpers: persistent compilation cache."""

import os

import jax
import jax.numpy as jnp

from dnnpde_tpu.runtime import (
    enable_compilation_cache,
    maybe_enable_compilation_cache_from_env,
)


def _reset(monkeypatch_none=False):
    """Restore the suite-wide cache state (conftest.py enables a shared
    persistent cache; these tests redirect it to tmp dirs)."""
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.reset_cache()
    jax.config.update("jax_compilation_cache_dir", None)
    if not os.environ.get("DNNPDE_TEST_NO_CACHE"):
        enable_compilation_cache(
            os.environ.get(
                "DNNPDE_TEST_CACHE_DIR", "~/.cache/dnnpde_tpu_pytest_xla"
            ),
            min_compile_time_secs=0.5,
        )


def test_enable_compilation_cache_writes_entries(tmp_path):
    cache = tmp_path / "xla_cache"
    resolved = enable_compilation_cache(str(cache), min_compile_time_secs=0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        f = jax.jit(lambda x: jnp.sin(x) @ x.T + jnp.cos(x).sum())
        f(jnp.ones((256, 256))).block_until_ready()
        assert os.path.isdir(resolved)
        assert len(os.listdir(resolved)) >= 1, "no cache entries written"
    finally:
        _reset()
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_env_var_hook(tmp_path, monkeypatch):
    monkeypatch.delenv("DNNPDE_COMPILATION_CACHE", raising=False)
    assert maybe_enable_compilation_cache_from_env() is None
    monkeypatch.setenv("DNNPDE_COMPILATION_CACHE", str(tmp_path / "c"))
    try:
        resolved = maybe_enable_compilation_cache_from_env()
        assert resolved is not None and os.path.isdir(resolved)
    finally:
        _reset()
