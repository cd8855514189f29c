"""Runtime conveniences: persistent compilation cache.

Everything hot in this framework is one jitted chunk program, so process
startup cost is dominated by XLA compilation of that chunk (~30-60 s for the
100D flagship on a v5e). The reference has no equivalent concern (eager
PyTorch, no compilation); for production sweeps/serving here, a persistent
on-disk compile cache makes every process after the first start warm:
identical (N, M, chunk, net) programs deserialize instead of recompiling.

Opt-in by a single call before the first compile::

    from dnnpde_tpu.runtime import enable_compilation_cache
    enable_compilation_cache("~/.cache/dnnpde_tpu_xla")

or by environment variable ``DNNPDE_COMPILATION_CACHE=<dir>`` honored by the
CLI (``python -m dnnpde_tpu``).

Measured effect (BENCH_REPORT_r2.jsonl "compilation_cache"): on a backend
whose compiler runs in-process (CPU here; a directly-attached TPU in
production) the flagship first-chunk start drops 5.9 s → 1.9 s (3.1×).
Through THIS environment's tunneled TPU runtime the cache is a no-op
(65 s cold vs 73 s "warm") — compilation happens server-side, beyond the
client cache; the helper stays correct and pays wherever the compiler is
local.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax


def enable_compilation_cache(
    cache_dir: str,
    min_compile_time_secs: float = 1.0,
) -> str:
    """Turn on jax's persistent compilation cache at ``cache_dir``.

    Programs whose compile took ≥ ``min_compile_time_secs`` are serialized to
    disk and reloaded by any later process (same program + same jax/XLA
    version + same platform → cache hit). Safe to call more than once; the
    last directory wins. Returns the resolved cache directory.
    """
    path = Path(os.path.expanduser(cache_dir)).resolve()
    path.mkdir(parents=True, exist_ok=True)
    # jax memoizes the cache object at first use; drop it so a directory
    # change after a compile has happened actually takes effect ("last
    # directory wins" above).
    from jax.experimental.compilation_cache import compilation_cache as _cc

    _cc.reset_cache()
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
    )
    return str(path)


def maybe_enable_compilation_cache_from_env(
    env_var: str = "DNNPDE_COMPILATION_CACHE",
) -> str | None:
    """Enable the cache iff ``env_var`` is set to a directory path."""
    target = os.environ.get(env_var)
    if not target:
        return None
    return enable_compilation_cache(target)
