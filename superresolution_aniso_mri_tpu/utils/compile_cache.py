"""Persistent XLA compilation cache for every framework CLI.

Large configs (256² dHCP) spend minutes per program shape in
compilation through the tunneled backend (~168 s measured for the
train-step program alone), and a stall-restart (utils/watchdog.py +
tools/supervise.py, exit 75 → --auto_resume) pays it all again in a
fresh process — which can push the first resumed epoch past the very
watchdog window that restarted it. JAX's persistent compilation cache
removes that tax: compiled executables are keyed on (HLO, compiler
version, backend) and reloaded across processes. Measured on the axon
TPU backend: 3.2 s first-process compile → 0.03 s second-process reuse.

The reference has no analogue (CUDA kernels ship precompiled); on TPU
this is the standard production setting and it is ON by default for
every CLI here. Resolution order for the cache directory:

* ``SR_COMPILE_CACHE`` env: a path, or ``off``/``0``/empty to disable;
* default: ``~/.cache/sr_aniso_tpu/xla``.
"""
from __future__ import annotations

import os
from typing import Optional

_DISABLE = ("off", "0", "false", "no")
_enabled_dir: Optional[str] = None


def enable_persistent_compile_cache(cache_dir: Optional[str] = None,
                                    min_compile_time_s: float = 1.0,
                                    ) -> Optional[str]:
    """Idempotently point JAX at an on-disk compilation cache.

    Returns the directory in use, or None when disabled (explicitly via
    ``SR_COMPILE_CACHE=off`` or because the directory cannot be
    created — never fails the caller: a missing cache only costs
    compile time). Programs cheaper than ``min_compile_time_s`` are not
    persisted (they recompile faster than the disk round-trip).
    """
    global _enabled_dir
    if _enabled_dir is not None:
        return _enabled_dir
    env = os.environ.get("SR_COMPILE_CACHE")
    # empty counts as disabled (documented contract: "off/0/empty") —
    # `SR_COMPILE_CACHE= python ...` must bypass the cache, not fall
    # through to the default directory
    if env is not None and env.strip().lower() in _DISABLE + ("",):
        return None
    path = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "sr_aniso_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_time_s))
    except Exception as exc:  # pragma: no cover - depends on fs/jax
        import warnings

        warnings.warn(f"persistent compile cache disabled ({exc})")
        return None
    _enabled_dir = path
    return path
