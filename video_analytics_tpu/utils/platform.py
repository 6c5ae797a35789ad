"""Platform helpers: TPU detection and Pallas interpret-mode fallback.

The test suite runs on CPU (optionally with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` for fake-device
mesh tests); Pallas TPU kernels then run in interpret mode so the whole
framework is exercisable without a TPU (SURVEY.md §4.2's "fake
backend").
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

def _machine_tag() -> str:
    """Fingerprint of the host CPU for the cache key: XLA:CPU AOT
    artifacts are compiled for the build machine's feature set, and
    reusing them on a different host warns (or SIGILLs) — seen in
    MULTICHIP_r02's tail when one shared dir served two machine types.
    TPU executables are unaffected but keying by host is harmless."""
    import hashlib
    import platform as _plat
    tag = _plat.machine() or "unknown"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag += "-" + hashlib.sha1(
                        line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    return tag


# Persistent compilation cache: the flow pyramids compile large Mosaic/
# XLA programs (minutes cold); cache them across processes, keyed by
# host machine (see _machine_tag).  Opt out with TPUVA_JAX_CACHE=off.
_cache_base = os.environ.get("TPUVA_JAX_CACHE", "/tmp/tpuva_jax_cache")
if _cache_base and _cache_base != "off":
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_cache_base, _machine_tag()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # config name drift across jax versions
        pass


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. tunneled axon)."""
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    return dev.platform == "tpu"


def pallas_interpret() -> bool:
    """Whether pallas_call should run in interpret mode (non-TPU hosts)."""
    return not on_tpu()


def default_compute_dtype():
    """bfloat16 on TPU (MXU-native), float32 elsewhere (test precision)."""
    return jnp.bfloat16 if on_tpu() else jnp.float32
