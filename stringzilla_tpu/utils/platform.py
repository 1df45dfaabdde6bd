"""Backend detection & kernel-mode selection.

The reference library picks an ISA tier at load time via CPUID/HWCAP probes and a
dispatch table (see reference ``c/stringzilla/dispatch.h:34-109``). On TPU the
"capability" axis collapses to: compiled Pallas kernels on a real TPU vs. the same
kernels run in interpreter mode on CPU (used by CI and as the differential oracle
host), vs. the pure-jnp oracle path. This module is the tiny registry that plays
the role of the dispatch table.
"""

from __future__ import annotations

import functools
import os

import jax

_FORCED: str | None = None


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache (per-user, like the native-runtime .so
    cache): first-compile of a kernel shape costs 5-60 s on the TPU tunnel,
    and the bench suite isolates metrics in subprocesses — without a disk
    cache every process pays every compile again. Opt out with
    ``SZ_TPU_NO_COMPILE_CACHE=1``; an explicit JAX_COMPILATION_CACHE_DIR or
    prior config wins."""
    if os.environ.get("SZ_TPU_NO_COMPILE_CACHE"):
        return
    try:
        if jax.config.jax_compilation_cache_dir:
            return
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache")
        path = os.path.join(base, "stringzilla_tpu", "jax-cache")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover — cache is best-effort
        pass


_enable_compile_cache()


@functools.lru_cache(maxsize=None)
def default_backend() -> str:
    return jax.default_backend()


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. experimental tunnels)."""
    if _FORCED is not None:
        return _FORCED == "tpu"
    backend = default_backend()
    if backend == "tpu":
        return True
    # Experimental TPU tunnel platforms present one real TPU chip under a
    # different platform name; the device kind still says TPU.
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - no devices at all
        return False
    return "tpu" in kind


def pallas_interpret() -> bool:
    """Whether ``pl.pallas_call`` must run in interpreter mode.

    Pallas TPU kernels only compile on TPU hardware; on the CPU backend (tests,
    multi-chip simulation via ``--xla_force_host_platform_device_count``) we run
    the same kernel bodies through the interpreter, mirroring how the reference
    validates SIMD tiers against serial under QEMU (reference
    ``CONTRIBUTING.md:218-244``).
    """
    if os.environ.get("SZ_TPU_FORCE_INTERPRET"):
        return True
    return not on_tpu()


def force_backend(name: str | None) -> None:
    """Test hook mirroring the reference's ``sz.reset_capabilities`` knob."""
    global _FORCED
    _FORCED = name


def capabilities() -> tuple[str, ...]:
    """Introspection analog of ``sz_capabilities_to_string`` (reference
    ``stringzilla.h:742-765``)."""
    caps = ["serial-jnp"]
    if not pallas_interpret():
        caps.append("pallas-tpu")
    else:
        caps.append("pallas-interpret")
    caps.append(f"backend:{default_backend()}")
    caps.append(f"devices:{jax.device_count()}")
    return tuple(caps)
