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
