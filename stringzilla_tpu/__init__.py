"""stringzilla_tpu — a TPU-native batch string-processing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of StringZilla v5
(reference mounted at /root/reference): batch similarity scoring, rolling
MinHash fingerprints, exact search, hashing, sorting, and Unicode processing,
device-resident over Arrow-style tapes and sharded across TPU meshes.

Layout (mirrors the reference's two-tier split, ``README.md:368-376``):

* ``stringzilla_tpu.ops``     — kernels: jnp oracles + Pallas TPU kernels
* ``stringzilla_tpu.models``  — engine classes (the ``szs.*`` public API)
* ``stringzilla_tpu.parallel``— mesh sharding / collectives
* ``stringzilla_tpu.utils``   — platform dispatch, helpers
"""

from .models.device_scope import DeviceScope
from .models.fingerprints import Fingerprints
from .models.similarities import (
    LevenshteinDistances,
    LevenshteinDistancesUTF8,
    NeedlemanWunsch,
    NeedlemanWunschScores,
    SmithWaterman,
    SmithWatermanScores,
)
from .ops.tape import Tape
from .utils import platform

__version__ = "0.1.0"


def __capabilities__():
    return platform.capabilities()


__all__ = [
    "DeviceScope",
    "Fingerprints",
    "LevenshteinDistances",
    "LevenshteinDistancesUTF8",
    "NeedlemanWunsch",
    "NeedlemanWunschScores",
    "SmithWaterman",
    "SmithWatermanScores",
    "Tape",
    "__capabilities__",
]
