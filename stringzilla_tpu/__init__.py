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
from .models.str_api import File, Str, Strs
from .models.fingerprints import Fingerprints
from .models.similarities import (
    LevenshteinDistances,
    LevenshteinDistancesUTF8,
    NeedlemanWunsch,
    NeedlemanWunschScores,
    SmithWaterman,
    SmithWatermanScores,
)
from .ops import find as _find
from .ops.hash import Hasher, Sha256, bytesum, fill_random, hash_multiseed, hmac_sha256, sz_hash
from .ops.sort import argsort_strings
from .ops.tape import Tape
from .utils import platform

# Module-level function surface mirroring the reference binding
# (``python/stringzilla.c:9531-9612``).
find = _find.find
rfind = _find.rfind
count = _find.count
find_byteset = _find.find_byteset
rfind_byteset = _find.rfind_byteset
hash = sz_hash  # noqa: A001 - intentional API parity with the reference

__version__ = "0.1.0"


def __capabilities__():
    return platform.capabilities()


__all__ = [
    "DeviceScope",
    "File",
    "Str",
    "Strs",
    "Hasher",
    "Sha256",
    "argsort_strings",
    "bytesum",
    "count",
    "fill_random",
    "find",
    "find_byteset",
    "hash",
    "hash_multiseed",
    "hmac_sha256",
    "rfind",
    "rfind_byteset",
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
