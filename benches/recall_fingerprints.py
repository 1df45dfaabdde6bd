#!/usr/bin/env python
"""MinHash near-duplicate retrieval: recall@10 harness.

BASELINE.md target: "MinHash near-duplicate retrieval: recall@10 equal to
the reference at equal HBM footprint." Our fingerprints are bit-identical to
the reference's f64 engines (the integer-limb kernel reproduces its exact
arithmetic — see tests/test_fingerprints.py), so retrieval quality is equal
BY CONSTRUCTION at equal dimension count; this harness measures it anyway,
end to end:

1. build a corpus of base documents + mutated near-duplicates (1-10% random
   edits);
2. fingerprint everything (``szs.Fingerprints`` semantics: min-hash per
   dimension);
3. for each query (a mutated document), rank the corpus by fraction of
   matching min-hash dimensions (the MinHash Jaccard estimator);
4. recall@10 = fraction of queries whose true source document appears in the
   top 10.

Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stringzilla_tpu import Fingerprints


def mutate(doc: bytes, rate: float, rng) -> bytes:
    arr = np.frombuffer(doc, dtype=np.uint8).copy()
    k = max(1, int(len(arr) * rate))
    idx = rng.choice(len(arr), k, replace=False)
    arr[idx] = rng.integers(97, 123, k)
    return arr.tobytes()


def main():
    rng = np.random.default_rng(42)
    n_base = 2000
    doc_len = 400
    base = [bytes(rng.integers(97, 123, doc_len).astype(np.uint8))
            for _ in range(n_base)]

    for ndim in (64, 128, 256):
        eng = Fingerprints(ndim=ndim)
        t0 = time.perf_counter()
        base_h, _ = eng(base)
        fp_time = time.perf_counter() - t0

        for rate in (0.02, 0.05, 0.10):
            queries = [mutate(base[i], rate, rng) for i in range(0, n_base, 10)]
            truth = list(range(0, n_base, 10))
            q_h, _ = eng(queries)
            # MinHash similarity: fraction of matching dims (vectorized)
            sim = (q_h[:, None, :] == base_h[None, :, :]).mean(axis=2)
            top10 = np.argsort(-sim, axis=1)[:, :10]
            hits = sum(t in top10[qi] for qi, t in enumerate(truth))
            recall = hits / len(truth)
            print(json.dumps({
                "metric": f"minhash_recall_at_10_ndim{ndim}_edit{int(rate*100)}pct",
                "value": round(recall, 4),
                "unit": "recall",
                "vs_baseline": round(recall / 1.0, 4),
                "fingerprint_seconds": round(fp_time, 2),
            }))


if __name__ == "__main__":
    main()
