#!/usr/bin/env python
"""Near-duplicate detection over a document corpus with MinHash fingerprints.

The reference's flagship batch workflow (``szs.Fingerprints`` +
Jaccard-over-minhash retrieval): fingerprint every document on the TPU,
then find near-duplicate pairs by hashed-band bucketing (classic LSH).

    python examples/dedup_minhash.py [path-to-text-file]

With no argument, generates a synthetic corpus with planted near-dupes.
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import stringzilla_tpu as sz  # noqa: E402


def load_docs(path: str | None) -> list[bytes]:
    if path:
        data = sz.File(path)
        return [bytes(p) for p in data.splitlines() if len(p) > 40]
    rng = np.random.default_rng(7)
    docs = [bytes(rng.integers(97, 123, 300).astype(np.uint8))
            for _ in range(5000)]
    # plant near-duplicates: 2% mutations of existing docs
    for i in range(0, 1000, 10):
        d = bytearray(docs[i])
        for p in rng.choice(len(d), 6, replace=False):
            d[p] ^= 1
        docs.append(bytes(d))
    return docs


def main():
    docs = load_docs(sys.argv[1] if len(sys.argv) > 1 else None)
    print(f"{len(docs)} documents")

    engine = sz.Fingerprints(ndim=128)
    minhashes, _counts = engine(docs)  # (n, 128) u32, computed on device

    # LSH banding: 16 bands x 8 rows; a pair sharing any band bucket is a
    # candidate; verify candidates by minhash agreement (Jaccard estimate).
    bands = minhashes.reshape(len(docs), 16, 8)
    buckets: dict = {}
    for b in range(16):
        keys = np.apply_along_axis(lambda r: hash(r.tobytes()), 1, bands[:, b])
        for i, k in enumerate(keys):
            buckets.setdefault((b, int(k)), []).append(i)

    seen = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for a in members:
            for c in members:
                if a < c and (a, c) not in seen:
                    sim = float((minhashes[a] == minhashes[c]).mean())
                    if sim > 0.5:
                        seen.add((a, c))
    print(f"{len(seen)} near-duplicate pairs (est. Jaccard > 0.5)")
    for a, c in sorted(seen)[:10]:
        sim = float((minhashes[a] == minhashes[c]).mean())
        print(f"  doc {a} ~ doc {c}  (minhash agreement {sim:.2f})")


if __name__ == "__main__":
    main()
