"""Measure MinHash-LSH candidate recall against exact n-gram Jaccard.

The contract queries prove reported pairs are exact; this tool reports how
many TRUE near-duplicate pairs the banding surfaces (its probabilistic
half), binned by true Jaccard, next to the theoretical banding curve
1 − (1 − j^r)^b — the honest accuracy number a dedup pipeline needs
(analogous to tools/ann_recall.py for the ANN family).  Deterministic
(seeded corpus).

Usage: python tools/dedup_recall.py [n_base] [k]
"""

from __future__ import annotations

import os
import random
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from influxer_spark.operators import dedup as D  # noqa: E402
from influxer_spark.session import get_spark  # noqa: E402

WORDS = [f"w{i:03d}" for i in range(400)]


def corpus(n_base: int, rng: random.Random) -> list[tuple[int, str]]:
    """Base docs plus mutated copies across a spread of mutation rates —
    word substitutions at rate m give shingle Jaccard roughly
    (1−m)^k / (2 − (1−m)^k), so the pair population covers the whole
    recall curve."""
    docs: list[tuple[int, str]] = []
    nid = 0
    for _ in range(n_base):
        words = [rng.choice(WORDS) for _ in range(120)]
        docs.append((nid, " ".join(words)))
        base_id = nid
        nid += 1
        for rate in (0.01, 0.03, 0.06, 0.1, 0.15, 0.25):
            mutated = [
                rng.choice(WORDS) if rng.random() < rate else w for w in words
            ]
            docs.append((nid, " ".join(mutated)))
            nid += 1
        _ = base_id
    return docs


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("dedup-recall", cores=8)
    rng = random.Random(42)
    df = spark.createDataFrame(corpus(n_base, rng), ["doc_id", "text"]).cache()
    n = df.count()

    # ground truth: EXACT jaccard pairs at a low floor
    floor = 0.05
    truth = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.jaccard_pairs(
            df, "doc_id", "text", k=k, min_jaccard=floor
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_dedup(
            df, "doc_id", "text", k=k, min_jaccard=floor
        ).collect()
    }
    b = D.LSH_BANDS
    r_rows = len(D.MINHASH_PERMS) // b
    bins = [(0.05, 0.2), (0.2, 0.4), (0.4, 0.6), (0.6, 0.8), (0.8, 1.01)]
    print(
        f"docs={n} true_pairs={len(truth)} lsh_pairs={len(got)} "
        f"(bands={b} rows={r_rows}; recall vs exact jaccard_pairs; "
        f"precision is 1.0 by construction — candidates are exact-verified)"
    )
    for lo, hi in bins:
        in_bin = [p for p, j in truth.items() if lo <= j < hi]
        if not in_bin:
            continue
        rec = sum(1 for p in in_bin if p in got) / len(in_bin)
        mid = (lo + min(hi, 1.0)) / 2
        theo = 1 - (1 - mid ** r_rows) ** b
        print(
            f"  j in [{lo:.2f},{hi:.2f}): recall {rec:5.3f} over "
            f"{len(in_bin):5d} pairs   (banding theory at j={mid:.2f}: "
            f"{theo:.3f})"
        )
    missed_high = [p for p, j in truth.items() if j >= 0.8 and p not in got]
    print(f"  missed pairs with j>=0.8: {len(missed_high)}")


if __name__ == "__main__":
    main()
