"""Measure distributed BPE training cost vs corpus size and vocabulary
size — the evidence behind operators/bpe.py's scale claim: the ONLY
corpus-sized job is the word count; every merge iteration is bounded by
the unique-word table, so training cost is (one corpus pass) +
(num_merges × vocab-sized work) and is nearly flat in corpus size once
the vocabulary saturates.

Usage: python tools/bpe_bench.py [n_docs ...] [--vocab V] [--merges K]
Defaults: 50k/200k docs × 200 words each, 20k-word Zipf vocabulary, 48
merges.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from influxer_spark.operators import bpe  # noqa: E402
from influxer_spark.session import get_spark  # noqa: E402


def _mk_vocab(v: int, rng: np.random.Generator) -> np.ndarray:
    """v distinct pseudo-words, 3-12 latin letters, deterministic."""
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = set()
    while len(out) < v:
        k = int(rng.integers(3, 13))
        out.add("".join(rng.choice(letters, size=k)))
    return np.array(sorted(out))


def main() -> None:
    skip = {sys.argv.index(f) + 1 for f in ("--vocab", "--merges")
            if f in sys.argv}
    args = [a for i, a in enumerate(sys.argv[1:], start=1)
            if not a.startswith("--") and i not in skip]
    sizes = [int(a) for a in args] or [50_000, 200_000]
    vocab_n = int(sys.argv[sys.argv.index("--vocab") + 1]) \
        if "--vocab" in sys.argv else 20_000
    merges = int(sys.argv[sys.argv.index("--merges") + 1]) \
        if "--merges" in sys.argv else 48
    words_per_doc = 200
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bpe_bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(17)
    vocab = _mk_vocab(vocab_n, rng)
    # Zipf word frequencies (rank^-1), the natural-corpus shape
    p = 1.0 / np.arange(1, vocab_n + 1)
    p /= p.sum()

    out = {"vocab": vocab_n, "merges": merges,
           "words_per_doc": words_per_doc, "cores": cores, "runs": []}
    for n_docs in sizes:
        idx = rng.choice(vocab_n, size=(n_docs, words_per_doc), p=p)
        texts = [" ".join(vocab[row]) for row in idx]
        df = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        ).repartition(cores).cache()
        df.count()

        t0 = time.time()
        wc = bpe.word_count_table(df, "text").localCheckpoint()
        n_unique = wc.count()
        t_corpus = time.time() - t0

        t0 = time.time()
        m = bpe.bpe_train(df, "text", merges, recount="incremental")
        n_m = m.count()
        t_train = time.time() - t0

        run = {
            "n_docs": n_docs,
            "tokens": n_docs * words_per_doc,
            "unique_words": n_unique,
            "corpus_pass_s": round(t_corpus, 2),
            "train_total_s": round(t_train, 2),
            "per_merge_s": round((t_train - t_corpus) / max(n_m, 1), 3),
            "merges_learned": n_m,
        }
        out["runs"].append(run)
        print(f"# {run}", file=sys.stderr)
        df.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
