"""Deterministic Common-Crawl-style pages generator (SURVEY.md §7 step 1).

Produces the engine's north-rule input table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
as parquet, with:

- **Zipfian url frequencies** (hot-key skew on purpose — the north rule names
  salted repartition + AQE skew handling for exactly this),
- **per-(url, seq) deterministic html/text** so the byte-identical extraction
  invariant is testable: ``extract_text(html) == text`` exactly,
- **minute-level gaps** per url so gap-fill has real work.

Everything is seeded (default 42) and generated chunk-wise with numpy +
pyarrow — no Spark needed to build test inputs, so tests and bench are
hermetic and fast.  The html embeds the text inside tags such that the
engine's extraction rule (strip tags → collapse whitespace → strip) recovers
the text column byte-for-byte.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = np.array(
    "the a of data web page crawl spark query table index link text html "
    "time series rollup bucket metric value point tier gap fill stream "
    "batch shuffle join scan filter agg window hash sort merge".split()
)
LANGS = np.array(["en", "de", "fr", "es", "zh"])
EPOCH_START = np.datetime64("2024-03-01T00:00:00", "s")


def generate_pages(
    out_dir: str,
    n_rows: int = 100_000,
    n_urls: int | None = None,
    seed: int = 42,
    days: int = 7,
    chunk_rows: int = 200_000,
) -> str:
    """Write ``pages.parquet`` under ``out_dir``; returns the file path.

    Caveat: html paragraph split uses ``i::k`` striding, so the text must be
    re-joined in stride order too — extraction must collapse whitespace, and
    the generator emits text already in stride order to keep the invariant
    bit-exact (text == extraction(html)).
    """
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "pages.parquet")
    if n_urls is None:
        n_urls = max(50, n_rows // 200)
    rng = np.random.default_rng(seed)

    # Zipf ranks → url ids (hot-key skew)
    zipf_w = 1.0 / np.arange(1, n_urls + 1) ** 1.2
    zipf_p = zipf_w / zipf_w.sum()

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    writer = pq.ParquetWriter(path, schema)
    span_s = days * 86400
    written = 0
    try:
        while written < n_rows:
            n = min(chunk_rows, n_rows - written)
            url_ids = rng.choice(n_urls, size=n, p=zipf_p)
            # timestamps: random seconds within the span, then per-url minute
            # gaps arise naturally from sparsity; add deliberate dead zones
            # (every url is silent in a url-dependent 6h window each day)
            offs = rng.integers(0, span_s, size=n)
            dead = ((offs // 3600) % 24) == (url_ids % 24)
            offs = np.where(dead, (offs + 7200) % span_s, offs)
            # cluster rows by time: sorted chunks + small row groups give the
            # engine's per-day range predicates real row-group pruning (the
            # stand-in for Iceberg days(warc_ts) partitioning at scale)
            order = np.argsort(offs, kind="stable")
            offs, url_ids = offs[order], url_ids[order]
            ts = EPOCH_START + offs.astype("timedelta64[s]")

            n_words = rng.integers(8, 40, size=n)
            word_idx = rng.integers(0, len(WORDS), size=int(n_words.sum()))
            langs = LANGS[url_ids % len(LANGS)]

            texts: list[str] = []
            htmls: list[bytes] = []
            pos = 0
            for i in range(n):
                w = WORDS[word_idx[pos : pos + n_words[i]]]
                pos += n_words[i]
                salt = int(url_ids[i]) * 1315423911 + int(offs[i])
                k = 1 + salt % 4
                words = list(w)
                # stride-order text so html paragraphs re-concatenate exactly
                strided = [words[j::k] for j in range(k)]
                text = " ".join(" ".join(s) for s in strided if s)
                texts.append(text)
                htmls.append(_row_html_from_chunks(strided, salt))
            batch = pa.record_batch(
                [
                    pa.array([f"https://site{u % 97}.example/p/{u}" for u in url_ids]),
                    pa.array(ts.astype("datetime64[us]")),
                    pa.array(htmls, type=pa.binary()),
                    pa.array(texts),
                    pa.array(langs),
                ],
                schema=schema,
            )
            # small row groups → min/max stats prune to ~day granularity
            writer.write_table(pa.Table.from_batches([batch]), row_group_size=16384)
            written += n
    finally:
        writer.close()
    return path


def _row_html_from_chunks(strided: list[list[str]], salt: int) -> bytes:
    chunks = [" ".join(s) for s in strided if s]
    body = " ".join(f'<p class="c{salt % 7}"> {c} </p>' for c in chunks)
    return (
        f"<html><head><title>t{salt}</title></head><body> {body} </body></html>"
    ).encode("utf-8")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    print(generate_pages(args.out_dir, n_rows=args.rows, seed=args.seed))
