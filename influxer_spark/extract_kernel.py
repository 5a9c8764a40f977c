"""Batch-vectorized html→text extraction over raw Arrow buffers (no per-row
Python).

This is the Arrow-native implementation of the engine's per-row invariant
(``extract_text(html) == text`` byte-identical, the analogue of the
reference's per-column transform chain, Influxer/GenericColumn.cs:120-145):
one numpy pass-pipeline over the *concatenated byte buffer* of an Arrow
binary column, instead of a Python call per row.  The extraction rule (the
executable spec, ``extract._extract_text_bytes_spec``) is:

1. ``re.search(rb"<body[^>]*>(.*?)</body>", html, re.DOTALL)`` — body span,
   whole document when absent;
2. ``re.sub(rb"<[^>]*>", b" ", body)`` — strip tags;
3. ``b" ".join(stripped.split())`` — collapse ASCII whitespace runs, trim;
4. strict utf-8 decode.

Byte-parity with the spec is pinned by tests/test_extract_kernel.py
(corpus + adversarial edge cases + hypothesis fuzz).

How each regex is realized branch-free on the flat buffer ``V`` with row
offsets ``O``:

- **body span** — candidate ``<body`` / ``</body>`` / ``>`` positions come
  from one byte-compare pass each; for every candidate start ``p`` the
  closing ``>`` is the next ``>`` at ≥ p+5 (``[^>]*`` cannot cross a ``>``,
  so greedy-then-backtrack equals next-``>``), and the terminator is the
  next ``</body>`` after it (the lazy ``(.*?)``).  ``re.search`` retries
  later starts when a candidate fails, so the winner is the *first candidate
  whose both lookups land inside the row* (vectorized first-per-row via
  ``np.unique`` on the sorted candidate rows).
- **tag spans** — every ``<`` pairs with the next ``>`` (same row, inside
  the body span); multiple ``<`` before one ``>`` belong to one span, i.e.
  spans group by their closing ``>`` and start at the group's first ``<``.
  Span bytes become a ±1 delta array; its cumsum is the tag mask.
- **collapse + trim** — a byte survives iff it is non-whitespace, outside
  every tag span, and inside the body span; a single space is emitted
  between surviving bytes of the same row whenever source bytes were
  skipped between them.  Output positions are one cumsum; the result is
  scattered straight into a fresh buffer that backs the returned Arrow
  array zero-copy.

Cost: ~15 linear passes over the batch buffer and its (much smaller)
position arrays — no Python object per row, no backtracking, allocation
reuse across batches.  The scalar C-loop path (``extract.extract_text_bytes``)
remains available via SPARK_GRAFT_EXTRACT_IMPL=scalar; see BASELINE.md for
the measured single-core tradeoff on this VM.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_WS_TABLE = np.zeros(256, dtype=bool)
_WS_TABLE[[9, 10, 11, 12, 13, 32]] = True  # \t \n \v \f \r ' ' == bytes.split()
_BODY_TAIL = np.frombuffer(b"body", dtype=np.uint8)
_CLOSE_TAIL = np.frombuffer(b"/body>", dtype=np.uint8)


def _starts_with_at(V: np.ndarray, pos: np.ndarray, tail: np.ndarray) -> np.ndarray:
    """Of the ``<`` positions ``pos``, keep those followed by ``tail``."""
    pos = pos[pos + 1 + len(tail) <= len(V)]
    m = np.ones(len(pos), dtype=bool)
    for j, b in enumerate(tail):
        m &= V[pos + 1 + j] == b
    return pos[m]


def extract_kernel(arr: pa.Array) -> pa.Array:
    """Arrow binary array of html → Arrow large_string array of text.

    Byte-identical to the regex spec; raises on null html and (like strict
    ``bytes.decode``) on invalid utf-8 in the extracted text.
    """
    if arr.null_count:
        raise ValueError("null html not supported by extract_kernel")
    arr = arr.cast(pa.large_binary())
    buf_off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    V = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[buf_off[0] : buf_off[-1]]
    O = (buf_off - buf_off[0]).astype(np.int32)  # batches are < 2 GiB
    n_rows = len(arr)
    row_start, row_end = O[:-1], O[1:]
    nV = len(V)
    BIG = np.int32(min(nV + 16, 2**31 - 16))  # "no such position" sentinel

    LT = np.flatnonzero(V == 60).astype(np.int32)  # '<'
    GT = np.flatnonzero(V == 62).astype(np.int32)  # '>'
    P5 = _starts_with_at(V, LT, _BODY_TAIL)        # '<body'
    P7 = _starts_with_at(V, LT, _CLOSE_TAIL)       # '</body>'

    def _next_at_or_after(sorted_pos: np.ndarray, query: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(sorted_pos, query, side="left")
        out = np.full(len(query), BIG, dtype=np.int32)
        ok = idx < len(sorted_pos)
        out[ok] = sorted_pos[idx[ok]]
        return out

    # ---- body span per row ----
    body_lo = row_start.copy()
    body_hi = row_end.copy()
    if len(P5):
        g_of = _next_at_or_after(GT, P5 + 5)
        e_of = _next_at_or_after(P7, np.minimum(g_of, BIG - 16) + 1)
        cand_row = np.searchsorted(O, P5, side="right").astype(np.int32) - 1
        ok = (
            (P5 + 5 <= row_end[cand_row])
            & (g_of < row_end[cand_row])
            & (e_of.astype(np.int64) + 7 <= row_end[cand_row])
        )
        okP, okR = P5[ok], cand_row[ok]
        uR, fI = np.unique(okR, return_index=True)  # okR sorted → first per row
        wp = okP[fI]
        wg = _next_at_or_after(GT, wp + 5)
        we = _next_at_or_after(P7, wg + 1)
        body_lo[uR] = wg + 1
        body_hi[uR] = we

    # ---- tag-span mask (disjoint spans → depth ≤ 1 → int8 cumsum is bool) ----
    delta = np.zeros(nV + 1, dtype=np.int8)
    if len(LT) and len(GT):
        gi = np.searchsorted(GT, LT + 1, side="left")
        has = gi < len(GT)
        lt2 = LT[has]
        g2 = GT[gi[has]]
        ltr = np.searchsorted(O, lt2, side="right").astype(np.int32) - 1
        inside = (g2 < body_hi[ltr]) & (lt2 >= body_lo[ltr])
        lt2, g2 = lt2[inside], g2[inside]
        if len(g2):
            uniq_g, first_i = np.unique(g2, return_index=True)
            # starts are distinct and ends are distinct → plain fancy adds
            delta[lt2[first_i]] += 1
            delta[uniq_g + 1] -= 1
    M = np.cumsum(delta[:-1], dtype=np.int8).view(np.bool_)
    M |= _WS_TABLE[V]

    # ---- surviving bytes, run-collapse, trim ----
    solid = np.flatnonzero(~M).astype(np.int32)
    rowid = np.repeat(np.arange(n_rows, dtype=np.int32), np.diff(O))
    srow = rowid[solid]
    keep = (solid >= body_lo[srow]) & (solid < body_hi[srow])
    solid, srow = solid[keep], srow[keep]
    ns = len(solid)
    if ns:
        pre = np.empty(ns, dtype=bool)  # emit one space before this byte?
        pre[0] = False
        pre[1:] = (srow[1:] == srow[:-1]) & (solid[1:] > solid[:-1] + 1)
        out_pos = np.cumsum(pre + np.uint8(1), dtype=np.int32) - 1
        OUT = np.full(int(out_pos[-1] + 1), 32, dtype=np.uint8)
        OUT[out_pos] = V[solid]
        per_row = np.bincount(srow, minlength=n_rows) + np.bincount(
            srow[pre], minlength=n_rows
        )
        O3 = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(per_row, out=O3[1:])
    else:
        OUT = np.zeros(0, dtype=np.uint8)
        O3 = np.zeros(n_rows + 1, dtype=np.int64)

    out_arr = pa.Array.from_buffers(
        pa.large_binary(), n_rows, [None, pa.py_buffer(O3), pa.py_buffer(OUT)]
    )
    return out_arr.cast(pa.large_string())  # validates utf-8 (strict decode)
