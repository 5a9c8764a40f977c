"""Integer time-series compression: zigzag deltas packed simple8b-style.

Gorilla XOR (gorilla.py) is the float path; tier COUNT columns (and any
monotone integer series — cumulative counters, byte totals) compress far
better as integers.  InfluxDB's TSM engine — the storage backend the
reference pushes to via ``client.PostPointsAsync``
(Influxer/GenericFile.cs:303) — stores integers as zigzag-encoded deltas
packed with Simple8b (Anh & Moffat, "Index compression using 64-bit
words", Softw. Pract. Exper. 2010), with an RLE fast path when all
deltas are identical.  This module implements that design natively:

- timestamps: t0 + first delta raw, then delta-of-deltas → zigzag →
  packed (evenly spaced buckets — the normal tier shape — collapse to
  one RLE word);
- values: v0 raw, then deltas → zigzag → packed.

Packing variant (documented, deliberately NOT byte-compatible with any
particular implementation): 64-bit words, 4-bit selector in the top
bits, widths 1,2,3,4,5,6,7,8,10,12,15,20,30,60 packing 60,…,1 values
per word.  The 240/120-run selectors of classic Simple8b are omitted —
whole-block runs take the RLE mode instead, which strictly dominates
them.  Values ≥ 2⁶⁰ after zigzag fall back to a raw block (mode 2), so
nothing is ever unrepresentable.

Execution shape: same as the Gorilla path — numpy-vectorized
delta/zigzag, a Python pack loop only over the (already tiny) width
array, all inside ``mapInPandas`` per partition via
``gorilla.carry_partition`` (one Python call per partition, not per
series).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from influxer_spark.operators.gorilla import carry_partition

# width → how many values one 60-bit payload holds; selector = index + 1
_WIDTHS = [1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 15, 20, 30, 60]
_COUNTS = [60 // w for w in _WIDTHS]
_MODE_RLE, _MODE_S8B, _MODE_RAW = 0, 1, 2


def zigzag(v: np.ndarray) -> np.ndarray:
    """Signed → unsigned, small magnitudes staying small: (v<<1) ^ (v>>63)."""
    v = v.astype(np.int64, copy=False)
    return ((v.astype(np.uint64) << np.uint64(1))
            ^ (v >> np.int64(63)).astype(np.uint64))


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).astype(np.int64)
            ^ -(u & np.uint64(1)).astype(np.int64))


def pack_simple8b(vals: np.ndarray) -> list[int]:
    """Greedy pack of uint64 values (< 2**60 each) into 64-bit words."""
    widths = np.maximum(
        np.array([int(v).bit_length() for v in vals], dtype=np.int64), 1
    )
    words: list[int] = []
    i, n = 0, len(vals)
    while i < n:
        # widest selector whose capacity fits starting at i with the
        # running max width — greedy, like the reference implementations
        sel = len(_WIDTHS) - 1
        for s, (w, c) in enumerate(zip(_WIDTHS, _COUNTS)):
            take = min(c, n - i)
            if int(widths[i : i + take].max()) <= w:
                sel = s
                break
        w, c = _WIDTHS[sel], _COUNTS[sel]
        take = min(c, n - i)
        word = (sel + 1) << 60
        shift = 60 - w
        for v in vals[i : i + take]:
            word |= int(v) << shift
            shift -= w
        words.append(word)
        i += take
    return words


def unpack_simple8b(words: list[int] | np.ndarray, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    k = 0
    for word in words:
        word = int(word)
        sel = (word >> 60) - 1
        w, c = _WIDTHS[sel], _COUNTS[sel]
        mask = (1 << w) - 1
        take = min(c, n - k)
        shift = 60 - w
        for _ in range(take):
            out[k] = (word >> shift) & mask
            shift -= w
            k += 1
    if k != n:
        raise ValueError(f"simple8b stream ended at {k} of {n} values")
    return out


def _pack_block(deltas: np.ndarray) -> bytes:
    """mode byte + payload for one signed-delta array (may be empty)."""
    n = len(deltas)
    if n == 0:
        return struct.pack("<BI", _MODE_RLE, 0) + struct.pack("<q", 0)
    if np.all(deltas == deltas[0]):
        return struct.pack("<BI", _MODE_RLE, n) + struct.pack(
            "<q", int(deltas[0])
        )
    z = zigzag(deltas)
    if int(z.max()) >= (1 << 60):
        return struct.pack("<BI", _MODE_RAW, n) + deltas.astype("<i8").tobytes()
    words = pack_simple8b(z)
    return (
        struct.pack("<BI", _MODE_S8B, n)
        + struct.pack("<I", len(words))
        + np.array(words, dtype=np.uint64).astype("<u8").tobytes()
    )


def _unpack_block(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    mode, n = struct.unpack_from("<BI", buf, pos)
    pos += 5
    if mode == _MODE_RLE:
        (d,) = struct.unpack_from("<q", buf, pos)
        return np.full(n, d, dtype=np.int64), pos + 8
    if mode == _MODE_RAW:
        out = np.frombuffer(buf, dtype="<i8", count=n, offset=pos).astype(
            np.int64
        )
        return out, pos + 8 * n
    (nw,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    words = np.frombuffer(buf, dtype="<u8", count=nw, offset=pos)
    return unzigzag(unpack_simple8b(words, n)), pos + 8 * nw


def encode_int(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """One series → one blob: (n, t0, d0, v0) header, then a ts
    delta-of-delta block and a value delta block."""
    t = np.asarray(timestamps, dtype=np.int64)
    v = np.asarray(values, dtype=np.int64)
    if len(t) != len(v):
        raise ValueError("timestamps and values must have equal length")
    n = len(t)
    if n == 0:
        return struct.pack("<I", 0)
    t0, v0 = int(t[0]), int(v[0])
    d0 = int(t[1] - t[0]) if n > 1 else 0
    head = struct.pack("<Iqqq", n, t0, d0, v0)
    dt = np.diff(t)
    dod = np.diff(dt) if n > 2 else np.empty(0, dtype=np.int64)
    dv = np.diff(v)
    return head + _pack_block(dod) + _pack_block(dv)


def decode_int(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    (n,) = struct.unpack_from("<I", blob, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    _, t0, d0, v0 = struct.unpack_from("<Iqqq", blob, 0)
    pos = struct.calcsize("<Iqqq")
    dod, pos = _unpack_block(blob, pos)
    dv, pos = _unpack_block(blob, pos)
    t = np.empty(n, dtype=np.int64)
    t[0] = t0
    if n > 1:
        dt = np.concatenate(([d0], d0 + np.cumsum(dod))) if n > 2 else np.array([d0])
        t[1:] = t0 + np.cumsum(dt)
    v = np.empty(n, dtype=np.int64)
    v[0] = v0
    if n > 1:
        v[1:] = v0 + np.cumsum(dv)
    return t, v


ENCODED_SCHEMA = (
    "series_keys array<string>, n_points long, blob binary, "
    "raw_bytes long, encoded_bytes long"
)
DECODED_SCHEMA = "series_keys array<string>, ts timestamp, value long"


def encode_int_series_df(df, key_cols, ts_col: str, value_col: str):
    """Per-series integer encode → one row per series, same execution
    shape (and same rationale) as gorilla.encode_series_df: repartition
    by key, sort within partitions, one mapInPandas call per partition
    with batch-boundary carry.  Raw cost basis is 16 bytes/point (int64
    ts + int64 value)."""
    import pyspark.sql.functions as F

    keys = list(key_cols)
    sdf = (
        df.select(*keys, ts_col, value_col)
        .repartition(*[F.col(k) for k in keys])
        .sortWithinPartitions(*keys, ts_col)
    )

    def _emit(pdf: pd.DataFrame) -> pd.DataFrame:
        ts_all = (
            pdf[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
            // 1_000_000
        )
        vs_all = pdf[value_col].to_numpy(dtype=np.int64)
        out: dict[str, list] = {
            "series_keys": [], "n_points": [], "blob": [],
            "raw_bytes": [], "encoded_bytes": [],
        }
        for key, idx in pdf.groupby(keys, sort=False).indices.items():
            t, v = ts_all[idx], vs_all[idx]
            blob = encode_int(t, v)
            kt = key if isinstance(key, tuple) else (key,)
            out["series_keys"].append([str(k) for k in kt])
            out["n_points"].append(len(t))
            out["blob"].append(blob)
            out["raw_bytes"].append(16 * len(t))
            out["encoded_bytes"].append(len(blob))
        return pd.DataFrame(out)

    return sdf.mapInPandas(carry_partition(keys, _emit), schema=ENCODED_SCHEMA)


def decode_int_series_df(encoded):
    """Inverse of encode_int_series_df: blobs → (series_keys, ts, value)."""

    def _dec(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {"series_keys": [], "ts": [], "value": []}
            for sk, blob in zip(pdf["series_keys"], pdf["blob"]):
                t, v = decode_int(bytes(blob))
                rows["series_keys"].extend([sk] * len(t))
                rows["ts"].extend(pd.to_datetime(t, unit="s"))
                rows["value"].extend(v.tolist())
            yield pd.DataFrame(rows)

    return encoded.mapInPandas(_dec, schema=DECODED_SCHEMA)
