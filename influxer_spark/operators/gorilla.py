"""Gorilla time-series compression: delta-of-delta timestamps + XOR values
(SURVEY.md A6, [delegated→build]).

The reference delegates storage compression to InfluxDB's TSM engine behind
``client.PostPointsAsync`` (Influxer/GenericFile.cs:303); InfluxDB's float
encoding is the Gorilla XOR scheme (Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015 §4.1-4.2).  Implemented
natively here:

- timestamps: header stores t0; first delta as 64 bits; subsequent
  delta-of-deltas in Gorilla's prefix-coded buckets
  ``0 | 10+7b | 110+9b | 1110+12b | 1111+64b``
- values: first stored raw (64 bits); then XOR with predecessor —
  ``0`` if identical, ``10`` + meaningful bits reusing the previous
  leading/length window, ``11`` + 5b leading + 6b length + bits otherwise.

The per-series packing loop is Python over numpy-precomputed deltas/xors;
it runs inside an Arrow-batched ``mapInPandas`` over key-partitioned,
key-sorted data (one Python call per partition, NOT per series — see
:func:`encode_series_df` for why), never on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def encode(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel (int64 epoch-seconds, float64) arrays → blob.

    Layout: [n:32][t0:64][v0:64][interleaved ts/value bit-stream...]
    """
    ts = np.asarray(timestamps, dtype=np.int64)
    vs = np.asarray(values, dtype=np.float64)
    n = len(ts)
    if len(vs) != n:
        raise ValueError("timestamps/values length mismatch")
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    w.write(int(vs[0:1].view(np.uint64)[0]), 64)
    if n == 1:
        return w.getvalue()

    deltas = np.diff(ts)
    dods = np.diff(deltas)
    bits = vs.view(np.uint64)
    xors = bits[1:] ^ bits[:-1]

    # first delta: 64-bit signed (arbitrary series start gaps)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    # first value after v0 uses the "new window" branch by construction
    prev_lead, prev_len = -1, 0

    for i in range(n - 1):
        # --- timestamp bits (skip for i==0: delta already written) ---
        if i > 0:
            d = int(dods[i - 1])
            if d == 0:
                w.write(0, 1)
            elif -63 <= d <= 64:
                w.write(0b10, 2)
                w.write(d & 0x7F, 7)
            elif -255 <= d <= 256:
                w.write(0b110, 3)
                w.write(d & 0x1FF, 9)
            elif -2047 <= d <= 2048:
                w.write(0b1110, 4)
                w.write(d & 0xFFF, 12)
            else:
                w.write(0b1111, 4)
                w.write(d & ((1 << 64) - 1), 64)
        # --- value bits ---
        x = int(xors[i])
        if x == 0:
            w.write(0, 1)
        else:
            lead = min(_clz64(x), 31)
            trail = _ctz64(x)
            length = 64 - lead - trail
            if prev_lead >= 0 and lead >= prev_lead and (64 - prev_lead - prev_len) <= trail:
                # fits in previous window
                w.write(0b10, 2)
                w.write(x >> (64 - prev_lead - prev_len), prev_len)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(length - 1, 6)  # 1..64 stored as 0..63
                w.write(x >> trail, length)
                prev_lead, prev_len = lead, length
    return w.getvalue()


def decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode`."""
    r = _BitReader(blob)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    vs_bits = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, vs_bits.view(np.float64)
    t0 = r.read(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    ts[0] = t0
    vs_bits[0] = r.read(64)
    if n == 1:
        return ts, vs_bits.view(np.float64)

    delta = r.read(64)
    if delta >= 1 << 63:
        delta -= 1 << 64
    prev_lead, prev_len = -1, 0
    prev_bits = int(vs_bits[0])
    t = t0
    for i in range(1, n):
        if i > 1:
            if r.read(1) == 0:
                dod = 0
            elif r.read(1) == 0:
                dod = _sext(r.read(7), 7)
            elif r.read(1) == 0:
                dod = _sext(r.read(9), 9)
            elif r.read(1) == 0:
                dod = _sext(r.read(12), 12)
            else:
                dod = _sext(r.read(64), 64)
            delta += dod
        t += delta
        ts[i] = t
        if r.read(1) == 0:
            pass  # identical value
        elif r.read(1) == 0:
            x = r.read(prev_len) << (64 - prev_lead - prev_len)
            prev_bits ^= x
        else:
            lead = r.read(5)
            length = r.read(6) + 1
            trail = 64 - lead - length
            x = r.read(length) << trail
            prev_bits ^= x
            prev_lead, prev_len = lead, length
        vs_bits[i] = prev_bits
    return ts, vs_bits.view(np.float64)


def _sext(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------

ENCODED_SCHEMA = (
    "series_keys array<string>, n_points long, blob binary, "
    "raw_bytes long, encoded_bytes long"
)


def encode_series_df(df, key_cols, ts_col: str, value_col: str):
    """Per-series Gorilla encode → one row per series:
    (series_keys, n_points, blob, raw_bytes, encoded_bytes).

    Execution shape: ``repartition(keys).sortWithinPartitions(keys, ts)`` +
    ``mapInPandas`` — NOT ``groupBy().applyInPandas``.  applyInPandas pays
    fixed per-group overhead (one pandas frame + one Python dispatch per
    series), which dominates when series are small (measured ~1 ms/group →
    it was ~70% of pipeline wall time at 5.6k series/day).  Here one Python
    call encodes EVERY series in its partition; groups that straddle Arrow
    batch boundaries are carried over to the next batch, which is safe
    because the sort makes each series a contiguous run within exactly one
    partition.

    Order within a series is (keys, ts) ascending from the partition sort —
    the reference processes strictly in file order; per-series time order is
    the engine's canonical order (SURVEY.md §2.6).  Raw cost is 16
    bytes/point (int64 ts + float64 value).
    """
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
        vs_all = pdf[value_col].to_numpy(dtype=np.float64)
        out: dict[str, list] = {
            "series_keys": [], "n_points": [], "blob": [],
            "raw_bytes": [], "encoded_bytes": [],
        }
        for key, idx in pdf.groupby(keys, sort=False).indices.items():
            t, v = ts_all[idx], vs_all[idx]
            blob = encode(t, v)
            kt = key if isinstance(key, tuple) else (key,)
            out["series_keys"].append([str(k) for k in kt])
            out["n_points"].append(len(t))
            out["blob"].append(blob)
            out["raw_bytes"].append(16 * len(t))
            out["encoded_bytes"].append(len(blob))
        return pd.DataFrame(out)

    def _enc_partition(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = [pdf[k].iloc[-1] for k in keys]
            tail = np.ones(len(pdf), dtype=bool)
            for k, v in zip(keys, last):
                tail &= (pdf[k] == v).to_numpy()
            if tail.all():  # whole batch is one (possibly continuing) series
                carry = pdf
                continue
            n_tail = int(np.argmin(tail[::-1]))  # contiguous trailing run
            carry = pdf.iloc[len(pdf) - n_tail :]
            yield _emit(pdf.iloc[: len(pdf) - n_tail])
        if carry is not None and len(carry):
            yield _emit(carry)

    return sdf.mapInPandas(_enc_partition, schema=ENCODED_SCHEMA)


DECODED_SCHEMA = "series_keys array<string>, ts timestamp, value double"


def decode_series_df(encoded):
    """Inverse Spark wiring: compressed blobs → (series_keys, ts, value) rows.

    One ``mapInPandas`` pass, one output row per encoded point — the read
    path for querying a Gorilla-compressed tier directly.  Narrow transform
    (no shuffle): each blob decodes independently wherever it is stored.
    """

    def _dec(batches):
        for pdf in batches:
            keys_out, ts_out, v_out = [], [], []
            for keys, blob in zip(pdf["series_keys"], pdf["blob"]):
                ts, vs = decode(bytes(blob))
                keys = list(keys)
                keys_out.extend([keys] * len(ts))
                ts_out.append(ts)
                v_out.append(vs)
            ts_all = (
                np.concatenate(ts_out) if ts_out else np.empty(0, dtype=np.int64)
            )
            v_all = (
                np.concatenate(v_out) if v_out else np.empty(0, dtype=np.float64)
            )
            yield pd.DataFrame(
                {
                    "series_keys": keys_out,
                    "ts": pd.to_datetime(ts_all, unit="s"),
                    "value": v_all,
                }
            )

    return encoded.select("series_keys", "blob").mapInPandas(
        _dec, schema=DECODED_SCHEMA
    )
