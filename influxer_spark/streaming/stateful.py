"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.7: "applyInPandasWithState for custom stateful operators").

``running_totals_stream`` keeps per-key running (count, sum) across
micro-batches — the streaming analogue of the reference's ProcessStatus
counters (Influxer/ProcessStatus.cs:3-9), generalized to per-series state
that SURVIVES restarts (state lives in the checkpoint, so a resumed
``availableNow`` run continues the totals instead of restarting them).

Shape notes: state is partitioned by key (same shuffle as a streaming agg);
each micro-batch delivers that key's new rows as pandas frames; the handler
is Arrow-batched per group.  Use this pattern for operators the built-in
windowed aggregates can't express (decaying counters, per-series anomaly
state, open-session accumulators).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(
    stream_df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key cumulative (cnt, sum_v), emitted each micro-batch the key
    appears in."""

    def totals(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cnt, sv = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            sv += float(pdf[value_col].sum())
        state.update((cnt, sv))
        yield pd.DataFrame({"key": [key[0]], "cnt": [cnt], "sum_v": [sv]})

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            totals,
            outputStructType="key string, cnt long, sum_v double",
            stateStructType="cnt long, sum_v double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    stream_df: DataFrame, id_col: str, fingerprint_col: str
) -> DataFrame:
    """Streaming exact dedup: emit each fingerprint's FIRST document only
    (ties within a micro-batch → lowest id), across micro-batches and
    restarts — the incremental form of ``dedup.exact_dedup`` for a live
    crawl feed, where re-fetches of an unchanged page must not re-enter
    the corpus.

    Output rows: ``(fingerprint, id, n_dups)`` — one per fingerprint per
    batch it appears in; ``n_dups`` is the cumulative duplicate count, and
    only the first emission carries the surviving ``id`` (later ones have
    ``id`` NULL: pure counter updates, filter ``id IS NOT NULL`` for the
    deduplicated stream).

    Scale posture: state is one tiny record per DISTINCT fingerprint,
    hash-partitioned by the same shuffle as a streaming aggregate and
    stored in the checkpoint (RocksDB state store on a real cluster) —
    the seen-set is sharded, never a driver-side structure, and a resumed
    ``availableNow`` run continues it exactly.  State is never dropped
    (``NoTimeout``): dedup correctness is unbounded-lookback by
    definition; cap it deliberately with a TTL'd variant if the product
    semantics allow re-admission.
    """

    def first_seen(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_dups = state.get[0] if state.exists else 0
        seen_before = state.exists
        batch_rows = 0
        mins: list[Any] = []
        for pdf in pdfs:  # a group may span several pandas chunks
            if not len(pdf):
                continue
            batch_rows += len(pdf)
            mins.append(pdf[id_col].min())
        keep = str(min(mins)) if mins and not seen_before else None
        n_dups += batch_rows - (1 if keep is not None else 0)
        state.update((n_dups,))
        yield pd.DataFrame(
            {
                "fingerprint": [key[0]],
                "id": [keep],
                "n_dups": [n_dups],
            }
        )

    return (
        stream_df.groupBy(fingerprint_col)
        .applyInPandasWithState(
            first_seen,
            outputStructType="fingerprint string, id string, n_dups long",
            stateStructType="n_dups long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming sessionization with per-key open-session state: a gap
    > ``gap_seconds`` between consecutive events starts a new session.

    Emits, per key and per micro-batch the key appears in, the RUNNING
    ``(n_sessions, n_events)`` — counting sessions when they START, so the
    last emission per key equals the batch sessionizer exactly (no
    close-out flush needed; an open session is already counted).  State is
    ``(last_ts_epoch, n_sessions, n_events)`` and lives in the checkpoint:
    a resumed ``availableNow`` run continues sessions across the restart,
    including a session that SPANS the stop/resume boundary.

    Same state shape at scale as a streaming agg (hash-partitioned by key;
    O(1) state per key); rows within a micro-batch are sorted by event time
    inside the Arrow batch, and cross-batch order comes from the source's
    file order — the standard at-least-once tail-ingest contract shared
    with the 1m-tier stream.
    """

    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, n_sess, n_ev = (
            state.get if state.exists else (None, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts_col)
        # whole-second epoch, matching the batch sessionizer's
        # unix_timestamp() truncation (normalize to ns first — the Arrow
        # bridge's pandas unit is version-dependent)
        ts = (
            rows[ts_col].astype("datetime64[ns]").astype("int64")
            // 1_000_000_000
        ).to_numpy()
        for t in ts:
            if last_ts is None or t - last_ts > gap_seconds:
                n_sess += 1
            last_ts = int(t)
            n_ev += 1
        state.update((last_ts, n_sess, n_ev))
        yield pd.DataFrame(
            {"key": [key[0]], "n_sessions": [n_sess], "n_events": [n_ev]}
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType="key long, n_sessions long, n_events long",
            stateStructType="last_ts long, n_sessions long, n_events long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def heavy_hitters_stream(
    stream_df: DataFrame, key_col: str, item_col: str, capacity: int = 256
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters per key — the live form of
    ``operators/heavyhitters.py``: state is the bounded (items, cnts, err)
    summary, each micro-batch folds its item counts in and re-trims to
    ``capacity`` (subtract the (c+1)-th largest, drop non-positives, add
    the subtraction to ``err``).  State survives restarts via the
    checkpoint, so a resumed availableNow run CONTINUES the summary; with
    capacity ≥ the key's item cardinality nothing is ever trimmed and the
    resumed stream must reproduce the exact batch counts — which is how
    the driver oracle value-checks it."""

    def mg(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        items, cnts, err = state.get if state.exists else ([], [], 0)
        d = dict(zip(items, cnts))
        for pdf in pdfs:
            for it, c in pdf[item_col].value_counts().items():
                it = int(it)
                d[it] = d.get(it, 0) + int(c)
        if len(d) > capacity:
            sub = sorted(d.values(), reverse=True)[capacity]
            d = {i: c - sub for i, c in d.items() if c - sub > 0}
            err += sub
        ks = sorted(d)
        state.update((ks, [d[i] for i in ks], err))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "items": [ks],
                "cnts": [[d[i] for i in ks]],
                "err": [err],
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        mg,
        outputStructType="key string, items array<long>, cnts array<long>, err long",
        stateStructType="items array<long>, cnts array<long>, err long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def alert_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    warn: float,
    crit: float,
) -> DataFrame:
    """Streaming Kapacitor-style threshold alert edges: per key, classify
    each point OK/WARN/CRIT and emit ONLY level changes — the streaming
    twin of ``operators.influxql.alert_states`` (stateChangesOnly).

    State is the key's last level (one string), so an edge is emitted
    exactly once even when the identical level continues across a
    micro-batch or a stop/resume boundary: a resumed ``availableNow`` run
    restores ``last_level`` from the checkpoint and correctly stays silent
    until the level actually changes — the alert-dedup contract a paging
    system needs.  Rows within a batch are sorted by event time inside the
    Arrow batch; cross-batch order is the source's file order (the standard
    tail-ingest contract shared with the 1m-tier stream).

    Emitted rows: (key, time, v, level, prev_level) — each transition
    appears in exactly one micro-batch output, so the read side is a plain
    union of committed batches (no last-emission merge).
    """

    def edges(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        last = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        vals = rows[value_col].to_numpy()
        # vectorized level classification + shift-compare edge detection:
        # prev[i] = level[i-1], with the checkpointed last_level carried in
        # at position 0 (None on a key's very first batch → always an edge)
        levels = np.where(vals >= crit, "CRIT", np.where(vals >= warn, "WARN", "OK"))
        prev = np.concatenate(([last], levels[:-1])) if len(levels) else levels
        mask = prev != levels  # None != level is True → first point emits
        if len(levels):
            state.update((str(levels[-1]),))
        if mask.any():
            sel = rows[mask]
            yield pd.DataFrame(
                {
                    "key": sel[key_col].astype(str).to_numpy(),
                    "time": sel[ts_col].astype("datetime64[ns]").to_numpy(),
                    "v": sel[value_col].astype("float64").to_numpy(),
                    "level": levels[mask],
                    "prev_level": pd.array(
                        [None if p is None else str(p) for p in prev[mask]],
                        dtype=object,
                    ),
                }
            )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            edges,
            outputStructType=(
                "key string, time timestamp, v double, "
                "level string, prev_level string"
            ),
            stateStructType="last_level string",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def gap_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    width_seconds: int,
) -> DataFrame:
    """Streaming deadman (no-data) detector: per key, emit every
    ``width_seconds`` bucket in which the series wrote ZERO points — the
    streaming twin of ``operators.influxql.deadman`` with the default
    per-series observed-range spine.

    State is the key's last observed bucket (one long), so a gap is
    detected the moment the series REVIVES: a point at bucket b with
    checkpointed last bucket b₀ < b−1 emits the missing buckets
    b₀+1 … b−1 exactly once, including gaps that span a micro-batch or a
    stop/resume boundary.  Within a batch the observed buckets are
    deduped and the in-between holes emitted the same way.  The one case
    state CANNOT see is "dead right now at the stream's end" — an open
    tail has no reviving point; that is the read-side monitor's job
    (``deadman`` with pinned ``spine_bounds`` over the tier), exactly as
    the batch operator documents.  Cross-batch event-time order is the
    tailing contract shared with the TWA/1m-tier streams.

    Emitted rows: (key, bucket, alert='deadman') — each missing bucket
    appears in exactly one micro-batch output, so the read side is a
    plain union of committed batches.
    """

    def gaps(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        rows = pd.concat(list(pdfs), ignore_index=True)
        secs = rows[ts_col].astype("datetime64[s]").astype("int64")
        buckets = np.unique(secs // width_seconds)  # sorted, deduped
        if not len(buckets):
            return
        last = state.get[0] if state.exists else None
        edges = (
            np.concatenate(([last], buckets)) if last is not None else buckets
        )
        # holes between consecutive observed buckets (vectorized ranges)
        starts, ends = edges[:-1] + 1, edges[1:]
        missing = [
            np.arange(s, e) for s, e in zip(starts, ends) if e > s
        ]
        state.update((int(buckets[-1]),))
        if missing:
            mb = np.concatenate(missing)
            yield pd.DataFrame(
                {
                    "key": np.repeat(str(key[0]), len(mb)),
                    "bucket": (mb * width_seconds).astype("datetime64[s]"),
                    "alert": np.repeat("deadman", len(mb)),
                }
            )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            gaps,
            outputStructType="key string, bucket timestamp, alert string",
            stateStructType="last_bucket long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
