"""Windowed aggregates over event streams (training-data pipeline extras).

The reference is batch/MVCC with no streaming operators (SURVEY.md §2.9),
but a large-scale data pipeline needs time-window aggregation; these are
the Ray-Data-native constructions:

- ``tumbling_aggregate``: fixed windows via the partial-aggregate pattern —
  bucket + combine INSIDE ``map_batches`` (one row per (bucket, type) per
  batch), then a small global ``groupby().aggregate`` over the partials.
  The shuffle moves pre-reduced rows, not events.
- ``sessionize``: per-key gap sessions.  The DEFAULT is the salted
  two-stage construction (group by (user, time-bucket), then stitch
  session summaries per user) so a pathological single-key skew never
  pins one task; ``salted=False`` keeps the plain
  ``groupby(key).map_groups`` shape for bounded-key corpora.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _partial_sums(t: pa.Table) -> pa.Table:
    """(bucket, event_type) partial sums of n / sum_value, renamed BY NAME
    (pyarrow's aggregate-output column ORDER has changed across versions;
    a positional rename would silently mislabel bucket/n columns)."""
    agg = t.group_by(["bucket", "event_type"]).aggregate(
        [("n", "sum"), ("sum_value", "sum")])
    ren = {"n_sum": "n", "sum_value_sum": "sum_value"}
    agg = agg.rename_columns([ren.get(c, c) for c in agg.column_names])
    return agg.select(["bucket", "event_type", "n", "sum_value"])


def _bucket_partial(batch: pa.Table, unit_us: int) -> pa.Table:
    import pyarrow.compute as pc

    ts = batch["ts"].cast(pa.int64())
    bucket = pc.multiply(pc.divide(ts, unit_us), unit_us)
    return _partial_sums(pa.table({
        "bucket": bucket,
        "event_type": batch["event_type"],
        "n": pa.array(np.ones(len(ts), dtype=np.int64)),
        "sum_value": batch["value"],
    }))


def tumbling_aggregate(ds, window_minutes: int = 60):
    """(bucket_start_us, event_type) -> (n events, sum value)."""
    from ray.data.aggregate import Sum

    unit_us = window_minutes * 60 * 1_000_000
    partial = ds.map_batches(lambda b: _bucket_partial(b, unit_us),
                             batch_format="pyarrow")
    return (partial.groupby(["bucket", "event_type"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_value", alias_name="sum_value")))


def _gap_session_ids(ts: np.ndarray, gap_us: int) -> np.ndarray:
    """1-based session ordinals over time-sorted event timestamps: a new
    session starts wherever the gap to the previous event exceeds gap_us.
    Shared by sessionize and sessionize_salted so boundary semantics can
    never drift between the two (their row-identity is tested)."""
    new = np.ones(len(ts), dtype=np.int64)
    if len(ts) > 1:
        new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
    return np.cumsum(new)


def _sessions_of_group(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    df = df.sort_values(["ts", "event_id"])
    ts = df["ts"].astype("int64").to_numpy()
    sid = _gap_session_ids(ts, gap_us)
    out = pd.DataFrame({"session_id": sid, "value": df["value"].to_numpy()})
    g = out.groupby("session_id", sort=True)["value"].agg(["count", "sum"])
    return pd.DataFrame({
        "user_id": np.repeat(df["user_id"].iloc[0], len(g)),
        "session_id": g.index.to_numpy(),
        "n_events": g["count"].to_numpy().astype(np.int64),
        "sum_value": g["sum"].to_numpy(),
    })


def sessionize(ds, gap_minutes: int = 30, salted: bool = True):
    """Per-user gap-based sessions: (user_id, session ordinal) ->
    (n_events, sum value).

    Defaults to the hot-key-safe salted construction (``salted=True``):
    one pathological user must never pin all their events in a single
    ``map_groups`` task at 100 TB.  ``salted=False`` keeps the plain
    ``groupby(user).map_groups`` shape (row-identical — tested) for
    corpora whose per-user volume is known to be bounded."""
    if salted:
        return sessionize_salted(ds, gap_minutes=gap_minutes)
    gap_us = gap_minutes * 60 * 1_000_000
    return ds.groupby("user_id").map_groups(
        lambda df: _sessions_of_group(df, gap_us), batch_format="pandas")


def hopping_aggregate(ds, window_minutes: int = 60, hop_minutes: int = 30):
    """Hopping (sliding) windows: every event lands in window/hop
    overlapping windows.  Same partial-aggregate shape as tumbling —
    replicate each event's (bucket, type, partials) rows INSIDE
    map_batches (k small pre-reduced rows per (bucket, type) per batch),
    then one small global groupby; the shuffle never moves raw events."""
    from ray.data.aggregate import Sum

    if window_minutes % hop_minutes:
        raise ValueError("window must be a multiple of hop")
    k = window_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # bucket arithmetic TRUNCATES toward zero (Arrow divide ==
        # DuckDB `//`) — the same convention tumbling_aggregate and
        # both SQL twins use, so pre-epoch timestamps land in the same
        # bucket engine-side and oracle-side (numpy // FLOORS and
        # diverged for ts < 0)
        base = pc.divide(batch["ts"].cast(pa.int64()),
                         hop_us).to_numpy(zero_copy_only=False)
        n = len(base)
        # k window starts per event, vectorized: (base - j) * hop
        buckets = ((np.repeat(base, k)
                    - np.tile(np.arange(k, dtype=np.int64), n)) * hop_us)
        return _partial_sums(pa.table({
            "bucket": pa.array(buckets),
            # row replication stays Arrow-side (no to_pylist round-trip)
            "event_type": batch["event_type"].take(
                pa.array(np.repeat(np.arange(n, dtype=np.int64), k))),
            "n": pa.array(np.ones(n * k, dtype=np.int64)),
            "sum_value": pa.array(np.repeat(
                batch["value"].to_numpy(zero_copy_only=False), k)),
        }))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (partials.groupby(["bucket", "event_type"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_value", alias_name="sum_value")))


def sessionize_salted(ds, gap_minutes: int = 30, bucket_hours: int = 24):
    """Hot-key-safe sessionization: the scale remedy SCALE.md documents
    for ``sessionize``'s single-group-per-user assumption, implemented.

    Stage 1 groups by (user, TIME bucket) — a pathological user's events
    split across buckets, so no single group must hold them all — and
    sessionizes within each bucket, emitting one SUMMARY row per
    within-bucket session (start/end ts, count, sum).
    Stage 2 groups by user over those summaries (volume = sessions, not
    events) and stitches sessions whose cross-bucket gap <= gap.
    Result is row-identical to ``sessionize`` in keys and counts;
    float ``sum_value`` re-sums per-bucket partials, so its association
    differs from the plain path's single sum — agreement is exact for
    int-valued data and ulp-level for adversarial floats (the tested
    equality is value-based, not byte-based).

    ``bucket_hours`` must dominate the gap (enforced) so a session can
    only ever span ADJACENT buckets' boundaries, which the ordered stitch
    handles naturally."""
    gap_us = gap_minutes * 60 * 1_000_000
    bucket_us = bucket_hours * 3_600 * 1_000_000
    if bucket_us <= gap_us:
        raise ValueError("bucket must be larger than the session gap")

    def add_bucket(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column("__bucket", pa.array(ts // bucket_us))

    def bucket_sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        ts = df["ts"].astype("int64").to_numpy()
        sid = _gap_session_ids(ts, gap_us)
        vals = df["value"].to_numpy()
        out = pd.DataFrame({"sid": sid, "ts": ts, "value": vals})
        g = out.groupby("sid", sort=True).agg(
            start=("ts", "min"), end=("ts", "max"),
            n_events=("ts", "size"), sum_value=("value", "sum"))
        g["user_id"] = df["user_id"].iloc[0]
        return g.reset_index(drop=True)

    def stitch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("start").reset_index(drop=True)
        start = df["start"].astype("int64").to_numpy()
        end = df["end"].astype("int64").to_numpy()
        # same boundary rule, applied to summary intervals: gap measured
        # from the previous session's END to this one's START
        new = np.ones(len(df), dtype=np.int64)
        if len(df) > 1:
            new[1:] = (start[1:] - end[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        out = df.assign(session_id=sid).groupby("session_id", sort=True).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        return pd.DataFrame({
            "user_id": np.repeat(df["user_id"].iloc[0], len(out)),
            "session_id": out.index.to_numpy(),
            "n_events": out["n_events"].to_numpy().astype(np.int64),
            "sum_value": out["sum_value"].to_numpy(),
        })

    summaries = (ds.map_batches(add_bucket, batch_format="pyarrow")
                 .groupby(["user_id", "__bucket"])
                 .map_groups(bucket_sessions, batch_format="pandas"))
    return summaries.groupby("user_id").map_groups(stitch,
                                                   batch_format="pandas")
