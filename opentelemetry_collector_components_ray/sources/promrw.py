"""Prometheus remote-write v1 source — the translate semantics of
receiver/prometheusremotewritev1receiver (transport-agnostic).

The reference receiver decodes a protobuf ``prompb.WriteRequest`` and
translates it 1:1 (receiver.go:174-226):

- each timeseries → one **Gauge** metric named by its ``__name__``
  label; a series with no ``__name__`` is DROPPED and flags the whole
  request invalid (receiver.go:193-198, the HTTP 400 at :164-169);
- every sample → one datapoint: ms timestamp → ns
  (receiver.go:206-211; our engine-wide unit is timestamp[us]);
- **all** labels except ``__name__`` — including ``job``/``instance``
  — become datapoint attributes; no resource attributes, no grouping
  (buildAttributes, receiver.go:218-226).

Ray-Data re-expression: a write request is a Parquet table with one
row per timeseries carrying the labels and samples as parallel LIST
columns (the prompb shape), so translate is a stateless vectorized
``map_batches``: a flatten + segment lookup finds ``__name__``, the
sample lists explode with ``np.repeat``, and the label attrs serialize
to one canonical JSON string per series built with Arrow list-join
kernels.  The HTTP transport itself stays out of scope (SURVEY §7.5) —
the batch analogue of the 400-response invalid flag is a parallel
dropped-series dataset (:func:`invalid_series`), same contract as the
NDJSON error rows.

Correctness gate: write requests are synthesized deterministically
from the ``events`` table (one sample per event, series keyed on
(event_type, user_id bucket), ``signup`` series deliberately missing
``__name__``); the SQL twin :data:`PROMRW_SQL` reconstructs the
translated datapoints closed-form over the ``events`` view.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

NAME_LABEL = "__name__"

WRITE_REQUEST_SCHEMA = pa.schema([
    ("series_id", pa.int64()),
    ("label_names", pa.list_(pa.string())),
    ("label_values", pa.list_(pa.string())),
    ("sample_values", pa.list_(pa.float64())),
    ("sample_ts_ms", pa.list_(pa.int64())),
])

OUT_SCHEMA = pa.schema([
    ("metric_name", pa.string()),
    ("ts", pa.timestamp("us")),
    ("value", pa.float64()),
    ("attrs", pa.string()),
])


def _json_escape(arr: pa.Array) -> pa.Array:
    """Minimal JSON string escaping (backslash + quote) — vectorized."""
    arr = pc.replace_substring(arr, "\\", "\\\\")
    return pc.replace_substring(arr, '"', '\\"')


def _attrs_json_safe(t: pa.Table) -> pa.Array:
    """Per-series canonical JSON of labels minus __name__, preserving
    label order (buildAttributes iterates in order,
    receiver.go:218-226): rebuild the '"k":"v"' pair lists without the
    __name__ slots, then list-join."""
    flat_names = pc.list_flatten(t["label_names"]).combine_chunks()
    flat_vals = pc.list_flatten(t["label_values"]).combine_chunks()
    keep = pc.not_equal(flat_names, NAME_LABEL).to_numpy(
        zero_copy_only=False
    )
    # binary_join_element_wise treats its LAST argument as the
    # separator — concatenate with an empty one
    pair = pc.binary_join_element_wise(
        '"', _json_escape(flat_names), '":"', _json_escape(flat_vals),
        '"', "",
    )
    lengths = pc.list_value_length(
        t["label_names"]
    ).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(lengths)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    series_of_pair = np.repeat(np.arange(n, dtype=np.int64), lengths)
    kept_counts = np.bincount(
        series_of_pair[keep], minlength=n
    ).astype(np.int64)
    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=new_offsets[1:])
    kept_pairs = pair.filter(pa.array(keep))
    relisted = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), kept_pairs
    )
    joined = pc.binary_join(relisted, ",")
    return pc.binary_join_element_wise(
        "{", joined.fill_null(""), "}", ""
    )


def translate_batch(t: pa.Table) -> pa.Table:
    """One batch of timeseries rows → gauge datapoint rows (valid
    series only — receiver.go:181-216)."""
    n = t.num_rows
    if n == 0:
        return OUT_SCHEMA.empty_table()

    flat_names = pc.list_flatten(t["label_names"]).combine_chunks()
    flat_vals = pc.list_flatten(t["label_values"]).combine_chunks()
    lengths = pc.list_value_length(
        t["label_names"]
    ).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    # locate __name__ per series (ls.Get, receiver.go:193)
    is_name = pc.equal(flat_names, NAME_LABEL).to_numpy(
        zero_copy_only=False
    )
    local = np.arange(int(offsets[-1]), dtype=np.int64) - np.repeat(
        offsets[:-1], lengths
    )
    big = np.int64(1 << 40)
    first_name = np.full(n, big, dtype=np.int64)
    nonempty = lengths > 0
    if nonempty.any():
        first_name[nonempty] = np.minimum.reduceat(
            np.where(is_name, local, big), offsets[:-1][nonempty]
        )
    has_name = first_name < big
    vals_np = np.asarray(flat_vals.to_pandas(), dtype=object)
    metric = np.full(n, "", dtype=object)
    metric[has_name] = vals_np[
        (offsets[:-1] + np.minimum(first_name, np.maximum(lengths - 1, 0)))[has_name]
    ]
    valid = has_name & (metric != "")  # empty __name__ ≡ missing

    attrs = np.asarray(
        _attrs_json_safe(t).to_pandas(), dtype=object
    )

    # explode samples for the valid series
    sv = t["sample_values"].combine_chunks()
    st = t["sample_ts_ms"].combine_chunks()
    s_lengths = pc.list_value_length(sv).fill_null(0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    s_lengths = np.where(valid, s_lengths, 0)
    flat_v = pc.list_flatten(t["sample_values"]).combine_chunks()
    flat_ms = pc.list_flatten(t["sample_ts_ms"]).combine_chunks()
    raw_lengths = pc.list_value_length(sv).fill_null(0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    keep_sample = np.repeat(valid, raw_lengths)

    values = flat_v.filter(pa.array(keep_sample))
    ts_ms = flat_ms.filter(pa.array(keep_sample))
    ts_us = pc.multiply(ts_ms, pa.scalar(1000, pa.int64())).cast(
        pa.timestamp("us")
    )  # ms → ns in the reference (receiver.go:207); us engine-wide
    return pa.table({
        "metric_name": pa.array(
            np.repeat(metric, s_lengths), pa.string()
        ),
        "ts": ts_us,
        "value": values,
        "attrs": pa.array(np.repeat(attrs, s_lengths), pa.string()),
    })


def translate_write_requests(ds: rd.Dataset) -> rd.Dataset:
    """Timeseries dataset → gauge datapoint dataset (stateless
    vectorized map; invalid series dropped, surfaced separately by
    :func:`invalid_series`)."""
    return ds.map_batches(
        translate_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def invalid_series(ds: rd.Dataset) -> rd.Dataset:
    """The dropped series (no/empty ``__name__``) — the batch analogue
    of the request-level isInvalid 400 (receiver.go:164-169,193-198)."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["series_id"])
        flat_names = pc.list_flatten(t["label_names"]).combine_chunks()
        flat_vals = pc.list_flatten(t["label_values"]).combine_chunks()
        ok = pc.and_(
            pc.equal(flat_names, NAME_LABEL),
            pc.not_equal(flat_vals, ""),
        )
        lengths = pc.list_value_length(
            t["label_names"]
        ).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        series = np.repeat(np.arange(n, dtype=np.int64), lengths)
        ok_np = ok.to_numpy(zero_copy_only=False)
        has = np.zeros(n, dtype=bool)
        np.logical_or.at(has, series[ok_np], True)
        return t.select(["series_id"]).filter(pa.array(~has))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Deterministic synthesis from the events table.
#
# series key = (event_type, user_id % 7); one sample per event
# (value, epoch-ms of ts); labels in fixed order
#   __name__ = 'app_<event_type>_total', instance = 'host-<bucket>',
#   job = 'app', region = <pool[bucket % 3]>
# except SIGNUP series, which omit __name__ (the dropped/invalid path).
# ---------------------------------------------------------------------------

REGION_POOL = ("us-east", "eu-west", "ap-south")
N_INSTANCES = 7
_PROMRW_STAMP = "v1"


def promrw_path(sf_dir: str) -> str:
    from .. import synth

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(synth.cache_dir(), f"promrw_{tag}.parquet")


def materialize_write_requests(sf_dir: str, force: bool = False) -> str:
    """Derive + cache the timeseries parquet (idempotent, atomic)."""
    import tempfile

    import pyarrow.parquet as pq

    out = promrw_path(sf_dir)
    events = os.path.join(sf_dir, "events.parquet")
    if os.path.exists(out) and not force:
        md = pq.read_schema(out).metadata or {}
        if (
            md.get(b"promrw_stamp") == _PROMRW_STAMP.encode()
            and os.path.getmtime(out) >= os.path.getmtime(events)
        ):
            return out

    t = pq.read_table(
        events, columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).sort_by("event_id")
    etype = np.asarray(t["event_type"].to_pandas(), dtype=object)
    uid = t["user_id"].to_numpy()
    bucket = (uid % N_INSTANCES).astype(np.int64)
    ts_ms = (t["ts"].cast(pa.int64()).to_numpy() // 1000).astype(
        np.int64
    )
    vals = t["value"].to_numpy()

    series: dict = {}
    for i in range(len(etype)):
        key = (etype[i], int(bucket[i]))
        series.setdefault(key, ([], []))
        series[key][0].append(float(vals[i]))
        series[key][1].append(int(ts_ms[i]))

    rows_names: List[List[str]] = []
    rows_vals: List[List[str]] = []
    rows_sv: List[List[float]] = []
    rows_st: List[List[int]] = []
    sids: List[int] = []
    for sid, ((et, b), (sv, st)) in enumerate(sorted(series.items())):
        names = ["instance", "job", "region"]
        values = [f"host-{b}", "app", REGION_POOL[b % 3]]
        if et != "signup":  # signup series: the missing-__name__ path
            names = [NAME_LABEL] + names
            values = [f"app_{et}_total"] + values
        rows_names.append(names)
        rows_vals.append(values)
        rows_sv.append(sv)
        rows_st.append(st)
        sids.append(sid)

    table = pa.table({
        "series_id": pa.array(sids, pa.int64()),
        "label_names": pa.array(rows_names, pa.list_(pa.string())),
        "label_values": pa.array(rows_vals, pa.list_(pa.string())),
        "sample_values": pa.array(rows_sv, pa.list_(pa.float64())),
        "sample_ts_ms": pa.array(rows_st, pa.list_(pa.int64())),
    }).replace_schema_metadata({b"promrw_stamp": _PROMRW_STAMP.encode()})
    fd, tmp = tempfile.mkstemp(
        suffix=".parquet", dir=os.path.dirname(out)
    )
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, out)
    return out


def read_write_requests(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(materialize_write_requests(sf_dir))


# Closed-form twin over the events view: every non-signup event is one
# datapoint of its (event_type, user-bucket) series.
PROMRW_SQL = f"""
SELECT
  'app_' || event_type || '_total' AS metric_name,
  make_timestamp(epoch_ms(ts) * 1000) AS ts,
  value,
  '{{"instance":"host-' || CAST(user_id % {N_INSTANCES} AS VARCHAR)
    || '","job":"app","region":"'
    || (['us-east', 'eu-west', 'ap-south'])
       [(user_id % {N_INSTANCES}) % 3 + 1]
    || '"}}' AS attrs
FROM events
WHERE event_type <> 'signup'
"""
