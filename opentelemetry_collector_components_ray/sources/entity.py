"""Entity-analytics source — the publisher semantics of
receiver/entityanalyticsreceiver (transport-agnostic).

The reference syncs users/devices from identity providers and emits
each document as ONE bodymap log record (publisher.go:44-91):

- the whole ECS document becomes the log body; the scope attribute
  ``elastic.mapping.mode = "bodymap"`` tells the exporter to use the
  body as the ES document directly (publisher.go:50-53);
- routing metadata: ``elasticsearch.document_id`` attribute when the
  doc has an ID (publisher.go:58-60);
- derived body fields: ``event.action`` (created/modified/deleted),
  ``event.kind`` = ``"event"`` for deletions else ``"asset"``,
  ``asset.type`` (user/device), ``asset.id``,
  ``labels.identity_source`` = provider (publisher.go:62-76);
- documents are published individually so memory stays proportional
  to one document (publisher.go:33-36) — in Ray Data that property is
  the streaming executor's per-block bound, for free.

The provider transports (ActiveDirectory/EntraID/Okta/Jamf live in the
external ``entcollect`` library) are out of scope (SURVEY §7.5); the
identity snapshot here is derived deterministically from the
``customer`` table, making the mapping oracle-checkable closed-form.
"""

from __future__ import annotations

import os
from typing import List

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

PROVIDER = "activedirectory"
MAPPING_MODE = "bodymap"

ACTIONS = ("created", "modified", "deleted")


def entity_docs_batch(t: pa.Table) -> pa.Table:
    """customer rows → bodymap log rows (publisher.go:44-91)."""
    import numpy as np

    key = t["c_custkey"].combine_chunks()
    key_np = key.to_numpy(zero_copy_only=False)
    m5 = pa.array(key_np % 5)
    action = pc.if_else(
        pc.equal(m5, 4), "deleted",
        pc.if_else(pc.less(m5, 2), "created", "modified"),
    )
    kind = pc.if_else(
        pc.equal(pa.array(key_np % 4), 3), "device", "user"
    )
    doc_id = pc.binary_join_element_wise(
        kind.cast(pa.string()), "-", key.cast(pa.string()), ""
    )
    event_kind = pc.if_else(
        pc.equal(action, "deleted"), "event", "asset"
    )  # publisher.go:62-66
    body = pc.binary_join_element_wise(
        '{"event.action":"', action.cast(pa.string()),
        '","event.kind":"', event_kind.cast(pa.string()),
        '","asset.type":"', kind.cast(pa.string()),
        '","asset.id":"', doc_id,
        '","labels.identity_source":"' + PROVIDER + '",',
        '"user.name":"', t["c_name"].combine_chunks(),
        '","user.nation":"', t["c_nationkey"].cast(pa.string()),
        '","user.segment":"', t["c_mktsegment"].combine_chunks(),
        '"}', "",
    )
    ts = pc.multiply(
        key.cast(pa.int64()), pa.scalar(1_000_000, pa.int64())
    ).cast(pa.timestamp("us"))
    return pa.table({
        "ts": ts,
        "document_id": doc_id,
        "mapping_mode": pa.array(
            [MAPPING_MODE] * t.num_rows, pa.string()
        ),
        "body": body,
    })


def entity_docs(sf_dir: str) -> rd.Dataset:
    """Dataset of bodymap log rows from the identity snapshot."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
    )
    return ds.map_batches(
        entity_docs_batch, batch_format="pyarrow", zero_copy_batch=True
    )


ENTITY_DOCS_SQL = f"""
SELECT
  make_timestamp(c_custkey * 1000000) AS ts,
  (CASE WHEN c_custkey % 4 = 3 THEN 'device' ELSE 'user' END)
    || '-' || CAST(c_custkey AS VARCHAR) AS document_id,
  '{MAPPING_MODE}' AS mapping_mode,
  '{{"event.action":"'
    || (CASE WHEN c_custkey % 5 = 4 THEN 'deleted'
             WHEN c_custkey % 5 < 2 THEN 'created'
             ELSE 'modified' END)
    || '","event.kind":"'
    || (CASE WHEN c_custkey % 5 = 4 THEN 'event' ELSE 'asset' END)
    || '","asset.type":"'
    || (CASE WHEN c_custkey % 4 = 3 THEN 'device' ELSE 'user' END)
    || '","asset.id":"'
    || (CASE WHEN c_custkey % 4 = 3 THEN 'device' ELSE 'user' END)
    || '-' || CAST(c_custkey AS VARCHAR)
    || '","labels.identity_source":"{PROVIDER}",'
    || '"user.name":"' || c_name
    || '","user.nation":"' || CAST(c_nationkey AS VARCHAR)
    || '","user.segment":"' || c_mktsegment
    || '"}}' AS body
FROM customer
"""
