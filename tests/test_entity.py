"""entityanalyticsreceiver publisher port (sources/entity.py)."""

import json

import pandas as pd
import pyarrow as pa
import pytest

from opentelemetry_collector_components_ray.sources import entity as E


def _customers(keys):
    return pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "c_name": pa.array([f"Customer#{k:09d}" for k in keys]),
        "c_nationkey": pa.array([k % 25 for k in keys], pa.int32()),
        "c_mktsegment": pa.array(["BUILDING"] * len(keys)),
    })


def test_body_fields_and_kind():
    out = E.entity_docs_batch(_customers([0, 3, 4])).to_pandas()
    b0 = json.loads(out["body"].iloc[0])
    # created user (publisher.go:62-76 derived fields)
    assert b0["event.action"] == "created"
    assert b0["event.kind"] == "asset"
    assert b0["asset.type"] == "user"
    assert b0["asset.id"] == "user-0"
    assert b0["labels.identity_source"] == "activedirectory"
    assert b0["user.name"] == "Customer#000000000"
    # custkey 3: device
    assert json.loads(out["body"].iloc[1])["asset.type"] == "device"
    # custkey 4: deleted → event.kind 'event' (publisher.go:62-66)
    b2 = json.loads(out["body"].iloc[2])
    assert b2["event.action"] == "deleted"
    assert b2["event.kind"] == "event"


def test_mapping_mode_and_document_id():
    out = E.entity_docs_batch(_customers([7])).to_pandas()
    assert out["mapping_mode"].iloc[0] == "bodymap"
    assert out["document_id"].iloc[0] == "device-7"


@pytest.mark.usefixtures("ray_session")
def test_matches_sql_twin():
    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    got = (
        E.entity_docs(sf_dir).to_pandas()
        .sort_values("document_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    exp = (
        con.execute(E.ENTITY_DOCS_SQL).df()
        .sort_values("document_id").reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
