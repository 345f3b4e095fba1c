"""Catalog boundary contract: `events.ts` must land as session TimestampType.

The driver has changed the physical parquet encoding of `events.ts` twice in
three rounds (TIMESTAMP(NANOS) → timestamp[us] NTZ), each time breaking every
`unix_micros` / `withWatermark` consumer. This test pins the contract at the
one place it is enforced — `catalog.load_table` — for all three encodings, so
the next driver-side flip is a test failure, not a round loss.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from hive_server_spark.catalog import load_all, load_table
from tests.conftest import SF_MED, SF_SMALL

# One canonical instant: 2024-01-01T00:00:01.234567Z
MICROS = 1_704_067_201_234_567


def _write_events(tmp_path, ts_array: pa.Array) -> str:
    """Write a minimal events.parquet with the given ts column encoding."""
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    out = os.path.join(str(tmp_path), "events.parquet")
    pq.write_table(table, out)
    return str(tmp_path)


ENCODINGS = {
    "nanos": pa.array([MICROS * 1000], pa.timestamp("ns")),
    "us_ntz": pa.array([MICROS], pa.timestamp("us")),
    "us_utc": pa.array([MICROS], pa.timestamp("us", tz="UTC")),
}


@pytest.mark.parametrize("encoding", sorted(ENCODINGS))
def test_events_ts_lands_as_session_timestamp(spark, tmp_path, encoding):
    sf_dir = _write_events(tmp_path, ENCODINGS[encoding])
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"events.ts must normalize to session TIMESTAMP, got "
        f"{df.schema['ts'].dataType} for parquet encoding {encoding!r}"
    )
    # Value contract: identical instant under the pinned UTC session tz,
    # and unix_micros (the consumer that broke in r03) must resolve.
    [(got,)] = df.select(F.unix_micros("ts")).collect()
    assert got == MICROS, f"{encoding}: expected {MICROS}, got {got}"


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_driver_testdata_events_ts(spark, sf_dir):
    """Whatever encoding the driver regenerated this round, ts must land LTZ."""
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    # withWatermark is the strictest consumer — it must accept the column.
    df.withWatermark("ts", "1 second")


def test_all_driver_tables_load(spark):
    tables = load_all(spark, SF_SMALL)
    assert set(tables) >= {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for name, df in tables.items():
        assert len(df.columns) > 0, name
