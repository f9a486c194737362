"""The driver's testdata has shipped events.ts as parquet TIMESTAMP(NANOS)
(round 1) and as timestamp[us] (round 2 regen).  ns_time / events_raw must
produce identical engine-native frames for both representations."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

BASE_US = 1_704_412_800_000_000          # 2024-01-05 in µs


def _write(tmp, unit: str) -> str:
    us = [BASE_US + i * 7_000_000 + (i % 3) for i in range(200)]
    ts = ([u * 1000 for u in us] if unit == "ns" else list(us))
    t = pa.table({
        "event_id": pa.array(range(200), pa.int64()),
        "ts": pa.array(ts, pa.timestamp(unit)),
        "event_type": pa.array([f"m{i % 3}" for i in range(200)]),
        "value": pa.array([float(i % 17) for i in range(200)], pa.float64()),
    })
    d = tmp / unit
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("events_schemas")
    return _write(tmp, "us"), _write(tmp, "ns")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ns_time_equal_across_representations(spark, dirs):
    from hta_spark.queries_hta import events_raw
    d_us, d_ns = dirs
    a = events_raw(spark, d_us)
    b = events_raw(spark, d_ns)
    # ns rep reads as long via nanosAsLong; us rep as timestamp — dtypes of
    # the OUTPUT must agree (long ns) and values must be identical
    assert dict(a.dtypes)["time"] == "bigint"
    assert dict(b.dtypes)["time"] == "bigint"
    assert _rows(a) == _rows(b)


def test_bounds_equal_across_representations(spark, dirs):
    from hta_spark.queries_hta import events_raw
    d_us, d_ns = dirs
    b_ns = (BASE_US + 500_000_000) * 1000 + 1   # unaligned ns bound
    e_ns = (BASE_US + 900_000_000) * 1000 + 999
    a = events_raw(spark, d_us, begin_ns=b_ns, end_ns=e_ns) \
        .filter((F.col("time") >= b_ns) & (F.col("time") < e_ns))
    b = events_raw(spark, d_ns, begin_ns=b_ns, end_ns=e_ns) \
        .filter((F.col("time") >= b_ns) & (F.col("time") < e_ns))
    assert _rows(a) == _rows(b)
    assert a.count() > 0


def test_duckdb_epoch_ns_agrees(spark, dirs):
    """Both representations must land on DuckDB's epoch_ns values — the
    driver's oracle convention."""
    import duckdb
    from hta_spark.queries_hta import events_raw
    d_us, _ = dirs
    con = duckdb.connect()
    want = sorted(con.sql(
        f"SELECT event_type, epoch_ns(ts) t, max(value) v "
        f"FROM '{d_us}/events.parquet' GROUP BY 1, 2").fetchall())
    got = _rows(events_raw(spark, d_us))
    assert [tuple(r) for r in want] == got
