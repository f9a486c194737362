"""Local re-implementation of the driver's correctness gate: run every
``queries()`` entry in Spark and its ``oracle_sql()`` in DuckDB on the same
sf directory, compare row count, column names and order-insensitive values.

Run at sf0.001 by default (fast); set HTA_PARITY_SF=/root/testdata/sf0.01 to
match the driver's gate exactly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("HTA_PARITY_SF", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value normalization: fixed decimal print
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def _registry():
    import importlib
    import sys
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    return mod._registry()


NAMES = sorted(_registry().keys())


@pytest.mark.parametrize("name", NAMES)
def test_parity(spark, name):
    fn, sql = _registry()[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = sdf.collect()
    if sql is None:
        assert len(srows) >= 0
        return
    con = _duck(SF_DIR)
    drel = con.sql(sql)
    dcols = [c.lower() for c in drel.columns]
    drows = drel.fetchall()
    assert sorted(c.lower() for c in scols) == sorted(dcols), \
        f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), \
        f"{name}: row count {len(srows)} vs {len(drows)}"
    sn = _normalize([tuple(r) for r in srows], [c.lower() for c in scols])
    dn = _normalize(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
    assert not mism, (
        f"{name}: first mismatch at {mism[0]}:\n"
        f"  spark: {sn[mism[0]]}\n  duck:  {dn[mism[0]]}")
