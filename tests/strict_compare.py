"""Ad-hoc strict (bit-exact) Spark-vs-DuckDB comparison for the rollup-shaped
queries — stricter than the driver's hash (which stringifies): requires float
bit equality, catching any 1-ulp divergence the decimal accumulation is meant
to eliminate.  Usage: python tests/strict_compare.py [sf_dir] [names...]
"""
import struct
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
DEFAULT = ["hta_level1_rollup", "hta_level2_rollup", "hta_level1_by_user",
           "hta_aggregate_range", "hta_smooth3", "hta_smooth_raw"]


def key(v):
    if isinstance(v, float):
        return struct.pack("<d", v).hex()
    return str(v)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "12g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    import __spark_entry__ as e
    reg = e._registry()
    fail = 0
    for name in names:
        fn, sql = reg[name]
        sdf = fn(spark, sf)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        drel = con.sql(sql)
        dcols = drel.columns
        drows = drel.fetchall()
        so = sorted(range(len(scols)), key=lambda i: scols[i].lower())
        do = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
        sn = sorted(tuple(key(r[i]) for i in so) for r in srows)
        dn = sorted(tuple(key(r[i]) for i in do) for r in drows)
        if len(sn) != len(dn):
            print(f"{name}: ROWS {len(sn)} vs {len(dn)}")
            fail += 1
            continue
        mism = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
        if mism:
            i = mism[0]
            print(f"{name}: {len(mism)} MISMATCHED rows / {len(sn)}")
            print("  spark:", sn[i])
            print("  duck :", dn[i])
            fail += 1
        else:
            print(f"{name}: OK bit-exact ({len(sn)} rows)")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
