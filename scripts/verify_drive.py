"""Verify drive: golden replay + driver contract vs DuckDB oracle."""
import sys

sys.path.insert(0, "/root/repo")

import csv
import duckdb
import pandas as pd

from sentinel_landsat_database_creation_spark.session import get_spark

spark = get_spark(shuffle_partitions=8)

# ---------- 1. Golden stage-1 replay ----------
from pyspark.sql import functions as F

from sentinel_landsat_database_creation_spark.operators.catalog import build_catalog
from sentinel_landsat_database_creation_spark.functions import dates as D

GRID = D.WeekGrid.from_range("2023-01-01", "2024-01-15")

failures = []
for name, parser in (("L_out", D.hls_date), ("S_out", D.s2_date)):
    gpath = f"/root/reference/data_pair/{name}.csv"
    with open(gpath) as f:
        rows = list(csv.DictReader(f))
    golden = [(r["class"], r["path"], r["data"]) for r in rows]
    scene_names = [r["data"] for r in rows if r["data"] != "0"]
    root = next(r["path"] for r in rows)
    df = spark.createDataFrame([(s,) for s in scene_names], "data string")
    out = build_catalog(df, parser(F.col("data")), root, GRID)
    got = [(r["class"], r["path"], r["data"]) for r in out.select("class", "path", "data").collect()]
    if got == golden:
        print(f"GOLDEN {name}: EXACT MATCH ({len(got)} rows)")
    else:
        failures.append(name)
        print(f"GOLDEN {name}: MISMATCH got={len(got)} want={len(golden)}")
        for i, (g, w) in enumerate(zip(got, golden)):
            if g != w:
                print("  first diff at", i, g, w)
                break

# ---------- 2. Driver contract ----------
sys.path.insert(0, "/root/repo")
import importlib
entry_mod = importlib.import_module("__spark_entry__")

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

r = entry_mod.entry(spark)
n = r.count()
print(f"entry(): {n} rows, schema ok")

queries = entry_mod.queries()
oracles = entry_mod.oracle_sql()
print(f"{len(queries)} queries, {len(oracles)} oracles")

def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype) or "decimal" in str(pdf[c].dtype).lower():
            pdf[c] = pd.to_numeric(pdf[c], errors="coerce").round(4)
        elif "datetime" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)

bad = []
for qname, fn in queries.items():
    try:
        sdf = fn(spark, SF).toPandas()
    except Exception as e:
        bad.append((qname, f"spark error: {e}"))
        print(f"{qname}: SPARK ERROR {e}")
        continue
    if qname not in oracles:
        print(f"{qname}: rows-only ({len(sdf)} rows)")
        continue
    try:
        odf = con.execute(oracles[qname]).fetchdf()
    except Exception as e:
        bad.append((qname, f"oracle error: {e}"))
        print(f"{qname}: ORACLE ERROR {e}")
        continue
    if len(sdf) != len(odf):
        bad.append((qname, f"rowcount {len(sdf)} vs {len(odf)}"))
        print(f"{qname}: ROWCOUNT MISMATCH {len(sdf)} vs {len(odf)}")
        continue
    a, b = normalize(sdf), normalize(odf)
    if sorted(a.columns) != sorted(b.columns):
        bad.append((qname, f"cols {sorted(a.columns)} vs {sorted(b.columns)}"))
        print(f"{qname}: COLS MISMATCH {sorted(a.columns)} vs {sorted(b.columns)}")
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-3, atol=1e-6)
        print(f"{qname}: MATCH ({len(sdf)} rows)")
    except AssertionError as e:
        bad.append((qname, "value mismatch"))
        print(f"{qname}: VALUE MISMATCH {str(e)[:300]}")

print()
if failures or bad:
    print("VERIFY: FAIL", failures, bad)
    sys.exit(1)
print("VERIFY: ALL PASS")
