#!/usr/bin/env python3
"""check_oracle.py with ONE DuckDB execution per DISTINCT oracle SQL —
the direct-replay discipline for the slow wedge-join/peel-ladder
oracle class at sf0.1: q_triangles / q_triangles_incremental /
q_stream_triangles share one SQL text (and the coreness family
another), so the ~90-min replay runs once and every member entry
compares against the same materialized oracle frame. Comparison
logic is byte-identical to check_oracle.py (columns sorted by name,
exact stringify, dtype-strict).

Usage: python3 tools/check_oracle_grouped.py [sfdir] [outdir]
"""
import datetime as _dt
import glob
import json
import sys
import time

import duckdb
import pandas as pd
import pyarrow.dataset as pads

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# builder aid: cap DuckDB's thread pool (GRAFT_ORACLE_THREADS) so a
# long sf0.1 replay can share the host with a Spark probe run
import os
thr = os.environ.get("GRAFT_ORACLE_THREADS")
if thr:
    con.execute(f"SET threads TO {int(thr)}")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif dt == "object" and len(df) and df[c].map(
                lambda x: x is None or
                isinstance(x, (_dt.date, _dt.datetime))).all():
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    dtypes = {c: str(df[c].dtype) for c in df.columns}
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True), dtypes


# group entries by their exact SQL text; evaluate each SQL once
by_sql = {}
for name, sql in sorted(oracle.items()):
    by_sql.setdefault(sql, []).append(name)

fails = []
for sql, names in sorted(by_sql.items(), key=lambda kv: kv[1][0]):
    t0 = time.time()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        for name in names:
            fails.append(name)
            print(f"FAIL {name}: oracle sql error: {e}")
        continue
    e_norm, et = norm(exp)
    dt_sql = time.time() - t0
    for name in names:
        try:
            got = pads.dataset(glob.glob(f"{outdir}/{name}/*.parquet")) \
                .to_table().to_pandas()
        except Exception as ex:
            fails.append(name)
            print(f"FAIL {name}: cannot read spark result: {ex}", flush=True)
            continue
        g, gt = norm(got)
        if gt != et:
            fails.append(name)
            print(f"FAIL {name}: dtype mismatch spark={gt} oracle={et}")
        elif list(g.columns) != list(e_norm.columns):
            fails.append(name)
            print(f"FAIL {name}: columns spark={list(g.columns)} "
                  f"oracle={list(e_norm.columns)}")
        elif len(g) != len(e_norm):
            fails.append(name)
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e_norm)}")
        elif not g.equals(e_norm):
            fails.append(name)
            diff = (g != e_norm).any(axis=1)
            print(f"FAIL {name}: value mismatch on {diff.sum()} rows; first:")
            idx = diff[diff].index[0]
            print("  spark :", g.loc[idx].to_dict())
            print("  oracle:", e_norm.loc[idx].to_dict())
        else:
            print(f"OK   {name} ({len(g)} rows, oracle {dt_sql:.0f}s)",
                  flush=True)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
