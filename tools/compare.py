#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Reads Verify output (outDir/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf dir, and compares: row count,
column names, and a hash over values with columns sorted by name and rows
sorted. Approximates the driver's CORRECTNESS check for fast local
iteration.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def kinds(df: pd.DataFrame) -> dict:
    """Column -> coarse dtype kind, compared BEFORE value canonicalization.

    The driver's hash distinguishes int 70316 from float 70316.0 (e.g. DuckDB
    sum(BIGINT) -> HUGEINT -> pandas float) while canon()'s %.10g collapses
    them — this check closes that local-vs-driver gap (VERDICT r12 item 2).
    """
    m = {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts"}
    return {c: m.get(df[c].dtype.kind, "obj") for c in df.columns}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.10g}"
        if hasattr(v, "isoformat"):
            return v.isoformat()[:26]
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(str(x) for x in v) + "]"
        return str(v)
    out = df.map(norm)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got_raw = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    try:
        want_raw = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    got, want = canon(got_raw), canon(want_raw)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(want.columns)}"); fails += 1; continue
    gk, wk = kinds(got_raw), kinds(want_raw)
    badk = {c: (gk[c], wk[c]) for c in gk
            if wk.get(c) is not None and gk[c] != wk[c]
            # a column that is ALL-NULL on either side is dtype-ambiguous in
            # pandas (promoted to float/object) — skip it, values still compare
            and not got_raw[c].isna().all() and not want_raw[c].isna().all()}
    if badk:
        print(f"FAIL {name}: dtype mismatch {badk} (driver hashes these differently)")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}"); fails += 1; continue
    if not got.equals(want):
        diff = (got != want)
        bad = diff.any(axis=1)
        idx = bad[bad].index[:3]
        print(f"FAIL {name}: value mismatch on {int(bad.sum())}/{len(got)} rows")
        for i in idx:
            cols = [c for c in got.columns if got.at[i, c] != want.at[i, c]]
            print(f"  row {i} cols {cols}: spark={[got.at[i,c] for c in cols]} oracle={[want.at[i,c] for c in cols]}")
        fails += 1; continue
    print(f"OK   {name} ({len(got)} rows)")
missing = [q for q in glob.glob(f"{outdir}/*/") if q.split('/')[-2] not in oracle]
for m in sorted(missing):
    n = m.split('/')[-2]
    files = glob.glob(f"{m}*.parquet")
    rows = con.sql(f"SELECT count(*) FROM '{m}*.parquet'").fetchone()[0] if files else 0
    print(f"ROWS {n}: {rows} (no oracle)")
print(f"\n{fails} failures / {len(oracle)} oracles")
sys.exit(1 if fails else 0)
