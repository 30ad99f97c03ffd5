#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py /tmp/verify_out /root/testdata/sf0.01

For each <out>/<name> parquet dir with an oracle in oracle_sql.json:
run the SQL in DuckDB over the same sf tables, sort columns by name,
sort rows, and hash-compare values (mirrors CORRECTNESS_r01.json).
Dev-only tool: the engine itself is the Scala code under src/.
"""
import json, sys, glob, os
import duckdb, pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Column order first; row sort happens AFTER norm() so that float
    # columns are rounded before ordering — raw low-bit differences
    # between engines must not reorder rows (ADVICE.md r02).
    return df.reindex(sorted(df.columns), axis=1)

def norm(df: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "M":  # datetimes -> ns int (fixed resolution)
            s = pd.to_datetime(s).astype("datetime64[ns]").astype("int64")
        elif s.dtype.kind == "f":
            s = s.round(9)
        elif s.dtype == object:
            s = s.astype(str)
        out[c] = s
    return pd.DataFrame(out)

def main(outdir, sfdir):
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_nooracle = 0
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracle:
            n_nooracle += 1
            print(f"{name:28s} NO_ORACLE rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"{name:28s} ORACLE_SQL_ERROR {e}")
            continue
        try:
            a, b = canon(spark_df), canon(duck_df)
            if len(a) != len(b):
                n_fail += 1
                print(f"{name:28s} ROWS {len(a)} vs {len(b)}")
                continue
            if list(a.columns) != list(b.columns):
                n_fail += 1
                print(f"{name:28s} SCHEMA {list(a.columns)} vs {list(b.columns)}")
                continue
            an, bn = norm(a), norm(b)
            an = an.sort_values(by=list(an.columns)).reset_index(drop=True)
            bn = bn.sort_values(by=list(bn.columns)).reset_index(drop=True)
            eq = True
            for c in an.columns:
                x, y = an[c], bn[c]
                if x.dtype.kind == "f" or y.dtype.kind == "f":
                    ok = np.allclose(x.astype(float), y.astype(float),
                                     rtol=0, atol=1e-9, equal_nan=True)
                else:
                    ok = (x.astype(str) == y.astype(str)).all()
                if not ok:
                    eq = False
                    m = (x.astype(str) != y.astype(str)) if x.dtype.kind != "f" else \
                        ~np.isclose(x.astype(float), y.astype(float), rtol=0, atol=1e-9, equal_nan=True)
                    idx = list(np.where(m)[0][:3])
                    print(f"{name:28s} VALUE col={c} rows={idx} spark={list(x.iloc[idx])} duck={list(y.iloc[idx])}")
                    break
            if eq:
                n_pass += 1
                print(f"{name:28s} OK rows={len(a)}")
            else:
                n_fail += 1
        except Exception as e:
            n_fail += 1
            print(f"{name:28s} COMPARE_ERROR {type(e).__name__} {e}")
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_nooracle}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
