"""Driver-contract simulation: run entry() + every queries()[name] vs
oracle_sql()[name] in DuckDB at sf0.01; compare rows/schema/values the way
the driver does (columns sorted by name, rows sorted, pandas equals).

Run: python tools/driver_sim.py   (~3 min; owns its Ray session)
Env: GRAFT_SIM_SF overrides the table directory."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import pandas as pd
import numpy as np
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False)
import __ray_entry__ as e

SF = os.environ.get("GRAFT_SIM_SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

only = set(sys.argv[1:])  # optional query-name filter: python tools/driver_sim.py q1 q2
if not only:
    t0 = time.time()
    r = e.entry()
    n = r.count()
    print(f"entry: {time.time()-t0:.1f}s rows={n}")

qs = e.queries()
if only:
    qs = {k: v for k, v in qs.items() if k in only}
sqls = e.oracle_sql()
results = {}
for name, fn in qs.items():
    t0 = time.time()
    row = {}
    try:
        res = fn(SF)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        sql = sqls.get(name)
        if sql is None:
            row = dict(rows=len(res), oracle=None, ok="rows-only")
        else:
            ora = con.execute(sql).df()
            def norm(df):
                df = df[sorted(df.columns)].copy()
                return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
            a, b = norm(res), norm(ora)
            rows_match = len(a) == len(b)
            schema_match = list(a.columns) == list(b.columns)
            val_match = False
            if rows_match and schema_match:
                try:
                    aa = a.copy(); bb = b.copy()
                    for c in aa.columns:
                        if aa[c].dtype != bb[c].dtype:
                            try:
                                bb[c] = bb[c].astype(aa[c].dtype)
                            except Exception:
                                pass
                    val_match = aa.equals(bb)
                    if not val_match:
                        # value-level compare with float tolerance-free equality on repr
                        val_match = all(
                            (aa[c].to_numpy() == bb[c].to_numpy()).all() if aa[c].dtype != object
                            else (aa[c].astype(str).to_numpy() == bb[c].astype(str).to_numpy()).all()
                            for c in aa.columns)
                except Exception as ex:
                    val_match = f"cmp-err {ex}"
            row = dict(rows=len(a), oracle=len(b), rows_match=rows_match,
                       schema_match=schema_match, hash_match=val_match)
        row["sec"] = round(time.time() - t0, 2)
    except Exception as ex:
        row = dict(err=f"{type(ex).__name__}: {str(ex)[:160]}", sec=round(time.time()-t0, 2))
    results[name] = row
    status = "OK" if row.get("hash_match") is True or row.get("ok") else ("ERR" if row.get("err") else "MISMATCH")
    print(f"{name}: {status} {row}", flush=True)

bad = {k: v for k, v in results.items() if not (v.get("hash_match") is True or v.get("ok"))}
print(f"\n=== {len(results)-len(bad)}/{len(results)} green; total {sum(v['sec'] for v in results.values()):.1f}s")
if bad:
    print("BAD:", json.dumps(bad, indent=1, default=str))
ray.shutdown()
