"""Simulate the driver's correctness gate: run every queries() entry at
sf0.01 in ONE Ray session, compare against oracle_sql() in DuckDB with
sorted columns + sorted rows, report per-query status."""
import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    qs = E.queries()
    osql = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
        except Exception:
            pass

    out = {}
    for name, fn in qs.items():
        t0 = time.time()
        row = {}
        try:
            res = fn(SF)
            rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
            if not isinstance(rdf, pd.DataFrame):
                rdf = rdf.to_pandas()
            row["rows"] = len(rdf)
            if name in osql:
                odf = con.execute(osql[name]).df()
                cols = sorted(odf.columns)
                row["schema_match"] = sorted(rdf.columns) == cols
                if row["schema_match"]:
                    a = rdf[cols].sort_values(cols).reset_index(drop=True)
                    b = odf[cols].sort_values(cols).reset_index(drop=True)
                    try:
                        b = b.astype(a.dtypes.to_dict())
                    except Exception:
                        pass
                    row["rows_match"] = len(a) == len(b)
                    row["hash_match"] = bool(
                        len(a) == len(b)
                        and a.astype(str).reset_index(drop=True).equals(
                            b.astype(str).reset_index(drop=True))
                    )
                else:
                    row["rows_match"] = row["hash_match"] = False
            else:
                row["oracle"] = "none"
        except Exception as e:
            row["err"] = "".join(traceback.format_exception_only(type(e), e))[-400:]
            tb = traceback.format_exc()
            row["tb_tail"] = tb[-600:]
        row["sec"] = round(time.time() - t0, 2)
        out[name] = row
        status = ("ERR" if "err" in row else
                  ("OK" if row.get("hash_match") else
                   ("rows-only" if row.get("oracle") == "none" else "MISMATCH")))
        print(f"{name}: {status} rows={row.get('rows')} {row['sec']}s", flush=True)

    with open("/tmp/driver_sim_out.json", "w") as f:
        json.dump(out, f, indent=1)
    bad = [n for n, r in out.items() if "err" in r or r.get("hash_match") is False]
    print("BAD:", bad)
    ray.shutdown()


if __name__ == "__main__":
    main()
