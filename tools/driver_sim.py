"""Simulate the driver's correctness gate: run every queries() entry at
sf0.01 in ONE Ray session, compare against oracle_sql() in DuckDB with
sorted columns + sorted rows, report per-query status.

The compare is deliberately STRICT — no dtype coercion between the
engine result and the oracle before stringify+hash (an earlier version
cast the oracle to the engine's dtypes, which masked a real external-
gate red: DuckDB windowed SUM returns HUGEINT -> float64 -> '0.0' vs
the engine's int64 '0').

--repeat: runs every oracle-backed query TWICE in the same session and
compares the two value-hashes — the repeat-stability check for
driver-context-only flakes (nondeterministic orderings, dtype drift).
"""
import hashlib
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

    repeat = "--repeat" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]

    def fetch(fn):
        res = fn(SF)
        rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
        if not isinstance(rdf, pd.DataFrame):
            rdf = rdf.to_pandas()
        return rdf

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True).astype(str)

    def vhash(df: pd.DataFrame) -> str:
        return hashlib.sha256(
            canon(df).to_csv(index=False).encode()).hexdigest()[:16]

    out = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        row = {}
        try:
            rdf = fetch(fn)
            row["rows"] = len(rdf)
            if name in osql:
                odf = con.execute(osql[name]).df()
                cols = sorted(odf.columns)
                row["schema_match"] = sorted(rdf.columns) == cols
                if row["schema_match"]:
                    a = canon(rdf)
                    b = canon(odf)
                    row["rows_match"] = len(a) == len(b)
                    # STRICT: stringified equality, no dtype coercion
                    row["hash_match"] = bool(len(a) == len(b) and a.equals(b))
                else:
                    row["rows_match"] = row["hash_match"] = False
                if repeat:
                    row["repeat_stable"] = vhash(fetch(fn)) == vhash(rdf)
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
        if row.get("repeat_stable") is False:
            status += " UNSTABLE"
        print(f"{name}: {status} rows={row.get('rows')} {row['sec']}s", flush=True)

    with open("/tmp/driver_sim_out.json", "w") as f:
        json.dump(out, f, indent=1)
    bad = [n for n, r in out.items()
           if "err" in r or r.get("hash_match") is False
           or r.get("repeat_stable") is False]
    print("BAD:", bad)
    ray.shutdown()


if __name__ == "__main__":
    main()
