"""Run the driver contract end-to-end: every queries() entry vs its
DuckDB oracle at sf0.01, comparing row count / sorted-column schema /
value hash the way the external driver does (columns sorted by name,
rows sorted, floats to 6 significant figures).

Usage:
    python tools/verify_contract.py            # all queries
    python tools/verify_contract.py q1 q2 ...  # subset

Exit code 0 iff every checked query matches.
"""
import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def frame_hash(df):
    """df: pandas DataFrame -> (n_rows, sorted_cols, sha256)."""
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in rec)
            for rec in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")
    return len(rows), cols, h.hexdigest()


def main():
    import __spark_entry__ as E
    from wdel_spark.session import get_spark

    names = sys.argv[1:]
    qs, oracles = E.queries(), E.oracle_sql()
    if not names:
        names = list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    spark = get_spark("verify", cores=8, shuffle_partitions=8)
    failures = []
    for name in names:
        try:
            sp = qs[name](spark, SF).toPandas()
            n_s, c_s, h_s = frame_hash(sp)
            if name not in oracles:
                print(f"{name:34s} rows={n_s:7d}  NO-ORACLE (rows-only)")
                continue
            oc = con.execute(oracles[name]).df()
            n_o, c_o, h_o = frame_hash(oc)
            ok = (n_s == n_o) and (c_s == c_o) and (h_s == h_o)
            tag = "OK " if ok else "FAIL"
            print(f"{name:34s} rows={n_s:7d}/{n_o:<7d} "
                  f"schema={'=' if c_s == c_o else '!'} "
                  f"hash={'=' if h_s == h_o else '!'}  {tag}")
            if not ok:
                failures.append(name)
                if c_s != c_o:
                    print(f"    spark cols:  {c_s}\n    oracle cols: {c_o}")
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"{name:34s} ERROR {type(exc).__name__}: {exc}")
            failures.append(name)

    # driver smoke: entry() runs and yields >= 0 rows with stable schema
    ent = E.entry(spark)
    print(f"entry() smoke: {len(ent.columns)} cols, {ent.count()} rows")

    print(f"\n{len(names) - len(failures)}/{len(names)} match")
    if failures:
        print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
