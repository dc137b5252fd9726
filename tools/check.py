#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads <outDir>/<name> parquet dirs written by graft.Verify plus
<outDir>/oracle_sql.json, runs each oracle in DuckDB against the
tables in <sfDir>, and compares (schema-sorted columns, row-sorted
values) — prints PASS/FAIL per query.
"""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            err = ""
            err_path = f"{out_dir}/{name}.err.txt"
            if os.path.exists(err_path):
                err = ": " + open(err_path).read().strip().split("\n")[0][:200]
            print(f"FAIL {name}: no spark output{err}")
            n_fail += 1
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        mine = mine[sorted(mine.columns)]
        want = want[sorted(want.columns)]
        ok = list(mine.columns) == list(want.columns)
        msg = ""
        if not ok:
            msg = f"cols {list(mine.columns)} vs {list(want.columns)}"
        if ok:
            # DTYPE-STRICT: the driver's hash is dtype/repr-sensitive
            # (122500 int64 != 122500.0 float64 even though == passes).
            # An uncast DuckDB sum() comes back HUGEINT -> float64 and
            # hid red for three rounds behind the == comparison below —
            # fail loudly on any dtype-KIND mismatch per column.
            kind_bad = [c for c in mine.columns
                        if mine[c].dtype.kind != want[c].dtype.kind]
            if kind_bad:
                ok = False
                msg = "dtype-kind mismatch " + ", ".join(
                    f"{c}: spark {mine[c].dtype} vs oracle {want[c].dtype}"
                    for c in kind_bad)
        if ok:
            def norm(df):
                # NaN != NaN would make identical rows compare unequal
                def f(v):
                    if v is None or (isinstance(v, float) and v != v):
                        return "<NULL>"
                    return v
                return sorted((tuple(f(v) for v in row)
                               for row in df.itertuples(index=False)),
                              key=lambda t: [repr(x) for x in t])
            mv = norm(mine)
            wv = norm(want)
            ok = mv == wv
            if not ok:
                msg = f"rows {len(mv)} vs {len(wv)}"
                for a, b in zip(mv, wv):
                    if a != b:
                        msg += f"; first diff:\n  mine {a}\n  want {b}"
                        break
        print(("PASS" if ok else "FAIL"), name,
              f"({len(mine)} rows)" if ok else msg)
        n_pass += ok
        n_fail += not ok
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
