#!/usr/bin/env python3
"""Checkpointable DuckDB oracle compare — the sf1 edition of check.py.

Usage: python3 tools/check_ckpt.py <sfDir> <outDir> <ckpt.json> \
           [--only q_a,q_b] [--timeout-s N] [--threads N]

Same compare as tools/check.py (schema-sorted columns, row-sorted
values, NaN/None normalized), but each query's verdict and wall time
are appended to <ckpt.json> as they finish, queries already recorded
there are skipped on re-run, and a per-query wall-clock budget lets a
long round run the expensive oracles incrementally across sessions.
A query whose ORACLE exceeds the budget is recorded as
"skip_oracle_cost" with the measured time — the documented exclusion
class from NOTES_r7 — and is retried only if the budget grows.
"""
import sys, json, glob, os, time


def load_ckpt(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def save_ckpt(path, ckpt):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ckpt, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def norm(df):
    def f(v):
        if v is None or (isinstance(v, float) and v != v):
            return "<NULL>"
        return v
    return sorted((tuple(f(v) for v in row)
                   for row in df.itertuples(index=False)),
                  key=lambda t: [repr(x) for x in t])


def main(argv):
    import duckdb
    sf_dir, out_dir, ckpt_path = argv[1], argv[2], argv[3]
    only, timeout_s, threads, sample_mod = None, None, None, None
    i = 4
    while i < len(argv):
        if argv[i] == "--only":
            only = set(argv[i + 1].split(",")); i += 2
        elif argv[i] == "--timeout-s":
            timeout_s = float(argv[i + 1]); i += 2
        elif argv[i] == "--threads":
            threads = int(argv[i + 1]); i += 2
        elif argv[i] == "--sample-mod":
            # sampled-cohort gate: the engine dump was produced with
            # SPARK_GRAFT_SAMPLE_MOD=k (Tables.maybeSample restricts
            # documents/embeddings to id % k == 0); mirror the SAME
            # predicate in the oracle views so both engines compute
            # over the identical cohort. Verdicts are recorded as
            # pass_sampled with the modulus, never as a plain pass.
            sample_mod = int(argv[i + 1]); i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads TO {threads}")
    sampled_ids = {"documents": "doc_id", "embeddings": "vec_id"}
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            where = (f" WHERE {sampled_ids[t]} % {sample_mod} = 0"
                     if sample_mod and t in sampled_ids else "")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'{where}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ckpt = load_ckpt(ckpt_path)
    # A skip_oracle_cost record whose t_oracle_s was RECORDED is the
    # signature of the old watchdog race (the interrupt landed after
    # the oracle finished) — always re-run those.
    # A pass_sampled record is terminal only for a re-run with the SAME
    # sampling modulus: a full-width (or differently-sampled) invocation
    # resumed from a sampled checkpoint must re-run the query, or the
    # final gate reads as complete on cohort-only evidence.
    todo = [n for n in sorted(oracle)
            if (only is None or n in only)
            and not (n in ckpt and (
                ckpt[n]["status"] == "pass"
                or (ckpt[n]["status"] == "pass_sampled"
                    and ckpt[n].get("sample_mod") == sample_mod)
                or (ckpt[n]["status"] == "skip_oracle_cost"
                    and ckpt[n].get("t_oracle_s") is None
                    and timeout_s is not None
                    and ckpt[n].get("budget_s", 0) >= timeout_s)))]
    print(f"[ckpt] {len(ckpt)} recorded, {len(todo)} to run", flush=True)
    for name in todo:
        t0 = time.time()
        rec = {"status": "fail", "t_oracle_s": None, "detail": ""}
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            rec["detail"] = "no spark output"
        else:
            try:
                # oracle first, under the budget: duckdb 1.0 has no
                # statement_timeout, so a watchdog thread interrupts
                # the connection when the budget blows. The done flag
                # is set UNDER THE LOCK immediately after fetchdf
                # returns, which narrows (but cannot fully close — the
                # timer may fire in the instructions between fetchdf
                # returning and the lock acquisition) the window where
                # a late interrupt lands on the idle connection; the
                # read_parquet below therefore also RETRIES once on
                # INTERRUPT when the oracle time was already recorded,
                # so a stray late interrupt can never misclassify a
                # within-budget oracle as skip_oracle_cost.
                timer = None
                if timeout_s is not None:
                    import threading
                    lock = threading.Lock()
                    oracle_done = [False]

                    def _interrupt():
                        with lock:
                            if not oracle_done[0]:
                                con.interrupt()
                    timer = threading.Timer(timeout_s, _interrupt)
                    timer.start()
                try:
                    want = con.execute(oracle[name]).fetchdf()
                    if timer is not None:
                        with lock:
                            oracle_done[0] = True
                finally:
                    if timer is not None:
                        with lock:
                            oracle_done[0] = True
                        timer.cancel()
                rec["t_oracle_s"] = round(time.time() - t0, 2)
                try:
                    mine = con.execute(
                        f"SELECT * FROM read_parquet({files!r})").fetchdf()
                except Exception as e:
                    if "INTERRUPT" not in str(e).upper():
                        raise
                    # a late watchdog interrupt from the (finished)
                    # oracle landed here — the oracle was in budget
                    # (t_oracle_s is recorded), so retry once
                    mine = con.execute(
                        f"SELECT * FROM read_parquet({files!r})").fetchdf()
                mine = mine[sorted(mine.columns)]
                want = want[sorted(want.columns)]
                kind_bad = ([c for c in mine.columns
                             if mine[c].dtype.kind != want[c].dtype.kind]
                            if list(mine.columns) == list(want.columns)
                            else [])
                if list(mine.columns) != list(want.columns):
                    rec["detail"] = (f"cols {list(mine.columns)}"
                                     f" vs {list(want.columns)}")
                elif kind_bad:
                    # DTYPE-STRICT (same as check.py): the driver's
                    # hash is dtype/repr-sensitive; an uncast DuckDB
                    # sum() -> HUGEINT -> float64 vs Spark int64 must
                    # FAIL even though value == passes.
                    rec["detail"] = "dtype-kind mismatch " + ", ".join(
                        f"{c}: spark {mine[c].dtype}"
                        f" vs oracle {want[c].dtype}" for c in kind_bad)
                else:
                    mv, wv = norm(mine), norm(want)
                    if mv == wv:
                        rec["status"] = ("pass_sampled" if sample_mod
                                         else "pass")
                        rec["detail"] = f"{len(mv)} rows"
                        if sample_mod:
                            rec["sample_mod"] = sample_mod
                    else:
                        rec["detail"] = f"rows {len(mv)} vs {len(wv)}"
                        for a, b in zip(mv, wv):
                            if a != b:
                                rec["detail"] += (f"; first diff: mine "
                                                  f"{a} want {b}"[:400])
                                break
            except Exception as e:
                msg = str(e)
                if "INTERRUPT" in msg.upper() or "timeout" in msg.lower():
                    rec["status"] = "skip_oracle_cost"
                    rec["budget_s"] = timeout_s
                    rec["detail"] = f"oracle exceeded {timeout_s}s budget"
                else:
                    rec["detail"] = msg[:400]
        rec["t_total_s"] = round(time.time() - t0, 2)
        ckpt[name] = rec
        save_ckpt(ckpt_path, ckpt)
        print(f"[{rec['status'].upper():>16}] {name} "
              f"({rec['t_total_s']}s) {rec['detail'][:120]}", flush=True)
    counts = {}
    for rec in ckpt.values():
        counts[rec["status"]] = counts.get(rec["status"], 0) + 1
    print(f"== {counts} ==")
    return 1 if counts.get("fail", 0) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
