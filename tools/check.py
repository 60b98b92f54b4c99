#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [only] [--json out.json]
       [--timeout-s N]

For each query dumped by graft.Verify, runs the oracle SQL in DuckDB over
the same parquet tables and compares: schema (column names), row count,
and a hash over values with columns sorted by name and rows sorted.

--json writes a CORRECTNESS_r{N}.json-shaped artifact (status per query).
--timeout-s interrupts any oracle query running longer than N seconds and
records it as "skip" (oracle-infeasible at this SF), not a failure — the
standing sf1 gate uses this to bound the DuckDB side objectively instead
of curating a skip list by hand (VERDICT r10 item 1).
"""
import sys, json, glob, os, threading
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                          type(v).__name__ == "ndarray" else v)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def run_with_timeout(con, sql, timeout_s):
    """Execute sql; raise TimeoutError if it exceeds timeout_s (DuckDB
    interrupt from a timer thread)."""
    if not timeout_s:
        return con.execute(sql).df()
    timer = threading.Timer(timeout_s, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).df()
    except duckdb.InterruptException:
        raise TimeoutError(f"oracle exceeded {timeout_s}s")
    finally:
        timer.cancel()

def main():
    # proper flag parsing: flag VALUES must not leak into positionals
    # (a --json path landing in the `only` slot silently matches zero
    # queries — "0 pass, 0 fail" instead of a full run)
    args, json_out, timeout_s = [], None, None
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--json":
            json_out = next(it)
        elif a == "--timeout-s":
            timeout_s = float(next(it))
        else:
            args.append(a)
    sf_dir, out_dir = args[0], args[1]
    results = {}
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(args[2].split(",")) if len(args) > 2 else None
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        def record(status, msg=None):
            results[name] = {"status": status, "err": msg}
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            record("fail", "no spark output"); continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            exp = norm(run_with_timeout(con, oracle[name], timeout_s))
        except TimeoutError as e:
            print(f"SKIP {name}: {e}"); n_skip += 1
            record("skip", str(e)); continue
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1
            record("fail", f"oracle error: {e}"); continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1
            record("fail", "column mismatch"); continue
        # The driver's hash is dtype-sensitive: DuckDB sum() over ints
        # returns HUGEINT which pandas converts to float64 -> hash
        # mismatch vs Spark's int64 even when values are equal. Fail on
        # numeric-kind divergence (oracle SQL needs CAST(... AS BIGINT)).
        kind_bad = [c for c in got.columns
                    if (pd.api.types.is_float_dtype(got[c])
                        != pd.api.types.is_float_dtype(exp[c]))
                    or (pd.api.types.is_integer_dtype(got[c])
                        != pd.api.types.is_integer_dtype(exp[c]))]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch "
                  + ", ".join(f"{c}: spark={got[c].dtype} oracle={exp[c].dtype}"
                              for c in kind_bad))
            n_fail += 1; record("fail", "dtype kind mismatch"); continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1
            record("fail", f"rows {len(got)} vs {len(exp)}"); continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
            record("pass")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:500]}"); n_fail += 1
            record("fail", f"value mismatch: {str(e)[:300]}")
    print(f"\n{n_pass} pass, {n_fail} fail" +
          (f", {n_skip} skip (oracle timeout)" if n_skip else ""))
    if json_out:
        summary = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                   "n_skip": n_skip, "queries": results}
        json.dump(summary, open(json_out, "w"), indent=1)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
