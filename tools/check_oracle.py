#!/usr/bin/env python3
"""Dev-only pre-validation of SparkEntry.oracleSql against Verify output.

Mirrors the driver's t2 gate: run each oracle SQL in DuckDB over the same
parquet fixture tables, compare to the Spark result parquet written by
`graft.Verify` (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
NOT part of the shipped library (driver-side python only).
"""
import sys, os, json, glob
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "supplier", "part", "nation",
              "region", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        # the driver's hash compare is TYPE-sensitive (r1 lesson: DuckDB
        # sum(BIGINT) widens to HUGEINT → hash mismatch on equal values).
        # r1 evidence: integer-WIDTH mismatches (int32 vs int64) still
        # hash-matched, so only kind-level divergence (int vs float/object,
        # i.e. HUGEINT/DECIMAL leakage) is a FAIL.
        def kind(dt):
            return "i" if dt.kind in "iu" else dt.kind
        bad_types = [f"{c}: spark={got[c].dtype} oracle={want[c].dtype}"
                     for c in got.columns
                     if kind(got[c].dtype) != kind(want[c].dtype)]
        if bad_types:
            print(f"FAIL {name}: dtype mismatch — " + "; ".join(bad_types))
            n_fail += 1; continue
        gs = got.sort_values(by=list(got.columns), ignore_index=True)
        ws = want.sort_values(by=list(want.columns), ignore_index=True)
        try:
            import pandas.testing as pdt
            pdt.assert_frame_equal(gs, ws, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1][:300]}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
