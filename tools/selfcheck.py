#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare (dev tool only; the
shipped engine is pure Scala/Spark and never imports this).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
    python3 tools/selfcheck.py <sfDir> <outDir>

For each query: load Spark's parquet result and DuckDB's oracle result,
sort columns by name, compare row-by-row with exact equality (reporting
near-misses on floats separately so rounding hazards are visible).
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark_result(path):
    # Verify writes a directory with part files
    import glob
    parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not parts:
        return None
    t = pq.read_table(parts[0])
    for p in parts[1:]:
        import pyarrow as pa
        t = pa.concat_tables([t, pq.read_table(p)])
    return t


def norm(v):
    # normalize timestamps/dates/decimals to comparable primitives
    import datetime, decimal
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        f = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(f):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")

    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spath = os.path.join(out_dir, name)
        st = load_spark_result(spath)
        if st is None:
            print(f"FAIL {name}: no spark output at {spath}")
            n_fail += 1
            continue
        try:
            dt = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, dcols = sorted(st.column_names), sorted(dt.column_names)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            n_fail += 1
            continue
        # The driver's hash normalizes width-only differences (int32 vs
        # int64, timestamp ns vs us: all r6-green) but NOT integer vs
        # decimal128 — DuckDB's HUGEINT (e.g. sum of CASE WHEN) arrives
        # as decimal128(38,0) and hash-diverged from Spark's BIGINT in
        # r6 (`ops_profile`). Flag exactly that family mismatch; fix is
        # CAST(... AS BIGINT) in the oracle SQL.
        import pyarrow.types as pt
        tbad = []
        for c in scols:
            sty = st.schema.field(c).type
            dty = dt.schema.field(c).type
            if pt.is_decimal(sty) != pt.is_decimal(dty):
                tbad.append((c, str(sty), str(dty)))
        if tbad:
            print(f"FAIL {name}: integer/decimal physical type mismatch "
                  f"(driver hash diverges, cf. ops_profile r6): {tbad}")
            n_fail += 1
            continue
        if st.num_rows != dt.num_rows:
            print(f"FAIL {name}: rows spark={st.num_rows} duck={dt.num_rows}")
            n_fail += 1
            continue
        srows = list(zip(*[[norm(v) for v in st[c].to_pylist()] for c in scols]))
        drows = list(zip(*[[norm(v) for v in dt[c].to_pylist()] for c in scols]))
        bad = None
        near = 0
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                # float near-miss?
                ok = True
                for x, y in zip(a, b):
                    if x == y:
                        continue
                    if isinstance(x, float) and isinstance(y, float) and \
                       math.isfinite(x) and math.isfinite(y) and \
                       abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)):
                        near += 1
                        continue
                    ok = False
                if not ok:
                    bad = (i, a, b)
                    break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} spark={a} duck={b}")
            n_fail += 1
        elif near:
            print(f"WARN {name}: {near} float near-misses (would hash-mismatch!)")
            n_fail += 1
        else:
            print(f"PASS {name} ({st.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
