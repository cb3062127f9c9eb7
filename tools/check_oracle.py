#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads <out>/<name>/ parquet (Spark result) and <out>/oracle_sql.json,
registers the sf tables as DuckDB views, runs each oracle, and compares:
row count, column names/types (loosely), and values (sorted rows, sorted
columns, exact for non-floats, tiny-epsilon for floats).
"""
import json, math, os, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(out_dir, name):
    path = os.path.join(out_dir, name)
    return pq.read_table(path)

def norm_rows(cols):
    # cols: dict name -> list of python values; return sorted list of tuples over sorted names
    names = sorted(cols.keys())
    rows = list(zip(*[cols[n] for n in names])) if names else []
    def key(row):
        return tuple((v is None, str(v)) for v in row)
    return names, sorted(rows, key=key)

def toplist(tbl):
    return {name: tbl.column(name).to_pylist() for name in tbl.schema.names}

def cmp_val(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_tbl = load_spark(out_dir, name)
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            duck_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        sn, srows = norm_rows(toplist(spark_tbl))
        dn, drows = norm_rows(toplist(duck_tbl))
        if sn != dn:
            print(f"FAIL {name}: columns differ spark={sn} duck={dn}"); n_fail += 1; continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}"); n_fail += 1; continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            for c, (a, b) in enumerate(zip(sr, dr)):
                if not cmp_val(a, b):
                    bad = (i, sn[c], a, b); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            # also flag schema-type mismatches (informational)
            st = {f.name: str(f.type) for f in spark_tbl.schema}
            dt = {f.name: str(f.type) for f in duck_tbl.schema}
            diff = {k: (st[k], dt[k]) for k in st if st[k] != dt.get(k)}
            note = f"  [types: {diff}]" if diff else ""
            print(f"PASS {name} ({len(srows)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
