#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against Verify output.

Mirrors the driver's correctness gate: for each query, run the oracle SQL
in DuckDB over the testdata parquet tables, load the Spark result parquet,
sort columns by name, canonicalize rows, and compare cell-by-cell.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # STRICT: repr round-trips the exact double and, unlike float
        # equality, distinguishes -0.0 from 0.0 — the driver's hash is
        # sign-sensitive (gr_modularity r11/r12), and the old `v + 0.0`
        # normalization here masked exactly that failure for two rounds.
        # A mirror must never be more lenient than the gate it mirrors.
        return repr(v)
    if isinstance(v, (list, tuple, dict)):
        # The DRIVER's pandas comparator cannot hash list/dict cells and
        # errors the gate (sk_hll_distinct, CORRECTNESS_r13). The old
        # tuple-canonicalization here was MORE lenient than the gate it
        # mirrors — it passed 265/265 locally while the driver showed
        # 264/265. A mirror must fail exactly where the driver fails.
        raise TypeError(
            f"nested cell {type(v).__name__} — driver pandas compare would "
            "die on this; array_join(...,'|') the column (r01 convention)")
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s[:-6] if s.endswith("+00:00") else s
    if isinstance(v, bytes):
        return v.hex()
    return v


def load_rows(table, col_order):
    cols = sorted(col_order)
    data = {name: table.column(name).to_pylist() for name in table.column_names}
    n = table.num_rows
    return [tuple(canon(data[c][i]) for c in cols) for i in range(n)], cols


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    # stamp comparator-stack versions so driver-vs-local float drift
    # (ops_psm_att, CORRECTNESS_r15) is diagnosable from artifacts alone
    try:
        import pandas
        pandas_v = pandas.__version__
    except Exception:
        pandas_v = "absent"
    try:
        import pyarrow
        arrow_v = pyarrow.__version__
    except Exception:
        arrow_v = "absent"
    print(f"# comparator stack: duckdb={duckdb.__version__} "
          f"pandas={pandas_v} pyarrow={arrow_v} "
          f"python={sys.version.split()[0]}")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = out_dir / name
        if not qdir.exists():
            print(f"FAIL {name}: no Spark output")
            n_fail += 1
            continue
        try:
            spark_tbl = pq.read_table(qdir)
            duck_tbl = con.sql(oracle[name]).arrow()
            s_rows, s_cols = load_rows(spark_tbl, spark_tbl.column_names)
            d_rows, d_cols = load_rows(duck_tbl, duck_tbl.column_names)
            if s_cols != d_cols:
                print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
                n_fail += 1
                continue
            # driver may or may not sort rows; require BOTH orderings to match
            if s_rows == d_rows:
                print(f"PASS {name} ({len(s_rows)} rows)")
                n_pass += 1
            elif sorted(map(repr, s_rows)) == sorted(map(repr, d_rows)):
                print(f"WARN {name}: rows match only after sorting (ordering differs)")
                n_fail += 1
            else:
                n_fail += 1
                sset = {repr(r) for r in s_rows}
                dset = {repr(r) for r in d_rows}
                only_s = [r for r in s_rows if repr(r) not in dset][:3]
                only_d = [r for r in d_rows if repr(r) not in sset][:3]
                print(f"FAIL {name}: {len(s_rows)} spark rows vs {len(d_rows)} duck rows")
                for r in only_s:
                    print(f"  spark-only: {r}")
                for r in only_d:
                    print(f"  duck-only:  {r}")
                if not only_s and not only_d:
                    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                        if a != b:
                            print(f"  first order diff at row {i}:\n   s={a}\n   d={b}")
                            break
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
