#!/usr/bin/env python3
"""Local pre-check replicating the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the oracle SQL from oracle_sql.json in DuckDB over the testdata
tables, sort columns by name, sort rows, canonicalize (doubles rounded
to 1e-9), and diff. Prints PASS/FAIL per query.
"""
import json, math, sys, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 9):.9f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return sorted(cols), sorted(data)


def contract_violations(con, qdir, oracle_sql):
    """The DRIVER's compare is pandas-based (.df() + sort_values), which is
    stricter than this checker's canonicalized fetchall: Spark DECIMAL
    output columns hash as object-Decimal vs DuckDB float64; DuckDB
    HUGEINT (SUM of integer) renders float64 vs Spark int64; and ARRAY
    columns crash sort_values outright. Enforce the resulting contract —
    project only BIGINT/INT/DOUBLE/STRING/BOOL/TIMESTAMP/DATE — so a
    query can never pass locally but red out on the driver."""
    bad = []
    spark_types = {r[0]: r[1] for r in
                   con.sql(f"DESCRIBE SELECT * FROM '{qdir}/*.parquet'").fetchall()}
    for c, t in spark_types.items():
        if "DECIMAL" in t or "[]" in t or "STRUCT" in t or "MAP" in t:
            bad.append(f"spark col {c}: {t} (driver-unhashable)")
    oracle_types = {}
    if oracle_sql is not None:
        oracle_types = {r[0]: r[1] for r in
                        con.sql(f"DESCRIBE {oracle_sql}").fetchall()}
        for c, t in oracle_types.items():
            if "DECIMAL" in t or "HUGEINT" in t or "[]" in t or "STRUCT" in t:
                bad.append(f"oracle col {c}: {t} (pandas renders != Spark dtype; CAST it)")
    ints = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
            "USMALLINT", "UINTEGER", "UBIGINT")
    for c in set(spark_types) & set(oracle_types):
        s, o = spark_types[c], oracle_types[c]
        if (s in ints) != (o in ints) and "DECIMAL" not in s + o and "HUGEINT" not in o:
            bad.append(f"col {c}: spark {s} vs oracle {o} (int/float dtype mismatch)")
    return bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table directory (e.g. the ScaleUp 10x data)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    npass = nfail = nskip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        viol = contract_violations(con, qdir, oracle.get(name))
        if viol:
            print(f"FAIL {name}: driver-contract violation:")
            for v in viol:
                print(f"  {v}")
            nfail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name} (no oracle) rows={len(got_rel.fetchall())}")
            nskip += 1
            continue
        gcols, got = rows_of(got_rel)
        try:
            ecols, exp = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            nfail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            nfail += 1
        elif got != exp:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            sg, se = set(got), set(exp)
            for r in list(sg - se)[:3]:
                print(f"  spark-only: {r}")
            for r in list(se - sg)[:3]:
                print(f"  oracle-only: {r}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            npass += 1
    print(f"\n{npass} pass, {nfail} fail, {nskip} no-oracle")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
