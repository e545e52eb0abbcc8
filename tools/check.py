#!/usr/bin/env python3
"""Dev-only local emulation of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each <outDir>/<name> parquet dir, executes the matching oracle SQL in
DuckDB against the same sfDir parquet tables and compares values
(columns sorted by name, rows sorted, floats rounded to 9 sig figs).
Not shipped library code — mirrors what the driver does so failures
surface before the round gate.
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# GRAFT_EXACT=1: full-precision float repr (the driver hash-compares raw
# values, so 9-sig-fig normalization here can hide last-ULP divergence —
# it did for q_text_repetition in r3).
EXACT = __import__("os").environ.get("GRAFT_EXACT", "") == "1"


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        if EXACT:
            return repr(v)
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("|".join(norm_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


# DuckDB fetched-type → coarse class the driver's raw hash distinguishes.
# HUGEINT-vs-BIGINT, DECIMAL-vs-DOUBLE, TIMESTAMP_NS-vs-TIMESTAMP all
# hash differently driver-side even when normalized strings match, so a
# local pass must require same-class types on both sides (r4 lesson:
# 4 gates were locally green / driver red purely on these).
def type_class(t):
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    if t == "HUGEINT" or t == "UHUGEINT":
        return "HUGEINT"
    if t in ("FLOAT", "DOUBLE"):
        return "FLOAT"
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    if t.startswith("TIMESTAMP") or t == "DATE" or t.startswith("TIME"):
        return t  # exact: ns-vs-us-vs-date all encode differently
    if t in ("VARCHAR", "BOOLEAN", "BLOB"):
        return t
    return t


def types_of(rel):
    return {c: type_class(t) for c, t in zip(rel.columns, rel.types)}


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_nosql = 0
    for name in names:
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        gcols, grows = table_repr(got_rel.columns, got_rel.fetchall())
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows={len(grows)})")
            n_nosql += 1
            continue
        try:
            want_rel = con.sql(oracle[name])
            wcols, wrows = table_repr(want_rel.columns, want_rel.fetchall())
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        gtypes, wtypes = types_of(got_rel), types_of(want_rel)
        type_diff = {c: (gtypes.get(c), wtypes.get(c))
                     for c in set(gtypes) | set(wtypes)
                     if gtypes.get(c) != wtypes.get(c)}
        if gcols != wcols:
            print(f"  ✗ {name}: column mismatch\n      spark={gcols}\n      duck ={wcols}")
            n_fail += 1
        elif type_diff:
            print(f"  ✗ {name}: fetched-TYPE mismatch (driver hash would diverge): {type_diff}")
            n_fail += 1
        elif grows != wrows:
            n_fail += 1
            diff = [(a, b) for a, b in zip(grows, wrows) if a != b][:3]
            print(f"  ✗ {name}: {len(grows)} vs {len(wrows)} rows; first diffs:")
            for a, b in diff:
                print(f"      spark: {a[:160]}\n      duck : {b[:160]}")
            if len(grows) != len(wrows):
                only_g = set(grows) - set(wrows)
                only_w = set(wrows) - set(grows)
                for x in list(only_g)[:2]:
                    print(f"      only-spark: {x[:160]}")
                for x in list(only_w)[:2]:
                    print(f"      only-duck : {x[:160]}")
        else:
            print(f"  ✓ {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_nosql}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
