#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, read <outDir>/<name> parquet (Spark result), run the
oracle SQL from oracle_sql.json in DuckDB over the same sf tables,
sort columns by name + rows by all columns, and compare cell values.
"""
import datetime, glob, json, math, os, subprocess, sys
import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

# Staleness guard: a PASS over output generated before the last edit is
# not a gate (round 5 shipped exactly that — /tmp/verify_out predated the
# q47 fix commit). Print when the Verify dump was produced and what HEAD
# is, and refuse output older than the newest tracked source file.
dump_path = f"{outdir}/oracle_sql.json"
if not os.path.exists(dump_path):
    print(f"MISSING: {dump_path} not found — run graft.Verify first")
    sys.exit(2)
dump_mtime = os.path.getmtime(dump_path)
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
head = subprocess.run(["git", "-C", repo, "log", "-1", "--format=%h %ci"],
                      capture_output=True, text=True).stdout.strip()
# --others --exclude-standard: a brand-new not-yet-added .scala file is
# the normal state when this guard matters most (pre-commit), so
# untracked source must count toward staleness too
tracked = subprocess.run(
    ["git", "-C", repo, "ls-files", "--cached", "--others",
     "--exclude-standard", "src", "build.sbt"],
    capture_output=True, text=True).stdout.split()
src_mtime = max((os.path.getmtime(os.path.join(repo, f))
                 for f in tracked if os.path.exists(os.path.join(repo, f))), default=0)
print(f"verify dump: {datetime.datetime.fromtimestamp(dump_mtime):%Y-%m-%d %H:%M:%S}"
      f"  (HEAD: {head})")
if dump_mtime < src_mtime:
    newest = max((f for f in tracked if os.path.exists(os.path.join(repo, f))),
                 key=lambda f: os.path.getmtime(os.path.join(repo, f)))
    print(f"STALE: {outdir} predates {newest} "
          f"({datetime.datetime.fromtimestamp(src_mtime):%H:%M:%S}) — re-run graft.Verify")
    sys.exit(2)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(norm(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)

import pyarrow as pa

def type_class(t):
    """Coarse arrow-type class for driver-hash compatibility.

    The driver's hasher is TYPE-SENSITIVE where string canon here is
    not: decimal128 (DuckDB HUGEINT, e.g. an uncast sum(BIGINT)) vs
    int64 hash-mismatches even when every cell value agrees (r08 q230),
    as does decimal vs float (r03 q47). Classes that must match on
    both sides: decimal / floating / integer. Width within a class is
    fine (driver passed int32-vs-int64 pairs for 8 rounds)."""
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_integer(t):
        return "int"
    return "other"

def type_sig(t):
    """Recursive class signature: lists/structs carry their element/field
    signatures so a nested numeric-class divergence (e.g. a list<decimal>
    vs list<int64> in an aux-store-backed query) is flagged the same way
    a top-level one is."""
    if pa.types.is_map(t):
        return ("map", type_sig(t.key_type), type_sig(t.item_type))
    if pa.types.is_list(t) or pa.types.is_large_list(t) or \
            pa.types.is_fixed_size_list(t):
        return ("list", type_sig(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple(sorted((f.name, type_sig(f.type)) for f in t)))
    return type_class(t)

def sig_conflict(a, b):
    """True when the two signatures would hash differently for the
    driver: numeric classes differ, OR exactly one side is numeric
    (a string-vs-numeric drift is just as type-sensitive), recursing
    into list elements and shared struct fields. Two distinct 'other'
    scalars (e.g. date vs timestamp) are left to value canon."""
    num = {"decimal", "float", "int"}
    if isinstance(a, str) and isinstance(b, str):
        return a != b and (a in num or b in num)
    if isinstance(a, tuple) and isinstance(b, tuple):
        if a[0] != b[0]:
            return True  # list vs struct vs map: typing-only divergence
        if a[0] == "list":
            return sig_conflict(a[1], b[1])
        if a[0] == "map":
            return sig_conflict(a[1], b[1]) or sig_conflict(a[2], b[2])
        am, bm = dict(a[1]), dict(b[1])
        if set(am) != set(bm):
            return True  # nested field-name drift is typing-only too
        return any(sig_conflict(s, bm[f]) for f, s in a[1])
    # container vs scalar: value canon cannot agree on such shapes anyway
    return isinstance(a, tuple) != isinstance(b, tuple)

def type_mismatches(spark_tbl, duck_tbl):
    d_by_name = {f.name: f.type for f in duck_tbl.schema}
    bad = []
    for f in spark_tbl.schema:
        dt = d_by_name.get(f.name)
        if dt is None:
            continue  # column-set diff reported separately
        if sig_conflict(type_sig(f.type), type_sig(dt)):
            bad.append(f"{f.name}: spark={f.type} duck={dt}")
    return bad

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        # Read the Spark result with pyarrow, NOT duckdb: duckdb's .df()
        # silently coerces DECIMAL to float64, which hid a decimal-typed
        # Spark column (q47 percentile) from this local gate while the
        # driver's native read hash-mismatched it (r03+r04 q47 flake).
        spark_tbl = pq.read_table(sorted(glob.glob(f"{outdir}/{name}/*.parquet")))
        spark_df = spark_tbl.to_pandas()
        # .arrow() not .df(): pandas conversion coerces date32 to a
        # midnight timestamp and DECIMAL to float64; arrow keeps both.
        duck_tbl = con.execute(sql).arrow()
        duck_df = duck_tbl.to_pandas()
        sc, sr = canon(spark_df)
        dc, dr = canon(duck_df)
        tmis = type_mismatches(spark_tbl, duck_tbl)
        if tmis:
            print(f"FAIL {name}: type class mismatch (driver hash would differ): "
                  + "; ".join(tmis))
            fails += 1
        elif sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            fails += 1
        elif sr != dr:
            n = sum(1 for a, b in zip(sr, dr) if a != b) + abs(len(sr) - len(dr))
            print(f"FAIL {name}: rows differ (spark={len(sr)} duck={len(dr)}, {n} mismatched)")
            for a, b in list(zip(sr, dr))[:200]:
                if a != b:
                    print(f"   spark={a}\n   duck ={b}")
                    break
            fails += 1
        else:
            print(f"OK   {name}: {len(sr)} rows")
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1
print(f"\n{'PASS' if fails == 0 else 'FAIL'}: {len(oracle) - fails}/{len(oracle)} oracle-matched")
sys.exit(1 if fails else 0)
