"""Simulate the spark-graft driver: import __spark_entry__, smoke entry(),
run every queries() entry at sf0.01 against oracle_sql() via DuckDB.

A FULL sweep (no argv filter) also persists SWEEP_r{N}.json at the repo
root — per-query rows/match/seconds — because the real driver's
CORRECTNESS_r{N}.json samples a fixed 50 of the 200 queries, leaving the
rest with no committed hard signal (VERDICT r10 #2). N is the round being
built: max round over existing CORRECTNESS_r*.json + 1, overridable via
$SPARK_GRAFT_ROUND."""
import glob, json, os, re, sys, time, math
sys.path.insert(0, "/root/repo")
from datetime import date, datetime
from decimal import Decimal

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as ep

# Deliberately a BARE session — the real driver does not set any engine
# confs (no nanosAsLong, no UTC timezone), so neither do we; the engine
# must work on any driver-supplied session. (Container TZ is UTC.)
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# t1 smoke
df = ep.entry(spark)
rows = df.count()
print(f"[t1] entry() -> {rows} rows, schema: {[f.name for f in df.schema.fields][:6]}...")
assert rows > 0

# t2 correctness
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, bool): return str(v)
    if isinstance(v, float): return "NaN" if math.isnan(v) else repr(v)
    # raw str(), NO normalize(): the real driver hashes decimal values
    # representation-sensitively, so Spark DECIMAL(38,8) '1.20000000' vs
    # DuckDB DECIMAL(38,2) '1.20' must FAIL here like it fails there.
    if isinstance(v, Decimal): return str(v)
    if isinstance(v, datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date): return v.isoformat()
    return str(v)

qs, oracles = ep.queries(), ep.oracle_sql()
# optional argv filter: `python tools/driver_sim.py q_foo q_bar` or substring
full_sweep = len(sys.argv) <= 1
if not full_sweep:
    pats = sys.argv[1:]
    qs = {k: v for k, v in qs.items() if any(p in k for p in pats)}
ok = fail = 0
sweep: dict[str, dict] = {}
import gc


def _reclaim():
    """Release per-query engine state between sweep queries: cached
    frames unpersist via clearCache; dropping Python references + a GC
    pass lets Spark's ContextCleaner evict localCheckpoint RDD blocks
    (trainers pin per-round frames there). Without this a 200+-query
    single-JVM sweep accumulates blocks until the 1g bare-session heap
    OOMs (first seen at ~67 queries once the v10 chain landed); the
    real driver's 50-query sample never gets near the edge."""
    try:
        spark.catalog.clearCache()
    except Exception:
        pass
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


for name, fn in sorted(qs.items()):
    t0 = time.time()
    sdf = fn(spark, "/root/testdata/sf0.01")
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        # the real driver records err:no_oracle — a FAILURE, not a fallback
        print(f"[t2] {name}: NO ORACLE ({len(srows)} rows) -> fail")
        sweep[name] = {"rows": len(srows), "match": False,
                       "err": "no_oracle", "sec": round(time.time() - t0, 1)}
        fail += 1
        continue
    # HARD RULE: no DECIMAL in any final schema, either engine. The real
    # driver's value hash is representation-sensitive for decimals (round-1
    # VERDICT: all 12 hash-fails carried DECIMAL outputs, all green queries
    # ended in double/int/string/date) — so a decimal output is a gate
    # failure even when str() comparison happens to agree locally.
    sdec = [f.name for f in sdf.schema.fields if "Decimal" in type(f.dataType).__name__]
    d = con.sql(oracles[name]); dcols, drows = d.columns, d.fetchall()
    ddec = [c for c, t in zip(d.columns, d.types) if "DECIMAL" in str(t)]
    if sdec or ddec:
        print(f"[t2] {name}: DECIMAL in output (spark={sdec} oracle={ddec}) -> fail")
        sweep[name] = {"rows": len(srows), "match": False,
                       "err": "decimal_output", "sec": round(time.time() - t0, 1)}
        fail += 1
        continue
    # HARD RULE: no HUGEINT either. DuckDB promotes sum(BIGINT) to HUGEINT
    # (int128); Spark has no int128, and the real driver's value hash is
    # type-representation-sensitive (round-2 VERDICT: all 3 hash-fails were
    # windowed/grouped sums left as HUGEINT in the oracle SQL). Any oracle
    # emitting HUGEINT must CAST(... AS BIGINT) explicitly.
    dhuge = [c for c, t in zip(d.columns, d.types) if "HUGEINT" in str(t)]
    # Cross-engine type-CLASS check: integer-vs-float mismatch per column
    # renders differently under str() on some values, so flag it here.
    _INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
            "USMALLINT", "UINTEGER", "UBIGINT"}
    _SPARK_INT = {"ByteType", "ShortType", "IntegerType", "LongType"}
    _SPARK_FLT = {"FloatType", "DoubleType"}
    smap = {f.name: type(f.dataType).__name__ for f in sdf.schema.fields}
    tclash = []
    for c, t in zip(d.columns, d.types):
        st = smap.get(c)
        if st is None:
            continue
        dt = str(t)
        if (dt in _INT and st in _SPARK_FLT) or (
                dt in ("DOUBLE", "FLOAT") and st in _SPARK_INT):
            tclash.append(f"{c}:spark={st}/duck={dt}")
    if dhuge or tclash:
        print(f"[t2] {name}: TYPE LINT (hugeint={dhuge} clash={tclash}) -> fail")
        sweep[name] = {"rows": len(srows), "match": False,
                       "err": "type_lint", "sec": round(time.time() - t0, 1)}
        fail += 1
        continue
    idx_s = sorted(range(len(scols)), key=lambda i: scols[i])
    idx_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    a = sorted("|".join(norm(r[i]) for i in idx_s) for r in srows)
    b = sorted("|".join(norm(r[i]) for i in idx_d) for r in drows)
    match = (len(srows) == len(drows)) and (sorted(scols) == sorted(dcols)) and a == b
    print(f"[t2] {name}: rows={len(srows)} match={match} ({time.time()-t0:.1f}s)")
    sweep[name] = {"rows": len(srows), "match": bool(match),
                   "err": None if match else "value_mismatch",
                   "sec": round(time.time() - t0, 1)}
    ok += match; fail += (not match)
    del sdf
    _reclaim()
print(f"RESULT: {ok} match, {fail} mismatch, {len(qs)-len(oracles)} rows-only")
if full_sweep:
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        done = [int(m.group(1)) for p in glob.glob("/root/repo/CORRECTNESS_r*.json")
                if (m := re.search(r"_r(\d+)\.json$", p))]
        rnd = str(max(done, default=0) + 1)
    out = f"/root/repo/SWEEP_r{int(rnd):02d}.json"
    with open(out, "w") as fh:
        json.dump({"summary": {"match": ok, "mismatch": fail,
                               "total": len(qs), "sf": 0.01},
                   "queries": sweep}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"[sweep] wrote {out}")
sys.exit(1 if fail else 0)
