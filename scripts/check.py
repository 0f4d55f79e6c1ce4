#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
sf dir and compare (schema-insensitive: columns sorted by name, rows sorted,
values compared exactly; floats via repr)."""
import json, sys, glob, os
import duckdb
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
# optional 3rd arg: comma-separated query-name filter for targeted re-runs
# (heavy sf1 oracles make the full sweep hours; one new query needn't wait)
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

# record which commit produced this gate run (the round-13 verdict asked
# every dump/check artifact to pin its HEAD)
import subprocess
try:
    head = subprocess.run(["git", "-C", os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "rev-parse", "HEAD"],
        capture_output=True, text=True).stdout.strip()
    print(f"check.py @ {head[:12]}  outdir={outdir}  sfdir={sfdir}")
except Exception:
    pass

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

# ---- local-only UDF gates -------------------------------------------------
# t35's signal IS java.util.zip raw DEFLATE output (level 6, nowrap), which
# no SQL engine expresses. Since round 16 the SHIPPED oracle covers it: at
# dump time Verify exports the expected ratios computed by CPython zlib (a
# python3 subprocess — independent implementation, independent runtime) and
# oracle_sql.json reads that parquet back, so the driver's plain-SQL
# comparator gate-checks t35 like any other query. The UDF below remains as
# the belt-and-braces DIRECT gate: it recomputes the ratios from the raw
# documents table in THIS process and is injected only when a run's
# oracle_sql.json lacks the t35 entry (pre-round-16 dumps). Rounding
# mirrors the JVM exactly: BigDecimal.decimal(double).setScale(4, HALF_UP)
# == Decimal(float).quantize(1e-4, ROUND_HALF_UP).
def _register_local_udf_gates():
    import zlib
    from decimal import Decimal, ROUND_HALF_UP

    def zratio(s):
        if s is None or s == "":
            return None
        raw = s.encode("utf-8")
        c = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate, level 6
        n = len(c.compress(raw)) + len(c.flush())
        return float(Decimal(n / len(raw)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP))

    try:
        con.create_function("zratio", zratio, ["VARCHAR"], "DOUBLE",
                            null_handling="special")
    except Exception as e:
        print(f"note: local zlib UDF unavailable ({e}); t35 stays rows-only")
        return {}
    return {"t35_compression_ratio":
            "SELECT doc_id, zratio(text) AS compression_ratio "
            "FROM documents ORDER BY doc_id"}

local_gates = _register_local_udf_gates()
for name, sql in local_gates.items():
    if name not in oracle and (only is None or name in only) and \
            glob.glob(f"{outdir}/{name}/*.parquet"):
        oracle[name] = sql
# ---------------------------------------------------------------------------

n_pass = n_fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    got = canon(pd.concat([pd.read_parquet(f) for f in files]))
    try:
        exp = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
    # Local-gate tolerance (LOCAL-ONLY queries, never driver oracles):
    # t35's signal divides a compressed LENGTH by the text length, and the
    # JDK bundles its own zlib copy, which can emit a compressed stream a
    # byte longer/shorter than CPython's zlib on rare inputs (observed:
    # one document in 50k at sf1, ratio off by exactly 0.0001) — the
    # version-skew fallback the UDF gate's design names. One ulp-of-the-
    # rounding tolerance keeps the gate meaningful (a wrong ratio FORMULA
    # is off by orders of magnitude more).
    tol = {"t35_compression_ratio": 2e-4}.get(name) if name in local_gates \
        else None
    if tol is not None:
        # canon() sorts by ALL columns, so a within-tolerance float delta
        # would misalign the two frames at that row; align on the exact
        # (non-float) columns instead — doc ids are unique, so the order
        # is total either way
        keys = [c for c in got.columns if got[c].dtype.kind != "f"]
        if keys:
            got = got.sort_values(by=keys).reset_index(drop=True)
            exp = exp.sort_values(by=keys).reset_index(drop=True)
    mismatch = None
    for c in got.columns:
        a, b = got[c].tolist(), exp[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if repr(x) != repr(y):
                if tol is not None and isinstance(x, float) \
                        and isinstance(y, float) and abs(x - y) <= tol:
                    continue
                mismatch = (c, i, x, y, type(x), type(y)); break
        if mismatch: break
    if mismatch:
        print(f"FAIL {name}: col={mismatch[0]} row={mismatch[1]} spark={mismatch[2]!r} duck={mismatch[3]!r} types={mismatch[4]}/{mismatch[5]}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
