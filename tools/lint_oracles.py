#!/usr/bin/env python3
"""Oracle-type lint: DESCRIBE every oracle_sql.json entry through DuckDB
and fail on output column types the driver's hash canonicalizer renders
differently from Spark's:

  * HUGEINT — DuckDB widens SUM(INTEGER/BIGINT) and window SUMs to
    HUGEINT while Spark returns BIGINT; the two sides then take
    different numeric-text paths in the driver hash (the round-6 q80 /
    round-7 q101-family mechanism). Fix: CAST(SUM(...) AS BIGINT).
  * DECIMAL(p>18, 0) — wide scale-0 decimals (128-bit integers in
    decimal clothing) hash-render differently per side, same family
    as HUGEINT (the round-13 q251/q258 reds — values bit-identical,
    driver hash red). Fix: CAST to BIGINT on both sides (document the
    value bound), or rescale the statistic so it fits.
  * DECIMAL(p, s>0) — fixed-scale text ("1.40") vs Spark's float64
    repr ("1.4") diverges whenever a VALUE carries a trailing zero at
    declared scale (the q80/q117 mechanism). This is data-dependent,
    so the lint EXECUTES any decimal-emitting oracle and flags only if
    some actual value's fixed-scale text differs from repr(float(v))
    — the q80/q97/q98/q99 decimal-path probes stay green because their
    sf0.01 outputs are verified trailing-zero-free, while a q117-shaped
    hazard (9 of 150 values at x.40) fails loudly. Fix: emit cents as
    BIGINT or CAST to DOUBLE on both sides.

Usage: lint_oracles.py <sfDir> <oracle_sql.json>    (exit 1 on any hit)
"""
import decimal, json, sys
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(oracle_path))
hits = 0
for qname in sorted(oracle):
    try:
        desc = con.execute(f"DESCRIBE {oracle[qname]}").fetchall()
    except Exception as e:
        # Some oracles read Verify-rendered side dirs that may not exist
        # here; a DESCRIBE error is a warning, not a type hit.
        print(f"WARN {qname}: DESCRIBE failed: {str(e).splitlines()[0]}")
        continue
    dec_cols = []
    for colname, coltype, *_ in desc:
        t = coltype.upper()
        if "HUGEINT" in t:
            print(f"LINT {qname}.{colname}: HUGEINT "
                  "(Spark returns BIGINT; CAST the aggregate)")
            hits += 1
        elif t.startswith("DECIMAL"):
            inner = t[t.index("(") + 1:t.rindex(")")] if "(" in t else "18,3"
            prec = int(inner.split(",")[0])
            scale = int(inner.split(",")[1]) if "," in inner else 0
            if scale > 0:
                dec_cols.append((colname, t, scale))
            elif prec > 18:
                print(f"LINT {qname}.{colname}: {t} scale-0 wide decimal "
                      "(driver hash renders 128-bit scale-0 decimals "
                      "differently per side — CAST to BIGINT on both sides)")
                hits += 1
    if dec_cols:
        rows = con.execute(oracle[qname]).fetchall()
        names = [d[0] for d in con.description]
        for colname, t, scale in dec_cols:
            idx = names.index(colname)
            nbad = sum(1 for r in rows
                       if isinstance(r[idx], decimal.Decimal)
                       and f"{r[idx]:.{scale}f}" != repr(float(r[idx])))
            if nbad:
                print(f"LINT {qname}.{colname}: {t} with {nbad}/{len(rows)} "
                      "values whose fixed-scale text != float64 repr "
                      "(trailing-zero hazard; emit cents BIGINT or DOUBLE)")
                hits += 1
print(f"{'FAIL' if hits else 'OK'}: {hits} hazardous oracle output columns "
      f"across {len(oracle)} entries")
sys.exit(1 if hits else 0)
