#!/usr/bin/env python3
"""q368 oracle guard probe (round-17 advice): the DuckDB oracle for
q368_krippendorff relies on `CASE WHEN m_u <= 3 THEN ... ELSE
CAST(error(...) AS BIGINT) END` NOT evaluating the error() branch on
rows where the predicate holds. DuckDB today evaluates CASE branches
lazily per-row, but a future upgrade that constant-folds or eagerly
evaluates the constant-argument error() would break the HAPPY path
(all m_u <= 3) even though no >= 4-rater row exists — and the first
place that would surface is the driver's differential round, as a
mysterious q368 err. This probe makes the assumption explicit and
cheap to re-check after any DuckDB bump:

  1. the oracle's exact CASE shape over an all-m_u<=3 frame SUCCEEDS
     (the error() arm is present but must not fire);
  2. the same shape over a frame containing m_u == 4 RAISES — the
     guard is live, not dead code (mirrors the Spark side's
     raise_error, pinned by ExperimentSpec's "m_u >= 4 guard" test);
  3. the full q368 oracle SQL from oracle_sql.json runs green on the
     fixture (3 raters with a skip arm -> m_u <= 3 by construction).

Usage: check_q368_guard.py <sfDir> <oracle_sql.json>   (exit 1 on any
failure; prints one PASS line per check otherwise)
"""
import json
import sys

import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()

# the oracle's guard expression, verbatim shape (x2-scaled per-unit
# disagreement, exact for m_u in {2,3}, error() beyond)
GUARD = """
  SELECT doc_id, CASE WHEN m_u <= 3
      THEN 2 * (m_u * m_u - ssq) // (m_u - 1)
      ELSE CAST(error('krippendorff: exact-integer path supports'
        || ' per-item coverage m_u <= 3 only') AS BIGINT) END AS do2
  FROM per_unit WHERE m_u >= 2
"""

fails = 0

# 1) happy path: m_u in {2, 3} only — error() arm present, must not fire
con.execute("""CREATE OR REPLACE TABLE per_unit AS
  SELECT * FROM (VALUES (1, 2, 2), (2, 3, 5), (3, 1, 1))
    t(doc_id, m_u, ssq)""")
try:
    rows = con.execute(GUARD + " ORDER BY doc_id").fetchall()
    assert rows == [(1, 4), (2, 4)], rows
    print("PASS q368-guard happy path (all m_u <= 3, error() arm inert)")
except Exception as e:  # noqa: BLE001 — any engine error is the finding
    fails += 1
    print(f"FAIL q368-guard happy path: DuckDB evaluated the error() arm "
          f"on an all-m_u<=3 frame (or guard arithmetic drifted): {e}")

# 2) guard is live: an m_u == 4 row must raise, never silently truncate
con.execute("""CREATE OR REPLACE TABLE per_unit AS
  SELECT * FROM (VALUES (1, 2, 2), (2, 4, 8)) t(doc_id, m_u, ssq)""")
try:
    con.execute(GUARD).fetchall()
    fails += 1
    print("FAIL q368-guard m_u>=4: expected error(), got a silent result "
          "- the exact-integer DIV would truncate alpha")
except Exception as e:  # noqa: BLE001
    if "m_u <= 3" in str(e):
        print("PASS q368-guard m_u >= 4 raises (guard is live)")
    else:
        fails += 1
        print(f"FAIL q368-guard m_u>=4: raised, but not OUR error: {e}")

# 3) the committed oracle itself stays green on the fixture
for t in ["documents"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(oracle_path))
try:
    got = con.execute(oracle["q368_krippendorff"]).fetchall()
    assert len(got) == 1 and got[0][3] is not None, got
    print(f"PASS q368 oracle end-to-end on {sfdir} "
          f"(alpha_micro={got[0][3]})")
except Exception as e:  # noqa: BLE001
    fails += 1
    print(f"FAIL q368 oracle end-to-end: {e}")

sys.exit(1 if fails else 0)
