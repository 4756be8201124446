"""Self-sweep artifact generator: run EVERY ``__spark_entry__.queries()``
entry against its DuckDB oracle and write a driver-shaped JSON record
(``CORRECTNESS_SELF_rN.json``) so the round's correctness evidence covers
all queries, not just the driver's sampled subset (round-5 verdict item #1).

Usage: python tests/run_oracle_sweep_json.py OUT.json [sf_dir]

Per-query record (same keys as the driver's CORRECTNESS_rN.json):
  {"rows_match": bool, "schema_match": bool, "hash_match": bool,
   "spark_rows": int, "oracle_rows": int, "err": str|null}
Queries with no oracle SQL (approximate/iterative by design) are recorded
with ``"mode": "rows_only"`` and null compare fields.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")


def main() -> int:
    from tests.util_oracle import _canon, run_oracle

    from data_sync_tool_spark.session import build_session

    import __spark_entry__ as E

    out_path = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = build_session("oracle-self-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = E.queries(), E.oracle_sql()
    results: dict[str, dict] = {}
    n_bad = 0
    for name, fn in qs.items():
        t0 = time.time()
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            got_pdf = fn(spark, sf).toPandas()
            rec["spark_rows"] = int(len(got_pdf))
            if name in oracles:
                want_pdf = run_oracle(oracles[name], sf)
                rec["oracle_rows"] = int(len(want_pdf))
                rec["rows_match"] = len(got_pdf) == len(want_pdf)
                rec["schema_match"] = sorted(got_pdf.columns) == sorted(want_pdf.columns)
                if rec["rows_match"] and rec["schema_match"]:
                    got, want = _canon(got_pdf), _canon(want_pdf)
                    rec["hash_match"] = bool((got == want).all())
                else:
                    rec["hash_match"] = False
            else:
                rec["mode"] = "rows_only"
        except Exception as e:  # noqa: BLE001
            rec["err"] = str(e)[:400]
        results[name] = rec
        ok = rec.get("mode") == "rows_only" or (
            rec["hash_match"] and rec["err"] is None
        )
        n_bad += 0 if ok else 1
        tag = "ROWS" if rec.get("mode") == "rows_only" else (
            "OK" if ok else "FAIL"
        )
        print(f"{tag:<5} {name}  ({time.time() - t0:.1f}s)", flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}: {len(results)} queries, {n_bad} failing")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
