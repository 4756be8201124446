"""Standalone replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and compare with its DuckDB oracle.

Usage: python tests/run_oracle_check.py [sf_dir] [query_name ...]
(no query names = run everything)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")


def main() -> int:
    from data_sync_tool_spark.session import build_session
    from tests.util_oracle import assert_matches_oracle

    import __spark_entry__ as E

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = E.queries(), E.oracle_sql()
    if len(sys.argv) > 2:  # optional subset for fast iteration
        unknown = [n for n in sys.argv[2:] if n not in qs]
        if unknown:
            print(f"FAIL  unknown queries: {unknown}")
            return 1
        qs = {n: qs[n] for n in sys.argv[2:]}
    failed = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            if name in oracles:
                assert_matches_oracle(fn(spark, sf), oracles[name], sf)
                print(f"OK    {name}  ({time.time() - t0:.1f}s)", flush=True)
            else:
                n = fn(spark, sf).count()
                print(f"ROWS  {name}: {n}  ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            failed += 1
            print(f"FAIL  {name}: {str(e)[:400]}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
