"""Per-query isolation harness (guide §1.4): times individual declared
queries with the noop sink and optionally captures ``.explain("formatted")``.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain-dir DIR] q1 q2 ...
  python bench_extra.py --all            # every declared query

Never used for the official numbers — ``bench.py`` is the frozen harness.
Prints one JSON line: {"sf": ..., "reps": N, "queries": {name: [sec, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain-dir", default=None,
                    help="write <name>.txt explain('formatted') per query")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    from data_sync_tool_spark.session import build_session
    import __spark_entry__ as E

    spark = build_session("dst-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            try:
                df = fn(spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            except Exception as exc:  # noqa: BLE001
                samples.append(-1.0)
                print(f"# {name} failed: {exc}", file=sys.stderr)
                break
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(f"# {name}: {samples}", file=sys.stderr)
        if args.explain_dir and samples and samples[-1] >= 0:
            os.makedirs(args.explain_dir, exist_ok=True)
            try:
                df = qs[name](spark, args.sf)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as fh:
                    fh.write(plan)
            except Exception as exc:  # noqa: BLE001
                print(f"# explain({name}) failed: {exc}", file=sys.stderr)

    print(json.dumps({"sf": args.sf, "reps": args.reps, "queries": out}))


if __name__ == "__main__":
    main()
