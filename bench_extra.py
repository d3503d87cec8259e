"""Per-query isolation bench (r6 optimization round).

NOT part of the frozen driver contract — `bench.py` is the measured
harness. This file exists so single queries can be timed and their plans
captured without paying for the whole sweep (guide §1.1/§1.4/§1.5).

Usage:
    python bench_extra.py [--sf DIR] [--reps N] [--noop] [--plan OUTDIR] q1 q2 ...

Timing methodology matches bench.py's sweep exactly (same session builder,
same `qs[name](spark, SF_DIR).count()` — pass --noop to instead force every
column through the noop sink per guide §1.4). `--plan OUTDIR` writes
`<name>.txt` with the `.explain("formatted")` output for each query.
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
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--noop", action="store_true",
                    help="force via noop sink instead of .count()")
    ap.add_argument("--plan", default=None,
                    help="dir to write .explain('formatted') per query")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from polipus_spark.session import build_session

    spark = build_session(app_name="bench_extra", cores=args.cpus,
                          shuffle_partitions=args.cpus * 2)
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plan, f"{name}.txt"), "w") as f:
                f.write(plan)
        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"[bench_extra] {name}: {times}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": args.sf, "reps": args.reps,
                      "noop": args.noop, "times": out}))


if __name__ == "__main__":
    main()
