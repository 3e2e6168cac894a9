#!/usr/bin/env python
"""Targeted per-query benchmark + plan capture (round-6 optimization
harness). bench.py is FROZEN for measurement; this file exists so the
optimization loop can isolate single queries, run at any SF, and dump
`.explain("formatted")` plans without touching the frozen harness.

Usage:
  python bench_extra.py [--sf-dir DIR] [--legs N] [--plans OUTDIR] \
                        [--noop] [query ...]

Methodology matches bench.py's default mode: per query one untimed warm
leg, then min of `--legs` timed legs (default 3), each leg rebuilding
the query (driver-side guard jobs are charged, same as the frozen
bench). `--noop` times a noop-sink write (guide §1.4: computes every
column, no count-side pruning) instead of the bench's count().
Prints one JSON line: {"sf_dir", "cpus", "queries": {name: min_sec},
"legs": {name: [sec,...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all headline)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--legs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory to write <q>.txt explain('formatted') dumps")
    ap.add_argument("--plans-suffix", default="", help="filename suffix, e.g. _before")
    ap.add_argument("--noop", action="store_true", help="time a noop-sink write instead of count()")
    ap.add_argument("--no-time", action="store_true", help="plans only, skip timing")
    args = ap.parse_args()

    from osm_wikipedia_tag_validator_spark.plans import oracle_queries as OQ
    from osm_wikipedia_tag_validator_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cpus, shuffle_partitions=max(32, cpus))

    qs = OQ.queries()
    names = args.queries or [n for n in qs]
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(args.plans, f"{name}{args.plans_suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"# wrote {path}", file=sys.stderr)

    if args.no_time:
        return

    # warm the python worker pool once, same as the frozen bench
    _sdf = spark.range(cpus, numPartitions=cpus)
    _sdf.mapInPandas(lambda it: it, "id long").count()

    def run_leg(name: str) -> float:
        # the timer brackets CONSTRUCTION too, exactly like the frozen
        # bench: eager driver-side work in a query's constructor (the
        # k-ring escalation loop most of all) is part of its cost
        t0 = time.time()
        df = qs[name](spark, args.sf_dir)
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return round(time.time() - t0, 3)

    timings: dict[str, float] = {}
    legs: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        run_leg(name)  # warm
        dts = [run_leg(name) for _ in range(args.legs)]
        spark.sparkContext.setJobDescription(None)
        timings[name] = min(dts)
        legs[name] = dts
        print(f"# {name}: {min(dts)}s legs={dts}", file=sys.stderr)

    print(json.dumps({
        "sf_dir": args.sf_dir, "cpus": cpus,
        "noop": bool(args.noop), "queries": timings, "legs": legs,
    }))


if __name__ == "__main__":
    main()
