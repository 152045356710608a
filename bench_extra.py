"""Round-6 optimization measurement harness (guide §1) — bench.py is
FROZEN for driver measurement, so all per-query isolation work lives
here.

Times individual declared queries with the same methodology as
bench.py (df.count(), best of N), optionally also with the noop sink
(guide §1.4: forces every column of every row, isolating compute from
the count()-pruned path), and captures .explain("formatted") to
plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--sf DIR] [--runs N] [--tag before|after]
                        [--noop] [--plans-dir plans/r06] query [query ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tag", default=None, help="write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true", help="also time the noop-sink write")
    ap.add_argument("--plans-dir", default="plans/r06")
    args = ap.parse_args()

    from gfp_gdal_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="gfp_gdal_spark_bench_extra", cores=cpus)

    import __spark_entry__ as E

    qs = E.queries()
    # warmup (classloader/codegen), same as bench.py
    qs["tile_assign"](spark, args.sf).count()

    out = {}
    for name in args.queries:
        if name not in qs:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.tag:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        if args.runs <= 0:  # plan-capture-only mode
            spark.sparkContext.setJobDescription(None)
            continue
        best, n = None, 0
        for _ in range(args.runs):
            t0 = time.time()
            df = qs[name](spark, args.sf)
            n = df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s ({n} rows, best of {args.runs})", file=sys.stderr)
        if args.noop:
            best_n = None
            for _ in range(args.runs):
                t0 = time.time()
                qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best_n = dt if best_n is None else min(best_n, dt)
            out[name + "__noop"] = round(best_n, 3)
            print(f"# {name} [noop]: {out[name + '__noop']}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": args.sf, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
