"""Dump `.explain("formatted")` for named queries to plans/<dir>/.

Usage: python tools/dump_plans.py --out plans/r13 --suffix _before \
           --queries a,b,c [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.explain_audit import plan_of  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()

    from taxi_trips_etl_spark.queries import all_queries
    from taxi_trips_etl_spark.session import get_spark

    qs = all_queries()
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries.split(","):
        df = qs[name](spark, args.sf_dir)
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan_of(df))
        print(path)


if __name__ == "__main__":
    main()
