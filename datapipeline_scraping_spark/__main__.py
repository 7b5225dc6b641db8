"""Command-line entry point — the engine's operational surface, the
way the reference is driven by `make`/Airflow CLI.

    python -m datapipeline_scraping_spark list
    python -m datapipeline_scraping_spark run q01_pricing_summary [--sf-dir DIR] [-n 20]
    python -m datapipeline_scraping_spark oracle q01_pricing_summary
    python -m datapipeline_scraping_spark pipeline path/to/config.yml [--sf-dir DIR]
    python -m datapipeline_scraping_spark explain q02_revenue_by_nation
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="datapipeline_scraping_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registry queries (* = has DuckDB oracle)")

    p_run = sub.add_parser("run", help="run one registry query and show rows")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("-n", type=int, default=20, help="rows to show")

    p_or = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    p_or.add_argument("query")

    p_pipe = sub.add_parser("pipeline", help="run a YAML pipeline config")
    p_pipe.add_argument("config")
    p_pipe.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_pipe.add_argument("-n", type=int, default=20)

    p_ex = sub.add_parser("explain", help="show a query's physical plan")
    p_ex.add_argument("query")
    p_ex.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    args = ap.parse_args(argv)

    from .queries import REGISTRY

    if args.cmd == "list":
        for name, spec in sorted(REGISTRY.items()):
            mark = "*" if spec.oracle else " "
            doc = (spec.fn.__doc__ or "").strip().split("\n")[0]
            print(f"{mark} {name:32s} {doc}")
        return 0

    if args.cmd == "oracle":
        spec = REGISTRY.get(args.query)
        if spec is None:
            print(f"unknown query {args.query!r}", file=sys.stderr)
            return 2
        print(spec.oracle or "-- rows-only query: no oracle")
        return 0

    from .session import build_spark

    spark = build_spark(app_name=f"dps-cli-{args.cmd}")
    try:
        if args.cmd == "run":
            spec = REGISTRY.get(args.query)
            if spec is None:
                print(f"unknown query {args.query!r}", file=sys.stderr)
                return 2
            spec.fn(spark, args.sf_dir).show(args.n, truncate=False)
        elif args.cmd == "pipeline":
            from .plans.pipeline import build_pipeline, load_pipeline_config

            cfg = load_pipeline_config(args.config)
            build_pipeline(spark, cfg, args.sf_dir).show(args.n, truncate=False)
        elif args.cmd == "explain":
            spec = REGISTRY.get(args.query)
            if spec is None:
                print(f"unknown query {args.query!r}", file=sys.stderr)
                return 2
            spec.fn(spark, args.sf_dir).explain("formatted")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
