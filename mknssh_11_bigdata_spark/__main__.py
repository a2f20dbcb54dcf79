"""Command-line entry point: ``python -m mknssh_11_bigdata_spark``.

The reference project is driven by ``python main.py`` (one hardwired
pipeline); this CLI is its generalized counterpart over the whole
query registry:

    python -m mknssh_11_bigdata_spark list
    python -m mknssh_11_bigdata_spark run pricing_summary \\
        --sf-dir /root/testdata/sf0.01 --show 20
    python -m mknssh_11_bigdata_spark explain dedup_minhash_lsh

``run`` prints the result (truncated); ``explain`` prints the physical
plan (the scale-shape evidence — same output PLANS.md audits).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mknssh_11_bigdata_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for cmd, hlp in (
        ("run", "run a registered query and show rows"),
        ("explain", "print a query's physical plan"),
    ):
        s = sub.add_parser(cmd, help=hlp)
        s.add_argument("query", help="registered query name")
        s.add_argument(
            "--sf-dir",
            default="/root/testdata/sf0.01",
            help="directory with the parquet tables",
        )
        if cmd == "run":
            s.add_argument(
                "--show", type=int, default=20, help="max rows to print"
            )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .queries import QUERIES

    if args.cmd == "list":
        for name, spec in QUERIES.items():
            tag = "oracle" if spec.oracle else "rows-only"
            print(f"{name}  [{tag}]")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r} — see `list`", file=sys.stderr)
        return 2
    from .session import get_spark

    spark = get_spark(app_name=f"mknssh11-{args.cmd}")
    try:
        df = QUERIES[args.query].spark(spark, args.sf_dir)
        if args.cmd == "explain":
            print(
                df._jdf.queryExecution().executedPlan().toString()
            )
        else:
            df.show(args.show, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
