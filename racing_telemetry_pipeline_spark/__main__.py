"""CLI entry point — the spark-submit launch surface (north rule).

Usage (local dev):
    python -m racing_telemetry_pipeline_spark gen --scale sf-unit --out data/raw
    python -m racing_telemetry_pipeline_spark run --raw data/raw --lake data/lake

Cluster launch:
    spark-submit --py-files rtps.zip jobs/run_pipeline.py --raw ... --lake ...
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="racing_telemetry_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="write deterministic synthetic transcripts")
    g.add_argument("--scale", default="sf-unit", choices=["sf-unit", "sf-small", "sf-bench"])
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=42)

    r = sub.add_parser("run", help="run the parse->sync->enrich->route->aggregate pipeline")
    r.add_argument("--raw", required=True)
    r.add_argument("--lake", required=True)
    r.add_argument("--parse-engine", default="pandas_udf", choices=["pandas_udf", "builtin"])
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--cores", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "gen":
        from .datagen import write_transcripts

        out = write_transcripts(args.out, args.scale, args.seed)
        print(json.dumps({"written": out, "scale": args.scale}))
        return 0

    if args.cmd == "run":
        from .plans.pipeline import run_pipeline
        from .session import get_spark

        spark = get_spark("rtps-run", cores=args.cores)
        res = run_pipeline(
            spark,
            args.raw,
            args.lake,
            parse_engine=args.parse_engine,
            resume=not args.no_resume,
        )
        print(
            json.dumps(
                {
                    "lake": res.lake_root,
                    "stages_run": res.stages_run,
                    "stages_skipped": res.stages_skipped,
                    "timings_sec": {k: round(v, 3) for k, v in res.timings.items()},
                    "input_snapshot": res.input_snapshot,
                }
            )
        )
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
