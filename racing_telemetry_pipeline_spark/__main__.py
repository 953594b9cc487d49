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
    g.add_argument(
        "--scale",
        default="sf-unit",
        choices=["sf-unit", "sf-small", "sf-bench", "sf-scaling"],
    )
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=42)

    r = sub.add_parser("run", help="run the parse->sync->enrich->route->aggregate pipeline")
    r.add_argument("--raw", required=True)
    r.add_argument("--lake", required=True)
    r.add_argument("--parse-engine", default="pandas_udf", choices=["pandas_udf", "builtin"])
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--cores", type=int, default=None)

    s = sub.add_parser(
        "stream", help="drain a directory through the streaming route into the lake"
    )
    s.add_argument("--source", required=True)
    s.add_argument("--lake", required=True)
    s.add_argument("--checkpoint", default=None)
    s.add_argument("--cores", type=int, default=None)

    c = sub.add_parser("compact", help="rewrite a lake table into target-sized files")
    c.add_argument("--lake", required=True)
    c.add_argument("--table", required=True)
    c.add_argument("--target-mb", type=int, default=128)
    c.add_argument("--cores", type=int, default=None)

    q = sub.add_parser("query", help="run a named contract query (SURVEY.md §2)")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--cores", type=int, default=None)

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

    if args.cmd == "stream":
        from .session import get_spark
        from .streaming.stream_pipeline import streaming_to_lake

        spark = get_spark("rtps-stream", cores=args.cores)
        qy = streaming_to_lake(
            spark, args.source, args.lake, checkpoint=args.checkpoint
        )
        qy.awaitTermination()
        from .sources.lake import Lake

        batches = (
            Lake(spark, args.lake)
            ._load_manifest()
            .get("stream_batches", {})
            .get("routed_stream", [])
        )
        print(json.dumps({"lake": args.lake, "batches_committed": len(batches)}))
        return 0

    if args.cmd == "compact":
        from .session import get_spark
        from .sources.lake import Lake

        spark = get_spark("rtps-compact", cores=args.cores)
        lake = Lake(spark, args.lake)
        n = lake.compact(args.table, target_file_bytes=args.target_mb * 1024 * 1024)
        print(json.dumps({"table": args.table, "n_files": n}))
        return 0

    if args.cmd == "query":
        from .queries import all_queries_full as all_queries
        from .session import get_spark

        qs = all_queries()
        if args.name not in qs:
            print(json.dumps({"error": "unknown query",
                              "available": sorted(qs)}))
            return 2
        spark = get_spark("rtps-query", cores=args.cores)
        fn, _sql = qs[args.name]
        df = fn(spark, args.sf_dir)
        df.show(args.limit, truncate=False)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
