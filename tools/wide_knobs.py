"""One-off experiment harness for the wide (local[16]) bench side.

Measures the end-to-end pipeline wall at a given core count under
candidate memory-bandwidth knobs (the 16-thread config is DRAM-bound on
this host — VERDICT r4/BENCH.md), each in a FRESH subprocess/JVM:

    python tools/wide_knobs.py <variant> <cores> [reps]

Variants: v0 (bench mirror), r4rep (round-4 replica), committer-v1,
evlog (event-log capture for tools/stage_times.py), zstd-shuffle,
zstd-sink, lz4-sink, arrow50k, combo, parts2x/parts3x.
Prints one JSON line per run with the run list, min, and stage splits.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# default to the wide input; point SPARK_GRAFT_KNOB_RAW at the sf-bench
# dir to run the same experiments on the narrow pair's input
RAW = os.environ.get(
    "SPARK_GRAFT_KNOB_RAW", "/tmp/rtps_bench_raw_sf-scaling_36000x900"
)
WARM = os.environ.get("SPARK_GRAFT_KNOB_WARM", "/tmp/rtps_bench_warm_sf-unit")

VARIANTS: dict[str, dict[str, str]] = {
    "v0": {},
    "r4rep": {},  # exact round-4 bench config (maxFailures=1, no extra conf)
    # round-5 A/B: is the 16-core collapse (214s vs the 58s pre-committer
    # replica) caused by committer v2? extra_conf wins over get_spark's
    # default, so this runs the exact v8 config with v1 restored
    "committer-v1": {
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "1"
    },
    # stage-level forensics: parse /tmp/evlog with tools/stage_times.py to
    # see which stage holds the non-scaling ~31s (straggler vs serial)
    "evlog": {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": "file:///tmp/evlog",
    },
    "zstd-shuffle": {"spark.io.compression.codec": "zstd"},
    "arrow50k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "50000"},
    "zstd-sink": {"spark.sql.parquet.compression.codec": "zstd"},
    "lz4-sink": {"spark.sql.parquet.compression.codec": "lz4"},
    "combo": {
        "spark.io.compression.codec": "zstd",
        "spark.sql.parquet.compression.codec": "zstd",
    },
}
# partition-count multiplier variants (smaller sort working set per task)
PARTS = {"parts3x": 3, "parts2x": 2, "v0": 1, "zstd-shuffle": 1,
         "zstd-sink": 1, "lz4-sink": 1, "combo": 1}


def run_variant(variant: str, cores: int, reps: int) -> None:
    from pyspark.sql import functions as F

    from racing_telemetry_pipeline_spark.plans.pipeline import run_pipeline
    from racing_telemetry_pipeline_spark.session import get_spark

    with open(os.path.join(RAW, "_meta.json")) as fh:
        rows = json.load(fh)["rows"]
    mult = PARTS.get(variant, 1)
    k = max(8, rows // (3_000_000 // mult))
    sp = cores * -(-k // cores)
    # mirror bench.py worker_pipeline v8 exactly so a knob win transfers
    if variant == "r4rep":
        conf = {"spark.python.worker.faulthandler.enabled": "true"}
        mf = 1
    else:
        conf = {
            "spark.python.worker.faulthandler.enabled": "true",
            "spark.python.daemon.killWorkerOnFlushFailure": "true",
            "spark.python.worker.tracebackDumpIntervalSeconds": "120",
        }
        mf = 3
    conf.update(VARIANTS.get(variant, {}))
    spark = get_spark(f"knob-{variant}-{cores}", cores=cores,
                      shuffle_partitions=sp, max_failures=mf,
                      extra_conf=conf)
    lake = f"/dev/shm/knob_lake_{os.getpid()}"
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100_000).select(F.sum(_warm(F.col("id")))).collect()
    if os.path.isdir(WARM):
        run_pipeline(spark, WARM, lake + "_w", resume=False,
                     approx_percentiles=True)
    runs = []
    try:
        for _ in range(reps):
            shutil.rmtree(lake, ignore_errors=True)
            t0 = time.perf_counter()
            res = run_pipeline(spark, RAW, lake, resume=False,
                               approx_percentiles=True)
            runs.append(round(time.perf_counter() - t0, 1))
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            print(json.dumps({"variant": variant, "cores": cores,
                              "sp": sp, "runs": runs,
                              "min": min(runs),
                              "stages": {k: round(v, 1)
                                         for k, v in res.timings.items()}}),
                  flush=True)
    finally:
        shutil.rmtree(lake, ignore_errors=True)
        shutil.rmtree(lake + "_w", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        run_variant(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        sys.exit(0)
    variant = sys.argv[1] if len(sys.argv) > 1 else "v0"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         variant, str(cores), str(reps)],
        cwd=REPO,
    )
