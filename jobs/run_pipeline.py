"""spark-submit job wrapper: spark-submit --py-files rtps.zip jobs/run_pipeline.py ..."""

import sys

from racing_telemetry_pipeline_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(["run", *sys.argv[1:]]))
