"""spark-submit main for cluster deployment.

    spark-submit --py-files dist/codeclone_spark.zip scripts/submit_main.py \
        run --data-dir s3://bucket/clips --out-dir s3://bucket/run1 [...]

The package arrives via --py-files (already on sys.path inside the driver
process spark-submit starts); every CLI subcommand and exit-code contract
is identical to ``python -m codeclone_spark.cli``.
"""

from __future__ import annotations

import sys

from codeclone_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
