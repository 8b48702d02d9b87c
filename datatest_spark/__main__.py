"""``python -m datatest_spark`` — local twin of the spark-submit job."""

import sys

from datatest_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
