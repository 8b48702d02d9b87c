"""``python -m datatest_spark`` — local twin of the spark-submit job."""

import sys

from datatest_spark.cli import main

sys.exit(main())
