"""spark-submit driver for the validation suite.

    spark-submit --py-files dist/datatest_spark.zip \
        jobs/validate_tokens.py --input <path> --allowed-sources a,b,c

The zip carries the package; this file is the thin job script
spark-submit executes on the driver (see datatest_spark/cli.py for the
argument surface and behavior).
"""

import sys

from datatest_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
