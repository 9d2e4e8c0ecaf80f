"""spark-submit shim: the application file for cluster runs.

    cd repo && zip -qr /tmp/ape_dts_spark.zip ape_dts_spark
    spark-submit --master <cluster> --py-files /tmp/ape_dts_spark.zip \
        scripts/run_task.py task_config.ini

spark-submit owns the SparkSession (master, executor sizing, dynamic
allocation come from the submit conf); __main__.main() detects and reuses
it.  Locally `python -m ape_dts_spark task_config.ini` is equivalent.
"""

import sys

from ape_dts_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
