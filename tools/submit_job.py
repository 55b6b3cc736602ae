"""spark-submit entry file for the KG pipeline.

spark-submit takes a script path (not ``-m``); this file is that script. The
package itself ships via ``--py-files graphiti_spark.zip`` (north rule), so
the driver host needs only this file and the zip:

    python tools/make_pyfiles.py     # -> graphiti_spark.zip
    spark-submit --master <cluster> --py-files graphiti_spark.zip \
        tools/submit_job.py --input <pages table> --output <warehouse>

Executed end-to-end (local-cluster master, package importable only from the
zip) by tests/test_spark_submit.py.
"""

from __future__ import annotations

import sys

from graphiti_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
