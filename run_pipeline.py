"""spark-submit launcher (north_rule: spark-submit --py-files).

    spark-submit --py-files anendektos_spark.zip run_pipeline.py \
        --input /data/transcripts --output /data/out

--py-files puts the zip on every executor's and the driver's sys.path;
this top-level script exists because a module inside the package cannot
be spark-submit's primary resource (relative imports need the package
context).
"""

import sys

from anendektos_spark.main import main

if __name__ == "__main__":
    sys.exit(main())
