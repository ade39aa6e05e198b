import sys

from pramen_spark.cli import main

sys.exit(main())
