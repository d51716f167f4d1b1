"""`python -m geowave_spark` — the CLI entry point (geowave_spark/cli.py)."""

import sys

from geowave_spark.cli import main

sys.exit(main())
