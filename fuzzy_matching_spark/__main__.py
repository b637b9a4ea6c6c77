"""Package entry point: ``python -m fuzzy_matching_spark`` (parity with the
reference's ``fuzzy_matching/__main__.py``, which delegates to its CLI)."""

import sys

from fuzzy_matching_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
