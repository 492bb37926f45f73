"""`python -m imposm3_spark` — see cli.py (cmd/imposm/main.go parity)."""

import sys

from imposm3_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
