"""spark-submit entry point for the CLI (tools/submit.sh ships this).

spark-submit runs a FILE, not a module, and the gsearch_spark package
reaches executors via --py-files — so this shim just forwards to the
same subcommand surface as ``python -m gsearch_spark``.
"""

from __future__ import annotations

import sys

from gsearch_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
