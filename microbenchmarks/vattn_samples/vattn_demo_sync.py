"""Sync allocator demo (ref: microbenchmarks/vattn_samples/vattn_demo_sync.py).

step_sync maps every block at the step boundary (no lookahead thread in
the reference; no deferred work here).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

sys.argv.append("--sync")
from examples.allocator_demo import main  # noqa: E402

if __name__ == "__main__":
    main()
