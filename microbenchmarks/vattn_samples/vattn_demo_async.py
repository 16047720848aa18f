"""Async allocator demo (ref: microbenchmarks/vattn_samples/vattn_demo_async.py).

Thin wrapper over examples/allocator_demo.py -- the step_async path with
eager lookahead + deferred reclamation, printing per-pass step latency /
relocation traffic / fragmentation.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from examples.allocator_demo import main  # noqa: E402

if __name__ == "__main__":
    main()
