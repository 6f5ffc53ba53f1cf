"""One-time build-cost ledger for the build/serve split queries.

The build/serve queries (persisted trigram and MinHash indexes, the
bucketed tables, the Z-ordered copy, the partitioned DPP fact, the AQP
sample, the evolved-schema eras) build their on-disk artifact on FIRST
call per process and serve from it afterwards, so bench.py's min-of-5
reports steady-state SERVING — the deployment number. That is correct,
but it hides the amortized one-time cost. Every build site wraps its
build in :func:`recording`, and bench.py copies this ledger into the
artifact as a ``"builds"`` side-field (VERDICT r6 next-steps #7), so
the amortization claim is auditable round-over-round from the bench
JSON alone instead of living only in the scale-probe tools.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

#: query/artifact name -> one-time build seconds, recorded the first
#: time each per-process cache is filled (keyed per sf_dir suffix when
#: a process builds at several scales).
BUILD_COSTS: dict[str, float] = {}


@contextmanager
def recording(name: str, sf_dir: str | None = None):
    """Time a one-time build and record it as ``name`` (plus an
    ``@sf_dir`` suffix when given, so multi-scale processes keep one
    row per scale)."""
    key = f"{name}@{sf_dir}" if sf_dir else name
    t0 = time.time()
    yield
    BUILD_COSTS[key] = round(time.time() - t0, 3)
