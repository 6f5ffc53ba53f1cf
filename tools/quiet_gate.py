"""Quiet-run gate for bench artifacts (VERDICT r10 next #1).

Every scale claim divides by a 100x/sf0.1 base, and an episode-inflated
base UNDERSTATES decade ratios — the dangerous direction for the <=12x
gates. This gate makes "quiet" a checkable property instead of a
narrative: a bench JSON line passes iff

- ``canary_ratio <= 1.2``  (endpoint fixed-work canary vs the host's
  pinned quiet reference), and
- ``episode_suspect`` is false (the mid-run mini-canary detector saw
  fewer than max(2, 10%) readings >5x the run's quietest floor).

Usage: python tools/quiet_gate.py <bench_json_file>
Exit 0 = quiet, 1 = degraded (prints why), 2 = unparseable.
"""

from __future__ import annotations

import json
import sys


def check(path: str) -> int:
    try:
        with open(path) as fh:
            lines = [ln for ln in fh.read().splitlines() if ln.strip()]
        d = json.loads(lines[-1])
    except Exception as e:  # noqa: BLE001
        print(f"quiet_gate: cannot parse {path}: {e}", file=sys.stderr)
        return 2
    ratio = d.get("canary_ratio")
    suspect = d.get("episode_suspect")
    ok = ratio is not None and ratio <= 1.2 and suspect is False
    print(
        f"quiet_gate: canary_ratio={ratio} episode_suspect={suspect} "
        f"-> {'QUIET' if ok else 'DEGRADED'}",
        file=sys.stderr,
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(check(sys.argv[1]))
