"""One-command validation matrix (what the driver checks, locally).

Usage: python3 tools/smoke.py [--fast]

Runs: pytest suite → entry() smoke → full oracle sweep at sf0.01 →
(unless --fast) headline bench at sf0.01 scale. Exits non-zero on any
failure. Intended as the first command of a new round.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str], env: dict | None = None) -> bool:
    print("=== %s ===" % label, flush=True)
    r = subprocess.run(cmd, cwd=ROOT, env={**os.environ, **(env or {})})
    ok = r.returncode == 0
    print("=== %s: %s ===" % (label, "OK" if ok else "FAIL"), flush=True)
    return ok


def main() -> int:
    fast = "--fast" in sys.argv
    ok = True
    ok &= run("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
    ok &= run("entry() smoke", [sys.executable, "-c", (
        "import ray; ray.init(address='local', num_cpus=8, "
        "include_dashboard=False, logging_level='ERROR'); "
        "import __ray_entry__ as e; n = e.entry().count(); "
        "assert n > 0, n; print('entry rows:', n); ray.shutdown()")])
    ok &= run("oracle sweep sf0.01",
              [sys.executable, "tools/check_oracles.py", "/root/testdata/sf0.01"])
    if not fast:
        ok &= run("bench (sf0.01 scale)", [sys.executable, "bench.py"],
                  env={"GRAFT_SF_DIR": "/root/testdata/sf0.01",
                       "BENCH_REPEAT": "1", "RAY_GRAFT_CPUS": "8"})
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
