"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``       — flagship extraction pipeline over sf0.001.
- ``queries()``     — one callable per implemented operator/pipeline
  (SURVEY.md §2 + training-data ops); each takes an sf_dir.
- ``oracle_sql()``  — DuckDB-equivalent SQL for every SQL-expressible
  query (same column names; rows-only check for the rest).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# the driver may import this module by file path; make sure the repo
# root (where the pdfextract_ray package lives) is importable
_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from pdfextract_ray.pipelines.queries import build_oracles, build_queries


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (Ray already up)."""
    return build_queries()["extract_flagship"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracles()
