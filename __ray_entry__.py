"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline on sf0.001; ``queries()``
exposes every implemented operator family from SURVEY.md §2 (plus the
training-data ops) as callables over an ``sf_dir``; ``oracle_sql()``
gives the DuckDB-equivalent SQL for each SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or anywhere in the library.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline: derived change stream -> full CDC engine
    (normalize -> salted shuffle -> LWW merge -> manifest commit) ->
    committed table, on /root/testdata/sf0.001."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.queries import (
        q_cdc_apply_full,
    )

    return q_cdc_apply_full("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
