"""Driver-contract query registry.

Each submodule exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB-equivalent ANSI SQL). Names missing
from ORACLES get the driver's weaker rows-only check (reserved for
non-SQL-expressible operators).
"""

from __future__ import annotations

from . import reference
from . import llm_ops
from . import streaming_ops
from . import extended_ops
from . import tpch_suite
from . import advanced_ops
from . import curation_ops
from . import ml_ops
from . import privacy_ops
from . import tokenizer_ops
from . import c4_ops
from . import wordpiece_ops
from . import preference_ops
from . import bitext_ops
from . import eval_ops
from . import sft_ops

QUERIES = {}
ORACLES = {}
for _m in (
    reference,
    llm_ops,
    streaming_ops,
    extended_ops,
    tpch_suite,
    advanced_ops,
    curation_ops,
    ml_ops,
    privacy_ops,
    tokenizer_ops,
    c4_ops,
    wordpiece_ops,
    preference_ops,
    bitext_ops,
    eval_ops,
    sft_ops,
):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

__all__ = ["QUERIES", "ORACLES"]
