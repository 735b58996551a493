"""Named query inventory: every operator surfaced as a (Spark query,
DuckDB oracle) pair for the driver's correctness gate (SURVEY.md §7 Phase 1).

Importing this package populates the registry from all inventory modules.
"""

from bravo_spark.inventory.registry import QUERIES, ORACLES  # noqa: F401
from bravo_spark.inventory import reference  # noqa: F401
from bravo_spark.inventory import snapshot  # noqa: F401
from bravo_spark.inventory import dedup  # noqa: F401
from bravo_spark.inventory import textops  # noqa: F401
from bravo_spark.inventory import similarity  # noqa: F401
from bravo_spark.inventory import streaming  # noqa: F401
from bravo_spark.inventory import sampling  # noqa: F401
from bravo_spark.inventory import formats  # noqa: F401
from bravo_spark.inventory import tpch  # noqa: F401
from bravo_spark.inventory import graph  # noqa: F401
from bravo_spark.inventory import pipeline  # noqa: F401
from bravo_spark.inventory import state_store  # noqa: F401
