"""bravo_spark — a PySpark-native snapshot-analytics engine.

A brand-new engine with the query and data-processing capabilities of
king/bravo (a Flink savepoint analytics library): read keyed/operator state
snapshots as DataFrames, transform them with relational operators, and write
back valid snapshots — plus large-scale LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for 100 TB
on a real cluster.

Design stance (SURVEY.md §7): DataFrames end-to-end; Catalyst does the
optimizing; custom code only at the binary ends (snapshot codec/source/sink)
and in genuinely non-relational operators.
"""

__version__ = "0.1.0"

from bravo_spark.session import get_spark  # noqa: F401
from bravo_spark import llmops  # noqa: F401,E402
from bravo_spark import api  # noqa: F401,E402
