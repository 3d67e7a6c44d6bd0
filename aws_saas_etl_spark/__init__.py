"""aws_saas_etl_spark — a PySpark-native analytics engine.

A ground-up re-expression of the data-processing capabilities of the
reference SaaS ETL app (``thewiin/aws-saas-etl``) as an idiomatic Spark
engine: declarative DataFrame/SQL plans optimized by Catalyst, Parquet-first
I/O, vectorized (Arrow) Python only where built-ins can't express the
semantics, plus the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing, event-time windows)
that a 100 TB deployment needs.

Design rules (see SURVEY.md §7):
- No ``collect()`` / driver-side row loops inside operator paths.
- Broadcast only bounded dimension tables; facts shuffle on their keys.
- Every operator is deterministic (stable tie-breaking, no wall-clock).
- No custom Catalyst extensions — everything is public DataFrame/SQL API.
"""

__version__ = "0.1.0"

from aws_saas_etl_spark.session import get_spark  # noqa: F401
from aws_saas_etl_spark.catalog import TABLES, load_tables, register_views  # noqa: F401
