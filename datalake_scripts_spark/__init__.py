"""datalake_scripts_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL collection ``vgarshin/datalake_scripts``
(semi-structured JSON -> flat relational normalization; Parquet + JDBC dual
sink), extended with the relational operator surface, streaming, and
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) required at 100 TB scale.

Design principles
-----------------
- DataFrame/SQL first: declare logical plans, let Catalyst pick physical.
- Explicit schemas on read (no inference pass), explicit column contracts
  on write.
- No row-at-a-time Python UDFs in hot paths; Arrow-batched pandas UDFs only
  where built-ins can't express the semantics.
- Broadcast small dimensions, AQE on, partition-pruning-friendly layouts.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .io import read_table, register_views  # noqa: F401
