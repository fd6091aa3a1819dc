"""Driver-contract query plans.

Each module registers (name → Spark plan builder) and (name → DuckDB oracle
SQL).  ``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` aggregate
these registries.  Every Spark plan aliases its computed columns to the
exact names its oracle SQL uses (the driver sorts columns by name before
value-hashing), floats are rounded identically on both sides, and
timestamps are compared as epoch-µs BIGINT.
"""

from processor_edf_spark.plans.registry import ORACLE, QUERIES, register

# import for registration side effects
from processor_edf_spark.plans import relational  # noqa: E402,F401
from processor_edf_spark.plans import text_dedup  # noqa: E402,F401
from processor_edf_spark.plans import similarity  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "register"]
