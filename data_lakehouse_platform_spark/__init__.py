"""PySpark-native analytics engine with the capabilities of the
reference lakehouse platform (medallion batch + streaming + DQ),
extended with LLM-scale data-pipeline operators.

Built Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst; Pandas UDFs only where built-ins can't express semantics.
"""

from data_lakehouse_platform_spark.session import get_spark
from data_lakehouse_platform_spark.catalog import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]
