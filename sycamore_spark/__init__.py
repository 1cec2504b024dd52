"""sycamore_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of aryn-ai/sycamore, re-expressed Spark-first.

Entry points:
    import sycamore_spark as ss
    spark = ss.init()
    ds = ss.DocSet(spark.read.parquet(...))
"""

from sycamore_spark.context import init
from sycamore_spark.docset import DocSet, GroupedDocSet

__version__ = "0.1.0"
__all__ = ["init", "DocSet", "GroupedDocSet", "__version__"]
