"""avocado_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of bigdatagenomics/avocado.

This is NOT a port of the reference (a Spark-2.2/Scala RDD pipeline
system). Every operator is re-expressed as an idiomatic PySpark
DataFrame / SQL computation so Catalyst + Tungsten pick the physical
strategy; pure-Python kernels exist only where Spark lacks the
expression (CIGAR/MD string parsing, local realignment) and run as
Arrow-batched pandas UDFs.

Layout:
    session    — tuned SparkSession bootstrap
    schemas    — StructTypes for the genomic data model (SURVEY §1)
    operators  — one module per operator family (SURVEY §2)
    functions  — column-expression kernels (log-space math, Phred, Fisher)
    streaming  — Structured Streaming surface over event tables
"""

from avocado_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
