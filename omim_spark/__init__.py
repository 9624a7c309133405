"""omim_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of monarch-initiative/omim.

Not a port: the reference's imperative pandas/rdflib pipeline
(see /root/reference, cited per-module as file:line) is re-expressed as
declarative Spark DataFrame / SQL plans so Catalyst + Tungsten pick the
physical strategy, and every operator is designed for a multi-executor
cluster at 100 TB scale (broadcast dims, partial aggregation, pushed
filters, narrow UDF surface).
"""

__version__ = "0.1.0"
