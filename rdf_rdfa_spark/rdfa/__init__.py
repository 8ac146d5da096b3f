"""Pure-Python RDFa 1.1 parsing core.

Everything in this subpackage is Spark-free: it is the per-document
state machine that runs *inside* the vectorized `mapInPandas` UDF
(`rdf_rdfa_spark.pipeline.extract`). Semantics follow the W3C RDFa
Core 1.1 processing sequence as implemented by the reference
(/root/reference/lib/rdf/rdfa/reader.rb).
"""
