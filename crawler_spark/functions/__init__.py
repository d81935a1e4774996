"""Training-data pipeline operators (web-scale corpus processing).

Beyond the reference's crawl operators, a 100 TB training-data pipeline
needs dedup / similarity / text-analysis / multimodal stages.  All hot
paths are built-in Spark SQL expressions (JVM, codegen); Python appears
only as Arrow-batched pandas UDFs where Spark lacks the primitive
(simhash bit-banging, winnowing, embedding batch math).
"""
