"""crawler_spark — a PySpark-native distributed crawl/extract engine.

A from-scratch reimplementation of the query/data-processing semantics of
ab-shetty/Crawler (reference snapshot at /root/reference, cited per-function
as file:line in docstrings) re-expressed as Spark dataflow:

- ``crawler_spark.core``      pure-Python semantic core (HTML extraction,
  URL normalization, chunking, relevance) shared verbatim by the single-node
  test oracle and the vectorized pandas-UDF wrappers — byte-identity between
  oracle and engine is by construction.
- ``crawler_spark.operators`` Spark operators: extraction UDFs, dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
  text analysis, multimodal plumbing.
- ``crawler_spark.frontier``  the distributed BFS URL frontier: wave loop,
  seen-set anti-join + partitioned Bloom prefilter, per-host politeness,
  robots, checkpointed wave commits with lineage.
- ``crawler_spark.sinks``     markdown/JSON export matching the reference's
  ``export_to_markdown`` layout.
- ``crawler_spark.datagen``   deterministic synthetic web-corpus generator
  in the driver-specified ``(url, warc_ts, html, text, lang)`` shape.
"""

__version__ = "0.1.0"
