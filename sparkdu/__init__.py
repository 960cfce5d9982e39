"""sparkdu — PySpark-native document-understanding extraction engine.

Brand-new implementation of the capabilities of ``liladude/TranskribusDU``
(document parse -> node features -> neighbor graph -> classify -> reading
order -> extracted text) re-targeted to Common-Crawl-style web pages and
re-expressed Spark-first: DataFrame/Catalyst plans + Arrow-vectorized pandas
UDFs, no per-row Python. See SURVEY.md and SPEC.md.

This ``__init__`` stays import-light: no pyspark import here, so stdlib-only
submodules (fixtures) are usable without a JVM.
"""

__version__ = "0.1.0"
