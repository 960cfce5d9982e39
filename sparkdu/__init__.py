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

_LAZY = {
    "extract_pages": ("sparkdu.api", "extract_pages"),
    "extract_pages_staged": ("sparkdu.staged", "extract_pages_staged"),
    "parse_nodes_df": ("sparkdu.api", "parse_nodes_df"),
    "ExtractConfig": ("sparkdu.api", "ExtractConfig"),
    "get_spark": ("sparkdu.session", "get_spark"),
    "run_extract_job": ("sparkdu.lineage", "run_extract_job"),
    "ExtractJobConfig": ("sparkdu.lineage", "ExtractJobConfig"),
    "build_edges_grouped": ("sparkdu.graph", "build_edges_grouped"),
    "TableCatalog": ("sparkdu.tables", "TableCatalog"),
}


def __getattr__(name):
    """Lazy public API: `from sparkdu import extract_pages` without forcing
    a pyspark import for stdlib-only consumers (fixtures, tests)."""
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
