"""nmalign_spark — PySpark-native forced fuzzy alignment / extraction engine.

From-scratch reimplementation of the capabilities of bertsky/nmalign
(/root/reference) on Apache Spark: DataFrame/SQL relational shell, Arrow-
vectorized alignment kernels, web-scale extraction pipeline plus
training-data operators (dedup, similarity search, text analysis).

Public API parity with the reference (`nmalign.match`,
/root/reference/nmalign/__init__.py:3-7): :func:`match` runs on plain Python
lists with identical semantics, so the same kernel serves both the local API
and the distributed pipeline.
"""

from .kernel.assign import match

__all__ = ["match"]
__version__ = "0.1.0"
