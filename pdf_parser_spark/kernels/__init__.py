"""Pure pandas/numpy kernels — no Spark imports allowed in this package.

One implementation, two harnesses (SURVEY.md §7.1): these functions are
called directly by the single-node golden runner in pytest AND wrapped by
pandas UDFs / mapInPandas in ``pdf_parser_spark.pipeline``. Golden equality
then tests orchestration (ordering, partitioning, resume), not two kernel
implementations drifting apart.
"""
