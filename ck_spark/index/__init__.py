from ck_spark.index.builder import IndexPaths, build_index

__all__ = ["build_index", "IndexPaths"]
