from pramen_spark.queries.catalog import QUERIES, QuerySpec, load_table

__all__ = ["QUERIES", "QuerySpec", "load_table"]
