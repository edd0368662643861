from mariadb_columnstore_engine_spark.plans.registry import QUERIES, QuerySpec, load_all, query

__all__ = ["QUERIES", "QuerySpec", "load_all", "query"]
