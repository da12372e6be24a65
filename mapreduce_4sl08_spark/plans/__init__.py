from .registry import QUERIES, QuerySpec, query_fns, oracle_sqls

__all__ = ["QUERIES", "QuerySpec", "query_fns", "oracle_sqls"]
