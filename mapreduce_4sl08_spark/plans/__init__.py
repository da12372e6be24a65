from .registry import (QUERIES, QuerySpec, all_session_memos, oracle_sqls,
                       query_fns)

__all__ = ["QUERIES", "QuerySpec", "query_fns", "oracle_sqls"]
