from nexlt_spark.query.model import Query, QueryFilters  # noqa: F401
from nexlt_spark.query.exact import bm25_topk, run_query  # noqa: F401
