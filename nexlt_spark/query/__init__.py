from nexlt_spark.query.model import Query, QueryFilters  # noqa: F401
from nexlt_spark.query.attrs import AttrFilter, save_doc_attrs  # noqa: F401
from nexlt_spark.query.exact import bm25_topk, run_query  # noqa: F401
from nexlt_spark.query.planner import choose_topk_path, topk, topk_rows  # noqa: F401
from nexlt_spark.query.select import SelectResponse, select  # noqa: F401
