from hbase_1_3_0_spark.filters.ast import *  # noqa: F401,F403
from hbase_1_3_0_spark.filters.ast import __all__ as _ast_all
from hbase_1_3_0_spark.filters.compiler import apply_filter, compile_filter
from hbase_1_3_0_spark.filters.parser import parse_filter

__all__ = list(_ast_all) + ["apply_filter", "compile_filter", "parse_filter"]
