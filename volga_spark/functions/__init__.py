"""ML window-UDAF library (SURVEY §2.9).

The reference registers 30 aggregate UDFs usable inside its window operator
(reference src/api/planner.rs:133-136, cate/udf.rs:287-417,
top/udf.rs:131-141). Here:

- ``_where`` family: exact compositions of built-in Spark expressions
  (JVM-side, codegen'd — the fast path).
- ``_cate`` / ``top`` / ``top_n_*`` families: incremental add/retract
  accumulators swept over per-key sorted frames via ``applyInPandas``
  (Arrow-batched). CSV output format matches the reference bit-for-bit.
"""

from volga_spark.functions.where_funcs import (
    avg_where,
    count_where,
    max_where,
    min_where,
    sum_where,
)
from volga_spark.functions.sliding import SlidingSpec, apply_sliding_aggs

__all__ = [
    "sum_where",
    "avg_where",
    "count_where",
    "min_where",
    "max_where",
    "SlidingSpec",
    "apply_sliding_aggs",
]
