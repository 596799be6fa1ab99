"""DataStream-style linear pipeline entry point (SURVEY §3.2).

The reference's second API builds pipelines as a linear operator chain —
``LogicalGraph::from_linear_operators([SourceConfig, MapConfig, KeyByConfig,
ReduceConfig, SinkConfig], ...)`` (reference src/api/logical_graph.rs:316-354,
validated :550-572: Reduce requires a KeyBy immediately before it). The Spark
restatement is a thin fluent shim over the DataFrame API: each stage appends
the idiomatic DataFrame operation, so the "compiled" pipeline IS a Catalyst
plan — chaining/fusion, exchanges, and partial aggregation are Spark's.

The ``reduce()`` stage mirrors the reference ReduceFunction's fixed
min/max/sum/count/avg accumulator over a single value column (reference
src/runtime/functions/reduce/reduce_function.rs:17-115) including its
5-column output shape. ``map`` takes a Column-expression dict (JVM-native)
or a pandas-batch callable (Arrow path) — the two CustomMapFunction flavors.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class LinearPipeline:
    """Source → map* → key_by → reduce | agg → sink, validated like the
    reference's linear-graph builder."""

    def __init__(self, df: DataFrame):
        self._df = df
        self._keys: list[str] | None = None

    @classmethod
    def source(cls, df: DataFrame) -> "LinearPipeline":
        return cls(df)

    def map(
        self,
        exprs: dict[str, Column] | None = None,
        batch_fn: Callable | None = None,
        schema: str | None = None,
    ) -> "LinearPipeline":
        """Projection/transform stage. ``exprs``: columns to add/replace as
        native expressions (reference ProjectionFunction). ``batch_fn``:
        pandas-batch callable run via mapInPandas with ``schema`` (reference
        CustomMapFunction; the Arrow slow path — prefer exprs)."""
        out = self._df
        if exprs:
            for name, col in exprs.items():
                out = out.withColumn(name, col)
        if batch_fn is not None:
            if schema is None:
                raise ValueError("batch_fn requires an output schema")
            out = out.mapInPandas(batch_fn, schema=schema)
        nxt = LinearPipeline(out)
        nxt._keys = self._keys
        return nxt

    def filter(self, cond: Column) -> "LinearPipeline":
        nxt = LinearPipeline(self._df.filter(cond))
        nxt._keys = self._keys
        return nxt

    def key_by(self, *cols: str) -> "LinearPipeline":
        """Declares the key columns for the next stateful stage. No eager
        shuffle: Catalyst inserts the exchange where the consuming operator
        needs it (the reference's KeyBy+Hash edge is explicit because its
        runtime has no planner; ours does)."""
        nxt = LinearPipeline(self._df)
        nxt._keys = list(cols)
        return nxt

    def reduce(self, value_col: str) -> DataFrame:
        """The reference ReduceFunction: per key → min/max/sum/count/avg of
        one value column (5-col batch, reduce_function.rs result extractor).
        Requires key_by immediately before (logical_graph.rs:550-572)."""
        if not self._keys:
            raise ValueError("reduce requires key_by immediately before it")
        v = F.col(value_col)
        return self._df.groupBy(*self._keys).agg(
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.sum(v).alias("sum"),
            F.count(v).alias("count"),
            F.avg(v).alias("avg"),
        )

    def agg(self, *exprs: Column) -> DataFrame:
        if not self._keys:
            raise ValueError("agg requires key_by immediately before it")
        return self._df.groupBy(*self._keys).agg(*exprs)

    def sink_parquet(self, path: str, mode: str = "overwrite") -> None:
        self._df.write.mode(mode).parquet(path)

    def dataframe(self) -> DataFrame:
        return self._df
