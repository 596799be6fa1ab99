"""Deterministic datagen source (SURVEY §2.1).

Mirrors the reference's DatagenSourceConfig field generators (reference
src/runtime/functions/source/datagen_source.rs:28-36,71-93):
IncrementalTimestamp / ProcessingTimestamp / String / Key{num_unique} /
Increment / Uniform / Values (round-robin) — expressed as pure column
recipes over ``spark.range`` so
generation distributes across partitions with no driver-side data, and so
the same closed-form arithmetic can be reproduced by any engine (the DuckDB
oracle regenerates the identical rows from ``range()``).

"Uniform" uses an explicit LCG hash (seeded, arithmetic-only) rather than
rand(): reproducibility across engines and runs is the point of a datagen
used in correctness gates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 2^31-1 Park–Miller modulus keeps i*A exactly representable in int64
_LCG_A = 48271
_LCG_M = (1 << 31) - 1


@dataclass
class FieldSpec:
    """One generated column. kind ∈ incremental_timestamp | key | increment
    | uniform | values."""

    name: str
    kind: str
    # incremental_timestamp: start epoch seconds + step_ms per row
    start_s: int = 1_700_000_000
    step_ms: int = 1000
    # key: num_unique
    num_unique: int = 4
    # uniform: [lo, hi) scaled to 1 decimal; seed offsets the LCG stream
    lo: float = 0.0
    hi: float = 100.0
    seed: int = 1
    # values: round-robin list
    values: tuple = ()
    # string: deterministic md5-derived text of this length
    length: int = 8
    # incremental_timestamp: ms-precision start (reference start_ms); when
    # set it wins over start_s
    start_ms: int | None = None
    # increment: start + i*step (reference Increment{start, step})
    inc_start: int = 0
    inc_step: int = 1

    def column(self, i) -> F.Column:
        if self.kind == "incremental_timestamp":
            base_us = (
                self.start_ms * 1000
                if self.start_ms is not None
                else self.start_s * 1_000_000
            )
            return F.timestamp_micros(
                F.lit(base_us) + i * F.lit(self.step_ms * 1000)
            )
        if self.kind == "processing_timestamp":
            # wall-clock at generation (reference ProcessingTimestamp) —
            # inherently non-deterministic, so no oracle form exists
            return F.current_timestamp()
        if self.kind == "string":
            # deterministic "random-looking" text: md5 of the row index
            # (+seed), truncated — reproducible on any engine
            return F.substring(
                F.md5(F.concat(F.lit(str(self.seed) + ":"), i.cast("string"))),
                1,
                self.length,
            )
        if self.kind == "key":
            return F.concat(F.lit("k"), (i % F.lit(self.num_unique)).cast("string"))
        if self.kind == "increment":
            return F.lit(self.inc_start) + i * F.lit(self.inc_step)
        if self.kind == "uniform":
            # exact 1-decimal values — no round() anywhere (engines disagree
            # on tie rules: Spark HALF_UP vs DuckDB HALF_EVEN)
            h = ((i + F.lit(self.seed)) * F.lit(_LCG_A)) % F.lit(_LCG_M)
            span10 = int((self.hi - self.lo) * 10)
            return F.lit(self.lo) + (h % F.lit(span10)) / F.lit(10.0)
        if self.kind == "values":
            n = len(self.values)
            expr = None
            for j, v in enumerate(self.values):
                cond = i % F.lit(n) == j
                expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
            return expr
        raise ValueError(f"unknown generator kind: {self.kind}")

    def duck_sql(self, i: str = "i") -> str:
        """The identical recipe in DuckDB SQL (for oracles)."""
        if self.kind == "incremental_timestamp":
            base_us = (
                self.start_ms * 1000
                if self.start_ms is not None
                else self.start_s * 1_000_000
            )
            return (
                f"make_timestamp(CAST({base_us} AS BIGINT)"
                f" + {i} * {self.step_ms * 1000}) AS {self.name}"
            )
        if self.kind == "processing_timestamp":
            raise ValueError("processing_timestamp is wall-clock — not oracle-able")
        if self.kind == "string":
            return (
                f"substr(md5('{self.seed}:' || CAST({i} AS VARCHAR)), 1, "
                f"{self.length}) AS {self.name}"
            )
        if self.kind == "key":
            return f"'k' || CAST({i} % {self.num_unique} AS VARCHAR) AS {self.name}"
        if self.kind == "increment":
            return f"{self.inc_start} + {i} * {self.inc_step} AS {self.name}"
        if self.kind == "uniform":
            span10 = int((self.hi - self.lo) * 10)
            return (
                f"{self.lo} + ((({i} + {self.seed}) * {_LCG_A}) % {_LCG_M}) % {span10}"
                f" / 10.0 AS {self.name}"
            )
        if self.kind == "values":
            n = len(self.values)
            whens = " ".join(
                f"WHEN {i} % {n} = {j} THEN '{v}'" for j, v in enumerate(self.values)
            )
            return f"CASE {whens} END AS {self.name}"
        raise ValueError(self.kind)


@dataclass
class DatagenSpec:
    n_rows: int
    fields: list[FieldSpec] = field(default_factory=list)


def generate(spark: SparkSession, spec: DatagenSpec, partitions: int | None = None) -> DataFrame:
    base = spark.range(0, spec.n_rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    return base.select(*[f.column(i).alias(f.name) for f in spec.fields])


def duck_generate_sql(spec: DatagenSpec) -> str:
    cols = ", ".join(f.duck_sql("i") for f in spec.fields)
    return f"(SELECT {cols} FROM range(0, {spec.n_rows}) AS t(i))"
