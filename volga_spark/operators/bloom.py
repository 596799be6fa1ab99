"""Bloom-filter semi-join reduction — prune the fact side BEFORE the
shuffle.

The classic distributed-join reduction: when a selective key set (a
filtered dimension, a dedup winner list, a benchmark id set) joins a huge
fact table, most fact rows shuffle only to be dropped at the join. A
Bloom filter over the build-side keys, evaluated MAP-SIDE on the fact
scan, drops non-matching rows before the exchange — the shuffle then
carries only true matches plus a bounded false-positive fraction, and the
real join afterwards removes the false positives exactly.

Spark exposes no PySpark surface for its internal runtime bloom
(`spark.sql.optimizer.runtime.bloomFilter.*` rewrites some plans
automatically; `DataFrameStatFunctions.bloomFilter` is Scala-only), so
this is a first-class PySpark implementation with both halves
distribution-correct:

- BUILD (:func:`build_bloom`): k bit positions per key from
  `xxhash64(key, seed_i)` — computed JVM-side, folded to (word_idx,
  bits) rows with native shift exprs and OR-merged by a `bit_or`
  aggregate (map-side combinable; no Python, no `.rdd` — the engine-wide
  ban). The driver only ever collects the NONZERO bitmap words (≤ m/64
  rows), never keys; a 10M-key filter at fpp≈0.01 is ~12 MB.
- PROBE (:func:`might_contain`): a pure native-expression predicate —
  for each of the k hashes, test bit `pmod(xxhash64(col, seed), m)` in
  the bitmap shipped as an array<long> literal. No Python in the probe
  path, so the filter rides inside WholeStageCodegen on the scan,
  upstream of any exchange (plan-asserted in tests).

Guarantees: xxhash64 is deterministic per (value, seed) on every
executor, so the filter has NO false negatives — `join(probe(fact), keys)
== join(fact, keys)` exactly (tested); fpp follows the standard
(1 - e^{-kn/m})^k bound and only affects shuffled bytes.

Sizing: bits default to n·10 (fpp≈0.0082 at k=7). The bitmap ships in the
probe expression — keep it ≤ a few MB (≈ up to ~10M build keys); past
that, a broadcast LEFT SEMI join on the distinct keys is Spark's native
map-side gate and the right tool (8+ bytes/key but exact).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS_PER_KEY = 10
_SEED_BASE = 0x5EED_B100


class BloomFilter:
    """Immutable bitmap + parameters; picklable (ships in closures/tests).

    `cast_to` records the canonical hash type the build side used
    ("bigint" for integral keys, "double" for float keys, None otherwise);
    the probe casts its column to the same type, because xxhash64 hashes
    int32 and int64 representations of the SAME value differently — an
    un-normalized int-vs-bigint key pair would give silent false
    negatives, breaking the no-false-negative guarantee."""

    def __init__(
        self, words: np.ndarray, n_bits: int, k: int, cast_to: str | None = None
    ):
        self.words = words  # uint64[ceil(n_bits/64)]
        self.n_bits = n_bits
        self.k = k
        self.cast_to = cast_to

    def __reduce__(self):
        return (BloomFilter, (self.words, self.n_bits, self.k, self.cast_to))


def _canonical_hash_type(dt) -> str | None:
    """Widening-only normalization per numeric family (lossless, so no
    ANSI overflow): all integrals hash as bigint, all floats as double.
    Non-numeric families hash as-is — build and probe key types must then
    match exactly (documented contract)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "bigint"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "double"
    return None


def _n_bits_k(expected_items: int, bits_per_key: int) -> tuple[int, int]:
    n_bits = max(64, expected_items * bits_per_key)
    n_bits = ((n_bits + 63) // 64) * 64  # whole words
    k = max(1, round(bits_per_key * math.log(2)))
    return n_bits, k


def build_bloom(
    build: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
) -> BloomFilter:
    """Distributed build, fully native: per key, k xxhash64 positions →
    (word_idx, single-bit word) rows via shift exprs → `bit_or` aggregate
    (map-side combinable). The driver collects only the nonzero words
    (≤ m/64 rows), independent of key count."""
    if expected_items is None:
        expected_items = build.select(key_col).distinct().count()
    n_bits, k = _n_bits_k(max(expected_items, 1), bits_per_key)
    n_words = n_bits // 64

    cast_to = _canonical_hash_type(build.schema[key_col].dataType)
    key_expr = F.col(key_col).cast(cast_to) if cast_to else F.col(key_col)
    pos_cols = F.array(
        *[
            F.pmod(
                F.xxhash64(key_expr, F.lit(_SEED_BASE + i)),
                F.lit(n_bits),
            ).cast("long")
            for i in range(k)
        ]
    )
    words_df = (
        build.select(F.explode(pos_cols).alias("p"))
        .select(
            F.shiftright(F.col("p"), 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
                "bits"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("word"))
    )
    words = np.zeros(n_words, dtype=np.uint64)
    for r in words_df.collect():
        words[int(r["word_idx"])] = np.uint64(np.int64(r["word"]))
    return BloomFilter(words, n_bits, k, cast_to)


def might_contain(bf: BloomFilter, col: str | Column) -> Column:
    """Native-expression membership test (no false negatives). The bitmap
    rides as an array<long> literal; each of the k probes is one xxhash64
    + shift/AND — all inside codegen."""
    c = F.col(col) if isinstance(col, str) else col
    if bf.cast_to:
        c = c.cast(bf.cast_to)  # hash the same representation the build did
    words_lit = F.lit(bf.words.astype(np.int64).tolist())
    pred = F.lit(True)
    for i in range(bf.k):
        pos = F.pmod(F.xxhash64(c, F.lit(_SEED_BASE + i)), F.lit(bf.n_bits)).cast(
            "long"
        )
        word = F.element_at(words_lit, F.shiftright(pos, 6).cast("int") + 1)
        # getbit takes the position as a column and is sign-safe for the
        # top bit of the (int64-reinterpreted) word
        bit = F.getbit(word, pos.bitwiseAND(F.lit(63)))
        pred = pred & (bit != 0)
    return pred


def bloom_semi_filter(
    fact: DataFrame,
    build: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    build_key_col: str | None = None,
) -> DataFrame:
    """`fact` filtered map-side to rows whose `key_col` probably appears in
    `build` (superset gate — every true match survives; follow with the
    real join for exact semantics)."""
    bf = build_bloom(
        build, build_key_col or key_col, expected_items, bits_per_key
    )
    return fact.filter(might_contain(bf, key_col))
