"""Fuzzy record linkage / entity resolution — blocked pairwise matching.

The structured-records sibling of document dedup: customer/supplier/vendor
tables arrive with typos, token reorderings, and re-registrations, and the
platform must decide which rows are the SAME real-world entity. The classic
pipeline (Fellegi–Sunter shape, the same blocking discipline every
production ER system uses — never all-pairs):

  1. BLOCKING: each record emits one or more cheap keys (lowercase prefix,
     sorted-token prefix, consonant skeleton); only records sharing a key
     are ever compared. All keys are native expressions, built from the
     SAME expression text the DuckDB oracle runs — engine-exact.
  2. HOT-BLOCK GUARD: a block of size B yields B² pairs, so blocks larger
     than `max_block_size` are DROPPED (counted per key, filtered before
     the self-join) — the same Σdf² discipline as winnowing's skew guard
     and the CC `max_shingle_freq` prune. Recall loss is the documented
     trade; a too-common key (e.g. skeleton of "llc") is a bad key, not a
     bad pair.
  3. SCORING: candidate pairs join back to the records and score with
     exact arithmetic — normalized Levenshtein (integer DP distance over
     exact lengths, one division) and token Jaccard (integer set sizes,
     one division), combined by caller-supplied weights. Both Spark and
     DuckDB implement the same classic Levenshtein DP → identical ints.
  4. RESOLUTION: pairs at/above `threshold` are edges; the shared
     large-star/small-star connected components (`operators/components`)
     assigns each record the smallest id in its match-closure — the
     entity id. Unmatched records keep their own id.

Scale: the self-join shuffles (id, key) pairs — bytes ∝ records × keys,
never text; pair width is bounded by `max_block_size`²·#blocks; scoring
joins pairs→records on id (sort-merge on the id, the only wide join, its
width = candidate pairs, not records²). CC cost is rounds × edges as in
dedup clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volga_spark.operators.components import connected_components

# Blocking-key SQL templates: the SAME text runs on Spark and DuckDB
# (regexp_replace 'g' flag is the DuckDB spelling; Spark's regexp_replace
# is global by default and ACCEPTS no flag — so we keep two spellings of
# one regex, pinned equal by tests).


def _prefix_expr(col: str, n: int) -> str:
    return f"substring(lower(trim({col})), 1, {n})"


def _sorted_tokens_expr(col: str, n_tokens: int) -> str:
    # first n tokens of the ALPHABETICALLY sorted token list — survives
    # token reorder ("smith john" vs "john smith")
    return (
        f"array_join(slice(array_sort(split(lower(trim({col})), ' +')), "
        f"1, {n_tokens}), ' ')"
    )


def _skeleton_expr(col: str) -> str:
    # consonant skeleton: drop vowels + spaces after lowering — survives
    # most single-character typos in vowels and spacing
    return f"regexp_replace(lower({col}), '[aeiou \\t]', '')"


def _init_last_expr(col: str) -> str:
    # first character + last token ("j smith" for both "John Smith" and
    # "Jon Smith") — the classic surname-block that survives given-name
    # typos the other three keys all miss
    return (
        f"concat(substring(lower(trim({col})), 1, 1), ' ', "
        f"element_at(split(lower(trim({col})), ' +'), -1))"
    )


def blocking_keys(
    records: DataFrame,
    id_col: str,
    field: str,
    prefix_len: int = 4,
    sort_tokens: int = 2,
    use_skeleton: bool = True,
) -> DataFrame:
    """(id, block_key) — one row per strategy per record; keys are tagged
    with their strategy so identical strings from different strategies
    never collide."""
    strategies = [
        ("p", _prefix_expr(field, prefix_len)),
        ("t", _sorted_tokens_expr(field, sort_tokens)),
        ("i", _init_last_expr(field)),
    ]
    if use_skeleton:
        strategies.append(("s", _skeleton_expr(field)))
    parts = [
        records.selectExpr(
            f"{id_col} AS __id", f"concat('{tag}:', {expr}) AS __key"
        )
        for tag, expr in strategies
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def candidate_pairs(
    keys: DataFrame,
    max_block_size: int = 64,
) -> DataFrame:
    """(id_a, id_b) with id_a < id_b — records sharing ≥1 surviving block
    key. Blocks larger than `max_block_size` are dropped before the
    self-join (the B² guard)."""
    sizes = keys.groupBy("__key").agg(F.count("*").alias("__bn"))
    kept = keys.join(
        sizes.filter(F.col("__bn") <= max_block_size).select("__key"),
        "__key",
    )
    a = kept.select(F.col("__key"), F.col("__id").alias("id_a"))
    b = kept.select(F.col("__key"), F.col("__id").alias("id_b"))
    return (
        a.join(b, "__key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def score_pairs(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str,
    field: str,
    w_lev: float = 0.5,
    w_jac: float = 0.5,
) -> DataFrame:
    """Exact similarity per candidate pair:

    - `lev_sim` = 1 - levenshtein/max(len) over the SORTED-token
      reconstruction of each string (sorted-neighborhood similarity:
      "Smith John" vs "John Smith" is distance 0, while a real typo still
      costs its edits), 1.0 when both empty,
    - `jac_sim` = |token∩| / |token∪| (distinct tokens; 1.0 when both
      empty),
    - `score`   = w_lev·lev_sim + w_jac·jac_sim.

    All inputs to the divisions are exact integers; the score is the same
    expression tree on both engines."""
    norm = F.lower(F.trim(F.col(field)))
    sorted_str = F.array_join(F.array_sort(F.split(norm, " +")), " ")
    toks = F.array_distinct(F.split(norm, " +"))
    sides = records.select(
        F.col(id_col).alias("__rid"),
        sorted_str.alias("__s"),
        toks.alias("__t"),
    )
    a = sides.select(
        F.col("__rid").alias("id_a"),
        F.col("__s").alias("__sa"),
        F.col("__t").alias("__ta"),
    )
    b = sides.select(
        F.col("__rid").alias("id_b"),
        F.col("__s").alias("__sb"),
        F.col("__t").alias("__tb"),
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    maxlen = F.greatest(F.length("__sa"), F.length("__sb"))
    lev_sim = F.when(maxlen == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein("__sa", "__sb") / maxlen
    )
    inter = F.size(F.array_intersect("__ta", "__tb"))
    union = F.size(F.array_union("__ta", "__tb"))
    jac_sim = F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
    return j.select(
        "id_a",
        "id_b",
        lev_sim.alias("lev_sim"),
        jac_sim.alias("jac_sim"),
        (F.lit(w_lev) * lev_sim + F.lit(w_jac) * jac_sim).alias("score"),
    )


def resolve_entities(
    records: DataFrame,
    id_col: str,
    field: str,
    threshold: float = 0.82,
    max_block_size: int = 64,
    prefix_len: int = 4,
    sort_tokens: int = 2,
    w_lev: float = 0.5,
    w_jac: float = 0.5,
) -> DataFrame:
    """(id, entity_id): every record mapped to the smallest record id in
    its transitive match-closure; singletons map to themselves."""
    keys = blocking_keys(
        records, id_col, field, prefix_len=prefix_len,
        sort_tokens=sort_tokens,
    )
    pairs = candidate_pairs(keys, max_block_size=max_block_size)
    edges = score_pairs(
        records, pairs, id_col, field, w_lev=w_lev, w_jac=w_jac
    ).filter(F.col("score") >= threshold).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(edges, "src", "dst")
    return (
        records.select(F.col(id_col).alias("id"))
        .join(comp.withColumnRenamed("node", "id"), "id", "left")
        .select(
            "id", F.coalesce("component", "id").alias("entity_id")
        )
    )


def linkage_oracle_sql(
    table: str,
    id_col: str,
    field: str,
    prefix_len: int = 4,
    sort_tokens: int = 2,
    max_block_size: int = 64,
    w_lev: float = 0.5,
    w_jac: float = 0.5,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of blocking_keys → candidate_pairs → score_pairs, for
    oracle tests. Same key expressions (DuckDB spellings of the same
    regexes/slices), same B² guard, same similarity arithmetic."""
    prefix = f"substring(lower(trim({field})), 1, {prefix_len})"
    sorted_toks = (
        f"array_to_string(list_sort(string_split_regex(lower(trim({field})),"
        f" ' +'))[1:{sort_tokens}], ' ')"
    )
    skeleton = f"regexp_replace(lower({field}), '[aeiou \\t]', '', 'g')"
    init_last = (
        f"concat(substring(lower(trim({field})), 1, 1), ' ', "
        f"(string_split_regex(lower(trim({field})), ' +'))[-1])"
    )
    return f"""
    WITH r AS (SELECT * FROM {table} WHERE {where}),
    keys AS (
        SELECT {id_col} AS id, concat('p:', {prefix}) AS k FROM r
        UNION ALL
        SELECT {id_col}, concat('t:', {sorted_toks}) FROM r
        UNION ALL
        SELECT {id_col}, concat('i:', {init_last}) FROM r
        UNION ALL
        SELECT {id_col}, concat('s:', {skeleton}) FROM r
    ),
    kept AS (
        SELECT * FROM keys
        WHERE k IN (SELECT k FROM keys GROUP BY k
                    HAVING count(*) <= {max_block_size})
    ),
    pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM kept a JOIN kept b ON a.k = b.k AND a.id < b.id
    ),
    s AS (
        SELECT {id_col} AS id,
               array_to_string(list_sort(
                   string_split_regex(lower(trim({field})), ' +')), ' ')
                   AS st,
               list_distinct(string_split_regex(lower(trim({field})), ' +'))
                   AS tk
        FROM r
    )
    SELECT p.id_a, p.id_b,
           CASE WHEN greatest(length(a.st), length(b.st)) = 0 THEN 1.0
                ELSE 1.0 - levenshtein(a.st, b.st)
                     / greatest(length(a.st), length(b.st)) END AS lev_sim,
           CASE WHEN len(list_distinct(list_concat(a.tk, b.tk))) = 0 THEN 1.0
                ELSE len(list_intersect(a.tk, b.tk))
                     / len(list_distinct(list_concat(a.tk, b.tk))) END
               AS jac_sim,
           {w_lev} * (CASE WHEN greatest(length(a.st), length(b.st)) = 0
                      THEN 1.0 ELSE 1.0 - levenshtein(a.st, b.st)
                           / greatest(length(a.st), length(b.st)) END)
           + {w_jac} * (CASE WHEN len(list_distinct(list_concat(a.tk, b.tk)))
                        = 0 THEN 1.0
                        ELSE len(list_intersect(a.tk, b.tk))
                             / len(list_distinct(list_concat(a.tk, b.tk)))
                        END) AS score
    FROM pairs p JOIN s a ON p.id_a = a.id JOIN s b ON p.id_b = b.id
    """
