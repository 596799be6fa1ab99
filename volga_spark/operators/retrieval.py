"""Distributed BM25 full-text retrieval over a document corpus.

The missing piece between the dedup/quality tier and the similarity tier:
lexical top-k search (data curation uses it for decontamination lookups,
hard-negative mining, and as the sparse half of hybrid retrieval next to
`operators/similarity`). Everything is expressed as DataFrame ops so
Catalyst plans it; no Python in the hot path.

Pipeline shape (all shuffles map-side combinable, query side broadcast):

  tokens    = explode(split(text))                -- narrow
  postings  = tokens.groupBy(doc_id, term).count  -- shuffle on (doc_id, term)
  doclen    = tokens.groupBy(doc_id).count        -- same shuffle key family
  stats     = doclen.agg(N, sum_dl)               -- 1 row, crossJoin(broadcast)
  qterms    = queries exploded, DISTINCT          -- tiny, broadcast
  matched   = postings ⋈ broadcast(qterms)        -- prunes to query terms
  df        = matched.groupBy(term).countDistinct -- df over PRUNED term set
  score     = Σ_t floor(idf(t) · tfnorm(t,d) · 1e6)  -- exact BIGINT sum
  topk      = row_number over (query_id / score desc, doc_id) ≤ k

Scoring uses the Lucene/Robertson BM25 form
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
with one deliberate engine-parity twist: each per-term contribution is
quantized to integer micro-units (floor(x·1e6) AS BIGINT) BEFORE the
per-document sum. Double sums depend on accumulation order, and ln()
differs between the JVM and DuckDB libm in the last ULP for some inputs
(see verify notes); summing BIGINT micro-units is order-independent and
the only residual divergence risk is a floor-boundary crossing at ~1e-9
probability per (term, doc) pair. Ranking ties at micro-unit granularity
break by doc_id — deterministic on both engines.

100 TB: the posting/doclen shuffles are the classic inverted-index build —
partial aggregation halves them map-side; df is computed AFTER the
broadcast semi-prune to query terms, so the full vocabulary is never
aggregated for a lookup workload; per-query top-k is window-partitioned by
query_id (thousands of concurrent queries scale across executors). For a
standing index, persist `postings`/`doclen` once (bucketed by term) and
amortize across query batches.

Reference: the reference engine has no text retrieval operator (its
surface is windows/aggs — reference src/runtime/operators/, .rs); this
module belongs to the training-data tier the north star adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volga_spark.functions.tokenize import explode_terms


def tokenize(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term) rows: non-empty whitespace tokens — the SHARED token
    definition (`functions/tokenize`, also used by the packing tier),
    mirrored by string_split_regex in the DuckDB oracle."""
    return docs.select(
        F.col(id_col), explode_terms(text_col).alias("term")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs per query by BM25. `queries` is a small (query_id, qtext)
    frame — broadcast. Returns (query_id, rank, doc_id, score_micro) with
    score_micro = Σ_t floor(idf·tfnorm·1e6) (exact BIGINT, see module doc).
    """
    # one-shot path (r14 optimization round): the document length IS the
    # row's token count — dl = n_tokens(text) = Σ_t tf by the shared token
    # definition (`functions/tokenize`) — so it is computed MAP-SIDE on the
    # scan and carried through the postings groupBy as max(dl) (constant
    # per doc, partial-aggregable). Zero extra exchanges: the r12 shape
    # derived dl with a second aggregation + a doclen join per lookup
    # (broadcast locally, SMJ at corpus scale), the r13 shape with a
    # window sum (a second full exchange + sort of the postings). The
    # scorer needs NO doclen join, and the build pins ONE frame. stats
    # reduces off the same pinned frame. A standing index still uses the
    # 3-frame additive contract (`bm25_index`).
    from volga_spark.functions.tokenize import split_terms

    arr = docs.select(
        F.col(id_col), split_terms(text_col).alias("__terms")
    )
    toks = arr.select(
        id_col,
        F.size("__terms").cast("bigint").alias("dl"),
        F.explode("__terms").alias("term"),
    )
    postings = (
        toks.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
        .localCheckpoint(eager=False)
    )
    stats = postings.agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.sum("tf").alias("sum_dl"),
    )
    return bm25_topk_from_index(
        (postings, None, stats), queries, k=k, k1=k1, b=b, id_col=id_col
    )


def bm25_topk_oracle_sql(
    queries_values_sql: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` over the pre-registered `documents`
    view. `queries_values_sql` is a VALUES list `(query_id, qtext)`."""
    return f"""
        WITH toks AS (
            SELECT doc_id, t.term
            FROM documents,
                 unnest(string_split_regex(trim(text), '\\s+')) AS t(term)
            WHERE t.term <> ''
        ),
        postings AS (
            SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        ),
        doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM doclen),
        q(query_id, qtext) AS (VALUES {queries_values_sql}),
        qterms AS (
            SELECT DISTINCT query_id, t.term
            FROM q, unnest(string_split_regex(trim(qtext), '\\s+')) AS t(term)
            WHERE t.term <> ''
        ),
        matched AS (
            SELECT p.doc_id, p.term, p.tf FROM postings p
            WHERE p.term IN (SELECT term FROM qterms)
        ),
        df_t AS (SELECT term, count(*) AS df FROM matched GROUP BY term),
        contribs AS (
            SELECT qt.query_id, m.doc_id,
                   CAST(FLOOR(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                        * (m.tf * ({k1} + 1))
                        / (m.tf + {k1} * (1 - {b} + {b} * d.dl
                             / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
                        * 1000000) AS BIGINT) AS c
            FROM matched m
            JOIN df_t f USING (term)
            JOIN doclen d USING (doc_id)
            JOIN qterms qt USING (term)
            CROSS JOIN stats s
        ),
        scores AS (
            SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
            FROM contribs GROUP BY query_id, doc_id
        ),
        ranked AS (
            SELECT query_id, doc_id, score_micro,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score_micro DESC, doc_id ASC) AS rank
            FROM scores
        )
        SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_micro
        FROM ranked WHERE rank <= {k}
    """


# --- standing index + incremental maintenance --------------------------------


def bm25_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pin=None,
):
    """Build the standing index as three frames: postings (id, term, tf),
    doclen (id, dl), stats (n_docs, sum_dl). All three are ADDITIVE —
    :func:`merge_index` folds a new batch in with groupBy-sum, no rebuild.
    Persist postings bucketed by term to amortize across query batches.

    `pin` (optional, DataFrame → DataFrame) is applied to postings BEFORE
    doclen/stats derive from it — postings fans out to all three frames
    plus the caller's probe join, so without a pin the corpus
    explode+shuffle re-runs per consumer. Standing indexes pass persist;
    one-shot paths pass a lazy localCheckpoint."""
    toks = tokenize(docs, id_col, text_col)
    postings = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    if pin is not None:
        postings = pin(postings)
    # doclen/stats derive FROM postings (dl = Σ tf), not from a second
    # aggregation of the raw token stream — one explode+shuffle of the
    # corpus feeds all three frames.
    doclen = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = doclen.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    return postings, doclen, stats


def merge_index(old, delta):
    """Fold a new document batch's index into a standing index. Documents
    must be NEW ids (append-only corpus — the dedup tier upstream owns
    identity); tf/dl/stats are sums, so the merge is a union + re-agg that
    Spark executes as one map-side-combinable shuffle per frame."""
    po, do_, so = old
    pd_, dd, sd = delta
    id_col = [c for c in do_.columns if c != "dl"][0]
    postings = (
        po.unionByName(pd_).groupBy(id_col, "term").agg(F.sum("tf").alias("tf"))
    )
    doclen = do_.unionByName(dd).groupBy(id_col).agg(F.sum("dl").alias("dl"))
    stats = so.unionByName(sd).agg(
        F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl")
    )
    return postings, doclen, stats


def remove_from_index(index, doc_ids: DataFrame):
    """Scrub documents out of a standing index — the retrieval half of the
    `operators/forget` delete-propagation tier (takedowns must cascade to
    DERIVED artifacts, and an inverted index is one).

    `doc_ids` is the small tombstone frame (one id column, matching the
    index's id column). The three frames are all additive, so removal is
    exact without a rebuild: postings/doclen drop the rows with a
    BROADCAST left-anti join (the big frames never shuffle — each task
    drops its rows map-side, the `forget.scrub_corpus` discipline), and
    stats subtract the removed docs' (count, Σdl), which one tiny
    aggregation of the removed doclen rows supplies. df/idf need no
    stored correction: they are derived per query AFTER the prune, so
    the next lookup's scores are exactly those of an index rebuilt from
    the surviving corpus (asserted in tests/test_retrieval.py)."""
    postings, doclen, stats = index
    id_col = [c for c in doclen.columns if c != "dl"][0]
    ids = doc_ids.selectExpr(f"{doc_ids.columns[0]} AS {id_col}").distinct()
    removed = doclen.join(F.broadcast(ids), id_col, "leftsemi").agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    new_postings = postings.join(F.broadcast(ids), id_col, "left_anti")
    new_doclen = doclen.join(F.broadcast(ids), id_col, "left_anti")
    new_stats = stats.crossJoin(
        F.broadcast(
            removed.select(
                F.col("n_docs").alias("__rn"),
                F.coalesce(F.col("sum_dl"), F.lit(0)).alias("__rdl"),
            )
        )
    ).select(
        (F.col("n_docs") - F.col("__rn")).alias("n_docs"),
        (F.col("sum_dl") - F.col("__rdl")).alias("sum_dl"),
    )
    return new_postings, new_doclen, new_stats


def bm25_topk_from_index(
    index,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k from a prebuilt (postings, doclen, stats) index — the repeated-
    lookup path. Identical scoring to :func:`bm25_topk` (which is
    equivalent to bm25_topk_from_index(bm25_index(docs), ...)). When the
    postings frame already carries a ``dl`` column (the one-shot
    :func:`bm25_topk` build), pass ``doclen=None`` — the doclen join is
    skipped entirely."""
    postings, doclen, stats = index
    qterms = (
        queries.select(
            "query_id",
            explode_terms("qtext").alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    matched = postings.join(F.broadcast(qterms.select("term").distinct()), "term")
    df_t = matched.groupBy("term").agg(F.count("*").alias("df"))
    scored = matched.join(F.broadcast(df_t), "term")
    if "dl" not in postings.columns:
        scored = scored.join(doclen, id_col)
    scored = scored.crossJoin(F.broadcast(stats)).join(
        F.broadcast(qterms), "term"
    )
    contrib = F.expr(
        f"CAST(FLOOR(ln(1 + (n_docs - df + 0.5) / (df + 0.5))"
        f" * (tf * ({k1} + 1)) "
        f" / (tf + {k1} * (1 - {b} + {b} * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
        f" * 1000000) AS BIGINT)"
    )
    scores = (
        scored.select("query_id", id_col, contrib.alias("c"))
        .groupBy("query_id", id_col)
        .agg(F.sum("c").alias("score_micro"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "score_micro")
    )


# --- hybrid fusion -----------------------------------------------------------

RRF_SCALE = 1_000_000_000


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N per-query rankings
    — the standard way to combine BM25 with embedding-ANN results (hybrid
    retrieval). Each input frame needs (query_id, rank, `id_col`).

    Scoring is EXACT integer arithmetic: contribution = RRF_SCALE
    div (k_rrf + rank) summed as BIGINT — no floats anywhere, so the
    result is bit-identical across engines, partitionings, and input
    order (ties broken by id). Scale: inputs are top-k frames (rows ≈
    queries × k × n_rankings — tiny next to the corpora that produced
    them); the union + groupBy is one small shuffle on (query_id, id).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            "query_id",
            F.col(id_col),
            F.expr(f"CAST({RRF_SCALE} div ({k_rrf} + rank) AS BIGINT)").alias("c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scores = u.groupBy("query_id", id_col).agg(
        F.sum("c").alias("rrf_nano"), F.count("*").alias("n_lists")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_nano").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "rrf_nano", "n_lists")
    )


def rrf_fuse_oracle_sql(
    ranking_sqls: list[str],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`rrf_fuse`; each ranking_sql yields
    (query_id, rank, `id_col`)."""
    union = " UNION ALL ".join(
        f"SELECT query_id, {id_col}, "
        f"CAST({RRF_SCALE} // ({k_rrf} + rank) AS BIGINT) AS c FROM ({r})"
        for r in ranking_sqls
    )
    return f"""
        WITH u AS ({union}),
        scores AS (
            SELECT query_id, {id_col},
                   CAST(sum(c) AS BIGINT) AS rrf_nano,
                   count(*) AS n_lists
            FROM u GROUP BY query_id, {id_col}
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY rrf_nano DESC, {id_col} ASC) AS rank
            FROM scores
        )
        SELECT query_id, CAST(rank AS INT) AS rank, {id_col}, rrf_nano, n_lists
        FROM ranked WHERE rank <= {k}
    """
