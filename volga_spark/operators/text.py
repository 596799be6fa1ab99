"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd — zero Python in the hot
path): token counting, quality scoring, n-gram language-ID heuristic,
document fingerprinting. Designed for 100 TB corpora: every function is a
narrow projection over the `text` column, so scans stay pruned and the ops
pipeline inside one stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language → stopword list for the n-gram/stopword language-ID heuristic.
# Deterministic and tiny by design — swap for fastText/CLD3 offline models in
# production (not available in this image; the *plumbing* is identical).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est"),
    "zh": ("de", "shi", "bu", "le", "wo", "ni", "ta", "men"),
}


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization (the corpus is single-space separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def avg_token_len(text: str | Column) -> Column:
    """(chars - separators) / tokens — exact for single-space text."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c)
    return (F.length(c) - (n - F.lit(1))) / n


def stopword_hits(text: str | Column, words: tuple[str, ...]) -> Column:
    lst = ", ".join(f"'{w}'" for w in words)
    col = text if isinstance(text, str) else None
    expr = col if col else "text"
    return F.expr(f"size(filter(split({expr}, ' '), t -> t IN ({lst})))")


def stopword_ratio(text: str, words: tuple[str, ...] | None = None) -> Column:
    words = words or LANG_STOPWORDS["en"]
    return stopword_hits(text, words) / token_count(text)


def digit_ratio(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))) / F.length(c)


def quality_score(text: str) -> Column:
    """Composite heuristic quality in [0,1]: length band + stopword presence
    - digit pollution. Fixed arithmetic → identical across engines."""
    n = token_count(text)
    len_ok = F.when((n >= 20) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    return len_ok * (F.lit(0.5) + F.lit(0.5) * stopword_ratio(text)) - digit_ratio(text)


def lang_scores(text: str) -> dict[str, Column]:
    return {lang: stopword_hits(text, words) for lang, words in LANG_STOPWORDS.items()}


def predicted_lang(text: str) -> Column:
    """argmax over language stopword hits; ties resolved by the fixed chain
    order en→de→es→fr→zh (mirrored exactly in the DuckDB oracle)."""
    scores = lang_scores(text)
    order = list(LANG_STOPWORDS)
    expr = None
    for lang in order:
        cond = None
        for other in order:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(order[0]))


def fingerprint(text: str | Column) -> Column:
    """Exact-content fingerprint."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def normalized_fingerprint(text: str | Column) -> Column:
    """Fingerprint after lowercase + whitespace collapse — catches trivial
    reformatting duplicates."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(c), "\\s+", " "))


# the Gopher rule set's required "stop words" (Rae et al. 2021, A1.1:
# a document must contain at least two of these)
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(text: str | Column) -> dict[str, Column]:
    """The Gopher quality-filter rule set (Rae et al. 2021, Appendix A1.1 —
    the de-facto standard heuristic filter for LLM training corpora), each
    rule as a named boolean column plus the combined ``gopher_pass``:

    - word count in [50, 100 000]
    - mean word length in [3, 10]
    - symbol-to-word ratio (``#`` or ``...``) ≤ 0.1
    - < 90% of lines starting with a bullet, < 30% ending with ``...``
    - ≥ 80% of words contain at least one alphabetic character
    - ≥ 2 of the required stop words present

    All native expressions over one scan — at 100 TB this is a pure
    map-side pass fused into whatever scan precedes it.
    """
    c = F.col(text) if isinstance(text, str) else text
    col_sql = text if isinstance(text, str) else None
    toks = tokens(c)
    n = F.size(toks).cast("double")
    mean_len = avg_token_len(c)
    hash_count = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    ellipsis_count = (
        F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", ""))
    ) / F.lit(3)
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("double")
    if col_sql is None:
        raise ValueError("gopher_quality_flags needs a column NAME for the "
                         "higher-order-function rules")
    bullet_lines = F.expr(
        f"size(filter(split({col_sql}, '\\n'), "
        f"l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%'))"
    ).cast("double")
    ellipsis_lines = F.expr(
        f"size(filter(split({col_sql}, '\\n'), l -> l LIKE '%...'))"
    ).cast("double")
    alpha_words = F.expr(
        f"size(filter(split({col_sql}, ' '), t -> t rlike '[A-Za-z]'))"
    ).cast("double")
    req = ", ".join(f"'{w}'" for w in GOPHER_REQUIRED_WORDS)
    required_present = F.expr(
        f"size(filter(array({req}), w -> array_contains(split({col_sql}, ' '), w)))"
    )
    flags = {
        "g_word_count_ok": (n >= 50) & (n <= 100_000),
        "g_mean_word_len_ok": (mean_len >= 3) & (mean_len <= 10),
        "g_symbol_ratio_ok": ((hash_count + ellipsis_count) / n) <= 0.1,
        "g_bullet_lines_ok": (bullet_lines / n_lines) <= 0.9,
        "g_ellipsis_lines_ok": (ellipsis_lines / n_lines) <= 0.3,
        "g_alpha_word_ratio_ok": (alpha_words / n) >= 0.8,
        "g_required_words_ok": required_present >= 2,
    }
    combined = None
    for f in flags.values():
        combined = f if combined is None else (combined & f)
    flags["gopher_pass"] = combined
    return flags


# ---------------------------------------------------------------------------
# Gopher repetition rules (Rae et al. 2021, Table A1 — "repetition removal").
# Two tiers: line/paragraph duplication is pure native HOF expressions (one
# map-side pass); n-gram character coverage is one Arrow batch pass (a
# per-document hash-map count is O(tokens) — the native-HOF alternative is
# O(tokens²) per doc, which dies on 100k-token web documents).

# rule → max allowed fraction (Table A1 thresholds)
GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _dup_fracs(col_sql: str, sep: str) -> tuple[Column, Column]:
    """(duplicate-unit fraction, duplicate-unit CHAR fraction) for non-empty
    units produced by splitting on ``sep`` — duplicates = occurrences beyond
    the first of each distinct unit, char-weighted for the second metric."""
    units = f"filter(split({col_sql}, '{sep}'), x -> length(x) > 0)"
    n = f"size({units})"
    nd = f"size(array_distinct({units}))"
    chars = f"aggregate({units}, 0L, (a, x) -> a + length(x))"
    chars_d = f"aggregate(array_distinct({units}), 0L, (a, x) -> a + length(x))"
    frac = F.expr(
        f"IF({n} = 0, 0.0D, CAST({n} - {nd} AS DOUBLE) / {n})"
    )
    char_frac = F.expr(
        f"IF({chars} = 0, 0.0D, CAST({chars} - {chars_d} AS DOUBLE) / {chars})"
    )
    return frac, char_frac


def line_repetition_flags(text: str) -> dict[str, Column]:
    """The line/paragraph half of Gopher Table A1 as native expressions:
    ``dup_line_frac``, ``dup_line_char_frac`` (lines = '\\n' units),
    ``dup_para_frac``, ``dup_para_char_frac`` (paragraphs = '\\n\\n' units),
    plus per-rule ``*_ok`` booleans at the Table A1 thresholds. Empty units
    are excluded (a run of blank lines is formatting, not repetition)."""
    line_frac, line_char = _dup_fracs(text, "\\n")
    para_frac, para_char = _dup_fracs(text, "\\n\\n")
    metrics = {
        "dup_line_frac": line_frac,
        "dup_line_char_frac": line_char,
        "dup_para_frac": para_frac,
        "dup_para_char_frac": para_char,
    }
    out = dict(metrics)
    for k, col in metrics.items():
        out[f"{k}_ok"] = col <= GOPHER_REPETITION_THRESHOLDS[k]
    return out


def repetition_ngram_metrics(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
):
    """The n-gram half of Gopher Table A1, one Arrow pass per partition:

    - ``top_{n}gram_char_frac``: characters covered by the single most
      character-covering n-gram value (count × rendered length — under
      frequency ties Gopher's "most frequent" is ambiguous, so we take the
      max of count×length, which is deterministic on both engines and is
      the quantity the threshold actually bounds) / total characters.
    - ``dup_{n}gram_char_frac``: characters inside ANY occurrence of an
      n-gram that appears more than once (span-coverage union, the
      datatrove/Gopher semantics — overlapping duplicate spans are not
      double-counted) / total characters.

    Tokenization is single-space split, matching ``tokens()`` and the SQL
    oracles; documents are independent, so the pass is map-side only
    (``widen_for_python`` guards under-split local inputs). Per doc cost is
    O(tokens × |ns|) time and one Counter per (doc, n) — no shuffle, no
    driver collect; at 100 TB this scales with input splits alone.
    """
    import numpy as np
    import pandas as pd

    from volga_spark.partitioning import widen_for_python

    top_cols = [f"top_{n}gram_char_frac" for n in top_ns]
    dup_cols = [f"dup_{n}gram_char_frac" for n in dup_ns]
    id_type = dict(df.dtypes)[id_col]
    schema = ", ".join(
        [f"{id_col} {id_type}"] + [f"{c} double" for c in top_cols + dup_cols]
    )

    def gen(batches):
        from collections import Counter

        for pdf in batches:
            out = {id_col: pdf[id_col].to_numpy()}
            cols = {c: np.zeros(len(pdf)) for c in top_cols + dup_cols}
            for row_i, text in enumerate(pdf[text_col].astype(str)):
                toks = [t for t in text.split(" ") if t]
                if not toks:
                    continue
                total = len(" ".join(toks))
                # char offset of token i in the single-space rendering
                offs = np.empty(len(toks) + 1, dtype=np.int64)
                offs[0] = 0
                for i, t in enumerate(toks):
                    offs[i + 1] = offs[i] + len(t) + 1
                for n, col in zip(top_ns, top_cols):
                    if len(toks) < n:
                        continue
                    grams = Counter(
                        tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
                    )
                    best = max(
                        c * (sum(len(w) for w in g) + n - 1)
                        for g, c in grams.items()
                    )
                    cols[col][row_i] = best / total
                for n, col in zip(dup_ns, dup_cols):
                    if len(toks) < n:
                        continue
                    gram_list = [
                        tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
                    ]
                    counts = Counter(gram_list)
                    mask = np.zeros(total, dtype=bool)
                    for i, g in enumerate(gram_list):
                        if counts[g] > 1:
                            mask[offs[i] : offs[i + n] - 1] = True
                    cols[col][row_i] = mask.sum() / total
            out.update(cols)
            yield pd.DataFrame(out)

    return widen_for_python(df.select(id_col, text_col)).mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# C4 rule set (Raffel et al. 2020, §2.2 — the other canonical web-corpus
# cleaning recipe next to Gopher). Two tiers, both fully native:
# page-level drop flags and a LINE-level cleaner that rewrites the text.

C4_POLICY_PHRASES = ("terms of use", "privacy policy", "cookie policy",
                     "uses cookies")
C4_PLACEHOLDER_PHRASES = ("lorem ipsum",)


def c4_quality_flags(text: str) -> dict[str, Column]:
    """Page-level C4 drop rules as named boolean columns (True = keep):

    - no curly brace (code, not prose)
    - no "lorem ipsum" placeholder
    - no policy boilerplate phrase (terms of use / privacy policy / …)
    - at least 3 sentences (terminal-punctuation count ≥ 3)

    The paper's bad-words list is site-policy-specific; plug a real list
    into the same `any-phrase-present` shape. One scan, map-side.
    """
    c = F.col(text)
    lower = F.lower(c)

    def _any_phrase(phrases: tuple[str, ...]) -> Column:
        cond = None
        for p in phrases:
            hit = lower.contains(p)
            cond = hit if cond is None else (cond | hit)
        return cond

    sentences = F.size(F.expr(f"regexp_extract_all({text}, '[.!?]', 0)"))
    flags = {
        "c4_no_braces_ok": ~c.contains("{"),
        "c4_no_placeholder_ok": ~_any_phrase(C4_PLACEHOLDER_PHRASES),
        "c4_no_policy_ok": ~_any_phrase(C4_POLICY_PHRASES),
        "c4_min_sentences_ok": sentences >= 3,
    }
    combined = None
    for f in flags.values():
        combined = f if combined is None else (combined & f)
    flags["c4_pass"] = combined
    return flags


def c4_clean_lines(text: str) -> Column:
    """C4's line-level cleaner, as one native expression: keep only lines
    that end in terminal punctuation, have ≥ 5 words, and do not mention
    javascript; re-join with newlines. Empty result → empty string (pair
    with `c4_quality_flags`/length gates downstream)."""
    kept = (
        f"filter(split({text}, '\\n'), l -> "
        f"l rlike '[.!?\"]\\\\s*$' "
        f"AND size(split(trim(l), ' +')) >= 5 "
        f"AND NOT lower(l) rlike 'javascript')"
    )
    return F.expr(f"array_join({kept}, '\\n')")


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Train a token vocabulary: (token, token_id, count), ids dense from 0.

    The tokenizer-training step of a data pipeline, distributed: one
    exploded groupBy for counts (map-side partials — shuffle volume is
    |vocab|, not |tokens|), then ids assigned by (count DESC, token ASC) —
    a TOTAL order, so ids are deterministic for a given corpus regardless
    of partitioning (frequency-only ordering would tie-break by shuffle
    luck). The ranking window is a single-partition sort over |vocab| rows
    — fine for real vocab sizes (10^5-10^6), which min_count/vocab_size
    exist to enforce; it is NOT a corpus-sized sort.
    """
    from pyspark.sql import Window as W

    counts = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    w = W.orderBy(F.col("count").desc(), F.col("token").asc())
    ranked = counts.withColumn(
        "token_id", F.row_number().over(w) - F.lit(1)
    ).select("token", "token_id", "count")
    if vocab_size is not None:
        ranked = ranked.filter(F.col("token_id") < vocab_size)
    return ranked


def encode_tokens(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    out_col: str = "token_ids",
    unk_id: int = -1,
) -> DataFrame:
    """Append `out_col`: array<int> of per-token vocabulary ids, document
    order preserved, out-of-vocab → ``unk_id``.

    Plan shape: posexplode → ONE broadcast join against the vocab (bounded
    by construction) → collect back per (doc, pos). The per-doc
    reassembly sorts by position inside `array_sort` on (pos, id) structs,
    not a window — one exchange on the document id total.
    """
    id_cols = [c for c in docs.columns]
    pos = docs.select(
        *id_cols, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token")
    )
    joined = pos.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    packed = joined.groupBy(*id_cols).agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "token_id"))
        ).alias("__pairs")
    )
    ids = F.transform(
        F.col("__pairs"),
        lambda s: F.coalesce(s["token_id"], F.lit(unk_id)),
    )
    return packed.withColumn(out_col, ids).drop("__pairs")


def html_to_text(html: str | Column) -> Column:
    """Crawl-payload HTML → visible text, as one chain of native regexps —
    the WET-extraction step between raw crawl bytes and every quality
    gate above (full boilerplate removal à la trafilatura needs a DOM;
    this is the regex tier that handles the bulk of WET-style extraction,
    and it is deliberately DuckDB-mirrorable for oracle checks).

    Order matters and is load-bearing:
    1. drop <script>/<style>/<!-- --> SUBTREES (tag-stripping alone would
       leak javascript/css text into the document);
    2. block-level closers → newline (layout preserved for the line-based
       Gopher/C4 rules);
    3. strip remaining tags;
    4. decode the five XML entities + &nbsp;
    5. collapse runs of spaces/tabs per line, trim, drop empty lines.

    Case-insensitive via (?i); (?s) makes . span newlines inside subtrees.
    """
    c = F.col(html) if isinstance(html, str) else html
    t = F.regexp_replace(c, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)</(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)>", "\n"
    )
    t = F.regexp_replace(t, r"(?i)<br\s*/?>", "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&nbsp;", " "),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    # per-line: collapse whitespace runs, trim; then drop empty lines
    t = F.regexp_replace(t, r"[ \t]+", " ")
    lines = F.split(t, "\n")
    kept = F.filter(F.transform(lines, lambda l: F.trim(l)), lambda l: l != "")
    return F.array_join(kept, "\n")


# --- Pre-tokenization text normalization ------------------------------------
#
# The standard cleanup pass before hashing/tokenizing (CCNet normalizes
# before paragraph hashing; tokenizer training wants one canonical quote/
# dash/space alphabet). Everything is native translate/regexp_replace in
# the RE2∩Java subset, and the SAME tables drive the DuckDB twin, so the
# normalization is engine-exact by construction. NOT full Unicode NFC —
# that needs ICU; this is the curated common-case table (latin-1/latin-ext
# accent folding + typographic punctuation), which covers the punctuation
# and accent noise web text actually carries.

_ACCENT_SRC = (
    "àáâãäåāăąçćčèéêëēĕėęěìíîïĩīĭįñńňòóôõöøōŏőśšùúûüũūŭůýÿžźż"
    "ÀÁÂÃÄÅĀĂĄÇĆČÈÉÊËĒĔĖĘĚÌÍÎÏĨĪĬĮÑŃŇÒÓÔÕÖØŌŎŐŚŠÙÚÛÜŨŪŬŮÝŸŽŹŻ"
)
# per-letter group sizes mirror _ACCENT_SRC exactly (asserted by test)
_ACCENT_DST = (
    "a" * 9 + "c" * 3 + "e" * 9 + "i" * 8 + "n" * 3 + "o" * 9
    + "s" * 2 + "u" * 8 + "y" * 2 + "z" * 3
    + "A" * 9 + "C" * 3 + "E" * 9 + "I" * 8 + "N" * 3 + "O" * 9
    + "S" * 2 + "U" * 8 + "Y" * 2 + "Z" * 3
)
# typographic -> ASCII, 1:1 (the 1->3 ellipsis expansion runs as a regexp
# first). Groups: 4 single-quote forms, 3 double-quote forms, prime,
# double-prime, 4 dash forms, 4 space forms (nbsp/figure/narrow/ideographic)
_PUNCT_SRC = "‘’‚‛“”„′″–—―−   　"
_PUNCT_DST = "''''" + '"""' + "'" + '"' + "----" + "    "
_CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def normalize_text(
    text: str | Column,
    accents: bool = True,
    punctuation: bool = True,
    controls: bool = True,
    whitespace: bool = True,
) -> Column:
    """Canonicalize text: fold common accents to ASCII, unify typographic
    quotes/dashes/spaces, strip control characters, collapse runs of
    spaces/tabs (newlines preserved — line-based gates depend on them),
    trim. Each step is optional; all native."""
    c = F.col(text) if isinstance(text, str) else text
    if punctuation:
        c = F.regexp_replace(c, "…", "...")
        c = F.translate(c, _PUNCT_SRC, _PUNCT_DST)
    if accents:
        c = F.translate(c, _ACCENT_SRC, _ACCENT_DST)
    if controls:
        c = F.regexp_replace(c, _CONTROL_RE, "")
    if whitespace:
        c = F.regexp_replace(c, "[ \\t]+", " ")
        c = F.regexp_replace(c, " ?\\n ?", "\n")
        c = F.trim(c)
    return c


def normalize_text_oracle_sql(
    text_sql: str,
    accents: bool = True,
    punctuation: bool = True,
    controls: bool = True,
    whitespace: bool = True,
) -> str:
    """DuckDB expression applying the identical normalization (same tables,
    same order)."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    e = text_sql
    if punctuation:
        e = f"replace({e}, '…', '...')"
        e = f"translate({e}, '{q(_PUNCT_SRC)}', '{q(_PUNCT_DST)}')"
    if accents:
        e = f"translate({e}, '{_ACCENT_SRC}', '{_ACCENT_DST}')"
    if controls:
        e = f"regexp_replace({e}, '{_CONTROL_RE}', '', 'g')"
    if whitespace:
        e = f"regexp_replace({e}, '[ \\t]+', ' ', 'g')"
        e = f"regexp_replace({e}, ' ?\\n ?', chr(10), 'g')"
        e = f"trim({e})"
    return e
