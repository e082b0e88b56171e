"""Text-analysis operators for the training-data pipeline (BASELINE north
star; SURVEY.md §7.1 step 8): token counting, quality scoring, language-ID
heuristic, document fingerprinting.

Everything here is built from JVM-side ``pyspark.sql.functions`` (split /
higher-order array functions / md5) — no Python UDFs, so the whole pipeline
stays inside whole-stage codegen and scales linearly with executors.  Each
operator has a matching DuckDB SQL oracle using identical arithmetic.

Scale notes: all per-document (embarrassingly parallel, no shuffle); the
only scan is `documents` with column pruning down to (doc_id, text[, lang]).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_journal_spark.functions.numeric import round6, round6_sql, round6_sql_spark

# tiny fixed stopword profiles (shared constants for Spark + SQL oracles)
STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")
LANG_PROFILES = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de5", "shi4", "le5", "wo3", "ni3"),  # pinyin-ish placeholder profile
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_journal_spark.sources.tables import read_parquet_cached_schema

    return read_parquet_cached_schema(spark, os.path.join(sf_dir, "documents.parquet"))


def tokens_col(text: Column = None) -> Column:
    """Whitespace tokenization with empty-token filtering (BPE-ish regex
    splitting is a drop-in replacement for the pattern argument)."""
    c = F.col("text") if text is None else text
    return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))


TOKS_SQL = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"


def tokens_spark_sql(text_expr: str = "text") -> str:
    """Spark-SQL twin of :func:`tokens_col` (same expression tree through
    the parser, a handful of py4j calls instead of dozens — the r11
    SQL-string pattern; TOKS_SQL above is the DuckDB spelling).  The
    ``'\\\\s+'`` literal unescapes to the same ``\\s+`` Java regex the
    Column form passes — pinned by the SQL-vs-Column parity tests."""
    return f"filter(split({text_expr}, '\\\\s+'), x -> x != '')"

#: BM25 retrieval constants (shared by the operator and its oracle)
BM25_K1, BM25_B, BM25_TOPK, BM25_QTERMS = 1.2, 0.75, 10, 3

#: shared regexes (RE2-compatible so Java regex and DuckDB agree): email,
#: NANP-ish phone, dotted-quad IP.  No lookarounds, no \b — the two engines'
#: word-boundary semantics differ around punctuation.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+1-555-[0-9]{4}"
PII_IP_RE = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

#: Gopher-rule thresholds (Rae et al. 2021 table A1 spirit): docs whose
#: mass concentrates in one token or whose n-grams repeat heavily are
#: boilerplate/spam candidates.
REP_TOP_TOKEN_MAX = 0.20
REP_DUP_2GRAM_MAX = 0.60


def shingles_col(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; empty when the doc has < n tokens.

    Built from n shifted copies of the token array folded with ``zip_with``
    — each step is one O(len) pass, so the whole expression is O(n*len) per
    document.  (The naive ``transform(sequence, i -> slice(toks, i, n))``
    is O(len^2): ``slice`` copies O(len) per element — 10x+ slower on
    real documents.)
    """
    sh = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        sh = F.zip_with(
            sh,
            shifted,
            lambda a, b: F.when(
                a.isNotNull() & b.isNotNull(), F.concat(a, F.lit(" "), b)
            ),
        )
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.filter(sh, lambda x: x.isNotNull())),
    ).otherwise(F.array().cast("array<string>"))


def _zip_grams_spark_sql(tk: str, n: int) -> str:
    """The shared zip_with n-gram fold of :func:`shingles_col` /
    ``_pos_grams`` as a Spark-SQL string — same tree as the Column loop."""
    sh = tk
    for k in range(1, n):
        shifted = f"slice({tk}, {k + 1}, greatest(size({tk}) - {k}, 0))"
        sh = (
            f"zip_with({sh}, {shifted}, (a, b) -> "
            "CASE WHEN a IS NOT NULL AND b IS NOT NULL "
            "THEN concat(a, ' ', b) END)"
        )
    return sh


def shingles_spark_sql(tk: str, n: int = 3) -> str:
    """Spark-SQL twin of :func:`shingles_col` (``shingles_sql`` below is
    the DuckDB spelling) — parity pinned by the SQL-vs-Column tests."""
    return (
        f"CASE WHEN size({tk}) >= {n} THEN "
        f"array_distinct(filter({_zip_grams_spark_sql(tk, n)}, x -> x IS NOT NULL)) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def shingles_sql(toks_expr: str = "toks", n: int = 3) -> str:
    return (
        f"CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({toks_expr}) - {n - 2}), "
        f"i -> array_to_string({toks_expr}[i:i+{n - 1}], ' '))) "
        f"ELSE [] END"
    )


def d_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token statistics per document."""
    toks = tokens_col()
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(shingles_col(toks)).alias("n_shingles"),
        F.length("text").alias("n_chars_computed"),
    )


def _quality_raw_sql(tk: str = "_tk", text: str = "text") -> dict[str, str]:
    """Spark-SQL twins of :func:`_quality_raw_cols` over a HOISTED token
    column ``tk`` (one tokenize per row instead of ~5 inlined copies) —
    the single definition d_quality and the fused pipeline projection
    build from (r11 §4 SQL-string pattern; parity pinned in
    test_text_ops)."""
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return {
        "n_tokens": f"size({tk})",
        "punct_ratio": (
            f"CAST(length(regexp_replace({text}, '[^.,;:!?]', '')) AS DOUBLE)"
            f" / CAST(greatest(length({text}), 1) AS DOUBLE)"
        ),
        "stopword_ratio": (
            f"CAST(size(filter({tk}, t -> lower(t) IN ({in_list}))) AS DOUBLE)"
            f" / CAST(greatest(size({tk}), 1) AS DOUBLE)"
        ),
        "avg_token_len": (
            f"aggregate({tk}, CAST(0.0 AS DOUBLE), "
            f"(acc, t) -> acc + CAST(length(t) AS DOUBLE))"
            f" / CAST(greatest(size({tk}), 1) AS DOUBLE)"
        ),
    }


def _quality_score_sql(raw: dict[str, str]) -> str:
    """SQL twin of :func:`_quality_score_col` — same literals, same
    association order, so the double arithmetic is bit-identical."""
    return (
        f"least(CAST({raw['n_tokens']} AS DOUBLE) / 100.0D, 1.0D) * 0.4D"
        f" + (1.0D - least({raw['stopword_ratio']} * 2.0D, 1.0D)) * 0.3D"
        f" + least({raw['avg_token_len']} / 8.0D, 1.0D) * 0.3D"
    )


def _quality_raw_cols() -> dict[str, Column]:
    """The raw (pre-round) quality metric expressions over a ``text``
    column — the single definition both :func:`d_quality` and the fused
    pipeline projection (``pipeline_e2e``) build from, so the double
    arithmetic is term-for-term identical in every consumer."""
    toks = tokens_col()
    return {
        "n_tokens": F.size(toks),
        "punct_ratio": (
            F.length(F.regexp_replace("text", r"[^.,;:!?]", "")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ),
        "stopword_ratio": (
            F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS_EN))).cast(
                "double"
            )
            / F.greatest(F.size(toks), F.lit(1)).cast("double")
        ),
        "avg_token_len": (
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
            )
            / F.greatest(F.size(toks), F.lit(1)).cast("double")
        ),
    }


def _quality_score_col(raw: dict[str, Column]) -> Column:
    """Composite score over the raw metric expressions (same tree the
    optimizer produces by inlining d_quality's aliased intermediates)."""
    return (
        F.least(raw["n_tokens"].cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(raw["stopword_ratio"] * 2.0, F.lit(1.0))) * 0.3
        + F.least(raw["avg_token_len"] / 8.0, F.lit(1.0)) * 0.3
    )


def d_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, punctuation ratio, stopword ratio, mean token
    length, and a composite score — per-row double arithmetic (identical
    operation order in the oracle), rounded for cross-engine stability."""
    # SQL-string build over a hoisted token column (r11 §4): one tokenize
    # per row (the Column form inlined it ~5x) and a handful of py4j calls;
    # the arithmetic trees are the _quality_raw_sql/_quality_score_sql
    # twins of the Column builders — identical literals and association
    raw = _quality_raw_sql()
    df = _docs(spark, sf_dir).selectExpr(
        "doc_id", "text", tokens_spark_sql() + " AS _tk"
    ).selectExpr(
        "doc_id",
        raw["n_tokens"] + " AS n_tokens",
        raw["punct_ratio"] + " AS punct_ratio",
        raw["stopword_ratio"] + " AS stopword_ratio",
        raw["avg_token_len"] + " AS avg_token_len",
    )
    score = _quality_score_sql(
        {
            "n_tokens": "n_tokens",
            "punct_ratio": "punct_ratio",
            "stopword_ratio": "stopword_ratio",
            "avg_token_len": "avg_token_len",
        }
    )
    return df.selectExpr(
        "doc_id",
        "n_tokens",
        round6_sql_spark("punct_ratio") + " AS punct_ratio",
        round6_sql_spark("stopword_ratio") + " AS stopword_ratio",
        round6_sql_spark("avg_token_len") + " AS avg_token_len",
        round6_sql_spark(score) + " AS quality_score",
    )


def _lang_hit_sql(tk: str) -> dict[str, str]:
    """SQL twins of :func:`_lang_hit_cols` over a token column name."""
    return {
        lang: (
            f"size(filter({tk}, t -> lower(t) IN "
            f"({', '.join(repr(w) for w in words)})))"
        )
        for lang, words in sorted(LANG_PROFILES.items())
    }


def _lang_pred_sql(hits: dict[str, str]) -> str:
    """SQL twin of :func:`_lang_pred_col` — same sorted-langs CASE chain
    with the greatest() inlined per branch exactly like the Column tree."""
    langs = sorted(LANG_PROFILES)
    mx = "greatest(" + ", ".join(hits[lang] for lang in langs) + ")"
    whens = " ".join(f"WHEN {hits[lang]} = {mx} THEN '{lang}'" for lang in langs)
    return f"CASE {whens} END"


def _lang_hit_cols(toks: Column) -> dict[str, Column]:
    """Per-language stopword-profile hit counts over a token array."""

    def _hit_counter(words):
        # closure helper: pyspark counts the lambda's parameters, so the
        # word list must be captured, not passed as a default argument
        return lambda t: F.lower(t).isin(*words)

    return {
        lang: F.size(F.filter(toks, _hit_counter(words)))
        for lang, words in sorted(LANG_PROFILES.items())
    }


def _lang_pred_col(hits: dict[str, Column]) -> Column:
    """argmax with deterministic ties: highest count, then lang code asc —
    a chained CASE over the sorted codes picks the first one at the max."""
    langs = sorted(LANG_PROFILES)
    max_hits = F.greatest(*[hits[lang] for lang in langs])
    expr = None
    for lang in langs:
        cond = hits[lang] == max_hits
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr


def d_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-profile hit counts, argmax by count
    then lexicographic language code; compared against the labeled lang."""
    # SQL-string build (r11 §4): same hoisted-hit-counts plan, same trees
    df = _docs(spark, sf_dir).selectExpr(
        "doc_id", "lang", tokens_spark_sql() + " AS _toks"
    )
    hits = _lang_hit_sql("_toks")
    df = df.selectExpr(
        "doc_id", "lang", *[f"{hits[lang]} AS _h_{lang}" for lang in sorted(hits)]
    )
    expr = _lang_pred_sql({lang: f"_h_{lang}" for lang in LANG_PROFILES})
    return df.selectExpr(
        "doc_id",
        "lang",
        expr + " AS lang_pred",
        f"(({expr}) = lang) AS is_match",
    )


#: GPT-2-ish pre-tokenizer, lookahead-free so both Java regex (Spark) and
#: RE2 (DuckDB) accept it: a token is an optionally-space-prefixed run of
#: letters, digits, or other non-space symbols
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def d_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style token counting: pre-tokenizer segments per document (the
    count a byte-pair encoder's input stage would see), alongside the
    whitespace count for comparison.

    The pattern goes through the Python API with a lit() — embedding it in
    an F.expr SQL string would escape-process the backslash classes
    (Spark's SQL parser turns '\\s' into 's'; DuckDB's does not), silently
    diverging the two engines.
    """
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(tokens_col()).alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).alias("n_bpe_distinct"),
    )


def d_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint: md5 over the normalized text
    (lowercased, whitespace collapsed, trimmed)."""
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return _docs(spark, sf_dir).select(
        "doc_id", F.md5(norm).alias("fingerprint")
    )


def _profile_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return f"len(list_filter(toks, t -> list_contains([{words}], lower(t))))"


#: PII oracle building blocks (kept as module constants so the injected
#: suffix is one definition shared by the Spark plan and the SQL below)
_PII_SQL_TEXT = (
    "text || ' contact doc' || CAST(doc_id AS VARCHAR) || '@example.com or "
    "+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
    "' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'"
)

TEXT_ORACLES: dict[str, str] = {
    "d_token_rarity": f"""
        WITH tok AS (
          SELECT doc_id, unnest({TOKS_SQL}) AS token FROM documents
        ),
        freq AS (SELECT token, COUNT(*) AS _cf FROM tok GROUP BY token)
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               {round6_sql("quantile_cont(_cf, 0.5)")} AS median_corpus_freq,
               MIN(_cf) AS min_corpus_freq,
               SUM(CASE WHEN _cf = 1 THEN 1 ELSE 0 END) AS n_hapax,
               (SUM(CASE WHEN _cf = 1 THEN 1 ELSE 0 END) * 5 > COUNT(*)
                OR quantile_cont(_cf, 0.5) < 3) AS noisy
        FROM tok JOIN freq USING (token)
        GROUP BY doc_id
    """,
    "x_udtf_windows": f"""
        WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        w AS (
          SELECT doc_id, len(toks) AS n,
                 CAST(unnest(range(CAST(ceil(len(toks) / 16.0) AS BIGINT))) AS INTEGER) AS chunk_idx,
                 toks
          FROM t WHERE len(toks) > 0
        )
        SELECT doc_id, chunk_idx,
               CAST(LEAST(16, n - chunk_idx * 16) AS INTEGER) AS n_tokens,
               toks[chunk_idx * 16 + 1] AS first_token
        FROM w
    """,
    "x_udaf_median": f"""
        SELECT o_orderstatus,
               {round6_sql("quantile_cont(o_totalprice, 0.5)")} AS median_price,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus
    """,
    "d_sample_sources": """
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 1000 AS INTEGER) AS bucket,
               -- TRY_CAST, not CAST: a source with no trailing digits makes
               -- regexp_extract return '' and a hard CAST would abort the
               -- whole query, where the engine's .cast('int') yields NULL
               -- and falls through to the odd rate — mirror that
               CAST(CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER) % 2 = 0
                         THEN 1000 ELSE 300 END AS INTEGER) AS rate_permille,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
                < CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER) % 2 = 0
                       THEN 1000 ELSE 300 END) AS keep
        FROM documents
    """,
    "d_pii_scrub": f"""
        WITH p AS (SELECT doc_id, {_PII_SQL_TEXT} AS pii FROM documents),
        s AS (
          SELECT doc_id, pii,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(pii, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                     '{PII_PHONE_RE}', '<PHONE>', 'g'),
                   '{PII_IP_RE}', '<IP>', 'g') AS scrubbed
          FROM p
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(pii, '{PII_EMAIL_RE}')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(pii, '{PII_PHONE_RE}')) AS INTEGER) AS n_phones,
               CAST(len(regexp_extract_all(pii, '{PII_IP_RE}')) AS INTEGER) AS n_ips,
               md5(scrubbed) AS scrubbed_fp,
               CAST(length(pii) - length(scrubbed) AS INTEGER) AS chars_removed
        FROM s
    """,
    "d_repetition": f"""
        WITH __toks AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        base AS (
          SELECT doc_id,
                 CAST(len(toks) AS INTEGER) AS n_tokens,
                 GREATEST(len(toks) - 1, 0) AS _n2,
                 len({shingles_sql(n=2)}) AS _d2,
                 GREATEST(len(toks) - 2, 0) AS _n3,
                 len({shingles_sql(n=3)}) AS _d3
          FROM __toks
        ),
        tc AS (
          SELECT doc_id, MAX(c) AS _top, SUM(c) AS _tot FROM (
            SELECT doc_id, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS t FROM __toks)
            GROUP BY doc_id, t
          ) GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tokens,
               {round6_sql("CASE WHEN _tot IS NOT NULL AND _tot > 0 "
                           "THEN CAST(_top AS DOUBLE) / CAST(_tot AS DOUBLE) "
                           "ELSE 0.0 END")} AS top_token_frac,
               {round6_sql("CASE WHEN _n2 > 0 "
                           "THEN 1.0 - CAST(_d2 AS DOUBLE) / CAST(_n2 AS DOUBLE) "
                           "ELSE 0.0 END")} AS dup_2gram_frac,
               {round6_sql("CASE WHEN _n3 > 0 "
                           "THEN 1.0 - CAST(_d3 AS DOUBLE) / CAST(_n3 AS DOUBLE) "
                           "ELSE 0.0 END")} AS dup_3gram_frac,
               ((CASE WHEN _tot IS NOT NULL AND _tot > 0
                      THEN CAST(_top AS DOUBLE) / CAST(_tot AS DOUBLE)
                      ELSE 0.0 END) <= {REP_TOP_TOKEN_MAX}
                AND (CASE WHEN _n2 > 0
                         THEN 1.0 - CAST(_d2 AS DOUBLE) / CAST(_n2 AS DOUBLE)
                         ELSE 0.0 END) <= {REP_DUP_2GRAM_MAX}) AS keep
        FROM base b LEFT JOIN tc ON b.doc_id = tc.doc_id
    """,
    "d_bm25_topk": f"""
        WITH t AS (
          SELECT doc_id, lower(unnest({TOKS_SQL})) AS term FROM documents
        ),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM t GROUP BY doc_id, term),
        dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
               FROM tf GROUP BY doc_id),
        dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                  FROM tf GROUP BY term),
        consts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                          CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
                   FROM dl),
        query AS (
          SELECT term FROM tf WHERE length(term) >= 4
          GROUP BY term ORDER BY SUM(tf) DESC, term ASC LIMIT {BM25_QTERMS}
        ),
        j AS (
          SELECT tf.doc_id, tf.tf, dl.dl, dfreq.df, consts.n_docs, consts.avgdl
          FROM tf JOIN query ON tf.term = query.term
                  JOIN dl ON tf.doc_id = dl.doc_id
                  JOIN dfreq ON tf.term = dfreq.term
                  CROSS JOIN consts
        ),
        scored AS (
          SELECT doc_id,
                 CAST(SUM(CAST(FLOOR(
                   ((n_docs - df + 0.5) / (df + 0.5))
                   * (CAST(tf AS DOUBLE) * {BM25_K1 + 1.0})
                   / (CAST(tf AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * (CAST(dl AS DOUBLE) / avgdl)))
                   * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS score_q6
          FROM j GROUP BY doc_id
        )
        SELECT doc_id, score_q6, rank FROM (
          SELECT doc_id, score_q6,
                 CAST(ROW_NUMBER() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS INTEGER) AS rank
          FROM scored
        ) WHERE rank <= {BM25_TOPK}
    """,
    "d_pack_chunks": f"""
        WITH d0 AS (
          SELECT doc_id, lang, CAST(doc_id % 8 AS BIGINT) AS shard,
                 CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens
          FROM documents
        ),
        d AS (
          SELECT *, COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang, shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cum_before
          FROM d0 WHERE n_tokens > 0
        ),
        s AS (
          SELECT lang, shard, doc_id, n_tokens, cum_before,
                 CAST(FLOOR(cum_before / 2048) AS BIGINT) AS first_chunk,
                 CAST(FLOOR((cum_before + n_tokens - 1) / 2048) AS BIGINT) AS last_chunk
          FROM d
        ),
        e AS (
          SELECT lang, shard, doc_id, n_tokens, cum_before,
                 CAST(unnest(generate_series(first_chunk, last_chunk)) AS BIGINT) AS chunk_id
          FROM s
        )
        SELECT lang, shard, chunk_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEAST(cum_before + n_tokens, (chunk_id + 1) * 2048)
                        - GREATEST(cum_before, chunk_id * 2048)) AS BIGINT) AS n_tokens,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM e GROUP BY lang, shard, chunk_id
    """,
    "d_tokens": f"""
        WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
               CAST(len({shingles_sql()}) AS INTEGER) AS n_shingles,
               CAST(length(text) AS INTEGER) AS n_chars_computed
        FROM t
    """,
    "d_quality": f"""
        WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(len(toks) AS INTEGER) AS n_tokens,
                 CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                     / CAST(GREATEST(length(text), 1) AS DOUBLE) AS punct_ratio,
                 CAST(len(list_filter(toks, t -> list_contains(
                     [{", ".join(f"'{w}'" for w in STOPWORDS_EN)}], lower(t)))) AS DOUBLE)
                     / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS stopword_ratio,
                 COALESCE(list_sum(list_transform(toks,
                                                  t -> CAST(length(t) AS DOUBLE))), 0.0)
                     / CAST(GREATEST(len(toks), 1) AS DOUBLE) AS avg_token_len
          FROM t
        )
        SELECT doc_id, n_tokens,
               {round6_sql("punct_ratio")} AS punct_ratio,
               {round6_sql("stopword_ratio")} AS stopword_ratio,
               {round6_sql("avg_token_len")} AS avg_token_len,
               {round6_sql(
                   "LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4"
                   " + (1.0 - LEAST(stopword_ratio * 2.0, 1.0)) * 0.3"
                   " + LEAST(avg_token_len / 8.0, 1.0) * 0.3"
               )} AS quality_score
        FROM m
    """,
    "d_lang_id": f"""
        WITH t AS (SELECT doc_id, lang, {TOKS_SQL} AS toks FROM documents),
        h AS (
          SELECT doc_id, lang,
                 {", ".join(f"{_profile_sql(lang)} AS h_{lang}" for lang in sorted(LANG_PROFILES))}
          FROM t
        ),
        u AS (
          SELECT doc_id, lang, cand.l AS cand_lang, cand.h AS cand_hits
          FROM h, UNNEST([
            {", ".join(f"{{'l': '{lang}', 'h': h_{lang}}}" for lang in sorted(LANG_PROFILES))}
          ]) AS _(cand)
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY cand_hits DESC, cand_lang ASC) AS rk
          FROM u
        )
        SELECT doc_id, lang, cand_lang AS lang_pred, (cand_lang = lang) AS is_match
        FROM r WHERE rk = 1
    """,
    "d_fingerprint": """
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    "d_strings": """
        SELECT doc_id,
               upper(substring(text, 1, 10)) AS head_upper,
               CAST(length(trim(text)) AS INTEGER) AS trimmed_len,
               CAST(levenshtein(substring(text, 1, 8), 'spark sql') AS INTEGER) AS lev_to_spark,
               lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
               reverse(substring(text, 1, 6)) AS head_rev
        FROM documents
    """,
    "d_tokens_bpe": f"""
        WITH t AS (
          SELECT doc_id,
                 regexp_extract_all(text, '{BPE_PATTERN}', 0) AS bt,
                 {TOKS_SQL} AS wt
          FROM documents
        )
        SELECT doc_id,
               CAST(len(bt) AS INTEGER) AS n_bpe_tokens,
               CAST(len(wt) AS INTEGER) AS n_ws_tokens,
               CAST(len(list_distinct(bt)) AS INTEGER) AS n_bpe_distinct
        FROM t
    """,
}

def d_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation filter a training-data pipeline runs: keep a
    document iff (a) its quality score clears the bar, (b) the lang-ID
    heuristic agrees with its label, and (c) it is the canonical member of
    its exact-dedup group.  Output: per-document keep decision + reasons.

    Scale: three per-document relations joined on doc_id — co-partitioned
    after the first shuffle; the whole filter is one pass over the corpus.
    """
    from kafka_journal_spark.functions.dedup import dedup_exact

    q = d_quality(spark, sf_dir).select("doc_id", "quality_score")
    l = d_lang_id(spark, sf_dir).select("doc_id", "is_match")
    c = dedup_exact(spark, sf_dir).select("doc_id", "canonical_id")
    df = q.join(l, "doc_id").join(c, "doc_id")
    keep = (
        (F.col("quality_score") >= 0.5)
        & F.col("is_match")
        & (F.col("doc_id") == F.col("canonical_id"))
    )
    return df.select(
        "doc_id",
        "quality_score",
        "is_match",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
        keep.alias("keep"),
    )


def d_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function family over documents: case ops, substring,
    edit distance to a reference token, padded keys — the §2.7 scalar-fn
    coverage row, all whole-stage-codegen expressions."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.length(F.trim("text")).alias("trimmed_len"),
        F.levenshtein(F.substring("text", 1, 8), F.lit("spark sql")).alias("lev_to_spark"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.reverse(F.substring("text", 1, 6)).alias("head_rev"),
    )


PACK_CAPACITY = 2048  # tokens per training context window
#: Stream-shard fan-out for sequence packing: the running token sum
#: partitions by ``(lang, pmod(doc_id, PACK_SHARDS))``, never by ``lang``
#: alone — at corpus scale one language is ~half the stream and a
#: lang-keyed window would serialize it through a single task.  Sharding
#: is deterministic (content key, not rand), so chunk ids are stable per
#: shard and the oracle reproduces them exactly.  At 100 TB raise S to a
#: few × the cluster's task slots; each shard stays an independent,
#: order-preserving packing stream.
PACK_SHARDS = 8


def pack_chunks(
    spark: SparkSession,
    sf_dir: str,
    capacity: int = PACK_CAPACITY,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard pretraining layout:
    per ``(lang, shard)`` stream, documents are concatenated in ``doc_id``
    order and the token stream is cut into fixed ``capacity`` context
    windows; a document may straddle a boundary (its tokens split across
    the adjacent chunks).  Emits per-chunk packing stats (docs touched,
    token fill).

    Plan: one window (exclusive running token sum) + an explode over the
    chunk span each document covers + one groupBy that reuses the window's
    partitioning — ONE exchange total, all integer column math, exact
    across engines.  The stream key is sharded ``(lang, doc_id mod S)`` so
    no partition ever receives a whole language (see ``PACK_SHARDS``).
    """
    from pyspark.sql import Window

    toks = tokens_col()
    d = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            F.pmod(F.col("doc_id"), F.lit(shards)).alias("shard"),
            F.size(toks).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = (
        d.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("first_chunk", F.floor(F.col("cum_before") / capacity))
        .withColumn(
            "last_chunk",
            F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / capacity),
        )
    )
    e = d.select(
        "lang",
        "shard",
        "doc_id",
        "n_tokens",
        "cum_before",
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
    )
    tokens_in_chunk = F.least(
        F.col("cum_before") + F.col("n_tokens"), (F.col("chunk_id") + 1) * F.lit(capacity)
    ) - F.greatest(F.col("cum_before"), F.col("chunk_id") * F.lit(capacity))
    return (
        e.withColumn("_t", tokens_in_chunk)
        .groupBy("lang", "shard", "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_t").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-style retrieval over the corpus: per-term document frequencies,
    length-normalized term frequency saturation, query-term join, top-k by
    score — the classic sparse-retrieval shape (one exploded-term agg feeds
    tf, dl, df AND the query-term selection; the query side is 3 rows and
    broadcasts).

    Two determinism choices (documented divergences from textbook BM25,
    same operator shape):
    - the idf is the log-free rational ``(N - df + 0.5) / (df + 0.5)`` —
      ``ln`` differs in the last ulp between engines, rational arithmetic
      is bit-identical;
    - per-term scores are fixed-point-quantized (q6) BEFORE summation so
      the aggregation is order-free (``e_centroids`` pattern).
    The query is self-contained: the corpus's ``BM25_QTERMS`` most frequent
    tokens of length >= 4 (ties by token).
    """
    toks = F.transform(tokens_col(), lambda t: F.lower(t))
    t = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(toks).alias("term"))
    )
    tf = t.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    tf = tf.localCheckpoint(eager=True)  # feeds dl, df, query AND the join
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    consts = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    query = (
        tf.filter(F.length("term") >= 4)
        .groupBy("term")
        .agg(F.sum("tf").alias("_gc"))
        .orderBy(F.desc("_gc"), F.asc("term"))
        .limit(BM25_QTERMS)
        .select("term")
    )
    j = (
        tf.join(F.broadcast(query), "term")
        .join(dl, "doc_id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(consts))
    )
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / F.col("avgdl"))
    )
    term_score = idf * (tf_d * F.lit(BM25_K1 + 1.0)) / denom
    scored = (
        j.withColumn(
            "_s_q6", F.floor(term_score * F.lit(1e6) + F.lit(0.5)).cast("long")
        )
        .groupBy("doc_id")
        .agg(F.sum("_s_q6").cast("long").alias("score_q6"))
    )
    from pyspark.sql import Window

    # global top-k via sort-limit (TakeOrdered — per-partition top-k then a
    # k-row merge, never a single-partition global sort); the rank window
    # runs over the k survivors only
    top = scored.orderBy(F.desc("score_q6"), F.asc("doc_id")).limit(BM25_TOPK)
    w = Window.orderBy(F.desc("score_q6"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "doc_id", "score_q6", "rank"
    )


# ---------------------------------------------------------------------------
# PII detection / scrubbing
# ---------------------------------------------------------------------------



def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + scrub over documents: count emails/phones/IPs, then
    redact them with typed placeholders.  Pure JVM regex expressions —
    codegen-resident, no Python, embarrassingly parallel (the 100 TB shape:
    a map-only pass).

    The synthetic corpus carries no organic PII, so a deterministic PII
    suffix (derived from ``doc_id`` identically in both engines) is
    appended in-plan before detection — the regex/scrub machinery is what
    is under test, and a corpus of zero matches would test nothing.

    r12: "embarrassingly parallel" requires splits — a monolithic row
    group serializes the regex chain onto one core, and the session's
    minPartitionNum floor cannot repair it (row groups are the split
    atom).  spread_unsplittable round-robins the rows exactly when the
    layout cannot split (guide §2.5) and is a no-op at any real scale,
    keeping the zero-Exchange map-only shape wherever it actually
    parallelizes.
    """
    from kafka_journal_spark.sources.tables import spread_unsplittable

    doc = spread_unsplittable(
        spark,
        _docs(spark, sf_dir),
        os.path.join(sf_dir, "documents.parquet"),
        min_rows=2048,
    )
    pii = F.concat(
        F.col("text"),
        F.lit(" contact doc"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(pii, PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IP_RE,
        "<IP>",
    )
    return doc.select(
        "doc_id",
        F.size(F.regexp_extract_all(pii, F.lit(f"({PII_EMAIL_RE})"))).alias("n_emails"),
        F.size(F.regexp_extract_all(pii, F.lit(f"({PII_PHONE_RE})"))).alias("n_phones"),
        F.size(F.regexp_extract_all(pii, F.lit(f"({PII_IP_RE})"))).alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_fp"),
        (F.length(pii) - F.length(scrubbed)).alias("chars_removed"),
    )


# ---------------------------------------------------------------------------
# repetition metrics (Gopher-style quality rules)
# ---------------------------------------------------------------------------



def repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics: top-token mass fraction and
    duplicate 2-/3-gram fractions, plus the Gopher-style keep flag.

    Plan: the n-gram fractions are pure array expressions (zero shuffle);
    the top-token fraction is one explode + hash-aggregate keyed on
    (doc_id) with ``max_by``-free max(count) — the single shuffle carries
    two longs per doc.  At 100 TB this is the cheapest quality family
    after plain counters.
    """
    toks = tokens_col()
    two = F.greatest(F.size(toks) - 1, F.lit(0))
    three = F.greatest(F.size(toks) - 2, F.lit(0))
    # tokenize/shingle per row is CPU-dense: spread before the expressions
    # run (one small parquet file = one partition = one core otherwise)
    par = spark.sparkContext.defaultParallelism
    docs = _docs(spark, sf_dir).select("doc_id", "text").repartition(par, "doc_id")
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        two.alias("_n2"),
        F.size(shingles_col(toks, 2)).alias("_d2"),
        three.alias("_n3"),
        F.size(shingles_col(toks, 3)).alias("_d3"),
    )
    tok_counts = (
        docs
        .select("doc_id", F.explode(tokens_col()).alias("_t"))
        .groupBy("doc_id", "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("doc_id")
        .agg(F.max("_c").alias("_top"), F.sum("_c").alias("_tot"))
    )
    dup2 = F.when(
        F.col("_n2") > 0,
        F.lit(1.0) - F.col("_d2").cast("double") / F.col("_n2").cast("double"),
    ).otherwise(F.lit(0.0))
    dup3 = F.when(
        F.col("_n3") > 0,
        F.lit(1.0) - F.col("_d3").cast("double") / F.col("_n3").cast("double"),
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        F.col("_tot").isNotNull() & (F.col("_tot") > 0),
        F.col("_top").cast("double") / F.col("_tot").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        base.join(tok_counts, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            round6(top_frac).alias("top_token_frac"),
            round6(dup2).alias("dup_2gram_frac"),
            round6(dup3).alias("dup_3gram_frac"),
            (
                (top_frac <= F.lit(REP_TOP_TOKEN_MAX))
                & (dup2 <= F.lit(REP_DUP_2GRAM_MAX))
            ).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic stratified source sampling (corpus mixing)
# ---------------------------------------------------------------------------

#: per-source sampling rates in permille: even-numbered sources are kept
#: whole, odd-numbered downsampled to 30% — the "mix web crawl down,
#: keep curated sources" knob of a pretraining data recipe
SAMPLE_RATE_EVEN = 1000
SAMPLE_RATE_ODD = 300


def _sample_bucket_rate_sql() -> tuple[str, str]:
    """SQL twins of :func:`_sample_bucket_rate_cols` (r11 §4 pattern)."""
    from kafka_journal_spark.functions.dedup import HASH64_SPARK_SQL

    bucket = f"pmod({HASH64_SPARK_SQL.format(x='CAST(doc_id AS STRING)')}, 1000)"
    rate = (
        "CASE WHEN try_cast(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 2 = 0 "
        f"THEN {SAMPLE_RATE_EVEN} ELSE {SAMPLE_RATE_ODD} END"
    )
    return bucket, rate


def _sample_bucket_rate_cols() -> tuple[Column, Column]:
    """The (bucket, rate) expressions behind the deterministic sampler —
    shared by :func:`sample_sources` and the fused pipeline projection."""
    from kafka_journal_spark.functions.dedup import hash64

    bucket = F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(1000))
    # try_cast, not cast: a source with NO trailing digits extracts '' and
    # under ANSI mode (Spark 4 default) a hard cast THROWS, killing the
    # whole job on one unconventional source name; try_cast yields NULL,
    # the parity test is NULL, and the doc falls to the odd rate — the
    # oracle mirrors with DuckDB TRY_CAST
    src_num = F.regexp_extract("source", r"([0-9]+)$", 1).try_cast("int")
    rate = F.when(src_num % 2 == 0, F.lit(SAMPLE_RATE_EVEN)).otherwise(
        F.lit(SAMPLE_RATE_ODD)
    )
    return bucket, rate


def sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source weighted sampling: each doc's keep decision
    is ``md5-bucket(doc_id) < rate(source)`` — a pure map-side filter that
    is reproducible across runs, engines, AND task retries (the property
    ``F.rand``-based sampling loses: a recomputed partition would draw a
    different sample, corrupting downstream exactly-once writes).

    At 100 TB this is the corpus-mixing primitive: rates live in a tiny
    broadcast map (here a parity rule), the scan is map-only, and the same
    seed always yields the same corpus."""
    bucket, rate = _sample_bucket_rate_sql()
    return _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "source",
        f"CAST({bucket} AS INT) AS bucket",
        f"CAST({rate} AS INT) AS rate_permille",
        f"(({bucket}) < ({rate})) AS keep",
    )


# ---------------------------------------------------------------------------
# UDTF + grouped-agg pandas UDAF surface (SURVEY §2.7 last row): the two
# extension-function classes not otherwise exercised.  Both are DEMO-grade
# by design — the engine's hot paths stay on JVM expressions (see module
# docstring) — but the registration, Arrow batching, and result semantics
# are real and oracle-checked.
# ---------------------------------------------------------------------------


def sentence_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table-function surface): split each document
    into fixed-width token windows, one OUTPUT ROW per window — the 1:N
    row fan-out shape only a table function (or explode) can express.
    Arrow-optimized; the oracle reproduces the windows with UNNEST math."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, first_token string", useArrow=True)
    class TokenWindows:
        def eval(self, text: str, width: int):
            # ASCII \s+ split to match tokens_col's Java-regex semantics
            # (bare str.split() splits on UNICODE whitespace — U+00A0 etc.
            # would tokenize differently from every other query)
            toks = [t for t in re.split(r"\s+", text or "", flags=re.ASCII) if t]
            for i in range(0, len(toks), width):
                win = toks[i : i + width]
                yield i // width, len(win), win[0]

    spark.udtf.register("token_windows", TokenWindows)
    docs = _docs(spark, sf_dir)
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, w.chunk_idx, w.n_tokens, w.first_token
        FROM __udtf_docs d, LATERAL token_windows(d.text, 16) w
        """
    )


def grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF: exact per-group median via a numpy
    kernel (Arrow-batched series in, scalar out) — the custom-UDAF surface.
    np.median's linear interpolation matches DuckDB ``quantile_cont(0.5)``
    bit-for-bit on these inputs; the JVM twin of this query is
    ``q_percentiles``."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module uses PEP 563 string
    # annotations, which pandas_udf's signature inference cannot read
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def median_udaf(v):
        return float(np.median(v.to_numpy()))

    # a grouped-agg pandas UDF cannot mix with JVM aggregates in one agg
    # call — the row count rides as a second pandas aggregate
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def count_udaf(v):
        return len(v)

    from kafka_journal_spark.sources.tables import read_parquet_cached_schema

    ev = read_parquet_cached_schema(spark, os.path.join(sf_dir, "orders.parquet"))
    return (
        ev.groupBy("o_orderstatus")
        .agg(
            median_udaf(F.col("o_totalprice")).alias("_m"),
            count_udaf(F.col("o_totalprice")).alias("n"),
        )
        # round6 (not F.round): the repo's quantizer pair whose SQL twin
        # (round6_sql) is bit-identical across engines
        .select("o_orderstatus", round6(F.col("_m")).alias("median_price"), "n")
    )


def token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-rarity statistics against the corpus unigram
    table: median and minimum corpus frequency of the doc's tokens, hapax
    count (tokens occurring exactly once corpus-wide), and a noise flag —
    the perplexity-proxy quality family (docs dominated by rare tokens are
    OCR garbage / mojibake candidates) computed with INTEGER corpus
    frequencies only, so both engines agree bit-for-bit where a float
    log-prob would drift in the last ulp.

    Plan: one token explode feeds the corpus frequency aggregate and the
    join back; the frequency table is token-keyed (shuffle bounded by
    vocabulary, not corpus) and AQE broadcasts it while small.
    """
    par = spark.sparkContext.defaultParallelism
    tok = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .repartition(par, "doc_id")
        .select("doc_id", F.explode(tokens_col()).alias("token"))
        .localCheckpoint(eager=True)  # feeds freq agg AND the join back
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("_cf"))
    return (
        tok.join(freq, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            round6(F.percentile("_cf", 0.5)).alias("median_corpus_freq"),
            F.min("_cf").alias("min_corpus_freq"),
            F.sum(F.when(F.col("_cf") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .withColumn(
            "noisy",
            (F.col("n_hapax") * 5 > F.col("n_tokens"))
            | (F.col("median_corpus_freq") < 3),
        )
    )


TEXT_QUERIES = {
    "d_token_rarity": token_rarity,
    "x_udtf_windows": sentence_udtf_chunks,
    "x_udaf_median": grouped_agg_median,
    "d_pii_scrub": pii_scrub,
    "d_sample_sources": sample_sources,
    "d_repetition": repetition_metrics,
    "d_tokens": d_tokens,
    "d_tokens_bpe": d_tokens_bpe,
    "d_curation": d_curation,
    "d_strings": d_strings,
    "d_quality": d_quality,
    "d_lang_id": d_lang_id,
    "d_fingerprint": d_fingerprint,
    "d_pack_chunks": pack_chunks,
    "d_bm25_topk": bm25_topk,
}
