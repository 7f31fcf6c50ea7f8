"""Document-quality rule batteries — round-2c additions to the
LLM-data-pipeline surface (SURVEY.md §2 "beyond-reference" track):

- ``gopher_quality_rules``: the Gopher pre-training quality filter battery
  (Rae et al. 2021, §A1.1), adapted to the whitespace-token contract:
  word-count bounds, mean-word-length bounds, symbol-token ratio,
  bullet-token ratio, alphabetic-token ratio, stopword presence. Emits
  per-source fail counts per rule plus the pass-all count — the corpus
  health dashboard a curation run reads before committing a crawl.
- ``char_simpson_diversity``: per-document character diversity as the
  Simpson index 1 − Σ pᵢ² in exact ppm — the log-free cousin of character
  entropy (gibberish / single-char spam scores near 0). Computed entirely
  map-side with nested higher-order functions (O(distinct·len) per doc, no
  shuffle, no UDF).
- ``flesch_reading_ease``: Flesch reading-ease per document with a
  vowel-group syllable heuristic and a fixed 20-token sentence proxy (the
  synthetic corpus has no sentence punctuation), evaluated in EXACT integer
  milli-points: score = (206835·S·W − 1015·W² − 84600·Y·S) // (S·W).

Every metric is integer-exact (BIGINT products + floor division, boolean
threshold comparisons cross-multiplied to stay in integers), so the DuckDB
hash check is exact — the same "no float sums" contract as text4_queries.

Reference parity note: the reference engine (topk-pinot-flink) has no text
surface; these extend the engine for training-data curation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

# ---------------------------------------------------------------------------
# Gopher quality rule battery
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with", "a")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

# Rules over token array `toks` (lowercased whitespace split), letters
# C = Σ len(tok), W = |toks|  — all thresholds cross-multiplied to integers:
#   wc:     50 ≤ W ≤ 100000
#   mwl:    3 ≤ C/W ≤ 10            ⇔  3·W ≤ C AND C ≤ 10·W
#   sym:    #{tok contains # or …}/W ≤ 0.1   ⇔  10·n_sym ≤ W
#   bullet: #{tok ∈ {-,*,•}}/W ≤ 0.1         ⇔  10·n_bul ≤ W
#   alpha:  #{tok has [a-z]}/W ≥ 0.8         ⇔  5·n_alpha ≥ 4·W
#   stop:   ≥ 2 distinct stopwords present

_GOPHER_ORACLE = f"""
WITH t AS (
  SELECT source,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT source,
         len(toks) AS w,
         list_sum(list_transform(toks, x -> len(x))) AS c,
         len(list_filter(toks, x -> contains(x, '#') OR contains(x, '…')))
           AS n_sym,
         len(list_filter(toks, x -> x IN ('-', '*', '•'))) AS n_bul,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(list_intersect(list_distinct(toks), [{_SW_SQL}])) AS n_stop
  FROM t
),
r AS (
  SELECT source,
         (w >= 50 AND w <= 100000)        AS ok_wc,
         (3 * w <= c AND c <= 10 * w)     AS ok_mwl,
         (10 * n_sym <= w)                AS ok_sym,
         (10 * n_bul <= w)                AS ok_bul,
         (5 * n_alpha >= 4 * w)           AS ok_alpha,
         (n_stop >= 2)                    AS ok_stop
  FROM m
)
SELECT source,
       count(*)::BIGINT                                        AS n_docs,
       sum(CASE WHEN ok_wc    THEN 0 ELSE 1 END)::BIGINT       AS fail_wordcount,
       sum(CASE WHEN ok_mwl   THEN 0 ELSE 1 END)::BIGINT       AS fail_meanwordlen,
       sum(CASE WHEN ok_sym   THEN 0 ELSE 1 END)::BIGINT       AS fail_symbolratio,
       sum(CASE WHEN ok_bul   THEN 0 ELSE 1 END)::BIGINT       AS fail_bulletratio,
       sum(CASE WHEN ok_alpha THEN 0 ELSE 1 END)::BIGINT       AS fail_alpharatio,
       sum(CASE WHEN ok_stop  THEN 0 ELSE 1 END)::BIGINT       AS fail_stopwords,
       sum(CASE WHEN ok_wc AND ok_mwl AND ok_sym AND ok_bul
                     AND ok_alpha AND ok_stop THEN 1 ELSE 0 END)::BIGINT
         AS pass_all
FROM r
GROUP BY source
ORDER BY source
"""


@register("gopher_quality_rules", tags=("TXT-quality", "gopher"), oracle=_GOPHER_ORACLE)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule battery (Rae et al. 2021 §A1.1) over the
    whitespace-token contract, aggregated to per-source fail counts.

    100 TB posture: every rule is a map-side expression over the token array
    (one scan, no UDF, no shuffle before the 5-group final agg); thresholds
    are cross-multiplied so the whole battery is integer comparisons —
    whole-stage-codegen keeps it in the JVM."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    m = d.select(
        "source",
        F.size(toks).alias("w"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("c"),
        F.size(
            F.filter(toks, lambda x: x.contains("#") | x.contains("…"))
        ).alias("n_sym"),
        F.size(F.filter(toks, lambda x: x.isin("-", "*", "•"))).alias("n_bul"),
        F.size(
            F.filter(toks, lambda x: x.rlike("[a-z]"))
        ).alias("n_alpha"),
        F.size(
            F.array_intersect(
                F.array_distinct(toks), F.array(*[F.lit(s) for s in _STOPWORDS])
            )
        ).alias("n_stop"),
    )
    r = m.select(
        "source",
        ((F.col("w") >= 50) & (F.col("w") <= 100000)).alias("ok_wc"),
        ((3 * F.col("w") <= F.col("c")) & (F.col("c") <= 10 * F.col("w"))).alias(
            "ok_mwl"
        ),
        (10 * F.col("n_sym") <= F.col("w")).alias("ok_sym"),
        (10 * F.col("n_bul") <= F.col("w")).alias("ok_bul"),
        (5 * F.col("n_alpha") >= 4 * F.col("w")).alias("ok_alpha"),
        (F.col("n_stop") >= 2).alias("ok_stop"),
    )
    fails = [
        ("ok_wc", "fail_wordcount"),
        ("ok_mwl", "fail_meanwordlen"),
        ("ok_sym", "fail_symbolratio"),
        ("ok_bul", "fail_bulletratio"),
        ("ok_alpha", "fail_alpharatio"),
        ("ok_stop", "fail_stopwords"),
    ]
    pass_all = F.col("ok_wc")
    for ok, _ in fails[1:]:
        pass_all = pass_all & F.col(ok)
    return (
        r.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            *[
                F.sum(F.when(F.col(ok), 0).otherwise(1)).alias(out)
                for ok, out in fails
            ],
            F.sum(pass_all.cast("long")).alias("pass_all"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Simpson character diversity (log-free entropy analog), exact ppm
# ---------------------------------------------------------------------------

_SIMPSON_ORACLE = """
WITH s AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', '', 'g') AS body
  FROM documents WHERE doc_id % 7 = 0
),
cs AS (
  SELECT doc_id,
         list_transform(range(1, len(body) + 1), i -> body[i]) AS ch
  FROM s WHERE len(body) > 0
)
SELECT doc_id,
       len(ch)::BIGINT AS n_chars,
       len(list_distinct(ch))::BIGINT AS n_distinct,
       (1000000 - list_sum(list_transform(list_distinct(ch),
           d -> len(list_filter(ch, x -> x = d))
                * len(list_filter(ch, x -> x = d))))
         * 1000000 // (len(ch) * len(ch)))::BIGINT AS simpson_ppm
FROM cs
ORDER BY doc_id
"""


@register(
    "char_simpson_diversity", tags=("TXT-quality", "entropy"), oracle=_SIMPSON_ORACLE
)
def char_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character diversity: Simpson index 1 − Σ pᵢ² in exact
    ppm over the whitespace-stripped lowercased body (1/7 doc sample keeps
    the O(distinct·len) kernel proportionate at gate scale).

    The rational form needs no logarithm, so the score stays in BIGINT
    arithmetic end-to-end — hash-exact against the oracle, unlike a float
    entropy whose summation order would differ across engines. 100 TB
    posture: nested higher-order functions run wholly map-side (alphabet is
    small, so distinct·len ≈ 40·|doc|); nothing shuffles but the final
    per-doc rows."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    body = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", "")
    s = d.select("doc_id", body.alias("body")).filter(F.length("body") > 0)
    # split('') yields one element per character; Spark's split may keep a
    # trailing empty string, so slice to len(body) to match DuckDB's range
    # indexing exactly.
    chars = F.slice(F.split(F.col("body"), ""), 1, F.length("body"))
    cs = s.select("doc_id", chars.alias("ch"))
    count_of = lambda d_: F.size(F.filter(F.col("ch"), lambda x: x == d_))  # noqa: E731
    sum_sq = F.aggregate(
        F.transform(F.array_distinct(F.col("ch")), lambda d_: count_of(d_) * count_of(d_)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v.cast("long"),
    )
    n = F.size("ch").cast("long")
    return (
        cs.select(
            "doc_id",
            n.alias("n_chars"),
            F.size(F.array_distinct("ch")).cast("long").alias("n_distinct"),
            (
                F.lit(1000000).cast("long")
                - F.floor(sum_sq * F.lit(1000000) / (n * n))
            ).alias("simpson_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Flesch reading ease, exact integer milli-points
# ---------------------------------------------------------------------------

_FLESCH_ORACLE = """
WITH t AS (
  SELECT doc_id,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents WHERE doc_id % 5 = 0
),
m AS (
  SELECT doc_id,
         len(toks) AS w,
         list_sum(list_transform(toks,
             x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))) AS y,
         (len(toks) + 19) // 20 AS s
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       w::BIGINT AS words,
       y::BIGINT AS syllables,
       s::BIGINT AS sentences,
       ((206835 * s * w - 1015 * w * w - 84600 * y * s) // (s * w))::BIGINT
         AS flesch_milli
FROM m
ORDER BY doc_id
"""


@register("flesch_reading_ease", tags=("TXT-quality", "readability"), oracle=_FLESCH_ORACLE)
def flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per document (1/5 sample), integer-exact:

        score = 206.835 − 1.015·(W/S) − 84.6·(Y/W)

    with Y = Σ max(1, vowel-group count) per token (the standard
    syllable heuristic) and S = ⌈W/20⌉ fixed-size sentence proxies (the
    synthetic corpus carries no sentence punctuation). Over the common
    denominator S·W the score in milli-points is a single BIGINT floor
    division — the double division (~1e10/1e5) sits ≥ 1/(S·W) ≫ one ulp
    from any integer, so FLOOR matches DuckDB's exact `//`. Map-side only;
    no shuffle, no UDF."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    m = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("w"),
        F.aggregate(
            F.transform(
                toks,
                lambda x: F.greatest(
                    F.lit(1), F.size(F.regexp_extract_all(x, F.lit("[aeiouy]+"), 0))
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v.cast("long"),
        ).alias("y"),
    ).filter(F.col("w") > 0)
    # integer ceil(w/20) without float: (w + 19) div 20
    m = m.withColumn("s", F.floor((F.col("w") + 19) / 20).cast("long"))
    num = (
        F.lit(206835) * F.col("s") * F.col("w")
        - F.lit(1015) * F.col("w") * F.col("w")
        - F.lit(84600) * F.col("y") * F.col("s")
    )
    den = F.col("s") * F.col("w")
    return m.select(
        "doc_id",
        F.col("w").alias("words"),
        F.col("y").alias("syllables"),
        F.col("s").alias("sentences"),
        F.floor(num / den).cast("long").alias("flesch_milli"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# C4-style line filtering (Raffel et al. 2020), adapted to the line proxy
# ---------------------------------------------------------------------------

_C4_LINE = 4  # tokens per line window (the corpus-wide line proxy shared
# with boilerplate_line_removal; the synthetic corpus has no newlines)

_C4_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS l
  FROM documents WHERE doc_id % 4 = 1
),
ex AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(l) / {_C4_LINE}.0) AS BIGINT))) AS i,
         l
  FROM t WHERE len(l) > 0
),
lines AS (
  SELECT doc_id, l[i*{_C4_LINE}+1 : i*{_C4_LINE}+{_C4_LINE}] AS ln
  FROM ex
),
judged AS (
  SELECT doc_id,
         (len(ln) >= {_C4_LINE}
          AND len(list_intersect(ln, [{_SW_SQL}])) >= 1
          AND len(list_filter(ln, x -> len(x) > 20)) = 0) AS keep
  FROM lines
)
SELECT doc_id,
       count(*)::BIGINT AS n_lines,
       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS retained_ppm
FROM judged
GROUP BY doc_id
ORDER BY doc_id
"""


@register("c4_line_rules", tags=("TXT-quality", "c4"), oracle=_C4_ORACLE)
def c4_line_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule-based LINE filtering (Raffel et al. 2020 §2.2),
    adapted to the 4-token line proxy: keep a line iff it is full-length,
    contains a stopword (the natural-language heuristic standing in for
    C4's terminal-punctuation rule, which cannot fire on this punctuation-
    free corpus), and has no 20+-char token. Per-doc retained ratio in
    exact ppm. The RULE-based complement of boilerplate_line_removal's
    cross-document frequency rule: this one needs no corpus-wide state at
    all — pure map-side higher-order functions, zero shuffle before the
    per-doc aggregate (which is itself map-side: lines of a doc never
    leave their row)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 1)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_lines = F.ceil(F.size("l") / F.lit(_C4_LINE)).cast("int")
    lines = (
        d.select("doc_id", toks.alias("l"))
        .filter(F.size("l") > 0)
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.slice(F.col("l"), i * _C4_LINE + 1, _C4_LINE),
            ).alias("lns"),
        )
    )
    sw = F.array(*[F.lit(s) for s in _STOPWORDS])
    keep_flags = F.transform(
        F.col("lns"),
        lambda ln: (
            (F.size(ln) >= _C4_LINE)
            & (F.size(F.array_intersect(ln, sw)) >= 1)
            & (F.size(F.filter(ln, lambda x: F.length(x) > 20)) == 0)
        ).cast("long"),
    )
    return (
        lines.select(
            "doc_id",
            F.size("lns").cast("long").alias("n_lines"),
            F.aggregate(
                keep_flags, F.lit(0).cast("long"), lambda a, v: a + v
            ).alias("n_kept"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_kept",
            F.floor(F.col("n_kept") * F.lit(1000000) / F.col("n_lines"))
            .cast("long")
            .alias("retained_ppm"),
        )
        .orderBy("doc_id")
    )
