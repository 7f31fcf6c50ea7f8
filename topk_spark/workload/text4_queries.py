"""Corpus-statistics laws + boilerplate removal — round-2 additions to the
LLM-data-pipeline surface (SURVEY.md §2 "beyond-reference" track):

- ``boilerplate_line_removal``: CCNet-style cross-document line dedup — the
  classic pre-training cleanup (Wenzek et al., CCNet, 2020) where a "line"
  that recurs across many documents (nav bars, cookie banners) is dropped
  corpus-wide. Here a line = a fixed 4-token window; recurrence = distinct
  docs ≥ 2 (thresholds chosen for the synthetic corpus's density — 341 of
  6544 lines at sf0.01).
- ``heaps_vocab_growth``: Heaps'-law curve — distinct-vocabulary size at 8
  corpus-prefix checkpoints; the sizing tool for tokenizer vocab builds.
- ``zipf_token_curve``: rank-frequency head of the unigram distribution
  with exact ppm shares — the Zipf diagnostic for corpus naturalness.

All three are hash-exact against DuckDB: tokenization is the proven
`\\s+`-split contract shared with doc_chunking / tfidf (see
corpus_ops_queries.py), and every ratio is integer ppm (floor of a BIGINT
product), never a float sum.

Reference parity note: the reference engine (topk-pinot-flink) has no text
surface at all; these extend the engine for training-data curation, the
north-star workload this repo targets beyond reference parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_LINE = 4  # tokens per line window
_BOILER_DF = 2  # distinct-doc threshold: line is boilerplate if df >= this

_BOILER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
),
ex AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(l) / {_LINE}.0) AS BIGINT))) AS i,
         l
  FROM t WHERE len(l) > 0
),
lines AS (
  SELECT doc_id,
         md5(array_to_string(l[i*{_LINE}+1 : i*{_LINE}+{_LINE}], ' ')) AS lh
  FROM ex
),
df AS (
  SELECT lh, count(DISTINCT doc_id) AS df FROM lines GROUP BY lh
),
per_doc AS (
  SELECT lines.doc_id,
         count(*) AS n_lines,
         SUM(CASE WHEN df.df >= {_BOILER_DF} THEN 1 ELSE 0 END) AS n_boiler
  FROM lines JOIN df USING (lh)
  GROUP BY lines.doc_id
)
SELECT doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_boiler AS BIGINT) AS n_boiler,
       CAST((n_lines - n_boiler) * 1000000 // n_lines AS BIGINT)
         AS retained_ppm
FROM per_doc
WHERE n_boiler > 0
"""


@register("boilerplate_line_removal", tags=("DD-boilerplate",), oracle=_BOILER_ORACLE)
def boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate line removal (CCNet-style): window each
    doc into non-overlapping 4-token lines, count DISTINCT docs per line
    corpus-wide, flag lines recurring in ≥ 2 docs, and report the per-doc
    retained-token ratio in exact ppm.

    100 TB shape: the explode is map-side; the only corpus-scale shuffle
    carries (md5(line), doc_id) — a fixed 32-char digest per line, never
    line text — into a partial+final distinct-count agg; the df table that
    joins back is the boilerplate-line subset, which is tiny relative to
    the corpus (recurrent lines by definition collapse). Same contract as
    a CommonCrawl line-dedup pass: one scan, one digest shuffle."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("l")
    ).filter(F.size("l") > 0)
    n_lines = F.ceil(F.size("l") / F.lit(float(_LINE))).cast("long")
    lines = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), (n_lines - 1).cast("int"))).alias("i"),
        "l",
    ).select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice("l", F.col("i") * _LINE + 1, F.lit(_LINE)))
        ).alias("lh"),
    )
    df = lines.groupBy("lh").agg(F.countDistinct("doc_id").alias("df"))
    per_doc = (
        lines.join(df, "lh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum((F.col("df") >= _BOILER_DF).cast("long")).alias("n_boiler"),
        )
    )
    return per_doc.filter(F.col("n_boiler") > 0).select(
        "doc_id",
        "n_lines",
        "n_boiler",
        F.floor(
            (F.col("n_lines") - F.col("n_boiler")) * F.lit(1000000) / F.col("n_lines")
        ).alias("retained_ppm"),
    )


_N_CP = 8

_HEAPS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents
),
first_seen AS (
  SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok
),
n AS (SELECT count(*) AS n_docs FROM documents),
cps AS (
  SELECT CAST(i AS INT) AS checkpoint_idx,
         CAST(ceil(i * n.n_docs / {_N_CP}.0) AS BIGINT) AS docs_seen
  FROM n, unnest(range(1, {_N_CP} + 1)) AS t(i)
)
SELECT cps.checkpoint_idx, cps.docs_seen,
       (SELECT count(*) FROM first_seen f WHERE f.first_doc < cps.docs_seen)
         AS vocab_size
FROM cps
ORDER BY checkpoint_idx
"""


@register("heaps_vocab_growth", tags=("TXT-heaps",), oracle=_HEAPS_ORACLE)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct-token count after each
    1/8th of the corpus (by doc_id order). One explode scan reduces to a
    per-token min(doc_id) — the token's first appearance — then 8
    checkpoint rows each count first_doc < threshold via a broadcast
    range join (8 × |vocab| predicate evaluations over the already-tiny
    first-seen table, no corpus re-scan). Scale: vocabulary is sublinear
    in corpus size (that IS Heaps' law), so the joined side stays small
    even at 100 TB of text."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
    )
    first_seen = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    cps = (
        spark.range(1, _N_CP + 1)
        .select(F.col("id").cast("int").alias("checkpoint_idx"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "checkpoint_idx",
            F.ceil(F.col("checkpoint_idx") * F.col("n_docs") / F.lit(float(_N_CP)))
            .cast("long")
            .alias("docs_seen"),
        )
    )
    return (
        first_seen.crossJoin(F.broadcast(cps))
        .filter(F.col("first_doc") < F.col("docs_seen"))
        .groupBy("checkpoint_idx", "docs_seen")
        .agg(F.count("*").alias("vocab_size"))
        .orderBy("checkpoint_idx")
    )


_ZIPF_K = 30

_ZIPF_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents
),
freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT SUM(cnt) AS total, MAX(cnt) AS top_cnt FROM freq),
rk AS (
  SELECT tok, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS INT) AS rank
  FROM freq
)
SELECT rk.rank, rk.tok, rk.cnt,
       CAST(rk.cnt * 1000000 // tot.total AS BIGINT) AS share_ppm,
       CAST(rk.cnt * 1000000 // tot.top_cnt AS BIGINT) AS vs_top_ppm
FROM rk, tot WHERE rk.rank <= {_ZIPF_K}
ORDER BY rk.rank
"""


@register("zipf_token_curve", tags=("TXT-zipf",), oracle=_ZIPF_ORACLE)
def zipf_token_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency head: top-30 unigrams with exact ppm share of
    total tokens and ppm ratio to the rank-1 token. The global "sort" is a
    TakeOrderedAndProject bounded heap over the (already partial-agg'd)
    per-token counts — never a full sort; total/top counts ride a 1-row
    broadcast. Ratios are integer-floor ppm: no float division disagreement
    between engines."""
    from topk_spark.ops.topk import global_topk

    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        # Both the head and the totals consume freq; without this the two
        # branches each re-run the corpus explode scan (Catalyst won't
        # reuse an exchange capped by TakeOrderedAndProject). freq is
        # vocab-sized — Heaps-bounded, sublinear in corpus — so pinning it
        # trades a tiny cache for a second 100 TB scan.
        .localCheckpoint(eager=False)
    )
    tot = freq.agg(F.sum("cnt").alias("total"), F.max("cnt").alias("top_cnt"))
    head = global_topk(
        freq, [F.desc("cnt"), F.asc("tok")], _ZIPF_K, sentinel_col=None
    ).select(
        F.col("rank").cast("int").alias("rank"), "tok", "cnt"
    )
    return (
        head.crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "tok",
            "cnt",
            F.floor(F.col("cnt") * F.lit(1000000) / F.col("total")).alias("share_ppm"),
            F.floor(F.col("cnt") * F.lit(1000000) / F.col("top_cnt")).alias(
                "vs_top_ppm"
            ),
        )
        .orderBy("rank")
    )


_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
  FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
),
first_seen AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g),
per_doc AS (
  SELECT gr.doc_id,
         count(*) AS n_grams,
         CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM grams gr JOIN first_seen f USING (g)
  GROUP BY gr.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY doc_id) AS r,
         count(*) OVER () AS n
  FROM per_doc
)
SELECT CAST((r - 1) * 10 // n AS INT) AS decile,
       count(*) AS n_docs,
       CAST(SUM(n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       CAST(SUM(n_novel) * 1000000 // SUM(n_grams) AS BIGINT) AS novelty_ppm
FROM ranked
GROUP BY 1
ORDER BY decile
"""


@register("ngram_novelty_decay", tags=("TXT-novelty", "curation"), oracle=_NOVELTY_ORACLE)
def ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diminishing-novelty curve: for each corpus-position decile (docs in
    doc_id order), the exact-ppm share of distinct 3-grams appearing for
    the FIRST time in that decile's documents — the curation signal behind
    'later crawl snapshots add less' (the marginal-value curve a data
    buyer reads before paying for snapshot N+1). Sibling of
    heaps_vocab_growth (corpus-level vocab curve) at per-doc resolution,
    re-aggregated to a fixed 10-row output at any corpus size.

    Plan: one explode scan → distinct (doc, gram) → per-gram min(doc_id)
    (the first-appearance reduction, same shuffle key as the dedup
    family) → per-doc novel counts. The only global window runs over the
    PER-DOC table (one row per doc, never grams), and the decile is exact
    rank arithmetic ((r-1)*10 div n) — no ntile, no percentile
    interpolation. Ratios in integral div, matching the oracle's '//'."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t"))
    grams = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3),"
                    " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("doc_id")
    ranked = per_doc.withColumn("r", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy())
    )
    return (
        ranked.groupBy(F.expr("CAST((r - 1) * 10 div n AS INT)").alias("decile"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.sum("n_novel").cast("long").alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("CAST(n_novel * 1000000 div n_grams AS BIGINT)"),
        )
        .orderBy("decile")
    )
