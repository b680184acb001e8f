"""Corpus-curation operators: benchmark decontamination, composite quality
filtering, and subword token accounting over `documents`.

These complete the LLM-pipeline family (queries/llm_ops.py) with the three
curation steps a pretraining data team runs between cleaning and training:
removing benchmark-contaminated documents, applying Gopher-style rule
filters, and budgeting the corpus in subword tokens rather than whitespace
words. Reference scope: outside the reference engine's SQL-analytics
surface (SURVEY.md §2) — these follow the same Spark-first catalog/oracle
conventions as every other entry.

All three are built-in-expression compositions (zero Python UDFs). The
decontamination join is the only shuffle in the module, and its eval side
is broadcast — see the entry doc for the 100 TB story.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_spark.catalog import register
from currency_etl_spark.queries.llm_ops import (
    STOPWORDS,
    _shingles,
    _SQL_SHINGLES,
    _sql_list,
    _with_tokens,
)
from currency_etl_spark.sources import table

#: Every doc_id divisible by EVAL_MOD plays the role of a held-out
#: benchmark/eval document; the rest are the training pool. A real pipeline
#: joins against an external benchmark corpus — deriving the split from
#: doc_id keeps the entry self-contained and oracle-checkable.
EVAL_MOD = 97

# Contamination n-gram size: production decontamination uses 8-13-gram
# exact match (the GPT-3/Llama convention); this corpus's documents are
# short random sequences over a ~30-word vocabulary, where 8-grams never
# collide — word 3-grams (the module-wide shingle size, _shingles) give
# the same plan shape with non-degenerate hit counts at every SF.

#: A training document is flagged when MORE than this share of its
#: shingles appears in the eval split's shingle set.
DECON_FLAG_THRESHOLD = 0.05

#: Gopher-style quality rule bounds (Rae et al. 2021, table A1 analogues),
#: calibrated so each rule has real pass/fail populations on this corpus:
#: token count in [20, 1000], mean token length in [4.0, 5.1], type-token
#: ratio >= 0.35, most-frequent-token share <= 0.12, >= 2 stopword hits.
QF_MIN_TOKENS, QF_MAX_TOKENS = 20, 1000
QF_MIN_AVG_LEN, QF_MAX_AVG_LEN = 4.0, 5.1
QF_MIN_TTR = 0.35
QF_MAX_TOP_SHARE = 0.12
QF_MIN_STOP_HITS = 2

#: BPE-ish subword budget: a token is ceil(len(word)/4) subwords — the
#: bytes-per-token constant the text_stats estimate uses, applied per word
#: so short words cost one subword and long words split.
SUBWORD_CHARS = 4


@register(
    "docs_decontaminate",
    oracle=f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (SELECT doc_id, {_SQL_SHINGLES.format(t='t')} AS gs FROM toks),
        ev AS (SELECT DISTINCT unnest(gs) AS g FROM sh WHERE doc_id % {EVAL_MOD} = 0),
        tr AS (SELECT doc_id, unnest(gs) AS g FROM sh WHERE doc_id % {EVAL_MOD} <> 0),
        hits AS (SELECT doc_id, count(*) AS n_hits FROM tr JOIN ev USING (g) GROUP BY doc_id)
        SELECT s.doc_id,
               len(s.gs) AS n_shingles,
               coalesce(h.n_hits, 0) AS n_hits,
               round(CASE WHEN len(s.gs) = 0 THEN 0.0
                          ELSE CAST(coalesce(h.n_hits, 0) AS DOUBLE) / len(s.gs) END, 6)
                   AS contamination,
               (len(s.gs) > 0 AND
                CAST(coalesce(h.n_hits, 0) AS DOUBLE) / len(s.gs) > {DECON_FLAG_THRESHOLD})
                   AS flagged
        FROM sh s LEFT JOIN hits h USING (doc_id)
        WHERE s.doc_id % {EVAL_MOD} <> 0
        ORDER BY s.doc_id
    """,
    tags=("llm", "curation", "dedup"),
    doc=(
        "Benchmark decontamination: flag training documents sharing word "
        "n-grams with a held-out eval split (doc_id % 97 == 0 stands in for "
        "the benchmark corpus; production uses 8-13-grams — see EVAL_MOD/"
        "module constants). 100 TB design: the eval side is a benchmark "
        "suite — a few million distinct n-grams — so it broadcasts; the "
        "training side explodes shingles but the broadcast join + partial "
        "count happen inside the scan stage, so only (doc_id, count) "
        "partials ever shuffle. The corpus-sized side is touched once."
    ),
)
def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_tokens(table(spark, sf_dir, "documents"))
    sh = docs.select("doc_id", _shingles(F.col("t")).alias("gs"))
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_grams = (
        sh.filter(is_eval).select(F.explode("gs").alias("g")).distinct()
    )
    # one pass over the training pool: explode_outer keeps <3-token docs
    # (zero shingles) in the output; the broadcast LEFT join marks hits;
    # one groupBy counts shingles and hits together — no doc_id re-join
    exploded = sh.filter(~is_eval).select("doc_id", F.explode_outer("gs").alias("g"))
    marked = exploded.join(
        F.broadcast(eval_grams.withColumn("__hit", F.lit(1))), "g", "left"
    )
    agg = marked.groupBy("doc_id").agg(
        F.count("g").alias("n_shingles"),
        F.count("__hit").alias("n_hits"),
    )
    n_sh = F.col("n_shingles")
    contamination = F.when(n_sh == 0, F.lit(0.0)).otherwise(
        F.col("n_hits").cast("double") / n_sh
    )
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_hits",
        F.round(contamination, 6).alias("contamination"),
        ((n_sh > 0) & (contamination > DECON_FLAG_THRESHOLD)).alias("flagged"),
    )


def _top_token_share(t: Column) -> Column:
    """Share of the most frequent token. Computed as the longest equal-run
    in the SORTED token list via one linear fold — O(n log n + n) per
    document instead of the naive O(distinct × tokens) count-per-distinct
    (these lambdas run interpreted, so the constant factor matters: the
    naive form measured ~3× slower on this entry at sf0.1). The oracle
    states the same VALUE with the naive formulation — algorithm choice is
    engine-local, the max frequency is identical."""
    run = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))  # noqa: E731
    best = F.aggregate(
        F.array_sort(t),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("int").alias("run"),
            F.lit(0).cast("int").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return best.cast("double") / F.size(t)


@register(
    "docs_quality_filter",
    oracle=f"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        m AS (
            SELECT doc_id,
                   len(t) AS n_tokens,
                   CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS avg_len,
                   CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
                   CAST(list_max(list_transform(list_distinct(t),
                        u -> len(list_filter(t, x -> x = u)))) AS DOUBLE) / len(t) AS top_share,
                   len(list_filter(t, x -> x IN ({_sql_list(STOPWORDS['en'])}))) AS stop_hits
            FROM toks
        )
        SELECT doc_id,
               (n_tokens BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS}) AS ok_len,
               (avg_len BETWEEN {QF_MIN_AVG_LEN} AND {QF_MAX_AVG_LEN}) AS ok_word_len,
               (ttr >= {QF_MIN_TTR}) AS ok_diversity,
               (top_share <= {QF_MAX_TOP_SHARE}) AS ok_repetition,
               (stop_hits >= {QF_MIN_STOP_HITS}) AS ok_stopwords,
               ((n_tokens BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS})
                AND (avg_len BETWEEN {QF_MIN_AVG_LEN} AND {QF_MAX_AVG_LEN})
                AND ttr >= {QF_MIN_TTR}
                AND top_share <= {QF_MAX_TOP_SHARE}
                AND stop_hits >= {QF_MIN_STOP_HITS}) AS passes
        FROM m
        ORDER BY doc_id
    """,
    tags=("llm", "curation", "text"),
    doc=(
        "Gopher-style composite quality filter: five rule booleans (length "
        "bounds, mean word length, type-token ratio, top-token share, "
        "stopword presence) plus the conjunction. Pure narrow map over the "
        "scan — at 100 TB this runs at scan speed inside whole-stage "
        "codegen, and the boolean columns let the pipeline audit per-rule "
        "rejection rates with one follow-up aggregation."
    ),
)
def docs_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_tokens(table(spark, sf_dir, "documents"))
    t = F.col("t")
    n_tokens = F.size(t)
    # raw metrics behind a projection boundary FIRST: the folds/array ops
    # are interpreted (CodegenFallback), so referencing them from both the
    # rule boolean and the `passes` conjunction would evaluate each twice
    # (the _with_tokens lesson, same file)
    m = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (
            F.aggregate(F.transform(t, F.length), F.lit(0), lambda a, x: a + x).cast(
                "double"
            )
            / n_tokens
        ).alias("avg_len"),
        (F.size(F.array_distinct(t)).cast("double") / n_tokens).alias("ttr"),
        _top_token_share(t).alias("top_share"),
        F.size(F.filter(t, lambda x: x.isin(*STOPWORDS["en"]))).alias("stop_hits"),
    )
    ok_len = (F.col("n_tokens") >= QF_MIN_TOKENS) & (F.col("n_tokens") <= QF_MAX_TOKENS)
    ok_word_len = (F.col("avg_len") >= QF_MIN_AVG_LEN) & (F.col("avg_len") <= QF_MAX_AVG_LEN)
    ok_diversity = F.col("ttr") >= QF_MIN_TTR
    ok_repetition = F.col("top_share") <= QF_MAX_TOP_SHARE
    ok_stopwords = F.col("stop_hits") >= QF_MIN_STOP_HITS
    return m.select(
        "doc_id",
        ok_len.alias("ok_len"),
        ok_word_len.alias("ok_word_len"),
        ok_diversity.alias("ok_diversity"),
        ok_repetition.alias("ok_repetition"),
        ok_stopwords.alias("ok_stopwords"),
        (ok_len & ok_word_len & ok_diversity & ok_repetition & ok_stopwords).alias("passes"),
    )


@register(
    "docs_subword_tokens",
    oracle=f"""
        WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
        SELECT doc_id,
               len(t) AS n_tokens_ws,
               CAST(list_sum(list_transform(t,
                    w -> CAST(ceil(length(w) / {SUBWORD_CHARS}.0) AS BIGINT))) AS BIGINT)
                   AS n_tokens_subword,
               CAST(len(list_distinct(t)) AS BIGINT) AS n_unique,
               round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS type_token_ratio,
               round(CAST(length(text) AS DOUBLE) /
                     list_sum(list_transform(t,
                          w -> CAST(ceil(length(w) / {SUBWORD_CHARS}.0) AS BIGINT))), 6)
                   AS chars_per_subword
        FROM toks
        ORDER BY doc_id
    """,
    tags=("llm", "curation", "text"),
    doc=(
        "Subword token accounting: whitespace vs BPE-ish subword counts "
        "(ceil(len(word)/4) subwords per word), vocabulary size, type-token "
        "ratio, and chars-per-subword compression. The training-budget twin "
        "of text_stats' bytes/4 estimate — a corpus is priced in subword "
        "tokens, not words. Narrow map, no shuffle; the per-language corpus "
        "totals are one groupBy away (docs_mixture_report composes it)."
    ),
)
def docs_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_tokens(table(spark, sf_dir, "documents"), "text")
    t = F.col("t")
    # interpreted fold/array_distinct computed ONCE behind a projection
    # boundary, then referenced by the derived ratio columns
    m = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(t).cast("long").alias("n_tokens_ws"),
        F.aggregate(
            F.transform(t, lambda w: F.ceil(F.length(w) / SUBWORD_CHARS)),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("n_tokens_subword"),
        F.size(F.array_distinct(t)).cast("long").alias("n_unique"),
    )
    return m.select(
        "doc_id",
        "n_tokens_ws",
        "n_tokens_subword",
        "n_unique",
        F.round(F.col("n_unique").cast("double") / F.col("n_tokens_ws"), 6).alias(
            "type_token_ratio"
        ),
        F.round(F.col("n_chars").cast("double") / F.col("n_tokens_subword"), 6).alias(
            "chars_per_subword"
        ),
    )


@register(
    "docs_curation_pipeline",
    oracle=None,  # composed below from the three stage oracles
    tags=("llm", "curation", "composite"),
    doc=(
        "The end-to-end curation pipeline as ONE composed plan: quality "
        "filter (passes) ∧ decontamination (not flagged, eval split "
        "excluded) ∧ near-dup survivor election (kept), reported as the "
        "final corpus's per-language document/token mixture. This is what "
        "a training-data team actually ships — the stage entries are its "
        "unit tests. Composition is doc_id semi-joins of the stage "
        "outputs (each stage's verdict column), so Catalyst plans the "
        "whole pipeline together; at 100 TB the verdict frames are "
        "key+boolean only and the corpus text is scanned once for the "
        "final token count."
    ),
)
def docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    from currency_etl_spark.queries.llm_ops import docs_dedup_survivors

    docs = table(spark, sf_dir, "documents")
    qf = docs_quality_filter(spark, sf_dir).filter("passes").select("doc_id")
    dc = (
        docs_decontaminate(spark, sf_dir)
        .filter(~F.col("flagged"))
        .select("doc_id")
    )
    sv = docs_dedup_survivors(spark, sf_dir).filter("kept").select("doc_id")
    base = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    kept = base.join(qf, "doc_id").join(dc, "doc_id").join(sv, "doc_id")
    agg = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    total = F.sum("n_docs").over(_W.partitionBy())
    return agg.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs").cast("double") / total, 6).alias("doc_share"),
    )


# single source of truth: the pipeline oracle wraps the three stage
# oracles as derived tables (decontamination's training-split restriction
# also excludes the eval docs from the final corpus)
from currency_etl_spark.catalog import CATALOG as _CATALOG  # noqa: E402

_CATALOG["docs_curation_pipeline"].oracle = f"""
    WITH qf AS ({_CATALOG["docs_quality_filter"].oracle}),
    dc AS ({_CATALOG["docs_decontaminate"].oracle}),
    sv AS ({_CATALOG["docs_dedup_survivors"].oracle}),
    kept AS (
        SELECT d.doc_id, d.lang, len(string_split(d.text, ' ')) AS n_tokens
        FROM documents d
        JOIN qf ON d.doc_id = qf.doc_id AND qf.passes
        JOIN dc ON d.doc_id = dc.doc_id AND NOT dc.flagged
        JOIN sv ON d.doc_id = sv.doc_id AND sv.kept
    ),
    agg AS (
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM kept GROUP BY lang
    )
    SELECT lang, n_docs, n_tokens,
           round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS doc_share
    FROM agg
    ORDER BY lang
"""


@register(
    "docs_source_token_divergence",
    oracle="""
        WITH toks AS (
            SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        csw AS (
            SELECT source, w, count(*) AS c_sw FROM toks
            WHERE w <> '' GROUP BY source, w
        ),
        ns AS (SELECT source, sum(c_sw) AS n_s FROM csw GROUP BY source),
        cw AS (SELECT w, sum(c_sw) AS c_w FROM csw GROUP BY w),
        tot AS (SELECT sum(c_w) AS n_total FROM cw),
        scored AS (
            SELECT csw.source, csw.w, ns.n_s,
                   CAST(round((CAST(csw.c_sw AS DOUBLE) / ns.n_s
                               - CAST(cw.c_w AS DOUBLE) / tot.n_total)
                              * 1000000000000) AS BIGINT) AS diff_q,
                   CAST(round(CAST(cw.c_w AS DOUBLE) / tot.n_total
                              * 1000000000000) AS BIGINT) AS cw_q
            FROM csw
            JOIN cw ON csw.w = cw.w
            JOIN ns ON csw.source = ns.source
            CROSS JOIN tot
        ),
        agg AS (
            SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
                   sum(abs(diff_q))
                   + greatest(1000000000000 - sum(cw_q), 0) AS sabs
            FROM scored GROUP BY source
        ),
        topw AS (
            SELECT source, w, diff_q,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY diff_q DESC, w) AS rn
            FROM scored
        )
        SELECT a.source AS source, a.n_tokens,
               round(CAST(a.sabs AS DOUBLE) / 2 / 1000000000000, 6) AS tv_dist,
               t.w AS top_word,
               round(CAST(t.diff_q AS DOUBLE) / 1000000000000, 6) AS top_excess
        FROM agg a JOIN topw t ON a.source = t.source AND t.rn = 1
        ORDER BY a.source
    """,
    tags=("curation", "mixture", "divergence"),
    doc=(
        "Corpus-mixture drift diagnostic: per-source total-variation "
        "distance between the source's token distribution and the "
        "corpus-wide distribution, plus each source's most over-"
        "represented token. This is the monitoring primitive behind "
        "mixture rebalancing — a source whose TV distance jumps between "
        "snapshots changed its content mix. Scale shape: the TV mass of "
        "words ABSENT from a source has the closed form "
        "1 - sum(c_w/N over the source's present words), so the plan "
        "never densifies a |sources|x|vocab| grid and never broadcasts "
        "the vocabulary — it keeps only the existing (source, word) "
        "pairs and shuffle-joins them with the per-word corpus counts on "
        "the word key (round-5 advice: the previous grid + vocab "
        "broadcast would exhaust memory on an unbounded vocab). Per-word "
        "probability deltas are 1e12-quantized to int64 before the "
        "cross-word fold, so the TV sum is exact and partition-order-"
        "independent in both engines; the absent-mass term uses the same "
        "quantization (1e12 - sum of quantized present corpus mass, "
        "clamped at 0). The top word is always a present word: absent "
        "words have strictly negative excess while each source's max "
        "present excess is >= 0."
    ),
)
def docs_source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    # the (source, word) frequency grid is vocab-sized and feeds FOUR
    # references (per-source totals, word totals → grand total, and the
    # scoring join) — unmaterialized, each re-ran the documents scan +
    # token explode + groupBy (r16 plan audit: 8 parquet scans → 1; the
    # downstream agg/top-word branches then re-read checkpoint blocks,
    # not parquet)
    from currency_etl_spark.operators.ckpt import swap_checkpoint

    csw = swap_checkpoint(
        "tokdiv_csw",
        toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_sw")),
    )
    ns = csw.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    cw = csw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    tot = cw.agg(F.sum("c_w").alias("n_total"))
    # Present pairs only: shuffle-join on the word key (vocab-sized, NOT
    # broadcast); ns is |sources| rows and tot is 1 row, both broadcast.
    joined = (
        csw.join(cw, "w")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
    )
    diff_q = F.round(
        (
            F.col("c_sw").cast("double") / F.col("n_s")
            - F.col("c_w").cast("double") / F.col("n_total")
        )
        * 1000000000000
    ).cast("long")
    cw_q = F.round(
        F.col("c_w").cast("double") / F.col("n_total") * 1000000000000
    ).cast("long")
    scored = joined.select(
        "source", "w", "n_s", diff_q.alias("diff_q"), cw_q.alias("cw_q")
    )
    agg = scored.groupBy("source").agg(
        F.max("n_s").cast("long").alias("n_tokens"),
        (
            F.sum(F.abs(F.col("diff_q")))
            + F.greatest(
                F.lit(1000000000000) - F.sum("cw_q"), F.lit(0).cast("long")
            )
        ).alias("sabs"),
    )
    topw = scored.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("source").orderBy(F.desc("diff_q"), "w")),
    ).where(F.col("rn") == 1)
    return (
        agg.join(topw, "source")
        .select(
            "source",
            "n_tokens",
            F.round(F.col("sabs").cast("double") / 2 / 1000000000000, 6).alias(
                "tv_dist"
            ),
            F.col("w").alias("top_word"),
            F.round(F.col("diff_q").cast("double") / 1000000000000, 6).alias(
                "top_excess"
            ),
        )
        .orderBy("source")
    )


#: k-anonymity threshold: quasi-identifier groups smaller than this are
#: re-identification risks (the conventional k=5 release bar).
K_ANON_MIN = 5


@register(
    "customers_k_anonymity",
    oracle=f"""
        WITH qi AS (
            SELECT c_custkey, c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
            FROM customer
        ),
        grp AS (
            SELECT c_nationkey, c_mktsegment, bal_band,
                   count(*) AS group_size
            FROM qi GROUP BY 1, 2, 3
        )
        SELECT CAST(group_size AS BIGINT) AS group_size,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(group_size) AS BIGINT) AS n_customers,
               CAST(CASE WHEN group_size < {K_ANON_MIN} THEN 1 ELSE 0 END AS BIGINT)
                   AS at_risk
        FROM grp
        GROUP BY group_size
        ORDER BY group_size
    """,
    tags=("governance", "privacy", "audit"),
    doc=(
        "k-anonymity audit over the customer dimension — the release-"
        "governance counterpart of docs_pii_scrub (cell-level redaction) "
        "and customers_pseudonymize_audit (identifier hashing): how many "
        "people share each quasi-identifier combination (nation × market "
        "segment × $1000 balance band)? Rows in groups smaller than "
        f"k={K_ANON_MIN} are re-identification risks the release process "
        "must suppress or generalize, and this histogram is what a "
        "privacy review reads to pick the generalization grain. Shape at "
        "100 TB: one shuffle on the narrow QI tuple, then an 11-ish-group "
        "rollup on the group size — no row-level data ever leaves the "
        "executors, and the band expression (floor(bal/1000), identical "
        "IEEE op in both engines) is the only derived column."
    ),
)
def customers_k_anonymity(
    spark: SparkSession, sf_dir: str, *, k: int = K_ANON_MIN
) -> DataFrame:
    """Graded default is the module constant; ``k`` is the release
    process's anonymity threshold (groups below k flag at_risk)."""
    cust = table(spark, sf_dir, "customer")
    grp = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    return (
        grp.groupBy("group_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("group_size").cast("long").alias("n_customers"),
        )
        .select(
            F.col("group_size").cast("long").alias("group_size"),
            "n_groups",
            "n_customers",
            F.when(F.col("group_size") < k, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("at_risk"),
        )
        .orderBy("group_size")
    )


@register(
    "docs_quality_calibration",
    oracle=None,  # composed below from the quality-filter + decontaminate oracles
    tags=("llm", "curation", "calibration", "dedup"),
    doc=(
        "Quality-classifier calibration — the reliability table that "
        "completes curation's evaluation loop the way dedup_lsh_recall "
        "completes dedup's: bucket the training pool by the quality "
        "filter's discrete score (rules_passed, 0-5 — the five Gopher "
        "rule booleans summed; the filter's natural score axis, each "
        "value its own bin) and report, per bin, the OBSERVED bad-data "
        "rates the filter is supposed to predict — near-duplicate rate "
        "(docs_dedup_survivors.kept = false: the doc loses the MinHash "
        "survivor election to a clustermate; exact md5 duplicates are "
        "absent from the graded SFs, so the near-dup label is the one "
        "with signal) and benchmark-contamination rate "
        "(docs_decontaminate's flag), plus the mean contamination level. "
        "If the filter is calibrated, dup/contam "
        "rates fall as rules_passed rises — this table is the evidence a "
        "pipeline needs BEFORE trusting the passes bit to gate a 100 TB "
        "crawl. Scale shape: three doc-keyed relations (rule booleans, "
        "survivor flags — read from the memoized dedup-family bases, not "
        "recomputed — and contamination flags) equi-joined on doc_id "
        "and collapsed to a <=6-row histogram; the only corpus-sized "
        "shuffles carry (doc_id, booleans) — never "
        "text. Numerics: per-doc contamination is already quantized to "
        "1e-6, so the bin mean sums exact 1e6-lattice integers before "
        "one double division (engine-identical)."
    ),
)
def docs_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from currency_etl_spark.queries.llm_ops import docs_dedup_survivors

    qf = docs_quality_filter(spark, sf_dir)
    score = sum(
        F.col(c).cast("int")
        for c in ("ok_len", "ok_word_len", "ok_diversity", "ok_repetition", "ok_stopwords")
    )
    binned = qf.select("doc_id", score.cast("long").alias("rules_passed"))
    dc = docs_decontaminate(spark, sf_dir).select(
        "doc_id",
        F.col("flagged").cast("int").alias("contam"),
        F.round(F.col("contamination") * 1e6).cast("long").alias("cq"),
    )
    isdup = docs_dedup_survivors(spark, sf_dir).select(
        "doc_id", (~F.col("kept")).cast("int").alias("is_dup")
    )
    j = binned.join(dc, "doc_id").join(isdup, "doc_id")
    n = F.count(F.lit(1))
    return (
        j.groupBy("rules_passed")
        .agg(
            n.cast("long").alias("n_docs"),
            F.sum("is_dup").cast("long").alias("n_dups"),
            F.round(F.sum("is_dup").cast("double") / n, 6).alias("dup_rate"),
            F.sum("contam").cast("long").alias("n_contaminated"),
            F.round(F.sum("contam").cast("double") / n, 6).alias("contam_rate"),
            F.round(F.sum("cq").cast("double") / n / 1e6, 6).alias("mean_contamination"),
        )
        .orderBy("rules_passed")
    )


# single source of truth: the calibration oracle wraps the three stage
# oracles as derived tables (decontaminate's training-split restriction
# keeps eval docs out of the bins — they carry no labels to calibrate on)
_CATALOG["docs_quality_calibration"].oracle = f"""
    WITH qf AS ({_CATALOG["docs_quality_filter"].oracle}),
    dc AS ({_CATALOG["docs_decontaminate"].oracle}),
    dup AS (
        SELECT doc_id, CAST(NOT kept AS INT) AS is_dup
        FROM ({_CATALOG["docs_dedup_survivors"].oracle})
    ),
    j AS (
        SELECT CAST(CAST(qf.ok_len AS INT) + CAST(qf.ok_word_len AS INT)
                    + CAST(qf.ok_diversity AS INT) + CAST(qf.ok_repetition AS INT)
                    + CAST(qf.ok_stopwords AS INT) AS BIGINT) AS rules_passed,
               dup.is_dup,
               CAST(dc.flagged AS INT) AS contam,
               CAST(round(dc.contamination * 1000000) AS BIGINT) AS cq
        FROM qf
        JOIN dc ON dc.doc_id = qf.doc_id
        JOIN dup ON dup.doc_id = qf.doc_id
    )
    SELECT rules_passed,
           count(*) AS n_docs,
           CAST(sum(is_dup) AS BIGINT) AS n_dups,
           round(CAST(sum(is_dup) AS DOUBLE) / count(*), 6) AS dup_rate,
           CAST(sum(contam) AS BIGINT) AS n_contaminated,
           round(CAST(sum(contam) AS DOUBLE) / count(*), 6) AS contam_rate,
           round(CAST(sum(cq) AS DOUBLE) / count(*) / 1000000, 6) AS mean_contamination
    FROM j GROUP BY rules_passed ORDER BY rules_passed
"""


#: l-diversity threshold: quasi-identifier groups whose released
#: sensitive attribute takes fewer than this many distinct values allow
#: attribute disclosure even when k-anonymity holds (the conventional
#: l=3 bar).
L_DIV_MIN = 3


def _release_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The released (QI, sensitive) relation SHARED by the privacy-audit
    ladder (l-diversity, t-closeness): the k-audit's quasi-identifier
    grain (nation × market segment × $1000 balance band) plus each
    customer's latest-order priority as the sensitive attribute
    (deterministic argmax via max(struct(date, key, prio)) —
    bit-identical to the oracles' ROW_NUMBER(ORDER BY date DESC, key
    DESC) = 1 because (date, key) is unique per customer; customers
    without orders release 'NONE'). Single definition so the ladder's
    rungs can never audit two different releases."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    latest = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(
                F.struct("o_orderdate", "o_orderkey", "o_orderpriority")
            ).alias("m")
        )
        .select("o_custkey", F.col("m.o_orderpriority").alias("prio"))
    )
    return cust.join(
        latest, cust["c_custkey"] == latest["o_custkey"], "left"
    ).select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        # cast pins the release's sensitive type: an empty/all-null orders
        # side would otherwise let coalesce resolve to prio's inferred type
        # and re-type the 'NONE' literal (CAST_INVALID_INPUT under ANSI).
        F.coalesce(F.col("prio").cast("string"), F.lit("NONE")).alias("sensitive"),
    )


@register(
    "customers_l_diversity",
    oracle=f"""
        WITH latest AS (
            SELECT o_custkey, o_orderpriority,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        ),
        rel AS (
            SELECT c.c_nationkey, c.c_mktsegment,
                   CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_band,
                   coalesce(l.o_orderpriority, 'NONE') AS sensitive
            FROM customer c
            LEFT JOIN (SELECT o_custkey, o_orderpriority FROM latest WHERE rn = 1) l
              ON l.o_custkey = c.c_custkey
        ),
        grp AS (
            SELECT c_nationkey, c_mktsegment, bal_band,
                   CAST(count(DISTINCT sensitive) AS BIGINT) AS l,
                   count(*) AS group_size
            FROM rel GROUP BY 1, 2, 3
        )
        SELECT l,
               count(*) AS n_groups,
               CAST(sum(group_size) AS BIGINT) AS n_customers,
               CAST(CASE WHEN l < {L_DIV_MIN} THEN 1 ELSE 0 END AS BIGINT) AS at_risk
        FROM grp GROUP BY l ORDER BY l
    """,
    tags=("privacy", "governance", "curation"),
    doc=(
        "l-diversity release audit — the attribute-disclosure rung beside "
        "customers_k_anonymity's identity-disclosure one (Machanavajjhala "
        "et al. 2007): even a k-anonymous quasi-identifier group leaks "
        "the sensitive column when every member shares one value. Same "
        "QI grain as the k-audit (nation × market segment × $1000 "
        "balance band); the released sensitive attribute is each "
        "customer's latest-order priority (deterministic argmax: "
        "orderdate then orderkey; customers without orders release "
        "'NONE'). Per QI group l = count(distinct sensitive); output is "
        "the l-histogram with group/customer counts and the at_risk flag "
        "below l=3 — read together with the k-table to pick the "
        "generalization grain. Scale shape: one custkey-partitioned "
        "window over orders (bounded per customer), one narrow-QI "
        "shuffle, a distinct-count rollup, and a <=6-row histogram; no "
        "row-level data leaves the executors. "
        "The latest-order election is max(struct(date, key, priority)) "
        "on the Spark side — bit-identical to the oracle's "
        "ROW_NUMBER(ORDER BY date DESC, key DESC) = 1 because (date, "
        "key) is unique per customer."
    ),
)
def customers_l_diversity(
    spark: SparkSession, sf_dir: str, *, l_min: int = L_DIV_MIN
) -> DataFrame:
    """Graded default is the module constant; ``l_min`` is the release
    process's diversity threshold (groups below it flag at_risk)."""
    rel = _release_relation(spark, sf_dir)
    grp = rel.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.countDistinct("sensitive").cast("long").alias("l"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        grp.groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("group_size").cast("long").alias("n_customers"),
        )
        .select(
            "l",
            "n_groups",
            "n_customers",
            F.when(F.col("l") < l_min, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("at_risk"),
        )
        .orderBy("l")
    )


#: t-closeness threshold: quasi-identifier groups whose released
#: sensitive-value distribution sits further than this (total-variation
#: distance) from the global distribution leak attribute information
#: even when k-anonymity AND l-diversity hold (a skewed-but-diverse
#: group still tells the attacker a lot). Bands are tenths of t, so the
#: conventional 0.5 bar is band >= 5.
T_CLOSE_MAX = 0.5


@register(
    "customers_t_closeness",
    oracle=f"""
        WITH latest AS (
            SELECT o_custkey, o_orderpriority,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        ),
        rel AS (
            SELECT c.c_nationkey, c.c_mktsegment,
                   CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_band,
                   coalesce(l.o_orderpriority, 'NONE') AS sensitive
            FROM customer c
            LEFT JOIN (SELECT o_custkey, o_orderpriority FROM latest WHERE rn = 1) l
              ON l.o_custkey = c.c_custkey
        ),
        gs AS (
            SELECT c_nationkey, c_mktsegment, bal_band, sensitive,
                   CAST(count(*) AS BIGINT) AS c_gs
            FROM rel GROUP BY 1, 2, 3, 4
        ),
        gd AS (
            SELECT sensitive, CAST(sum(c_gs) AS BIGINT) AS c_s
            FROM gs GROUP BY sensitive
        ),
        tot AS (SELECT CAST(sum(c_s) AS BIGINT) AS n FROM gd),
        grp AS (
            SELECT c_nationkey, c_mktsegment, bal_band,
                   CAST(sum(c_gs) AS BIGINT) AS n_g
            FROM gs GROUP BY 1, 2, 3
        ),
        pres AS (
            SELECT gs.c_nationkey, gs.c_mktsegment, gs.bal_band,
                   g.n_g, t.n,
                   CAST(sum(abs(gs.c_gs * t.n - gl.c_s * g.n_g)) AS BIGINT)
                       AS p_num,
                   CAST(sum(gl.c_s) AS BIGINT) AS p_cs
            FROM gs
            JOIN grp g ON g.c_nationkey = gs.c_nationkey
                      AND g.c_mktsegment = gs.c_mktsegment
                      AND g.bal_band = gs.bal_band
            JOIN gd gl ON gl.sensitive = gs.sensitive, tot t
            GROUP BY 1, 2, 3, 4, 5
        ),
        tv AS (
            SELECT n_g, n, p_num + n_g * (n - p_cs) AS num
            FROM pres
        ),
        banded AS (
            SELECT n_g,
                   (10 * num) // (2 * n_g * n) AS t_band,
                   round(CAST(num AS DOUBLE) / (2.0 * n_g * n), 6) AS t
            FROM tv
        )
        SELECT CAST(t_band AS BIGINT) AS t_band,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(n_g) AS BIGINT) AS n_customers,
               round(min(t), 6) AS t_min,
               round(max(t), 6) AS t_max,
               CAST(CASE WHEN t_band >= {int(round(T_CLOSE_MAX * 10))}
                         THEN 1 ELSE 0 END AS BIGINT) AS at_risk
        FROM banded
        GROUP BY t_band
        ORDER BY t_band
    """,
    tags=("privacy", "governance", "curation"),
    doc=(
        "t-closeness release audit — the third rung of the privacy "
        "ladder (Li et al. 2007), beside customers_k_anonymity (identity "
        "disclosure) and customers_l_diversity (attribute diversity): a "
        "QI group can be k-anonymous AND l-diverse yet still leak — if "
        "its sensitive-value DISTRIBUTION is far from the global one "
        "(e.g. 90% URGENT where the corpus runs 20%), membership alone "
        "shifts the attacker's posterior. Same released relation as the "
        "l-audit (single definition: _release_relation — QI = nation × "
        "market segment × $1000 balance band, sensitive = latest-order "
        "priority, 'NONE' for orderless customers); per group t = total-"
        "variation distance between the group's and the global sensitive "
        "distribution (the categorical EMD of the paper), reported as a "
        "tenth-of-t band histogram with group/customer counts, exact "
        "band-edge min/max, and the at_risk flag at the conventional "
        f"t={T_CLOSE_MAX} bar. Numerics: t is NEVER accumulated in "
        "floats — the numerator folds exact int64 cross products "
        "(|c_gs·n − c_s·n_g|, absent sensitive values contributing "
        "n_g·(n − Σ_present c_s) in closed form, so no value-grid join "
        "exists), the band is pure integer division (10·num div "
        "2·n_g·n), and the only doubles are one division per group, "
        "bit-identical across engines. Scale shape: the (QI, sensitive) "
        "count relation is built once (one narrow-QI shuffle over the "
        "release, checkpointed — three consumers, one build); the "
        "global distribution is a |priority-domain|-row broadcast, the "
        "per-group fold is group-sized, and the output is a <=10-row "
        "band histogram — row-level data never leaves the executors."
    ),
)
def customers_t_closeness(
    spark: SparkSession, sf_dir: str, *, t_max: float = T_CLOSE_MAX
) -> DataFrame:
    """Graded default is the module constant; ``t_max`` is the release
    process's closeness bar (bands at or above it flag at_risk)."""
    from currency_etl_spark.operators.ckpt import swap_checkpoint

    qi = ["c_nationkey", "c_mktsegment", "bal_band"]
    # one narrow-QI shuffle over the release, then three consumers
    # (global distribution, group sizes, the fold itself) read the
    # checkpointed count relation instead of re-scanning the release
    gs = swap_checkpoint(
        "tclose_gs",
        _release_relation(spark, sf_dir)
        .groupBy(*qi, "sensitive")
        .agg(F.count(F.lit(1)).cast("long").alias("c_gs")),
    )
    glob = gs.groupBy("sensitive").agg(F.sum("c_gs").cast("long").alias("c_s"))
    tot = glob.agg(F.sum("c_s").cast("long").alias("n"))
    grp = gs.groupBy(*qi).agg(F.sum("c_gs").cast("long").alias("n_g"))
    pres = (
        gs.join(F.broadcast(glob), "sensitive")  # priority domain: bounded
        .join(grp, qi)
        .crossJoin(F.broadcast(tot))
        .groupBy(*qi, "n_g", "n")
        .agg(
            F.sum(
                F.abs(F.col("c_gs") * F.col("n") - F.col("c_s") * F.col("n_g"))
            ).alias("p_num"),
            F.sum("c_s").alias("p_cs"),
        )
    )
    tv = pres.select(
        "n_g",
        "n",
        (F.col("p_num") + F.col("n_g") * (F.col("n") - F.col("p_cs"))).alias("num"),
    )
    banded = tv.select(
        "n_g",
        F.expr("(10 * num) div (2 * n_g * n)").alias("t_band"),
        F.round(
            F.col("num").cast("double") / (F.lit(2.0) * F.col("n_g") * F.col("n")),
            6,
        ).alias("t"),
    )
    band_bar = int(round(t_max * 10))
    return (
        banded.groupBy("t_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("n_g").cast("long").alias("n_customers"),
            F.round(F.min("t"), 6).alias("t_min"),
            F.round(F.max("t"), 6).alias("t_max"),
        )
        .select(
            F.col("t_band").cast("long").alias("t_band"),
            "n_groups",
            "n_customers",
            "t_min",
            "t_max",
            F.when(F.col("t_band") >= band_bar, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("at_risk"),
        )
        .orderBy("t_band")
    )
