"""Round-15c LLM training-data operators: CCNet-style perplexity
bucketing (head/middle/tail per language), the epochs-per-source plan
a temperature-scaled data mixture implies, and a from-scratch naive-
Bayes language classifier evaluated against the corpus labels.

Reference analog: none citable (the reference checkout is empty —
SURVEY.md §0); the recipes are public: CCNet's per-language
perplexity terciles (arXiv:1911.00359 §4.3), alpha-temperature
mixture sampling with epoch accounting (arXiv:1901.07291 §3.1 plus
the data-recipe practice of quoting epochs per source), and
multinomial naive Bayes with add-one smoothing (Manning et al., IIR
ch. 13).

Determinism doctrine: every ln() term is floor-quantized to integer
micro units BEFORE any sum (house precedent text_bigram_lm /
agg_entropy — only ln itself must agree across engines, which the
graded hash matches prove); sqrt goes through the milli quantization
pipe_sampling_temperature established; all divisions are integer
floor divisions of POSITIVE operands (Spark `div` truncates toward
zero while DuckDB `//` floors, so negative integer division is
banned repo-wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- CCNet perplexity buckets ----------------------------------------------------

_PPL_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
),
uni AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY token
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
doc_ce AS (
  SELECT t.doc_id, t.lang,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(-SUM(CAST(floor(ln(CAST(u.c AS DOUBLE) / tot.n) * 1000000.0
                              + 0.5) AS BIGINT)) AS BIGINT) AS ce_micro
  FROM tok t JOIN uni u ON t.token = u.token CROSS JOIN tot
  GROUP BY t.doc_id, t.lang
),
scored AS (
  SELECT doc_id, lang,
         CAST((ce_micro * 1000) // (n_tok * 1000000) AS BIGINT)
             AS doc_ce_milli,
         NTILE(3) OVER (
             PARTITION BY lang
             ORDER BY (ce_micro * 1000) // (n_tok * 1000000), doc_id
         ) AS tercile
  FROM doc_ce
)
SELECT lang,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_ce_milli) AS BIGINT) AS sum_ce_milli,
       CAST(MIN(doc_ce_milli) AS BIGINT) AS min_ce_milli,
       CAST(MAX(doc_ce_milli) AS BIGINT) AS max_ce_milli
FROM scored GROUP BY lang, tercile
"""


@register("pipe_perplexity_bucket", oracle=_PPL_ORACLE)
def q_pipe_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-STYLE PERPLEXITY BUCKETS: score every document's unigram
    cross-entropy against the corpus's own token distribution, then
    split each language into HEAD / MIDDLE / TAIL terciles — the
    exact shape of CCNet's quality tiers (head = most fluent under
    the LM, tail = first to drop when the token budget tightens).
    Complements [[text_bigram_lm]] (raw per-doc score) with the
    per-language bucket assignment a curation pipeline consumes.

    Per-doc cross-entropy is Σ −ln p(token) with every ln term
    floor-quantized to micro units BEFORE summation; the per-token
    mean is an integer floor division of positive operands; tercile
    assignment is NTILE(3) ordered by (ce, doc_id) — every bucket
    boundary is therefore bit-portable, and the grade pins the whole
    assignment via per-bucket count + sum + extrema.

    Scale: the unigram table is vocabulary-bounded (broadcast-or-
    bucketed dim at 100 TB); scoring is one equi-join + groupBy;
    NTILE partitions by language — bounded cardinality, so each
    window task handles one language's docs (for a single-language
    corpus, swap in helpers.dist_row_number + bucketing by rank
    ranges, the [[pipe_epoch_shuffle]] pattern).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    doc_ce = (
        tok.join(uni, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            (
                -F.sum(
                    F.floor(
                        F.log(F.col("c").cast("double") / F.col("n"))
                        * 1000000.0
                        + 0.5
                    ).cast("bigint")
                )
            )
            .cast("bigint")
            .alias("ce_micro"),
        )
    )
    scored = doc_ce.select(
        "doc_id",
        "lang",
        F.expr("(ce_micro * 1000) div (n_tok * 1000000)")
        .cast("bigint")
        .alias("doc_ce_milli"),
    )
    w = Window.partitionBy("lang").orderBy("doc_ce_milli", "doc_id")
    return (
        scored.withColumn("tercile", F.ntile(3).over(w))
        .groupBy(
            "lang",
            F.when(F.col("tercile") == 1, "head")
            .when(F.col("tercile") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_ce_milli").cast("bigint").alias("sum_ce_milli"),
            F.min("doc_ce_milli").cast("bigint").alias("min_ce_milli"),
            F.max("doc_ce_milli").cast("bigint").alias("max_ce_milli"),
        )
    )


# --- mixture epoch plan ------------------------------------------------------------

_EPOCH_BUDGET_X = 2  # token budget = 2× the corpus (forces over-epochs)

_EPOCH_ORACLE = f"""
WITH per_src AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> ''))) AS BIGINT) AS n_tok
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_tok,
         CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1000 + 0.5) AS BIGINT)
             AS s_milli
  FROM per_src
),
tot AS (
  SELECT CAST(SUM(s_milli) AS BIGINT) AS s_all,
         CAST(SUM(n_tok) AS BIGINT) AS tok_all
  FROM w
)
SELECT w.source, w.n_tok,
       CAST((w.s_milli * 1000000) // tot.s_all AS BIGINT) AS weight_ppm,
       CAST((tot.tok_all * {_EPOCH_BUDGET_X} *
             ((w.s_milli * 1000000) // tot.s_all)) // 1000000 AS BIGINT)
           AS planned_tok,
       CAST(((tot.tok_all * {_EPOCH_BUDGET_X} *
              ((w.s_milli * 1000000) // tot.s_all)) // 1000000 * 1000)
            // w.n_tok AS BIGINT) AS epochs_milli
FROM w, tot
"""


@register("pipe_mixture_epoch_plan", oracle=_EPOCH_ORACLE)
def q_pipe_mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIXTURE → EPOCH PLAN: turn alpha=0.5 temperature weights over
    the per-source token counts into the number Llama-style data
    recipes actually quote — EPOCHS PER SOURCE under a fixed training
    budget ({x}× the corpus here). Upsampled sources read epochs >
    1000 milli (repeated data — the overfitting risk the recipe
    reviews), downsampled ones < 1000. Completes the chain:
    [[pipe_sampling_temperature]] derives weights,
    [[pipe_tokenizer_fertility]] prices the tokens, this key converts
    both into the sampler's schedule.

    Integer doctrine end to end: sqrt milli-quantized (IEEE-identical
    in both engines), weights as exact ppm floor divisions, planned
    tokens and epoch millis as nested floor divisions of positive
    BIGINTs — the oracle reproduces the schedule bit-for-bit.

    Scale: one groupBy(source) over the corpus plus arithmetic on a
    source-count-sized frame; the budget knob never changes the plan
    shape.
    """.format(x=_EPOCH_BUDGET_X)
    d = load_table(spark, sf_dir, "documents")
    words = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    )
    per_src = (
        d.select("source", words.alias("w"))
        .groupBy("source")
        .agg(F.sum("w").cast("bigint").alias("n_tok"))
        .withColumn(
            "s_milli",
            F.floor(F.sqrt(F.col("n_tok").cast("double")) * 1000 + F.lit(0.5))
            .cast("bigint"),
        )
    )
    tot = per_src.agg(
        F.sum("s_milli").cast("bigint").alias("s_all"),
        F.sum("n_tok").cast("bigint").alias("tok_all"),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .withColumn(
            "weight_ppm",
            F.expr("(s_milli * 1000000) div s_all").cast("bigint"),
        )
        .withColumn(
            "planned_tok",
            F.expr(
                f"(tok_all * {_EPOCH_BUDGET_X} * weight_ppm) div 1000000"
            ).cast("bigint"),
        )
        .withColumn(
            "epochs_milli",
            F.expr("(planned_tok * 1000) div n_tok").cast("bigint"),
        )
        .select(
            "source", "n_tok", "weight_ppm", "planned_tok", "epochs_milli"
        )
    )


# --- naive-Bayes language classifier ------------------------------------------------

_NB_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
),
langs AS (SELECT DISTINCT lang AS cand FROM documents),
lt AS (
  SELECT lang AS cand, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY lang, token
),
lsz AS (
  SELECT lang AS cand, CAST(COUNT(*) AS BIGINT) AS n_l
  FROM tok GROUP BY lang
),
v AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab FROM tok),
prior AS (
  SELECT lang AS cand,
         CAST(floor(ln(CAST(COUNT(*) AS DOUBLE)
                       / (SELECT COUNT(*) FROM documents)) * 1000000.0
                    + 0.5) AS BIGINT) AS lp
  FROM documents GROUP BY lang
),
scores AS (
  SELECT t.doc_id, t.lang, l.cand,
         CAST(SUM(CAST(floor(ln((COALESCE(lt.c, 0) + 1.0)
                                / (lsz.n_l + v.vocab)) * 1000000.0 + 0.5)
                       AS BIGINT)) AS BIGINT) + MIN(p.lp) AS score
  FROM tok t
  CROSS JOIN langs l
  LEFT JOIN lt ON lt.cand = l.cand AND lt.token = t.token
  JOIN lsz ON lsz.cand = l.cand
  CROSS JOIN v
  JOIN prior p ON p.cand = l.cand
  GROUP BY t.doc_id, t.lang, l.cand
),
pred AS (
  SELECT doc_id, lang, cand FROM (
    SELECT doc_id, lang, cand,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, cand
           ) AS rn
    FROM scores
  ) WHERE rn = 1
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cand = lang THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct
FROM pred GROUP BY lang
"""


@register("ml_naive_bayes_classifier", oracle=_NB_ORACLE)
def q_ml_naive_bayes_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTINOMIAL NAIVE BAYES text classification, trained and
    evaluated in one relational plan: per-class unigram likelihoods
    with add-one smoothing plus a document-frequency prior, each
    document classified by arg max Σ ln p(token|class) + ln p(class),
    scored against the corpus's `lang` labels — a from-scratch
    generative classifier beside the heuristic [[text_langid]] and
    MLlib's [[ml_rf_train]] family, expressed entirely in joins and
    aggregates (training IS a groupBy; inference IS a join).

    Every ln term is micro-quantized before the per-(doc, candidate)
    sum, the prior is one quantized term, and the argmax breaks ties
    by candidate name — the oracle reproduces each document's
    posterior ranking exactly. Honesty note: the synthetic corpus
    draws every label's text from ONE shared vocabulary, so the label
    is not unigram-separable and resubstitution accuracy is prior-
    dominated by construction (measured ≈47% overall at sf0.01,
    majority class 43.6%) — the grade pins the classifier's MECHANICS
    (counts, smoothing, posterior argmax), which is what transfers to
    a real corpus.

    Scale: the likelihood table is (lang × vocab) — dimension-sized,
    broadcastable; scoring joins the token stream against it once per
    candidate language (bounded fan-out); the argmax is a bounded
    window per document. No iteration — naive Bayes training is
    closed-form counting, which is why it fits a pure SQL plan.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    langs = d.select(F.col("lang").alias("cand")).distinct()
    lt = tok.groupBy(F.col("lang").alias("cand"), "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    lsz = tok.groupBy(F.col("lang").alias("cand")).agg(
        F.count(F.lit(1)).alias("n_l")
    )
    vocab = tok.agg(F.count_distinct("token").alias("vocab"))
    n_docs = d.count()
    prior = (
        d.groupBy(F.col("lang").alias("cand"))
        .agg(F.count(F.lit(1)).alias("nd"))
        .select(
            "cand",
            F.floor(
                F.log(F.col("nd").cast("double") / F.lit(float(n_docs)))
                * 1000000.0
                + 0.5
            )
            .cast("bigint")
            .alias("lp"),
        )
    )
    scores = (
        tok.crossJoin(F.broadcast(langs))
        .join(F.broadcast(lt), ["cand", "token"], "left")
        .join(F.broadcast(lsz), "cand")
        .crossJoin(F.broadcast(vocab))
        .join(F.broadcast(prior), "cand")
        .groupBy("doc_id", "lang", "cand")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.log(
                            (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                            / (F.col("n_l") + F.col("vocab"))
                        )
                        * 1000000.0
                        + 0.5
                    ).cast("bigint")
                )
                + F.min("lp")
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand")
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "cand")
    )
    return pred.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("cand") == F.col("lang"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
    )
