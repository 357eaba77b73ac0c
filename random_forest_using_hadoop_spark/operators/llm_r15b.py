"""Round-15b LLM training-data pipeline operators: SFT chat-template
assembly with loss-mask accounting, temperature-scaled mixture
sampling weights, and the count-threshold n-gram LM pruning curve.

Reference analog: none citable (the reference checkout is empty —
SURVEY.md §0); the semantics are the standard public recipes:
instruction-tuning formatting with prompt-loss masking (T5/FLAN-style
SFT), alpha-temperature language sampling (multilingual pretraining,
arXiv:1901.07291 §3.1), and count-threshold n-gram pruning (what KenLM
build pipelines do to bound model size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table
from random_forest_using_hadoop_spark.helpers import local_rows

# --- SFT chat-template assembly + loss-mask manifest ---------------------------

_SYS = "<|system|>You are a helpful assistant.<|user|>"
_ASST = "<|assistant|>"
_END = "<|end|>"

_SFT_ORACLE = f"""
WITH ex AS (
  SELECT lang,
         substr(text, 1, GREATEST(1, CAST(floor(length(text) / 3) AS INT)))
             AS prompt,
         substr(text,
                GREATEST(1, CAST(floor(length(text) / 3) AS INT)) + 1)
             AS resp
  FROM documents
),
fmt AS (
  SELECT lang,
         '{_SYS}' || prompt || '{_ASST}' || resp || '{_END}' AS formatted,
         CAST(length('{_SYS}') + length(prompt) + length('{_ASST}')
              AS BIGINT) AS masked_chars,
         CAST(length(resp) + length('{_END}') AS BIGINT) AS trained_chars
  FROM ex
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_examples,
       CAST(SUM(length(formatted)) AS BIGINT) AS total_chars,
       CAST(SUM(masked_chars) AS BIGINT) AS masked_chars,
       CAST(SUM(trained_chars) AS BIGINT) AS trained_chars,
       CAST(bit_xor(('0x' || substr(md5(formatted), 1, 15))::BIGINT)
            AS BIGINT) AS checksum_xor
FROM fmt
GROUP BY lang
"""


@register("pipe_sft_pack_mask", oracle=_SFT_ORACLE)
def q_pipe_sft_pack_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT FORMATTING + LOSS MASKING: assemble each document into a
    chat-templated training example (system + user prompt = the first
    third of the text, assistant response = the rest) and account the
    loss mask — everything through the end of the assistant tag is
    MASKED (prompt tokens carry no gradient), the response + end tag
    is TRAINED. The per-lang manifest carries example counts, char
    budgets on both sides of the mask, and an order-independent
    60-bit md5 XOR checksum of the exact formatted strings — two
    pipelines (or two engines) agree on the checksum iff they produce
    byte-identical training examples, the property an SFT data job
    must guarantee before tokens ever reach a trainer.

    Every quantity is computed from length() arithmetic on the same
    template constants on both engines; the mask boundary is
    masked = len(system block) + len(prompt) + len(assistant tag),
    trained = len(response) + len(end tag), and
    masked + trained == len(formatted) by construction.

    Scale: stateless per-row projection (no shuffle until the 5-key
    lang rollup, which partial-aggregates map-side); the checksum
    replaces any collect-and-compare of example text.
    """
    d = load_table(spark, sf_dir, "documents")
    ex = d.select(
        "lang",
        F.expr(
            "substring(text, 1, greatest(1, cast(floor(length(text)/3) "
            "as int)))"
        ).alias("prompt"),
        F.expr(
            "substring(text, greatest(1, cast(floor(length(text)/3) "
            "as int)) + 1)"
        ).alias("resp"),
    )
    fmt = ex.select(
        "lang",
        F.concat(
            F.lit(_SYS), F.col("prompt"), F.lit(_ASST), F.col("resp"),
            F.lit(_END),
        ).alias("formatted"),
        (
            F.lit(len(_SYS)) + F.length("prompt") + F.lit(len(_ASST))
        ).cast("bigint").alias("masked_chars"),
        (F.length("resp") + F.lit(len(_END))).cast("bigint").alias(
            "trained_chars"
        ),
    )
    return fmt.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_examples"),
        F.sum(F.length("formatted")).cast("bigint").alias("total_chars"),
        F.sum("masked_chars").cast("bigint").alias("masked_chars"),
        F.sum("trained_chars").cast("bigint").alias("trained_chars"),
        F.expr(
            "cast(bit_xor(cast(conv(substring(md5(formatted), 1, 15), "
            "16, 10) as bigint)) as bigint)"
        ).alias("checksum_xor"),
    )


# --- temperature-scaled mixture sampling weights -------------------------------

_TEMP_ORACLE = """
WITH tok AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
per_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens
  FROM tok GROUP BY lang
),
scaled AS (
  SELECT lang, n_docs, lang_tokens,
         CAST(floor(sqrt(CAST(lang_tokens AS DOUBLE)) * 1000.0 + 0.5)
              AS BIGINT) AS ir
  FROM per_lang
)
SELECT lang, n_docs, lang_tokens,
       CAST((lang_tokens * 1000000)
            // (SELECT SUM(lang_tokens) FROM scaled) AS BIGINT)
           AS raw_ppm,
       CAST((ir * 1000000) // (SELECT SUM(ir) FROM scaled) AS BIGINT)
           AS temp_ppm,
       (ir * 1000000) // (SELECT SUM(ir) FROM scaled)
           > (lang_tokens * 1000000) // (SELECT SUM(lang_tokens) FROM scaled)
           AS upweighted
FROM scaled
"""


@register("pipe_sampling_temperature", oracle=_TEMP_ORACLE)
def q_pipe_sampling_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TEMPERATURE-SCALED MIXTURE WEIGHTS (alpha = 0.5): the standard
    multilingual-pretraining rebalance — sampling probability
    proportional to (token share)^alpha, which upweights low-resource
    languages and downweights the head. Output per lang: doc/token
    counts, the raw token share, the temperature-scaled share (both
    integer ppm), and whether temperature moved the lang UP.

    Determinism doctrine: alpha = 0.5 is computed via sqrt — the one
    power IEEE 754 requires to be correctly rounded, so both engines
    produce the identical double — quantized to integer milli-units
    BEFORE normalization, and the shares come from exact INTEGER
    division (the pipe_dsir_weights r15 fix doctrine: never route a
    portable ratio through double division).

    Scale: one token-count projection (no explode — size(split())),
    one 5-key partial agg, and a broadcast of the two scalar totals;
    changing alpha to any dyadic p/2^k stays in exact sqrt chains.
    """
    d = load_table(spark, sf_dir, "documents")
    per_lang = (
        d.select(
            "lang",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias(
                "n_tokens"
            ),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("lang_tokens"),
        )
        .withColumn(
            "ir",
            F.floor(
                F.sqrt(F.col("lang_tokens").cast("double")) * 1000.0
                + F.lit(0.5)
            ).cast("bigint"),
        )
    )
    totals = per_lang.agg(
        F.sum("lang_tokens").alias("tot_tokens"),
        F.sum("ir").alias("tot_ir"),
    )
    return (
        per_lang.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "n_docs",
            "lang_tokens",
            F.expr("(lang_tokens * 1000000) div tot_tokens")
            .cast("bigint")
            .alias("raw_ppm"),
            F.expr("(ir * 1000000) div tot_ir")
            .cast("bigint")
            .alias("temp_ppm"),
            F.expr(
                "(ir * 1000000) div tot_ir > "
                "(lang_tokens * 1000000) div tot_tokens"
            ).alias("upweighted"),
        )
    )


# --- n-gram count-threshold pruning curve --------------------------------------

_PRUNE_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(s) AS token, generate_subscripts(s, 1) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
),
big AS (
  SELECT doc_id, token,
         LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS next
  FROM tok
),
bg AS (
  SELECT token, next, CAST(COUNT(*) AS BIGINT) AS c2
  FROM big WHERE next IS NOT NULL GROUP BY token, next
),
hist AS (
  SELECT c2, CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(c2) AS BIGINT) AS mass
  FROM bg GROUP BY c2
),
tot AS (
  SELECT CAST(SUM(n_types) AS BIGINT) AS all_types,
         CAST(SUM(mass) AS BIGINT) AS all_mass
  FROM hist
)
SELECT t.threshold,
       CAST(COALESCE(SUM(h.n_types), 0) AS BIGINT) AS surviving_types,
       CAST(tot.all_types - COALESCE(SUM(h.n_types), 0) AS BIGINT)
           AS pruned_types,
       CAST((COALESCE(SUM(h.mass), 0) * 1000000) // tot.all_mass AS BIGINT)
           AS coverage_ppm
FROM (VALUES (1), (2), (3), (4), (5)) AS t(threshold)
LEFT JOIN hist h ON h.c2 >= t.threshold
CROSS JOIN tot
GROUP BY t.threshold, tot.all_types, tot.all_mass
"""


@register("pipe_ngram_prune_curve", oracle=_PRUNE_ORACLE)
def q_pipe_ngram_prune_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-GRAM PRUNING CURVE: for count thresholds 1..5, how many bigram
    types survive `count >= t` pruning and what fraction of the corpus
    token mass they still cover (integer ppm) — the size/coverage
    trade-off table a count-based LM build consults before committing
    a model size.

    Scale shape is the point: the bigram table reduces FIRST to a
    count-of-counts HISTOGRAM (rows bounded by distinct count values —
    tens, by Zipf, regardless of corpus size), and the 5-threshold
    curve is computed from that histogram — the per-threshold pass
    never rescans the corpus or the bigram table. The bigram extract
    itself is transform() over the token array (no per-doc window
    shuffle), one groupBy on the bigram key with map-side partials.
    """
    d = load_table(spark, sf_dir, "documents")
    # tokenize ONCE per document: the lambda below indexes the
    # pre-split array — inlining split(text) into the lambda re-splits
    # the text per bigram position (no CSE across lambda scopes)
    bg = (
        d.select(F.split("text", " ").alias("toks"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i - 1] as token, "
                    "toks[i] as next))"
                )
            ).alias("b")
        )
        .select("b.token", "b.next")
        .groupBy("token", "next")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    # the count-of-counts histogram is bounded by Zipf (tens of rows)
    # but feeds TWO consumers (the totals and the threshold curve):
    # materialize it once so the corpus-sized bigram aggregation runs
    # a single pass instead of once per consumer
    hist = bg.groupBy("c2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("c2").cast("bigint").alias("mass"),
    ).localCheckpoint()
    tot = hist.agg(
        F.sum("n_types").cast("bigint").alias("all_types"),
        F.sum("mass").cast("bigint").alias("all_mass"),
    )
    thresholds = F.broadcast(
        local_rows(
            hist.sparkSession, [(t,) for t in range(1, 6)], "threshold int"
        )
    )
    return (
        thresholds.join(hist, F.col("c2") >= F.col("threshold"), "left")
        .groupBy("threshold")
        .agg(
            F.coalesce(F.sum("n_types"), F.lit(0))
            .cast("bigint")
            .alias("surv"),
            F.coalesce(F.sum("mass"), F.lit(0)).cast("bigint").alias("m"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            F.col("surv").alias("surviving_types"),
            (F.col("all_types") - F.col("surv"))
            .cast("bigint")
            .alias("pruned_types"),
            F.expr("(m * 1000000) div all_mass")
            .cast("bigint")
            .alias("coverage_ppm"),
        )
    )


# --- product quantization (PQ) codebook ----------------------------------------

_PQ_M = 8       # subspaces (64-dim embedding → 8 dims each)
_PQ_K = 16      # codes per subspace → 4 bits/subspace, 4 bytes/vector

_PQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
),
dims AS (
  SELECT vec_id, generate_subscripts(ve, 1) - 1 AS pos, unnest(ve) AS val
  FROM e
),
ranked AS (
  SELECT vec_id,
         ROW_NUMBER() OVER (
             ORDER BY md5('pq:' || CAST(vec_id AS VARCHAR)), vec_id
         ) - 1 AS code
  FROM e
),
cdims AS (
  SELECT r.code, d.pos // 8 AS subspace, d.pos % 8 AS inner_i,
         d.val AS cval
  FROM ranked r JOIN dims d USING (vec_id)
  WHERE r.code < {_PQ_K}
),
dist AS (
  SELECT v.vec_id, c.subspace, c.code,
         CAST(SUM(CAST(floor((v.val - c.cval) * (v.val - c.cval) * 1e9
                             + 0.5) AS BIGINT)) AS BIGINT) AS d
  FROM dims v
  JOIN cdims c ON v.pos // 8 = c.subspace AND v.pos % 8 = c.inner_i
  GROUP BY v.vec_id, c.subspace, c.code
),
pick AS (
  SELECT vec_id, subspace, code, d,
         ROW_NUMBER() OVER (
             PARTITION BY vec_id, subspace ORDER BY d, code
         ) AS rn
  FROM dist
)
SELECT CAST(subspace AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
       CAST(COUNT(*) AS BIGINT) AS n_assigned,
       CAST(SUM(d) AS BIGINT) AS total_distortion
FROM pick WHERE rn = 1
GROUP BY subspace, code
"""




def _pq_bottomk_ids(e, seed: str, k: int):
    """Distributed bottom-k by seeded hash: orderBy().limit() plans as
    TakeOrderedAndProject (per-partition top-k + driver merge of k
    rows) — NOT the single-task global window a full-corpus
    ROW_NUMBER would need. Returns (vec_id, rk) with rk = 0-based
    hash-order rank, built driver-side from the k collected rows
    (bounded by construction)."""
    spark = e.sparkSession
    rows = (
        e.select(
            "vec_id",
            F.md5(
                F.concat(F.lit(seed), F.col("vec_id").cast("string"))
            ).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    return local_rows(spark, 
        [(r["vec_id"], i) for i, r in enumerate(rows)],
        "vec_id bigint, rk int",
    )


def _pq_anchor_codes(e):
    """The PQ codebook's anchor vectors: bottom-_PQ_K by seeded hash,
    code = hash-order rank (matches the oracle's ROW_NUMBER - 1)."""
    return _pq_bottomk_ids(e, "pq:", _PQ_K).select(
        "vec_id", F.col("rk").alias("code")
    )


@register("emb_pq_codebook", oracle=_PQ_ORACLE)
def q_emb_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT QUANTIZATION over the embedding corpus: split each
    64-dim vector into {m} subspaces of 8 dims, build a {k}-entry
    codebook per subspace from deterministically hash-sampled anchor
    vectors (the sampled-codebook PQ variant — no iterative k-means,
    so the whole operator is one relational plan), and assign every
    vector its nearest code per subspace. PQ is the memory spine of
    billion-vector ANN: 64 floats (256 B) compress to {m} 4-bit codes
    (4 B) and distance evaluation becomes {m} table lookups.

    Determinism doctrine: each per-dimension squared difference is
    floor-quantized to integer NANO units BEFORE summation, so
    subspace distances are exact BIGINTs, the argmin (ties broken by
    code) is bit-portable, and the oracle reproduces every assignment
    — float summation order never matters (the same trick
    pipe_dsir_weights uses for ratios).

    Graded: the (subspace, code) assignment histogram with integer
    total distortion — a wrong codebook, a wrong slice boundary, or a
    nondeterministic argmin shifts assignments and fails the hash.

    Scale: dims explode is N×64 rows; the codebook side is {k}×64 =
    1,024 rows — broadcast; the distance agg partial-aggregates
    map-side on (vec, subspace, code); the argmin is a bounded window
    per (vec, subspace) — measured this round against the min(struct)
    aggregate form, which plans as SortAggregate (same sort, extra
    struct builds) and was A/B-neutral at best, so the window stays.
    At 1B vectors the identical plan holds with the codebook still
    broadcast-sized — the explode is the only term that grows.
    """.format(m=_PQ_M, k=_PQ_K)
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ve")
    )
    dims = e.select(
        "vec_id", F.posexplode("ve").alias("pos", "val")
    )
    ranked = _pq_anchor_codes(e)
    cdims = (
        ranked.join(dims, "vec_id")
        .select(
            "code",
            (F.col("pos") / 8).cast("int").alias("subspace"),
            (F.col("pos") % 8).alias("inner_i"),
            F.col("val").alias("cval"),
        )
    )
    dist = (
        dims.withColumn("subspace", (F.col("pos") / 8).cast("int"))
        .withColumn("inner_i", F.col("pos") % 8)
        .join(F.broadcast(cdims), ["subspace", "inner_i"])
        .groupBy("vec_id", "subspace", "code")
        .agg(
            F.sum(
                F.floor(
                    (F.col("val") - F.col("cval"))
                    * (F.col("val") - F.col("cval"))
                    * 1e9
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("d")
        )
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy("d", "code")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("subspace", "code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
            F.sum("d").cast("bigint").alias("total_distortion"),
        )
        .select(
            F.col("subspace").cast("bigint").alias("subspace"),
            F.col("code").cast("bigint").alias("code"),
            "n_assigned",
            "total_distortion",
        )
    )


# --- PQ asymmetric-distance (ADC) search ---------------------------------------

_PQ_NQ = 5      # query vectors
_PQ_TOPK = 10

_ADC_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
),
dims AS (
  SELECT vec_id, generate_subscripts(ve, 1) - 1 AS pos, unnest(ve) AS val
  FROM e
),
ranked AS (
  SELECT vec_id,
         ROW_NUMBER() OVER (
             ORDER BY md5('pq:' || CAST(vec_id AS VARCHAR)), vec_id
         ) - 1 AS code
  FROM e
),
cdims AS (
  SELECT r.code, d.pos // 8 AS subspace, d.pos % 8 AS inner_i,
         d.val AS cval
  FROM ranked r JOIN dims d USING (vec_id)
  WHERE r.code < {_PQ_K}
),
dist AS (
  SELECT v.vec_id, c.subspace, c.code,
         CAST(SUM(CAST(floor((v.val - c.cval) * (v.val - c.cval) * 1e9
                             + 0.5) AS BIGINT)) AS BIGINT) AS d
  FROM dims v
  JOIN cdims c ON v.pos // 8 = c.subspace AND v.pos % 8 = c.inner_i
  GROUP BY v.vec_id, c.subspace, c.code
),
codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT vec_id, subspace, code,
           ROW_NUMBER() OVER (
               PARTITION BY vec_id, subspace ORDER BY d, code
           ) AS rn
    FROM dist
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS q_id FROM (
    SELECT vec_id,
           ROW_NUMBER() OVER (
               ORDER BY md5('q:' || CAST(vec_id AS VARCHAR)), vec_id
           ) AS qrn
    FROM e
  ) WHERE qrn <= {_PQ_NQ}
),
lut AS (
  SELECT q.q_id, c.subspace, c.code,
         CAST(SUM(CAST(floor((d.val - c.cval) * (d.val - c.cval) * 1e9
                             + 0.5) AS BIGINT)) AS BIGINT) AS ld
  FROM queries q
  JOIN dims d ON d.vec_id = q.q_id
  JOIN cdims c ON d.pos // 8 = c.subspace AND d.pos % 8 = c.inner_i
  GROUP BY q.q_id, c.subspace, c.code
),
adc AS (
  SELECT l.q_id, co.vec_id, CAST(SUM(l.ld) AS BIGINT) AS ad
  FROM codes co
  JOIN lut l ON l.subspace = co.subspace AND l.code = co.code
  GROUP BY l.q_id, co.vec_id
),
adc_topk AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY ad, vec_id
           ) AS rn
    FROM adc
  ) WHERE rn <= {_PQ_TOPK}
),
exact AS (
  SELECT q.q_id, d.vec_id,
         CAST(SUM(CAST(floor((d.val - qd.val) * (d.val - qd.val) * 1e9
                             + 0.5) AS BIGINT)) AS BIGINT) AS xd
  FROM queries q
  JOIN dims qd ON qd.vec_id = q.q_id
  JOIN dims d ON d.pos = qd.pos
  GROUP BY q.q_id, d.vec_id
),
exact_topk AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY xd, vec_id
           ) AS rn
    FROM exact
  ) WHERE rn <= {_PQ_TOPK}
)
SELECT a.q_id,
       CAST(COUNT(x.vec_id) AS BIGINT) AS n_recalled,
       CAST({_PQ_TOPK} AS BIGINT) AS k
FROM adc_topk a
LEFT JOIN exact_topk x
       ON a.q_id = x.q_id AND a.vec_id = x.vec_id
GROUP BY a.q_id
"""


@register("emb_pq_adc_search", oracle=_ADC_ORACLE)
def q_emb_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ASYMMETRIC-DISTANCE SEARCH (ADC) — the read side of
    `emb_pq_codebook`, and the reason PQ exists: for each of {nq}
    hash-chosen query vectors, build the per-subspace LOOKUP TABLE
    (exact squared distance from the query's subvector to each of the
    {k} codebook entries), score every corpus vector as the SUM of
    {m} table lookups selected by its stored codes — never touching
    the original vectors — and take the top-{topk}. The graded output
    is the per-query RECALL against the exact ranker: how many of the
    true top-{topk} the 4-byte codes preserved.

    Same integer doctrine as the codebook key: every squared-distance
    term is nano-quantized before summation, so LUTs, ADC scores,
    exact scores, and both top-k rankings (ties by vec_id) are
    bit-portable — the oracle reproduces the recall numbers exactly,
    not approximately.

    Scale: the LUT build is {nq}×{k}×{m} entries — broadcast-sized by
    construction (that is ADC's trick: per-query work is O(k·dim) +
    O(N·m) lookups, not O(N·dim)); the lookup join keys on
    (subspace, code) against the N×{m} code table and partial-aggs
    map-side; exact re-scoring exists here only as the audit.
    """.format(nq=_PQ_NQ, k=_PQ_K, m=_PQ_M, topk=_PQ_TOPK)
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ve")
    )
    dims = e.select("vec_id", F.posexplode("ve").alias("pos", "val"))
    ranked = _pq_anchor_codes(e)
    cdims = ranked.join(dims, "vec_id").select(
        "code",
        (F.col("pos") / 8).cast("int").alias("subspace"),
        (F.col("pos") % 8).alias("inner_i"),
        F.col("val").alias("cval"),
    )
    nano = lambda a, b: F.floor(  # noqa: E731 — shared quantizer
        (a - b) * (a - b) * 1e9 + F.lit(0.5)
    ).cast("bigint")
    ddims = dims.withColumn(
        "subspace", (F.col("pos") / 8).cast("int")
    ).withColumn("inner_i", F.col("pos") % 8)
    dist = (
        ddims.join(F.broadcast(cdims), ["subspace", "inner_i"])
        .groupBy("vec_id", "subspace", "code")
        .agg(F.sum(nano(F.col("val"), F.col("cval"))).alias("d"))
    )
    wass = Window.partitionBy("vec_id", "subspace").orderBy("d", "code")
    codes = (
        dist.withColumn("rn", F.row_number().over(wass))
        .filter(F.col("rn") == 1)
        .select("vec_id", "subspace", "code")
    )
    queries = _pq_bottomk_ids(e, "q:", _PQ_NQ).select(
        F.col("vec_id").alias("q_id")
    )
    qdims = F.broadcast(
        queries.join(ddims, queries.q_id == ddims.vec_id).select(
            "q_id", "subspace", "inner_i", F.col("val").alias("qval")
        )
    )
    lut = (
        qdims.join(F.broadcast(cdims), ["subspace", "inner_i"])
        .groupBy("q_id", "subspace", "code")
        .agg(F.sum(nano(F.col("qval"), F.col("cval"))).alias("ld"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("ld").alias("ad"))
    )
    wq = Window.partitionBy("q_id").orderBy("ad", "vec_id")
    adc_topk = (
        adc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _PQ_TOPK)
        .select("q_id", "vec_id")
    )
    qfull = F.broadcast(
        queries.join(dims, queries.q_id == dims.vec_id).select(
            "q_id", "pos", F.col("val").alias("qval")
        )
    )
    exact = (
        dims.join(qfull, "pos")
        .groupBy("q_id", "vec_id")
        .agg(F.sum(nano(F.col("val"), F.col("qval"))).alias("xd"))
    )
    wx = Window.partitionBy("q_id").orderBy("xd", "vec_id")
    exact_topk = (
        exact.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= _PQ_TOPK)
        .select("q_id", F.col("vec_id").alias("x_vec"))
    )
    return (
        adc_topk.join(
            F.broadcast(exact_topk),
            (adc_topk.q_id == exact_topk.q_id)
            & (adc_topk.vec_id == exact_topk.x_vec),
            "left",
        )
        .groupBy(adc_topk.q_id)
        .agg(
            F.count(F.col("x_vec")).cast("bigint").alias("n_recalled"),
            F.lit(_PQ_TOPK).cast("bigint").alias("k"),
        )
    )
