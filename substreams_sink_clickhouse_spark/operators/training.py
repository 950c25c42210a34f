"""Training-data curation operators: mixture control, splits, epochs.

A 100 TB pretraining pipeline doesn't just clean documents (dedup.py,
text.py) — it *composes* the corpus: reweight sources toward a target
mixture, carve deterministic train/val/test splits, fix a reproducible
global shuffle order, and upsample scarce high-quality sources.  Every
operator here is driven by the cross-engine MD5 hash family
(``functions/hashing.py``), so the SAME rows are selected on every
engine, every run, every partitioning — the property rand()-based
sampling lacks and the one that makes ablations comparable.

Plus the embedding-side preprocessing a retrieval/ANN stack needs:
L2 normalization and int8 scalar quantization (the IVF/LSH operators
in similarity.py consume normalized vectors; quantization is how a
100 TB embedding store fits hot storage).

Scale notes: mixture / split / upsample are map-only row filters or
flat-map expansions followed by one algebraic aggregate — no joins, no
window sorts; the shuffle-order query is a global sort, which Spark
executes as a range-partitioned sort (sample → range boundaries →
partition-local sort), the standard distributed topological order for
writing training shards.  Embedding ops are zero-shuffle per-row
higher-order folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.functions.hashing import (
    duck_md5_long_sql,
    md5_long,
)
from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table

#: keep-rate percent per source tier (source index mod 3)
_MIX_RATES = {0: 100, 1: 50, 2: 20}


def _tier(src_col):
    # source names are 'srcN'; tier = N mod 3
    return (F.regexp_extract(src_col, r"(\d+)", 1).cast("int") % 3).alias("tier")


def _train_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Source reweighting toward a target mixture: per-tier keep rates
    applied by deterministic hash — a map-only filter, so at 100 TB it
    rides the scan with zero extra passes."""
    d = load_table(spark, sf, "documents")
    h = md5_long(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 100
    rate = (
        F.when(_tier(F.col("source")) == 0, F.lit(_MIX_RATES[0]))
        .when(_tier(F.col("source")) == 1, F.lit(_MIX_RATES[1]))
        .otherwise(F.lit(_MIX_RATES[2]))
    )
    return (
        d.filter(h < rate)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("source")
    )


def _train_mix_oracle() -> str:
    h = duck_md5_long_sql("CONCAT('mix:', CAST(doc_id AS VARCHAR))")
    return f"""
SELECT source, count(*) AS kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
FROM documents
WHERE {h} % 100 < (CASE CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 3
                   WHEN 0 THEN {_MIX_RATES[0]} WHEN 1 THEN {_MIX_RATES[1]}
                   ELSE {_MIX_RATES[2]} END)
GROUP BY source ORDER BY source
"""


def _train_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test carve (80/10/10 by content hash).
    Split membership is a pure function of doc_id — stable across
    engines and reshards, so no document ever migrates between splits
    when the corpus is re-partitioned."""
    d = load_table(spark, sf, "documents")
    b = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split")
    )


def _train_split_oracle() -> str:
    h = duck_md5_long_sql("CONCAT('split:', CAST(doc_id AS VARCHAR))")
    return f"""
SELECT split, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
FROM (
  SELECT CASE WHEN {h} % 100 < 80 THEN 'train'
              WHEN {h} % 100 < 90 THEN 'val' ELSE 'test' END AS split,
         n_chars
  FROM documents)
GROUP BY split ORDER BY split
"""


def _train_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Reproducible global shuffle order for epoch 1: sort by a seeded
    content hash.  Spark executes this as a range-partitioned sort —
    the distributed way to lay out training shards in a fixed
    pseudo-random order without a single-node bottleneck."""
    d = load_table(spark, sf, "documents")
    key = md5_long(F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", "source", key.alias("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
        .limit(200)
    )


def _train_shuffle_oracle() -> str:
    h = duck_md5_long_sql("CONCAT('epoch1:', CAST(doc_id AS VARCHAR))")
    return f"""
SELECT doc_id, source, {h} AS shuffle_key
FROM documents ORDER BY shuffle_key, doc_id LIMIT 200
"""


def _train_upsample(spark: SparkSession, sf: str) -> DataFrame:
    """Epoch-level upsampling: tier-0 sources repeat 3x per epoch
    (scarce high-quality data), the rest 1x.  The repeat is a flat-map
    (``explode(sequence(...))``) — no join, no shuffle; the aggregate
    confirms the resulting mixture."""
    d = load_table(spark, sf, "documents")
    factor = F.when(_tier(F.col("source")) == 0, F.lit(3)).otherwise(F.lit(1))
    return (
        d.withColumn("rep", F.explode(F.sequence(F.lit(1), factor)))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("epoch_rows"),
            F.countDistinct("doc_id").alias("unique_docs"),
        )
        .orderBy("source")
    )


_TRAIN_UPSAMPLE_ORACLE = """
SELECT source, count(*) AS epoch_rows, count(DISTINCT doc_id) AS unique_docs
FROM documents, LATERAL unnest(range(CASE WHEN CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 3 = 0
                                          THEN 3 ELSE 1 END)) u(r)
GROUP BY source ORDER BY source
"""


def _emb_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """L2 normalization of the embedding column: per-row higher-order
    fold (norm) + transform (scale) — zero shuffles; the normalized
    vectors are what similarity.py's cosine operators consume."""
    v = load_table(spark, sf, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    normalized = F.transform("embedding", lambda x: x.cast("double") / F.col("l2_norm"))
    check = F.sqrt(
        F.aggregate("unit", F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    return (
        v.withColumn("l2_norm", norm)
        .withColumn("unit", normalized)
        .select(
            "vec_id",
            F.round("l2_norm", 6).alias("l2_norm_r"),
            F.round(F.element_at("unit", 1), 6).alias("u1"),
            F.round(check, 6).alias("unit_norm"),
        )
        .orderBy("vec_id")
        .limit(500)
    )


_EMB_NORMALIZE_ORACLE = """
SELECT vec_id,
       round(l2_norm, 6) AS l2_norm_r,
       round(unit[1], 6) AS u1,
       round(sqrt(list_sum(list_transform(unit, x -> x * x))), 6) AS unit_norm
FROM (
  SELECT vec_id,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS l2_norm,
         list_transform(embedding, x -> x::DOUBLE
           / sqrt(list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE)))) AS unit
  FROM embeddings)
ORDER BY vec_id LIMIT 500
"""


def _emb_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 scalar quantization: per-vector scale = 127 / max|x|,
    values rounded to [-127, 127] — 4x storage reduction for a 100 TB
    embedding store.  Row-local arithmetic only; the aggregate reports
    round-trip error so quality is measured, not assumed."""
    v = load_table(spark, sf, "embeddings")
    absmax = F.aggregate(
        "embedding",
        F.lit(0.0).cast("double"),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * F.col("scale")).cast("int")
    )
    err = F.aggregate(
        F.zip_with(
            "embedding", "q", lambda x, qq: F.abs(x.cast("double") - qq / F.col("scale"))
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: F.greatest(acc, x),
    )
    return (
        v.withColumn("scale", F.lit(127.0) / absmax)
        .withColumn("q", q)
        .withColumn("max_err", err)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("max_err"), 6).alias("avg_max_err"),
            F.round(F.max("max_err"), 6).alias("worst_err"),
            F.min(F.array_min("q")).alias("q_min"),
            F.max(F.array_max("q")).alias("q_max"),
        )
    )


_EMB_QUANTIZE_ORACLE = """
SELECT count(*) AS n_vecs,
       round(avg(max_err), 6) AS avg_max_err,
       round(max(max_err), 6) AS worst_err,
       min(list_min(q)) AS q_min,
       max(list_max(q)) AS q_max
FROM (
  SELECT list_max(list_transform(list_zip(embedding, q),
           p -> abs(p[1]::DOUBLE - p[2] / scale))) AS max_err,
         q
  FROM (
    SELECT embedding, scale,
           list_transform(embedding, x -> round(x::DOUBLE * scale)::INT) AS q
    FROM (
      SELECT embedding,
             127.0 / list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
      FROM embeddings)))
"""


SPECS = [
    QuerySpec(
        "train_mix",
        "Corpus mixture control: per-source keep rates by stable hash",
        _train_mix,
        _train_mix_oracle(),
    ),
    QuerySpec(
        "train_split",
        "Deterministic train/val/test split (80/10/10 by content hash)",
        _train_split,
        _train_split_oracle(),
    ),
    QuerySpec(
        "train_shuffle",
        "Reproducible global shuffle order (range-partitioned sort)",
        _train_shuffle,
        _train_shuffle_oracle(),
    ),
    QuerySpec(
        "train_upsample",
        "Epoch upsampling: scarce sources repeated via flat-map",
        _train_upsample,
        _TRAIN_UPSAMPLE_ORACLE,
    ),
    QuerySpec(
        "emb_normalize",
        "L2-normalize embedding vectors (zero-shuffle fold)",
        _emb_normalize,
        _EMB_NORMALIZE_ORACLE,
    ),
    QuerySpec(
        "emb_quantize",
        "Int8 scalar quantization of embeddings + round-trip error",
        _emb_quantize,
        _EMB_QUANTIZE_ORACLE,
    ),
]


#: Context-window size the packing-efficiency stats are computed for.
SEQ_WINDOW = 512


def _train_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence-length planning stats: per power-of-two length bucket,
    document count, token mass, and the packing efficiency a naive
    one-doc-per-window loader would get at SEQ_WINDOW (tokens /
    windows*SEQ_WINDOW) vs the ideal greedy bound.

    This is the profile a training-data pipeline computes before
    choosing packing strategy — one map-side projection (whitespace
    token count + log2 bucket) into one hash aggregate; no shuffle
    beyond the aggregate exchange at any corpus size."""
    d = load_table(spark, sf, "documents")
    toks = F.size(F.split("text", " "))
    bucket = F.pow(
        F.lit(2.0), F.ceil(F.log2(F.greatest(toks, F.lit(1)).cast("double")))
    ).cast("long")
    per_doc = d.select(
        toks.alias("n_tok"),
        bucket.alias("len_bucket"),
    )
    naive_windows = F.ceil(F.col("n_tok") / F.lit(SEQ_WINDOW).cast("double")).cast(
        "long"
    )
    return (
        per_doc.withColumn("n_windows", naive_windows)
        .groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens"),
            F.round(
                F.sum("n_tok")
                / (F.sum("n_windows") * F.lit(SEQ_WINDOW)).cast("double"),
                4,
            ).alias("naive_pack_eff"),
        )
    )


_TRAIN_LENGTH_BUCKETS_ORACLE = f"""
WITH p AS (
  SELECT len(string_split(text, ' ')) AS n_tok,
         CAST(power(2.0, ceil(log2(CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE)))) AS BIGINT) AS len_bucket,
         CAST(ceil(len(string_split(text, ' ')) / CAST({SEQ_WINDOW} AS DOUBLE)) AS BIGINT) AS n_windows
  FROM documents)
SELECT len_bucket,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tokens,
       round(sum(n_tok) / CAST(sum(n_windows) * {SEQ_WINDOW} AS DOUBLE), 4) AS naive_pack_eff
FROM p GROUP BY len_bucket ORDER BY len_bucket
"""


SPECS.append(
    QuerySpec(
        "train_length_buckets",
        "Sequence-length histogram + naive packing efficiency at a "
        "fixed context window",
        _train_length_buckets,
        _TRAIN_LENGTH_BUCKETS_ORACLE,
    )
)


# ------------------------------------------------- token-budget selection

_TOKEN_BUDGET = 200_000


def _train_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget corpus selection: walk the deterministic shuffle
    order (seeded content hash) and keep the maximal prefix whose
    cumulative whitespace-token count fits the budget — how a training
    run carves "the first N tokens" reproducibly from a larger corpus.

    The cumulative sum is a single ordered window over (hash, doc_id)
    — Spark executes it as a range-partitioned sort, and the output
    reports the carve (docs kept, tokens used, budget headroom), so
    the result is one row regardless of scale."""
    d = load_table(spark, sf, "documents")
    key = md5_long(F.concat(F.lit("budget:"), F.col("doc_id").cast("string")))
    toks = F.size(F.split("text", " ")).cast("long")
    from pyspark.sql import Window

    w = Window.orderBy("k", "doc_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        d.select(key.alias("k"), "doc_id", toks.alias("t"))
        .withColumn("cum", F.sum("t").over(w))
        .filter(F.col("cum") <= _TOKEN_BUDGET)
    )
    return cum.agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.max("cum").alias("tokens_used"),
        (F.lit(_TOKEN_BUDGET) - F.max("cum")).alias("headroom"),
    )


def _token_budget_oracle() -> str:
    h = duck_md5_long_sql("CONCAT('budget:', CAST(doc_id AS VARCHAR))")
    return f"""
WITH cum AS (
  SELECT doc_id,
         sum(len(string_split(text, ' '))::BIGINT)
           OVER (ORDER BY {h}, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents)
SELECT count(*) AS docs_kept, CAST(max(cum) AS BIGINT) AS tokens_used,
       CAST({_TOKEN_BUDGET} - max(cum) AS BIGINT) AS headroom
FROM cum WHERE cum <= {_TOKEN_BUDGET}
"""


SPECS.append(
    QuerySpec(
        "train_token_budget",
        "Maximal shuffle-order prefix under a token budget",
        _train_token_budget,
        _token_budget_oracle(),
    )
)


# ---------------------------------------------------- train_interleave

def interleave_sources(
    docs: DataFrame, weight_col, order_cols: list[str], prefix: int | None = None
) -> DataFrame:
    """Deterministic weighted interleaving of sources into one global
    training order: a doc at per-source position ``r`` (1-based, by
    ``order_cols``) with source weight ``w`` schedules at virtual time
    ``r / w``, so any prefix of the global order carries sources in
    ~weight proportion — the standard dataset-mixing schedule (e.g.
    Pile/ROOTS-style sampling ratios) made reproducible.

    Scale: the per-source rank is a keyed window (parallel), but the
    GLOBAL rank is inherently a total order — a single-partition
    window if computed over the whole corpus.  Pass ``prefix=K`` when
    you need the first K schedule slots (the usual case: the next
    epoch chunk): a row at per-source rank r has global rank >= r (at
    least r slots of its own source schedule at-or-before it), so
    rows with r > K can never reach the top K and are pre-filtered —
    the global window then sees at most K x n_sources rows regardless
    of corpus size.  ``prefix=None`` ranks everything (fine for
    corpus-sized jobs that write the full schedule; the range sort is
    distributed, only the rank assignment is single-partition)."""
    from pyspark.sql import Window

    ranked = docs.withColumn(
        "__r",
        F.row_number().over(Window.partitionBy("source").orderBy(*order_cols)),
    ).withColumn("__vt", F.col("__r") / weight_col)
    if prefix is not None:
        ranked = ranked.filter(F.col("__r") <= prefix)
    out = ranked.withColumn(
        "interleave_rank",
        F.row_number().over(Window.orderBy(F.col("__vt"), F.col("source"), *order_cols)),
    ).drop("__r", "__vt")
    return out.filter(F.col("interleave_rank") <= prefix) if prefix is not None else out


def _train_interleave(spark: SparkSession, sf: str) -> DataFrame:
    """Gate entry: tier-weighted interleave of the documents fixture
    (weights 3/2/1 by source tier), first 200 schedule slots."""
    d = load_table(spark, sf, "documents")
    weight = (
        F.when(_tier(F.col("source")) == 0, F.lit(3))
        .when(_tier(F.col("source")) == 1, F.lit(2))
        .otherwise(F.lit(1))
    )
    out = interleave_sources(
        d.select("doc_id", "source"), weight, ["doc_id"], prefix=200
    )
    return (
        out.select("interleave_rank", "doc_id", "source")
        .orderBy("interleave_rank")
    )


_TRAIN_INTERLEAVE_ORACLE = """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r,
         (CASE CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 3
               WHEN 0 THEN 3 WHEN 1 THEN 2 ELSE 1 END) AS w
  FROM documents)
SELECT row_number() OVER (ORDER BY r / w, source, doc_id) AS interleave_rank,
       doc_id, source
FROM ranked
ORDER BY interleave_rank LIMIT 200
"""


SPECS.append(
    QuerySpec(
        "train_interleave",
        "Weighted source interleaving: reproducible global mixing "
        "schedule (any prefix carries sources in weight proportion)",
        _train_interleave,
        _TRAIN_INTERLEAVE_ORACLE,
    )
)


def _train_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based multilingual sampling schedule (the XLM-R /
    mT5 balancing recipe): per-language sampling weights proportional
    to n_i^tau with tau = 1/2, so low-resource languages are upsampled
    relative to their corpus share.

    INTEGER-EXACT formulation so both engines agree bit-for-bit: the
    weight is floor(sqrt(n_i)) (IEEE sqrt is correctly rounded on both
    JVMs and libm, and these counts sit far below the 2^52 rounding
    cliff), the target allocation is (N * w_i) div W, and the
    upsampling factor is reported in integer percent.  A float
    pow(n, alpha) would hash-mismatch on a ulp, which is why tau is
    pinned at 1/2 here; arbitrary-tau schedules belong in application
    code where cross-engine hashing is not a contract.

    Scale design: one hash exchange to language cardinality, then a
    single-partition window over ~#languages rows (hundreds at most)
    for the two totals — nothing here grows with corpus size."""
    from pyspark.sql import Window

    d = load_table(spark, sf, "documents")
    g = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("chars"),
    )
    t = g.select(
        "lang", "n", "chars", F.floor(F.sqrt("n")).alias("s")
    )
    w = Window.partitionBy()
    t = t.select(
        "lang",
        "n",
        "chars",
        "s",
        F.sum("s").over(w).alias("stot"),
        F.sum("n").over(w).alias("ntot"),
    )
    return (
        t.selectExpr(
            "lang",
            "n",
            "chars",
            "(ntot * s) div stot AS target",
            "(((ntot * s) div stot) * 100) div n AS upsample_pct",
        )
        .orderBy("lang")
    )


_TRAIN_TEMPERATURE_MIX_ORACLE = """
WITH g AS (
  SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY lang),
t AS (
  SELECT lang, n, chars, CAST(floor(sqrt(n)) AS BIGINT) AS s,
         sum(CAST(floor(sqrt(n)) AS BIGINT)) OVER () AS stot,
         sum(n) OVER () AS ntot
  FROM g)
SELECT lang, n, chars,
       CAST((ntot * s) // stot AS BIGINT) AS target,
       CAST((((ntot * s) // stot) * 100) // n AS BIGINT) AS upsample_pct
FROM t ORDER BY lang
"""


SPECS.append(
    QuerySpec(
        "train_temperature_mix",
        "Temperature-sampling schedule (n^(1/2) weights, integer-exact): "
        "per-language target allocation and upsampling factor",
        _train_temperature_mix,
        _TRAIN_TEMPERATURE_MIX_ORACLE,
    )
)


# ------------------------------------------------ curriculum schedule

def _train_curriculum(spark: SparkSession, sf: str) -> DataFrame:
    """Curriculum-learning schedule: partition the corpus into 4
    difficulty phases by a deterministic difficulty proxy (average
    word length, ``n_chars / n_words``) and report each phase's volume
    and score envelope — the plan a curriculum loader feeds from
    easiest to hardest (Bengio et al. 2009).

    Scale design — NO global sort: the phase boundaries come from ONE
    exact-percentile aggregate (quartiles of the score, a 1-row
    broadcast), and phase assignment is then a map-only CASE against
    the broadcast thresholds.  An ntile() window would single-partition
    the corpus; this shape costs one tiny aggregate plus one hash
    aggregate at any corpus size.  Threshold comparisons use a +1e-9
    nudge: score gaps are bounded below by ~1/n_words² (rationals),
    far above any engine-side 1e-16 percentile difference, so the
    boundary docs can never flip phase between engines.
    """
    d = load_table(spark, sf, "documents")
    scored = d.select(
        (
            F.col("n_chars").cast("double")
            / F.size(F.split(F.lower("text"), " "))
        ).alias("s"),
        F.size(F.split(F.lower("text"), " ")).alias("n_words"),
    )
    thr = scored.agg(
        F.expr("percentile(s, array(0.25D, 0.5D, 0.75D))").alias("t")
    )
    eps = F.lit(1e-9)
    phased = scored.crossJoin(F.broadcast(thr)).select(
        F.when(F.col("s") <= F.expr("t[0]") + eps, F.lit(1))
        .when(F.col("s") <= F.expr("t[1]") + eps, F.lit(2))
        .when(F.col("s") <= F.expr("t[2]") + eps, F.lit(3))
        .otherwise(F.lit(4))
        .cast("int")
        .alias("phase"),
        "s",
        "n_words",
    )
    return (
        phased.groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("tok_sum"),
            F.round(F.min("s"), 6).alias("s_min"),
            F.round(F.max("s"), 6).alias("s_max"),
            F.round(F.avg("s"), 4).alias("s_mean"),
        )
        .orderBy("phase")
    )


_TRAIN_CURRICULUM_ORACLE = r"""
WITH scored AS (
  SELECT CAST(n_chars AS DOUBLE) / len(string_split(lower(text), ' ')) AS s,
         len(string_split(lower(text), ' ')) AS n_words
  FROM documents
), thr AS (
  SELECT quantile_cont(s, [0.25, 0.5, 0.75]) AS t FROM scored
), phased AS (
  SELECT CAST(CASE WHEN s <= t[1] + 1e-9 THEN 1
              WHEN s <= t[2] + 1e-9 THEN 2
              WHEN s <= t[3] + 1e-9 THEN 3
              ELSE 4 END AS INT) AS phase, s, n_words
  FROM scored, thr
)
SELECT phase, count(*) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS tok_sum,
       round(min(s), 6) AS s_min, round(max(s), 6) AS s_max,
       round(avg(s), 4) AS s_mean
FROM phased GROUP BY phase ORDER BY phase
"""


SPECS.append(
    QuerySpec(
        "train_curriculum",
        "Curriculum phases by exact-percentile difficulty thresholds: "
        "1-row quartile broadcast + map-only assignment, no global sort",
        _train_curriculum,
        _TRAIN_CURRICULUM_ORACLE,
    )
)


# -------------------------------------------- importance sampling

def _train_importance(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-weighted importance sampling with the Horvitz–Thompson
    diagnostic — the continuous-probability upgrade of ``train_mix``'s
    per-tier constant rates: every document gets its OWN keep
    probability p = clamp(n_chars / 2000, 0.05, 1) (longer documents
    are likelier training keeps), the keep decision is a deterministic
    MD5 uniform u < p (reproducible across engines and runs — no RNG
    state), and each source reports actual kept vs expected (Σp) and
    the HT estimate Σ 1/p over keeps, which re-estimates the original
    corpus size from the sample — the standard audit that the sampler
    is unbiased.

    The half-step in u ((h % 1e6 + 0.5) / 1e6) makes u == p impossible
    (p is a multiple of 1/2000 = 500/1e6; u is never an integer
    multiple), so the strict < is tie-free on both engines.

    Scale: map-only projection + one hash-aggregate exchange carrying
    source cardinality; the filter rides the scan at 100 TB."""
    d = load_table(spark, sf, "documents")
    p = F.least(
        F.lit(1.0), F.greatest(F.lit(0.05), F.col("n_chars") / F.lit(2000.0))
    )
    u = (
        md5_long(F.concat(F.lit("imp:"), F.col("doc_id").cast("string")))
        % 1000000
        + 0.5
    ) / 1000000.0
    kept = F.col("__u") < F.col("__p")
    return (
        d.withColumn("__p", p)
        .withColumn("__u", u)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.round(F.sum("__p"), 4).alias("expected_kept"),
            F.round(
                F.sum(F.when(kept, 1.0 / F.col("__p")).otherwise(0.0)), 4
            ).alias("ht_estimate"),
        )
        .orderBy("source")
    )


def _train_importance_oracle() -> str:
    h = duck_md5_long_sql("CONCAT('imp:', CAST(doc_id AS VARCHAR))")
    return f"""
WITH x AS (
  SELECT source,
         least(CAST(1.0 AS DOUBLE),
               greatest(CAST(0.05 AS DOUBLE),
                        n_chars / CAST(2000.0 AS DOUBLE))) AS p,
         ({h} % 1000000 + 0.5) / 1000000.0 AS u
  FROM documents)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN u < p THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(sum(p), 4) AS expected_kept,
       round(sum(CASE WHEN u < p THEN CAST(1.0 AS DOUBLE) / p
                      ELSE 0.0 END), 4) AS ht_estimate
FROM x GROUP BY source ORDER BY source
"""


SPECS.append(
    QuerySpec(
        "train_importance",
        "Quality-weighted importance sampling: per-doc keep "
        "probability, deterministic tie-free uniform, Horvitz–"
        "Thompson corpus-size audit per source",
        _train_importance,
        _train_importance_oracle(),
    )
)


# -------------------------------------------- UniMax budget allocation

UNIMAX_EPOCH_CAP = 4  #: max epochs over any language's corpus (paper's C)


def _train_unimax(spark: SparkSession, sf: str) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): allocate a total training-character budget as
    UNIFORMLY as possible across languages, capping every language at
    ``C`` epochs of its own corpus — the closed-form alternative to
    temperature sampling (``train_temperature_mix``) that never
    over-repeats a low-resource language.

    Water-filling, INTEGER-EXACT (the ``train_temperature_mix``
    contract: float shares would hash-mismatch on a ulp): sort
    languages by cap ``C·n_i`` ascending; language i is CAPPED iff
    even granting every not-yet-filled language ``cap_i`` fits the
    remaining budget (``cap_i · (L-i+1) <= B - P_{i-1}`` over prefix
    sums — cappedness is prefix-closed because caps ascend while the
    per-language remainder shrinks); the uncapped languages split the
    remainder evenly by integer division.  Budget B = half the total
    corpus characters (a deterministic fixture relation).

    Scale: one hash exchange to language cardinality, then windows
    over ~#languages rows (hundreds at most) — nothing grows with
    corpus size, the train_temperature_mix shape exactly."""
    from pyspark.sql import Window

    d = load_table(spark, sf, "documents")
    g = d.groupBy("lang").agg(F.sum("n_chars").cast("long").alias("n"))
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy("cap", "lang")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    t = (
        g.withColumn("cap", F.col("n") * UNIMAX_EPOCH_CAP)
        .withColumn("budget", F.expr("sum(n) OVER ()") .cast("long"))
        .withColumn("budget", F.expr("budget div 2"))
        .withColumn("nlang", F.count(F.lit(1)).over(w_all))
        .withColumn("i", F.row_number().over(w_ord))
        .withColumn("p_prev", F.coalesce(F.sum("cap").over(w_prev), F.lit(0)))
        .withColumn(
            "capped",
            F.col("cap") * (F.col("nlang") - F.col("i") + 1)
            <= F.col("budget") - F.col("p_prev"),
        )
    )
    t = t.withColumn(
        "n_capped", F.sum(F.when(F.col("capped"), 1).otherwise(0)).over(w_all)
    ).withColumn(
        "p_capped",
        F.sum(F.when(F.col("capped"), F.col("cap")).otherwise(0)).over(w_all),
    )
    # integer `div` everywhere: a double quotient + floor would differ
    # from DuckDB's exact // above the 2^53 mantissa cliff
    return (
        t.selectExpr(
            "lang",
            "n",
            "cap",
            "CASE WHEN capped THEN cap "
            "ELSE (budget - p_capped) div (nlang - n_capped) END AS alloc",
            "(CASE WHEN capped THEN cap "
            "ELSE (budget - p_capped) div (nlang - n_capped) END * 100) div n "
            "AS epoch_pct",
        )
        .orderBy("lang")
    )


_TRAIN_UNIMAX_ORACLE = f"""
WITH g AS (
  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n FROM documents GROUP BY lang),
t AS (
  SELECT lang, n, n * {UNIMAX_EPOCH_CAP} AS cap,
         CAST(sum(n) OVER () // 2 AS BIGINT) AS budget,
         count(*) OVER () AS nlang,
         row_number() OVER (ORDER BY n * {UNIMAX_EPOCH_CAP}, lang) AS i,
         COALESCE(sum(n * {UNIMAX_EPOCH_CAP}) OVER (
           ORDER BY n * {UNIMAX_EPOCH_CAP}, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p_prev
  FROM g),
m AS (
  SELECT *, (cap * (nlang - i + 1) <= budget - p_prev) AS capped FROM t),
s AS (
  SELECT *,
         sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS n_capped,
         sum(CASE WHEN capped THEN cap ELSE 0 END) OVER () AS p_capped
  FROM m)
SELECT lang, n, cap,
       CAST(CASE WHEN capped THEN cap
                 ELSE (budget - p_capped) // (nlang - n_capped) END AS BIGINT)
         AS alloc,
       CAST((CASE WHEN capped THEN cap
                  ELSE (budget - p_capped) // (nlang - n_capped) END * 100) // n
            AS BIGINT) AS epoch_pct
FROM s ORDER BY lang
"""


SPECS.append(
    QuerySpec(
        "train_unimax",
        "UniMax budget allocation (Chung et al. 2023): integer-exact "
        "water-filling with a per-language epoch cap, closed form "
        "over sorted prefix sums",
        _train_unimax,
        _TRAIN_UNIMAX_ORACLE,
    )
)


# --------------------------------------------------------------- DoReMi

DOREMI_STEPS = 3      #: multiplicative-weights rounds (per-round batches)
DOREMI_ETA = 0.25     #: reweighting step size (paper's eta)
DOREMI_SMOOTH = 0.01  #: uniform smoothing mix (paper's c)
DOREMI_RND = 12       #: per-round weight rounding (decimals), cross-engine pin


def _doremi_domain_stats(spark: SparkSession, sf: str):
    """(per-domain, per-round) INTEGER excess-loss sums + counts.

    The fixture stands in for the proxy/reference model losses with
    deterministic integer functionals of (doc_id, n_chars) in
    milli-nats — proxy = (37·doc_id + n_chars) mod 1000, reference =
    (61·doc_id + 13) mod 1000 — so the per-domain mean excess is an
    EXACT bigint-sum / bigint-count ratio in both engines (no
    float-summation order anywhere near an aggregate; the
    train_unimax / train_temperature_mix contract).  Round r's batch
    is the ``doc_id % DOREMI_STEPS == r`` slice, giving each
    multiplicative-weights round its own excess signal the way DoReMi
    re-estimates per-step losses from fresh proxy batches."""
    d = load_table(spark, sf, "documents")
    exc = (
        "greatest(CAST(0 AS BIGINT), "
        "(37 * doc_id + n_chars) % 1000 - (61 * doc_id + 13) % 1000)"
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for r in range(DOREMI_STEPS):
        aggs.append(
            F.sum(
                F.expr(
                    f"CASE WHEN doc_id % {DOREMI_STEPS} = {r} "
                    f"THEN {exc} ELSE 0 END"
                )
            ).cast("long").alias(f"se{r}")
        )
        aggs.append(
            F.sum(
                F.expr(
                    f"CASE WHEN doc_id % {DOREMI_STEPS} = {r} THEN 1 ELSE 0 END"
                )
            ).cast("long").alias(f"sc{r}")
        )
    return d.groupBy("lang").agg(*aggs)


def _train_doremi(spark: SparkSession, sf: str) -> DataFrame:
    """DoReMi domain reweighting (Xie et al. 2023, arXiv:2305.10429):
    the published minimax alternative to hand-tuned mixture weights —
    a small proxy model's per-domain EXCESS loss (how much worse the
    proxy does than a reference, clipped at 0) drives multiplicative-
    weights updates, upweighting domains with the most headroom; the
    smoothed average of the per-round weights becomes the production
    mixture.  This operator is the pipeline leg: per-(domain, round)
    excess aggregation + the exponentiated-gradient recursion
    (λ_r ∝ w_{r-1}·exp(η·excess_r), w_r = (1-c)·normalize(λ_r) + c/L)
    over fixture-driven proxy losses (see ``_doremi_domain_stats``).

    Cross-engine determinism: the only corpus-cardinality aggregate is
    integer (bigint excess sums / counts — exact in any summation
    order); exp() runs on identical exact inputs in both engines and
    each round's weights round to :data:`DOREMI_RND` decimals before
    the L-term normalization sum, so a last-ulp libm divergence
    cannot propagate across rounds.

    Scale shape (the train_unimax contract): ONE hash exchange to
    domain cardinality; the recursion unrolls as window expressions
    over ~#domains rows (5 here, hundreds in production) — nothing
    downstream of the first aggregate grows with corpus size."""
    g = _doremi_domain_stats(spark, sf)
    t = g.withColumn("nlang", F.expr("count(*) OVER ()"))
    t = t.withColumn("w0", F.expr("round(1.0 / nlang, {})".format(DOREMI_RND)))
    for r in range(DOREMI_STEPS):
        t = t.withColumn(
            f"e{r}",
            F.expr(
                f"CASE WHEN sc{r} = 0 THEN CAST(0.0 AS DOUBLE) "
                f"ELSE CAST(se{r} AS DOUBLE) / sc{r} / 1000.0 END"
            ),
        )
        t = t.withColumn(
            f"u{r + 1}",
            F.expr(f"round(w{r} * exp({DOREMI_ETA} * e{r}), {DOREMI_RND})"),
        )
        t = t.withColumn(
            f"w{r + 1}",
            F.expr(
                f"round((1.0 - {DOREMI_SMOOTH}) * u{r + 1} "
                f"/ sum(u{r + 1}) OVER () "
                f"+ {DOREMI_SMOOTH} / nlang, {DOREMI_RND})"
            ),
        )
    avg_w = " + ".join(f"w{r + 1}" for r in range(DOREMI_STEPS))
    return t.selectExpr(
        "lang",
        "n_docs",
        # overall mean excess in exact ppm (integer: the per-domain
        # diagnostic the paper plots)
        f"(({' + '.join(f'se{r}' for r in range(DOREMI_STEPS))}) * 1000000) "
        f"div (({' + '.join(f'sc{r}' for r in range(DOREMI_STEPS))}) * 1000) "
        "AS excess_ppm",
        f"round(({avg_w}) / {DOREMI_STEPS}, 6) AS weight",
        f"round(w{DOREMI_STEPS}, 6) AS w_last",
    ).orderBy("lang")


def _doremi_oracle() -> str:
    """The same recursion, unrolled as DuckDB CTEs on identical exact
    integer inputs with the same per-round rounding pin."""
    exc = (
        "greatest(CAST(0 AS BIGINT), "
        "(37 * doc_id + n_chars) % 1000 - (61 * doc_id + 13) % 1000)"
    )
    sums = ", ".join(
        f"CAST(sum(CASE WHEN doc_id % {DOREMI_STEPS} = {r} THEN {exc} "
        f"ELSE 0 END) AS BIGINT) AS se{r}, "
        f"CAST(sum(CASE WHEN doc_id % {DOREMI_STEPS} = {r} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS sc{r}"
        for r in range(DOREMI_STEPS)
    )
    parts = [
        f"WITH g AS (SELECT lang, count(*) AS n_docs, {sums} "
        "FROM documents GROUP BY lang),",
        f"t0 AS (SELECT *, count(*) OVER () AS nlang, "
        f"round(1.0 / count(*) OVER (), {DOREMI_RND}) AS w0 FROM g),",
    ]
    for r in range(DOREMI_STEPS):
        parts.append(
            f"t{r}e AS (SELECT *, CASE WHEN sc{r} = 0 THEN CAST(0.0 AS DOUBLE) "
            f"ELSE CAST(se{r} AS DOUBLE) / sc{r} / 1000.0 END AS e{r}, "
            f"round(w{r} * exp({DOREMI_ETA} * CASE WHEN sc{r} = 0 "
            f"THEN CAST(0.0 AS DOUBLE) ELSE CAST(se{r} AS DOUBLE) / sc{r} "
            f"/ 1000.0 END), {DOREMI_RND}) AS u{r + 1} FROM t{r}),"
        )
        parts.append(
            f"t{r + 1} AS (SELECT *, round((1.0 - {DOREMI_SMOOTH}) * u{r + 1} "
            f"/ sum(u{r + 1}) OVER () + {DOREMI_SMOOTH} / nlang, "
            f"{DOREMI_RND}) AS w{r + 1} FROM t{r}e),"
        )
    avg_w = " + ".join(f"w{r + 1}" for r in range(DOREMI_STEPS))
    se_all = " + ".join(f"se{r}" for r in range(DOREMI_STEPS))
    sc_all = " + ".join(f"sc{r}" for r in range(DOREMI_STEPS))
    parts.append(
        f"fin AS (SELECT * FROM t{DOREMI_STEPS})\n"
        f"SELECT lang, n_docs, (({se_all}) * 1000000) // (({sc_all}) * 1000) "
        "AS excess_ppm, "
        f"round(({avg_w}) / {DOREMI_STEPS}, 6) AS weight, "
        f"round(w{DOREMI_STEPS}, 6) AS w_last "
        "FROM fin ORDER BY lang"
    )
    return "\n".join(parts)


_TRAIN_DOREMI_ORACLE = _doremi_oracle()


SPECS.append(
    QuerySpec(
        "train_doremi",
        "DoReMi domain reweighting (Xie et al. 2023): integer excess-"
        "loss aggregation + exponentiated-gradient rounds over domain-"
        "cardinality windows",
        _train_doremi,
        _TRAIN_DOREMI_ORACLE,
    )
)


# -------------------------------------------------------- RHO-LOSS

RHO_K_PCT = 25  #: select the top 25% of candidates by reducible loss


def _train_rho_loss(spark: SparkSession, sf: str) -> DataFrame:
    """RHO-LOSS data selection (Mindermann et al. 2022,
    arXiv:2206.07137, "Prioritized Training on Points that are
    Learnable, Worth Learning, and Not Yet Learnt"): score every
    candidate example by its *reducible holdout loss* — current
    training loss MINUS the irreducible loss an auxiliary model
    trained on held-out data assigns — and train on the top scorers.
    High training loss alone selects noise (unlearnable) and
    duplicates (already learnt elsewhere); subtracting the holdout
    loss cancels both, which is why this is the published selection
    rule next to loss-only and uniform sampling.

    Fixture stands in for the two models with deterministic integer
    functionals of (doc_id, n_chars) in milli-nats (train =
    (41·doc_id + n_chars) mod 1000, holdout = (29·doc_id + 7) mod
    1000 — the train_doremi convention), so scores and the selection
    boundary are integer-exact in both engines; ties at the boundary
    break on doc_id (deterministic, mirrored).

    Output: per-(lang, selected) cohort sizes and score means — the
    selection diagnostic the paper plots (selected cohorts should
    show high train loss but LOW holdout loss).

    Scale shape: scoring is map-only; the selection boundary is NOT a
    global row_number (a single-partition sort of the corpus — the
    one window shape that cannot scale) but the value-domain
    equivalent: rho takes < 2000 distinct integer values, so a
    (rho -> count) aggregate plus a strictly-greater cumulative sum
    over that BOUNDED domain gives every row's exact global rank as
    ``cgt(rho) + rank-within-rho`` — one hash exchange to value
    cardinality, a broadcast of the 2000-row boundary table back onto
    the scan, and a per-rho-value row_number (2000-key exchange) for
    the doc_id tie-break.  Identical selection to the global sort,
    rank for rank; the rollup is cohort-cardinality."""
    d = load_table(spark, sf, "documents")
    scored = d.selectExpr(
        "doc_id",
        "lang",
        "CAST((41 * doc_id + n_chars) % 1000 AS BIGINT) AS train_loss",
        "CAST((29 * doc_id + 7) % 1000 AS BIGINT) AS holdout_loss",
        "CAST((41 * doc_id + n_chars) % 1000 - (29 * doc_id + 7) % 1000 "
        "AS BIGINT) AS rho",
    )
    stats = (
        scored.groupBy("rho")
        .agg(F.count(F.lit(1)).alias("c"))
        .selectExpr(
            "rho",
            "coalesce(sum(c) OVER (ORDER BY rho DESC "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cgt",
            "sum(c) OVER () AS n_total",
        )
    )
    sel = scored.join(F.broadcast(stats), "rho").selectExpr(
        "lang",
        "train_loss",
        "holdout_loss",
        "rho",
        "CASE WHEN (cgt + row_number() OVER (PARTITION BY rho "
        f"ORDER BY doc_id)) * 100 <= n_total * {RHO_K_PCT} "
        "THEN 1 ELSE 0 END AS selected",
    )
    return (
        sel.groupBy("lang", "selected")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("train_loss").alias("__at"),
            F.avg("holdout_loss").alias("__ah"),
            F.avg("rho").alias("__ar"),
        )
        .selectExpr(
            "lang",
            "selected",
            "n",
            "round(__at, 4) AS avg_train_loss",
            "round(__ah, 4) AS avg_holdout_loss",
            "round(__ar, 4) AS avg_rho",
        )
        .orderBy("lang", "selected")
    )


_TRAIN_RHO_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST((41 * doc_id + n_chars) % 1000 AS BIGINT) AS train_loss,
         CAST((29 * doc_id + 7) % 1000 AS BIGINT) AS holdout_loss,
         CAST((41 * doc_id + n_chars) % 1000 - (29 * doc_id + 7) % 1000
              AS BIGINT) AS rho
  FROM documents),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rho DESC, doc_id) AS rnk,
         count(*) OVER () AS n_total
  FROM scored),
sel AS (
  SELECT lang, train_loss, holdout_loss, rho,
         CASE WHEN rnk * 100 <= n_total * {RHO_K_PCT}
              THEN 1 ELSE 0 END AS selected
  FROM ranked)
SELECT lang, selected, count(*) AS n,
       round(avg(train_loss), 4) AS avg_train_loss,
       round(avg(holdout_loss), 4) AS avg_holdout_loss,
       round(avg(rho), 4) AS avg_rho
FROM sel GROUP BY lang, selected ORDER BY lang, selected
"""


SPECS.append(
    QuerySpec(
        "train_rho_loss",
        "RHO-LOSS selection (Mindermann et al. 2022): reducible-"
        "holdout-loss scoring, integer-exact percentile boundary, "
        "cohort diagnostics",
        _train_rho_loss,
        _TRAIN_RHO_ORACLE,
    )
)
