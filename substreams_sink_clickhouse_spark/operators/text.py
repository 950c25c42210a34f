"""Text-analysis operators for large-scale training-data pipelines:
language ID (stopword heuristic), quality scoring, token counting,
document fingerprinting.

All expressions are built-in Catalyst functions (split / higher-order
array ops / regexp) — zero Python in the row path, so they vectorize
and scale linearly with the documents table.  Every operator has an
arithmetic-identical DuckDB oracle (hash family: functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.functions.hashing import (
    POLY_MOD,
    POLY_MULT,
    duck_md5_long_sql,
    md5_long,
    md5_long_sql,
)
from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table

#: Stopword marker sets for the language-ID heuristic.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "los", "y", "que"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "les", "et", "des", "une"],
}

_EN_STOPWORDS = _LANG_MARKERS["en"]


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _words(col: str = "text"):
    return F.split(F.lower(F.col(col)), " ")


def _marker_count(words_col, markers: list[str]):
    in_list = ", ".join(f"'{w}'" for w in markers)
    return F.size(F.expr(f"filter(__words, w -> w IN ({in_list}))"))


def _langid_scored(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document stopword hit counts for every marker language,
    carrying the TRUE ``lang`` label — the shared scorer of
    ``text_langid`` (per-doc prediction) and ``text_langid_eval``
    (confusion matrix against the labels)."""
    d = load_table(spark, sf, "documents").withColumn("__words", _words())
    return d.select(
        "doc_id",
        "lang",
        *[
            _marker_count(F.col("__words"), markers).alias(f"s_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )


def _langid_pred():
    """The argmax-with-fixed-priority prediction (en > es > de > fr,
    else 'und') over the _langid_scored hit counts."""
    return (
        F.when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") > 0),
            "en",
        )
        .when((F.col("s_es") >= F.col("s_de")) & (F.col("s_es") >= F.col("s_fr")) & (F.col("s_es") > 0), "es")
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") > 0), "de")
        .when(F.col("s_fr") > 0, "fr")
        .otherwise("und")
    )


def _langid(spark: SparkSession, sf: str) -> DataFrame:
    """Language ID: per-language stopword hit counts, argmax with a
    fixed priority order (en > es > de > fr, else 'und')."""
    return (
        _langid_scored(spark, sf)
        .select(
            "doc_id", _langid_pred().alias("lang_pred"),
            "s_en", "s_es", "s_de", "s_fr",
        )
        .orderBy("doc_id")
    )


_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w IN ({_sql_list(_LANG_MARKERS['en'])}))) AS INT) AS s_en,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w IN ({_sql_list(_LANG_MARKERS['es'])}))) AS INT) AS s_es,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w IN ({_sql_list(_LANG_MARKERS['de'])}))) AS INT) AS s_de,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w IN ({_sql_list(_LANG_MARKERS['fr'])}))) AS INT) AS s_fr
  FROM documents)
SELECT doc_id,
       CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
            WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
            WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
            WHEN s_fr > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred,
       s_en, s_es, s_de, s_fr
FROM scored ORDER BY doc_id
"""


def _text_langid_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID quality audit: the confusion matrix of the stopword
    heuristic against the corpus's TRUE ``lang`` labels, with
    per-true-language recall — the check a pipeline runs before
    trusting a cheap classifier to route 100 TB of documents (the
    fastText-vs-labels audit of CCNet-class pipelines, at this
    engine's heuristic tier).

    Integer-exact recall in basis points (``(n · 10000) div
    lang_total``).  Scale: one hash exchange to (lang, lang_pred)
    cardinality (≤ #langs² cells), then a window over those cells —
    nothing grows with corpus size."""
    from pyspark.sql import Window

    cells = (
        _langid_scored(spark, sf)
        .select("lang", _langid_pred().alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang")
    return (
        cells.withColumn("lang_total", F.sum("n").over(w))
        .selectExpr(
            "lang",
            "lang_pred",
            "n",
            "(n * 10000) div lang_total AS recall_bp",
        )
        .orderBy("lang", "lang_pred")
    )


_LANGID_EVAL_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w IN ({_sql_list(_LANG_MARKERS['en'])}))) AS INT) AS s_en,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w IN ({_sql_list(_LANG_MARKERS['es'])}))) AS INT) AS s_es,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w IN ({_sql_list(_LANG_MARKERS['de'])}))) AS INT) AS s_de,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w IN ({_sql_list(_LANG_MARKERS['fr'])}))) AS INT) AS s_fr
  FROM documents),
pred AS (
  SELECT lang,
         CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
              WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
              WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
              WHEN s_fr > 0 THEN 'fr'
              ELSE 'und' END AS lang_pred
  FROM scored),
cells AS (
  SELECT lang, lang_pred, count(*)::BIGINT AS n
  FROM pred GROUP BY lang, lang_pred)
SELECT lang, lang_pred, n,
       CAST((n * 10000) // sum(n) OVER (PARTITION BY lang) AS BIGINT)
         AS recall_bp
FROM cells ORDER BY lang, lang_pred
"""


def _quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality scoring: word count, uniqueness ratio, stopword ratio,
    and a bounded composite score — the classic cheap pre-filters for
    LLM corpus construction."""
    d = load_table(spark, sf, "documents").withColumn("__words", _words())
    n_words = F.size("__words")
    n_uniq = F.size(F.array_distinct("__words"))
    stop_hits = _marker_count(F.col("__words"), _EN_STOPWORDS)
    uniq_ratio = n_uniq.cast("double") / n_words.cast("double")
    stop_ratio = stop_hits.cast("double") / n_words.cast("double")
    quality = F.round(
        0.5 * uniq_ratio + 0.5 * F.least(n_words.cast("double") / 50.0, F.lit(1.0)), 4
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_uniq.alias("n_uniq"),
        F.round(uniq_ratio, 4).alias("uniq_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        quality.alias("quality"),
    ).orderBy("doc_id")


_QUALITY_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
SELECT doc_id,
       CAST(len(words) AS INT) AS n_words,
       CAST(len(list_distinct(words)) AS INT) AS n_uniq,
       round(CAST(len(list_distinct(words)) AS DOUBLE) / CAST(len(words) AS DOUBLE), 4) AS uniq_ratio,
       round(CAST(len(list_filter(words, x -> x IN ({_sql_list(_EN_STOPWORDS)}))) AS DOUBLE)
             / CAST(len(words) AS DOUBLE), 4) AS stop_ratio,
       round(0.5 * (CAST(len(list_distinct(words)) AS DOUBLE) / CAST(len(words) AS DOUBLE))
             + 0.5 * least(CAST(len(words) AS DOUBLE) / 50.0, 1.0), 4) AS quality
FROM w ORDER BY doc_id
"""

#: BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex count."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.regexp_count(F.lower(F.col("text")), F.lit(_TOKEN_RE)).alias("re_tokens"),
    ).orderBy("doc_id")


_TOKENS_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS INT) AS re_tokens
FROM documents ORDER BY doc_id
"""


def _fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling polynomial fingerprint over word hashes — order-aware
    (unlike a bag-of-words hash) and reproducible in any engine:
    ``h = (h * 131 + H(word) % P) % P`` folded left over the words."""
    d = load_table(spark, sf, "documents")
    fp = F.expr(
        f"""
        aggregate(
          transform(split(lower(text), ' '), w -> {md5_long_sql('w')} % {POLY_MOD}),
          CAST(0 AS BIGINT),
          (acc, x) -> (acc * {POLY_MULT} + x) % {POLY_MOD})
        """
    )
    # unordered result set (SQL semantics): skipping the presentation
    # sort saves a range exchange + sampler job per execution.  The
    # fp >= 0 predicate makes the fingerprint load-bearing: without it
    # a count-only action lets Catalyst prune the whole hash fold (a
    # deterministic projection is elidable), and a benchmark would
    # measure nothing.  Rows are unchanged (the fold is mod-P,
    # always non-negative) — the oracle carries the same predicate.
    return d.select("doc_id", fp.alias("fp")).filter(F.col("fp") >= 0)


_FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(lower(text), ' '),
                          w -> {duck_md5_long_sql('w')} % {POLY_MOD})),
         (acc, x) -> (acc * {POLY_MULT} + x) % {POLY_MOD}) AS fp
FROM documents
WHERE list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(lower(text), ' '),
                         w -> {duck_md5_long_sql('w')} % {POLY_MOD})),
        (acc, x) -> (acc * {POLY_MULT} + x) % {POLY_MOD}) >= 0
ORDER BY doc_id
"""


def _text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus stats per language tag (SURVEY Q30 declared query)."""
    d = load_table(spark, sf, "documents")
    return (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.avg("n_chars"), 4).alias("avg_chars"))
        .orderBy("lang")
    )


def _tfidf(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language top-3 terms by TF-IDF.

    Classic two-aggregate shape: term frequency per (lang, term) and
    document frequency per term are independent group-bys over the
    token explosion; N (corpus size) broadcasts as a 1-row cross join.
    Ranking rounds the score to 6 decimals before ordering so a 1-ulp
    ``ln`` difference between engines can never flip a rank.
    At scale: both aggregates are map-side partial; the explode never
    materializes — it feeds straight into hash aggregation.
    """
    from pyspark.sql.window import Window

    d = load_table(spark, sf, "documents")
    tokens = d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    tf = tokens.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("tfsum"))
    df_term = tokens.select("doc_id", "w").distinct().groupBy("w").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df_term, "w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tfsum") * F.log((F.col("n") + 1) / (F.col("df") + 1)),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc(F.round("score", 6)), F.col("w"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "rn", F.col("w").alias("term"), F.round("score", 4).alias("score"))
        .orderBy("lang", "rn")
    )


_TFIDF_ORACLE = """
WITH tokens AS (
  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
tf AS (SELECT lang, w, count(*) AS tfsum FROM tokens GROUP BY lang, w),
df_term AS (
  SELECT w, count(*) AS df FROM (SELECT DISTINCT doc_id, w FROM tokens) t GROUP BY w),
n_docs AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.lang, tf.w, tf.tfsum * ln((n_docs.n + 1.0) / (df_term.df + 1.0)) AS score
  FROM tf JOIN df_term ON tf.w = df_term.w CROSS JOIN n_docs),
ranked AS (
  SELECT lang, w,
         row_number() OVER (PARTITION BY lang ORDER BY round(score, 6) DESC, w) AS rn,
         score
  FROM scored)
SELECT lang, rn, w AS term, round(score, 4) AS score
FROM ranked WHERE rn <= 3 ORDER BY lang, rn
"""


def _normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Text normalization — the first stage of every training-data
    pipeline: lowercase, strip non-alphanumerics, collapse runs of
    whitespace, trim.  Pure regexp/string Catalyst expressions (one
    map-side pass, no shuffle before the output ordering); emits a
    prefix + token count so the oracle hash stays readable."""
    d = load_table(spark, sf, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return (
        d.select(
            "doc_id",
            F.substring(norm, 1, 40).alias("prefix"),
            F.size(F.split(norm, " ")).alias("n_tokens"),
            F.length(norm).alias("n_chars_norm"),
        )
        .orderBy("doc_id")
    )


_NORMALIZE_ORACLE = """
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS t
  FROM documents)
SELECT doc_id,
       substr(t, 1, 40) AS prefix,
       len(string_split(t, ' ')) AS n_tokens,
       length(t) AS n_chars_norm
FROM norm ORDER BY doc_id
"""


# ---------------------------------------------------------------- PII scrub

#: PII redaction — a standard corpus-prep step (emails/phone numbers
#: masked before training).  The fixture text carries no PII, so both
#: engines inject it identically first (every 10th doc gains a
#: deterministic email + phone tail), then scrub: patterns are kept to
#: the regex subset where Java regex (Spark) and RE2 (DuckDB) agree.
_PII_EMAIL = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PII_PHONE = "555-[0-9]{4}"


def _pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """Inject-then-scrub: redact emails/phones to <EMAIL>/<PHONE> and
    count redactions per doc.  Row-parallel regexp passes (JVM codegen,
    no shuffle until the final order) — the scrub step costs one scan
    at any corpus size."""
    d = load_table(spark, sf, "documents")
    tail = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" asap"),
    )
    injected = d.withColumn(
        "t", F.when(F.col("doc_id") % 10 == 0, F.concat(F.col("text"), tail)).otherwise(F.col("text"))
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
    )
    return (
        injected.select(
            "doc_id",
            F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).alias("n_emails"),
            F.regexp_count(F.col("t"), F.lit(_PII_PHONE)).alias("n_phones"),
            scrubbed.alias("scrubbed"),
        )
        .filter((F.col("n_emails") > 0) | (F.col("n_phones") > 0))
        .orderBy("doc_id")
    )


_PII_ORACLE = f"""
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                          '@example.com or call 555-',
                          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' asap')
              ELSE text END AS t
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phones,
       regexp_replace(regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                      '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed
FROM injected
WHERE len(regexp_extract_all(t, '{_PII_EMAIL}')) > 0
   OR len(regexp_extract_all(t, '{_PII_PHONE}')) > 0
ORDER BY doc_id
"""


#: corpus_prep thresholds — quality floor + per-language keep rates.
_PREP_MIN_QUALITY = 0.5
_PREP_RATE_EN = 50
_PREP_RATE_OTHER = 80


def _lang_pred_cols(df: DataFrame) -> DataFrame:
    """Stopword-hit columns + argmax language prediction (shared by
    _langid and corpus_prep so both stay bit-identical)."""
    scored = df.select(
        "*",
        *[
            _marker_count(F.col("__words"), markers).alias(f"s_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") > 0),
            "en",
        )
        .when((F.col("s_es") >= F.col("s_de")) & (F.col("s_es") >= F.col("s_fr")) & (F.col("s_es") > 0), "es")
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") > 0), "de")
        .when(F.col("s_fr") > 0, "fr")
        .otherwise("und")
    )
    return scored.withColumn("lang_pred", pred)


def _corpus_prep(spark: SparkSession, sf: str) -> DataFrame:
    """The end-to-end corpus-preparation pipeline as ONE Spark plan —
    what this engine exists to run at 100 TB:

    1. tokenize (map-side),
    2. quality score; drop low-quality docs (map-side filter),
    3. language-ID; drop unidentified docs (map-side filter),
    4. exact-dedup, deterministic lowest-id keeper (one shuffle on the
       text key — the FIRST shuffle in the whole pipeline, and it runs
       on the already-filtered survivors),
    5. per-language stratified sample by stable content hash
       (map-side filter; reproducible across runs/engines/partitions).

    Filters run before the dedup shuffle, so the only wide exchange
    handles the post-filter survivor set — the ordering that matters
    when steps 1-3 drop most of a crawl.
    """
    from pyspark.sql import Window

    from substreams_sink_clickhouse_spark.functions.hashing import md5_long

    d = load_table(spark, sf, "documents").withColumn("__words", _words())
    n_words = F.size("__words")
    n_uniq = F.size(F.array_distinct("__words"))
    quality = F.round(
        0.5 * (n_uniq.cast("double") / n_words.cast("double"))
        + 0.5 * F.least(n_words.cast("double") / 50.0, F.lit(1.0)),
        4,
    )
    staged = _lang_pred_cols(d.select("doc_id", "text", "__words")).withColumn(
        "quality", quality
    )
    filtered = staged.filter(
        (F.col("quality") >= _PREP_MIN_QUALITY) & (F.col("lang_pred") != "und")
    )
    keep_w = Window.partitionBy("text")
    deduped = (
        filtered.withColumn("__keeper", F.min("doc_id").over(keep_w))
        .filter(F.col("doc_id") == F.col("__keeper"))
    )
    rate = F.when(F.col("lang_pred") == "en", _PREP_RATE_EN).otherwise(_PREP_RATE_OTHER)
    sampled = deduped.filter(
        md5_long(F.concat(F.lit("corpus:"), F.col("doc_id").cast("string"))) % 100 < rate
    )
    # unordered result set; see _text_fingerprint's note
    return sampled.select("doc_id", "lang_pred", "quality")


def _corpus_prep_oracle() -> str:
    langs = {
        lang: f"CAST(len(list_filter(words, w -> w IN ({_sql_list(markers)}))) AS INT)"
        for lang, markers in _LANG_MARKERS.items()
    }
    key = duck_md5_long_sql("CONCAT('corpus:', CAST(doc_id AS VARCHAR))")
    return f"""
WITH w AS (
  SELECT doc_id, text, string_split(lower(text), ' ') AS words FROM documents),
scored AS (
  SELECT doc_id, text,
         {langs['en']} AS s_en,
         {langs['es']} AS s_es,
         {langs['de']} AS s_de,
         {langs['fr']} AS s_fr,
         round(0.5 * (CAST(len(list_distinct(words)) AS DOUBLE) / CAST(len(words) AS DOUBLE))
               + 0.5 * least(CAST(len(words) AS DOUBLE) / 50.0, 1.0), 4) AS quality
  FROM w),
pred AS (
  SELECT *,
         CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
              WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
              WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
              WHEN s_fr > 0 THEN 'fr'
              ELSE 'und' END AS lang_pred
  FROM scored),
filtered AS (
  SELECT * FROM pred WHERE quality >= {_PREP_MIN_QUALITY} AND lang_pred <> 'und'),
deduped AS (
  SELECT * FROM (
    SELECT *, min(doc_id) OVER (PARTITION BY text) AS keeper FROM filtered) t
  WHERE doc_id = keeper)
SELECT doc_id, lang_pred, quality
FROM deduped
WHERE {key} % 100 < CASE WHEN lang_pred = 'en' THEN {_PREP_RATE_EN} ELSE {_PREP_RATE_OTHER} END
ORDER BY doc_id
"""


# ------------------------------------------------------------ chunking

#: Context-window chunking: windows of CHUNK_WORDS words at
#: CHUNK_STRIDE spacing (overlap = CHUNK_WORDS - CHUNK_STRIDE).
CHUNK_WORDS = 32
CHUNK_STRIDE = 24


def _chunk(spark: SparkSession, sf: str) -> DataFrame:
    """Document chunking for context-window training: split each doc
    into overlapping ``CHUNK_WORDS``-word windows every
    ``CHUNK_STRIDE`` words — the standard pretraining-tokenizer prep
    stage (every word is covered; consecutive chunks overlap by 8
    words so no training example spans a hard cut).

    Spark shape: ``sequence`` + ``explode`` fan-out, then pure
    column-level ``slice``/``array_join`` — narrow (no shuffle at
    all), so at 100 TB it streams: output partitioning = input
    partitioning, each task emitting ~n_words/stride rows per doc.
    Chunks are emitted as 60-bit content hashes (the downstream
    contract for dedup/contamination checks) plus word counts.
    """
    d = load_table(spark, sf, "documents")
    chunks = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .withColumn("n_words", F.size("w"))
        .select(
            "doc_id",
            "w",
            F.explode(
                F.expr(f"sequence(0, CAST(floor((n_words - 1) / {CHUNK_STRIDE}) AS INT))")
            ).alias("chunk_ix"),
        )
        .select(
            "doc_id",
            "chunk_ix",
            F.expr(f"slice(w, chunk_ix * {CHUNK_STRIDE} + 1, {CHUNK_WORDS})").alias("cw"),
        )
    )
    return chunks.select(
        "doc_id",
        "chunk_ix",
        F.size("cw").alias("n_chunk_words"),
        md5_long(F.array_join("cw", " ")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_ix")


_CHUNK_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS nw
  FROM documents),
idx AS (
  SELECT doc_id, w,
         unnest(range(0, CAST(floor((nw - 1) / {CHUNK_STRIDE}) AS INT) + 1)) AS chunk_ix
  FROM w)
SELECT doc_id, chunk_ix,
       len(w[chunk_ix * {CHUNK_STRIDE} + 1 : chunk_ix * {CHUNK_STRIDE} + {CHUNK_WORDS}]) AS n_chunk_words,
       {duck_md5_long_sql(f"array_to_string(w[chunk_ix * {CHUNK_STRIDE} + 1 : chunk_ix * {CHUNK_STRIDE} + {CHUNK_WORDS}], ' ')")} AS chunk_hash
FROM idx ORDER BY doc_id, chunk_ix
"""


def _repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    fraction and duplicate-bigram fraction, plus a keep/drop flag.

    Both signals are pure higher-order array expressions on one row —
    ``array_distinct`` over the token list and over a generated bigram
    list — so the operator is a narrow, shuffle-free scan; the filter
    flag makes it directly usable as a corpus-prep quality gate.
    """
    d = load_table(spark, sf, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    c = d.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.expr(
            "transform(sequence(1, size(toks) - 1),"
            " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        ).alias("bigrams"),
    )
    word_rep = F.round(1.0 - F.col("n_uniq") / F.col("n_tokens"), 4)
    bigram_rep = F.round(
        1.0 - F.size(F.array_distinct("bigrams")) / F.size("bigrams"), 4
    )
    return (
        c.filter(F.col("n_tokens") >= 2)
        .select(
            "doc_id",
            "n_tokens",
            word_rep.alias("word_rep"),
            bigram_rep.alias("bigram_rep"),
            (word_rep <= F.lit(0.2)).alias("keep"),
        )
        .orderBy("doc_id")
    )


_REPETITION_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
c AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_uniq,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
  FROM t)
SELECT doc_id, n_tokens,
       round(1.0 - n_uniq * 1.0 / n_tokens, 4) AS word_rep,
       round(1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams), 4) AS bigram_rep,
       round(1.0 - n_uniq * 1.0 / n_tokens, 4) <= 0.2 AS keep
FROM c WHERE n_tokens >= 2 ORDER BY doc_id
"""


def _packing(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing for context windows: assign documents (ordered
    by doc_id within each language) to contiguous bins of a 512-token
    budget via the exclusive prefix sum of token counts, then report
    per-bin document count and token totals.

    This is the cumulative-budget formulation of packing (bin =
    floor(exclusive_prefix / budget)): deterministic, one shuffle on
    lang, and the window never materializes the documents — only their
    token counts.  Greedy first-fit packing is order-dependent and
    non-relational; the contiguous form is what a distributed pipeline
    actually runs before a pack-local consolidation pass.
    """
    d = load_table(spark, sf, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    t = d.select("doc_id", "lang", F.size(toks).alias("n_tok"))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = t.withColumn(
        "bin",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(512)).cast("long"),
    )
    return (
        c.groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .orderBy("lang", "bin")
    )


_PACKING_ORACLE = """
WITH t AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
  FROM documents),
c AS (
  SELECT lang, n_tok,
         cast(floor((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
              / 512) AS BIGINT) AS bin
  FROM t)
SELECT lang, bin, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM c GROUP BY lang, bin ORDER BY lang, bin
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "text_chunk",
        "Context-window chunking (overlapping strided word windows)",
        _chunk,
        _CHUNK_ORACLE,
    ),
    QuerySpec(
        "corpus_prep",
        "End-to-end corpus prep: tokenize, quality-filter, lang-ID, "
        "dedup-keeper, stratified sample — one plan",
        _corpus_prep,
        _corpus_prep_oracle(),
    ),
    QuerySpec(
        "text_normalize",
        "Normalization pass: lowercase/strip/collapse whitespace",
        _normalize,
        _NORMALIZE_ORACLE,
    ),
    QuerySpec(
        "text_stats",
        "Corpus stats by language (Q30)",
        _text_stats,
        """
        SELECT lang, count(*) AS cnt, round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang
        """,
    ),
    QuerySpec("text_langid", "Language-ID stopword heuristic", _langid, _LANGID_ORACLE),
    QuerySpec(
        "text_langid_eval",
        "Language-ID confusion matrix vs true labels with per-language "
        "recall (basis points, integer-exact)",
        _text_langid_eval,
        _LANGID_EVAL_ORACLE,
    ),
    QuerySpec("text_quality", "Document quality scoring", _quality, _QUALITY_ORACLE),
    QuerySpec("text_tokens", "Whitespace + BPE-ish token counting", _tokens, _TOKENS_ORACLE),
    QuerySpec(
        "text_fingerprint",
        "Order-aware rolling-hash document fingerprint",
        _fingerprint,
        _FINGERPRINT_ORACLE,
    ),
    QuerySpec(
        "text_tfidf",
        "Per-language top terms by TF-IDF",
        _tfidf,
        _TFIDF_ORACLE,
    ),
    QuerySpec(
        "text_pii_scrub",
        "PII redaction: mask emails/phones, count redactions",
        _pii_scrub,
        _PII_ORACLE,
    ),
    QuerySpec(
        "text_repetition",
        "Gopher-style duplicate word/bigram repetition signals",
        _repetition,
        _REPETITION_ORACLE,
    ),
    QuerySpec(
        "text_packing",
        "Context-window sequence packing by cumulative token budget",
        _packing,
        _PACKING_ORACLE,
    ),
]


def _unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram language-model scoring — the classic corpus-level
    quality/outlier signal a pretraining pipeline computes before any
    neural model exists: train unigram counts on the corpus itself,
    then score each document by its average token log-probability and
    roll the scores up per language.

    Two map-side-partial aggregates (unigram counts; per-doc sums) and
    one broadcast of the vocabulary — the fact-side token explosion
    never materializes and is consumed by hash aggregation.  Rounded
    before the final fold so summation order can't leak into the hash.
    """
    d = load_table(spark, sf, "documents")
    tokens = d.select("doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    uni = tokens.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = tokens.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tokens.join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("n"))), 6
            ).alias("avg_lp")
        )
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("avg_lp"), 4).alias("mean_lp"),
            F.round(F.min("avg_lp"), 4).alias("worst_lp"),
        )
        .orderBy("lang")
    )


_UNIGRAM_ORACLE = """
WITH tokens AS (
  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
uni AS (SELECT w, count(*) AS c FROM tokens GROUP BY w),
total AS (SELECT count(*) AS n FROM tokens),
scored AS (
  SELECT doc_id, lang, round(avg(ln(c::DOUBLE / n)), 6) AS avg_lp
  FROM tokens JOIN uni USING (w) CROSS JOIN total
  GROUP BY doc_id, lang)
SELECT lang, count(*) AS n_docs,
       round(avg(avg_lp), 4) AS mean_lp,
       round(min(avg_lp), 4) AS worst_lp
FROM scored GROUP BY lang ORDER BY lang
"""


SPECS.append(
    QuerySpec(
        "text_unigram_logprob",
        "Unigram LM scoring: per-doc avg log-prob, per-lang rollup",
        _unigram_logprob,
        _UNIGRAM_ORACLE,
    )
)


# -------------------------------------------------- Gopher quality rules

#: The Gopher corpus-filtering stop words (Rae et al. 2021, "Scaling
#: Language Models: Methods, Analysis & Insights from Training
#: Gopher", appendix A1.1 — public paper): a document must contain at
#: least two of these to pass.
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_flags(d: DataFrame) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, app. A1.1)
    over any ``(doc_id, text, ...)`` DataFrame — shared by the gate
    entry below and the composable :class:`~.corpus.Corpus` API —
    as per-document flags plus the composite verdict:

    * 50 <= word count <= 100000
    * 3 <= mean word length <= 10
    * symbol-to-word ratio ('#' or '...') <= 0.1
    * <= 90% of lines start with a bullet ('-', '*', or the bullet
      glyph)
    * <= 30% of lines end with an ellipsis
    * >= 80% of words contain an alphabetic character
    * >= 2 distinct Gopher stop words present

    Everything is JVM higher-order functions over the split word/line
    arrays — one narrow projection, no shuffle, no Python.  At 100 TB
    this is a map-only stage that pipelines into whatever filter or
    aggregation consumes the verdict."""
    d = d.withColumn("__words", _words())
    n_words = F.size("__words").cast("double")
    mean_wlen = (
        F.expr("aggregate(__words, 0L, (a, w) -> a + length(w))").cast("double")
        / n_words
    )
    sym = (
        F.regexp_count(F.col("text"), F.lit(r"#"))
        + F.regexp_count(F.col("text"), F.lit(r"\.\.\."))
    ).cast("double")
    alpha_frac = (
        F.size(F.expr("filter(__words, w -> w rlike '[a-z]')")).cast("double")
        / n_words
    )
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines).cast("double")
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.trim(l).startswith("-")
                | F.trim(l).startswith("*")
                | F.trim(l).startswith("•"),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: F.trim(l).endswith("..."))).cast("double")
        / n_lines
    )
    stop_in = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)
    stop_present = F.size(
        F.expr(f"filter(array_distinct(__words), w -> w IN ({stop_in}))")
    )
    r_count = (n_words >= 50) & (n_words <= 100000)
    r_wlen = (mean_wlen >= 3) & (mean_wlen <= 10)
    r_sym = (sym / n_words) <= 0.1
    r_bullet = bullet_frac <= 0.9
    r_ellipsis = ellipsis_frac <= 0.3
    r_alpha = alpha_frac >= 0.8
    r_stop = stop_present >= 2
    gopher_pass = r_count & r_wlen & r_sym & r_bullet & r_ellipsis & r_alpha & r_stop
    return d.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_wlen"),
        F.round(sym / n_words, 4).alias("symbol_ratio"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        F.round(bullet_frac, 4).alias("bullet_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_frac"),
        stop_present.alias("stop_present"),
        gopher_pass.cast("int").alias("gopher_pass"),
    )


def _gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    return gopher_flags(load_table(spark, sf, "documents")).orderBy("doc_id")


_GOPHER_ORACLE = f"""
WITH w AS (
  SELECT doc_id, text,
         string_split(lower(text), ' ') AS words,
         string_split(text, chr(10)) AS lines
  FROM documents),
m AS (
  SELECT doc_id,
         len(words)::DOUBLE AS n_words,
         list_sum(list_transform(words, x -> length(x)))::DOUBLE
           / len(words)::DOUBLE AS mean_wlen,
         (len(regexp_extract_all(text, '#'))
          + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE AS sym,
         len(list_filter(words, x -> regexp_matches(x, '[a-z]')))::DOUBLE
           / len(words)::DOUBLE AS alpha_frac,
         len(lines)::DOUBLE AS n_lines,
         len(list_filter(lines, l -> starts_with(trim(l), '-')
                                   OR starts_with(trim(l), '*')
                                   OR starts_with(trim(l), chr(8226))))::DOUBLE
           / len(lines)::DOUBLE AS bullet_frac,
         len(list_filter(lines, l -> ends_with(trim(l), '...')))::DOUBLE
           / len(lines)::DOUBLE AS ellipsis_frac,
         len(list_filter(list_distinct(words),
                         x -> x IN ({_sql_list(_GOPHER_STOPWORDS)}))) AS stop_present
  FROM w)
SELECT doc_id,
       CAST(n_words AS INT) AS n_words,
       round(mean_wlen, 4) AS mean_wlen,
       round(sym / n_words, 4) AS symbol_ratio,
       round(alpha_frac, 4) AS alpha_frac,
       round(bullet_frac, 4) AS bullet_frac,
       round(ellipsis_frac, 4) AS ellipsis_frac,
       stop_present,
       CAST(n_words BETWEEN 50 AND 100000
            AND mean_wlen BETWEEN 3 AND 10
            AND sym / n_words <= 0.1
            AND bullet_frac <= 0.9
            AND ellipsis_frac <= 0.3
            AND alpha_frac >= 0.8
            AND stop_present >= 2 AS INT) AS gopher_pass
FROM m ORDER BY doc_id
"""


SPECS.append(
    QuerySpec(
        "text_gopher_rules",
        "Gopher quality-rule flags + composite verdict per document",
        _gopher_rules,
        _GOPHER_ORACLE,
    )
)


# ------------------------------------------------------------ BM25

#: Query terms drawn from the fixture vocabulary.
_BM25_TERMS = ["table", "join", "fast"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 (Robertson et al., public IR baseline) for a fixed
    3-term query over ``documents``: idf from document frequencies,
    per-doc tf via array filters.

    Spark-first shape: per-term tf is ``size(filter(words, = term))``
    — a map-only projection, no explode, no posting-list shuffle.  The
    corpus stats (N, avgdl, per-term df) reduce to ONE tiny aggregate
    that broadcasts back; the scan is read once for stats and once for
    scoring (a cluster would cache the corpus).  Top-20 by score is a
    TakeOrderedAndProject."""
    d = load_table(spark, sf, "documents").withColumn("__words", _words())
    dl = F.size("__words")
    tf_cols = [
        F.size(F.expr(f"filter(__words, w -> w = '{t}')")).alias(f"tf_{i}")
        for i, t in enumerate(_BM25_TERMS)
    ]
    scored = d.select("doc_id", dl.alias("dl"), *tf_cols)
    stats = scored.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{i}") > 0, 1)).cast("double").alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    j = scored.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(_BM25_TERMS)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5) + 1.0
        )
        term = idf * (
            tf
            * (_BM25_K1 + 1.0)
            / (
                tf
                + _BM25_K1
                * (1.0 - _BM25_B + _BM25_B * F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
        score = term if score is None else score + term
    return (
        j.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


def _bm25_oracle() -> str:
    tf_exprs = ",\n         ".join(
        f"len(list_filter(words, w -> w = '{t}'))::DOUBLE AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_exprs = ",\n         ".join(
        f"count(*) FILTER (tf_{i} > 0)::DOUBLE AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    terms = " + ".join(
        f"ln((n - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * ({_BM25_K1} + 1.0)"
        f" / (tf_{i} + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl)))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH scored AS (
  SELECT doc_id, len(words)::DOUBLE AS dl,
         {tf_exprs}
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents) t),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl,
         {df_exprs}
  FROM scored)
SELECT doc_id, round({terms}, 6) AS bm25
FROM scored, stats
ORDER BY bm25 DESC, doc_id LIMIT 20
"""


SPECS.append(
    QuerySpec(
        "text_bm25",
        "Okapi BM25 top-20 for a fixed query (map-only tf, one stats broadcast)",
        _bm25,
        _bm25_oracle(),
    )
)


# ------------------------------------------------------- dataset card

def _corpus_card(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-card summary — the one-row corpus report a training-data
    release ships with: document/token/char volume, language and
    source breadth, exact-duplicate rate, and the Gopher-pass rate.

    One scan, two stacked aggregates (the text-hash distinct count
    rides the same pass via count_distinct on the 60-bit content
    hash); everything is map-side-partial-friendly, so the report
    costs a single pass over 100 TB."""
    d = load_table(spark, sf, "documents").withColumn("__words", _words())
    n_words = F.size("__words").cast("long")
    h = F.expr(
        "CAST(CONV(SUBSTR(MD5(text), 1, 15), 16, 10) AS BIGINT)"
    )
    stop_in = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)
    gopher_pass = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (
            F.size(F.expr(f"filter(array_distinct(__words), w -> w IN ({stop_in}))"))
            >= 2
        )
    ).cast("int")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_words).alias("total_words"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
        F.count_distinct(F.col("lang")).alias("n_langs"),
        F.count_distinct(F.col("source")).alias("n_sources"),
        F.count_distinct(h).alias("distinct_texts"),
        F.round(
            (F.count(F.lit(1)) - F.count_distinct(h)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
        F.round(F.avg(gopher_pass), 4).alias("gopher_pass_rate"),
    )


_CORPUS_CARD_ORACLE = f"""
WITH d AS (
  SELECT text, lang, source,
         string_split(lower(text), ' ') AS words,
         {duck_md5_long_sql('text')} AS h
  FROM documents)
SELECT count(*) AS n_docs,
       sum(len(words))::BIGINT AS total_words,
       sum(length(text))::BIGINT AS total_chars,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       count(DISTINCT h) AS distinct_texts,
       round((count(*) - count(DISTINCT h))::DOUBLE / count(*), 6) AS exact_dup_rate,
       round(avg(CAST(len(words) BETWEEN 50 AND 100000
                 AND len(list_filter(list_distinct(words),
                         w -> w IN ({_sql_list(_GOPHER_STOPWORDS)}))) >= 2 AS INT)), 4)
         AS gopher_pass_rate
FROM d
"""


SPECS.append(
    QuerySpec(
        "corpus_card",
        "Dataset-card summary: volume, breadth, dup rate, quality pass rate",
        _corpus_card,
        _CORPUS_CARD_ORACLE,
    )
)


# ------------------------------------------------------ BPE pair counts

def bpe_pair_counts(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """One BPE-training iteration's core: corpus-wide adjacent
    symbol-pair counts over word-frequency-weighted character symbols
    (the end-of-word marker ``_`` closes each word, the classic BPE
    formulation).

    Scale design — the reason BPE training is feasible at 100 TB at
    all: pair counting runs over the DISTINCT-WORD table, not the
    corpus.  The first exchange collapses the corpus to (word, freq) —
    vocabulary cardinality, millions of rows, not billions — and every
    later stage (symbol split, pair explosion, pair aggregation) grows
    with vocabulary size only.  Each subsequent merge iteration would
    re-run stages 2-3 on the same (word, freq) table with an updated
    symbol split; the corpus is never re-read.

    The word filter pins ``^[a-z0-9]+$`` so the ``_`` marker can never
    collide with a word character (and both engines tokenize
    identically).
    """
    words = docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).where(F.col("w").rlike("^[a-z0-9]+$"))
    wf = words.groupBy("w").agg(F.count("*").alias("f"))
    pairs = wf.select(
        F.concat(F.col("w"), F.lit("_")).alias("sw"), "f"
    ).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(sw) - 1), "
                "__i -> substring(sw, __i, 2))"
            )
        ).alias("pair"),
        "f",
    )
    pc = pairs.groupBy("pair").agg(F.sum("f").cast("long").alias("cnt"))
    top = pc.orderBy(F.desc("cnt"), "pair").limit(top_k)
    w_rank = Window.orderBy(F.desc("cnt"), "pair")
    return top.select(
        F.row_number().over(w_rank).cast("int").alias("rank"), "pair", "cnt"
    )


def _text_bpe_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 BPE merge candidates over the documents corpus."""
    return bpe_pair_counts(load_table(spark, sf, "documents"), top_k=50)


_BPE_PAIRS_ORACLE = r"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents
), wf AS (
  SELECT w, count(*)::BIGINT AS f
  FROM words WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w
), sym AS (
  SELECT w || '_' AS sw, f FROM wf
), pairs AS (
  SELECT substr(sw, i, 2) AS pair, f
  FROM sym, LATERAL (SELECT unnest(generate_series(1, length(sw) - 1)) AS i)
), pc AS (
  SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM pairs GROUP BY pair
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT) AS rank,
       pair, cnt
FROM pc
ORDER BY cnt DESC, pair
LIMIT 50
"""


SPECS.append(
    QuerySpec(
        "text_bpe_pairs",
        "BPE tokenizer training step: corpus-wide weighted symbol-pair "
        "counts over the distinct-word table",
        _text_bpe_pairs,
        _BPE_PAIRS_ORACLE,
    )
)


def bpe_merge_step(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """One FULL BPE training iteration: learn the best merge from the
    pair counts, re-tokenize the vocabulary with it applied, and
    return the next iteration's top pair counts.

    Pair identity after a merge is ``s1 + '+' + s2`` (symbols grow
    beyond one character, so bare concatenation would be ambiguous:
    ``ab|c`` vs ``a|bc``).  The merge applies left-to-right over
    non-overlapping occurrences, the standard BPE rule — the fold's
    replace-last step never re-merges the symbol it just built.

    Scale design: identical to :func:`bpe_pair_counts` — every stage
    past the corpus scan runs on the (word, freq) vocabulary table;
    the learned merge arrives as a scalar-subquery broadcast (no
    nested-loop join, no driver collect).
    """
    from substreams_sink_clickhouse_spark.functions.skew import ensure_parallelism

    # the re-tokenize fold (aggregate() over each word's characters) is
    # the per-row-expensive stage; parallelism must not be pinned to
    # the fixture's single-row-group scan (measured: 3.6 s of 1-task
    # executor time at sf0.1).  No-op at real scale.
    ensure_parallelism(docs).select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).where(F.col("w").rlike("^[a-z0-9]+$")).groupBy("w").agg(
        F.count("*").alias("f")
    ).createOrReplaceTempView("__bpe_wf")
    spark = docs.sparkSession
    return spark.sql(
        """
        WITH pc1 AS (
          SELECT pair, CAST(sum(f) AS BIGINT) AS cnt
          FROM (
            SELECT explode(transform(sequence(1, length(w)),
                     __i -> concat(substring(concat(w, '_'), __i, 1), '+',
                                   substring(concat(w, '_'), __i + 1, 1)))) AS pair,
                   f
            FROM __bpe_wf WHERE length(w) >= 1
          )
          WHERE length(pair) = 3  -- drops the final open pair ('x' + '')
          GROUP BY pair
        ), best AS (
          SELECT pair FROM pc1 ORDER BY cnt DESC, pair LIMIT 1
        ), merged AS (
          -- the learned merge is projected as a COLUMN first: Spark
          -- does not evaluate scalar subqueries inside HOF lambdas
          SELECT aggregate(
                   transform(sequence(1, length(w) + 1),
                             __i -> substring(concat(w, '_'), __i, 1)),
                   CAST(array() AS ARRAY<STRING>),
                   (__acc, __s) -> CASE
                     WHEN size(__acc) > 0
                          AND concat(element_at(__acc, -1), '+', __s) = bp
                     THEN concat(slice(__acc, 1, size(__acc) - 1),
                                 array(concat(element_at(__acc, -1), __s)))
                     ELSE concat(__acc, array(__s)) END) AS syms,
                 f
          FROM (SELECT w, f, (SELECT pair FROM best) AS bp FROM __bpe_wf)
        )
        SELECT pair, cnt FROM (
          SELECT pair, CAST(sum(f) AS BIGINT) AS cnt
          FROM (
            SELECT explode(transform(sequence(1, size(syms) - 1),
                     __i -> concat(element_at(syms, __i), '+',
                                   element_at(syms, __i + 1)))) AS pair,
                   f
            FROM merged WHERE size(syms) >= 2
          )
          GROUP BY pair
        )
        ORDER BY cnt DESC, pair
        LIMIT %d
        """ % top_k
    )


def _text_bpe_merge_step(spark: SparkSession, sf: str) -> DataFrame:
    """Iteration-2 pair counts after applying the learned top merge."""
    return bpe_merge_step(load_table(spark, sf, "documents"), top_k=20)


_BPE_MERGE_ORACLE = r"""
WITH wf AS (
  SELECT w, count(*)::BIGINT AS f
  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS w
        FROM documents)
  WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w
), pc1 AS (
  SELECT substr(sw, i, 1) || '+' || substr(sw, i + 1, 1) AS pair,
         CAST(sum(f) AS BIGINT) AS cnt
  FROM (SELECT w || '_' AS sw, f FROM wf),
       LATERAL (SELECT unnest(generate_series(1, length(sw) - 1)) AS i)
  GROUP BY pair
), best AS (
  SELECT pair FROM pc1 ORDER BY cnt DESC, pair LIMIT 1
), merged AS (
  -- list_reduce seeds from the FIRST element here, so symbols are
  -- lifted to single-element lists and the lambda folds list-to-list
  SELECT list_reduce(
           list_transform(
             list_transform(generate_series(1, length(w) + 1),
                            i -> substr(w || '_', i, 1)),
             s -> [s]),
           (acc, b) -> CASE
             WHEN acc[-1] || '+' || b[1] = bp
             THEN list_append(list_slice(acc, 1, len(acc) - 1),
                              acc[-1] || b[1])
             ELSE list_append(acc, b[1]) END) AS syms,
         f
  FROM (SELECT w, f, (SELECT pair FROM best) AS bp FROM wf)
)
SELECT pair, cnt FROM (
  SELECT syms[i] || '+' || syms[i + 1] AS pair, CAST(sum(f) AS BIGINT) AS cnt
  FROM merged, LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i)
  WHERE len(syms) >= 2
  GROUP BY pair
)
ORDER BY cnt DESC, pair
LIMIT 20
"""


SPECS.append(
    QuerySpec(
        "text_bpe_merge_step",
        "Full BPE iteration: learn the top merge, re-tokenize the "
        "vocabulary, emit the next iteration's pair counts",
        _text_bpe_merge_step,
        _BPE_MERGE_ORACLE,
    )
)


# ------------------------------------------------------ BPE training loop

#: adjacent-pair expression over a ``syms`` array column — the single
#: source of truth for pair identity (``s1 + '+' + s2``)
_BPE_PAIR_EXPR = (
    "transform(sequence(1, size(syms) - 1), "
    "__i -> concat(element_at(syms, __i), '+', "
    "element_at(syms, __i + 1)))"
)


def _bpe_pair_counts_df(vocab_df: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over a (syms, f) frame."""
    return (
        vocab_df.where(F.expr("size(syms) >= 2"))
        .select(F.explode(F.expr(_BPE_PAIR_EXPR)).alias("pair"), "f")
        .groupBy("pair")
        .agg(F.sum("f").cast("long").alias("cnt"))
    )


def _bpe_merge_fold_expr(bp: str) -> str:
    """The left-to-right non-overlapping merge-apply fold for the
    (validated) winning pair ``bp`` — identical text in every caller so
    the three entries can never drift on merge semantics."""
    return (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), "
        "(__a, __s) -> CASE WHEN size(__a) > 0 "
        f"AND concat(element_at(__a, -1), '+', __s) = '{bp}' "
        "THEN concat(slice(__a, 1, size(__a) - 1), "
        "array(concat(element_at(__a, -1), __s))) "
        "ELSE concat(__a, array(__s)) END)"
    )


def _bpe_learn(
    docs: DataFrame, n_merges: int, carry_word: bool = False
) -> tuple[DataFrame, list[tuple[int, str, int]]]:
    """Shared BPE learn loop (the ONE implementation behind
    ``bpe_train`` / ``bpe_vocab_stats`` / ``bpe_encode``): collapse the
    corpus to the checkpointed (syms, f) vocabulary, learn ``n_merges``
    merges (ties cnt DESC / pair ASC), apply each with the standard
    left-to-right fold, re-checkpointing between iterations so the
    corpus is scanned exactly once and plan depth is k-independent.

    Returns the final vocabulary frame (plus the ``w`` word column when
    ``carry_word`` — the encode path's word -> tokens map) and the
    ordered merge list ``[(step, pair, cnt)]``.
    """
    import re as _re

    vocab = (
        docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("w"))
        .where(F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .select(
            *((["w"] if carry_word else [])),
            F.expr(
                "transform(sequence(1, length(w) + 1), "
                "__i -> substring(concat(w, '_'), __i, 1))"
            ).alias("syms"),
            "f",
        )
        .localCheckpoint(eager=True)  # ONE corpus scan, lineage cut
    )
    merges: list[tuple[int, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _bpe_pair_counts_df(vocab)
            .orderBy(F.desc("cnt"), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocabulary fully merged before n_merges
        bp, cnt = top[0]["pair"], int(top[0]["cnt"])
        # the winning pair is word chars + the two markers by
        # construction; assert before inlining it into the fold
        if not _re.fullmatch(r"[a-z0-9_+]+", bp):
            raise AssertionError(f"unexpected BPE pair token: {bp!r}")
        merges.append((step, bp, cnt))
        vocab = vocab.select(
            *((["w"] if carry_word else [])),
            F.expr(_bpe_merge_fold_expr(bp)).alias("syms"),
            "f",
        ).localCheckpoint(eager=True)
    return vocab, merges


def bpe_train(
    docs: DataFrame, n_merges: int = 8, post_top_k: int = 10
) -> DataFrame:
    """Multi-iteration BPE tokenizer training: learn ``n_merges``
    merges in order, then report the next iteration's top candidates.

    Output schema ``(step INT, pair STRING, cnt BIGINT)``: steps
    ``1..n_merges`` are the learned merges (each with the pair count
    that won its iteration); step ``n_merges + 1`` rows are the top
    ``post_top_k`` remaining candidates AFTER all merges — so the
    result hash-checks both the merge sequence and the post-merge pair
    distribution against the oracle.

    Scale design (the round-7 verdict's ask): the corpus is scanned
    exactly ONCE — the first job collapses it to the (symbols, freq)
    vocabulary table and ``localCheckpoint`` materializes it (a cluster
    deployment would use ``checkpoint()`` to durable storage).  Every
    iteration then runs two vocabulary-cardinality jobs — a pair-count
    aggregate and a merge-apply map — against the PREVIOUS iteration's
    checkpoint, so plan depth and corpus scans are both independent of
    ``n_merges`` (``bpe_merge_step`` re-derived the vocabulary from its
    temp view twice per iteration; this is the fix).  The only driver
    transfer is the single winning (pair, cnt) row per iteration — the
    learned model parameter, O(1) per step.

    The merge applies left-to-right over non-overlapping occurrences
    (the fold never re-merges the symbol it just built), pair identity
    is ``s1 + '+' + s2``, ties break (cnt DESC, pair ASC) — all
    identical to :func:`bpe_merge_step`.
    """
    spark = docs.sparkSession
    vocab, merges = _bpe_learn(docs, n_merges)
    post = (
        _bpe_pair_counts_df(vocab)
        .orderBy(F.desc("cnt"), "pair")
        .limit(post_top_k)
        .select(
            F.lit(n_merges + 1).cast("int").alias("step"), "pair", "cnt"
        )
    )
    learned = spark.createDataFrame(
        merges, "step int, pair string, cnt long"
    )
    return learned.unionByName(post).orderBy("step", F.desc("cnt"), "pair")


def _text_bpe_train(spark: SparkSession, sf: str) -> DataFrame:
    """8 learned merges + top-10 post-merge candidates."""
    return bpe_train(load_table(spark, sf, "documents"), n_merges=8, post_top_k=10)


def _bpe_merge_blocks(n_merges: int, carry_word: bool = False) -> str:
    """Shared DuckDB CTE prefix for the BPE family (the oracle-side
    twin of :func:`_bpe_learn`): the word-frequency collapse, the s0
    symbol split, and one MATERIALIZED learn/apply block per iteration
    (materialization is load-bearing — ``s{{n}}`` is referenced twice,
    and un-materialized inlining would re-evaluate the whole chain per
    reference, exponentially).  ``carry_word`` threads the word column
    through every block for the encode path's word -> tokens map."""
    wc = "w, " if carry_word else ""
    blocks = []
    for n in range(1, n_merges + 1):
        blocks.append(f"""pc{n} AS MATERIALIZED (
  SELECT syms[i] || '+' || syms[i + 1] AS pair, CAST(sum(f) AS BIGINT) AS cnt
  FROM s{n - 1}, LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i)
  WHERE len(syms) >= 2 GROUP BY pair
), best{n} AS MATERIALIZED (
  SELECT pair, cnt FROM pc{n} ORDER BY cnt DESC, pair LIMIT 1
), s{n} AS MATERIALIZED (
  SELECT {wc}list_reduce(list_transform(syms, s -> [s]),
           (acc, b) -> CASE
             WHEN acc[-1] || '+' || b[1] = bp
             THEN list_append(list_slice(acc, 1, len(acc) - 1), acc[-1] || b[1])
             ELSE list_append(acc, b[1]) END) AS syms, f
  FROM (SELECT {wc}syms, f, (SELECT pair FROM best{n}) AS bp FROM s{n - 1})
)""")
    joined_blocks = ",\n".join(blocks)
    return f"""WITH wf AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS f
  FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents)
  WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w
), s0 AS MATERIALIZED (
  SELECT {wc}list_transform(generate_series(1, length(w) + 1),
                        i -> substr(w || '_', i, 1)) AS syms, f
  FROM wf
),
{joined_blocks}"""


def _bpe_train_oracle(n_merges: int = 8, post_top_k: int = 10) -> str:
    """DuckDB oracle for :func:`bpe_train`: the shared merge blocks
    plus the learned-merge union and post-merge candidate slice."""
    union = "\nUNION ALL ".join(
        f"SELECT CAST({n} AS INT) AS step, pair, cnt FROM best{n}"
        for n in range(1, n_merges + 1)
    )
    return f"""{_bpe_merge_blocks(n_merges)},
pc_post AS MATERIALIZED (
  SELECT syms[i] || '+' || syms[i + 1] AS pair, CAST(sum(f) AS BIGINT) AS cnt
  FROM s{n_merges}, LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i)
  WHERE len(syms) >= 2 GROUP BY pair
)
SELECT * FROM (
{union}
UNION ALL
SELECT CAST({n_merges + 1} AS INT) AS step, pair, cnt FROM (
  SELECT pair, cnt FROM pc_post ORDER BY cnt DESC, pair LIMIT {post_top_k})
) ORDER BY step, cnt DESC, pair"""


_BPE_TRAIN_ORACLE = _bpe_train_oracle(8, 10)


SPECS.append(
    QuerySpec(
        "text_bpe_train",
        "Multi-iteration BPE training: 8 ordered merges learned over "
        "the checkpointed vocabulary (one corpus scan total) plus the "
        "post-merge top candidates",
        _text_bpe_train,
        _BPE_TRAIN_ORACLE,
    )
)


def bpe_encode(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Corpus encoding with a learned BPE model — the step a training
    pipeline actually runs over all 100 TB: learn ``n_merges`` merges
    (same loop, tie rule, and fold as :func:`bpe_train`), then tokenize
    every document and report per-document token statistics.

    Output ``(doc_id, n_words, n_tokens, n_syms0)``: matched words per
    document, tokens emitted after all merges, and the pre-merge symbol
    count (word chars + the ``_`` end-of-word marker) — so
    ``n_syms0 / n_tokens`` is the model's compression on that document.
    Integer-exact end to end.

    Scale design: because BPE tokenization of a word is a pure function
    of the word, the corpus is never re-tokenized row by row.  The
    learned model is materialized as a vocabulary-cardinality
    ``(word, n_tokens)`` map (millions of rows at 100 TB, not
    billions), broadcast, and map-side joined to the exploded corpus;
    the per-document rollup is a partial aggregate on the scan side of
    the join.  Two corpus scans total (one to build the vocabulary, one
    to encode) — the encode scan IS the job; nothing else grows with
    corpus size.
    """
    # the shared learn loop, with the vocabulary CARRYING the word
    # column so the final state doubles as the word -> tokens map
    vocab, _merges = _bpe_learn(docs, n_merges, carry_word=True)
    tokmap = vocab.select(
        "w",
        F.size("syms").cast("long").alias("n_tok"),
        (F.length("w") + F.lit(1)).cast("long").alias("n_sym0"),
    )
    docwords = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).where(F.col("w").rlike("^[a-z0-9]+$"))
    return (
        docwords.join(F.broadcast(tokmap), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_sym0").cast("long").alias("n_syms0"),
        )
        .orderBy("doc_id")
    )


def _text_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document token counts after encoding with 8 learned merges."""
    return bpe_encode(load_table(spark, sf, "documents"), n_merges=8)


def _bpe_encode_oracle(n_merges: int = 8) -> str:
    """DuckDB oracle for :func:`bpe_encode`: the shared merge blocks
    carrying the word column, joined back to the exploded corpus."""
    return f"""{_bpe_merge_blocks(n_merges, carry_word=True)},
tokmap AS (
  SELECT w, CAST(len(syms) AS BIGINT) AS n_tok,
         CAST(length(w) + 1 AS BIGINT) AS n_sym0
  FROM s{n_merges}
), docwords AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
  FROM documents
)
SELECT doc_id,
       count(*)::BIGINT AS n_words,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(n_sym0) AS BIGINT) AS n_syms0
FROM docwords JOIN tokmap USING (w)
WHERE regexp_matches(w, '^[a-z0-9]+$')
GROUP BY doc_id
ORDER BY doc_id"""


_BPE_ENCODE_ORACLE = _bpe_encode_oracle(8)


SPECS.append(
    QuerySpec(
        "text_bpe_encode",
        "Encode the corpus with 8 learned BPE merges: broadcast the "
        "vocabulary-cardinality (word, tokens) map back over the "
        "exploded corpus, per-document token stats",
        _text_bpe_encode,
        _BPE_ENCODE_ORACLE,
    )
)


def _text_bpe_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Per-LANGUAGE tokenizer fertility — tokens emitted per word —
    and compression, for the 8-merge learned BPE model: the standard
    multilingual tokenizer-equity audit (a language with high
    fertility pays more sequence length per word than the tokenizer's
    'home' language; mT5/XLM-R-class pipelines check this before
    committing a vocabulary).

    Same machinery as :func:`bpe_encode` (ONE shared learn loop, the
    broadcast word→tokens map, one encode scan) with the rollup keyed
    by language; fertility reported integer-exactly in milli-tokens
    per word (``(Σtokens · 1000) div Σwords``)."""
    docs = load_table(spark, sf, "documents")
    vocab, _merges = _bpe_learn(docs, 8, carry_word=True)
    tokmap = vocab.select(
        "w",
        F.size("syms").cast("long").alias("n_tok"),
        (F.length("w") + F.lit(1)).cast("long").alias("n_sym0"),
    )
    docwords = docs.select(
        "lang", F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).where(F.col("w").rlike("^[a-z0-9]+$"))
    return (
        docwords.join(F.broadcast(tokmap), "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_sym0").cast("long").alias("n_syms0"),
        )
        .selectExpr(
            "lang",
            "n_words",
            "n_tokens",
            "(n_tokens * 1000) div n_words AS fert_milli",
            "(n_syms0 * 1000) div n_tokens AS compress_milli",
        )
        .orderBy("lang")
    )


def _bpe_fertility_oracle(n_merges: int = 8) -> str:
    return f"""{_bpe_merge_blocks(n_merges, carry_word=True)},
tokmap AS (
  SELECT w, CAST(len(syms) AS BIGINT) AS n_tok,
         CAST(length(w) + 1 AS BIGINT) AS n_sym0
  FROM s{n_merges}
), docwords AS (
  SELECT lang, unnest(regexp_split_to_array(text, '\\s+')) AS w
  FROM documents
), agg AS (
  SELECT lang,
         count(*)::BIGINT AS n_words,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         CAST(sum(n_sym0) AS BIGINT) AS n_syms0
  FROM docwords JOIN tokmap USING (w)
  WHERE regexp_matches(w, '^[a-z0-9]+$')
  GROUP BY lang)
SELECT lang, n_words, n_tokens,
       CAST((n_tokens * 1000) // n_words AS BIGINT) AS fert_milli,
       CAST((n_syms0 * 1000) // n_tokens AS BIGINT) AS compress_milli
FROM agg ORDER BY lang"""


SPECS.append(
    QuerySpec(
        "text_bpe_fertility",
        "Per-language BPE tokenizer fertility + compression (8 learned "
        "merges): the multilingual tokenizer-equity audit, integer-exact",
        _text_bpe_fertility,
        _bpe_fertility_oracle(8),
    )
)


def bpe_vocab_stats(
    docs: DataFrame, n_merges: int = 8, top_k: int = 30
) -> DataFrame:
    """Encode-side complement of :func:`bpe_train`: after learning
    ``n_merges`` merges, report the resulting TOKEN frequency table —
    the vocabulary a tokenizer built from this corpus would actually
    emit (each word's final symbols, frequency-weighted).

    Output ``(token STRING, cnt BIGINT)``, top ``top_k`` by
    (cnt DESC, token ASC).  Same scale shape as the trainer: the
    explode runs over the checkpointed vocabulary, so the corpus is
    still scanned exactly once end-to-end.
    """
    vocab, _merges = _bpe_learn(docs, n_merges)
    return (
        vocab.select(F.explode("syms").alias("token"), "f")
        .groupBy("token")
        .agg(F.sum("f").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(top_k)
    )


def _text_bpe_vocab_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token frequency table after 8 learned merges."""
    return bpe_vocab_stats(
        load_table(spark, sf, "documents"), n_merges=8, top_k=30
    )


def _bpe_vocab_stats_oracle(n_merges: int = 8, top_k: int = 30) -> str:
    """Reuses the trainer's chained-CTE blocks, then explodes the final
    symbol table into token counts."""
    train = _bpe_train_oracle(n_merges, 1)
    # keep everything up to (and including) the last s{n} block; swap
    # the final projection for the token explode
    cut = train.index(",\npc_post AS MATERIALIZED")
    return (
        train[:cut]
        + f"""
SELECT token, CAST(sum(f) AS BIGINT) AS cnt
FROM (SELECT unnest(syms) AS token, f FROM s{n_merges})
GROUP BY token
ORDER BY cnt DESC, token
LIMIT {top_k}"""
    )


_BPE_VOCAB_STATS_ORACLE = _bpe_vocab_stats_oracle(8, 30)


SPECS.append(
    QuerySpec(
        "text_bpe_vocab_stats",
        "BPE encode-side check: token frequency table after 8 learned "
        "merges (the tokenizer's emitted vocabulary)",
        _text_bpe_vocab_stats,
        _BPE_VOCAB_STATS_ORACLE,
    )
)


# ------------------------------------------------- bigram LM perplexity

def _bigram_doc_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document average bigram log-probability (add-one smoothing,
    ``ln((c(w1,w2) + 1) / (c(w1) + V))``) — the shared scoring core of
    ``text_bigram_logprob`` (per-language rollup) and
    ``text_ccnet_buckets`` (perplexity terciles).

    Scale design: bigram pairing happens ARRAY-SIDE (a ``transform``
    over the split array — no window, no per-doc sort, no shuffle to
    form adjacency); the bigram and unigram count tables are
    vocabulary-cardinality and broadcast back over the exploded corpus,
    so the only corpus-cardinality exchange is the final per-doc
    partial aggregate.  Rounded before any downstream fold so
    summation order can't leak into the hash."""
    d = load_table(spark, sf, "documents")
    base = d.select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("ws")
    )
    tokens = base.select(F.explode("ws").alias("w"))
    uni = tokens.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    vocab_n = uni.agg(F.count(F.lit(1)).alias("v"))
    # guard size >= 2: Spark's sequence(1, 0) is DESCENDING [1, 0],
    # not empty — the filter keeps the domain identical to DuckDB's
    # empty generate_series(1, 0)
    bigr = (
        base.where(F.expr("size(ws) >= 2"))
        .select(
            "doc_id",
            "lang",
            "ws",
            F.explode(F.expr("sequence(1, size(ws) - 1)")).alias("i"),
        )
        .select(
            "doc_id",
            "lang",
            F.expr("element_at(ws, i)").alias("w1"),
            F.expr("element_at(ws, i + 1)").alias("w2"),
        )
    )
    bc = bigr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    return (
        bigr.join(F.broadcast(bc), ["w1", "w2"])
        .join(F.broadcast(uni.withColumnRenamed("w", "w1")), "w1")
        .crossJoin(F.broadcast(vocab_n))
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.avg(
                    F.log(
                        (F.col("cb") + F.lit(1)).cast("double")
                        / (F.col("cu") + F.col("v")).cast("double")
                    )
                ),
                6,
            ).alias("avg_lp")
        )
    )


def _bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing — the
    CCNet-style quality filter one tier above
    :func:`_unigram_logprob`: per-doc scores from
    :func:`_bigram_doc_scores`, rolled up per language."""
    scored = _bigram_doc_scores(spark, sf)
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("avg_lp"), 4).alias("mean_lp"),
            F.round(F.min("avg_lp"), 4).alias("worst_lp"),
        )
        .orderBy("lang")
    )


#: shared per-doc bigram-score CTEs (mirror of _bigram_doc_scores)
_BIGRAM_SCORED_CTES = r"""base AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents),
uni AS (
  SELECT w, count(*) AS cu
  FROM (SELECT unnest(ws) AS w FROM base) GROUP BY w),
vocab_n AS (SELECT count(*) AS v FROM uni),
bigr AS (
  SELECT doc_id, lang, ws[i] AS w1, ws[i + 1] AS w2
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
  WHERE len(ws) >= 2),
bc AS (SELECT w1, w2, count(*) AS cb FROM bigr GROUP BY w1, w2),
scored AS (
  SELECT doc_id, lang,
         round(avg(ln((cb + 1)::DOUBLE / (cu + v)::DOUBLE)), 6) AS avg_lp
  FROM bigr JOIN bc USING (w1, w2) JOIN uni ON bigr.w1 = uni.w
       CROSS JOIN vocab_n
  GROUP BY doc_id, lang)"""

_BIGRAM_ORACLE = f"""
WITH {_BIGRAM_SCORED_CTES}
SELECT lang, count(*) AS n_docs,
       round(avg(avg_lp), 4) AS mean_lp,
       round(min(avg_lp), 4) AS worst_lp
FROM scored GROUP BY lang ORDER BY lang
"""


SPECS.append(
    QuerySpec(
        "text_bigram_logprob",
        "Bigram LM scoring with add-one smoothing: array-side pairing, "
        "broadcast count tables, per-lang rollup",
        _bigram_logprob,
        _BIGRAM_ORACLE,
    )
)


def _text_ccnet_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet head/middle/tail quality split (Wenzek et al. 2020,
    "CCNet: Extracting high quality monolingual datasets from web
    crawl data"): score every document with the corpus-trained LM
    (:func:`_bigram_doc_scores` — CCNet uses a 5-gram KenLM; the
    perplexity ORDERING is what the split consumes), then cut each
    LANGUAGE into perplexity terciles — ``head`` is the highest
    average log-probability (lowest perplexity) third.  The per-
    (lang, bucket) report is what decides which slices feed training.

    Terciles are EXACT rank terciles — ``ntile(3)`` over
    ``(avg_lp DESC, doc_id)`` — not interpolated quantile cutoffs:
    both engines implement SQL ntile identically (earlier buckets take
    the remainder), so the split is deterministic and engine-exact,
    where a floating quantile boundary could flip a doc's bucket on
    the 1e-16 of an interpolation.  Scale: the window sorts per-lang
    partitions (parallel across languages, spill-backed); at 100 TB
    the production route is CCNet's own — fit cutoffs on a sample,
    broadcast, bucket map-side (the train_curriculum pattern) — with
    ntile as the exact-contract oracle."""
    from pyspark.sql import Window

    scored = _bigram_doc_scores(spark, sf)
    w = Window.partitionBy("lang").orderBy(F.desc("avg_lp"), "doc_id")
    b = scored.withColumn("t", F.ntile(3).over(w)).withColumn(
        "bucket",
        F.when(F.col("t") == 1, "head")
        .when(F.col("t") == 2, "middle")
        .otherwise("tail"),
    )
    return (
        b.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("avg_lp"), 4).alias("mean_lp"),
            F.round(F.min("avg_lp"), 4).alias("min_lp"),
            F.round(F.max("avg_lp"), 4).alias("max_lp"),
        )
        .orderBy("lang", "bucket")
    )


_CCNET_ORACLE = f"""
WITH {_BIGRAM_SCORED_CTES},
b AS (
  SELECT *, ntile(3) OVER (PARTITION BY lang ORDER BY avg_lp DESC, doc_id) AS t
  FROM scored)
SELECT lang,
       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       round(avg(avg_lp), 4) AS mean_lp,
       round(min(avg_lp), 4) AS min_lp,
       round(max(avg_lp), 4) AS max_lp
FROM b GROUP BY lang, bucket ORDER BY lang, bucket
"""


SPECS.append(
    QuerySpec(
        "text_ccnet_buckets",
        "CCNet head/middle/tail perplexity terciles per language "
        "(Wenzek et al. 2020): exact rank ntile over the LM scores",
        _text_ccnet_buckets,
        _CCNET_ORACLE,
    )
)


# ------------------------------------------------------------- DSIR

#: Hashed-feature buckets for DSIR importance weights.  Small enough
#: that the fitted model is a broadcastable table; collisions are part
#: of the method (hashed n-gram features, Xie et al. 2023).
DSIR_BUCKETS = 64


def _text_dsir(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): select raw-corpus documents that look
    like a TARGET distribution by importance weights under two hashed
    unigram bucket models.

    * fit — ONE aggregation over the exploded words computes, per
      hash bucket, the raw count and the target count (target = the
      ``lang = 'en'`` slice) simultaneously; add-one smoothing turns
      them into p (target) and q (raw), and the per-bucket
      ``log p - log q`` table is the fitted model — DSIR_BUCKETS rows,
      broadcast everywhere (the window computing the two totals runs
      on those 64 rows, not the corpus).
    * apply — a second pass over the words joins the broadcast model
      and sums per-document log-weights.

    Output: per source — docs seen, docs selected (log w > 0, i.e.
    target-likelier-than-raw), and the rounded total log-weight.  Two
    corpus scans total (fit + apply), each a single exchange; the
    model is O(DSIR_BUCKETS) driver/broadcast state at any corpus
    size — the paper's own architecture (hashing is what makes the
    model size corpus-independent).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf, "documents")
    words = d.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    ).withColumn("b", md5_long(F.col("w")) % DSIR_BUCKETS)
    counts = words.groupBy("b").agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tgt_n"),
    )
    w_all = Window.partitionBy()
    model = counts.select(
        "b",
        (
            F.log(
                (F.col("tgt_n") + 1.0)
                / (F.sum("tgt_n").over(w_all) + F.lit(float(DSIR_BUCKETS)))
            )
            - F.log(
                (F.col("raw_n") + 1.0)
                / (F.sum("raw_n").over(w_all) + F.lit(float(DSIR_BUCKETS)))
            )
        ).alias("lr"),
    )
    docw = (
        words.join(F.broadcast(model), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum("lr").alias("logw"))
    )
    return (
        docw.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("logw") > 0, 1).otherwise(0)).alias("n_selected"),
            F.round(F.sum("logw"), 3).alias("sum_logw"),
        )
        .orderBy("source")
    )


def _dsir_oracle() -> str:
    h = duck_md5_long_sql("w")
    return f"""
WITH words AS (
  SELECT doc_id, lang, source, w, {h} % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang, source,
               unnest(string_split(lower(text), ' ')) AS w
        FROM documents)),
counts AS (
  SELECT b, count(*) AS raw_n,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_n
  FROM words GROUP BY b),
model AS (
  SELECT b,
         ln((tgt_n + 1.0) / (sum(tgt_n) OVER () + {DSIR_BUCKETS}.0))
       - ln((raw_n + 1.0) / (sum(raw_n) OVER () + {DSIR_BUCKETS}.0)) AS lr
  FROM counts),
docw AS (
  SELECT w.doc_id, w.source, sum(m.lr) AS logw
  FROM words w JOIN model m ON m.b = w.b
  GROUP BY 1, 2)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN logw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       round(sum(logw), 3) AS sum_logw
FROM docw GROUP BY source ORDER BY source
"""


SPECS.append(
    QuerySpec(
        "text_dsir",
        "DSIR data selection (Xie et al. 2023): hashed-unigram "
        "target/raw importance weights, broadcast 64-bucket model, "
        "per-source selection counts",
        _text_dsir,
        _dsir_oracle(),
    )
)
