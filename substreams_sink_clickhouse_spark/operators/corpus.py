"""Composable corpus-pipeline API over ANY documents DataFrame.

The gate entries (``text_*`` / ``dedup_*`` / ``train_*``) are
oracle-verified against the driver fixtures; this module packages the
same operators as a fluent API a user points at their own data:

    from substreams_sink_clickhouse_spark.operators.corpus import Corpus

    c = Corpus(df, id_col="id", text_col="body")
    clean = c.gopher_filter().dedup_exact().dedup_minhash()
    clean.split().groupBy("split").count().show()
    clean.card().show()

Every method is a thin composition of the SAME column expressions the
gate entries run — ``tests/test_corpus_api.py`` pins equivalence
against the oracle-verified paths, so this surface cannot drift from
the verified one.  All transformations are lazy DataFrames; nothing
collects to the driver.

Scale notes are inherited from the underlying operators: gopher/token
passes are map-only; exact dedup is one hash aggregate on the 60-bit
content hash; minhash pairs shuffle once on the band value with the
hot-bucket cap (dedup.py); the split is a pure hash function of the
id (reshard-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.functions.hashing import md5_long


class Corpus:
    """Fluent wrapper over a documents DataFrame.

    ``id_col`` must be unique per document; ``text_col`` holds the
    raw text.  Other columns ride along untouched.
    """

    def __init__(self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        missing = [c for c in (id_col, text_col) if c not in df.columns]
        if missing:
            raise ValueError(
                f"Corpus: column(s) {missing} not in DataFrame "
                f"(columns: {df.columns})"
            )
        if id_col != "doc_id":
            df = df.withColumnRenamed(id_col, "doc_id")
        if text_col != "text":
            df = df.withColumnRenamed(text_col, "text")
        self.df = df

    # -- quality -------------------------------------------------------

    def gopher_flags(self) -> DataFrame:
        """Per-document Gopher rule flags + verdict (text.py)."""
        from substreams_sink_clickhouse_spark.operators.text import gopher_flags

        return gopher_flags(self.df)

    def gopher_filter(self) -> "Corpus":
        """Keep only documents passing all Gopher rules."""
        keep = self.gopher_flags().filter(F.col("gopher_pass") == 1).select("doc_id")
        return Corpus(self.df.join(keep, "doc_id", "left_semi"))

    # -- dedup ---------------------------------------------------------

    def _content_hash(self):
        return md5_long(F.col("text"))

    def dedup_exact(self) -> "Corpus":
        """One survivor per distinct text: the lowest doc_id (an
        algebraic ``min_by`` per content hash — map-side partials, one
        exchange on the 60-bit hash)."""
        keep = (
            self.df.select("doc_id", self._content_hash().alias("__h"))
            .groupBy("__h")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        return Corpus(self.df.join(keep, "doc_id", "left_semi"))

    def minhash_dup_pairs(self) -> DataFrame:
        """Near-dup candidate pairs (doc_a < doc_b) via MinHash+LSH
        banding — the exact machinery of the ``dedup_minhash`` gate
        entry (band-bucket expansion, hot-bucket cap, no self-join)."""
        from substreams_sink_clickhouse_spark.operators.dedup import (
            _minhash_bands,
            _pair_rows_capped,
        )

        bands = _minhash_bands(self.df.select("doc_id", "text"))
        buckets = (
            bands.groupBy("band_id", "band_val")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") > 1)
        )
        return (
            _pair_rows_capped(buckets.select("ids"), "ids")
            .select(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"))
            .distinct()
        )

    def dedup_minhash(self) -> "Corpus":
        """Drop the higher-id side of every near-dup pair (keep-first
        policy; for clique-exact survivors route through
        ``dedup_clusters``'s connected components instead)."""
        losers = self.minhash_dup_pairs().select(F.col("doc_b").alias("doc_id")).distinct()
        return Corpus(self.df.join(losers, "doc_id", "left_anti"))

    def dedup_keep_best(self, quality=None) -> "Corpus":
        """Quality-aware near-dup removal: connected components over
        the MinHash candidate pairs, keeping each cluster's BEST
        document (default quality: text length; pass a Column for a
        custom score).  Keep-first happily keeps a truncated copy —
        this is the ``dedup_keep_best`` gate semantics as a fluent
        step.  Ties break to the lowest id via a composite BIGINT
        argmax key; the per-cluster argmax is algebraic."""
        from substreams_sink_clickhouse_spark.operators.dedup import (
            connected_components,
        )

        from pyspark.sql import Window

        q = quality if quality is not None else F.length("text")
        comp = connected_components(self.minhash_dup_pairs())
        # window argmax, not a numeric composite key: doc_id may be a
        # string (UUID) or a snowflake-scale long here — the public API
        # makes no radix promise (the gate entry's fixture-only
        # composite key does, and documents it)
        w = Window.partitionBy("cluster_id").orderBy(
            F.desc("__q"), F.asc("doc_id")
        )
        keep = (
            comp.join(self.df.select("doc_id", q.alias("__q")), "doc_id")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("doc_id")
        )
        clustered = comp.select("doc_id")
        survivors = self.df.join(clustered, "doc_id", "left_anti").unionByName(
            self.df.join(keep, "doc_id", "left_semi")
        )
        return Corpus(survivors)

    def dedup_phash(self) -> "Corpus":
        """Image-style perceptual dedup on the text bytes as an opaque
        payload (the same decode→dHash path as multimodal_phash_dedup):
        one survivor per 64-bit dHash, lowest doc_id.  For corpora
        whose documents carry real image payloads, build the asset
        DataFrame directly and use multimodal.phash_assets."""
        from substreams_sink_clickhouse_spark.operators.multimodal import (
            phash_assets,
        )

        assets = self.df.select(
            F.col("doc_id").alias("asset_id"),
            F.encode("text", "utf-8").alias("payload"),
        )
        keep = (
            phash_assets(assets)
            .groupBy("phash")
            .agg(F.min("asset_id").alias("doc_id"))
            .select("doc_id")
        )
        return Corpus(self.df.join(keep, "doc_id", "left_semi"))

    def interleave(self, weight_col) -> DataFrame:
        """Weighted mixing schedule over the corpus (training.py's
        interleave_sources): adds ``interleave_rank`` such that any
        prefix carries sources in ``weight_col`` proportion.  Requires
        a ``source`` column."""
        from substreams_sink_clickhouse_spark.operators.training import (
            interleave_sources,
        )

        if "source" not in self.df.columns:
            raise ValueError("interleave needs a 'source' column")
        return interleave_sources(self.df, weight_col, ["doc_id"])

    def scrub_pii(self) -> "Corpus":
        """Redact emails/phones in place (same regexes as the
        text_pii_scrub gate entry) and add an ``n_redactions`` count —
        map-only, zero shuffle."""
        return Corpus(_corpus_scrub_pii(self.df))

    def scrub_dup_spans(self) -> "Corpus":
        """REMOVE corpus-duplicated 20-word spans keep-first and
        re-emit the cleaned text — the production form of the
        ``dedup_span_scrub`` gate entry (which reports the accounting;
        this rebuilds the document).  The scrub decision is identical:
        a span instance is dropped iff a case-insensitively identical
        span occurs earlier in the corpus by ``(doc_id, position)``
        (streaming ``row_number`` per span hash — no join, no per-hash
        buffering); surviving spans re-join in position order,
        original case preserved.  Documents whose every span is
        duplicated elsewhere survive with empty text (filter on
        ``text != ''`` to drop them)."""
        from pyspark.sql import Window

        from substreams_sink_clickhouse_spark.operators.dedup import _SPAN_W

        others = [c for c in self.df.columns if c != "text"]
        inst = self.df.select(
            *others,
            F.explode(
                F.expr(
                    f"""
                    transform(sequence(0, ((size(split(text, ' ')) + {_SPAN_W - 1}) div {_SPAN_W}) - 1),
                              i -> named_struct(
                                'pos', i,
                                'sp', concat_ws(' ', slice(split(text, ' '), i * {_SPAN_W} + 1, {_SPAN_W}))))
                    """
                )
            ).alias("u"),
        ).select(
            *others,
            F.col("u.pos").alias("__pos"),
            F.col("u.sp").alias("__sp"),
            md5_long(F.lower(F.col("u.sp"))).alias("__h"),
        )
        marked = inst.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__h").orderBy("doc_id", "__pos")
            ),
        )
        rebuilt = (
            marked.filter(F.col("__rn") == 1)
            .groupBy(*others)
            .agg(
                F.array_join(
                    F.expr("transform(sort_array(collect_list(struct(__pos, __sp))), s -> s.__sp)"),
                    " ",
                ).alias("text")
            )
        )
        # documents whose EVERY span was scrubbed drop out of the
        # groupBy entirely — restore them with empty text so the
        # corpus keeps one row per input document
        emptied = self.df.select(*others).join(
            rebuilt.select("doc_id"), "doc_id", "left_anti"
        ).withColumn("text", F.lit(""))
        return Corpus(rebuilt.unionByName(emptied))

    def longest_dup_spans(self, min_words: int | None = None) -> DataFrame:
        """Per-document longest-duplicate-span statistics at
        suffix-array fidelity (the ``dedup_span_longest`` gate entry's
        core over THIS corpus): duplicated-window count, run count and
        the longest exact duplicated span with its start position —
        the Lee et al. ExactSubstr signal that decides whether span
        scrubbing is worth running.  ``min_words`` is the minimum
        duplicated-run length (defaults to the gate entry's)."""
        from substreams_sink_clickhouse_spark.operators.dedup import (
            _LONGEST_W,
            span_longest_stats,
        )

        return span_longest_stats(
            self.df.select("doc_id", "text"),
            min_words if min_words is not None else _LONGEST_W,
        )

    def select_rho_loss(
        self,
        train_loss,
        holdout_loss,
        keep_pct: int = 25,
        accuracy: int = 10_000,
    ) -> "Corpus":
        """RHO-LOSS selection over REAL loss columns (Mindermann et
        al. 2022; the ``train_rho_loss`` gate entry runs the same rule
        on fixture losses): keep the top ``keep_pct``% of documents by
        reducible holdout loss (train − holdout).  The boundary is an
        ``approx_percentile`` threshold (one small aggregate broadcast
        back onto the scan — map-only selection, no global sort; raise
        ``accuracy`` to tighten the boundary).  Ties AT the threshold
        are kept, so the kept fraction can exceed keep_pct by the tied
        mass — deterministic, never sampled."""
        rho = (F.col(train_loss) - F.col(holdout_loss)).alias("__rho")
        scored = self.df.withColumn("__rho", rho)
        # the threshold column is __-prefixed like every internal
        # column here: a bare name would collide with user columns
        thr = scored.agg(
            F.expr(
                f"approx_percentile(__rho, {(100 - keep_pct) / 100.0}, {accuracy})"
            ).alias("__rho_thr")
        )
        kept = (
            scored.crossJoin(F.broadcast(thr))
            .filter(F.col("__rho") >= F.col("__rho_thr"))
            .drop("__rho", "__rho_thr")
        )
        return Corpus(kept)

    # -- composition ---------------------------------------------------

    def split(
        self, train: float = 0.8, val: float = 0.1, seed: str = "split"
    ) -> DataFrame:
        """Deterministic train/val/test carve by content-stable hash of
        the id: membership survives resharding and re-runs (the
        ``train_split`` gate semantics, thresholds parameterized)."""
        b = md5_long(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))) % 100
        # round(), not int(): float representation error (0.29*100 =
        # 28.999...) must not shift the percentile boundary by one.
        split = (
            F.when(b < round(train * 100), F.lit("train"))
            .when(b < round((train + val) * 100), F.lit("val"))
            .otherwise(F.lit("test"))
        )
        return self.df.withColumn("split", split)

    def bpe_pair_counts(self, top_k: int = 50) -> DataFrame:
        """Top BPE merge candidates over this corpus (the
        ``text_bpe_pairs`` gate semantics): weighted adjacent
        symbol-pair counts computed over the distinct-word table, so
        every stage past the first scan scales with vocabulary size,
        not corpus size."""
        from substreams_sink_clickhouse_spark.operators.text import (
            bpe_pair_counts,
        )

        # __init__ normalizes the text column's name to ``text``
        return bpe_pair_counts(self.df.select("text"), top_k=top_k)

    def bpe_train(self, n_merges: int = 8, post_top_k: int = 10) -> DataFrame:
        """Learn ``n_merges`` BPE merges over this corpus (the
        ``text_bpe_train`` gate semantics): ordered merge table plus
        the post-merge top candidates; ONE corpus scan total — the
        vocabulary is checkpointed between iterations."""
        from substreams_sink_clickhouse_spark.operators.text import bpe_train

        return bpe_train(
            self.df.select("text"), n_merges=n_merges, post_top_k=post_top_k
        )

    def bpe_vocab_stats(self, n_merges: int = 8, top_k: int = 30) -> DataFrame:
        """Token frequency table after ``n_merges`` learned merges (the
        ``text_bpe_vocab_stats`` gate semantics)."""
        from substreams_sink_clickhouse_spark.operators.text import (
            bpe_vocab_stats,
        )

        return bpe_vocab_stats(
            self.df.select("text"), n_merges=n_merges, top_k=top_k
        )

    def bpe_encode(self, n_merges: int = 8) -> DataFrame:
        """Per-document token statistics after encoding with
        ``n_merges`` learned merges (the ``text_bpe_encode`` gate
        semantics): ``(doc_id, n_words, n_tokens, n_syms0)``."""
        from substreams_sink_clickhouse_spark.operators.text import bpe_encode

        return bpe_encode(self.df.select("doc_id", "text"), n_merges=n_merges)

    def card(self) -> DataFrame:
        """One-row dataset-card summary (the ``corpus_card`` gate
        semantics): volume, breadth, exact-dup rate, Gopher pass
        rate."""
        from substreams_sink_clickhouse_spark.operators.text import (
            _GOPHER_STOPWORDS,
            _words,
        )

        d = self.df.withColumn("__words", _words())
        n_words = F.size("__words").cast("long")
        h = self._content_hash()
        stop_in = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)
        gopher_pass = (
            (n_words >= 50)
            & (n_words <= 100000)
            & (
                F.size(
                    F.expr(f"filter(array_distinct(__words), w -> w IN ({stop_in}))")
                )
                >= 2
            )
        ).cast("int")
        aggs = [
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_words).alias("total_words"),
            F.sum(F.length("text").cast("long")).alias("total_chars"),
            F.count_distinct(h).alias("distinct_texts"),
            F.round(
                (F.count(F.lit(1)) - F.count_distinct(h)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("exact_dup_rate"),
            F.round(F.avg(gopher_pass), 4).alias("gopher_pass_rate"),
        ]
        for extra in ("lang", "source"):
            if extra in self.df.columns:
                aggs.append(F.count_distinct(F.col(extra)).alias(f"n_{extra}s"))
        return d.agg(*aggs)

    def count(self) -> int:
        return self.df.count()

    @staticmethod
    def from_shards(
        spark,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        validate: bool = False,
    ) -> "Corpus":
        """Mount a corpus exported by :meth:`export_shards`.  The
        format comes from the manifest.  With ``validate=True`` the
        total row count is re-derived from the actual files (one
        distributed count) and compared against the manifest — the
        integrity check a training loader runs before trusting a
        multi-TB mount (truncated/missing shards fail loudly here,
        not as silently shorter epochs)."""
        import json as _json
        import os as _os

        with open(_os.path.join(path, "_manifest.json"), encoding="utf-8") as fh:
            manifest = _json.load(fh)
        reader = (
            spark.read.json if manifest["format"] == "jsonl" else spark.read.parquet
        )
        df = reader(path)
        if validate:
            n = df.count()
            if n != manifest["total_rows"]:
                raise ValueError(
                    f"shard set at {path} has {n} rows but the manifest "
                    f"promises {manifest['total_rows']} — truncated or "
                    f"missing shards"
                )
        return Corpus(df, id_col=id_col, text_col=text_col)

    def export_shards(
        self,
        path: str,
        max_records_per_shard: int = 100_000,
        fmt: str = "jsonl",
        shard_by: str | None = None,
    ) -> dict:
        """Write the corpus as size-capped shards plus a manifest —
        the artifact a training run actually consumes.

        * ``max_records_per_shard`` caps rows per output file via
          Spark's ``maxRecordsPerFile`` (the writer splits within a
          task, so the cap holds regardless of partitioning).
        * ``shard_by``: optional column (e.g. ``lang`` / ``split``) —
          becomes a partition directory, so a trainer can mount one
          subset without listing the rest (partition pruning at read).
        * ``fmt``: ``jsonl`` (one JSON object per line, the common
          training-data interchange) or ``parquet``.

        Returns the manifest (also written as ``_manifest.json`` next
        to the shards): per-shard row counts and byte sizes plus
        totals, computed from the filesystem after an atomic write —
        at 100 TB the manifest is what downstream loaders trust, so it
        is derived from what landed, never from what was intended."""
        import json as _json
        import os as _os

        if fmt not in ("jsonl", "parquet"):
            raise ValueError("fmt must be 'jsonl' or 'parquet'")
        writer = self.df.write.mode("overwrite").option(
            "maxRecordsPerFile", max_records_per_shard
        )
        if shard_by:
            writer = writer.partitionBy(shard_by)
        if fmt == "jsonl":
            writer.json(path)
        else:
            writer.parquet(path)
        spark = self.df.sparkSession
        ext = ".json" if fmt == "jsonl" else ".parquet"
        # per-shard row counts in ONE distributed job (group by the
        # file each row came from), not a per-file read loop
        reader = spark.read.json if fmt == "jsonl" else spark.read.parquet
        counts = {
            _os.path.basename(r["f"]): r["n"]  # part-file names are UUID-unique
            for r in reader(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: one row per shard file
        }
        shards = []
        for root, _dirs, files in _os.walk(path):
            for fname in sorted(files):
                if not fname.endswith(ext):
                    continue
                full = _os.path.join(root, fname)
                shards.append(
                    {
                        "shard": _os.path.relpath(full, path),
                        "rows": counts.get(fname, 0),
                        "bytes": _os.path.getsize(full),
                    }
                )
        manifest = {
            "format": fmt,
            "max_records_per_shard": max_records_per_shard,
            "shard_by": shard_by,
            "n_shards": len(shards),
            "total_rows": sum(s["rows"] for s in shards),
            "total_bytes": sum(s["bytes"] for s in shards),
            "shards": shards,
        }
        with open(_os.path.join(path, "_manifest.json"), "w", encoding="utf-8") as fh:
            _json.dump(manifest, fh, indent=1)
        return manifest


def _corpus_scrub_pii(df: DataFrame) -> DataFrame:
    from substreams_sink_clickhouse_spark.operators.text import (
        _PII_EMAIL,
        _PII_PHONE,
    )

    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
        _PII_PHONE,
        "<PHONE>",
    )
    return df.withColumn(
        "n_redactions",
        F.expr(f"regexp_count(text, '{_PII_EMAIL}')")
        + F.expr(f"regexp_count(text, '{_PII_PHONE}')"),
    ).withColumn("text", scrubbed)
