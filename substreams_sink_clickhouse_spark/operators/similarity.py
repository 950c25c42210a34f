"""Similarity search over embedding columns (SURVEY Q29 + scale path).

* ``sim_topk``  — exact brute-force cosine top-k against a probe
  vector.  One scan, no shuffle until the final top-k
  (TakeOrderedAndProject); the dot product is a JVM higher-order fold.
  This is the correctness baseline and is already the right plan for
  "one probe vs N vectors" at any scale (embarrassingly parallel).
* ``sim_lsh``   — random-hyperplane LSH bucketing: the probe is only
  compared against vectors whose 8-bit hyperplane signature matches,
  the scale path for repeated queries / self-joins (bucket count grows
  2^planes; per-bucket candidate sets shrink accordingly).

(Random-hyperplane signatures: Charikar 2002; IVF inverted-list search:
Jegou/Douze/Schmid 2011 "Product quantization for nearest neighbor
search" — the IVF-Flat variant without PQ codes; k-means: Lloyd 1982.)

The hyperplanes are derived from MD5 in *Python* at import time and
inlined as literals into both the Spark plan and the DuckDB oracle, so
both engines use bit-identical planes; dot products fold in identical
order on both sides, making even the approximate variant exactly
oracle-checkable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec
from substreams_sink_clickhouse_spark.sources.tables import load_table

EMBEDDING_DIM = 64
N_PLANES = 8
PROBE_VEC_ID = 0


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1],
    derived from MD5 so any engine/runtime reproduces it."""
    h = int(hashlib.md5(f"plane:{plane}:{dim}".encode()).hexdigest()[:15], 16)
    return ((h % 2001) - 1000) / 1000.0


PLANES: list[list[float]] = [
    [_plane_component(p, d) for d in range(EMBEDDING_DIM)] for p in range(N_PLANES)
]


def _dot_expr(a: str, b: str) -> str:
    """Spark SQL: left-fold dot product of two array columns (cast to
    double element-wise; identical fold order to the DuckDB oracle)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),"
        " (acc, v) -> acc + v)"
    )


def _norm_expr(a: str) -> str:
    return f"sqrt({_dot_expr(a, a)})"


def _duck_norm(a: str) -> str:
    return f"sqrt({_duck_dot(a, a)})"


def _sim_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 for the probe vector."""
    e = load_table(spark, sf, "embeddings")
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(F.col("embedding").alias("p"))
    scored = (
        e.crossJoin(F.broadcast(probe))
        .withColumn("__dot", F.expr(_dot_expr("embedding", "p")))
        .withColumn("__sim", F.col("__dot") / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))))
    )
    return (
        scored.orderBy(F.desc("__sim"), "vec_id")
        .limit(10)
        .select("vec_id", F.round("__sim", 6).alias("sim"))
    )


_TOPK_ORACLE = f"""
WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
scored AS (
  SELECT e.vec_id,
         {_duck_dot('e.embedding', 'probe.p')}
           / ({_duck_norm('e.embedding')} * {_duck_norm('probe.p')}) AS simx
  FROM embeddings e, probe)
SELECT vec_id, round(simx, 6) AS sim
FROM scored ORDER BY simx DESC, vec_id LIMIT 10
"""


def _plane_array_spark(plane: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({v} AS DOUBLE)" for v in plane) + ")"


def _plane_array_duck(plane: list[float]) -> str:
    return "[" + ", ".join(f"CAST({v} AS DOUBLE)" for v in plane) + "]"


def _bucket_expr_spark() -> str:
    bits = [
        f"(CASE WHEN {_dot_expr('embedding', _plane_array_spark(PLANES[j]))} >= 0.0"
        f" THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(N_PLANES)
    ]
    return " + ".join(bits)


def _bucket_expr_duck(emb: str) -> str:
    bits = [
        f"(CASE WHEN {_duck_dot(emb, _plane_array_duck(PLANES[j]))} >= 0.0"
        f" THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(N_PLANES)
    ]
    return " + ".join(bits)


def _sim_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed cosine search: signature match first, exact cosine
    only inside the probe's bucket (top-5)."""
    e = load_table(spark, sf, "embeddings").withColumn("__bucket", F.expr(_bucket_expr_spark()))
    probe = (
        e.filter(F.col("vec_id") == PROBE_VEC_ID)
        .select(F.col("embedding").alias("p"), F.col("__bucket").alias("__pbucket"))
    )
    candidates = e.join(
        F.broadcast(probe), F.col("__bucket") == F.col("__pbucket"), "inner"
    )
    scored = candidates.withColumn(
        "__sim",
        F.expr(_dot_expr("embedding", "p"))
        / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))),
    )
    return (
        scored.orderBy(F.desc("__sim"), "vec_id")
        .limit(5)
        .select("vec_id", F.round("__sim", 6).alias("sim"))
    )


_LSH_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_expr_duck('embedding')} AS bucket
  FROM embeddings),
probe AS (SELECT embedding AS p, bucket AS pbucket FROM b WHERE vec_id = {PROBE_VEC_ID}),
scored AS (
  SELECT b.vec_id,
         {_duck_dot('b.embedding', 'probe.p')}
           / ({_duck_norm('b.embedding')} * {_duck_norm('probe.p')}) AS simx
  FROM b, probe WHERE b.bucket = probe.pbucket)
SELECT vec_id, round(simx, 6) AS sim
FROM scored ORDER BY simx DESC, vec_id LIMIT 5
"""


N_CENTROIDS = 8
N_PROBE = 2


def _ivf_parts(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Coarse-quantizer halves shared by ``sim_ivf`` and
    ``sim_ivf_pq``: (per-vector inverted-list assignment DataFrame
    ``(vec_id, embedding, cid)``, probe's top-``N_PROBE`` list ids)."""
    from pyspark.sql import Window

    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    sims = (
        e.crossJoin(F.broadcast(cents))
        .withColumn(
            "__csim",
            F.expr(_dot_expr("embedding", "cemb"))
            / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("cemb"))),
        )
        .select("vec_id", "embedding", "cid", "__csim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("__csim"), F.col("cid"))
    ranked = sims.withColumn("rn", F.row_number().over(w))
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "embedding", "cid")
    probed_lists = (
        ranked.filter((F.col("vec_id") == PROBE_VEC_ID) & (F.col("rn") <= N_PROBE))
        .select("cid")
    )
    return assign, probed_lists


def _sim_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-Flat approximate search: an inverted-file index with a
    deterministic coarse quantizer.

    * centroids — the first ``N_CENTROIDS`` corpus vectors (a real
      deployment would k-means a sample; a fixed pick keeps both
      engines bit-identical);
    * assignment — every vector joins its nearest centroid by cosine
      (broadcast of the tiny centroid set; ties break to the lower
      centroid id);
    * search — the probe scans only the ``N_PROBE`` inverted lists
      nearest to it, then exact cosine + top-5 inside them.

    At scale the inverted lists are the partitioning: cluster the
    stored corpus by ``cid`` so a query touches ``N_PROBE``/``nlist``
    of the data — the IVF contract.
    """
    e = load_table(spark, sf, "embeddings")
    assign, probed_lists = _ivf_parts(e)
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(F.col("embedding").alias("p"))
    cands = assign.join(F.broadcast(probed_lists), "cid", "left_semi")
    scored = cands.crossJoin(F.broadcast(probe)).withColumn(
        "__sim",
        F.expr(_dot_expr("embedding", "p"))
        / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))),
    )
    return (
        scored.orderBy(F.desc("__sim"), "vec_id")
        .limit(5)
        .select("vec_id", F.round("__sim", 6).alias("sim"))
    )


_IVF_ORACLE = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < {N_CENTROIDS}),
sims AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_duck_dot('e.embedding', 'c.cemb')}
           / ({_duck_norm('e.embedding')} * {_duck_norm('c.cemb')}) AS csim
  FROM embeddings e CROSS JOIN cents c),
ranked AS (
  SELECT vec_id, embedding, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
  FROM sims),
assign AS (SELECT vec_id, embedding, cid FROM ranked WHERE rn = 1),
probed AS (SELECT cid FROM ranked WHERE vec_id = {PROBE_VEC_ID} AND rn <= {N_PROBE}),
probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
scored AS (
  SELECT a.vec_id,
         {_duck_dot('a.embedding', 'probe.p')}
           / ({_duck_norm('a.embedding')} * {_duck_norm('probe.p')}) AS simx
  FROM assign a, probe
  WHERE a.cid IN (SELECT cid FROM probed))
SELECT vec_id, round(simx, 6) AS sim
FROM scored ORDER BY simx DESC, vec_id LIMIT 5
"""


N_KNN_PROBES = 20
KNN_K = 3


def _sim_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    """k-NN JOIN: top-k cosine neighbors for EVERY vector of a probe
    set at once — the batch shape of embedding search (dedup a whole
    crawl, retrieve for a whole query file), not one probe at a time.

    Plan: the (small) probe set broadcasts, the corpus streams past it
    embarrassingly parallel — the corpus is never shuffled; the only
    exchange is the per-probe top-k window over (corpus x probes)
    scored pairs, keyed by probe id.  At 100 TB with a large probe set
    you'd LSH/IVF-partition both sides first — ``sim_knn_join_lsh``
    below IS that route (equi-join on bucket, no crossJoin); the
    query-side contract — per-probe ordered top-k — stays exactly
    this."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "embeddings")
    probes = e.filter(F.col("vec_id") < N_KNN_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("p")
    )
    corpus = e.filter(F.col("vec_id") >= N_KNN_PROBES)
    scored = corpus.crossJoin(F.broadcast(probes)).withColumn(
        "__sim",
        F.expr(_dot_expr("embedding", "p"))
        / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("__sim"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select("qid", F.col("rn").alias("rank"), "vec_id", F.round("__sim", 6).alias("sim"))
        .orderBy("qid", "rank")
    )


_KNN_JOIN_ORACLE = f"""
WITH probes AS (
  SELECT vec_id AS qid, embedding AS p FROM embeddings WHERE vec_id < {N_KNN_PROBES}),
corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_KNN_PROBES}),
scored AS (
  SELECT pr.qid, c.vec_id,
         {_duck_dot('c.embedding', 'pr.p')}
           / ({_duck_norm('c.embedding')} * {_duck_norm('pr.p')}) AS simx
  FROM corpus c CROSS JOIN probes pr),
ranked AS (
  SELECT qid, vec_id, simx,
         row_number() OVER (PARTITION BY qid ORDER BY simx DESC, vec_id) AS rn
  FROM scored)
SELECT qid, rn AS rank, vec_id, round(simx, 6) AS sim
FROM ranked WHERE rn <= {KNN_K} ORDER BY qid, rank
"""




# ------------------------------------------------------------------ k-means

KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_ROUND = 6  #: centroid rounding (decimals) after each update


def _sqdist_spark(emb_col: str, centroid: list[float]) -> str:
    """Spark SQL squared-L2 distance to a literal centroid: ordered
    left fold, bit-identical to the oracle's list_sum."""
    arr = "array(" + ", ".join(f"CAST({c!r} AS DOUBLE)" for c in centroid) + ")"
    return (
        f"aggregate(zip_with({emb_col}, {arr}, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )


def _argmin_cluster_expr(cents: list[list[float]]) -> str:
    """Spark SQL argmin over literal centroids: a struct per centroid
    (distance, index), array_min picks the smallest distance with the
    lowest index breaking exact ties — identical tie rule to the
    oracles' ``row_number() ... ORDER BY d, cluster``.

    The codebook ships as ONE 2-D literal array iterated by a
    ``transform`` lambda, not k separate per-centroid expressions:
    ConstantFolding collapses the k×d literals into a single Literal
    node, so Catalyst analysis and codegen stay O(1) in k — with k
    per-centroid subtrees, driver-side planning dominated the job
    (~10 s at k=8, d=64, three assignment plans per train-and-assign
    run) while the arithmetic per row is the same either way."""
    arr = "array(" + ", ".join(
        "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in c) + ")"
        for c in cents
    ) + ")"
    return (
        f"array_min(transform({arr}, (__cent, __j) -> named_struct("
        f"'d', aggregate(zip_with(emb, __cent, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0.0 AS DOUBLE), (a, x) -> a + x), 'c', __j)))"
    )


def lloyd_iterate(
    e: DataFrame,
    centroids: list[list[float]],
    iters: int,
    ndigits: int,
    persist: bool = True,
) -> list[list[float]]:
    """``iters`` Lloyd refinement steps over a (vec_id, emb) frame —
    the shared trainer behind ``sim_kmeans`` and ``dedup_semantic``'s
    coarse codebook.

    Scale shape per iteration: assignment is a narrow scan (k literal
    centroids folded into the plan — no join, no shuffle), the update
    is one partial-aggregated shuffle of (cluster, dim) means, and the
    k x d centroid matrix collected to the driver is a few KB
    regardless of corpus size — the same driver loop Spark MLlib's
    KMeans runs.  Centroids round to ``ndigits`` decimals each round
    so cross-partition summation order cannot leak into the assignment
    argmin (which compares exact doubles).  A cluster that lost every
    member would drop out and renumber the survivors (the oracles keep
    original ids — the gate fixtures never empty a cluster; a
    production caller re-seeds the lost cell instead).

    The training frame is persisted for the duration of the loop when
    more than one step will scan it (guide: persist only what is
    re-used; each Lloyd step is a fresh action over the same rows) and
    unpersisted before returning — callers holding their own persist
    are left untouched.  ``persist=False`` opts out entirely: the
    ``storageLevel`` check can only see a persist on the exact frame,
    not on an ancestor, so a caller that already caches the frame this
    one derives from (``_dedup_semantic``'s augmented corpus) passes
    False instead of double-caching largely the same rows."""
    from pyspark import StorageLevel

    own_persist = None
    if persist and iters > 1 and e.storageLevel == StorageLevel.NONE:
        own_persist = e.persist()
    try:
        for _ in range(iters):
            centroids = _lloyd_step(e, centroids, ndigits)
    finally:
        if own_persist is not None:
            own_persist.unpersist()
    return centroids


def _lloyd_step(
    e: DataFrame, centroids: list[list[float]], ndigits: int
) -> list[list[float]]:
    """One assignment + mean-update step of :func:`lloyd_iterate`."""
    assigned = e.withColumn(
        "cluster", F.expr(_argmin_cluster_expr(centroids))["c"]
    )
    means = (
        assigned.select("cluster", F.posexplode("emb").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("v"), ndigits).alias("m"))
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in means:
        by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
    return [
        [dims[p] for p in sorted(dims)]
        for _, dims in sorted(by_cluster.items())
    ]


def _sim_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """Lloyd's k-means as an iterative DataFrame loop: the trainer for
    sim_ivf's coarse quantizer (IVF lists are k-means cells; the
    deterministic quantizer there is the zero-training stand-in).

    Scale shape per iteration: assignment is a narrow scan (k literal
    centroids folded into the plan — no join, no shuffle), the update
    is one partial-aggregated shuffle of (cluster, dim) means, and the
    k x d centroid matrix collected to the driver is a few KB
    regardless of corpus size — the same driver loop Spark MLlib's
    KMeans runs.  Centroids round to 6 decimals each round so
    cross-partition summation order cannot leak into the assignment
    argmin (which compares exact doubles).
    """
    # Embeddings pre-rounded to KMEANS_ROUND decimals (SQL round =
    # half-away-from-zero in both engines, unlike Python's round): all
    # downstream arithmetic starts from bit-identical values.
    from substreams_sink_clickhouse_spark.session import iterate_session

    def _emb(sess: SparkSession) -> DataFrame:
        return load_table(sess, sf, "embeddings").select(
            "vec_id",
            F.expr(
                f"transform(embedding, x -> round(CAST(x AS DOUBLE), {KMEANS_ROUND}))"
            ).alias("emb"),
        )

    # training actions (seed collect + Lloyd steps) run on the trainer
    # profile — fixed plan shapes where AQE stage materialization is
    # pure per-action latency (round 12); the returned aggregate below
    # stays on the caller's session, adaptive at scale
    e_t = _emb(iterate_session(spark))
    # deterministic init: the first K vectors by vec_id
    centroids = [
        [float(x) for x in r["emb"]]
        for r in e_t.orderBy("vec_id").limit(KMEANS_K).collect()
    ]
    centroids = lloyd_iterate(e_t, centroids, KMEANS_ITERS, KMEANS_ROUND)
    e = _emb(spark)
    final = e.withColumn("a", F.expr(_argmin_cluster_expr(centroids)))
    return (
        final.groupBy(F.col("a")["c"].alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col("a")["d"]), 4).alias("avg_sqdist"),
        )
        .orderBy("cluster")
    )


def _kmeans_oracle() -> str:
    """The same algorithm, unrolled as DuckDB CTEs."""
    k, nround = KMEANS_K, KMEANS_ROUND
    dist = "list_sum(list_transform(list_zip(e.emb, c.cent), p -> (p[1] - p[2]) * (p[1] - p[2])))"

    def assign(i: int, csrc: str) -> str:
        return f"""
a{i} AS (
  SELECT vec_id, emb, cluster, d FROM (
    SELECT vec_id, emb, cluster, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
    FROM (SELECT e.vec_id, e.emb, c.cluster, {dist} AS d
          FROM e CROSS JOIN {csrc} c))
  WHERE rn = 1)"""

    def update(i: int) -> str:
        return f"""
c{i + 1} AS (
  SELECT cluster, list(round(m, {nround}) ORDER BY i) AS cent FROM (
    SELECT cluster, u.i AS i, avg(u.v) AS m FROM (
      SELECT cluster,
             unnest(list_transform(list_zip(emb, range(1, len(emb) + 1)),
                                   p -> {{'v': p[1], 'i': p[2]}})) AS u
      FROM a{i}) GROUP BY cluster, i)
  GROUP BY cluster)"""

    parts = [
        "WITH e AS (SELECT vec_id, "
        f"list_transform(embedding, x -> round(CAST(x AS DOUBLE), {nround})) AS emb "
        "FROM embeddings),",
        "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, emb AS cent "
        f"FROM e ORDER BY vec_id LIMIT {k}),",
    ]
    for i in range(KMEANS_ITERS):
        parts.append(assign(i, f"c{i}") + ",")
        parts.append(update(i) + ",")
    parts.append(assign(KMEANS_ITERS, f"c{KMEANS_ITERS}"))
    parts.append(
        f"SELECT cluster, count(*) AS n, round(avg(d), 4) AS avg_sqdist "
        f"FROM a{KMEANS_ITERS} GROUP BY cluster ORDER BY cluster"
    )
    return "\n".join(parts)


_KMEANS_ORACLE = _kmeans_oracle()


SPECS: list[QuerySpec] = [
    QuerySpec("sim_topk", "Brute-force cosine top-k (Q29)", _sim_topk, _TOPK_ORACLE),
    QuerySpec(
        "sim_kmeans",
        "Lloyd k-means coarse-quantizer training (iterative DataFrame loop)",
        _sim_kmeans,
        _KMEANS_ORACLE,
    ),
    QuerySpec(
        "sim_knn_join",
        "Batch k-NN join: per-probe top-k over a probe set",
        _sim_knn_join,
        _KNN_JOIN_ORACLE,
    ),
    QuerySpec(
        "sim_lsh",
        "Random-hyperplane LSH bucketed cosine search (Q29 scale path)",
        _sim_lsh,
        _LSH_ORACLE,
    ),
    QuerySpec(
        "sim_ivf",
        "IVF-Flat inverted-list search, nprobe=2 (Q29 scale path)",
        _sim_ivf,
        _IVF_ORACLE,
    ),
]


def _sim_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """Range search (the ANN dual of top-k): ALL corpus vectors within
    a cosine-similarity radius of the probe, not a fixed count.  The
    predicate filters map-side right after the fold — nothing but hits
    reaches the sort, so result size (not corpus size) bounds the
    post-scan work.  The threshold compares the ROUNDED similarity so
    a 1-ulp fold difference between engines can't flip membership."""
    e = load_table(spark, sf, "embeddings")
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(F.col("embedding").alias("p"))
    scored = (
        e.crossJoin(F.broadcast(probe))
        .withColumn("__dot", F.expr(_dot_expr("embedding", "p")))
        .withColumn(
            "sim",
            F.round(
                F.col("__dot")
                / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))),
                6,
            ),
        )
    )
    return (
        scored.filter(F.col("sim") >= 0.15)
        .select("vec_id", "sim")
        .orderBy(F.desc("sim"), "vec_id")
    )


_RANGE_ORACLE = f"""
WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
scored AS (
  SELECT e.vec_id,
         round({_duck_dot('e.embedding', 'probe.p')}
           / ({_duck_norm('e.embedding')} * {_duck_norm('probe.p')}), 6) AS sim
  FROM embeddings e, probe)
SELECT vec_id, sim FROM scored WHERE sim >= 0.15 ORDER BY sim DESC, vec_id
"""


SPECS.append(
    QuerySpec(
        "sim_range_search",
        "Cosine range search: all vectors within a similarity radius",
        _sim_range_search,
        _RANGE_ORACLE,
    )
)


# ------------------------------------------------- product quantization

#: PQ geometry: 64-dim vectors split into PQ_M subspaces of PQ_SUB dims
#: each; PQ_K centroids per subspace.  Codebook = the subvectors of the
#: first PQ_K corpus vectors — the same deterministic "fixed pick"
#: convention as sim_ivf's coarse quantizer, so both engines derive a
#: bit-identical codebook (a real deployment k-means a sample instead;
#: sim_kmeans demonstrates that training loop).
PQ_M = 4
PQ_SUB = EMBEDDING_DIM // PQ_M
PQ_K = 8


def _sim_pq(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization encode (IVF-PQ's storage half, Jegou et al.
    2011): each vector becomes PQ_M uint8 codes — a 64x compression of
    a float32 64-dim embedding — plus the exact reconstruction error.

    Plan shape: the codebook (PQ_K x PQ_M subvectors) is collected to
    the driver — K rows, the same bounded collect as sim_ivf's
    centroid pick — and inlined as plan literals, so encoding is a
    ZERO-SHUFFLE row-local projection: per subspace, squared L2 to
    each centroid via a zip_with fold, argmin via array_min over
    (dist, cid) structs (lexicographic: exact ties break to the lower
    code in both engines).  At 100 TB this is the right shape: the
    codebook ships with the plan; the corpus is never joined, never
    shuffled, and the encoded table is what an ADC search scans.
    """
    e = load_table(spark, sf, "embeddings")
    cents = {
        r["vec_id"]: list(r["embedding"])
        for r in e.filter(F.col("vec_id") < PQ_K).collect()
    }
    best_exprs = []
    for m in range(PQ_M):
        start = m * PQ_SUB + 1  # 1-based slice
        cands = []
        for cid in range(PQ_K):
            sub = [float(x) for x in cents[cid][m * PQ_SUB : (m + 1) * PQ_SUB]]
            arr = "array(" + ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in sub) + ")"
            dist = (
                f"aggregate(zip_with(slice(embedding, {start}, {PQ_SUB}), {arr}, "
                f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
                f"CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            )
            cands.append(f"struct({dist} AS d, {cid} AS c)")
        best_exprs.append(f"array_min(array({', '.join(cands)}))")
    codes = F.concat_ws(
        ",", *[F.expr(f"{b}.c").cast("string") for b in best_exprs]
    )
    total = " + ".join(f"{b}.d" for b in best_exprs)
    return e.select(
        "vec_id",
        codes.alias("codes"),
        F.round(F.expr(f"sqrt({total})"), 6).alias("recon_err"),
    )


def _pq_oracle() -> str:
    dists = []
    for m in range(PQ_M):
        dists.append(
            f"list_sum(list_transform(range(1, {PQ_SUB} + 1), j -> "
            f"(CAST(e.embedding[{m * PQ_SUB} + j] AS DOUBLE) - CAST(c.cvec[{m * PQ_SUB} + j] AS DOUBLE))"
            f" * (CAST(e.embedding[{m * PQ_SUB} + j] AS DOUBLE) - CAST(c.cvec[{m * PQ_SUB} + j] AS DOUBLE)))) AS d{m}"
        )
    bests = ", ".join(
        f"list_min(list({{'d': d{m}, 'c': cid}})) AS b{m}" for m in range(PQ_M)
    )
    codes = ", ".join(f"CAST(b{m}.c AS VARCHAR)" for m in range(PQ_M))
    total = " + ".join(f"b{m}.d" for m in range(PQ_M))
    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {PQ_K}),
pair AS (
  SELECT e.vec_id, c.cid, {', '.join(dists)}
  FROM embeddings e CROSS JOIN cent c),
best AS (SELECT vec_id, {bests} FROM pair GROUP BY vec_id)
SELECT vec_id, concat_ws(',', {codes}) AS codes,
       round(sqrt({total}), 6) AS recon_err
FROM best ORDER BY vec_id
"""


SPECS.append(
    QuerySpec(
        "sim_pq",
        "Product-quantization encode: per-subspace codes + exact "
        "reconstruction error, zero-shuffle with a plan-literal codebook",
        _sim_pq,
        _pq_oracle(),
    )
)


def _sim_pq_adc(spark: SparkSession, sf: str) -> DataFrame:
    """ADC search over PQ codes (IVF-PQ's query half): the probe is
    never compared to raw vectors — per subspace, a PQ_K-entry lookup
    table of probe-to-centroid distances is built ONCE at plan time
    (driver: PQ_K x PQ_M doubles), and each stored vector's
    approximate distance is the sum of PQ_M table lookups on its
    codes.  Top-5 by approximate distance.

    At 100 TB this is why PQ exists: the scan touches 4 bytes of codes
    per vector instead of 256 bytes of floats, the tables ship as plan
    literals, and the whole search is a zero-shuffle scan + top-k.
    The lookup tables are computed with an explicit left fold in
    Python doubles — the same IEEE operation sequence as the engines'
    folds — so the DuckDB oracle reproduces every distance bit-for-bit.
    """
    e = load_table(spark, sf, "embeddings")
    adc = _adc_expr(e)
    return (
        e.select("vec_id", F.round(F.expr(f"sqrt({adc})"), 6).alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(5)
    )


def _adc_expr(e: DataFrame) -> str:
    """Plan-literal ADC distance expression over an ``embedding``
    column: collects the PQ_K codebook vectors + the probe to the
    driver (the learned model — a bounded PQ_K+1 row transfer), builds
    the per-subspace probe-to-centroid lookup tables in Python doubles
    (same IEEE sequence as the engines' folds), and returns the SQL
    summing PQ_M table lookups on the row's nearest-centroid codes.
    Shared by ``sim_pq_adc`` (flat scan) and ``sim_ivf_pq`` (scan
    restricted to the probed inverted lists)."""
    rows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in e.filter(
            (F.col("vec_id") < PQ_K) | (F.col("vec_id") == PROBE_VEC_ID)
        ).collect()
    }
    probe = rows[PROBE_VEC_ID]

    def sqdist(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    best_exprs = []
    for m in range(PQ_M):
        start = m * PQ_SUB + 1
        cands = []
        for cid in range(PQ_K):
            sub = rows[cid][m * PQ_SUB : (m + 1) * PQ_SUB]
            arr = "array(" + ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in sub) + ")"
            dist = (
                f"aggregate(zip_with(slice(embedding, {start}, {PQ_SUB}), {arr}, "
                f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
                f"CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            )
            cands.append(f"struct({dist} AS d, {cid} AS c)")
        best_exprs.append(f"array_min(array({', '.join(cands)}))")

    score_terms = []
    for m in range(PQ_M):
        table = [
            sqdist(
                probe[m * PQ_SUB : (m + 1) * PQ_SUB],
                rows[cid][m * PQ_SUB : (m + 1) * PQ_SUB],
            )
            for cid in range(PQ_K)
        ]
        tab = "array(" + ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in table) + ")"
        score_terms.append(f"element_at({tab}, {best_exprs[m]}.c + 1)")
    return " + ".join(score_terms)


def _pq_adc_oracle() -> str:
    dists = []
    for m in range(PQ_M):
        dists.append(
            f"list_sum(list_transform(range(1, {PQ_SUB} + 1), j -> "
            f"(CAST(e.embedding[{m * PQ_SUB} + j] AS DOUBLE) - CAST(c.cvec[{m * PQ_SUB} + j] AS DOUBLE))"
            f" * (CAST(e.embedding[{m * PQ_SUB} + j] AS DOUBLE) - CAST(c.cvec[{m * PQ_SUB} + j] AS DOUBLE)))) AS d{m}"
        )
    bests = ", ".join(
        f"list_min(list({{'d': d{m}, 'c': cid}})) AS b{m}" for m in range(PQ_M)
    )
    joins = " ".join(
        f"JOIN ptab t{m} ON t{m}.cid = b.b{m}.c" for m in range(PQ_M)
    )
    total = " + ".join(f"t{m}.d{m}" for m in range(PQ_M))
    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {PQ_K}),
pair AS (
  SELECT e.vec_id, c.cid, {', '.join(dists)}
  FROM embeddings e CROSS JOIN cent c),
best AS (SELECT vec_id, {bests} FROM pair GROUP BY vec_id),
ptab AS (SELECT cid, {', '.join(f'd{m}' for m in range(PQ_M))}
         FROM pair WHERE vec_id = {PROBE_VEC_ID})
SELECT b.vec_id, round(sqrt({total}), 6) AS adc_dist
FROM best b {joins}
ORDER BY adc_dist, b.vec_id LIMIT 5
"""


SPECS.append(
    QuerySpec(
        "sim_pq_adc",
        "ADC search over PQ codes: plan-literal distance tables, "
        "zero-shuffle scan + top-k",
        _sim_pq_adc,
        _pq_adc_oracle(),
    )
)


def _sim_knn_join_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """k-NN join at scale: the LSH-bucketed route the plain
    ``sim_knn_join`` docstring points to for large probe sets.

    Both sides hash to the same random-hyperplane bucket; candidates
    come from an EQUI-join on the bucket id — the corpus shuffles once
    on a key, never crossJoins — then exact cosine + per-probe top-k
    inside the candidates.  Probe-set size stops mattering: cost is
    corpus-linear in signatures plus bucket-local scoring, the
    standard two-tower retrieval layout.  Recall is bucket-limited by
    construction (a probe whose true neighbor hashes elsewhere misses
    it) — the documented LSH trade; both engines agree exactly."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "embeddings").withColumn(
        "__bucket", F.expr(_bucket_expr_spark())
    )
    probes = e.filter(F.col("vec_id") < N_KNN_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("p"),
        F.col("__bucket").alias("__pb"),
    )
    corpus = e.filter(F.col("vec_id") >= N_KNN_PROBES)
    cand = corpus.join(probes, F.col("__bucket") == F.col("__pb"), "inner")
    scored = cand.withColumn(
        "__sim",
        F.expr(_dot_expr("embedding", "p"))
        / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("__sim"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select(
            "qid", F.col("rn").alias("rank"), "vec_id",
            F.round("__sim", 6).alias("sim"),
        )
        .orderBy("qid", "rank")
    )


_KNN_JOIN_LSH_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_expr_duck('embedding')} AS bucket
  FROM embeddings),
probes AS (
  SELECT vec_id AS qid, embedding AS p, bucket AS pb FROM b
  WHERE vec_id < {N_KNN_PROBES}),
corpus AS (SELECT vec_id, embedding, bucket FROM b WHERE vec_id >= {N_KNN_PROBES}),
scored AS (
  SELECT pr.qid, c.vec_id,
         {_duck_dot('c.embedding', 'pr.p')}
           / ({_duck_norm('c.embedding')} * {_duck_norm('pr.p')}) AS simx
  FROM corpus c JOIN probes pr ON c.bucket = pr.pb),
ranked AS (
  SELECT qid, vec_id, simx,
         row_number() OVER (PARTITION BY qid ORDER BY simx DESC, vec_id) AS rn
  FROM scored)
SELECT qid, rn AS rank, vec_id, round(simx, 6) AS sim
FROM ranked WHERE rn <= {KNN_K} ORDER BY qid, rank
"""


SPECS.append(
    QuerySpec(
        "sim_knn_join_lsh",
        "LSH-bucketed k-NN join: equi-join on bucket, no crossJoin",
        _sim_knn_join_lsh,
        _KNN_JOIN_LSH_ORACLE,
    )
)


# ------------------------------------------------------- hybrid search

def _sim_hybrid_search(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid (filtered) vector search: top-10 cosine among vectors
    that pass METADATA predicates — same ``label`` as the probe AND an
    English source document (embeddings ⋈ documents on id).

    The scale point is predicate-BEFORE-distance: both filters prune
    the candidate set ahead of any arithmetic (the label filter is a
    scan predicate; the document constraint a LEFT SEMI equi-join), so
    at 100 TB a label-partitioned / doc-bucketed layout turns this
    into a partition-pruned fraction of the corpus — the distance
    never runs on a row the filter would discard.  This is the
    retrieval shape RAG/eval pipelines actually run (filtered top-k),
    not the unfiltered benchmark shape of ``sim_topk``."""
    e = load_table(spark, sf, "embeddings").select(
        "vec_id", "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
    )
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("p"), F.col("label").alias("plabel")
    )
    en_docs = (
        load_table(spark, sf, "documents")
        .filter(F.col("lang") == "en")
        .select(F.col("doc_id").alias("vec_id"))
    )
    cand = (
        e.join(en_docs, "vec_id", "left_semi")
        .crossJoin(F.broadcast(probe))
        .filter(F.col("label") == F.col("plabel"))
    )
    scored = cand.withColumn(
        "__sim",
        F.expr(_dot_expr("embedding", "p"))
        / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))),
    )
    return (
        scored.orderBy(F.desc("__sim"), "vec_id")
        .limit(10)
        .select("vec_id", "label", F.round("__sim", 6).alias("sim"))
    )


_HYBRID_ORACLE = f"""
WITH probe AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS p, label AS plabel
  FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
cand AS (
  SELECT e.vec_id, e.label,
         list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS emb, probe.p
  FROM embeddings e, probe
  WHERE e.label = probe.plabel
    AND e.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')),
scored AS (
  SELECT vec_id, label,
         {_duck_dot('emb', 'p')} / ({_duck_norm('emb')} * {_duck_norm('p')}) AS simx
  FROM cand)
SELECT vec_id, label, round(simx, 6) AS sim
FROM scored ORDER BY simx DESC, vec_id LIMIT 10
"""


SPECS.append(
    QuerySpec(
        "sim_hybrid_search",
        "Filtered top-k: metadata predicates prune before any distance",
        _sim_hybrid_search,
        _HYBRID_ORACLE,
    )
)


# ----------------------------------------------------- recall measurement

def _sim_lsh_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@10 of the LSH bucket prefilter against brute-force
    ground truth — the tuning measurement every ANN deployment needs
    (more hyperplanes = smaller buckets = cheaper probes = lower
    recall; this entry makes the trade measurable inside the engine).

    One row: candidate-set size, hits among the true top-10, recall.
    Both sides reuse the probe broadcast; the ground-truth top-k is a
    TakeOrderedAndProject, the candidate set a map-side bucket filter
    — nothing here shuffles."""
    e = load_table(spark, sf, "embeddings").withColumn(
        "__bucket", F.expr(_bucket_expr_spark())
    )
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("p"), F.col("__bucket").alias("__pbucket")
    )
    scored = e.crossJoin(F.broadcast(probe)).withColumn(
        "__sim",
        F.expr(_dot_expr("embedding", "p"))
        / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))),
    )
    exact_top = scored.orderBy(F.desc("__sim"), "vec_id").limit(10).select("vec_id")
    cand = scored.filter(F.col("__bucket") == F.col("__pbucket")).select(
        "vec_id", F.lit(1).alias("__in_bucket")
    )
    return (
        exact_top.join(cand, "vec_id", "left")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.coalesce("__in_bucket", F.lit(0))).alias("hits"),
        )
        .select(
            "k",
            "hits",
            F.round(F.col("hits") / F.col("k"), 6).alias("recall"),
        )
    )


_LSH_RECALL_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_expr_duck('embedding')} AS bucket
  FROM embeddings),
probe AS (SELECT embedding AS p, bucket AS pbucket FROM b WHERE vec_id = {PROBE_VEC_ID}),
scored AS (
  SELECT b.vec_id, b.bucket, probe.pbucket,
         {_duck_dot('b.embedding', 'probe.p')}
           / ({_duck_norm('b.embedding')} * {_duck_norm('probe.p')}) AS simx
  FROM b, probe),
exact_top AS (
  SELECT vec_id FROM scored ORDER BY simx DESC, vec_id LIMIT 10),
hits AS (
  SELECT count(*) AS k,
         CAST(sum(CASE WHEN s.bucket = s.pbucket THEN 1 ELSE 0 END)
              AS BIGINT) AS hits
  FROM exact_top t JOIN scored s ON s.vec_id = t.vec_id)
SELECT k, hits, round(CAST(hits AS DOUBLE) / k, 6) AS recall FROM hits
"""


SPECS.append(
    QuerySpec(
        "sim_lsh_recall",
        "Recall@10 of the LSH prefilter vs brute-force ground truth",
        _sim_lsh_recall,
        _LSH_RECALL_ORACLE,
    )
)


def _sim_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@10 AND probe cost of the IVF index (sim_ivf's
    nprobe=2 coarse quantizer) against brute-force ground truth —
    the lsh_recall audit for the OTHER candidate generator, reporting
    both sides of the ANN trade in one row: ``n_cand`` (vectors the
    probe actually scans — the cost) next to ``hits``/``recall`` (the
    quality).  At 100 TB this single row is the nprobe tuning signal:
    raise nprobe until recall clears the target, n_cand tells you what
    each step costs.

    Plan: ground truth is one TakeOrdered scan; the candidate set is
    the same broadcast semi-join prune as sim_ivf; the two 1-row
    aggregates meet in a broadcast product (allowlisted)."""
    e = load_table(spark, sf, "embeddings")
    assign, probed_lists = _ivf_parts(e)
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("p")
    )
    scored = e.crossJoin(F.broadcast(probe)).withColumn(
        "__sim",
        F.expr(_dot_expr("embedding", "p"))
        / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))),
    )
    exact_top = (
        scored.orderBy(F.desc("__sim"), "vec_id").limit(10).select("vec_id")
    )
    cand = assign.join(F.broadcast(probed_lists), "cid", "left_semi").select(
        "vec_id", F.lit(1).alias("__probed")
    )
    hits = exact_top.join(cand, "vec_id", "left").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.coalesce("__probed", F.lit(0))).alias("hits"),
    )
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    return hits.crossJoin(F.broadcast(n_cand)).select(
        "k",
        "hits",
        F.round(F.col("hits") / F.col("k"), 6).alias("recall"),
        "n_cand",
    )


_IVF_RECALL_ORACLE = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < {N_CENTROIDS}),
sims AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_duck_dot('e.embedding', 'c.cemb')}
           / ({_duck_norm('e.embedding')} * {_duck_norm('c.cemb')}) AS csim
  FROM embeddings e CROSS JOIN cents c),
ranked AS (
  SELECT vec_id, embedding, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
  FROM sims),
assign AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
probed AS (SELECT cid FROM ranked WHERE vec_id = {PROBE_VEC_ID} AND rn <= {N_PROBE}),
probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
scored AS (
  SELECT e.vec_id,
         {_duck_dot('e.embedding', 'probe.p')}
           / ({_duck_norm('e.embedding')} * {_duck_norm('probe.p')}) AS simx
  FROM embeddings e, probe),
exact_top AS (SELECT vec_id FROM scored ORDER BY simx DESC, vec_id LIMIT 10),
cand AS (
  SELECT vec_id FROM assign WHERE cid IN (SELECT cid FROM probed)),
hits AS (
  SELECT count(*) AS k,
         CAST(sum(CASE WHEN t.vec_id IN (SELECT vec_id FROM cand)
                       THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM exact_top t),
nc AS (SELECT count(*)::BIGINT AS n_cand FROM cand)
SELECT k, hits, round(CAST(hits AS DOUBLE) / k, 6) AS recall, n_cand
FROM hits, nc
"""


SPECS.append(
    QuerySpec(
        "sim_ivf_recall",
        "Recall@10 + probe cost (n_cand) of the IVF nprobe=2 index vs "
        "brute-force ground truth: the nprobe tuning signal",
        _sim_ivf_recall,
        _IVF_RECALL_ORACLE,
    )
)


# -------------------------------------------- nearest-centroid classify

def _sim_centroid_classify(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-centroid classification over the labeled embeddings:
    per-label mean vector -> assign every vector to the closest
    centroid (squared L2) -> confusion counts (label, pred, n).

    The quality-classifier shape for training pipelines (label
    propagation / split audit).  100 TB design: centroids are a
    (n_labels x dim) aggregate — map-side partials on (label, pos),
    n_labels*dim result rows — broadcast to a map-only assignment
    pass; no pairwise anything.  Centroids are rounded to 6 decimals
    IN BOTH ENGINES so the distance arithmetic (a positional
    left-fold) is bit-identical and the argmin is stable; argmin ties
    break on the lower label."""
    v = load_table(spark, sf, "embeddings")
    v.createOrReplaceTempView("emb_cc")
    return spark.sql(
        """
WITH pos AS (
  SELECT label, posexplode(embedding) AS (pos, val) FROM emb_cc),
cent AS (
  SELECT label AS clabel, pos, round(avg(CAST(val AS DOUBLE)), 6) AS c
  FROM pos GROUP BY label, pos),
cvec AS (
  SELECT clabel,
         transform(sort_array(collect_list(struct(pos, c))), s -> s.c) AS cv
  FROM cent GROUP BY clabel),
scored AS (
  SELECT e.vec_id, e.label, c.clabel,
         aggregate(zip_with(e.embedding, c.cv,
                            (x, y) -> (CAST(x AS DOUBLE) - y)
                                      * (CAST(x AS DOUBLE) - y)),
                   CAST(0 AS DOUBLE), (acc, d) -> acc + d) AS dist
  FROM emb_cc e CROSS JOIN cvec c),
best AS (
  SELECT vec_id, label,
         min_by(clabel, struct(dist, clabel)) AS pred
  FROM scored GROUP BY vec_id, label)
SELECT label, pred, count(*) AS n
FROM best GROUP BY label, pred ORDER BY label, pred
"""
    )


_CENTROID_ORACLE = """
WITH pos AS (
  SELECT label,
         unnest(range(0, len(embedding))) AS pos,
         unnest(list_transform(range(1, len(embedding) + 1),
                               i -> embedding[i])) AS val
  FROM embeddings),
cent AS (
  SELECT label AS clabel, pos, round(avg(CAST(val AS DOUBLE)), 6) AS c
  FROM pos GROUP BY label, pos),
cvec AS (
  SELECT clabel,
         list_transform(list_sort(list({'pos': pos, 'c': c})), s -> s.c) AS cv
  FROM cent GROUP BY clabel),
scored AS (
  SELECT e.vec_id, e.label, c.clabel,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])
                       * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]))) AS dist
  FROM embeddings e CROSS JOIN cvec c),
best AS (
  SELECT vec_id, label, clabel AS pred
  FROM (SELECT vec_id, label, clabel,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, clabel) AS rn
        FROM scored)
  WHERE rn = 1)
SELECT label, pred, count(*) AS n
FROM best GROUP BY label, pred ORDER BY label, pred
"""


SPECS.append(
    QuerySpec(
        "sim_centroid_classify",
        "Nearest-centroid classifier over labeled embeddings: "
        "broadcast centroids, map-only assignment, confusion counts",
        _sim_centroid_classify,
        _CENTROID_ORACLE,
    )
)


# ------------------------------------------------ MMR re-ranking

#: MMR trade-off between relevance and diversity (Carbonell &
#: Goldstein 1998, "The use of MMR, diversity-based reranking for
#: reordering documents and producing summaries" — public paper).
MMR_LAMBDA = "CAST(0.7 AS DOUBLE)"
MMR_POOL = 20
MMR_K = 5


def _sim_mmr(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: retrieve a cosine top-20
    candidate pool for the probe vector, then greedily select 5
    results maximizing ``λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)``
    (λ = 0.7; the empty-set max is 0, ties break mmr DESC / vec_id
    ASC) — the standard diversity re-ranker a retrieval pipeline runs
    after ANN.

    Scale design: the DISTRIBUTED stage is pool retrieval — the
    ``sim_topk`` plan (embarrassingly parallel scan, no shuffle until
    TakeOrdered); at 100 TB that stage is IVF/LSH-pruned instead
    (``sim_ivf`` / ``sim_lsh``) and this operator is unchanged.  The
    greedy selection then runs entirely on the LOCALLY CHECKPOINTED
    20-row pool: each unrolled step is a bounded broadcast join
    (≤20 candidates × ≤4 selected), so the corpus is scanned exactly
    once and nothing downstream grows with data size.

    Exactly oracle-checkable despite the floats: relevance and
    pairwise similarities fold in identical order on both engines
    (same contract as ``sim_topk``), so every argmax decision is
    bit-identical; rounding happens only at output.
    """
    e = load_table(spark, sf, "embeddings")
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("p")
    )
    pool = (
        e.where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(F.broadcast(probe))
        .withColumn(
            "rel",
            F.expr(_dot_expr("embedding", "p"))
            / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))),
        )
        .select("vec_id", "embedding", "rel")
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_POOL)
        .localCheckpoint(eager=True)  # 20 rows; corpus never re-read
    )
    lam = F.expr(MMR_LAMBDA)
    # each greedy pick is localCheckpoint'd (1 row): without the cut,
    # step t would re-embed every prior step's plan subtree and the
    # physical plan grows exponentially in k (85 exchanges at k=5)
    selected = (
        pool.orderBy(F.desc("rel"), "vec_id")
        .limit(1)
        .select(
            F.lit(1).cast("int").alias("step"),
            "vec_id",
            "embedding",
            "rel",
            (lam * F.col("rel")).alias("mmr"),
        )
        .localCheckpoint(eager=True)
    )
    for t in range(2, MMR_K + 1):
        sel_keys = selected.select("vec_id")
        rem = pool.join(F.broadcast(sel_keys), "vec_id", "left_anti")
        msim = (
            rem.crossJoin(
                F.broadcast(selected.select(F.col("embedding").alias("se")))
            )
            .withColumn(
                "sim",
                F.expr(_dot_expr("embedding", "se"))
                / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("se"))),
            )
            .groupBy("vec_id")
            .agg(F.max("sim").alias("msim"))
        )
        pick = (
            rem.join(F.broadcast(msim), "vec_id")
            .withColumn(
                "mmr",
                lam * F.col("rel") - (F.lit(1.0) - lam) * F.col("msim"),
            )
            .orderBy(F.desc("mmr"), "vec_id")
            .limit(1)
            .select(
                F.lit(t).cast("int").alias("step"),
                "vec_id",
                "embedding",
                "rel",
                "mmr",
            )
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected.select(
        "step",
        "vec_id",
        F.round("rel", 6).alias("rel"),
        F.round("mmr", 6).alias("mmr"),
    ).orderBy("step")


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in DuckDB: one MATERIALIZED CTE per step,
    the selected set referenced as a UNION of prior steps."""
    lam = MMR_LAMBDA
    dot_cs = _duck_dot("c.embedding", "s.embedding")
    norm_c = _duck_norm("c.embedding")
    norm_s = _duck_norm("s.embedding")
    blocks = [
        f"""s1 AS MATERIALIZED (
  SELECT CAST(1 AS INT) AS step, vec_id, embedding, rel, {lam} * rel AS mmr
  FROM pool ORDER BY rel DESC, vec_id LIMIT 1)"""
    ]
    for t in range(2, MMR_K + 1):
        sel = " UNION ALL ".join(
            f"SELECT * FROM s{i}" for i in range(1, t)
        )
        blocks.append(f"""sel{t} AS ({sel}),
s{t} AS MATERIALIZED (
  SELECT CAST({t} AS INT) AS step, vec_id, embedding, rel,
         {lam} * rel - (CAST(1.0 AS DOUBLE) - {lam}) * msim AS mmr
  FROM (
    SELECT c.vec_id, c.embedding, c.rel,
           max({dot_cs} / ({norm_c} * {norm_s})) AS msim
    FROM pool c, sel{t} s
    WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{t})
    GROUP BY c.vec_id, c.embedding, c.rel)
  ORDER BY mmr DESC, vec_id LIMIT 1)""")
    joined = ",\n".join(blocks)
    dot_ep = _duck_dot("e.embedding", "probe.p")
    norm_e = _duck_norm("e.embedding")
    norm_p = _duck_norm("probe.p")
    union = " UNION ALL ".join(f"SELECT * FROM s{t}" for t in range(1, MMR_K + 1))
    return f"""WITH probe AS (
  SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
pool AS MATERIALIZED (
  SELECT e.vec_id, e.embedding,
         {dot_ep} / ({norm_e} * {norm_p}) AS rel
  FROM embeddings e, probe
  WHERE e.vec_id != {PROBE_VEC_ID}
  ORDER BY rel DESC, vec_id LIMIT {MMR_POOL}),
{joined}
SELECT step, vec_id, round(rel, 6) AS rel, round(mmr, 6) AS mmr
FROM ({union}) ORDER BY step"""


_MMR_ORACLE = _mmr_oracle()


SPECS.append(
    QuerySpec(
        "sim_mmr",
        "MMR diversity re-ranking: distributed pool retrieval, then "
        "greedy λ-tradeoff selection over the checkpointed 20-row pool",
        _sim_mmr,
        _MMR_ORACLE,
    )
)


# ------------------------------------------------ greedy k-center

KCENTER_K = 5


def _sim_kcenter(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy k-center selection (Gonzalez 1985 farthest-point
    traversal, the classic 2-approximation) — the coreset / diversity
    data-selection primitive: seed with the probe vector, then
    repeatedly pick the vector FARTHEST (squared L2) from its nearest
    already-selected center.  Training-data pipelines run exactly this
    to pick maximally-covering subsets for annotation or mixing.

    Output ``(step, vec_id, dist)``: selection order, chosen vector,
    its distance to the nearest prior center at pick time (0 for the
    seed), rounded only at output.

    Scale design: each of the k-1 greedy steps is ONE embarrassingly
    parallel corpus scan — the selected centers are inlined as plan
    literals (the ``sim_pq`` codebook pattern; O(k·dim) driver bytes,
    the learned model itself), the min-distance is a ``least(...)``
    over k ordered folds inside whole-stage codegen, and the argmax is
    a TakeOrdered.  ZERO shuffles at any k; at 100 TB the k scans are
    the textbook cost of greedy k-center (sampling variants trade
    approximation for fewer scans, same operator shape).
    """
    # the greedy loop runs KCENTER_K sequential scans of the SAME
    # corpus (seed probe + k-1 argmax passes); persist it for exactly
    # that window (guide §5) — the returned frame is a driver-built
    # literal, so nothing escapes the persist scope.  A frame that is
    # already persisted (the bench warm pool) is left untouched.
    from pyspark import StorageLevel

    e = load_table(spark, sf, "embeddings")
    own_persist = None
    if e.storageLevel == StorageLevel.NONE:
        own_persist = e.persist()
    try:
        seed = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
            "vec_id", "embedding"
        ).collect()[0]
        centers = [(1, int(seed["vec_id"]), 0.0, [float(x) for x in seed["embedding"]])]
        for t in range(2, KCENTER_K + 1):
            mind = "least(" + ", ".join(
                _sqdist_spark("embedding", emb) for _, _, _, emb in centers
            ) + ")" if len(centers) > 1 else _sqdist_spark(
                "embedding", centers[0][3]
            )
            pick = (
                e.where(~F.col("vec_id").isin([vid for _, vid, _, _ in centers]))
                .select(
                    "vec_id",
                    "embedding",
                    F.expr(mind).alias("mind"),
                )
                .orderBy(F.desc("mind"), "vec_id")
                .limit(1)
                .select("vec_id", F.round("mind", 6).alias("d"), "embedding")
                .collect()[0]
            )
            centers.append(
                (t, int(pick["vec_id"]), float(pick["d"]), [float(x) for x in pick["embedding"]])
            )
    finally:
        # mirror lloyd_iterate: an exception in the greedy collect loop
        # must not leak the cached table for the session
        if own_persist is not None:
            own_persist.unpersist()
    return spark.createDataFrame(
        [(s, v, d) for s, v, d, _ in centers], "step int, vec_id long, dist double"
    ).orderBy("step")


def _kcenter_oracle() -> str:
    """Unrolled greedy k-center in DuckDB: per step, min squared-L2 to
    the union of prior picks, argmax with (mind DESC, vec_id) ties."""
    dist = (
        "list_sum(list_transform(list_zip(e.embedding, c.embedding), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    blocks = [
        f"""s1 AS MATERIALIZED (
  SELECT CAST(1 AS INT) AS step, vec_id, embedding, CAST(0.0 AS DOUBLE) AS d
  FROM embeddings WHERE vec_id = {PROBE_VEC_ID})"""
    ]
    for t in range(2, KCENTER_K + 1):
        sel = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, t))
        blocks.append(f"""sel{t} AS ({sel}),
s{t} AS MATERIALIZED (
  SELECT CAST({t} AS INT) AS step, vec_id, embedding, round(mind, 6) AS d
  FROM (
    SELECT e.vec_id, e.embedding, min({dist}) AS mind
    FROM embeddings e CROSS JOIN sel{t} c
    WHERE e.vec_id NOT IN (SELECT vec_id FROM sel{t})
    GROUP BY e.vec_id, e.embedding)
  ORDER BY mind DESC, vec_id LIMIT 1)""")
    joined = ",\n".join(blocks)
    union = " UNION ALL ".join(
        f"SELECT step, vec_id, d FROM s{t}" for t in range(1, KCENTER_K + 1)
    )
    return f"""WITH {joined}
SELECT step, CAST(vec_id AS BIGINT) AS vec_id, d AS dist
FROM ({union}) ORDER BY step"""


SPECS.append(
    QuerySpec(
        "sim_kcenter",
        "Greedy k-center (farthest-point) data selection: k-1 "
        "zero-shuffle corpus scans with plan-literal centers",
        _sim_kcenter,
        _kcenter_oracle(),
    )
)


# ------------------------------------------------ RRF hybrid fusion

RRF_K0 = 60
RRF_LEG = 20


def _sim_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of the
    lexical and dense retrieval legs — THE standard hybrid-search
    combiner: score = Σ_legs 1/(k0 + rank), k0 = 60, over the BM25
    top-20 (``text_bm25``'s exact scorer) and the cosine top-20 for
    the probe vector (``sim_topk``'s exact scorer), full-outer joined
    so single-leg documents keep their one-term score.

    Output ``(id, r_lex, r_dense, rrf)`` top-10 by (rrf DESC, id):
    ranks are INTs (NULL when a document is absent from that leg), the
    fusion score rational in integer ranks, so the only doubles are
    1/(60+r) terms summed in a fixed order — exactly reproducible.

    Scale shape: each leg is its own top-k (TakeOrdered, no shuffle
    before it — BM25's stats broadcast, cosine's probe broadcast); the
    fusion then runs on 2×20 rows.  At 100 TB the legs are the
    expensive part and keep their own pruned plans (inverted-index /
    ANN); fusion cost is rank-bounded, independent of corpus size.
    """
    from pyspark.sql import Window

    from substreams_sink_clickhouse_spark.operators.text import _bm25

    lex = _bm25(spark, sf)  # (doc_id, bm25), top-20, exact scorer
    wl = Window.orderBy(F.desc("bm25"), "doc_id")
    lexr = lex.select(
        F.col("doc_id").alias("id"),
        F.row_number().over(wl).cast("int").alias("r_lex"),
    )
    e = load_table(spark, sf, "embeddings")
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("p")
    )
    dense = (
        e.crossJoin(F.broadcast(probe))
        .withColumn(
            "sim",
            F.expr(_dot_expr("embedding", "p"))
            / (F.expr(_norm_expr("embedding")) * F.expr(_norm_expr("p"))),
        )
        .orderBy(F.desc("sim"), "vec_id")
        .limit(RRF_LEG)
    )
    wd = Window.orderBy(F.desc("sim"), "vec_id")
    denser = dense.select(
        F.col("vec_id").alias("id"),
        F.row_number().over(wd).cast("int").alias("r_dense"),
    )
    k0 = F.lit(float(RRF_K0))
    fused = (
        lexr.join(denser, "id", "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(F.lit(1.0) / (k0 + F.col("r_lex").cast("double")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (k0 + F.col("r_dense").cast("double")), F.lit(0.0)
            ),
        )
        .orderBy(F.desc("rrf"), "id")
        .limit(10)
        .select("id", "r_lex", "r_dense", F.round("rrf", 6).alias("rrf"))
    )
    return fused


def _rrf_oracle() -> str:
    from substreams_sink_clickhouse_spark.operators.text import _bm25_oracle

    bm25 = _bm25_oracle().strip()
    dot = _duck_dot("e.embedding", "probe.p")
    ne = _duck_norm("e.embedding")
    np_ = _duck_norm("probe.p")
    return f"""WITH lex AS (
  FROM ({bm25})
), lexr AS (
  SELECT doc_id AS id,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS r_lex
  FROM lex
), probe AS (
  SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
), dense AS (
  SELECT e.vec_id, {dot} / ({ne} * {np_}) AS sim
  FROM embeddings e, probe
  ORDER BY sim DESC, vec_id LIMIT {RRF_LEG}
), denser AS (
  SELECT vec_id AS id,
         CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS r_dense
  FROM dense
)
SELECT coalesce(lexr.id, denser.id) AS id, r_lex, r_dense,
       round(coalesce(1.0 / ({RRF_K0} + CAST(r_lex AS DOUBLE)), 0.0)
           + coalesce(1.0 / ({RRF_K0} + CAST(r_dense AS DOUBLE)), 0.0), 6) AS rrf
FROM lexr FULL OUTER JOIN denser ON lexr.id = denser.id
ORDER BY rrf DESC, id LIMIT 10"""


SPECS.append(
    QuerySpec(
        "sim_rrf_fusion",
        "Reciprocal-rank fusion of the BM25 and cosine top-20 legs — "
        "the standard hybrid-search combiner, rank-bounded fusion",
        _sim_rrf_fusion,
        _rrf_oracle(),
    )
)


# ------------------------------------------- Matryoshka prefix eval

#: Prefix dimensions evaluated against the full 64-dim ranking
#: (Matryoshka representation learning: a well-trained MRL embedding
#: keeps most retrieval quality in its leading dimensions, so ANN can
#: search cheap prefixes first).
MRL_DIMS = (8, 16, 32)


def _sim_matryoshka(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka prefix-dimension retrieval evaluation: for each
    prefix length d, the cosine top-10 using only ``embedding[1:d]``
    is compared with the full-dimension top-10 — per-dim overlap@10
    and top-1 agreement.  This is the measurement that decides how
    small a prefix an adaptive-retrieval deployment can serve (MRL,
    Kusupati et al. 2022) — and at 100 TB it is the cheap screen
    before committing to a truncated index.

    Plan shape: each leg is ONE TakeOrderedAndProject over the scan
    (no global sort, no shuffle — count_shuffles = 0, test-pinned at
    the sweep), ranks are a row_number window over the already-
    LIMITed 10-row result (driver-size state), and the per-dim
    overlap joins are 10-row broadcasts; 2 bounded top-k scans per
    prefix dim, output bounded (one row per dim) at any corpus
    size."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "embeddings")
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("p")
    )
    scored = e.crossJoin(F.broadcast(probe))

    def topk_ranked(dim: int | None) -> DataFrame:
        if dim is None:
            emb, pr = "embedding", "p"
        else:
            emb, pr = f"slice(embedding, 1, {dim})", f"slice(p, 1, {dim})"
        sim = (
            F.expr(_dot_expr(emb, pr))
            / (F.expr(_norm_expr(emb)) * F.expr(_norm_expr(pr)))
        )
        top = (
            scored.withColumn("__sim", sim)
            .orderBy(F.desc("__sim"), "vec_id")
            .limit(10)
        )
        # rank over the 10 surviving rows only (post-LIMIT window)
        w = Window.orderBy(F.desc("__sim"), "vec_id")
        return top.select("vec_id", F.row_number().over(w).alias("rank"))

    rows = None
    for d in MRL_DIMS:
        full = topk_ranked(None)
        pre = topk_ranked(d).withColumnRenamed("rank", "prank")
        # coalesce: a prefix top-10 DISJOINT from the full top-10 makes
        # the overlap join empty, where sum() is NULL but the oracle's
        # count(*) is 0 — the zero-row aggregate must agree
        row = full.join(pre, "vec_id").agg(
            F.lit(d).cast("long").alias("dim"),
            F.count(F.lit(1)).alias("n_overlap"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("rank") == 1) & (F.col("prank") == 1), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            ).cast("long").alias("top1_match"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows.orderBy("dim")


def _matryoshka_oracle() -> str:
    def scored(dim: int | None) -> str:
        emb = "e.embedding" if dim is None else f"e.embedding[1:{dim}]"
        pr = "probe.p" if dim is None else f"probe.p[1:{dim}]"
        return (
            f"SELECT e.vec_id, {_duck_dot(emb, pr)}"
            f" / ({_duck_norm(emb)} * {_duck_norm(pr)}) AS simx"
            f" FROM embeddings e, probe"
        )

    legs = []
    for d in MRL_DIMS:
        legs.append(f"""
SELECT CAST({d} AS BIGINT) AS dim,
       (SELECT count(*) FROM
          (SELECT vec_id FROM ({scored(None)}) ORDER BY simx DESC, vec_id LIMIT 10) f
          JOIN (SELECT vec_id FROM ({scored(d)}) ORDER BY simx DESC, vec_id LIMIT 10) pre
          USING (vec_id)) AS n_overlap,
       (SELECT count(*) FROM
          (SELECT vec_id FROM ({scored(None)}) ORDER BY simx DESC, vec_id LIMIT 1) f1
          JOIN (SELECT vec_id FROM ({scored(d)}) ORDER BY simx DESC, vec_id LIMIT 1) p1
          USING (vec_id)) AS top1_match""")
    union = "\nUNION ALL\n".join(legs)
    return f"""
WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID})
{union}
ORDER BY dim"""


SPECS.append(
    QuerySpec(
        "sim_matryoshka",
        "Matryoshka prefix-dim retrieval eval: overlap@10 + top-1 "
        "agreement of embedding[1:d] cosine vs full-dim, per prefix",
        _sim_matryoshka,
        _matryoshka_oracle(),
    )
)


# ------------------------------------------------ IVF-PQ composition

def _sim_ivf_pq(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ: the production ANN architecture (FAISS ``IVFx,PQy``
    with ``by_residual=false``) composed from the engine's two halves
    — the IVF coarse quantizer prunes the scan to the probe's
    ``N_PROBE`` inverted lists, and inside them distances come from
    PQ ADC table lookups, never raw-vector arithmetic.

    At 100 TB this multiplies the two savings: the list pruning cuts
    ROWS to ~N_PROBE/nlist of the corpus (the lists are the storage
    partitioning), and ADC cuts BYTES per surviving row to PQ_M code
    lookups against plan-literal tables (the learned model ships in
    the plan; nothing joins, nothing shuffles — the only exchange is
    the coarse assignment's per-vector rank, which a real deployment
    precomputes into the layout).  Top-5 by approximate distance over
    the probed lists."""
    e = load_table(spark, sf, "embeddings")
    assign, probed_lists = _ivf_parts(e)
    cands = assign.join(F.broadcast(probed_lists), "cid", "left_semi")
    adc = _adc_expr(e)
    return (
        cands.select(
            "vec_id", F.round(F.expr(f"sqrt({adc})"), 6).alias("adc_dist")
        )
        .orderBy("adc_dist", "vec_id")
        .limit(5)
    )


def _ivf_pq_oracle() -> str:
    dists = []
    for m in range(PQ_M):
        dists.append(
            f"list_sum(list_transform(range(1, {PQ_SUB} + 1), j -> "
            f"(CAST(e.embedding[{m * PQ_SUB} + j] AS DOUBLE) - CAST(c.cvec[{m * PQ_SUB} + j] AS DOUBLE))"
            f" * (CAST(e.embedding[{m * PQ_SUB} + j] AS DOUBLE) - CAST(c.cvec[{m * PQ_SUB} + j] AS DOUBLE)))) AS d{m}"
        )
    bests = ", ".join(
        f"list_min(list({{'d': d{m}, 'c': cid}})) AS b{m}" for m in range(PQ_M)
    )
    joins = " ".join(
        f"JOIN ptab t{m} ON t{m}.cid = b.b{m}.c" for m in range(PQ_M)
    )
    total = " + ".join(f"t{m}.d{m}" for m in range(PQ_M))
    return f"""
WITH ccents AS (
  SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < {N_CENTROIDS}),
csims AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_duck_dot('e.embedding', 'c.cemb')}
           / ({_duck_norm('e.embedding')} * {_duck_norm('c.cemb')}) AS csim
  FROM embeddings e CROSS JOIN ccents c),
cranked AS (
  SELECT vec_id, embedding, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
  FROM csims),
cassign AS (SELECT vec_id, embedding, cid FROM cranked WHERE rn = 1),
cprobed AS (SELECT cid FROM cranked WHERE vec_id = {PROBE_VEC_ID} AND rn <= {N_PROBE}),
cand AS (
  SELECT vec_id, embedding FROM cassign
  WHERE cid IN (SELECT cid FROM cprobed)),
cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {PQ_K}),
pair AS (
  SELECT e.vec_id, c.cid, {', '.join(dists)}
  FROM cand e CROSS JOIN cent c),
best AS (SELECT vec_id, {bests} FROM pair GROUP BY vec_id),
ptab AS (SELECT cid, {', '.join(f'd{m}' for m in range(PQ_M))}
         FROM pair WHERE vec_id = {PROBE_VEC_ID})
SELECT b.vec_id, round(sqrt({total}), 6) AS adc_dist
FROM best b {joins}
ORDER BY adc_dist, b.vec_id LIMIT 5
"""


SPECS.append(
    QuerySpec(
        "sim_ivf_pq",
        "IVF-PQ composition: coarse-quantizer list pruning + ADC "
        "table-lookup distances inside the probed lists (FAISS "
        "IVFx,PQy by_residual=false)",
        _sim_ivf_pq,
        _ivf_pq_oracle(),
    )
)
