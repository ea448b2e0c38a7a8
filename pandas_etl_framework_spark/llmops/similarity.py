"""Similarity search over the ``embeddings`` table (array<float> column).

Two numeric paths:

- ``cosine_topk`` / ``cosine_pairs``: real float cosine via JVM-side
  ``zip_with`` + ``aggregate`` — the production API. Float summation order
  differs between engines, so these are *library* operators (tested by
  pytest against numpy, not the DuckDB oracle).
- ``emb_*`` harness queries: embeddings quantized to BIGINT
  (round(x * 10000)) so the dot product is exact integer math — bit-stable
  across engines, hence oracle-checkable. Same plan shape as the float path.

Scale path: brute-force top-k is one broadcast of the query vector and a
single pass (O(n·d)); the pairwise variant pre-buckets by LSH sign-bits
(``lsh_bucket``) so candidate generation is an equi-join, not a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUANT_SCALE = 10000


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# Float-precision library operators (pytest-verified)
# --------------------------------------------------------------------------

def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector: one scan,
    no shuffle until the final TakeOrdered(k)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            id_col, cosine(F.col(vec_col), q).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# Quantized harness queries (DuckDB-oracle checkable)
# --------------------------------------------------------------------------

def _quantized(vec: Column) -> Column:
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long")
    )


def _qdot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def q_emb_topk(spark, sf_dir):
    """Top-10 nearest to vec_id=0 by quantized dot product."""
    emb = _emb(spark, sf_dir).withColumn("q", _quantized(F.col("embedding")))
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("q").alias("query_q")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .select("vec_id", _qdot(F.col("q"), F.col("query_q")).alias("qdot"))
        .orderBy(F.col("qdot").desc(), F.col("vec_id"))
        .limit(10)
    )


_SQL_QUANT = (
    f"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS BIGINT))"
)

SQL_EMB_TOPK = f"""
WITH q AS (
    SELECT vec_id, {_SQL_QUANT} AS qv FROM embeddings
),
target AS (SELECT qv AS query_q FROM q WHERE vec_id = 0)
SELECT vec_id,
       CAST(list_dot_product(qv, query_q) AS BIGINT) AS qdot
FROM q, target
WHERE vec_id <> 0
ORDER BY qdot DESC, vec_id
LIMIT 10
"""


def q_emb_norms(spark, sf_dir):
    """Quantized squared L2 norm per vector (exact)."""
    emb = _emb(spark, sf_dir).withColumn("q", _quantized(F.col("embedding")))
    return emb.select("vec_id", _qdot(F.col("q"), F.col("q")).alias("sq_norm"))


SQL_EMB_NORMS = f"""
WITH q AS (SELECT vec_id, {_SQL_QUANT} AS qv FROM embeddings)
SELECT vec_id, CAST(list_dot_product(qv, qv) AS BIGINT) AS sq_norm
FROM q
"""


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id: bit i = 1 iff dot(vec, plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(vec, p) > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def q_emb_knn_per_label(spark, sf_dir):
    """For each label group, the 3 mutually-nearest pairs by quantized dot —
    pairs are only formed *within* a label partition, never across.

    SCALE BOUNDARY (r14, measured): partitioning bounds the join only
    while the PER-GROUP sizes stay bounded. On a fixed label cardinality
    the groups grow with the corpus and the within-group all-pairs is
    quadratic — the sf1 → sf10full rehearsal went 20M → 2.0B pairs
    (100x on 10x data, SCALING.md r14). This row is therefore a
    GATE-SCALE diagnostic of the partitioned-exact shape, not the
    100-TB plan; the label-scoped bounded variant EXISTS as of r15 —
    ``knn_per_label_lsh`` below (banded sign-LSH within label, bucket
    cap with accounting, recall row ``emb_knn_label_recall``) — and
    query-style ANN goes through emb_ivf_topk / emb_ivfpq_topk /
    emb_ann_lsh."""
    emb = _emb(spark, sf_dir).withColumn("q", _quantized(F.col("embedding")))
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _qdot(F.col("a.q"), F.col("b.q")).alias("qdot"),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("qdot").desc(), F.col("vec_a"), F.col("vec_b")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("label", "vec_a", "vec_b", "qdot", "rn")
    )


SQL_EMB_KNN_PER_LABEL = f"""
WITH q AS (
    SELECT vec_id, label, {_SQL_QUANT} AS qv FROM embeddings
),
pairs AS (
    SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS qdot
    FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY label ORDER BY qdot DESC, vec_a, vec_b
    ) AS rn
    FROM pairs
)
SELECT label, vec_a, vec_b, qdot, rn FROM ranked WHERE rn <= 3
"""


def q_emb_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup candidates: top-20 most-similar pairs by
    quantized cosine. The cosine is sqrt-based but every input to the sqrt
    is an exact integer, so both engines compute identical doubles.

    Brute-force O(n²) verification form; at scale, generate candidates via
    ``lsh_bucket`` sign-bit buckets first and only score within buckets.
    """
    emb = _emb(spark, sf_dir).withColumn("q", _quantized(F.col("embedding")))
    scored = emb.select(
        "vec_id", "q", _qdot(F.col("q"), F.col("q")).alias("sq_norm")
    )
    a = scored.alias("a")
    b = scored.alias("b")
    cos = _qdot(F.col("a.q"), F.col("b.q")) / (
        F.sqrt(F.col("a.sq_norm").cast("double"))
        * F.sqrt(F.col("b.sq_norm").cast("double"))
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("qcos"),
        )
        .orderBy(F.col("qcos").desc(), F.col("vec_a"), F.col("vec_b"))
        .limit(20)
    )


SQL_EMB_NEARDUP_PAIRS = f"""
WITH q AS (
    SELECT vec_id, {_SQL_QUANT} AS qv FROM embeddings
),
scored AS (
    SELECT vec_id, qv, CAST(list_dot_product(qv, qv) AS BIGINT) AS sq_norm
    FROM q
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(list_dot_product(a.qv, b.qv) AS BIGINT)
           / (sqrt(CAST(a.sq_norm AS DOUBLE)) * sqrt(CAST(b.sq_norm AS DOUBLE)))
           AS qcos
FROM scored a JOIN scored b ON a.vec_id < b.vec_id
ORDER BY qcos DESC, vec_a, vec_b
LIMIT 20
"""


# --------------------------------------------------------------------------
# IVF index: k-means coarse quantizer + probe-limited search
# --------------------------------------------------------------------------

def _dist_sq(vec: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diff = F.zip_with(vec, c, lambda a, b: a.cast("double") - b)
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)


def assign_to_centroids(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Add ``centroid_id`` = argmin squared-L2 over the centroid list.
    Centroids are literals (driver-side, k×d values), so assignment is one
    JVM-side scan — no join, no shuffle.

    argmin is array_position(dists, array_min(dists)): a chained
    when/otherwise fold would nest every prior step inside the next and
    blow up the expression tree exponentially in k (k=16 already stalls
    analysis); the array form is linear."""
    dists = F.array(*[_dist_sq(F.col(vec_col), cen) for cen in centroids])
    best = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.withColumn("centroid_id", best)


def build_ivf_index(
    df: DataFrame,
    k: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer via Lloyd's k-means expressed as DataFrame ops:
    assignment is a literal-centroid scan, the update step aggregates
    element-wise means via posexplode + groupBy — only k×d numbers ever
    reach the driver per iteration. Deterministic init (first k by id).

    Returns (assignments, centroids): the partitioned index plus its
    driver-side centroid table.
    """
    centroids = [
        [float(x) for x in r[0]]
        for r in df.orderBy(id_col).limit(k).select(vec_col).collect()
    ]
    assigned = None
    for _ in range(iterations):
        assigned = assign_to_centroids(df, centroids, vec_col)
        rows = (
            assigned.select("centroid_id", F.posexplode(F.col(vec_col)))
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("v"))
            .collect()
        )
        new_centroids = {cid: list(cen) for cid, cen in enumerate(centroids)}
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r["centroid_id"], {})[r["pos"]] = r["v"]
        for cid, dims in by_cluster.items():
            new_centroids[cid] = [dims[i] for i in range(len(dims))]
        centroids = [new_centroids[i] for i in range(k)]
    return assigned, centroids


def build_pq_index(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Product quantization: split each vector into ``m`` subvectors,
    k-means each subspace independently (reusing the IVF Lloyd loop), and
    encode a vector as its m centroid codes — d*4 bytes shrink to m bytes
    (64x here), which is what makes billion-vector search fit in memory.

    Returns (codes_df: id + code_0..code_{m-1}, codebooks[m][k][sub_d])."""
    dim = len(df.select(vec_col).first()[0])
    sub_d = dim // m
    codes = df.select(id_col, vec_col)
    codebooks: list[list[list[float]]] = []
    for j in range(m):
        sub = df.select(
            id_col,
            F.slice(F.col(vec_col), j * sub_d + 1, sub_d).alias(vec_col),
        )
        assigned, cents = build_ivf_index(
            sub, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
        )
        codebooks.append(cents)
        codes = codes.join(
            assigned.select(
                id_col, F.col("centroid_id").alias(f"code_{j}")
            ),
            id_col,
        )
    return codes, codebooks


def pq_search(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance PQ search: per subspace, the query's NEGATIVE
    squared-L2 distance to each of the 16 codebook centroids becomes a
    16-entry literal lookup table (L2 matches the k-means training metric);
    a row's estimated score is the sum of its m table hits — a pure
    projection over the byte codes, no vector math per row. The top
    ``rerank`` candidates are then re-scored with exact cosine on the
    original vectors (the standard PQ + rerank recipe)."""
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    est = None
    for j in range(m):
        q_sub = query_vec[j * sub_d: (j + 1) * sub_d]
        lut = [
            -sum((float(a) - float(b)) ** 2 for a, b in zip(q_sub, cen))
            for cen in codebooks[j]
        ]
        hit = F.element_at(
            F.array(*[F.lit(v) for v in lut]), F.col(f"code_{j}") + 1
        )
        est = hit if est is None else est + hit
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cands = (
        codes_df.select(id_col, vec_col, est.alias("est_score"))
        .orderBy(F.col("est_score").desc(), F.col(id_col))
        .limit(rerank)
    )
    return (
        cands.select(id_col, cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_search(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe-limited ANN: score only the ``nprobe`` nearest clusters to the
    query (centroid ranking is driver-side over k rows), then exact cosine
    top-k within them. Scanned fraction ≈ nprobe/k of the corpus — the
    partition-pruning analogue for vector search: at scale, write the index
    partitioned by centroid_id and the probe filter prunes whole files."""
    order = sorted(
        range(len(centroids)),
        key=lambda i: sum((a - b) ** 2 for a, b in zip(centroids[i], query_vec)),
    )
    probes = order[:nprobe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("centroid_id").isin(probes))
        .select(id_col, cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# LSH-bucketed ANN (the scale path: candidates via equi-join, not cross join)
# --------------------------------------------------------------------------

EMB_DIM = 64
N_PLANES = 8


def _det_planes() -> list[list[int]]:
    """Deterministic odd-integer hyperplanes derived from md5 — reproducible
    in any engine/driver without a random-state dependency. Components
    2*digit-15 are always odd, so no component is zero and plane dot
    products over even/odd integer grids rarely land exactly on zero."""
    import hashlib

    return [
        [
            2 * int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[0], 16) - 15
            for j in range(EMB_DIM)
        ]
        for p in range(N_PLANES)
    ]


PLANES = _det_planes()


def _bucket_expr(qcol: Column) -> Column:
    """Sign-bit bucket id over the quantized embedding (exact int math)."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(PLANES):
        arr = F.array(*[F.lit(v).cast("long") for v in plane])
        bucket = bucket + F.when(
            _qdot(qcol, arr) > 0, F.lit(2**p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def _sql_bucket(qv: str = "qv") -> str:
    terms = []
    for p, plane in enumerate(PLANES):
        lits = "[" + ", ".join(str(v) for v in plane) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({qv}, {lits}) > 0 "
            f"THEN CAST({2**p} AS BIGINT) ELSE 0 END"
        )
    return " + ".join(terms)


def q_emb_lsh_buckets(spark, sf_dir):
    """Per-vector LSH bucket id: 2^8 sign-bit buckets from the deterministic
    planes — one scan, no joins. This is the coarse index build."""
    emb = _emb(spark, sf_dir).withColumn("q", _quantized(F.col("embedding")))
    return emb.select("vec_id", _bucket_expr(F.col("q")).alias("bucket"))


SQL_EMB_LSH_BUCKETS = f"""
WITH q AS (SELECT vec_id, {_SQL_QUANT} AS qv FROM embeddings)
SELECT vec_id, {_sql_bucket()} AS bucket FROM q
"""


def q_emb_ann_lsh(spark, sf_dir):
    """ANN search for vec_id=0: candidates restricted to the query's LSH
    bucket (equi-join on bucket id), exact quantized-dot scoring within.
    At 100 TB the bucket join shuffles only (vec_id, bucket) + vectors of
    one bucket — never the all-pairs product the brute-force path needs."""
    emb = _emb(spark, sf_dir).withColumn("q", _quantized(F.col("embedding")))
    bucketed = emb.select("vec_id", "q", _bucket_expr(F.col("q")).alias("bucket"))
    query = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("q").alias("query_q"), F.col("bucket").alias("query_bucket")
    )
    return (
        bucketed.filter(F.col("vec_id") != 0)
        .join(
            F.broadcast(query),
            F.col("bucket") == F.col("query_bucket"),
        )
        .select("vec_id", _qdot(F.col("q"), F.col("query_q")).alias("qdot"))
        .orderBy(F.col("qdot").desc(), F.col("vec_id"))
        .limit(5)
    )


SQL_EMB_ANN_LSH = f"""
WITH q AS (SELECT vec_id, {_SQL_QUANT} AS qv FROM embeddings),
bucketed AS (SELECT vec_id, qv, {_sql_bucket()} AS bucket FROM q),
target AS (
    SELECT qv AS query_q, bucket AS query_bucket FROM bucketed WHERE vec_id = 0
)
SELECT vec_id, CAST(list_dot_product(qv, query_q) AS BIGINT) AS qdot
FROM bucketed, target
WHERE vec_id <> 0 AND bucket = query_bucket
ORDER BY qdot DESC, vec_id
LIMIT 5
"""


def q_emb_topk_batch(spark, sf_dir):
    """Batched similarity search: top-3 neighbors for EACH of the first 8
    query vectors in one job — broadcast the query block, score all
    (query, candidate) pairs, window-rank per query. The shape that serves
    a whole retrieval workload rather than one lookup."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir).withColumn("q", _quantized(F.col("embedding")))
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("query_q")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _qdot(F.col("q"), F.col("query_q")).alias("qdot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


SQL_EMB_TOPK_BATCH = f"""
WITH q AS (SELECT vec_id, {_SQL_QUANT} AS qv FROM embeddings),
queries AS (SELECT vec_id AS query_id, qv AS query_q FROM q WHERE vec_id < 8),
scored AS (
    SELECT query_id, vec_id,
           CAST(list_dot_product(qv, query_q) AS BIGINT) AS qdot
    FROM q CROSS JOIN queries
    WHERE vec_id <> query_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY qdot DESC, vec_id
    ) AS rank
    FROM scored
)
SELECT query_id, vec_id, qdot, rank FROM ranked WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# MMR diversity selection (maximal marginal relevance, Carbonell &
# Goldstein 1998) — diverse top-k example selection for curation
# --------------------------------------------------------------------------

MMR_CAND = 48   # relevance window the greedy runs over (fixed, corpus-free)
MMR_K = 8       # diverse items selected


def mmr_select(
    candidates: "list[tuple[int, list[int], int]]",
    k: int = MMR_K,
    lam: "tuple[int, int]" = (1, 2),
) -> "list[tuple[int, int, int, int, int]]":
    """Greedy MMR over a driver-sized candidate window.

    ``candidates`` = [(vec_id, quantized_vec, rel)] with integer
    relevance (quantized dot to the query). The trade-off is an exact
    rational ``lam = (num, den)`` (lambda = num/den): argmax of
    ``lambda*rel - (1-lambda)*max_sim`` equals argmax of
    ``num*rel - (den-num)*max_sim``, so the whole greedy stays integer
    arithmetic for ANY lambda — Python ints here, BIGINT in the SQL
    twin — and the selection is engine-exact. The default (1, 2) makes
    the reported ``mmr_q`` the familiar ``rel - max_sim``. Ties break on
    vec_id ascending. The first pick (empty selected set) is pure
    relevance with a 0 max-sim sentinel.
    Returns [(vec_id, rel, maxsim, mmr_q, step)].
    """
    num, den = lam
    if not (0 < num <= den):
        raise ValueError(f"lam must satisfy 0 < num <= den, got {lam}")
    # no pre-sort: each step scans the whole pool with a unique
    # total-order key, so input order never influences the argmax
    pool = list(candidates)
    selected: list[tuple[int, list[int], int]] = []
    out = []
    for step in range(1, min(k, len(pool)) + 1):
        best = None
        for vid, qv, rel in pool:
            if any(vid == s[0] for s in selected):
                continue
            maxsim = max(
                (sum(x * y for x, y in zip(qv, s[1])) for s in selected),
                default=0,
            )
            mmr_q = num * rel - (den - num) * maxsim
            key = (-mmr_q, vid)
            if best is None or key < best[0]:
                best = (key, (vid, qv, rel, maxsim, mmr_q))
        vid, qv, rel, maxsim, mmr_q = best[1]
        selected.append((vid, qv, rel))
        out.append((vid, rel, maxsim, mmr_q, step))
    return out


def q_emb_mmr_select(spark, sf_dir):
    """Diverse top-``MMR_K`` selection: distributed top-``MMR_CAND``
    relevance cut (quantized dot to vec_id 0), then greedy MMR over that
    fixed-size window.

    Scale posture: the distributed stage is a broadcast-query scan +
    TakeOrdered — the only part that grows with the corpus; the greedy
    is inherently sequential (each pick conditions on the previous) and
    runs over MMR_CAND rows collected to the driver, the same
    driver-bounded-collect shape as the k-means centroid reads. At
    billion-vector scale the relevance cut is where the work is, and it
    stays one pruned scan.
    """
    emb = _emb(spark, sf_dir).withColumn("q", _quantized(F.col("embedding")))
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("q").alias("query_q")
    )
    window = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id", "q", _qdot(F.col("q"), F.col("query_q")).alias("rel")
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(MMR_CAND)
        .collect()
    )
    picked = mmr_select([(r["vec_id"], r["q"], r["rel"]) for r in window])
    return spark.createDataFrame(
        picked, "vec_id long, rel long, maxsim long, mmr_q long, step int"
    )


def _sql_mmr_select() -> str:
    """Unrolled greedy: one CTE pair per step — the pool (max-sim against
    everything selected so far, via a correlated MAX over a UNION of the
    prior picks) and the argmax pick. MMR_CAND rows per stage, so the
    unrolling is trivially cheap for the oracle engine."""
    parts = [
        f"q AS (SELECT vec_id, {_SQL_QUANT} AS qv FROM embeddings)",
        "target AS (SELECT qv AS tq FROM q WHERE vec_id = 0)",
        # every multiply-referenced CTE is MATERIALIZED: the a{{i}}
        # accumulator chain is referenced twice per stage, and DuckDB's
        # default inlining would re-evaluate it exponentially deep
        f"""cand AS MATERIALIZED (
    SELECT vec_id, qv,
           CAST(list_dot_product(qv, tq) AS BIGINT) AS rel
    FROM q, target WHERE vec_id <> 0
    ORDER BY rel DESC, vec_id LIMIT {MMR_CAND}
)""",
        """s1 AS MATERIALIZED (
    SELECT vec_id, qv, rel, CAST(0 AS BIGINT) AS maxsim, rel AS mmr_q
    FROM cand ORDER BY rel DESC, vec_id LIMIT 1
)""",
        "a1 AS MATERIALIZED (SELECT vec_id, qv FROM s1)",
    ]
    for i in range(2, MMR_K + 1):
        parts.append(f"""p{i} AS (
    SELECT c.vec_id, c.qv, c.rel,
           (SELECT MAX(CAST(list_dot_product(c.qv, s.qv) AS BIGINT))
            FROM a{i - 1} s) AS maxsim
    FROM cand c
    WHERE c.vec_id NOT IN (SELECT vec_id FROM a{i - 1})
)""")
        parts.append(f"""s{i} AS MATERIALIZED (
    SELECT vec_id, qv, rel, maxsim, rel - maxsim AS mmr_q
    FROM p{i} ORDER BY mmr_q DESC, vec_id LIMIT 1
)""")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT vec_id, qv FROM a{i - 1} "
            f"UNION ALL SELECT vec_id, qv FROM s{i})"
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT vec_id, rel, maxsim, mmr_q, "
        f"CAST({i} AS INTEGER) AS step FROM s{i}"
        for i in range(1, MMR_K + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


# --------------------------------------------------------------------------
# Bounded per-label kNN: banded LSH within label (VERDICT r14 item 3)
# --------------------------------------------------------------------------

# band slices over the deterministic sign planes: 2 bands x 4 bits.
# Candidates are same-(label, band, bucket) pairs, so per-label work is
# ~NB * sum(|bucket|^2) instead of the exact row's all-pairs; the bit
# count (and band split) is the deployment knob — size bits to
# ~log2(n_label / target_bucket) so buckets stay near a constant at the
# deployed corpus; it is PINNED here so the DuckDB oracle is static.
KNN_LSH_BANDS: list[tuple[int, int]] = [(0, 4), (4, 8)]
# over-cap (label, band, bucket) groups reported by knn_lsh_hot_buckets:
# since the r15 window-pairing rewrite this is a SKEW DIAGNOSTIC only —
# candidate work is linear in bucket size (<= KNN_LSH_WINDOW successors
# per member), so hot buckets cost proportional time, never correctness,
# and nothing is skipped
KNN_LSH_BUCKET_CAP = 1000

# sliding-window breadth for within-bucket candidate generation: each
# vector pairs with its next KNN_LSH_WINDOW successors in the bucket's
# secondary-projection order (Manku/Das/Garcia-Molina WWW'07 sorted-
# fingerprint sweep). Candidates <= bands * WINDOW per vector at ANY
# corpus — the boundedness is structural, not a cap that can trip.
KNN_LSH_WINDOW = 8


def _det_sort_plane() -> list[int]:
    """One extra deterministic odd-integer plane (seed disjoint from
    PLANES) for the within-bucket secondary sort order."""
    import hashlib

    return [
        2 * int(hashlib.md5(f"s_{j}".encode()).hexdigest()[0], 16) - 15
        for j in range(EMB_DIM)
    ]


SORT_PLANE = _det_sort_plane()


def _band_expr(qcol: Column, lo: int, hi: int) -> Column:
    """Sign-bit bucket id over planes [lo, hi) — band-local bit weights."""
    bucket = F.lit(0).cast("long")
    for p in range(lo, hi):
        arr = F.array(*[F.lit(v).cast("long") for v in PLANES[p]])
        bucket = bucket + F.when(
            _qdot(qcol, arr) > 0, F.lit(2 ** (p - lo)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def _sql_band(lo: int, hi: int, qv: str = "qv") -> str:
    terms = []
    for p in range(lo, hi):
        lits = "[" + ", ".join(str(v) for v in PLANES[p]) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({qv}, {lits}) > 0 "
            f"THEN CAST({2 ** (p - lo)} AS BIGINT) ELSE 0 END"
        )
    return " + ".join(terms)


def _knn_lsh_tokens(emb: DataFrame) -> DataFrame:
    """(vec_id, label, q, band, bkey): one row per (vector, band)."""
    base = emb.withColumn("q", _quantized(F.col("embedding")))
    parts = [
        base.select(
            "vec_id",
            "label",
            "q",
            F.lit(b).cast("int").alias("band"),
            _band_expr(F.col("q"), lo, hi).alias("bkey"),
        )
        for b, (lo, hi) in enumerate(KNN_LSH_BANDS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def knn_lsh_hot_buckets(
    emb: DataFrame, bucket_cap: int = KNN_LSH_BUCKET_CAP
) -> DataFrame:
    """(label, band, bkey, n_vecs) for buckets over the cap — a SKEW
    DIAGNOSTIC since the r15 window-pairing rewrite: hot buckets cost
    time proportional to their size (window pairing is linear in bucket
    size), nothing is skipped, so this reports where the projection
    bits under-split the corpus and more band bits would help."""
    return (
        _knn_lsh_tokens(emb)
        .groupBy("label", "band", "bkey")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .filter(F.col("n_vecs") > bucket_cap)
    )


def knn_per_label_lsh(
    emb: DataFrame,
    k: int = 3,
    window: int = KNN_LSH_WINDOW,
) -> DataFrame:
    """BOUNDED per-label top-k pairs by quantized COSINE: sign-LSH
    bucketing within label, then a SORTED SLIDING WINDOW inside each
    bucket — each vector pairs only with its next ``window`` successors
    in the bucket's secondary-projection order (the Manku WWW'07
    sorted-fingerprint sweep). This is the scale path for the
    within-label neighbor problem whose exact form
    (``q_emb_knn_per_label``) is quadratic on fixed label cardinality
    (measured 20M -> 2.0B pairs sf1 -> sf10full, SCALING.md r14).

    Why the window, not within-bucket all-pairs: the band key space is
    FIXED (2^bits buckets per label x band), so bucket size grows
    linearly with the corpus and within-bucket all-pairs re-grows the
    quadratic one level down — measured 15.3x on the r15 decade before
    this rewrite — while a skip-the-bucket cap collapses to a vacuous
    result once every bucket outgrows it. The window bounds candidates
    STRUCTURALLY: <= bands * window per vector at any corpus, hot
    buckets cost proportional time (knn_lsh_hot_buckets is the skew
    account), and near neighbors stay adjacent in the secondary order
    because a small angle keeps every projection close.

    Cosine (not the exact row's raw dot) because sign-LSH collision
    probability is a function of ANGLE — per bit p = 1 - theta/pi — and
    cosine is what production near-dup mining thresholds on. Recall is
    regime-dependent and measured, not assumed: the oracle-gated
    ``emb_knn_label_recall`` row reports the RANDOM-DATA FLOOR on this
    fixture (its labels have no angular structure, top-pair cos ~0.5 ->
    4-bit band collision ~0.2), while the planted-near-dup test
    (tests/test_llmops_knn_lsh.py) pins the production regime: at
    cos >= 0.9, p >= 0.85 per bit, so a 4-bit band collides with
    p >= 0.54 and two bands reach ~0.79 — more/shorter bands and a
    wider window are the recall knobs."""
    sort_plane = F.array(*[F.lit(v).cast("long") for v in SORT_PLANE])
    toks = _knn_lsh_tokens(emb).withColumn(
        "s", _qdot(F.col("q"), sort_plane)
    )
    # next-`window` successors in (s, vec_id) order within the bucket:
    # one window shuffle keyed on the bucket, NO self-join — candidate
    # volume is <= window per row by construction
    wb = Window.partitionBy("label", "band", "bkey").orderBy("s", "vec_id")
    succ = toks.withColumn(
        "succ",
        F.collect_list(
            F.struct(F.col("vec_id").alias("nid"), F.col("q").alias("nq"))
        ).over(wb.rowsBetween(1, window)),
    )
    raw = succ.select(
        "label",
        "band",
        "bkey",
        "vec_id",
        "q",
        F.explode("succ").alias("nxt"),
    )
    # every input to the sqrts is an exact integer, so the doubles (and
    # their ordering) are engine-identical — the emb_neardup_pairs
    # precedent
    qcos = _qdot(F.col("q"), F.col("nxt.nq")) / (
        F.sqrt(_qdot(F.col("q"), F.col("q")).cast("double"))
        * F.sqrt(_qdot(F.col("nxt.nq"), F.col("nxt.nq")).cast("double"))
    )
    scored = raw.select(
        "label",
        "band",
        "bkey",
        F.least(F.col("vec_id"), F.col("nxt.nid")).alias("vec_a"),
        F.greatest(F.col("vec_id"), F.col("nxt.nid")).alias("vec_b"),
        qcos.alias("qcos"),
    )
    # per-bucket pre-prune in the GLOBAL total order (qcos desc, vec_a,
    # vec_b): a pair ranked > k inside its own bucket is beaten by k
    # same-label pairs from that bucket, so it cannot make the label's
    # top-k — the final per-label window then ranks <= k * n_buckets
    # rows, a CONSTANT per label, instead of a corpus-linear relation
    wbucket = Window.partitionBy("label", "band", "bkey").orderBy(
        F.col("qcos").desc(), "vec_a", "vec_b"
    )
    pruned = (
        scored.withColumn("brn", F.row_number().over(wbucket))
        .filter(F.col("brn") <= k)
        .select("label", "vec_a", "vec_b", "qcos")
        # a pair adjacent in several bands must rank once, not per band
        .distinct()
    )
    w = Window.partitionBy("label").orderBy(
        F.col("qcos").desc(), "vec_a", "vec_b"
    )
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("label", "vec_a", "vec_b", "qcos", "rn")
    )


def q_emb_knn_per_label_lsh(spark, sf_dir):
    """Driver row for the bounded per-label kNN (see knn_per_label_lsh)."""
    return knn_per_label_lsh(_emb(spark, sf_dir))


_SORT_PLANE_LITS = "[" + ", ".join(str(v) for v in SORT_PLANE) + "]"

# the rn-difference join is the oracle-side rendering of the sliding
# window (value-identical to the collect_list frame; quadratic probes
# are fine at gate scale — the Spark side never joins)
_SQL_KNN_LSH_BODY = f"""
q AS (SELECT vec_id, label, {_SQL_QUANT} AS qv FROM embeddings),
ltoks AS (
    SELECT vec_id, label, qv, 0 AS band, {_sql_band(0, 4)} AS bkey FROM q
    UNION ALL
    SELECT vec_id, label, qv, 1 AS band, {_sql_band(4, 8)} AS bkey FROM q
),
lrn AS (
    SELECT *,
           CAST(list_dot_product(qv, {_SORT_PLANE_LITS}) AS BIGINT) AS s,
           ROW_NUMBER() OVER (
               PARTITION BY label, band, bkey
               ORDER BY CAST(list_dot_product(qv, {_SORT_PLANE_LITS}) AS BIGINT),
                        vec_id
           ) AS wrn
    FROM ltoks
),
lscored AS (
    SELECT DISTINCT a.label,
           LEAST(a.vec_id, b.vec_id) AS vec_a,
           GREATEST(a.vec_id, b.vec_id) AS vec_b,
           CAST(list_dot_product(a.qv, b.qv) AS BIGINT)
               / (sqrt(CAST(CAST(list_dot_product(a.qv, a.qv) AS BIGINT) AS DOUBLE))
                  * sqrt(CAST(CAST(list_dot_product(b.qv, b.qv) AS BIGINT) AS DOUBLE)))
               AS qcos
    FROM lrn a JOIN lrn b
      ON a.label = b.label AND a.band = b.band AND a.bkey = b.bkey
     AND b.wrn > a.wrn AND b.wrn <= a.wrn + {KNN_LSH_WINDOW}
),
lranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY label ORDER BY qcos DESC, vec_a, vec_b
    ) AS rn
    FROM lscored
)"""

SQL_EMB_KNN_PER_LABEL_LSH = f"""
WITH {_SQL_KNN_LSH_BODY}
SELECT label, vec_a, vec_b, qcos, CAST(rn AS INTEGER) AS rn
FROM lranked WHERE rn <= 3
"""


def _exact_knn_per_label_cos(spark, sf_dir):
    """Exact per-label top-3 pairs by quantized cosine — the like-for-like
    ground truth for the LSH recall row (the dot-ranked
    q_emb_knn_per_label stays the separate all-pairs diagnostic)."""
    emb = _emb(spark, sf_dir).withColumn("q", _quantized(F.col("embedding")))
    rhs = emb.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("vid_b"),
        F.col("q").alias("q_b"),
    )
    qcos = _qdot(F.col("q"), F.col("q_b")) / (
        F.sqrt(_qdot(F.col("q"), F.col("q")).cast("double"))
        * F.sqrt(_qdot(F.col("q_b"), F.col("q_b")).cast("double"))
    )
    pairs = emb.join(
        rhs,
        (F.col("label") == F.col("label_b"))
        & (F.col("vec_id") < F.col("vid_b")),
    ).select(
        "label",
        F.col("vec_id").alias("vec_a"),
        F.col("vid_b").alias("vec_b"),
        qcos.alias("qcos"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("qcos").desc(), "vec_a", "vec_b"
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("label", "vec_a", "vec_b")
    )


def q_emb_knn_label_recall(spark, sf_dir):
    """Recall@3 of the banded-LSH per-label kNN vs the exact all-pairs
    cosine form, per label — the emb_ivf_recall_at_k pattern applied to
    the bounded per-label row: measure the approximation at gate scale
    before trusting it at corpus scale. Both sides rank by the same
    quantized cosine with the same tie-break, so misses are exactly the
    true top pairs whose members collide in no band. On THIS fixture the
    value is the random-data floor (see knn_per_label_lsh); the planted
    near-dup regime is pinned in tests/test_llmops_knn_lsh.py."""
    bounded = q_emb_knn_per_label_lsh(spark, sf_dir).select(
        "label", "vec_a", "vec_b"
    )
    exact = _exact_knn_per_label_cos(spark, sf_dir).select(
        F.col("label").alias("xlabel"),
        F.col("vec_a").alias("xa"),
        F.col("vec_b").alias("xb"),
    )
    hits = (
        exact.join(
            bounded,
            (F.col("xlabel") == F.col("label"))
            & (F.col("xa") == F.col("vec_a"))
            & (F.col("xb") == F.col("vec_b")),
            "left",
        )
        .groupBy("xlabel")
        .agg(F.count("label").cast("long").alias("n_hits"))
    )
    return hits.select(
        F.col("xlabel").alias("label"),
        F.lit(3).cast("long").alias("k"),
        "n_hits",
        (F.col("n_hits").cast("double") / 3.0).alias("recall_at_3"),
    ).orderBy("label")


SQL_EMB_KNN_LABEL_RECALL = f"""
WITH {_SQL_KNN_LSH_BODY},
xpairs AS (
    SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(list_dot_product(a.qv, b.qv) AS BIGINT)
               / (sqrt(CAST(CAST(list_dot_product(a.qv, a.qv) AS BIGINT) AS DOUBLE))
                  * sqrt(CAST(CAST(list_dot_product(b.qv, b.qv) AS BIGINT) AS DOUBLE)))
               AS qcos
    FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
),
xranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY label ORDER BY qcos DESC, vec_a, vec_b
    ) AS rn
    FROM xpairs
)
SELECT x.label, CAST(3 AS BIGINT) AS k,
       CAST(COUNT(g.vec_a) AS BIGINT) AS n_hits,
       CAST(COUNT(g.vec_a) AS DOUBLE) / 3.0 AS recall_at_3
FROM (SELECT * FROM xranked WHERE rn <= 3) x
LEFT JOIN (SELECT * FROM lranked WHERE rn <= 3) g
  ON x.label = g.label AND x.vec_a = g.vec_a AND x.vec_b = g.vec_b
GROUP BY x.label
ORDER BY x.label
"""


QUERIES = {
    "emb_topk": (q_emb_topk, SQL_EMB_TOPK),
    "emb_mmr_select": (q_emb_mmr_select, _sql_mmr_select()),
    "emb_topk_batch": (q_emb_topk_batch, SQL_EMB_TOPK_BATCH),
    "emb_norms": (q_emb_norms, SQL_EMB_NORMS),
    "emb_knn_per_label": (q_emb_knn_per_label, SQL_EMB_KNN_PER_LABEL),
    "emb_neardup_pairs": (q_emb_neardup_pairs, SQL_EMB_NEARDUP_PAIRS),
    "emb_lsh_buckets": (q_emb_lsh_buckets, SQL_EMB_LSH_BUCKETS),
    "emb_ann_lsh": (q_emb_ann_lsh, SQL_EMB_ANN_LSH),
    "emb_knn_per_label_lsh": (
        q_emb_knn_per_label_lsh,
        SQL_EMB_KNN_PER_LABEL_LSH,
    ),
    "emb_knn_label_recall": (
        q_emb_knn_label_recall,
        SQL_EMB_KNN_LABEL_RECALL,
    ),
}
