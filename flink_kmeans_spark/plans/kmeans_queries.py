"""K-Means query registry entries (SURVEY.md §2A — reference parity).

The reference computes exactly one pipeline: Lloyd's K-Means over a
point set (SURVEY.md §1). These entries expose each stage of that
dataflow plus the full fit/predict loop and the MLlib path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import kmeans as km
from ..operators.kmeans_mllib import mllib_kmeans_predict
from ..sources import load_table
from .registry import register

K = 10
N_ITER = 10


def _lloyd_ctes(k: int, n_iter: int) -> str:
    """DuckDB CTE chain computing ``n_iter`` unrolled Lloyd's iterations
    (the reference's bulk iteration, SURVEY §2A A8) — so the driver can
    hash-verify the ITERATIVE flagship pipeline, not just one step.

    Every CTE is ``AS MATERIALIZED``: each ``c{i}`` is referenced twice
    (assignment + empty-cluster fallback), and DuckDB's default CTE
    inlining would expand the chain 2^n_iter times (measured: >120 s vs
    0.7 s materialized at sf0.01). Empty clusters keep their previous
    centroid via the LEFT JOIN + COALESCE, matching operators/kmeans.py.
    Float discipline: all arithmetic in DOUBLE; the per-dimension AVG
    fold order differs from the engine's partition-partial sums only at
    ~1e-15, invisible at the 6 dp hash rounding (verified bit-stable
    across local[8]/local[32]/repartition(7) at sf0.01 and sf0.001)."""
    parts = [
        f"""pts AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    c0 AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {k}))"""
    ]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(
            f"""a{i} AS MATERIALIZED (
      SELECT vec_id, v, cid FROM (
        SELECT p.vec_id, p.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 list_aggregate(list_transform(list_zip(p.v, c.cvec),
                   z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum'), c.cid) AS rn
        FROM pts p CROSS JOIN c{p} c) WHERE rn = 1),
    m{i} AS MATERIALIZED (
      SELECT cid, list(mv ORDER BY dimi) AS cvec FROM (
        SELECT cid, dimi, AVG(val) AS mv FROM (
          SELECT cid, UNNEST(v) AS val, generate_subscripts(v, 1) AS dimi
          FROM a{i})
        GROUP BY cid, dimi) GROUP BY cid),
    c{i} AS MATERIALIZED (
      SELECT prev.cid, COALESCE(m.cvec, prev.cvec) AS cvec
      FROM c{p} prev LEFT JOIN m{i} m ON prev.cid = m.cid)"""
        )
    return ",\n    ".join(parts)


_FIT_ORACLE = f"""WITH {_lloyd_ctes(K, N_ITER)}
    SELECT cid, CAST(dimi - 1 AS INTEGER) AS dim_idx, ROUND(val, 6) AS value
    FROM (SELECT cid, UNNEST(cvec) AS val, generate_subscripts(cvec, 1) AS dimi
          FROM c{N_ITER})
"""

_PREDICT_ORACLE = f"""WITH {_lloyd_ctes(K, N_ITER)}
    SELECT a.vec_id, a.cid, e.label FROM (
      SELECT vec_id, cid FROM (
        SELECT p.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 list_aggregate(list_transform(list_zip(p.v, c.cvec),
                   z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum'), c.cid) AS rn
        FROM pts p CROSS JOIN c{N_ITER} c) WHERE rn = 1) a
    JOIN embeddings e ON a.vec_id = e.vec_id
"""


@register(
    "kmeans_scan_points",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 5) AS e0,
           ROUND(CAST(embedding[64] AS DOUBLE), 5) AS e63
    FROM embeddings
    """,
    tags=("kmeans", "scan"),
)
def kmeans_scan_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 point source: parquet scan of the point set (pruned columns)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(v[0], 5).alias("e0"),
        F.round(v[63], 5).alias("e63"),
    )


@register(
    "kmeans_init_centroids",
    oracle=f"""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
           vec_id,
           ROUND(CAST(embedding[1] AS DOUBLE), 5) AS e0
    FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {K})
    """,
    tags=("kmeans", "scan"),
)
def kmeans_init_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 centroid source: deterministic init = first k rows by vec_id
    (FIXTURES.md contract), ids relabeled 0..k-1."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = km.init_centroids(e, K)
    rows = [(cid, int(orig), round(vec[0], 5)) for (cid, vec), orig in zip(
        cents,
        [r["vec_id"] for r in e.orderBy("vec_id").limit(K).select("vec_id").collect()],
    )]
    return spark.createDataFrame(rows, schema="cid int, vec_id long, e0 double")


@register(
    "kmeans_assign",
    oracle=f"""
    WITH pts AS (SELECT vec_id, embedding FROM embeddings),
    c AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
                 embedding AS cvec
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {K}))
    SELECT vec_id, cid FROM (
      SELECT p.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
               list_aggregate(list_transform(list_zip(p.embedding, c.cvec),
                 z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2])),
                 'sum'),
               c.cid) AS rn
      FROM pts p CROSS JOIN c) WHERE rn = 1
    """,
    tags=("kmeans",),
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 SelectNearestCenter with the initial centroids: pure-map argmin
    over the centroid literal (no shuffle). SQL oracle: double-precision
    squared-Euclidean argmin with lowest-cid tiebreak (bit-identical
    IEEE fold order on both engines); the NumPy Lloyd's pytest pins the
    full iterative semantics."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = km.init_centroids(e, K)
    return km.assign(e, cents).select("vec_id", "cid")


@register("kmeans_fit", oracle=_FIT_ORACLE, tags=("kmeans",))
def kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 bulk iteration: full Lloyd's fit (k=10, 10 iterations, fixed
    init). Returns the final centroids as EXPLODED scalar rows
    (cid, dim_idx, value) — k×d rows of plain scalars, not a raw
    array<double> column: the driver's pandas canonicalizer sorts/hashes
    every column and cannot factorize list cells (round-1 ERR,
    CORRECTNESS_r01.json). Values rounded to 6 dp per the registry float
    discipline. Oracles: the NumPy Lloyd's pytest (centroids to 1e-6)
    AND a full 10-iteration unrolled-CTE DuckDB replica (_lloyd_ctes) —
    the flagship iterative pipeline is hash-verified end to end."""
    e = load_table(spark, sf_dir, "embeddings")
    model = km.fit(e, k=K, n_iter=N_ITER)
    return model.centroids_df(spark).select(
        "cid", F.posexplode("cvec").alias("dim_idx", "value")
    ).select("cid", "dim_idx", F.round("value", 6).alias("value"))


@register("kmeans_predict", oracle=_PREDICT_ORACLE, tags=("kmeans",))
def kmeans_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 final assignment after fit → (point id, cluster id, truth label).
    Oracles: NumPy assignments + ARI-vs-label pytest, plus the unrolled
    Lloyd's DuckDB replica (assignment under the iteration-10 centroids,
    deterministic under the fixed first-k init)."""
    e = load_table(spark, sf_dir, "embeddings")
    model = km.fit(e, k=K, n_iter=N_ITER)
    return model.predict(e).select("vec_id", "cid", "label")


@register("kmeans_fit_converged", tags=("kmeans",))
def kmeans_fit_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-terminated Lloyd's: stop when the max squared
    centroid shift drops below tol — OUR documented extension beyond
    the reference's fixed-iteration contract (SURVEY §4.3.1; the
    canonical example always runs exactly n iterations). Rows-only:
    the iteration count is data-dependent, so no unrolled SQL replica;
    pytest (test_fit_tol_early_stop_matches_converged) pins that the
    early-stopped model satisfies the shift-below-tol contract and
    matches the fixed-iteration run once both have converged."""
    e = load_table(spark, sf_dir, "embeddings")
    model = km.fit(e, k=K, n_iter=30, tol=1e-6)
    return model.centroids_df(spark).select(
        "cid", F.posexplode("cvec").alias("dim_idx", "value")
    ).select("cid", "dim_idx", F.round("value", 6).alias("value"))


@register("kmeans_mllib", tags=("kmeans", "mllib"))
def kmeans_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 MLlib path (north-star mandated): ml.clustering.KMeans.
    Oracle: cost/ARI-bounds pytest (MLlib init is seeded-random, not the
    fixed-init contract, so no exact-match oracle)."""
    e = load_table(spark, sf_dir, "embeddings")
    return mllib_kmeans_predict(e, k=K, max_iter=N_ITER, seed=42)


@register("kmeans_datagen", tags=("kmeans",))
def kmeans_datagen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 KMeansDataGenerator parity: seeded Gaussian blobs, distributed
    generation via spark.range + randn (no driver-side data)."""
    df = km.datagen(spark, n_points=1000, k=5, dim=8, seed=42, partitions=8)
    return df.select("vec_id", "label", F.size("embedding").alias("dim"))


@register(
    "kmeans_collection_source",
    oracle="""
    WITH p AS (SELECT CAST(i AS BIGINT) AS vec_id,
                      [CAST(i % 7 AS DOUBLE), CAST((3 * i) % 5 AS DOUBLE)] AS v
               FROM generate_series(0, 39) t(i)),
    c AS (SELECT * FROM (VALUES (0, [0.0, 0.0]), (1, [6.0, 4.0])) AS c(cid, cvec))
    SELECT vec_id, cid FROM (
      SELECT p.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
               list_aggregate(list_transform(list_zip(p.v, c.cvec),
                 z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum'), c.cid) AS rn
      FROM p CROSS JOIN c) WHERE rn = 1
    """,
    tags=("kmeans", "scan"),
)
def kmeans_collection_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 embedded-collection fallback source (env.fromCollection): runs
    one assign step over engine-embedded default points, as the
    reference does when no --points path is given. The embedded
    collection is pure arithmetic, so the oracle regenerates it with
    generate_series + VALUES and replays the same argmin."""
    from ..sources.tables import from_collection

    points = [(i, [float(i % 7), float((3 * i) % 5)]) for i in range(40)]
    cents = [(0, [0.0, 0.0]), (1, [6.0, 4.0])]
    df = from_collection(spark, points, "vec_id long, embedding array<double>")
    return km.assign(df, cents).select("vec_id", "cid")


def _farthest_ctes(k: int) -> str:
    """DuckDB CTE chain for k-round deterministic farthest-first
    traversal (k-center greedy / Gonzalez init): c0 = lowest vec_id,
    then each round picks the point maximizing its min squared distance
    to the already-chosen set (ties -> lowest vec_id). MATERIALIZED for
    the same reason as _lloyd_ctes (each d{i}/c{i} is referenced by the
    next round — default inlining re-expands the chain)."""
    parts = [
        """e AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    c0 AS MATERIALIZED (
      SELECT vec_id, v, 0.0 AS dmin FROM e ORDER BY vec_id LIMIT 1)"""
    ]
    for i in range(1, k):
        if i == 1:
            parts.append(
                """d1 AS MATERIALIZED (
      SELECT e.vec_id, e.v,
             list_aggregate(list_transform(list_zip(e.v, c0.v),
                            p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') AS dmin
      FROM e, c0)"""
            )
        else:
            parts.append(
                f"""d{i} AS MATERIALIZED (
      SELECT d.vec_id, d.v,
             least(d.dmin,
                   list_aggregate(list_transform(list_zip(d.v, c.v),
                                  p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')) AS dmin
      FROM d{i-1} d, c{i-1} c)"""
            )
        parts.append(
            f"""c{i} AS MATERIALIZED (
      SELECT vec_id, v, dmin FROM d{i} ORDER BY dmin DESC, vec_id LIMIT 1)"""
        )
    return ",\n    ".join(parts)


_FARTHEST_K = 5

_FARTHEST_ORACLE = (
    f"WITH {_farthest_ctes(_FARTHEST_K)}\n    "
    + "\n    UNION ALL ".join(
        f"SELECT {i} AS cid, vec_id, ROUND(dmin, 6) AS sep FROM c{i}"
        for i in range(_FARTHEST_K)
    )
)


@register("kmeans_farthest_init", oracle=_FARTHEST_ORACLE, tags=("kmeans",))
def kmeans_farthest_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic farthest-first initialization (Gonzalez k-center
    greedy — the deterministic cousin of k-means++; 2-approximation for
    the k-center objective): seed with the lowest vec_id, then k-1
    rounds of argmax-of-min-distance with lowest-vec_id tiebreak.
    Unlike MLlib's seeded-random k-means|| this is fully reproducible
    across engines, so the whole ITERATIVE selection is hash-verified
    against an unrolled-CTE DuckDB replica (same discipline as
    kmeans_fit's Lloyd's chain).

    Scale shape: each round is one map-side min-distance projection
    against the <=k chosen centers (broadcast-tiny) + a global
    TakeOrderedAndProject(1) — only ONE row crosses to the driver per
    round, exactly the kmeans_fit collect discipline; the corpus is
    scanned k-1 times but never shuffled (at 100 TB you'd cache it
    once, as fit does). Distances are sequential left folds in both
    engines, so the argmax sees bit-identical doubles; 'sep' (each
    center's min distance to its predecessors) rounds to 6 dp only in
    the OUTPUT, never in the selection."""
    from ..functions.vectors import sqdist

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    first = e.orderBy("vec_id").limit(1).collect()[0]
    chosen = [(first["vec_id"], list(first["v"]))]
    out = [(0, int(first["vec_id"]), 0.0)]
    for i in range(1, _FARTHEST_K):
        dists = [
            sqdist(F.col("v"), F.array(*[F.lit(float(x)) for x in vec]))
            for _, vec in chosen
        ]
        dmin = F.least(*dists) if len(dists) > 1 else dists[0]
        row = (
            e.select("vec_id", "v", dmin.alias("dmin"))
            .orderBy(F.col("dmin").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )
        chosen.append((row["vec_id"], list(row["v"])))
        out.append((i, int(row["vec_id"]), round(float(row["dmin"]), 6)))
    return spark.createDataFrame(out, "cid int, vec_id bigint, sep double")


_PAR_L = 2 * K  # kmeans|| oversampling factor l (paper recommends ~2k)
_PAR_R = 3  # fixed oversampling rounds (paper: O(log φ) ≈ 5; 3 suffices)
_TWO60 = float(1 << 60)


def _kmeanspar_ctes(l: int, rounds: int) -> str:
    """Unrolled kmeans|| oversampling rounds as DuckDB CTEs — same
    hash-verification discipline as the Lloyd's chain: the 'random'
    coin for point x in round r is the 60-bit md5 prefix of
    '<vec_id>#<r>' scaled to [0,1) (functions/hashing.py's portable
    construction), identical bit-for-bit in both engines, so the
    WHOLE probabilistic selection is deterministic and comparable."""
    dist = (
        "list_aggregate(list_transform(list_zip({a}, {b}),"
        " z -> (z[1]-z[2])*(z[1]-z[2])), 'sum')"
    )
    parts = [
        f"""pts AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    c0 AS MATERIALIZED (SELECT vec_id, v FROM pts ORDER BY vec_id LIMIT 1),
    dd0 AS MATERIALIZED (
      SELECT p.vec_id, p.v, {dist.format(a='p.v', b='c.v')} AS d2
      FROM pts p CROSS JOIN c0 c)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""phi{r} AS (SELECT SUM(d2) AS phi FROM dd{r-1}),
    s{r} AS MATERIALIZED (
      SELECT vec_id, v FROM dd{r-1}, phi{r}
      WHERE d2 > 0 AND
            CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '#{r}'),
                  1, 15)) AS BIGINT) / {_TWO60!r}
            < {float(l)!r} * d2 / phi)"""
        )
        if r < rounds:
            parts.append(
                f"""dd{r} AS MATERIALIZED (
      SELECT d.vec_id, d.v,
             LEAST(d.d2, COALESCE(MIN({dist.format(a='d.v', b='s.v')}),
                                  d.d2)) AS d2
      FROM dd{r-1} d LEFT JOIN s{r} s ON TRUE
      GROUP BY d.vec_id, d.v, d.d2)"""
            )
    sels = " UNION ALL ".join(
        f"SELECT vec_id, v FROM s{r}" for r in range(1, rounds + 1)
    )
    parts.append(
        f"""cand AS MATERIALIZED (
      SELECT vec_id, v FROM c0 UNION ALL {sels}),
    asg AS MATERIALIZED (
      SELECT vec_id, cand_id FROM (
        SELECT p.vec_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 {dist.format(a='p.v', b='c.v')}, c.vec_id) AS rn
        FROM pts p CROSS JOIN cand c) WHERE rn = 1),
    w AS (SELECT cand_id, COUNT(*) AS weight FROM asg GROUP BY cand_id)"""
    )
    return ",\n    ".join(parts)


_PAR_ORACLE = f"""WITH {_kmeanspar_ctes(_PAR_L, _PAR_R)}
    SELECT cid, vec_id, weight, e0 FROM (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY w.weight DESC, w.cand_id)
                  - 1 AS INTEGER) AS cid,
             w.cand_id AS vec_id, w.weight, ROUND(c.v[1], 5) AS e0
      FROM w JOIN cand c ON w.cand_id = c.vec_id)
    WHERE cid < {K}
"""


@register("kmeans_parallel_init", oracle=_PAR_ORACLE, tags=("kmeans",))
def kmeans_parallel_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kmeans|| scalable oversampling init (Bahmani et al., VLDB 2012 —
    the init MLlib's KMeans runs in production), made deterministic so
    the WHOLE probabilistic pipeline is hash-verified cross-engine:
    each point's selection coin in round r is the portable 60-bit md5
    prefix of '<vec_id>#<r>' scaled to [0,1) (functions/hashing.py),
    compared against the paper's l·d²(x,C)/φ threshold. Seed = lowest
    vec_id; R = 3 rounds at l = 2k oversampling; candidates are
    weighted by the size of their nearest-neighbor cell and the k
    heaviest (ties → lowest vec_id) become the init set — the
    deterministic reduction variant (the paper reclusters the weighted
    candidates; the downstream recluster here IS kmeans_fit).

    Why this beats k-means++ at 100 TB: ++ needs k sequential full
    passes (each conditioned on the last pick); kmeans|| needs R ≈ 3
    passes TOTAL, each a map-side distance projection against the
    broadcast-tiny candidate set. Per round: d² update and the
    selection filter are map-only (candidate vectors ride as plan
    literals, the kmeans_fit collect discipline — ≤ ~l rows ≈ 2 KB
    cross the driver per round); φ is one scalar aggregate. The only
    keyed shuffle in the whole key is the final ~|C|-group weight
    count with map-side combine. Selection thresholds are knife-edge
    double comparisons — both engines compute d² as the same
    sequential fold and u as the same nearest-double of one integer,
    so the compare sees bit-identical operands (the φ sum's
    partial-order difference is ~1e-13·φ, flip probability ~1e-9/key,
    the same tolerance class the Lloyd's oracle documents)."""
    from ..functions.vectors import dmat_literal, sqdist

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    first = e.orderBy("vec_id").limit(1).collect()[0]
    cand = [(int(first["vec_id"]), list(first["v"]))]

    def lit_vec(vec):
        return F.array(*[F.lit(float(x)) for x in vec])

    # localCheckpoint after every d² refresh: without it each round's
    # job re-derives (and codegen-recompiles) ALL prior rounds' literal
    # distance folds from the scan — measured 21.5 s → 9 s at sf0.01.
    # The checkpointed row is (vec_id, v, d2), the same working set the
    # flagship fit caches per iteration.
    cur = e.withColumn(
        "d2", sqdist(F.col("v"), lit_vec(first["v"]))
    ).localCheckpoint(eager=False)
    for r in range(1, _PAR_R + 1):
        phi = cur.agg(F.sum("d2").alias("phi"))
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("vec_id").cast("string"),
                                   F.lit(f"#{r}"))),
                    1, 15,
                ),
                16, 10,
            ).cast("double")
            / F.lit(_TWO60)
        )
        new = (
            cur.crossJoin(F.broadcast(phi))
            .filter(
                (F.col("d2") > 0)
                & (u < F.lit(float(_PAR_L)) * F.col("d2") / F.col("phi"))
            )
            .select("vec_id", "v")
            .limit(50 * _PAR_L + 1)
            .collect()
        )
        # Loud guard (ADVICE r8, hardened r10): the Bahmani threshold
        # bounds the selection only in EXPECTATION (~l rows/round); a
        # pathological d² distribution could select far more. The limit
        # above bounds what the driver can ever materialize BY
        # CONSTRUCTION (50×l+1 rows ≈ 100 KB, far above any plausible
        # draw), and tripping it fails fast here.
        if len(new) > 50 * _PAR_L:
            raise RuntimeError(
                f"kmeans|| round {r} selected {len(new)} candidates "
                f"(> 50*l = {50 * _PAR_L}); refusing to collect an "
                "unexpectedly large candidate set to the driver"
            )
        cand.extend((int(x["vec_id"]), list(x["v"])) for x in new)
        if r < _PAR_R and new:
            # ONE array<array<double>> literal instead of ~l separate
            # 64-literal folds: the codegen tree stays O(1) in l
            mat = dmat_literal([row["v"] for row in new])
            cur = cur.withColumn(
                "d2",
                F.least(
                    F.col("d2"),
                    F.array_min(
                        F.transform(mat, lambda c: sqdist(F.col("v"), c))
                    ),
                ),
            ).localCheckpoint(eager=False)
    cmat = dmat_literal([vec for _, vec in cand])
    cids = F.lit([vid for vid, _ in cand]).cast("array<bigint>")
    pairs = F.zip_with(
        cmat,
        cids,
        lambda c, i: F.struct(
            sqdist(F.col("v"), c).alias("d"), i.alias("cand")
        ),
    )
    # Weight pass reads the CHECKPOINTED working set, not the raw scan:
    # cur holds the same (vec_id, v) rows materialized executor-local by
    # round R-1's refresh, so the final pass skips a second parquet read
    # (and at sf0.1 a fresh whole-plan recompile of the scan branch —
    # profiled 3.48 s from e vs 1.05 s from cur; BENCH_NOTES.md r9).
    w = (
        cur.select(F.array_min(pairs)["cand"].alias("cand_id"))
        .groupBy("cand_id")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    cdf = spark.createDataFrame(
        [(vid, round(float(vec[0]), 5)) for vid, vec in cand],
        "cand_id bigint, e0 double",
    )
    ranked = (
        w.join(F.broadcast(cdf), "cand_id")
        .select(
            (
                F.row_number().over(
                    Window.orderBy(F.col("weight").desc(), F.col("cand_id"))
                )
                - 1
            ).alias("cid"),
            F.col("cand_id").alias("vec_id"),
            "weight",
            "e0",
        )
        .filter(F.col("cid") < K)
    )
    return ranked


# -------------------------------------------- lightweight coreset

_CS_M = 20 * K  # target coreset size m (expected; Poisson-style draw)
_CS_TWO60 = float(1 << 60)

_CS_ORACLE = f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), mu AS MATERIALIZED (
      SELECT list(m ORDER BY dimi) AS mv FROM (
        SELECT dimi, AVG(val) AS m FROM (
          SELECT UNNEST(v) AS val, generate_subscripts(v, 1) AS dimi
          FROM pts)
        GROUP BY dimi)
    ), d AS MATERIALIZED (
      SELECT vec_id,
             list_aggregate(list_transform(list_zip(p.v, mu.mv),
               z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum') AS d2
      FROM pts p, mu
    ), t AS (SELECT SUM(d2) AS phi, COUNT(*) AS n FROM d)
    SELECT vec_id, ROUND(1.0 / ({_CS_M} * q), 6) AS weight FROM (
      SELECT vec_id,
             0.5 / t.n + 0.5 * d.d2 / t.phi AS q,
             CAST(CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)
               || '#cs'), 1, 15)) AS BIGINT) AS DOUBLE) / {_CS_TWO60!r} AS u
      FROM d, t)
    WHERE u < {_CS_M} * q
"""


@register("sample_coreset_kmeans", oracle=_CS_ORACLE, tags=("kmeans", "sampling"))
def sample_coreset_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lightweight coreset for K-Means (Bachem, Lucic & Krause, KDD
    2018): sample point x with probability ∝ q(x) = ½/N + ½·d²(x,μ)/φ
    (μ = dataset mean, φ = Σd²) and weight it 1/(m·q(x)) — the weighted
    subsample whose k-means cost approximates the full corpus's for ANY
    set of centers. THE published recipe for fitting k-means at 100 TB:
    fit on the m-point coreset, assign the corpus once. The draw is the
    repo's deterministic md5 coin (select iff u(x) < m·q(x), expected
    size m = _CS_M = 20k), so membership and weights are hash-verified
    cross-engine.

    Scale shape: μ is one map-side per-dimension average (64-row
    collect→literal); d²(x,μ) is a narrow map whose (vec_id, d²) output
    is localCheckpoint'ed — φ and the selection both read the
    checkpoint, so the corpus is scanned exactly twice (μ pass, d²
    pass) and never shuffled at point grain. The q/φ knife-edge is the
    documented ulp class (unordered double sums feed a coin
    threshold)."""
    from ..functions.hashing import portable_hash60
    from ..functions.vectors import sqdist

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mu_rows = (
        e.select(F.posexplode("v").alias("dimi", "val"))
        .groupBy("dimi")
        .agg(F.avg("val").alias("m"))
        .orderBy("dimi")
        .collect()
    )
    mu = F.array(*[F.lit(float(r["m"])) for r in mu_rows])
    d = e.select(
        "vec_id", sqdist(F.col("v"), mu).alias("d2")
    ).localCheckpoint(eager=False)
    t = d.agg(F.sum("d2").alias("phi"), F.count(F.lit(1)).alias("n"))
    q = 0.5 / F.col("n") + 0.5 * F.col("d2") / F.col("phi")
    u = (
        portable_hash60(
            F.concat(F.col("vec_id").cast("string"), F.lit("#cs"))
        ).cast("double")
        / F.lit(_CS_TWO60)
    )
    return (
        d.crossJoin(F.broadcast(t))
        .select("vec_id", q.alias("q"), u.alias("u"))
        .filter(F.col("u") < _CS_M * F.col("q"))
        .select(
            "vec_id", F.round(1.0 / (_CS_M * F.col("q")), 6).alias("weight")
        )
    )
