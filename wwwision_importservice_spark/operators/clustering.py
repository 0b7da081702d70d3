"""Embedding-space clustering and semantic deduplication (X3 family).

The PHP reference has no embedding surface at all (SURVEY §1.4;
`Classes/ImportService.php:71-88` is a one-shot batch sync) — these are
extension operators for the LLM-training-data pipeline, built on the
same k-means primitives the IVF index uses
(:func:`~wwwision_importservice_spark.operators.similarity.train_ivf_centroids`
/ :func:`~...similarity.assign_cells`).

**Semantic dedup** follows SemDeDup (Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the corpus embeddings, then inside
each cluster drop documents that are near-duplicates *in embedding
space* (cosine ≥ τ) of another cluster member. Where the paper's prose
describes greedy within-cluster pruning, this implementation uses the
set-oriented formulation (the same one production pipelines use): rank
the cluster's members deterministically, then **remove a document iff
its cosine to ANY earlier-ranked member of its cluster is ≥ τ**. That
definition has no sequential keep-chain dependency — it is a pure
self-join + aggregate, embarrassingly parallel per cluster, and (unlike
the keep-chain) expressible in ANSI SQL, so the driver's DuckDB oracle
can check it value-for-value.

Scale shape (the whole point of clustering first):

- pairwise similarity is confined to clusters — O(Σ|c|²) instead of
  O(N²); with n_clusters ∝ N/target_size the per-cluster work is a
  constant independent of corpus size;
- the only shuffle is the hash partition on ``cluster`` for the
  self-join; the centroid table always broadcasts;
- oversized clusters (a degenerate centroid attracting boilerplate)
  are capped like the LSH buckets: members ranked past
  ``max_cluster_size`` are kept *unexamined* and counted in ``stats``
  — no silent caps, no O(|c|²) blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wwwision_importservice_spark.operators.similarity import (
    _as_double,
    _dot,
    _norm,
    assign_cells,
    train_ivf_centroids,
)


def kmeans(
    corpus: DataFrame,
    n_clusters: int,
    id_col: str,
    vector_col: str = "embedding",
    iterations: int = 5,
    sample_fraction: float | None = None,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Distributed Lloyd's k-means → a small ``(cluster, embedding)``
    centroid table.

    Thin public facade over
    :func:`~...similarity.train_ivf_centroids` (one implementation, two
    consumers: IVF index building and semantic dedup). Deterministic
    md5-order seeding, broadcast assignment (zero shuffle of the big
    side), one d-buffer hash aggregate per iteration; ``iterations=0``
    returns the seeds themselves — the oracle-checkable degenerate case.
    Train on a ``sample_fraction`` hash-sample at 100 TB; centroid
    quality needs a representative sample, not the full corpus.
    """
    return train_ivf_centroids(
        corpus,
        n_clusters,
        id_col,
        vector_col,
        iterations=iterations,
        centroid_id=cluster_col,
        sample_fraction=sample_fraction,
    )


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vector_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment: ``(id, cluster, centroid_sim)`` plus
    the internal ``__v``/``__n`` vector columns for downstream pairwise
    scoring. Broadcast cross join against the centroid table — the
    corpus side never shuffles. ``centroid_sim`` is rounded to 6dp (the
    registry-wide float-determinism convention); ties break to the
    smallest cluster id.
    """
    return assign_cells(
        df,
        centroids,
        id_col,
        vector_col,
        centroid_id=cluster_col,
        nprobe=1,
        keep_sim=True,
    ).select(
        id_col,
        cluster_col,
        F.col("__sim").alias("centroid_sim"),
        "__v",
        "__n",
    )


def semantic_dedup_from_assignments(
    assigned: DataFrame,
    id_col: str,
    cluster_col: str = "cluster",
    threshold: float = 0.95,
    max_cluster_size: int | None = 10_000,
    stats: dict | None = None,
) -> DataFrame:
    """SemDeDup pruning given cluster assignments (the output of
    :func:`assign_clusters`): ``(id, cluster, centroid_sim, rank,
    keep)``.

    Rank = centrality order inside the cluster (``centroid_sim`` desc,
    id asc — most-central first, deterministic). ``keep = false`` iff
    some earlier-ranked member of the same cluster has cosine ≥
    ``threshold`` — so the most central representative of every
    near-dup neighborhood survives, and isolated members always
    survive.

    Physical plan: one rank window + one self-join on ``cluster``
    restricted to ``rank_a < rank_b`` (each unordered pair scored
    once), one semi-aggregate to the removed-id set, one broadcast-able
    anti join back. Members ranked past ``max_cluster_size`` skip the
    pairwise stage entirely (kept, ``capped`` counted into ``stats``) —
    the same bounded-bucket policy as
    :func:`~...dedup.lsh_candidate_pairs`.
    """
    w = Window.partitionBy(cluster_col).orderBy(
        F.col("centroid_sim").desc(), F.col(id_col).asc()
    )
    # the ranked assignment feeds FOUR consumers (output, both self-join
    # sides, the anti-join) — without a cut, Spark re-runs the
    # centroid-assignment cross join + rank window once per consumer.
    # A lazy localCheckpoint materializes it once (same pattern as the
    # connected-components loop; on a cluster with unreliable executors
    # prefer checkpoint() + a checkpoint dir).
    ranked = assigned.withColumn(
        "rank", F.row_number().over(w)
    ).localCheckpoint(eager=False)

    in_scope = ranked
    if max_cluster_size is not None:
        in_scope = ranked.filter(F.col("rank") <= max_cluster_size)
        if stats is not None:
            stats["capped"] = ranked.filter(
                F.col("rank") > max_cluster_size
            ).count()

    a = in_scope.select(
        F.col(cluster_col).alias("__c"),
        F.col("rank").alias("__rank_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = in_scope.select(
        F.col(id_col).alias("__id_b"),
        F.col(cluster_col).alias("__c"),
        F.col("rank").alias("__rank_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    # nullif: a zero-norm member has undefined cosine to everything —
    # the comparison is NULL, never >= threshold, so degenerate vectors
    # are always kept rather than aborting the job under ANSI mode
    sim = F.round(
        _dot(F.col("__va"), F.col("__vb"))
        / F.nullif(F.col("__na") * F.col("__nb"), F.lit(0.0)),
        6,
    )
    removed = (
        a.join(b, "__c")
        .filter(F.col("__rank_a") < F.col("__rank_b"))
        .filter(sim >= threshold)
        .select(F.col("__id_b").alias(id_col))
        .distinct()
    )
    out = ranked.join(
        removed.withColumn("__rm", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        cluster_col,
        "centroid_sim",
        "rank",
        F.col("__rm").isNull().alias("keep"),
    )
    return out


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vector_col: str = "embedding",
    n_clusters: int = 64,
    threshold: float = 0.95,
    iterations: int = 5,
    sample_fraction: float | None = None,
    cluster_col: str = "cluster",
    max_cluster_size: int | None = 10_000,
    stats: dict | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """End-to-end SemDeDup: k-means (or caller-supplied ``centroids``)
    → nearest-centroid assignment → within-cluster embedding near-dup
    pruning. Returns ``(id, cluster, centroid_sim, rank, keep)`` for
    the full corpus; filter ``keep`` to materialize the deduplicated
    set, or join the frame back to the document table to audit what
    was dropped and why (cluster + rank localize every decision).
    """
    if centroids is None:
        centroids = kmeans(
            corpus,
            n_clusters,
            id_col,
            vector_col,
            iterations=iterations,
            sample_fraction=sample_fraction,
            cluster_col=cluster_col,
        )
    assigned = assign_clusters(
        corpus, centroids, id_col, vector_col, cluster_col
    )
    return semantic_dedup_from_assignments(
        assigned,
        id_col,
        cluster_col,
        threshold=threshold,
        max_cluster_size=max_cluster_size,
        stats=stats,
    )


def cluster_sample(
    assigned: DataFrame,
    id_col: str,
    cluster_col: str = "cluster",
    per_cluster: int = 10,
    order: str = "hash",
) -> DataFrame:
    """Coverage-stratified sampling: up to ``per_cluster`` members from
    EVERY cluster — the diverse eval-set builder (a uniform corpus
    sample over-represents the big clusters and can miss small ones
    entirely; sampling per k-means cell guarantees every region of
    embedding space is represented).

    ``order='hash'`` picks a deterministic uniform subset (md5 of the
    id — re-run/append-stable, same argument as hash_split);
    ``order='central'`` picks the most central members (cleanest
    exemplars per region). Emits ``(id, cluster, sample_rank)``. One
    rank window over the assignment — the partial WindowGroupLimit
    keeps at most ``per_cluster`` rows per cluster per task ahead of
    the shuffle."""
    if order == "hash":
        key = [F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()]
    elif order == "central":
        key = [F.col("centroid_sim").desc(), F.col(id_col).asc()]
    else:
        raise ValueError(f"cluster_sample: unknown order {order!r}")
    w = Window.partitionBy(cluster_col).orderBy(*key)
    return (
        assigned.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= per_cluster)
        .select(id_col, cluster_col, "sample_rank")
    )


def random_project(
    df: DataFrame,
    id_col: str,
    vector_col: str = "embedding",
    out_dim: int = 8,
    seed: int = 0,
    prefix: str = "p",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction with a
    deterministic ±1 sign matrix (Achlioptas 2003's database-friendly
    projection): ``out[j] = Σ_i v[i]·s(j,i) / √out_dim`` with
    ``s(j,i) ∈ {+1,-1}`` derived from ``md5(seed:j:i)``.

    The matrix is generated *driver-side from a hash* — no RNG state,
    reproducible across languages (the DuckDB oracle and the NumPy
    differential model rebuild the identical matrix), re-run/append
    safe like hash_split. The projection itself is a pure column
    expression (``zip_with`` multiply + ``aggregate`` fold per output
    dimension — whole-stage codegen, no UDF, no shuffle): a 100 TB
    embedding table shrinks ``d/out_dim``× in one narrow map stage,
    which is the cheap precursor to LSH/clustering passes that only
    need rough geometry. Output columns ``{prefix}0..{prefix}{k-1}``
    are rounded to 6dp (exact parity: products of floats with ±1 and a
    sequential left-fold sum are bit-identical across engines).
    """
    rows = projection_signs(len_of(df, vector_col), out_dim, seed)
    v = _as_double(F.col(vector_col))
    scale = float(out_dim) ** 0.5
    cols = [
        F.round(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(s)) for s in row]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(scale),
            6,
        ).alias(f"{prefix}{j}")
        for j, row in enumerate(rows)
    ]
    return df.select(F.col(id_col), *cols)


def projection_signs(dim: int, out_dim: int, seed: int = 0) -> list[list[int]]:
    """The deterministic ±1 JL matrix, row-major ``out_dim × dim``:
    sign(j,i) = +1 iff the first hex nibble of ``md5("seed:j:i")`` is
    even. Pure function of (dim, out_dim, seed) — the oracle SQL and
    the NumPy model call this same generator."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[0], 16)
            % 2
            == 0
            else -1
            for i in range(dim)
        ]
        for j in range(out_dim)
    ]


def len_of(df: DataFrame, vector_col: str) -> int:
    """Vector dimensionality, from one row (driver-side metadata probe,
    same pattern as train_ivf_centroids)."""
    first = df.select(F.size(vector_col).alias("d")).first()
    if first is None:
        raise ValueError("random_project: empty input")
    return int(first["d"])
