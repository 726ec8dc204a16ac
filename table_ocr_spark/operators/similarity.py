"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force cosine top-k against a query vector:
  the exact baseline.  Pure JVM expressions (``zip_with`` dot product +
  ``aggregate`` fold) — one pruned column scan, one top-k sort; no Python.
* ``lsh_bucket_col`` / ``cosine_topk_lsh`` — the scale path: random-
  hyperplane LSH (sign-bit sketch).  Hyperplane components are derived
  deterministically from md5(plane, dim) so every engine/run agrees; at
  query time only rows sharing ≥1 plane-bucket with the query are exactly
  re-ranked.  At 10^12 rows the bucket filter prunes the scan by ~2^-P per
  matching band; the exact rerank touches a tiny candidate set.

Embedding-cosine near-dup detection: ``embedding_near_dup_pairs`` pairs
consecutive ids (the cheap deterministic candidate generator used by one
correctness oracle); ``embedding_near_dup_lsh`` is the open-world scale
path — banded sign-LSH candidates + exact cosine verify, itself exactly
oracled by inlining the md5-derived hyperplanes into SQL.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    d = dot_col(a, b)
    na, nb = norm_col(a), norm_col(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


def _lit_vec(q: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in q])


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k by cosine vs a literal query vector.

    Deterministic total order: (-cos, key) — ties break on key, so results
    are stable across partitionings (required for the equality oracle).
    """
    qc = _lit_vec(query)
    scored = df.select(
        F.col(key),
        cosine_col(F.col(vec).cast("array<double>"), qc).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(key)).limit(k)


def hyperplane(dim: int, plane: int) -> List[float]:
    """Deterministic pseudo-random ±1 hyperplane from md5(plane:dim).
    Engine-neutral: any runtime hashing the same strings gets the same
    plane (the correctness tests recompute it in pure Python)."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).digest()[0]
        out.append(1.0 if h % 2 == 0 else -1.0)
    return out


def lsh_bucket_col(vec: Column, dim: int, planes: int = 8, plane_offset: int = 0) -> Column:
    """Sign-bit bucket id: bit p = (v · hyperplane_{plane_offset+p}) > 0.
    ``plane_offset`` selects an independent plane family per band."""
    out = F.lit(0).cast("long")
    for p in range(planes):
        hp = _lit_vec(hyperplane(dim, plane_offset + p))
        out = out + F.when(dot_col(vec.cast("array<double>"), hp) > 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def cosine_topk_lsh(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec: str = "embedding",
    key: str = "vec_id",
    planes: int = 8,
    max_hamming: int = 1,
) -> DataFrame:
    """LSH-pruned top-k: filter to rows whose sign-bucket is within
    ``max_hamming`` bits of the query's bucket, then exact rerank.
    Recall < 1.0 by design — the scale path; the brute-force operator is
    the ground truth it is tested against."""
    import hashlib  # noqa: F401  (hyperplane uses it)

    dim = len(query)
    qbits = 0
    for p in range(planes):
        hp = hyperplane(dim, p)
        if sum(q * h for q, h in zip(query, hp)) > 0:
            qbits |= 1 << p
    bucketed = df.withColumn("_bkt", lsh_bucket_col(F.col(vec), dim, planes))
    x = F.col("_bkt").bitwiseXOR(F.lit(qbits))
    pop = sum(
        (F.shiftright(x, p).bitwiseAND(F.lit(1))) for p in range(planes)
    )
    cand = bucketed.filter(pop <= max_hamming)
    return cosine_topk(cand, query, k=k, vec=vec, key=key)


def ivf_index(
    df: DataFrame,
    dim: int,
    n_lists: int = 16,
    vec: str = "embedding",
    seed: int = 42,
):
    """IVF coarse quantizer: KMeans centroids (fixed seed) + inverted-list
    assignment column.

    Returns (assigned_df, centroids) where assigned_df = df + ``_list`` and
    centroids is the local list of centers (small: n_lists × dim — this is
    the broadcastable index, the analog of a FAISS IVF coarse codebook).
    At 10^12 rows the fit runs on a sample; assignment is one projection.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = df.withColumn("_feat", array_to_vector(F.col(vec).cast("array<double>")))
    km = KMeans(k=n_lists, seed=seed, featuresCol="_feat", predictionCol="_list")
    model = km.fit(feat)
    assigned = model.transform(feat).drop("_feat")
    centroids = [list(c) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list,
    query: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    vec: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """IVF search: exact rerank over the ``n_probe`` nearest inverted lists.

    Scan cost drops to ~n_probe/n_lists of the table (with partition/file
    pruning when the table is written partitioned by ``_list``); recall is
    tested against the brute-force operator.
    """
    import math

    def _cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return 0.0 if na == 0 or nb == 0 else dot / (na * nb)

    probes = sorted(range(len(centroids)), key=lambda i: (-_cos(centroids[i], query), i))[
        :n_probe
    ]
    cand = assigned.filter(F.col("_list").isin(probes))
    return cosine_topk(cand, query, k=k, vec=vec, key=key)


def embedding_near_dup_lsh(
    df: DataFrame,
    dim: int,
    threshold: float = 0.2,
    vec: str = "embedding",
    key: str = "vec_id",
    planes_per_band: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Open-world embedding near-dup pairs at scale: banded sign-LSH
    candidate generation + exact cosine verify.

    Each band is an independent ``planes_per_band``-bit sign bucket (its
    own hyperplane family); a pair becomes a candidate when ≥1 band
    matches exactly — the MinHash-banding shape on the random-hyperplane
    sketch.  Expected candidates for unrelated vectors shrink by
    ~2^-planes_per_band per band, so the exact cosine runs on a tiny set
    instead of the O(n²) cross join.  The explicit repartition makes
    ReuseExchange compute the bucket projection once for both self-join
    sides.  Output: (key_a, key_b, cos_sim rounded to 4dp) with
    cos_sim ≥ threshold (compared on the ROUNDED value, so the decision
    is engine-portable)."""
    sig = df.select(
        F.col(key).alias("k"),
        F.col(vec).alias("v"),
        *[
            lsh_bucket_col(F.col(vec), dim, planes_per_band, b * planes_per_band).alias(
                f"bkt{b}"
            )
            for b in range(bands)
        ],
    ).repartition("k")
    banded = sig.select(
        "k",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"bkt{b}").alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("k", "v", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cos = cosine_col(
        F.col("a.v").cast("array<double>"), F.col("b.v").cast("array<double>")
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.round(cos, 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """Near-duplicate pairs among consecutive ids (deterministic candidate
    set used by the oracle; swap in LSH buckets for open-world candidates)."""
    a = df.select(F.col(key).alias("key_a"), F.col(vec).alias("_va"))
    b = df.select((F.col(key) - 1).alias("key_a"), F.col(key).alias("key_b"), F.col(vec).alias("_vb"))
    joined = a.join(b, "key_a")
    return (
        joined.select(
            "key_a",
            "key_b",
            cosine_col(F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
