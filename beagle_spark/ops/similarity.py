"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: exact baseline; one pass over the data, no
  shuffle for the scoring itself (the query vector is a literal folded
  into the plan / a broadcast), one narrow top-k reduction.
- LSH-bucketed ANN (random hyperplanes): the scale path — bucket id is
  computed scan-side, candidates come from the query's bucket (+
  optional multi-probe), exact cosine re-rank only within candidates.

All vector math is Spark SQL expressions (zip_with/aggregate, double
precision) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(vec_col, query: list[float]):
    q = F.array(*[F.lit(float(v)) for v in query])
    return _dot(vec_col, q) / (_norm(vec_col) * _norm(q))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: tuple = (),
) -> DataFrame:
    """Exact cosine top-k. The orderBy+limit compiles to TakeOrdered —
    a per-partition top-k then a single driver merge, not a full sort."""
    scored = df.select(
        F.col(id_col), F.col("label"), cosine_col(F.col(vec_col), query).alias("_cos")
    )
    if exclude_ids:
        scored = scored.where(~F.col(id_col).isin(list(exclude_ids)))
    return (
        scored.orderBy(F.desc("_cos"), F.col(id_col))
        .limit(k)
        .select(id_col, "label")
    )


def hyperplane_bucket(vec_col, planes: list[list[float]]):
    """LSH bucket id: bit h = sign(dot(v, plane_h)). Planes are literal
    arrays folded into the expression — deterministic, no state."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) > 0, 1).otherwise(0)
        for p in planes
    ]
    bucket = F.lit(0)
    for i, b in enumerate(bits):
        bucket = bucket + (b * F.lit(1 << i))
    return bucket


def make_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, seeded)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_ann_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """ANN: restrict exact scoring to vectors in the query's hyperplane
    bucket. At 1000-executor scale, bucket the table ONCE (write
    bucketed parquet partitioned by bucket id) and this becomes a
    partition-pruned scan instead of a full pass."""
    import numpy as np

    dim = len(query)
    planes = make_planes(dim, n_planes, seed)
    qarr = np.array(query)
    qbucket = 0
    for i, p in enumerate(planes):
        if float(np.dot(qarr, np.array(p))) > 0:
            qbucket |= 1 << i
    bucketed = df.withColumn("_bucket", hyperplane_bucket(F.col(vec_col), planes))
    cands = bucketed.where(F.col("_bucket") == qbucket)
    return brute_force_topk(cands, query, k, vec_col, id_col)


def lsh_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: bucket by random hyperplanes,
    self-join WITHIN buckets only, exact cosine re-check. One equi-join
    shuffle on bucket id instead of an all-pairs product. Recall < 1 by
    construction (cross-bucket pairs are missed); raise recall with
    fewer planes or multiple plane sets (union of bucketings)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = make_planes(dim, n_planes, seed)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        hyperplane_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l._bucket") == F.col("r._bucket")) & (F.col("l.id") < F.col("r.id")),
        )
        .withColumn(
            "cos",
            _dot(F.col("l.v"), F.col("r.v")) / (_norm(F.col("l.v")) * _norm(F.col("r.v"))),
        )
        .where(F.col("cos") >= threshold)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round("cos", 4).alias("cosine"),
        )
    )


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample: int = 2000,
    iters: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """Driver-side k-means on a sample: the IVF coarse quantizer.
    Deterministic (seeded init, fixed iterations). At 100 TB you train
    once on a sample and persist the centroids with the table."""
    import numpy as np

    rows = df.select(vec_col).limit(sample).collect()
    x = np.array([list(r[0]) for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent.tolist()


def ivf_assign(vec_col, centroids: list[list[float]]):
    """Nearest-centroid id as a pure SQL expression (argmin over squared
    distances; centroids are plan-time literals). Computed scan-side —
    at scale, write it as a partition column for pruned probes."""
    best_id = F.lit(0)
    best_d = None
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(v)) for v in c])
        d = F.aggregate(
            F.zip_with(vec_col, carr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if best_d is None:
            best_d = d
        else:
            cond = d < best_d
            best_id = F.when(cond, F.lit(i)).otherwise(best_id)
            best_d = F.when(cond, d).otherwise(best_d)
    return best_id


def ivf_ann_topk(
    df: DataFrame,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: exact cosine top-k restricted to the n_probe nearest
    centroid cells of the query."""
    import numpy as np

    q = np.array(query)
    cents = np.array(centroids)
    order = np.argsort(((cents - q) ** 2).sum(axis=1))
    probe = set(int(i) for i in order[:n_probe])
    assigned = df.withColumn("_cell", ivf_assign(F.col(vec_col), centroids))
    cands = assigned.where(F.col("_cell").isin(list(probe)))
    return brute_force_topk(cands, query, k, vec_col, id_col)


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs above a cosine threshold (embedding near-dup). Exact
    all-pairs — only for validation scale or within LSH buckets; the
    100 TB path is lsh bucket self-join (same hyperplane trick)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cosine"))
    )
