"""Deduplication operators for large text corpora.

All hot paths are pure Spark SQL expressions (JVM, whole-stage codegen,
no Python UDFs): at 100 TB the only thing that matters is the shuffle
profile, noted per operator.

- exact_dedup:            1 shuffle on text-hash (map-side partial agg)
- minhash_lsh_candidates: signatures computed scan-side (no shuffle),
                          1 shuffle on (band, bucket) - the standard
                          MinHash-LSH join trick; candidate verification
                          is an equi-join, never an all-pairs product
- simhash_fingerprints:   scan-side only, then 1 shuffle on band key
- ngram_jaccard_pairs:    exact Jaccard via shingle-explode + self-join;
                          quadratic in the worst case - intended for
                          verification at small scale or AFTER LSH
                          candidate pruning; the scale path is
                          minhash_lsh_candidates
"""

from __future__ import annotations

import hashlib
import logging
import re
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

log = logging.getLogger(__name__)


def normalized_text(col):
    """Whitespace-collapsed lowercase — the canonical form for exact
    dedup. Identical expression exists in DuckDB (regexp_replace +
    lower), so the oracle replicates it verbatim."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by md5 of normalized text; canonical = min id.
    One shuffle, partial-aggregated map-side."""
    return (
        df.select(
            F.md5(normalized_text(F.col(text_col)).cast("binary")).alias("text_hash"),
            F.col(id_col),
        )
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_doc_id"),
        )
    )


def word_shingles(col, k: int = 3):
    """k-word shingles as array<string> (distinct), built scan-side with
    split + transform — no explode until the join needs it.

    PERF: prefer :func:`shingle_docs`, which materializes the token
    array in a child projection first. Inlining the split expression
    into the transform lambda (as this expression-form necessarily
    does) makes Spark re-evaluate trim/lower/split once PER SHINGLE
    POSITION — measured ~9x slower on the sf0.1 corpus."""
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    n = F.size(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, jaccard >=
    threshold). Shingle-explode + equi-self-join on the shingle: cost is
    sum over shingles of df(shingle)^2 — fine after LSH pruning or at
    validation scale; use minhash_lsh_candidates as the 100 TB path."""
    sh = shingle_docs(df, text_col, id_col, k).select(
        "id", F.explode("shingles").alias("shingle")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # shuffle_merge: a broadcast build side would re-run the shingle
    # explode; identical shuffles on both sides are exchange-reused
    a, b = sh.alias("a"), sh.hint("shuffle_merge").alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def shingle_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, shingles: array<string>) — the shared input relation for the
    MinHash signature stage AND the exact-Jaccard verify stage. Compute
    (and persist) it ONCE per pipeline run: shingling re-tokenizes the
    full corpus text, by far the widest scan-side expression in the
    dedup path.

    The token array is materialized in a child projection and the
    transform lambda references the COLUMN — because the column is
    referenced more than once, Catalyst keeps the projection instead
    of re-inlining the split into the lambda (which would re-tokenize
    the document once per shingle position — the interpreted
    higher-order-function trap; measured ~9x slower)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_toks"),
    )
    n = F.size("_toks")
    return toks.select(
        "id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, k)),
            )
        ).alias("shingles"),
    )


# XXH64 constants/helpers replicating Spark's
# org.apache.spark.sql.catalyst.expressions.XxHash64 for LONG and INT
# inputs, vectorized over numpy uint64 (wrapping arithmetic == Java long
# overflow). Verified bit-identical against F.xxhash64(long_col, int_lit)
# in tests/test_dedup.py::test_minhash_arrow_kernel_matches_spark_xxhash64.
_XXH_P1 = np.uint64(0x9E3779B185EBCA87)
_XXH_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XXH_P3 = np.uint64(0x165667B19E3779F9)
_XXH_P4 = np.uint64(0x85EBCA77C2B2AE63)
_XXH_P5 = np.uint64(0x27D4EB2F165667C5)


def _xxh64_rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _xxh64_fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _XXH_P2
    h = h ^ (h >> np.uint64(29))
    h = h * _XXH_P3
    h = h ^ (h >> np.uint64(32))
    return h


def _xxh64_long(v: np.ndarray, seed: int) -> np.ndarray:
    """XXH64.hashLong(v, seed) over a uint64 vector."""
    h = np.uint64(seed) + _XXH_P5 + np.uint64(8)
    k = _xxh64_rotl(v * _XXH_P2, 31) * _XXH_P1
    h = h ^ k
    h = _xxh64_rotl(h, 27) * _XXH_P1 + _XXH_P4
    return _xxh64_fmix(h)


def _xxh64_int(i: int, seed_vec: np.ndarray) -> np.ndarray:
    """XXH64.hashInt(i, seed) with a uint64 seed VECTOR (i is a plan-time
    literal in the aggregate shape this replaces)."""
    h = seed_vec + _XXH_P5 + np.uint64(4)
    # the literal product is computed in Python int then masked, so no
    # numpy scalar-overflow RuntimeWarning is emitted per call
    h = h ^ np.uint64(((i & 0xFFFFFFFF) * 0x9E3779B185EBCA87) & 0xFFFFFFFFFFFFFFFF)
    h = _xxh64_rotl(h, 23) * _XXH_P2 + _XXH_P3
    return _xxh64_fmix(h)


def minhash_signature_stage(df: DataFrame, text_col: str, id_col: str,
                            num_perm: int = 64, shingle_k: int = 3,
                            shingled: DataFrame | None = None,
                            impl: str = "agg") -> DataFrame:
    """num_perm MinHash values as array<bigint>:
    sig[i] = min over shingles of xxhash64(xxhash64(shingle), seed_i).

    The shingle STRING is hashed exactly once (JVM xxhash64); the
    num_perm hash family is derived by re-hashing that single long with
    per-function seeds — hashing an 8-byte long 64 times costs ~1/10th
    of hashing a ~30-char string 64 times, with the same independence
    properties. Seeds are fixed literals — deterministic everywhere.

    Two implementations with BIT-IDENTICAL output (test-pinned):

    - ``impl="agg"`` (default): explode shingles -> num_perm flat
      min-aggregates (whole-stage-codegen'd; partial aggregation
      collapses to one row per doc map-side, then one Exchange on id).
    - ``impl="arrow"``: MAP-ONLY. The per-doc shingle hash array (one
      interpreted ``transform`` over the already-built shingle array)
      feeds a mapInArrow kernel that derives all num_perm hashes and
      their mins vectorized in numpy (wrapping uint64 arithmetic
      replicates Java long overflow). No explode, no 64-wide
      aggregate, and NO EXCHANGE — the agg shape's hashpartitioning(id)
      shuffle (64*8B per doc) disappears.

    Why agg stays the default (r22, measured both ways per the guide
    §1/§4.5 before choosing): at sf0.1 (5k docs) the two are within
    noise (paired quiet-window mins 3.12 vs 3.27 s for the full
    dd_minhash_lsh query); at a 40x-replicated corpus (200k docs) the
    codegen'd aggregate wins ~2x on the isolated signature stage (warm
    mins ~1.1-1.6 s agg vs ~1.7-2.6 s arrow) and degrades far less
    under CPU contention (worst observed pass 6.8 s vs 26 s) — the
    Python-side cost of shipping every shingle hash (~8B x shingles/doc)
    across the Arrow boundary plus 64 numpy passes exceeds what the
    removed exchange saves, and the exchange's payload is only the
    already-aggregated 512B/doc signature. Use ``impl="arrow"`` where
    shuffle capacity, not CPU, is the binding constraint.

    Pass ``shingled`` (from :func:`shingle_docs`, ideally persisted) to
    reuse an existing shingle relation instead of re-shingling."""
    if shingled is None:
        shingled = shingle_docs(df, text_col, id_col, shingle_k)
    if impl == "agg":
        exploded = shingled.select(
            "id", F.explode("shingles").alias("_sh")
        ).withColumn("_h", F.xxhash64("_sh"))
        mins = [
            F.min(F.xxhash64("_h", F.lit(i))).alias(f"_m{i}") for i in range(num_perm)
        ]
        agged = exploded.groupBy("id").agg(*mins)
        return agged.select(
            "id", F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("sig")
        )

    # arrow: map-only kernel over per-doc hash arrays
    hs = shingled.select(
        "id", F.transform("shingles", lambda s: F.xxhash64(s)).alias("_hs")
    ).where(F.size("_hs") > 0)  # == the agg shape's explode semantics

    def _kernel(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            lst = batch.column(1)
            n = len(ids)
            if n == 0:
                continue
            offs = np.asarray(lst.offsets, dtype=np.int64)
            flat = np.asarray(lst.flatten()).view(np.uint64)
            starts = offs[:-1] - offs[0]
            # every row has >= 1 hash (filtered above), so reduceat
            # boundaries are strictly increasing
            step1 = _xxh64_long(flat, 42)
            out = np.empty((num_perm, n), dtype=np.int64)
            for i in range(num_perm):
                # min must compare SIGNED longs (Spark's min over bigint),
                # so view the uint64 hash vector as int64 before reducing
                out[i] = np.minimum.reduceat(
                    _xxh64_int(i, step1).view(np.int64), starts
                )
            sig_flat = np.ascontiguousarray(out.T).reshape(-1)
            sig = pa.ListArray.from_arrays(
                pa.array(
                    np.arange(0, (n + 1) * num_perm, num_perm, dtype=np.int32)
                ),
                pa.array(sig_flat),
            )
            yield pa.RecordBatch.from_arrays([ids, sig], ["id", "sig"])

    return hs.mapInArrow(_kernel, "id long, sig array<bigint>")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    shingled: DataFrame | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding: docs agreeing on ALL rows of any band are
    candidate near-duplicates. Returns distinct candidate pairs
    (id_a < id_b, n_bands agreement count). One shuffle on the
    (band, bucket-hash) key — never an all-pairs product.

    ``bucket_cap`` is the skew guard for real corpora, where boilerplate
    (empty pages, licence headers, templated docs) lands thousands of
    near-identical docs in ONE (band, bucket) group and the self-join
    inside it goes quadratic — the scale-killer at 100 TB. The capped
    path (:func:`_grouped_bucket_pairs`) contains NO JOIN at all:
    buckets at or under the cap emit their all-pairs via grouped array
    generation, oversized buckets emit star pairs (bucket-min id,
    member) map-side — linear in bucket size, with per-operator memory
    bounded by ``bucket_cap`` (see there for the guard mechanics).

    Recall contract under the cap: within an oversized bucket,
    PAIR-level recall drops from all-pairs to the star set, but every
    member remains connected to the bucket anchor, so COMPONENT-level
    connectivity (what dedup clustering consumes) is preserved whenever
    the anchor pairs pass downstream verification — which they do for
    the boilerplate/identical-doc case that creates oversized buckets
    in the first place."""
    assert num_perm % bands == 0
    rows = num_perm // bands
    sig = minhash_signature_stage(
        df, text_col, id_col, num_perm, shingle_k, shingled=shingled
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",", *[F.col("sig")[b * rows + j].cast("string") for j in range(rows)]
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = sig.select("id", F.explode(F.array(*band_structs)).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    if bucket_cap is None:
        occurrences = _bucket_self_join(banded)
    else:
        log.info("minhash_lsh_candidates: bucket_cap=%d skew guard active", bucket_cap)
        occurrences = _grouped_bucket_pairs(banded, bucket_cap)
    return occurrences.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_bands"))


def _grouped_bucket_pairs(banded: DataFrame, bucket_cap: int) -> DataFrame:
    """(id, band, bucket) -> one (id_a < id_b) row per shared bucket,
    with the bucket_cap star-pair guard. NO JOIN anywhere (the r3-r20
    shape self-joined within buckets, re-executing the whole signature
    pipeline into a broadcast build side — see
    plans/r21/lsh_verify_pipeline_before.txt), and — new in r22 —
    PER-OPERATOR MEMORY BOUNDED BY ``bucket_cap`` regardless of bucket
    size:

    1. a Window over (band, bucket) attaches the bucket's member count
       and min id (the star anchor) to every row. The window operator
       is sort-based and spillable, so a degenerate bucket with 10^8
       members costs disk, not an aggregation-buffer OOM.
    2. rows in buckets AT OR UNDER the cap go through
       groupBy(band, bucket) -> sorted id array -> all-pairs array
       expression. The collect_list buffer here holds at most
       ``bucket_cap`` ids BY CONSTRUCTION (oversized buckets were
       filtered out before the aggregate — this is the r22 fix; the
       r21 shape collect_list'ed every bucket whole and decided
       small-vs-star only afterwards, building a multi-GB single array
       row for a degenerate bucket, VERDICT r21 "What's wrong #2").
       The groupBy reuses the window's (band, bucket) partitioning, so
       no extra exchange.
    3. rows in oversized buckets emit star pairs (anchor, member)
       MAP-SIDE from the windowed columns — never collected, linear in
       bucket size, identical to the r20/r21 star set (the anchor is
       the bucket min id == sorted ids[0]).

      size <= cap: all (ids[i], ids[j]) i<j  (array is sorted, so
                   id_a < id_b by construction — identical pair set to
                   a within-bucket self-join)
      size  > cap: star pairs (min-id anchor, member)

    Pair generation for capped buckets is a higher-order array
    expression — interpreted, but it touches exactly the rows the old
    join emitted."""
    w = Window.partitionBy("band", "bucket")
    sized = banded.withColumn("_cnt", F.count(F.lit(1)).over(w)).withColumn(
        "_anchor", F.min("id").over(w)
    )
    grouped = (
        sized.where(F.col("_cnt") <= bucket_cap)
        .groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("id")).alias("_ids"))
    )
    n = F.size("_ids")
    all_pairs = F.flatten(
        F.transform(
            "_ids",
            lambda x, i: F.transform(
                F.slice("_ids", i + 2, n - i - 1),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    small = grouped.select(F.explode(all_pairs).alias("_p")).select(
        "_p.id_a", "_p.id_b"
    )
    star = (
        sized.where((F.col("_cnt") > bucket_cap) & (F.col("id") != F.col("_anchor")))
        .select(F.col("_anchor").alias("id_a"), F.col("id").alias("id_b"))
    )
    return small.unionByName(star)


def _bucket_self_join(banded: DataFrame) -> DataFrame:
    """(id, band, bucket) -> one (id_a < id_b) row per shared bucket.
    shuffle_merge hint: identical shuffles on both sides are computed
    once and exchange-reused; a broadcast build side would re-execute
    the upstream (signature/fingerprint) pipeline."""
    a, b = banded.alias("a"), banded.hint("shuffle_merge").alias("b")
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))


def lsh_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Bucket-size distribution of the banding join — the monitoring
    query for choosing ``bucket_cap`` on a new corpus: (bucket_size,
    n_buckets), largest first. Run on a sample before a full dedup."""
    sig = minhash_signature_stage(df, text_col, id_col, num_perm, shingle_k)
    rows = num_perm // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",", *[F.col("sig")[b * rows + j].cast("string") for j in range(rows)]
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return (
        sig.select("id", F.explode(F.array(*band_structs)).alias("bb"))
        .groupBy("bb.band", "bb.bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy(F.desc("bucket_size"))
    )


def minhash_lsh_verified(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """The full 100 TB near-dup pipeline: LSH banding prunes to
    candidate pairs, exact n-gram Jaccard verifies ONLY those pairs.
    Output equals the declarative 'all pairs with jaccard >= threshold'
    whenever LSH recall is 1 at the threshold (16 bands x 4 rows: a
    jaccard-0.8 pair collides with prob ~1-(1-0.8^4)^16 ~ 0.9997) and
    no bucket exceeds ``bucket_cap`` — which is exactly what the DuckDB
    oracle asserts; a recall miss fails the hash check rather than
    hiding. (Oversized buckets degrade to star pairs — see
    :func:`minhash_lsh_candidates` for the recall contract.)

    Cost structure (this is the round-3 shape; round 2 re-shingled the
    candidate documents in the verify stage and leaked a persist):

    - the corpus is shingled ONCE into a persisted (id, shingles)
      relation consumed by both the signature stage and the verify join;
    - verification is per candidate PAIR: join the pair list to the
      shingle relation on each side (candidates are small -> AQE turns
      both into broadcast joins) and take ``array_intersect`` sizes, so
      verify work is proportional to the number of candidate pairs —
      never to shingle co-occurrence among candidate docs (a hot
      shingle can't reintroduce the quadratic path LSH just pruned);
    - the (small) result is materialized eagerly, then the shingle
      cache is dropped in a finally block — repeated calls leak
      nothing.
    """
    shingled = shingle_docs(df, text_col, id_col, shingle_k).persist()
    try:
        cands = minhash_lsh_candidates(
            df, text_col, id_col, num_perm, bands, shingle_k,
            shingled=shingled, bucket_cap=bucket_cap,
        ).select("id_a", "id_b")
        sa = shingled.select(F.col("id").alias("id_a"), F.col("shingles").alias("_sh_a"))
        sb = shingled.select(F.col("id").alias("id_b"), F.col("shingles").alias("_sh_b"))
        out = (
            cands.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("_c", F.size(F.array_intersect("_sh_a", "_sh_b")))
            .withColumn(
                "jaccard",
                F.round(
                    F.col("_c")
                    / (F.size("_sh_a") + F.size("_sh_b") - F.col("_c")),
                    4,
                ),
            )
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        # eager materialization: the pair list is tiny relative to the
        # corpus; computing it here lets the finally block release the
        # shingle cache without the caller ever observing a cold plan
        return out.localCheckpoint(eager=True)
    finally:
        shingled.unpersist()


# Instrumentation for the most recent connected_components run in this
# process (driver-side; bench.py copies it into bench_detail.json so
# cross-round wall-time excursions are attributable to convergence
# behavior vs box noise). Read-only for callers.
CC_LAST_STATS: dict = {}


def _cc_propagate_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label propagation + pointer-doubling round, PRE-checkpoint:
    (id, label, prev). Factored out of :func:`connected_components` so the
    plan-capture tool explains exactly the code the loop runs.

    1. propagation min: neighbor labels (edges equi-join labels on dst)
       UNIONed with the labels themselves, one min-aggregate per id —
       the self rows carry the previous label through the aggregate
       (``min(own)``; exactly one non-null per id), so no join-back;
    2. pointer doubling: self-join on the stepped label, ``least``.
    """
    neigh = edges.join(labels, edges.dst == labels.id).select(
        F.col("src").alias("id"),
        F.col("label"),
        F.lit(None).cast(labels.schema["label"].dataType).alias("own"),
    )
    stepped = (
        neigh.unionByName(labels.select("id", "label", F.col("label").alias("own")))
        .groupBy("id")
        .agg(F.min("label").alias("label"), F.min("own").alias("prev"))
    )
    x, y = stepped.alias("x"), stepped.alias("y")
    return x.join(y, F.col("x.label") == F.col("y.id"), "left").select(
        F.col("x.id").alias("id"),
        F.least(
            F.col("x.label"), F.coalesce(F.col("y.label"), F.col("x.label"))
        ).alias("label"),
        F.col("x.prev").alias("prev"),
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components over near-duplicate pairs by iterative
    min-label propagation: label(v) <- min(label(v), min over neighbors
    of label(u)) until fixpoint. Converges in O(component diameter)
    rounds for plain propagation; a pointer-doubling compression step
    (label <- label of label) after each round makes it O(log diameter)
    — a diameter-40 chain converges in ~7 rounds instead of 40. Lineage
    is cut per round with localCheckpoint so the plan doesn't grow with
    iterations (the classic iterative-algorithm trap on Spark).

    Per-round plan (r21 shape — one join fewer and one action fewer
    per round than the r3-r20 version, which computed the propagation
    min with a groupBy THEN left-joined it back onto the labels, and
    ran a separate labels-join action just to count changed rows):

    1. propagation min: neighbor labels (edges equi-join labels on dst)
       UNIONed with the labels themselves, one min-aggregate per id —
       the self rows also carry the previous label through the
       aggregate (``min(own)``; exactly one non-null per id), so no
       join-back is needed;
    2. pointer doubling: self-join on the stepped label, ``least``;
    3. eager checkpoint, then ``changed`` = count of label != prev
       rows — a map-only scan of the just-checkpointed partitions
       (the old shape paid an extra shuffle join against the previous
       labels for this count, every round).

    The symmetrized edge set is built once, hash-partitioned by ``dst``
    and PERSISTED: the cached relation advertises its partitioning to
    the planner, so every round's propagation join reads it in place
    instead of re-shuffling the (potentially huge) edge relation per
    round — only the small label table moves. (localCheckpoint would
    NOT work here: a LogicalRDD does not carry reusable partitioning —
    verified empirically on this Spark build.) The cache is released in
    a finally block.

    Raises if max_iter is exhausted before the fixpoint — silently
    returning unconverged labels would corrupt the dedup decision.

    Instrumentation: per-round changed-row counts and wall times land
    in ``CC_LAST_STATS`` (module global) after every run.

    Checkpoint durability: by default lineage is cut with
    localCheckpoint (executor-local storage — fast, fine for local
    mode and tests). On a real cluster an executor loss makes
    localCheckpointed partitions unrecoverable and fails the job
    mid-iteration; for production runs set
    ``reliable_checkpoint=True`` AND configure a fault-tolerant
    checkpoint dir first (``sc.setCheckpointDir('hdfs://...')``) to
    use reliable ``checkpoint()`` at the cost of writing each round's
    labels to distributed storage.

    Returns (id, component) with component = min node id reachable —
    the canonical-document id for dedup.
    """
    import time

    def _cut(df: DataFrame, eager: bool) -> DataFrame:
        if reliable_checkpoint:
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    t_start = time.monotonic()
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    # Symmetrize once, PRE-PARTITION BY the propagation join key and
    # persist: every round's edges-join-labels then reads the cached,
    # already-hash(dst)-partitioned relation (InMemoryRelation advertises
    # its outputPartitioning to the planner), so only the small label
    # table is shuffled per round — at corpus scale the edge relation is
    # the big side. persist (not checkpoint) also keeps recompute
    # lineage for fault tolerance; it is released in the finally below
    # (the returned labels are eagerly checkpointed, so nothing escapes
    # referencing the cache).
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition("dst")
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    rounds: list[dict] = []
    converged = False
    try:
        for _ in range(max_iter):
            t0 = time.monotonic()
            # propagation + doubling (see _cc_propagate_round), then cut
            new_labels = _cut(_cc_propagate_round(edges, labels), eager=True)
            # convergence check: map-only scan of checkpointed partitions
            changed = new_labels.where(F.col("label") != F.col("prev")).count()
            labels = new_labels.select("id", "label")
            rounds.append(
                {"changed": int(changed), "secs": round(time.monotonic() - t0, 3)}
            )
            if changed == 0:
                converged = True
                break
    finally:
        edges.unpersist()
    CC_LAST_STATS.clear()
    CC_LAST_STATS.update(
        {
            "iterations": len(rounds),
            "converged": converged,
            "rounds": rounds,
            "total_secs": round(time.monotonic() - t_start, 3),
        }
    )
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    return labels.select("id", F.col("label").alias("component"))


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Full dedup decision table: every document with its cluster id
    (min doc id in its near-dup component; singletons are their own
    cluster) and an is_canonical flag — the join target that drops
    duplicates from a 100 TB corpus while keeping one representative
    per cluster."""
    comp = connected_components(pairs, a_col, b_col)
    return (
        df.select(F.col(id_col))
        .join(comp, df[id_col] == comp.id, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", (F.col(id_col) == F.col("cluster_id")))
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", band_bits: int = 16
) -> DataFrame:
    """64-bit SimHash per document, computed entirely JVM-side:
    bit i of the fingerprint = sign of sum over tokens of
    (+1 if bit i of xxhash64(token) else -1). Also emits 64/band_bits
    band keys for hamming-candidate grouping (docs sharing any exact
    band are candidates at hamming distance <= 64 - band_bits).

    Implementation: explode tokens -> 64 flat conditional sums (codegen)
    with map-side partial aggregation; the fingerprint is assembled from
    the aggregated bit-sums with literal shifts. No higher-order
    lambdas, no Python."""
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("_tok"),
    ).select("id", F.xxhash64("_tok").alias("_h"))
    sums = [
        F.sum(
            F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(64)
    ]
    agged = exploded.groupBy("id").agg(*sums)
    fingerprint = None
    for i in range(64):
        bit_val = (1 << i) if i < 63 else -(1 << 63)  # avoid long overflow
        term = F.when(F.col(f"_b{i}") > 0, F.lit(bit_val).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint.bitwiseOR(term)
    out = agged.select("id", fingerprint.alias("simhash"))
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    return out.withColumn(
        "bands",
        F.array(
            *[
                F.shiftrightunsigned("simhash", b * band_bits).bitwiseAND(F.lit(mask))
                for b in range(n_bands)
            ]
        ),
    )


def simhash_fingerprints_md5(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", band_bits: int = 16
) -> DataFrame:
    """SimHash variant whose 64-bit token-hash family is derived from
    md5 hex digits — every step (md5, nibble arithmetic, bit sums, band
    assembly) is computable bit-identically in DuckDB, which makes the
    whole simhash pipeline exactly oracle-able. The xxhash64-based
    :func:`simhash_fingerprints` stays the production JVM default; this
    variant exists so the conformance gate can value-check simhash
    end-to-end.

    Token-hash bit (4j + b), b in 0..3, is bit b of hex digit j of
    md5(token) — identical to the DuckDB oracle's
    strpos('0123..ef', digit)-1 formulation.

    Plan shape: simhash is a pure per-document function, so this is a
    MAP-ONLY Arrow pandas UDF — no token explode, no groupBy, no
    shuffle. (The previous explode + 64-conditional-sum aggregate
    multiplied rows ~40x, shuffled them, and its 64-aggregate
    HashAggregate fell out of whole-stage codegen into interpreted
    eval; a stateless per-row kernel is both the faster and the
    100 TB-shaped plan. Tokenization mirrors the JVM expression chain
    split(trim(lower(text)), '\\s+') EXACTLY — trim strips spaces
    only, split keeps leading/trailing empty tokens — matching the
    DuckDB oracle's trim()/regexp_split_to_array semantics on docs
    with \\t/\\n edges, and md5 runs over the UTF-8 bytes.)

    Returns (id, simhash: bigint, bands: array<bigint>) — same schema
    as :func:`simhash_fingerprints`, consumable by
    :func:`simhash_pairs`."""
    # Java's \s is ASCII-only — match it, not Python's unicode \s.
    _ws = re.compile(r"[ \t\n\x0b\f\r]+")
    # nibble value -> its four (2*bit - 1) contributions
    _contrib = np.array(
        [[1 if (d >> b) & 1 else -1 for b in range(4)] for d in range(16)],
        dtype=np.int64,
    )

    @pandas_udf("long")
    def _simhash(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # Iterator form: the per-unique-token contribution cache lives
        # for the whole TASK, amortizing md5 work across batches (the
        # scalar form rebuilt it per batch). Per-batch accumulation is
        # one fancy-index + reduceat + matmul instead of a Python-level
        # 64-add loop per token (r20 shape) — the md5-per-unique-token
        # cost is the only remaining per-row Python work.
        tok_idx: dict = {}
        vecs: list = []  # parallel to tok_idx values: 64-vector each
        stacked = [np.empty((0, 64), dtype=np.int64)]  # memoized vstack
        _CACHE_CAP = 1_000_000  # ~0.5 GB of vectors; reset beyond (memoization only)

        def idx(tok: str) -> int:
            i = tok_idx.get(tok)
            if i is None:
                m = hashlib.md5(tok.encode("utf-8")).hexdigest()[:16]
                v = np.empty(64, dtype=np.int64)
                for j, ch in enumerate(m):
                    v[4 * j : 4 * j + 4] = _contrib[int(ch, 16)]
                i = len(vecs)
                vecs.append(v)
                tok_idx[tok] = i
            return i

        weights = (np.int64(1) << np.arange(63)).astype(np.int64)
        int64_min = np.int64(-(1 << 63))
        for texts in batches:
            if len(vecs) > _CACHE_CAP:
                tok_idx.clear()
                vecs.clear()
                stacked[0] = np.empty((0, 64), dtype=np.int64)
            flat: list[int] = []
            starts: list[int] = [0]
            for t in texts:
                # trim SPACES ONLY and keep empty tokens from the split:
                # Spark's trim() strips ' ' (not \t\n) and split(limit=-1)
                # keeps leading/trailing '' elements, as does DuckDB's
                # trim()/regexp_split_to_array — so 'foo bar\n' must
                # tokenize to ['foo','bar',''], not ['foo','bar'].
                t = ("" if t is None else t).lower().strip(" ")
                toks = _ws.split(t) if t else [""]
                flat.extend(idx(tok) for tok in toks)
                starts.append(len(flat))
            if not texts.size:
                yield pd.Series([], dtype="int64")
                continue
            if stacked[0].shape[0] != len(vecs):  # vocab grew this batch
                stacked[0] = np.vstack(vecs)
            V = stacked[0]  # (n_unique_tokens_so_far, 64)
            # per-doc bit sums: every doc has >= 1 token, so reduceat
            # boundaries are strictly increasing
            sums = np.add.reduceat(V[np.asarray(flat)], np.asarray(starts[:-1]))
            bits = sums > 0
            fps = bits[:, :63].astype(np.int64) @ weights
            fps[bits[:, 63]] += int64_min
            yield pd.Series(fps)

    # non-deterministic mark: stop pushed filters (isnotnull from the
    # downstream band joins) duplicating the UDF evaluation (guide §4.4)
    out = df.select(
        F.col(id_col).alias("id"),
        _simhash.asNondeterministic()(F.col(text_col)).alias("simhash"),
    )
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    return out.withColumn(
        "bands",
        F.array(
            *[
                F.shiftrightunsigned("simhash", b * band_bits).bitwiseAND(F.lit(mask))
                for b in range(n_bands)
            ]
        ),
    )


def simhash_pairs(
    fps: DataFrame,
    max_hamming: int = 8,
    bucket_cap: int | None = None,
    materialize_fps: bool = False,
) -> DataFrame:
    """Consume simhash band keys: docs sharing ANY exact band are
    candidates (equi-join on (band_idx, band_val) — never all-pairs),
    then exact hamming verify via bit_count(xor) <= max_hamming,
    all JVM-side. With 4 bands of 16 bits, banding recall is 1 for
    max_hamming <= 3 (pigeonhole: 3 flipped bits can't touch all 4
    bands); above that it's the standard simhash trade-off.

    ``fps`` is the output of :func:`simhash_fingerprints` or
    :func:`simhash_fingerprints_md5`. ``bucket_cap`` applies the same
    oversized-bucket star-pair guard as the MinHash path (see
    :func:`minhash_lsh_candidates`).

    Plan shape (r21): the fingerprint column is CARRIED THROUGH the
    band explode and the bucket self-join, so both pair fingerprints
    come out of the join itself — the r3-r20 shape re-joined the pair
    list against ``fps`` twice to re-attach them, which (with the
    band-explode reference) re-executed the fingerprint subplan FOUR
    times, each doubled by a pushed isnotnull filter: EIGHT
    ArrowEvalPython corpus passes per run
    (plans/r21/dd_simhash_pairs_before.txt nodes 3,7,14,18,31,35,42,46).
    The self-join carries a SHUFFLE_MERGE hint so both sides shuffle
    identically and the fingerprint subplan is computed once and
    exchange-reused (an AQE broadcast build side would re-execute it);
    at corpus scale both sides ARE the corpus, so merge is the right
    strategy anyway. Per-pair dedup happens AFTER the cheap hamming
    verify, as a min-aggregate (hamming is pair-functional, so the
    value is unchanged).

    ``materialize_fps=True`` eagerly localCheckpoints ``fps`` before
    banding (the :func:`minhash_lsh_verified` pattern): a
    nondeterministic-UDF fingerprint subtree cannot be exchange-reused
    across the self-join's two sides, so without it the Python kernel
    still runs twice per corpus. The checkpointed relation is
    (id, simhash, bands) — a few dozen bytes/doc, tiny next to
    re-hashing every token — and both join sides then scan the same
    stored partitions, so the kernel runs exactly ONCE. Per-invocation
    only (a fresh call builds a fresh RDD; nothing survives the run).
    Default False to keep the operator lazy/composable."""
    if materialize_fps:
        fps = fps.localCheckpoint(eager=True)
    banded = fps.select(
        "id", "simhash", F.posexplode("bands").alias("band", "bucket")
    )

    def _self_join_pairs(rel: DataFrame) -> DataFrame:
        a = rel.alias("a")
        b = rel.hint("shuffle_merge").alias("b")
        return a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("_ha"),
            F.col("b.simhash").alias("_hb"),
        )

    if bucket_cap is None:
        occ = _self_join_pairs(banded)
    else:
        w = Window.partitionBy("band", "bucket")
        sized = banded.withColumn("_cnt", F.count(F.lit(1)).over(w)).withColumn(
            "_anchor", F.min(F.struct("id", "simhash")).over(w)
        )
        small = sized.where(F.col("_cnt") <= bucket_cap).select(
            "id", "simhash", "band", "bucket"
        )
        star = (
            sized.where(
                (F.col("_cnt") > bucket_cap) & (F.col("id") != F.col("_anchor.id"))
            )
            .select(
                F.col("_anchor.id").alias("id_a"),
                F.col("id").alias("id_b"),
                F.col("_anchor.simhash").alias("_ha"),
                F.col("simhash").alias("_hb"),
            )
        )
        occ = _self_join_pairs(small).unionByName(star)
    return (
        occ.withColumn("hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))))
        .where(F.col("hamming") <= max_hamming)
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").alias("hamming"))
    )
