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
    a, b = sh.alias("a"), sh.alias("b")
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


def minhash_signature_stage(df: DataFrame, text_col: str, id_col: str,
                            num_perm: int = 64, shingle_k: int = 3,
                            shingled: DataFrame | None = None) -> DataFrame:
    """num_perm MinHash values as array<bigint>:
    sig[i] = min over shingles of xxhash64(shingle, seed_i).

    Implementation: explode shingles -> num_perm flat min-aggregates.
    xxhash64 + min are whole-stage-codegen'd, while higher-order array
    lambdas (transform/aggregate) are interpreted in Spark and ~10x
    slower; partial aggregation collapses to one row per doc before any
    shuffle. Seeds are plan-time literals — deterministic everywhere.

    The shingle STRING is hashed exactly once (_h); the num_perm hash
    family is derived by re-hashing that single long with per-function
    seeds — hashing an 8-byte long 64 times costs ~1/10th of hashing a
    ~30-char string 64 times, with the same independence properties.

    Pass ``shingled`` (from :func:`shingle_docs`, ideally persisted) to
    reuse an existing shingle relation instead of re-shingling."""
    if shingled is None:
        shingled = shingle_docs(df, text_col, id_col, shingle_k)
    exploded = shingled.select(
        "id", F.explode("shingles").alias("_sh")
    ).withColumn("_h", F.xxhash64("_sh"))
    mins = [F.min(F.xxhash64("_h", F.lit(i))).alias(f"_m{i}") for i in range(num_perm)]
    agged = exploded.groupBy("id").agg(*mins)
    return agged.select(
        "id", F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("sig")
    )


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
    inside it goes quadratic — the scale-killer at 100 TB. Buckets with
    more than ``bucket_cap`` members are kept OUT of the self-join
    (enforced structurally by a filter on a windowed per-bucket count,
    so no oversized bucket can reach the join); instead they emit
    star pairs (bucket-min id, member) — linear in bucket size.

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
        w = Window.partitionBy("band", "bucket")
        sized = banded.withColumn("_cnt", F.count(F.lit(1)).over(w)).withColumn(
            "_anchor", F.min("id").over(w)
        )
        small = sized.where(F.col("_cnt") <= bucket_cap).select("id", "band", "bucket")
        star = (
            sized.where((F.col("_cnt") > bucket_cap) & (F.col("id") != F.col("_anchor")))
            .select(F.col("_anchor").alias("id_a"), F.col("id").alias("id_b"))
        )
        occurrences = _bucket_self_join(small).unionByName(star)
    return occurrences.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_bands"))


def _bucket_self_join(banded: DataFrame) -> DataFrame:
    """(id, band, bucket) -> one (id_a < id_b) row per shared bucket."""
    a, b = banded.alias("a"), banded.alias("b")
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
    — a diameter-40 chain converges in ~7 rounds instead of 40. Each
    round is two equi-join shuffles on node id, never anything
    quadratic. Lineage is cut per round with localCheckpoint so the
    plan doesn't grow with iterations (the classic iterative-algorithm
    trap on Spark).

    Raises if max_iter is exhausted before the fixpoint — silently
    returning unconverged labels would corrupt the dedup decision.

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
    def _cut(df: DataFrame, eager: bool) -> DataFrame:
        if reliable_checkpoint:
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = _cut(
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct(),
        eager=False,
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    converged = False
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(neigh, labels.id == neigh.src, "left").select(
            labels.id,
            F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
        )
        # pointer doubling: follow the label's own label
        x, y = stepped.alias("x"), stepped.alias("y")
        new_labels = _cut(
            x.join(y, F.col("x.label") == F.col("y.id"), "left")
            .select(
                F.col("x.id").alias("id"),
                F.least(
                    F.col("x.label"), F.coalesce(F.col("y.label"), F.col("x.label"))
                ).alias("label"),
            ),
            eager=True,
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
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
    def _simhash(texts: pd.Series) -> pd.Series:
        # cache per unique token: its 64-vector of +-1 contributions
        tok_vec: dict = {}

        def vec(tok: str) -> np.ndarray:
            v = tok_vec.get(tok)
            if v is None:
                m = hashlib.md5(tok.encode("utf-8")).hexdigest()[:16]
                v = np.empty(64, dtype=np.int64)
                for j, ch in enumerate(m):
                    v[4 * j : 4 * j + 4] = _contrib[int(ch, 16)]
                tok_vec[tok] = v
            return v

        out = np.zeros(len(texts), dtype=np.int64)
        weights = (np.int64(1) << np.arange(63)).astype(np.int64)
        for k, t in enumerate(texts):
            # trim SPACES ONLY and keep empty tokens from the split:
            # Spark's trim() strips ' ' (not \t\n) and split(limit=-1)
            # keeps leading/trailing '' elements, as does DuckDB's
            # trim()/regexp_split_to_array — so 'foo bar\n' must
            # tokenize to ['foo','bar',''], not ['foo','bar'].
            t = ("" if t is None else t).lower().strip(" ")
            toks = _ws.split(t) if t else [""]
            sums = np.zeros(64, dtype=np.int64)
            for tok in toks:
                sums += vec(tok)
            bits = sums > 0
            fp = int((weights[bits[:63]]).sum())
            if bits[63]:
                fp -= 1 << 63
            out[k] = fp
        return pd.Series(out)

    out = df.select(F.col(id_col).alias("id"), _simhash(F.col(text_col)).alias("simhash"))
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
    fps: DataFrame, max_hamming: int = 8, bucket_cap: int | None = None
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
    :func:`minhash_lsh_candidates`)."""
    banded = fps.select(
        "id", F.posexplode("bands").alias("band_idx", "band_val")
    ).withColumnRenamed("band_idx", "band").withColumnRenamed("band_val", "bucket")
    if bucket_cap is None:
        occ = _bucket_self_join(banded)
    else:
        w = Window.partitionBy("band", "bucket")
        sized = banded.withColumn("_cnt", F.count(F.lit(1)).over(w)).withColumn(
            "_anchor", F.min("id").over(w)
        )
        small = sized.where(F.col("_cnt") <= bucket_cap).select("id", "band", "bucket")
        star = (
            sized.where((F.col("_cnt") > bucket_cap) & (F.col("id") != F.col("_anchor")))
            .select(F.col("_anchor").alias("id_a"), F.col("id").alias("id_b"))
        )
        occ = _bucket_self_join(small).unionByName(star)
    cand = occ.distinct()
    fa = fps.select(F.col("id").alias("id_a"), F.col("simhash").alias("_ha"))
    fb = fps.select(F.col("id").alias("id_b"), F.col("simhash").alias("_hb"))
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
