"""Dedup & similarity quality tests: LSH candidates vs exact Jaccard,
simhash hamming behavior, ANN vs brute force, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from beagle_spark.ops import dedup, multimodal, similarity

SF = "/root/testdata/sf0.01"  # 500 docs — planted near-duplicates exist


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_minhash_lsh_finds_near_duplicates(spark, docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.8).collect()
    }
    assert exact, "corpus should contain planted near-duplicates"
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(docs).collect()
    }
    # recall: at jaccard >= 0.8 with 16 bands x 4 rows, P(candidate) =
    # 1-(1-j^4)^16 >= 0.999 — every true pair must surface
    assert exact <= cands
    # precision: candidates shouldn't explode (banding, not all-pairs)
    assert len(cands) < 50 * max(1, len(exact))


def test_simhash_near_dups_have_small_hamming(spark, docs):
    exact = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.9)
    fp = dedup.simhash_fingerprints(docs).select("id", "simhash")
    joined = (
        exact.join(fp.withColumnRenamed("id", "id_a").withColumnRenamed("simhash", "h_a"), "id_a")
        .join(fp.withColumnRenamed("id", "id_b").withColumnRenamed("simhash", "h_b"), "id_b")
        .select(F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"))
        .collect()
    )
    assert joined
    assert all(r["hamming"] <= 12 for r in joined)  # near-dups cluster tightly


def test_simhash_md5_whitespace_edges_match_duckdb(spark):
    """Docs with \\t/\\n edges: the Arrow UDF must tokenize exactly like
    the JVM chain and the DuckDB oracle — trim strips SPACES only, the
    split keeps leading/trailing empty tokens — so 'foo bar\\n' hashes
    ['foo','bar',''] on both sides (advisor-found divergence that the
    synthetic corpus masked)."""
    import duckdb
    import pandas as pd

    from beagle_spark.queries import DD_SIMHASH_SQL

    pdf = pd.DataFrame(
        [
            ("d1", "foo bar\n"),
            ("d2", "\tfoo bar"),
            ("d3", "foo bar"),
            ("d4", "  foo\tbar  "),
            ("d5", "\n"),
            ("d6", "x\r\ny"),
            ("d7", "   "),
        ],
        columns=["doc_id", "text"],
    )
    fps = dedup.simhash_fingerprints_md5(
        spark.createDataFrame(pdf), text_col="text", id_col="doc_id"
    )
    got = {r["id"]: [int(b) for b in r["bands"]] for r in fps.collect()}
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = {r[0]: list(r[1:]) for r in con.execute(DD_SIMHASH_SQL).fetchall()}
    assert got == exp
    # and the edge actually matters: trailing \n must change the hash
    assert got["d1"] != got["d3"]


def test_lsh_ann_equals_bruteforce_within_bucket(spark, emb):
    import numpy as np

    row = emb.where(F.col("vec_id") == 0).first()
    q = [float(x) for x in row["embedding"]]
    planes = similarity.make_planes(len(q), n_planes=6, seed=42)
    qarr = np.array(q)
    qbucket = 0
    for i, p in enumerate(planes):
        if float(np.dot(qarr, np.array(p))) > 0:
            qbucket |= 1 << i
    bucket_members = emb.withColumn(
        "_b", similarity.hyperplane_bucket(F.col("embedding"), planes)
    ).where(F.col("_b") == qbucket)
    expected = sorted(
        r["vec_id"] for r in similarity.brute_force_topk(bucket_members, q, k=10).collect()
    )
    got = sorted(r["vec_id"] for r in similarity.lsh_ann_topk(emb, q, k=10).collect())
    assert got == expected
    assert 0 in got  # the query vector shares its own bucket


def test_multimodal_feature_extraction(spark, docs):
    media = multimodal.synthesize_media_from_docs(docs.limit(50))
    feats = multimodal.extract_features(media, dim=8).collect()
    assert len(feats) == 50
    for r in feats:
        assert r["n_bytes"] > 0
        assert len(r["feature"]) == 8
        norm = sum(x * x for x in r["feature"])
        assert abs(norm - 1.0) < 1e-3  # L2-normalized


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"bytes", "png")


def test_frame_sample_plan(spark):
    rows = [
        (1, "video", None, "fake", None, None, 3500),
        (2, "image", None, "fake", 64, 64, None),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.frame_sample_plan(df, every_ms=1000).collect()
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in out)
    assert got == [(1, 0), (1, 1000), (1, 2000), (1, 3000)]


def test_lsh_pairs_subset_of_exact(spark, emb):
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.lsh_cosine_pairs(emb, threshold=0.4, dim=64).collect()
    }
    assert lsh <= exact  # no false positives (exact re-check in-bucket)
    if exact:
        # recall with 4 planes: same-bucket prob for cos>=0.4 pairs is
        # (1 - theta/pi)^4 ~ 0.25+; just require non-trivial overlap
        assert len(lsh) > 0


def test_ivf_ann_equals_bruteforce_within_probed_cells(spark, emb):
    import numpy as np

    row = emb.where(F.col("vec_id") == 0).first()
    q = [float(x) for x in row["embedding"]]
    cents = similarity.train_ivf_centroids(emb, n_centroids=8)
    assert len(cents) == 8 and len(cents[0]) == 64
    # IVF result == brute force restricted to the probed cells
    qarr = np.array(q)
    order = np.argsort(((np.array(cents) - qarr) ** 2).sum(axis=1))
    probe = {int(i) for i in order[:2]}
    members = emb.withColumn(
        "_cell", similarity.ivf_assign(F.col("embedding"), cents)
    ).where(F.col("_cell").isin(list(probe)))
    expected = sorted(
        r["vec_id"] for r in similarity.brute_force_topk(members, q, k=10).collect()
    )
    got = sorted(
        r["vec_id"]
        for r in similarity.ivf_ann_topk(emb, q, cents, k=10, n_probe=2).collect()
    )
    assert got == expected
    assert 0 in got  # query's own cell is always probed first


def test_connected_components_hand_graph(spark):
    """Chain 1-2-3, triangle 10-11-12 (with a redundant edge), isolated
    pair 20-21: components = min id reachable; singletons absent from
    pair input get their own cluster via dedup_clusters."""
    from beagle_spark.ops.dedup import connected_components, dedup_clusters
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.range(25).select(F.col("id").alias("doc_id"))
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup_clusters(docs, pairs).collect()}
    assert out[3] == (1, False)
    assert out[12] == (10, False)
    assert out[21] == (20, False)
    assert out[7] == (7, True)       # singleton
    n_canon = sum(1 for c, canon in out.values() if canon)
    assert n_canon == 25 - 5         # 5 non-canonical dups


def test_lsh_bucket_cap_bounds_identical_doc_blowup(spark):
    """Skew guard: 1000 identical docs put every doc in ONE bucket per
    band; uncapped that self-join is ~500k pairs x 16 bands. With
    bucket_cap the oversized buckets emit star pairs only (anchor =
    bucket min id), so the pipeline stays linear and completes fast,
    and clustering still sees one fully-connected component."""
    import time

    from beagle_spark.ops.dedup import (
        dedup_clusters, minhash_lsh_candidates, minhash_lsh_verified)

    docs = spark.range(1000).selectExpr(
        "id AS doc_id",
        "'the same boilerplate licence header text repeated verbatim' AS text",
    )
    t0 = time.time()
    cands = minhash_lsh_candidates(docs, bucket_cap=100)
    rows = cands.collect()
    assert time.time() - t0 < 120
    # star pairs: every non-anchor doc paired with anchor 0, nothing else
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(0, i) for i in range(1, 1000)}

    # structural guard (r21 grouped-pairs shape): the capped candidate
    # path has NO join at all — pairs are generated per (band, bucket)
    # group from a collect_list'd id array, with the cap applied as a
    # CASE on the array size (all-pairs vs star). An oversized bucket
    # therefore CANNOT reach any quadratic join-side by construction.
    plan = cands._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert "collect_list" in plan and "array_sort" in plan
    assert "100" in plan  # the cap literal gates the pair expression

    # end-to-end: verified pairs all jaccard 1.0; one component
    verified = minhash_lsh_verified(docs, bucket_cap=100)
    vrows = verified.collect()
    assert len(vrows) == 999
    assert all(r["jaccard"] == 1.0 for r in vrows)
    clusters = dedup_clusters(docs, verified).collect()
    assert all(r["cluster_id"] == 0 for r in clusters)


def test_minhash_verified_no_cache_leak(spark, docs):
    """minhash_lsh_verified must not leave persisted RDDs behind
    (round-2 leaked the candidate cache on every call)."""
    from beagle_spark.ops.dedup import minhash_lsh_verified

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    minhash_lsh_verified(docs, threshold=0.8).count()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before + 1  # only the localCheckpointed result may remain


def test_simhash_pairs_banding_recall(spark, docs):
    """With 4 bands of 16 bits, any pair at hamming <= 3 MUST share a
    band (pigeonhole), so simhash_pairs at max_hamming=3 equals the
    brute-force hamming<=3 pair set; at 8 it's a subset of brute force
    (banding may miss) with no false positives (exact verify)."""
    fps = dedup.simhash_fingerprints_md5(docs).cache()
    a = fps.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha"))
    b = fps.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb"))
    brute = (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
    )
    brute3 = {(r.id_a, r.id_b) for r in brute.where("hamming <= 3").collect()}
    got3 = {(r.id_a, r.id_b) for r in dedup.simhash_pairs(fps, max_hamming=3).collect()}
    assert got3 == brute3
    brute8 = {(r.id_a, r.id_b) for r in brute.where("hamming <= 8").collect()}
    got8 = {(r.id_a, r.id_b) for r in dedup.simhash_pairs(fps, max_hamming=8).collect()}
    assert got8 <= brute8
    assert len(got8) > len(got3)  # banding finds real extra pairs here
    fps.unpersist()


def test_simhash_pairs_materialize_fps_identical_single_python_pass(spark, docs):
    """materialize_fps=True must not change a single pair, and the
    returned plan must contain NO Python eval node: the fingerprint
    kernel ran exactly once, inside the eager localCheckpoint, instead
    of once per self-join side (nondeterministic subtrees are never
    exchange-reused)."""
    fps = dedup.simhash_fingerprints_md5(docs)
    lazy = dedup.simhash_pairs(fps, max_hamming=8)
    mat = dedup.simhash_pairs(fps, max_hamming=8, materialize_fps=True)
    key = lambda r: (r.id_a, r.id_b, r.hamming)
    assert sorted(map(key, mat.collect())) == sorted(map(key, lazy.collect()))
    plan = mat._sc._jvm.PythonSQLUtils.explainString(
        mat._jdf.queryExecution(), "formatted"
    )
    assert "EvalPython" not in plan  # no ArrowEvalPython/BatchEvalPython
    assert "ExistingRDD" in plan  # both join sides scan the checkpoint


def test_minhash_signature_arrow_matches_agg(spark, docs):
    """The r22 map-only Arrow signature kernel must be BIT-IDENTICAL to
    the explode + 64-min-aggregate shape it replaced (the numpy XXH64
    re-implementation covers hashLong/hashInt with wrapping uint64
    arithmetic, and the min must compare SIGNED longs). Also pins the
    plan claims: no Exchange in the arrow shape, one in the agg shape."""
    sig_a = dedup.minhash_signature_stage(docs, "text", "doc_id", 64, 3, impl="arrow")
    sig_j = dedup.minhash_signature_stage(docs, "text", "doc_id", 64, 3, impl="agg")
    ra = {r["id"]: list(r["sig"]) for r in sig_a.collect()}
    rj = {r["id"]: list(r["sig"]) for r in sig_j.collect()}
    assert ra == rj
    plan_a = sig_a._jdf.queryExecution().executedPlan().toString()
    plan_j = sig_j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan_a  # map-only
    assert "Exchange hashpartitioning" in plan_j


def test_minhash_signature_arrow_edge_docs(spark):
    """Edge inputs through both signature impls: empty text, single
    token, whitespace-only, unicode, giant repeated token."""
    rows = [
        (0, ""), (1, "one"), (2, "   "), (3, "\t\n"),
        (4, "café naïve 中文 tokens here"),
        (5, "x " * 500), (6, "a b c"), (7, "a b c d e f g"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig_a = dedup.minhash_signature_stage(docs, "text", "doc_id", 64, 3, impl="arrow")
    sig_j = dedup.minhash_signature_stage(docs, "text", "doc_id", 64, 3, impl="agg")
    ra = {r["id"]: list(r["sig"]) for r in sig_a.collect()}
    rj = {r["id"]: list(r["sig"]) for r in sig_j.collect()}
    assert ra == rj
    assert set(ra) == {0, 1, 2, 3, 4, 5, 6, 7}


def test_grouped_bucket_pairs_randomized_equivalence(spark):
    """Pair-set equivalence of _grouped_bucket_pairs against a plain
    Python reference over randomized bucket layouts at several caps
    (all-pairs under the cap, min-anchor star above it)."""
    import itertools
    import random

    rng = random.Random(7)
    rows = []
    for band in range(4):
        for bucket in range(6):
            members = rng.sample(range(100), rng.randint(0, 12))
            rows.extend((i, band, bucket * 7919) for i in members)
    banded = spark.createDataFrame(rows, "id long, band int, bucket long")
    by_bucket: dict = {}
    for i, band, bucket in rows:
        by_bucket.setdefault((band, bucket), []).append(i)
    for cap in (2, 5, 1000):
        expect = set()
        for ids in by_bucket.values():
            ids = sorted(ids)
            if len(ids) <= cap:
                expect |= set(itertools.combinations(ids, 2))
            else:
                expect |= {(ids[0], m) for m in ids[1:]}
        got = {
            (r.id_a, r.id_b)
            for r in dedup._grouped_bucket_pairs(banded, cap).collect()
        }
        assert got == expect, f"cap={cap}"


def test_grouped_bucket_pairs_degenerate_bucket_bounded(spark):
    """VERDICT r21 'What's wrong #2': a degenerate bucket (here 10^5
    members in ONE (band,bucket) group, 1000x the cap) must never be
    collect_list'ed whole. The r22 shape filters rows by the windowed
    per-bucket count BEFORE the aggregate, so the collect buffer is
    bounded by bucket_cap regardless of bucket size; the oversized
    bucket's members stream map-side into star pairs. Asserts the pair
    set, the join-free plan, and the structural guard (the count filter
    sits below the aggregate)."""
    import time

    n = 100_000
    banded = spark.range(n).selectExpr(
        "id", "0 AS band", "CAST(42 AS LONG) AS bucket"
    )
    # plus one small bucket to exercise the all-pairs branch alongside
    small = spark.createDataFrame(
        [(i, 1, 7) for i in range(3)], "id long, band int, bucket long"
    )
    pairs = dedup._grouped_bucket_pairs(banded.unionByName(small), bucket_cap=100)
    t0 = time.time()
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert time.time() - t0 < 120
    expect = {(0, i) for i in range(1, n)} | {(0, 1), (0, 2), (1, 2)}
    assert got == expect
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    # the collect_list aggregate's input is pre-filtered by the windowed
    # count (cnt <= cap): the filter must appear BELOW the aggregate
    agg_pos = plan.find("collect_list")
    filt_pos = plan.find("<= 100")
    assert agg_pos != -1 and filt_pos != -1 and filt_pos > agg_pos


def test_adversarial_dedup_scale(spark):
    """VERDICT r21 item 5 (carried since r7): 200k docs, one giant
    near-dup cluster (20% of the corpus, 400x bucket_cap), a long
    near-dup pair chain (diameter 2048), unique background docs —
    through the REAL operators: minhash signatures -> LSH banding ->
    capped pair generation -> connected components. Asserts
    - the bucket_cap star guard engages for the giant cluster: its
      emitted pair set is EXACTLY the min-id star (all-pairs would be
      ~8*10^8 rows and would not return);
    - connected_components converges within the pointer-doubling bound
      (~log2(diameter) + fixpoint-detection rounds), proven from the
      CC_LAST_STATS instrumentation rather than assumed;
    - cluster decisions: one component for the giant cluster, one for
      the chain, nothing merged across them.
    Wall/round stats are printed for the record."""
    import math
    import time

    n_total, n_giant = 200_000, 40_000
    boiler = (
        "this page is intentionally left blank standard license header "
        "copyright terms apply all rights reserved"
    )
    docs = spark.range(n_total).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_giant, F.lit(boiler))
        .otherwise(
            F.format_string(
                "tok%da tok%db tok%dc tok%dd tok%de", "id", "id", "id", "id", "id"
            )
        )
        .alias("text"),
    )
    t0 = time.monotonic()
    cands = dedup.minhash_lsh_candidates(
        docs, num_perm=16, bands=4, bucket_cap=100
    )
    stats = cands.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("id_a").alias("n_a"),
        F.min("id_a").alias("min_a"),
        F.max("id_a").alias("max_a"),
        F.min("id_b").alias("min_b"),
        F.max("id_b").alias("max_b"),
    ).collect()[0]
    t_lsh = time.monotonic() - t0
    # exactly the min-id star over the giant cluster, nothing else:
    # 39999 pairs (0, 1..39999). Unique background docs share no
    # shingle, so no cross or background pairs.
    assert (
        stats.n,
        stats.n_a,
        stats.min_a,
        stats.max_a,
        stats.min_b,
        stats.max_b,
    ) == (n_giant - 1, 1, 0, 0, 1, n_giant - 1), stats

    # long chain at the pair level (the shape a 2048-link near-dup
    # chain produces downstream), disjoint from the star
    c0, clen = 150_000, 2_048
    chain = spark.range(c0, c0 + clen).selectExpr(
        "id AS id_a", "id + 1 AS id_b"
    )
    pairs = cands.select("id_a", "id_b").unionByName(chain)
    t1 = time.monotonic()
    comp = dedup.connected_components(pairs, max_iter=20)
    agg = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    )
    rows = {r.component: (r.n, r.lo, r.hi) for r in agg.collect()}
    t_cc = time.monotonic() - t1
    cc = dict(dedup.CC_LAST_STATS)
    assert rows == {
        0: (n_giant, 0, n_giant - 1),
        c0: (clen + 1, c0, c0 + clen),
    }, rows
    # pointer-doubling bound: reachable-label distance grows >= 2x per
    # round (1-hop propagation + label-of-label jump), so a
    # diameter-2048 path needs ~log2(2048)=11 rounds plus fixpoint
    # detection — far under plain propagation's 2048
    bound = math.ceil(math.log2(clen)) + 3
    assert cc["converged"] and cc["iterations"] <= bound, cc
    print(
        f"adversarial scale: lsh {t_lsh:.1f}s, cc {t_cc:.1f}s in "
        f"{cc['iterations']} rounds {[r['changed'] for r in cc['rounds']]}"
    )


def test_lsh_ann_indexed_partition_pruned(spark, emb, tmp_path):
    """VERDICT r21 item 8: a standing corpus serves ANN lookups from a
    bucket-partitioned parquet layout. Build the index once, then
    assert (a) the probe returns exactly lsh_ann_topk's result on the
    same data, (b) the probe plan prunes on the bucket PARTITION column
    (PartitionFilters carries the bucket equality) and contains NO
    Python eval node — the bucket kernel runs only at build time."""
    path = str(tmp_path / "lsh_index")
    similarity.build_lsh_bucket_index(emb, path, payload_cols=("label",))
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    probe = similarity.lsh_ann_topk_indexed(
        spark, path, q, k=10, payload_cols=("label",)
    )
    got = [(r.vec_id, r.label) for r in probe.collect()]
    want = [
        (r.vec_id, r.label)
        for r in similarity.lsh_ann_topk(emb, q, k=10, payload_cols=("label",)).collect()
    ]
    assert got == want and len(got) > 0
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:200]
    # exactly ONE Python eval node: the cosine scorer over the pruned
    # bucket. The bucket kernel itself never runs at probe time (the
    # unindexed plan has two: bucket + cosine).
    # (tree-form "ArrowEvalPython (n" only: the formatted dump repeats
    # each node as a "(n) ArrowEvalPython" detail header)
    assert plan.count("ArrowEvalPython (") == 1
