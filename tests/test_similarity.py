"""Unit tests for similarity search (brute-force cosine top-k + sign-LSH ANN)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.1]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_topk_ordering(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    rows = S.brute_topk(vecs, q, k=3).collect()
    got = [(r["rank"], r["vec_id"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == [(1, 1), (2, 2), (3, 3)]
    expected = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    (top_cos,) = [r["cos"] for r in rows if r["rank"] == 1]
    assert top_cos == pytest.approx(expected)


def test_brute_topk_excludes_self(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    assert all(r["vec_id"] != 0 for r in S.brute_topk(vecs, q, k=5).collect())


def test_lsh_bucket_deterministic(vecs):
    a = S.with_lsh_bucket(vecs, "embedding", dim=3, n_planes=6).collect()
    b = S.with_lsh_bucket(vecs, "embedding", dim=3, n_planes=6).collect()
    assert {r["vec_id"]: r["lsh_bucket"] for r in a} == {r["vec_id"]: r["lsh_bucket"] for r in b}


def test_lsh_bucket_separates_antipodes(vecs):
    buckets = {r["vec_id"]: r["lsh_bucket"] for r in
               S.with_lsh_bucket(vecs, "embedding", dim=3, n_planes=8).collect()}
    # an antipodal pair flips EVERY hyperplane sign → different bucket
    assert buckets[0] != buckets[4]
    assert 0 <= buckets[0] < 2**8


def test_lsh_ann_subset_of_brute(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    brute = {(r["query_id"], r["vec_id"]): r["cos"]
             for r in S.brute_topk(vecs, q, k=5).collect()}
    ann = S.lsh_ann(vecs, q, dim=3, n_planes=2, k=5).collect()
    assert len(ann) >= 1  # wide buckets (2 planes) must catch the near neighbor
    for r in ann:
        assert brute[(r["query_id"], r["vec_id"])] == pytest.approx(r["cos"], abs=0)


def test_ivf_deterministic_and_scored_exactly(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    cent = S.ivf_random_centroids(3, 4)
    a = S.ivf_ann(vecs, q, centroids=cent, n_probe=2, k=5).collect()
    b = S.ivf_ann(vecs, q, centroids=cent, n_probe=2, k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # within probed lists the cosine is exact — must agree with brute force
    brute = {(r["query_id"], r["vec_id"]): r["cos"]
             for r in S.brute_topk(vecs, q, k=10).collect()}
    for r in a:
        assert brute[(r["query_id"], r["vec_id"])] == pytest.approx(r["cos"], abs=0)


def test_ivf_full_probe_equals_brute(vecs):
    """Probing every list makes IVF exhaustive: identical to brute top-k."""
    q = vecs.filter(F.col("vec_id") == 0)
    cent = S.ivf_random_centroids(3, 4)
    ivf = S.ivf_ann(vecs, q, centroids=cent, n_probe=4, k=5).collect()
    brute = S.brute_topk(vecs, q, k=5).collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in brute]


def test_kmeans_centroids_deterministic_and_unit_norm():
    import numpy as np

    rng = np.random.default_rng(7)
    sample = rng.standard_normal((200, 8))
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    a = S.kmeans_centroids(sample, 4)
    b = S.kmeans_centroids(sample, 4)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
    # trained centroids should beat random ones on mean best-cosine
    rand = S.ivf_random_centroids(8, 4)
    assert (sample @ a.T).max(axis=1).mean() >= (sample @ rand.T).max(axis=1).mean()


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pq_vecs(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((40, 8))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(40)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), mat


def _np_codes(mat, books):
    import numpy as np

    m, ksub, dsub = books.shape
    codes = np.empty((len(mat), m), dtype=int)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        d = ((sub[:, None, :] - books[None, j]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d, axis=1)
    return codes


def test_pq_encode_matches_numpy_nearest_centroid(pq_vecs):
    import numpy as np

    df, mat = pq_vecs
    books = S.pq_random_codebooks(8, m=2, ksub=4)
    got = {r["id"]: [int(c) for c in r["pq_csv"].split(",")]
           for r in S.pq_encode(df, "vec_id", "embedding", books).collect()}
    want = _np_codes(mat, books)
    for i in range(len(mat)):
        assert got[i] == list(want[i])


def test_pq_encode_deterministic(pq_vecs):
    df, _ = pq_vecs
    books = S.pq_random_codebooks(8, m=4, ksub=4)
    a = sorted(map(tuple, S.pq_encode(df, "vec_id", "embedding", books).collect()))
    b = sorted(map(tuple, S.pq_encode(df, "vec_id", "embedding", books).collect()))
    assert a == b


def test_pq_trained_codebooks_cut_sse(pq_vecs):
    """Lloyd-trained codebooks must reconstruct better than random ones."""
    df, mat = pq_vecs
    rand = S.pq_random_codebooks(8, m=2, ksub=4)
    trained = S.pq_train_codebooks(mat, m=2, ksub=4)
    sse = lambda books: sum(
        r["sse_e6"] for r in S.pq_encode(df, "vec_id", "embedding", books).collect()
    )
    assert sse(trained) < sse(rand)
    import numpy as np
    assert np.array_equal(trained, S.pq_train_codebooks(mat, m=2, ksub=4))


def test_pq_adc_topk_matches_numpy_adc(pq_vecs):
    """ADC scores = exact numpy asymmetric distances over the same codes."""
    import numpy as np

    df, mat = pq_vecs
    books = S.pq_train_codebooks(mat, m=2, ksub=4)
    q = df.filter(F.col("vec_id") < 2)
    got = S.pq_adc_topk(df, q, books, "vec_id", "embedding", k=5).collect()
    codes = _np_codes(mat, books)
    m, ksub, dsub = books.shape
    for r in got:
        qv, cv = mat[r["query_id"]], codes[r["vec_id"]]
        adist = 0.0
        for j in range(m):
            diff = qv[j * dsub : (j + 1) * dsub] - books[j, cv[j]]
            adist += float((diff * diff).sum())
        assert r["adist"] == pytest.approx(adist, rel=1e-12)
        assert r["vec_id"] != r["query_id"]
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["adist"]))
    for ranks in by_q.values():
        ranks.sort()
        assert [x[0] for x in ranks] == list(range(1, 6))
        assert all(ranks[i][1] <= ranks[i + 1][1] for i in range(len(ranks) - 1))


def test_ivf_pq_full_probe_equals_pq_adc(pq_vecs):
    """Probing every list disables pruning: IVF-PQ == plain PQ ADC search."""
    df, mat = pq_vecs
    cent = S.ivf_random_centroids(8, 4)
    books = S.pq_random_codebooks(8, m=2, ksub=4)
    q = df.filter(F.col("vec_id") < 2)
    full = S.ivf_pq_topk(df, q, cent, books, "vec_id", "embedding",
                         n_probe=4, k=5).collect()
    plain = S.pq_adc_topk(df, q, books, "vec_id", "embedding", k=5).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, plain))


def test_ivf_pq_prunes_to_probed_lists(pq_vecs):
    """With n_probe=1 every hit must come from the query's own nearest list."""
    df, mat = pq_vecs
    cent = S.ivf_random_centroids(8, 4)
    books = S.pq_random_codebooks(8, m=2, ksub=4)
    q = df.filter(F.col("vec_id") < 3)
    got = S.ivf_pq_topk(df, q, cent, books, "vec_id", "embedding",
                        n_probe=1, k=5).collect()
    lists = {r["vec_id"]: r["ivf_list"] for r in df.select(
        "vec_id", S.nearest_centroid_expr("embedding", cent).alias("ivf_list")
    ).collect()}
    for r in got:
        assert lists[r["vec_id"]] == lists[r["query_id"]]


def test_ivf_pq_corpus_side_is_pure_codegen(pq_vecs):
    """The corpus encode/assign path must stay JVM-side (no Python eval)."""
    df, _ = pq_vecs
    cent = S.ivf_random_centroids(8, 4)
    books = S.pq_random_codebooks(8, m=2, ksub=4)
    q = df.filter(F.col("vec_id") < 2)
    plan = (
        S.ivf_pq_topk(df, q, cent, books, "vec_id", "embedding", n_probe=2, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_ivf_pq_refine_rescores_exactly(pq_vecs):
    """Refine = ADC candidates → exact cosine re-rank: every reported cos
    equals brute cosine for that pair, and recall@k vs brute ground truth
    is at least plain ADC's (the point of paying the rescore join)."""
    df, mat = pq_vecs
    cent = S.ivf_random_centroids(8, 4)
    books = S.pq_random_codebooks(8, m=2, ksub=4)
    q = df.filter(F.col("vec_id") < 4)
    k = 5
    brute = S.brute_topk(df, q, k=k).collect()
    truth = {}
    brute_cos = {}
    for r in brute:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
        brute_cos[(r["query_id"], r["vec_id"])] = r["cos"]
    refined = S.ivf_pq_refine_topk(
        df, q, cent, books, "vec_id", "embedding",
        n_probe=4, k=k, refine_factor=4,
    ).collect()
    adc = S.ivf_pq_topk(df, q, cent, books, "vec_id", "embedding",
                        n_probe=4, k=k).collect()

    def recall(rows):
        hit = sum(1 for r in rows if r["vec_id"] in truth[r["query_id"]])
        return hit / sum(len(v) for v in truth.values())

    assert recall(refined) >= recall(adc)
    # exactness: reported cos is the true cosine, bit-for-bit vs brute
    for r in refined:
        key = (r["query_id"], r["vec_id"])
        if key in brute_cos:
            assert r["cos"] == brute_cos[key]
    # with refine_factor covering the whole corpus, refine == brute top-k
    full = S.ivf_pq_refine_topk(
        df, q, cent, books, "vec_id", "embedding",
        n_probe=4, k=k, refine_factor=40,
    ).collect()
    assert sorted((r["query_id"], r["rank"], r["vec_id"]) for r in full) == \
        sorted((r["query_id"], r["rank"], r["vec_id"]) for r in brute)


def test_ivf_pq_residual_matches_numpy_adc(pq_vecs):
    """Residual mode (faiss default): corpus codes quantize (vec - its
    list centroid); each query LUT is built from (qvec - probed-list
    centroid).  Verified against an exact numpy mirror."""
    import numpy as np

    df, mat = pq_vecs
    cent = S.ivf_random_centroids(8, 4)
    books = S.pq_random_codebooks(8, m=2, ksub=4)
    q = df.filter(F.col("vec_id") < 2)
    got = S.ivf_pq_topk(df, q, cent, books, "vec_id", "embedding",
                        n_probe=4, k=5, residual=True).collect()
    assert len(got) == 10
    assign = np.argmax(mat @ cent.T, axis=1)
    res = mat - cent[assign]
    codes = _np_codes(res, books)
    m, ksub, dsub = books.shape
    for r in got:
        # query residual vs the CORPUS vector's list (full probe: every
        # list is probed, so the scoring list is the corpus vector's own)
        qres = mat[r["query_id"]] - cent[assign[r["vec_id"]]]
        cv = codes[r["vec_id"]]
        adist = 0.0
        for j in range(m):
            diff = qres[j * dsub : (j + 1) * dsub] - books[j, cv[j]]
            adist += float((diff * diff).sum())
        assert r["adist"] == pytest.approx(adist, rel=1e-12)


def test_centroid_cosine_known_geometry(spark):
    """Hand-checkable centroid pairs: aligned groups → 1, orthogonal → 0,
    a 45° pair → √2/2; doc count and quantization scale cancel (a group
    duplicated 3× keeps every pairwise cosine bit-identical)."""
    rows = (
        [("a", [2.0, 0.0]), ("a", [4.0, 0.0])]      # centroid → +x
        + [("b", [0.0, 1.0]), ("b", [0.0, 3.0])]    # centroid → +y
        + [("c", [5.0, 5.0])]                        # 45°
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        (r["g1"], r["g2"]): (r["n1"], r["n2"], r["cos"])
        for r in S.centroid_cosine(df, "g", "v").collect()
    }
    assert got[("a", "b")][2] == 0.0
    assert got[("a", "b")][:2] == (2, 2)
    assert math.isclose(got[("a", "c")][2], math.sqrt(2) / 2, rel_tol=1e-9)
    assert math.isclose(got[("b", "c")][2], math.sqrt(2) / 2, rel_tol=1e-9)

    tripled = df.unionByName(df.filter("g = 'a'")).unionByName(
        df.filter("g = 'a'")
    )
    got3 = {
        (r["g1"], r["g2"]): r["cos"]
        for r in S.centroid_cosine(tripled, "g", "v").collect()
    }
    assert got3 == {k: v[2] for k, v in got.items()}


# ---------------------------------------------------------------------------
# catalog-persisted IVF index (build once, search from storage)
# ---------------------------------------------------------------------------


@pytest.fixture()
def ivf_catalog(tmp_path):
    from influxer_spark.catalog import TableCatalog

    return TableCatalog(str(tmp_path / "ivfcat"))


def test_ivf_index_search_matches_inmemory(spark, vecs, ivf_catalog):
    """Searching the persisted index is bit-identical to ivf_ann with the
    same centroids — the index only changes WHERE the corpus side comes
    from (pruned stored partitions), never the scores."""
    cent = S.ivf_random_centroids(3, 4)
    S.build_ivf_index(spark, ivf_catalog, vecs, centroids=cent, dim=3, n_lists=4)
    q = vecs.filter(F.col("vec_id") == 0)
    stored = S.ivf_search_index(spark, ivf_catalog, q, n_probe=2, k=5).collect()
    mem = S.ivf_ann(vecs, q, centroids=cent, n_probe=2, k=5).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in mem]


def test_ivf_index_postings_partitioned_by_list(spark, vecs, ivf_catalog):
    """Postings land one committed partition per inverted list, so probing
    n of N lists at query time is manifest-level partition pruning."""
    cent = S.ivf_random_centroids(3, 4)
    lists = S.build_ivf_index(spark, ivf_catalog, vecs, centroids=cent, dim=3, n_lists=4)
    committed = set(ivf_catalog.committed_partitions("ivf_postings"))
    assert committed <= set(lists)
    # every corpus vector is in exactly one committed list
    total = sum(
        spark.read.parquet(p).count()
        for p in ivf_catalog.partition_paths("ivf_postings", sorted(committed))
    )
    assert total == vecs.count()
    assert ivf_catalog.table_property("ivf_postings", "ivf_n_lists") == 4


def test_ivf_index_search_reads_only_probed_lists(spark, vecs, ivf_catalog):
    """n_probe=1 search must only surface candidates from the query's own
    top list — evidence the read is pruned, not a full scan."""
    cent = S.ivf_random_centroids(3, 4)
    S.build_ivf_index(spark, ivf_catalog, vecs, centroids=cent, dim=3, n_lists=4)
    assigned = {
        r["vec_id"]: r["ivf_list"]
        for r in S.with_ivf_list(vecs, "embedding", cent).collect()
    }
    # probe every query in turn so at least one top list has company
    got = S.ivf_search_index(spark, ivf_catalog, vecs, n_probe=1, k=5).collect()
    mem = S.ivf_ann(vecs, vecs, centroids=cent, n_probe=1, k=5).collect()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in mem)
    assert got, "some top list must contain a non-self vector"
    for r in got:
        assert assigned[r["vec_id"]] == assigned[r["query_id"]]


def test_ivfpq_index_search_matches_inmemory(spark, ivf_catalog):
    import numpy as np

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((40, 8))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        ["vec_id", "embedding"],
    )
    cent = S.ivf_random_centroids(8, 4)
    books = S.pq_random_codebooks(8, m=2, ksub=4)
    for residual in (False, True):
        cat_dir = str(ivf_catalog.root) + f"_pq{residual}"
        from influxer_spark.catalog import TableCatalog

        cat = TableCatalog(cat_dir)
        S.build_ivfpq_index(
            spark, cat, vecs, centroids=cent, books=books,
            dim=8, n_lists=4, residual=residual,
        )
        q = vecs.filter(F.col("vec_id") % 10 == 0)
        stored = S.ivfpq_search_index(spark, cat, q, n_probe=2, k=5).collect()
        mem = S.ivf_pq_topk(
            vecs, q, cent, books, n_probe=2, k=5, residual=residual
        ).collect()
        assert [tuple(r) for r in stored] == [tuple(r) for r in mem], residual


def test_ivfpq_postings_store_codes_not_vectors(spark, vecs, ivf_catalog):
    cent = S.ivf_random_centroids(3, 4)
    books = S.pq_random_codebooks(3, m=1, ksub=4)
    S.build_ivfpq_index(
        spark, ivf_catalog, vecs, centroids=cent, books=books, dim=3, n_lists=4
    )
    committed = sorted(ivf_catalog.committed_partitions("ivfpq_postings"))
    post = spark.read.parquet(
        *ivf_catalog.partition_paths("ivfpq_postings", committed)
    )
    assert set(post.columns) == {"vec_id", "ivf_list", "c0"}  # no embedding
    assert post.count() == vecs.count()
    assert ivf_catalog.table_property("ivfpq_postings", "ivfpq_ksub") == 4


def test_ivfpq_extend_equals_rebuild(spark, ivf_catalog):
    """Appending a shard to the stored index must give the same search
    results as building from scratch over the union corpus."""
    import numpy as np

    rng = np.random.default_rng(23)
    mat = rng.standard_normal((30, 8))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    base = spark.createDataFrame(rows[:20], ["vec_id", "embedding"])
    shard = spark.createDataFrame(rows[20:], ["vec_id", "embedding"])
    full = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cent = S.ivf_random_centroids(8, 4)
    books = S.pq_random_codebooks(8, m=2, ksub=4)
    S.build_ivfpq_index(
        spark, ivf_catalog, base, centroids=cent, books=books, dim=8, n_lists=4
    )
    pre = ivf_catalog.current_snapshot("ivfpq_postings")
    S.extend_ivfpq_index(spark, ivf_catalog, shard)
    q = full.filter(F.col("vec_id") % 10 == 0)
    got = S.ivfpq_search_index(spark, ivf_catalog, q, n_probe=4, k=5).collect()
    mem = S.ivf_pq_topk(full, q, cent, books, n_probe=4, k=5).collect()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in mem)
    # the pre-extend snapshot still serves the base-only index (time travel)
    assert ivf_catalog.current_snapshot("ivfpq_postings") != pre


def test_stream_ivfpq_resume_and_idempotent_replay(spark, tmp_path):
    """Stop/resume + marker idempotency: draining the same input twice
    must not double-append, and the resumed index equals a batch build."""
    import glob
    import os
    import shutil

    import numpy as np

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.streaming import run_incremental_ivfpq

    rng = np.random.default_rng(31)
    mat = rng.standard_normal((24, 8))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    full = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cent = S.ivf_random_centroids(8, 4)
    books = S.pq_random_codebooks(8, m=2, ksub=4)
    cat = TableCatalog(str(tmp_path / "cat"))
    S.build_ivfpq_index(
        spark, cat, full.filter(F.lit(False)), centroids=cent, books=books,
        dim=8, n_lists=4,
    )
    inp = tmp_path / "input"
    inp.mkdir()
    ckpt = str(tmp_path / "ckpt")
    for name, part in (
        ("a", full.filter(F.col("vec_id") < 12)),
        ("b", full.filter(F.col("vec_id") >= 12)),
    ):
        staging = str(tmp_path / "stage" / name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        shutil.copy(
            glob.glob(os.path.join(staging, "part-*.parquet"))[0],
            str(inp / f"{name}.parquet"),
        )
        run_incremental_ivfpq(spark, str(inp), full.schema, cat, ckpt)
    # a third drain with no new files must be a no-op (markers + offsets)
    run_incremental_ivfpq(spark, str(inp), full.schema, cat, ckpt)
    committed = sorted(cat.committed_partitions("ivfpq_postings"))
    n = sum(
        spark.read.parquet(p).count()
        for p in cat.partition_paths("ivfpq_postings", committed)
    )
    assert n == 24  # every vector exactly once — no double-append
    q = full.filter(F.col("vec_id") % 6 == 0)
    got = S.ivfpq_search_index(spark, cat, q, n_probe=4, k=5).collect()
    mem = S.ivf_pq_topk(full, q, cent, books, n_probe=4, k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, mem))


def test_ivfpq_search_empty_index_fails_loudly(spark, tmp_path, vecs):
    from influxer_spark.catalog import TableCatalog

    cat = TableCatalog(str(tmp_path / "cat"))
    S.build_ivfpq_index(
        spark, cat, vecs.filter(F.lit(False)),
        centroids=S.ivf_random_centroids(3, 4),
        books=S.pq_random_codebooks(3, m=1, ksub=4), dim=3, n_lists=4,
    )
    with pytest.raises(FileNotFoundError, match="no postings"):
        S.ivfpq_search_index(spark, cat, vecs, n_probe=2, k=3)


def test_ivfpq_extend_is_upsert_on_vec_id(spark, tmp_path):
    """Re-extending with an already-committed shard must not double rows
    (the foreachBatch at-least-once edge), and a re-crawled vector that
    stays in its list is REPLACED, not duplicated."""
    import numpy as np

    from influxer_spark.catalog import TableCatalog

    rng = np.random.default_rng(37)
    mat = rng.standard_normal((16, 8))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    full = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cent = S.ivf_random_centroids(8, 4)
    books = S.pq_random_codebooks(8, m=2, ksub=4)
    cat = TableCatalog(str(tmp_path / "cat"))
    S.build_ivfpq_index(
        spark, cat, full, centroids=cent, books=books, dim=8, n_lists=4
    )
    S.extend_ivfpq_index(spark, cat, full.filter(F.col("vec_id") < 8))
    committed = sorted(cat.committed_partitions("ivfpq_postings"))
    n = sum(
        spark.read.parquet(p).count()
        for p in cat.partition_paths("ivfpq_postings", committed)
    )
    assert n == 16  # replay replaced, never appended
    q = full.filter(F.col("vec_id") % 5 == 0)
    got = S.ivfpq_search_index(spark, cat, q, n_probe=4, k=5).collect()
    mem = S.ivf_pq_topk(full, q, cent, books, n_probe=4, k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, mem))


def test_sq8_topk_codes_and_ranking(vecs):
    """SQ8 ranking agrees with a numpy replay of the exact quantization
    rule, dot_int is the exact integer code dot, and the zero vector is
    excluded from the corpus side."""
    import numpy as np

    rows = vecs.collect()
    base = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    base[9] = np.zeros(3)
    df = vecs.sparkSession.createDataFrame(
        [(k, v.tolist()) for k, v in base.items()], ["vec_id", "embedding"]
    )

    def codes(x):
        mx = np.abs(x).max()
        if mx <= 0:
            return np.zeros_like(x, dtype=np.int64)
        return np.floor(x / (mx / 127.0) + 0.5).astype(np.int64)

    q = df.filter(F.col("vec_id") == 0)
    got = S.sq8_topk(df, q, k=10).collect()
    got = sorted(got, key=lambda r: r["rank"])
    # zero vector never appears
    assert all(r["vec_id"] != 9 for r in got)
    # replay expected scores
    qc = codes(base[0])
    exp = []
    for vid, vec in base.items():
        if vid == 0:
            continue
        cc = codes(vec)
        if not cc.any():
            continue
        d = int((qc * cc).sum())
        cos8 = d / (math.sqrt(float((qc * qc).sum())) * math.sqrt(float((cc * cc).sum())))
        exp.append((vid, d, cos8))
    exp.sort(key=lambda t: (-t[2], t[0]))
    assert [(r["vec_id"], r["dot_int"]) for r in got] == [(v, d) for v, d, _ in exp]
    for r, (_, _, cos8) in zip(got, exp):
        assert r["cos8"] == pytest.approx(cos8, abs=0)  # bit-exact


def test_sq8_topk_matches_brute_on_separated_clusters(vecs):
    """On well-separated directions the 8-bit quantization cannot reorder
    the top-1 neighbor vs the exact float scan."""
    q = vecs.filter(F.col("vec_id") == 0)
    brute1 = {r["query_id"]: r["vec_id"]
              for r in S.brute_topk(vecs, q, k=1).collect()}
    sq1 = {r["query_id"]: r["vec_id"] for r in S.sq8_topk(vecs, q, k=1).collect()}
    assert sq1 == brute1
