"""Text functions + dedup operators: hand-checkable unit cases (the
Spark-vs-DuckDB equivalence is covered by test_entry_contract)."""

import pytest
from pyspark.sql import functions as F

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions import (
    text as T,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators import (
    dedup,
    similarity,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokens_and_counts(spark):
    df = _docs(spark, [(1, "  Hello   world  "), (2, ""), (3, "a"), (4, "   ")])
    out = {r.doc_id: (r.n, r.toks) for r in df.select(
        "doc_id", T.token_count(F.col("text")).alias("n"), T.tokens(F.col("text")).alias("toks")
    ).collect()}
    assert out[1] == (2, ["hello", "world"])
    assert out[2] == (0, [])
    assert out[3] == (1, ["a"])
    assert out[4] == (0, [])


def test_word_ngrams(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a"), (3, "")])
    out = {r.doc_id: r.g for r in df.select("doc_id", T.word_ngrams(F.col("text"), 2).alias("g")).collect()}
    assert out[1] == ["a b", "b c", "c d"]
    assert out[2] == []
    assert out[3] == []


def test_lang_id_heuristic(spark):
    df = _docs(spark, [
        (1, "the cat and the dog in a house"),
        (2, "der hund und die katze ist nicht da"),
        (3, "el perro y la casa de que es"),
        (4, "le chien et la maison dans les arbres est"),
        (5, "这是 中文 文本"),
        (6, "xyzzy plugh"),
    ])
    out = {r.doc_id: r.lang for r in df.select("doc_id", T.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "es"
    assert out[4] == "fr" and out[5] == "zh" and out[6] == "und"


def test_fingerprint_normalization_invariance(spark):
    df = _docs(spark, [(1, "Hello  World"), (2, "hello world"), (3, "hello worlds")])
    fp = {r.doc_id: r.fp for r in df.select("doc_id", T.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_exact_duplicates(spark):
    df = _docs(spark, [
        (1, "Same   Text"), (2, "same text"), (3, "unique"), (4, "SAME TEXT "),
    ])
    out = {(r.doc_id, r.canonical_id, r.group_size) for r in dedup.exact_duplicates(df).collect()}
    assert out == {(1, 1, 3), (2, 1, 3), (4, 1, 3)}


def test_ngram_jaccard_exact_contract(spark):
    df = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different words here entirely"),
    ])
    out = dedup.ngram_jaccard_duplicates(df, threshold=0.5, n=2).collect()
    pairs = {(r.a_id, r.b_id): r.jaccard for r in out}
    assert set(pairs) == {(1, 2)}
    # shingles: 8 each, 7 shared (all but "lazy dog"/"lazy cat") -> J = 7/9
    assert abs(pairs[(1, 2)] - 7.0 / 9.0) < 1e-12


def test_ngram_scratch_modes_identical(spark, monkeypatch):
    """The size-adaptive scratch materialization (persist vs eager
    localCheckpoint, dedup._small_input) must be output-invariant: force
    each path via the threshold env and compare full rows."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def run():
        return sorted(
            (r.a_id, r.b_id, round(r.jaccard, 12))
            for r in dedup.ngram_jaccard_duplicates(docs, threshold=0.8).collect()
        )

    monkeypatch.setenv("SPARK_GRAFT_DEDUP_SMALL_BYTES", str(1 << 60))
    small_rows = run()
    monkeypatch.setenv("SPARK_GRAFT_DEDUP_SMALL_BYTES", "0")
    large_rows = run()
    assert small_rows == large_rows and small_rows


def test_minhash_lsh_finds_near_dupes(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    df = _docs(spark, [
        (1, base), (2, base + "lambda mu"), (3, "totally unrelated content " * 5),
    ])
    out = {(r.a_id, r.b_id) for r in dedup.minhash_lsh_duplicates(df, threshold=0.5).collect()}
    assert (1, 2) in out
    assert all(3 not in p for p in out)


def test_minhash_equals_exact_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lsh = {(r.a_id, r.b_id) for r in dedup.minhash_lsh_duplicates(docs, threshold=0.8).collect()}
    exact = {(r.a_id, r.b_id) for r in dedup.ngram_jaccard_duplicates(docs, threshold=0.8).collect()}
    assert lsh == exact


def test_simhash_identical_docs_distance_zero(spark):
    df = _docs(spark, [(1, "w1 w2 w3 w4 w5 w6"), (2, "w1 w2 w3 w4 w5 w6"), (3, "q1 q2 q3 q4 q5 q6")])
    out = {(r.a_id, r.b_id): r.hamming for r in dedup.simhash_duplicates(df, hamming_max=3).collect()}
    assert out.get((1, 2)) == 0
    assert (1, 3) not in out and (2, 3) not in out


def test_simhash_lane_overflow_raises(spark, monkeypatch):
    # a doc with >= 2^lane tokens would silently carry into the adjacent
    # packed lane; the guard must raise instead.  Shrink the lane to 2 bits
    # so 4 tokens already overflow (full-width would need 2M tokens).
    monkeypatch.setattr(dedup, "_SIMHASH_LANE", 2)
    df = _docs(spark, [(1, "t1 t2 t3 t4 t5")])
    with pytest.raises(Exception, match="packed-lane overflow"):
        dedup.simhash(df).collect()
    # under the cap (3 tokens < 4) the guard stays silent
    ok = _docs(spark, [(2, "t1 t2 t3")])
    assert dedup.simhash(ok).count() == 1


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [0.7, 0.7]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(df, [0], k=3)
    got = [(r.neighbor_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got == [(1, 1), (3, 2), (2, 3)]


def test_lsh_topk_subset_of_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = similarity.cosine_topk(emb, [0, 1], k=5).collect()
    approx = similarity.lsh_topk(emb, [0, 1], k=5, dim=64).collect()
    exact_pairs = {(r.query_id, r.neighbor_id, r.dot) for r in exact}
    # every approx hit must carry the exact dot score computed brute-force
    dots = {(r.query_id, r.neighbor_id): r.dot for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in dots:
            assert dots[(r.query_id, r.neighbor_id)] == r.dot


def test_ivf_topk_full_probe_equals_exact(spark):
    # probing every cell makes the candidate set the whole corpus, so the
    # IVF result must equal the exact brute-force top-k (same tie-breaks)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = similarity.cosine_topk(emb, [0, 1, 2], k=5).collect()
    ivf = similarity.ivf_topk(
        emb, [0, 1, 2], k=5, n_centroids=8, n_probe=8
    ).collect()
    want = {(r.query_id, r.neighbor_id, r.rank, r.dot) for r in exact}
    got = {(r.query_id, r.neighbor_id, r.rank, r.dot) for r in ivf}
    assert got == want


def test_ivf_topk_partial_probe_hits_carry_exact_dots(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id): r.dot
        for r in similarity.cosine_topk(emb, [0, 1], k=5).collect()
    }
    approx = similarity.ivf_topk(emb, [0, 1], k=5, n_centroids=16, n_probe=4)
    for r in approx.collect():
        if (r.query_id, r.neighbor_id) in exact:
            assert exact[(r.query_id, r.neighbor_id)] == r.dot
    with pytest.raises(ValueError):
        similarity.ivf_topk(emb, [0], n_centroids=4, n_probe=5)


def test_embedding_duplicates_blocked_is_subset(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r.a_id, r.b_id) for r in similarity.embedding_duplicates(emb, threshold=0.8, blocked=False).collect()}
    blocked = {(r.a_id, r.b_id) for r in similarity.embedding_duplicates(emb, threshold=0.8, blocked=True).collect()}
    assert blocked <= exact


def test_embedding_duplicates_banded_finds_planted_dupes(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, 64)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(30)]
    # plant near-duplicates: tiny perturbations of rows 0..4 (cosine ~0.999)
    for j in range(5):
        v = base[j] + rng.normal(scale=0.01, size=64).astype(np.float32)
        rows.append((100 + j, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.a_id, r.b_id) for r in similarity.embedding_duplicates(
        df, threshold=0.95, blocked=False).collect()}
    blocked = {(r.a_id, r.b_id) for r in similarity.embedding_duplicates(
        df, threshold=0.95, blocked=True).collect()}
    assert {(j, 100 + j) for j in range(5)} <= exact
    assert blocked == exact  # miss prob ~3e-6 at s=0.95
    # the blocked plan must not contain a cartesian/nested-loop join
    plan = similarity.embedding_duplicates(df, threshold=0.95)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_lsh_plane_family_full_rank():
    # regression: the old linear family ((p*67 + d*31) % 19 - 9) depended
    # on p only mod 19, collapsing all r*b planes to 19 distinct ones and
    # silently voiding the banded miss-probability math
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.similarity import (
        _plane,
    )

    planes = [tuple(_plane(p, 64)) for p in range(12 * 64)]
    assert len(set(planes)) == len(planes)
    flat = [c for pl in planes for c in pl]
    assert min(flat) == -9 and max(flat) == 9
    assert abs(sum(flat) / len(flat)) < 0.1  # zero-mean family


def test_embedding_duplicates_recall_near_threshold(spark):
    # non-vacuous recall at the interesting regime: true pairs with cosine
    # straddling the 0.9 threshold (not ~0.999 like the planted-dupe test).
    # With full-rank planes the per-pair miss prob at s>=0.90 is ~2e-5;
    # the fixture is deterministic, so blocked == exact must hold exactly.
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].astype(np.float32).tolist()) for i in range(40)]
    for j in range(20):
        b = 0.030 + 0.0025 * j  # cosine sweeps ~0.98 down through ~0.86
        v = (base[j] + b).astype(np.float32)
        rows.append((100 + j, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.a_id, r.b_id)
        for r in similarity.embedding_duplicates(
            df, threshold=0.9, blocked=False
        ).collect()
    }
    blocked = {
        (r.a_id, r.b_id)
        for r in similarity.embedding_duplicates(
            df, threshold=0.9, blocked=True
        ).collect()
    }
    planted = {(j, 100 + j) for j in range(20)}
    kept = exact & planted
    # the sweep must actually straddle the threshold on both sides
    assert 5 <= len(kept) <= 18
    assert blocked == exact


def test_duplicate_groups_transitive(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.dedup import (
        duplicate_groups,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 5), (3, 2)],  # chain, pair, self, dup edge
        "a_id long, b_id long",
    )
    got = {(r.doc_id, r.group_id) for r in duplicate_groups(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_dedup_membership_and_apply(spark):
    """Materialized dedup: per-doc keep/drop verdict over the transitive
    closure, and the surviving-corpus join (round-5 verdict #2)."""
    docs = _docs(
        spark,
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 10, 11)],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a_id long, b_id long"
    )
    m = {
        r.doc_id: (r.group_id, r.kept, r.n_dropped)
        for r in dedup.dedup_membership(docs, pairs).collect()
    }
    assert m == {
        1: (1, True, 2),
        2: (1, False, 0),
        3: (1, False, 0),
        7: (7, True, 0),   # no duplicates: own group, nothing dropped
        10: (10, True, 1),
        11: (10, False, 0),
    }
    surv = dedup.apply_dedup(docs, pairs).collect()
    assert {r.doc_id for r in surv} == {1, 7, 10}
    assert {r.doc_id: r.n_dropped for r in surv} == {1: 2, 7: 0, 10: 1}
    # survivors keep the full original row
    assert {r.text for r in surv} == {"doc 1", "doc 7", "doc 10"}


def test_dedup_membership_quality_policy(spark):
    """score_col keeps the highest-scoring member (min-id tie-break)
    instead of the min id — the longest/highest-quality-survivor policy
    real pipelines run (r07)."""
    from pyspark.sql import functions as F

    docs = _docs(
        spark, [(i, f"doc {i}") for i in (1, 2, 3, 7, 10, 11)]
    ).withColumn(
        "score",
        # group {1,2,3}: best is 3; group {10,11}: tie -> min id 10
        F.element_at(
            F.create_map(
                F.lit(1), F.lit(5), F.lit(2), F.lit(4), F.lit(3), F.lit(9),
                F.lit(7), F.lit(0), F.lit(10), F.lit(2), F.lit(11), F.lit(2),
            ),
            F.col("doc_id").cast("int"),
        ),
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a_id long, b_id long"
    )
    m = {
        r.doc_id: (r.group_id, r.kept, r.n_dropped)
        for r in dedup.dedup_membership(docs, pairs, score_col="score").collect()
    }
    assert m == {
        1: (1, False, 0),
        2: (1, False, 0),
        3: (1, True, 2),   # highest score wins over min id
        7: (7, True, 0),
        10: (10, True, 1),  # score tie -> min id
        11: (10, False, 0),
    }
    surv = dedup.apply_dedup(docs, pairs, score_col="score").collect()
    assert {r.doc_id for r in surv} == {3, 7, 10}


def test_bpe_token_count_hand_cases(spark):
    # "hello" = 1 run of 5 -> ceil(5/4) = 2 pieces; "world!" -> run(5)=2 + '!'=1
    # "12345678" -> ceil(8/4) = 2; CJK chars cost 1 each; empty -> 0
    df = _docs(spark, [
        (1, "hello"),
        (2, "world!"),
        (3, "12345678"),
        (4, "你好"),
        (5, ""),
        (6, "a b  c"),
    ])
    out = {r.doc_id: r.n for r in df.select(
        "doc_id", T.bpe_token_count(F.col("text")).alias("n")
    ).collect()}
    assert out == {1: 2, 2: 3, 3: 2, 4: 2, 5: 0, 6: 3}


def test_ivf_topk_corpus_smaller_than_codebook(spark):
    # fewer corpus vectors than n_centroids: the codebook is just the whole
    # corpus and every point is its own cell; results must still be exact
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.ivf_topk(df, [0], k=2, n_centroids=8, n_probe=8)
    got = [(r.neighbor_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got == [(1, 1), (2, 2)]


def test_pii_counts_hand_cases(spark):
    rows = [
        (1, "mail a.b+c@ex-ample.co.uk and x@y.io twice"),
        (2, "call 555-867-5309 or 555-123-4567"),
        (3, "host 192.168.1.255 ok, not 1234.1.1.1"),
        (4, "ssn 078-05-1120 but phone 555-867-5309 is not an ssn"),
        (5, "clean text with no pii at all"),
    ]
    df = _docs(spark, rows).select(
        "doc_id",
        T.pii_count(F.col("text"), "email").alias("e"),
        T.pii_count(F.col("text"), "ipv4").alias("i"),
        T.pii_count(F.col("text"), "phone").alias("p"),
        T.pii_count(F.col("text"), "ssn").alias("s"),
    )
    got = {r["doc_id"]: (r["e"], r["i"], r["p"], r["s"]) for r in df.collect()}
    assert got[1] == (2, 0, 0, 0)
    assert got[2] == (0, 0, 2, 0)
    # '1234.1.1.1' has no match: \b sits before '1234', \d{1,3} can take
    # at most '123' and then requires '.', so every start position fails
    # — only the real 192.168.1.255 counts
    assert got[3] == (0, 1, 0, 0)
    assert got[4] == (0, 0, 1, 1)
    assert got[5] == (0, 0, 0, 0)


def test_scrub_pii_replaces_all_and_is_idempotent(spark):
    df = _docs(
        spark,
        [(1, "a@b.co saw 10.0.0.1 call 555-867-5309 ssn 078-05-1120 end")],
    )
    once = df.select(T.scrub_pii(F.col("text")).alias("t"))
    out = once.collect()[0]["t"]
    assert out == "[PII] saw [PII] call [PII] ssn [PII] end"
    twice = once.select(T.scrub_pii(F.col("t")).alias("t")).collect()[0]["t"]
    assert twice == out


def test_line_quality_hand_cases(spark):
    """Gopher line rules: hand-computed fractions on a crafted doc."""
    text = "plain first line\n- bullet one\n  * bullet two\ncliff...\n### x #"
    df = _docs(spark, [(1, text), (2, ""), (3, "no newline here")])
    c = F.col("text")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            T.n_lines(c).alias("nl"),
            T.mean_line_len(c).alias("mll"),
            T.bullet_line_frac(c).alias("bf"),
            T.ellipsis_line_frac(c).alias("ef"),
            T.symbol_word_ratio(c).alias("sw"),
        ).collect()
    }
    r1 = out[1]
    assert r1.nl == 5
    # lines: 16, 12, 14, 8, 7 chars -> 57/5
    assert r1.mll == 57 / 5
    assert r1.bf == 2 / 5 and r1.ef == 1 / 5
    # 4 '#' + 1 '...' over 13 whitespace tokens
    # (plain first line - bullet one * bullet two cliff... ### x #)
    assert r1.sw == 5 / 13
    # empty doc: one empty line, all-zero signals (no div-by-zero)
    r2 = out[2]
    assert (r2.nl, r2.mll, r2.bf, r2.ef, r2.sw) == (1, 0.0, 0.0, 0.0, 0.0)
    assert out[3].nl == 1 and out[3].mll == 15.0


def test_text_module_imports_without_pandas_at_module_scope():
    """ADVICE r05: pandas must be a lazy dependency of functions/text.py —
    the codegen-only functions import without it."""
    import importlib
    import sys

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions import (
        text as tmod,
    )

    src = open(tmod.__file__).read().replace(".pyc", ".py")
    assert "\nimport pandas" not in src and "\nfrom pandas" not in src
    # and the vectorized factory still resolves its Arrow hints
    assert tmod.token_ngrams_vec(2) is not None


def test_minhash_numpy_matches_aggregate_formula(spark):
    """The Arrow/numpy signature path must reproduce the per-seed
    aggregate formula min((a*pmod(h,p)+b) mod p) bit-for-bit over the
    SAME gram-hash basis — guards the vectorized rewrite against drift."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.dedup import (
        MINHASH_PRIME,
        MINHASH_SEEDS,
        _gram_hashes,
        minhash_signatures,
    )

    docs = _docs(
        spark,
        [(1, "a b c d e f"), (2, "b c d e"), (3, ""), (4, "one-token")],
    )
    got = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs, num_hashes=8).collect()
    }
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MINHASH_PRIME))).alias(f"s{i}")
        for i, (a, b) in enumerate(MINHASH_SEEDS[:8])
    ]
    ref = (
        _gram_hashes(docs, "text", 2)
        .select("doc_id", F.explode("gh").alias("g"))
        .select("doc_id", F.pmod(F.col("g"), F.lit(MINHASH_PRIME)).alias("h"))
        .groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[f"s{i}" for i in range(8)]).alias("sig"))
    )
    expected = {r["doc_id"]: list(r["sig"]) for r in ref.collect()}
    for k, v in expected.items():
        assert got[k] == v, k
    # shingle-less docs carry an EMPTY signature (excluded from banding)
    assert got[3] == [] and got[4] == []


def test_gram_hash_basis_matches_string_shingles(spark):
    """The int64 gram-hash basis must induce the SAME distinct-gram
    set sizes as the string-shingle basis the verify stage uses — the
    exact-Jaccard contract depends on both sides agreeing on what a
    distinct n-gram is (hash collisions aside, 2^-64 per gram pair)."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.dedup import (
        _gram_hashes,
        _shingles,
    )

    docs = _docs(
        spark,
        [
            (1, "a b a b a b"),          # repeated grams collapse
            (2, "x y z x y"),
            (3, ""),
            (4, "solo"),
            (5, "a b c d e f g h"),
        ],
    )
    ns = {
        r["doc_id"]: r["k"]
        for r in _gram_hashes(docs, "text", 2)
        .select("doc_id", F.size("gh").alias("k"))
        .collect()
    }
    nh = {
        r["doc_id"]: r["k"]
        for r in _shingles(docs, "text", 2)
        .select("doc_id", F.size("sh").alias("k"))
        .collect()
    }
    assert ns == nh


def test_band_fold_matches_python_reference(spark):
    """The fused in-batch band fold must equal an independent python
    reimplementation over the signatures the public API returns —
    pins the (band, bh) key derivation the stored-table contract
    depends on."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.dedup import (
        _BF_GOLD,
        _BF_M1,
        _BF_M2,
        minhash_band_table,
        minhash_signatures,
    )

    m64 = (1 << 64) - 1

    def mix(x):
        x &= m64
        x = ((x ^ (x >> 30)) * _BF_M1) & m64
        x = ((x ^ (x >> 27)) * _BF_M2) & m64
        return x ^ (x >> 31)

    docs = _docs(
        spark, [(1, "a b c d e f g h i"), (2, "b c d e"), (3, "")]
    )
    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs, num_hashes=8).collect()
    }
    got = {
        (r["doc_id"], r["band"]): r["bh"]
        for r in minhash_band_table(
            docs, num_hashes=8, bands=4, stamp=False
        ).collect()
    }
    want = {}
    for d, sig in sigs.items():
        if not sig:  # shingle-less docs emit no band rows
            continue
        for band in range(4):
            acc = _BF_GOLD
            for k, v in enumerate(sig[band * 2 : band * 2 + 2]):
                acc = mix(acc ^ ((v + k * _BF_GOLD) & m64))
            # uint64 -> int64 two's-complement view
            want[(d, band)] = acc - (1 << 64) if acc >= (1 << 63) else acc
    assert got == {k: v for k, v in want.items()}
    assert (1, 0) in got and all((3, b) not in got for b in range(4))


def test_pair_dot_null_vector_yields_null_dot(spark):
    """Advice-r06: a single NULL embedding in a scoring batch must yield
    a NULL dot for that row, not fail the whole Arrow batch (np.vstack
    on a None raises) — matching the _dot expression semantics it
    replaced."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.similarity import (
        _pair_dot,
    )

    rows = [
        (1, [1, 2, 3], [4, 5, 6]),      # 32
        (2, None, [1, 1, 1]),            # null left
        (3, [2, 2, 2], None),            # null right
        (4, [10, 0, -1], [1, 1, 1]),     # 9
        (5, None, None),                 # both null
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<bigint>, b array<bigint>"
    )
    got = {
        r["id"]: r["dot"]
        for r in df.select("id", _pair_dot("a", "b").alias("dot")).collect()
    }
    assert got == {1: 32, 2: None, 3: None, 4: 9, 5: None}


def test_pair_dot_all_null_batch(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.similarity import (
        _pair_dot,
    )

    df = spark.createDataFrame(
        [(1, None, None), (2, None, None)],
        "id long, a array<bigint>, b array<bigint>",
    )
    got = [
        r["dot"] for r in df.select(_pair_dot("a", "b").alias("dot")).collect()
    ]
    assert got == [None, None]


# ---------------------------------------------------------------- incremental
def _split_corpus(spark):
    """sf0.001 documents split into a base corpus and a 'new shard' the
    way an ingest pipeline would see them (disjoint, union = corpus)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.filter("doc_id % 4 != 3"), docs.filter("doc_id % 4 = 3"), docs


def test_incremental_duplicates_equals_from_scratch_restriction(spark):
    """incremental_duplicates (stored base bands + new-shard probe) must
    produce EXACTLY the from-scratch union pairs that touch a new doc."""
    base, new, union = _split_corpus(spark)
    bands = dedup.minhash_band_table(base)
    inc = {
        (r.a_id, r.b_id)
        for r in dedup.incremental_duplicates(new, base, bands, threshold=0.8).collect()
    }
    scratch = dedup.minhash_lsh_duplicates(union, threshold=0.8)
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    want = {
        (r.a_id, r.b_id)
        for r in scratch.collect()
        if r.a_id in new_ids or r.b_id in new_ids
    }
    assert inc == want
    assert inc, "sf0.001 split produced no cross/new pairs — test is vacuous"


def test_dedup_incremental_equals_from_scratch_union(spark):
    """The full incremental verdict (base snapshot + new shard) must equal
    dedup_membership recomputed from scratch over the union — same groups,
    same representatives, same drop counts, one row per union doc."""
    base, new, union = _split_corpus(spark)
    base_pairs = dedup.minhash_lsh_duplicates(base, threshold=0.8)
    base_m = dedup.dedup_membership(base, base_pairs)
    bands = dedup.minhash_band_table(base)
    new_pairs = dedup.incremental_duplicates(new, base, bands, threshold=0.8)
    inc = dedup.dedup_incremental(base_m, new, new_pairs)

    union_pairs = dedup.minhash_lsh_duplicates(union, threshold=0.8)
    want = dedup.dedup_membership(union, union_pairs)
    key = lambda r: (r.doc_id, r.group_id, r.kept, r.n_dropped)  # noqa: E731
    assert sorted(map(key, inc.collect())) == sorted(map(key, want.collect()))


def test_dedup_incremental_merges_two_base_groups(spark):
    """A new doc bridging two pre-existing base groups must merge them
    under the global min-id label and move n_dropped to the new rep."""
    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    text_b = "one two three four five six seven eight"
    base = _docs(spark, [
        (1, text_a), (2, text_a),            # base group {1,2} label 1
        (10, text_b), (11, text_b),          # base group {10,11} label 10
        (20, "lonely unique doc with its own words"),
    ])
    # the bridge doc is near-dup of BOTH groups' texts: half a / half b
    # won't clear jaccard 0.8, so use explicit pairs instead of minhash
    base_pairs = dedup.minhash_lsh_duplicates(base, threshold=0.8)
    base_m = dedup.dedup_membership(base, base_pairs)
    new = _docs(spark, [(5, text_a)])
    new_pairs = spark.createDataFrame(
        [(1, 5, 1.0), (5, 10, 1.0)], "a_id long, b_id long, jaccard double"
    ).select("a_id", "b_id", "jaccard")
    out = {r.doc_id: (r.group_id, r.kept, r.n_dropped)
           for r in dedup.dedup_incremental(base_m, new, new_pairs).collect()}
    assert out[1] == (1, True, 4)   # global rep absorbs 2,5,10,11
    assert out[2] == (1, False, 0)
    assert out[5] == (1, False, 0)
    assert out[10] == (1, False, 0)
    assert out[11] == (1, False, 0)
    assert out[20] == (20, True, 0)
    assert len(out) == 6


def test_dedup_membership_quality_policy_requires_numeric_id(spark):
    docs = spark.createDataFrame(
        [("a", "x y z", 3)], "doc_id string, text string, q int"
    )
    pairs = spark.createDataFrame([], "a_id string, b_id string")
    with pytest.raises(ValueError, match="numeric"):
        dedup.dedup_membership(docs, pairs, score_col="q")


def test_pair_dot_empty_batch():
    """An empty Arrow batch must return an empty series, not raise from
    np.vstack([]) (round-7 advice)."""
    import pandas as pd

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.similarity import (
        _pair_dot,
    )

    out = _pair_dot.func(pd.Series([], dtype=object), pd.Series([], dtype=object))
    assert len(out) == 0


def test_minhash_band_family_independence():
    """Band-miss probability guard (round-8 finding): the structured
    (2i+1, 7i+3) seed family produced CORRELATED band agreements and
    missed J=0.902 pairs at ~4.5e-4 (7 of 24,000 planted pairs in the 1M
    bench corpus) — 11 orders of magnitude off the independent-bands
    math.  The mixed family must show zero misses on 2,000 simulated
    member-pair-shaped set pairs (37 shared + 2 unique hashes each); a
    regression to any structured family fails this within a few runs."""
    import numpy as np

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.dedup import (
        MINHASH_PRIME,
        MINHASH_SEEDS,
    )

    rng = np.random.default_rng(12345)
    a = np.array([s[0] for s in MINHASH_SEEDS], dtype=np.int64)[:, None]
    b = np.array([s[1] for s in MINHASH_SEEDS], dtype=np.int64)[:, None]
    misses = 0
    for _ in range(2000):
        shared = rng.integers(0, MINHASH_PRIME, 37)
        u1 = rng.integers(0, MINHASH_PRIME, 2)
        u2 = rng.integers(0, MINHASH_PRIME, 2)
        sa = ((a * np.concatenate([shared, u1])[None, :] + b) % MINHASH_PRIME).min(axis=1)
        sb = ((a * np.concatenate([shared, u2])[None, :] + b) % MINHASH_PRIME).min(axis=1)
        if not (sa == sb).reshape(32, 4).all(axis=1).any():
            misses += 1
    assert misses == 0


def test_dedup_incremental_no_new_pairs(spark):
    """A shard with no duplicates at all: every base verdict passes
    through unchanged and every new doc is its own kept singleton."""
    base = _docs(spark, [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ee"), (3, "zz yy xx ww vv")])
    base_pairs = dedup.minhash_lsh_duplicates(base, threshold=0.8)
    base_m = dedup.dedup_membership(base, base_pairs)
    new = _docs(spark, [(10, "totally different words here now"), (11, "another unique document text")])
    empty_pairs = spark.createDataFrame([], "a_id long, b_id long, jaccard double")
    out = {r.doc_id: (r.group_id, r.kept, r.n_dropped)
           for r in dedup.dedup_incremental(base_m, new, empty_pairs).collect()}
    assert out[1] == (1, True, 1)
    assert out[2] == (1, False, 0)
    assert out[3] == (3, True, 0)
    assert out[10] == (10, True, 0)
    assert out[11] == (11, True, 0)
    assert len(out) == 5


def test_incremental_rejects_stale_band_table(spark):
    """A stored band table built under a different seed family/params
    must fail loudly at probe time, not silently match nothing."""
    base, new, _ = _split_corpus(spark)
    bands = dedup.minhash_band_table(base)
    stale = bands.withColumn("sig_v", F.col("sig_v") + 1)
    with pytest.raises(ValueError, match="fingerprint"):
        dedup.incremental_duplicates(new, base, stale, threshold=0.8).count()
    # unstamped tables pass through (caller-managed versioning)
    ok = dedup.incremental_duplicates(
        new, base, bands.drop("sig_v"), threshold=0.8
    )
    assert ok.count() > 0


def test_incremental_rejects_mixed_era_band_table(spark):
    """A band table APPENDED to across a parameter change holds mixed
    sig_v eras; validation must catch it even when a sampled row would
    have been current-era (the one-row limit(1) check this replaced
    passed such tables and silently lost stale-era candidates)."""
    base, new, _ = _split_corpus(spark)
    bands = dedup.minhash_band_table(base)
    mixed = bands.unionByName(
        bands.limit(3).withColumn("sig_v", F.col("sig_v") - 7)
    )
    with pytest.raises(ValueError, match="fingerprint"):
        dedup.incremental_duplicates(new, base, mixed, threshold=0.8).count()


def test_dedup_incremental_rejects_quality_snapshot(spark):
    """A quality-policy (score_col) snapshot can't be folded: the fold
    relabels with component-min ids and would flip representatives."""
    text = "aa bb cc dd ee ff gg hh"
    base = spark.createDataFrame(
        [(1, text, 1), (2, text, 9)], "doc_id long, text string, q int"
    )
    pairs = spark.createDataFrame(
        [(1, 2, 1.0)], "a_id long, b_id long, jaccard double"
    )
    base_m = dedup.dedup_membership(base, pairs, score_col="q")  # rep = 2
    new = _docs(spark, [(10, "unique text entirely")])
    empty = spark.createDataFrame([], "a_id long, b_id long, jaccard double")
    with pytest.raises(ValueError, match="min-id-policy"):
        dedup.dedup_incremental(base_m, new, empty)
    # the min-id snapshot folds fine
    ok_m = dedup.dedup_membership(base.select("doc_id", "text"), pairs)
    out = dedup.dedup_incremental(ok_m, new, empty)
    assert out.count() == 3


def test_minhash_family_string_doc_ids(spark):
    """Round-8 regression guard: the fused sign+band pass must accept
    NON-integer doc ids (UUID-style string ids are the common corpus key;
    every sibling operator — ngram, membership, contraction — supports
    them).  The band-table schema must carry the input id type through."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            ("doc-aaaa", text),
            ("doc-bbbb", text + " tail"),
            ("doc-cccc", "entirely different words everywhere nothing shared"),
        ],
        "doc_id string, text string",
    )
    bands = dedup.minhash_band_table(docs)
    assert bands.schema["doc_id"].dataType.simpleString() == "string"
    pairs = dedup.minhash_lsh_duplicates(docs, threshold=0.5).collect()
    assert {(r.a_id, r.b_id) for r in pairs} == {("doc-aaaa", "doc-bbbb")}
    # and the incremental probe path over string ids
    inc = dedup.incremental_duplicates(
        spark.createDataFrame([("doc-dddd", text)], "doc_id string, text string"),
        docs,
        bands,
        threshold=0.5,
    ).collect()
    assert {(r.a_id, r.b_id) for r in inc} == {
        ("doc-aaaa", "doc-dddd"),
        ("doc-bbbb", "doc-dddd"),
    }


def test_incremental_overlap_doc_no_self_pairs(spark):
    """Re-ingesting a shard that contains an already-indexed doc (same id,
    same text) must not emit degenerate (x, x) pairs or fan out the pairs
    that touch the overlap doc — the a_id < b_id contract holds on
    overlapping inputs."""
    text = "zero one two three four five six seven eight nine ten eleven"
    base = spark.createDataFrame(
        [(1, text), (2, text + " tail"), (3, "unrelated words only here")],
        "doc_id long, text string",
    )
    # doc 1 is ALREADY in the base; doc 4 is genuinely new and near doc 1
    new = spark.createDataFrame(
        [(1, text), (4, text + " coda")], "doc_id long, text string"
    )
    bands = dedup.minhash_band_table(base)
    rows = dedup.incremental_duplicates(new, base, bands, threshold=0.5).collect()
    got = [(r.a_id, r.b_id) for r in rows]
    assert all(a < b for a, b in got), f"self/descending pair leaked: {got}"
    assert len(got) == len(set(got)), f"verify fan-out duplicated rows: {got}"
    assert set(got) == {(1, 2), (1, 4), (2, 4)}


def test_incremental_lazy_base_detection(spark):
    """Pin the plan-introspection heuristic that auto-persists a LAZILY
    passed base_bands (so the base pipeline runs once, not once per
    action): a fresh minhash_band_table plan contains the Python
    MapInPandas stage; the same table read back from parquet does not.
    If a Spark upgrade renames the node, this fails loudly instead of
    silently reverting to double-compute."""
    import tempfile

    docs = _docs(spark, [(1, "some words to sign and band")])
    lazy = dedup.minhash_band_table(docs)
    plan = lazy._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" in plan
    with tempfile.TemporaryDirectory() as d:
        lazy.write.mode("overwrite").parquet(f"{d}/bands")
        stored = spark.read.parquet(f"{d}/bands")
        splan = stored._jdf.queryExecution().optimizedPlan().toString()
        assert "MapInPandas" not in splan
        # and both shapes produce identical incremental results
        new = _docs(spark, [(2, "some words to sign and band")])
        a = {
            (r.a_id, r.b_id)
            for r in dedup.incremental_duplicates(new, docs, lazy, threshold=0.5).collect()
        }
        b = {
            (r.a_id, r.b_id)
            for r in dedup.incremental_duplicates(new, docs, stored, threshold=0.5).collect()
        }
        assert a == b == {(1, 2)}


def test_sig_v_footer_bounds(spark, tmp_path):
    """The O(metadata) staleness bound (round-9): a bare parquet scan's
    sig_v min/max must come straight from footer statistics and match
    the fingerprint; filtered/derived frames must DECLINE (None) so the
    exact agg path judges them instead of whole-file stats."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.dedup import (
        _sig_v_bounds_from_footers,
        minhash_params_hash,
    )

    docs = _docs(spark, [(1, "a b c d e f"), (2, "b c d e f g")])
    path = str(tmp_path / "bands_pq")
    dedup.minhash_band_table(docs).write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    want = minhash_params_hash()
    assert _sig_v_bounds_from_footers(stored) == (want, want)
    # column-pruned projection is still a bare scan
    assert _sig_v_bounds_from_footers(stored.select("sig_v", "band")) == (
        want,
        want,
    )
    # a FILTERED frame must not be judged by whole-file footer bounds
    assert _sig_v_bounds_from_footers(stored.filter(F.col("band") == 0)) is None
    # a computed (non-file) frame declines too
    assert _sig_v_bounds_from_footers(dedup.minhash_band_table(docs)) is None
    # mixed-era files under one directory: bounds straddle -> probe raises
    dedup.minhash_band_table(docs).withColumn(
        "sig_v", F.col("sig_v") - 7
    ).write.mode("append").parquet(path)
    mixed = spark.read.parquet(path)
    lo, hi = _sig_v_bounds_from_footers(mixed)
    assert lo == want - 7 and hi == want
    new = _docs(spark, [(10, "a b c d e f")])
    with pytest.raises(ValueError, match="fingerprint"):
        dedup.incremental_duplicates(new, docs, mixed, threshold=0.8).count()
