"""End-to-end corpus curation: each stage kills exactly the doc crafted to
die there; the report counts match; final survivors exact."""

from pyspark.sql import functions as F

GOOD = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away with great speed to find more food near the river")
SHORT = "the cat"
REPEATY = "the cat sat on the mat " * 20
LEAKY = ("students often ask what is the capital of france the answer is "
         "paris and the teacher smiles at the class every single day")
NEAR_A = ("the quick brown fox jumps over the lazy dog while the sun "
          "shines bright over the green hills and the wide river flows")
NEAR_B = NEAR_A.replace("green", "blue")
BENCH = "what is the capital of france the answer is paris of course"


def test_curate_corpus_end_to_end(spark):
    from polipus_spark.pipeline import curate_corpus, curation_report

    docs = spark.createDataFrame(
        [(1, GOOD), (2, GOOD), (3, SHORT), (4, REPEATY), (5, LEAKY),
         (6, NEAR_A), (7, NEAR_B)],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([(100, BENCH)], "doc_id bigint, text string")
    final, stages = curate_corpus(docs, bench)

    report = {r["stage"]: r["n_docs"]
              for r in curation_report(stages).collect()}
    assert report == {
        "input": 7,
        "quality": 6,          # SHORT dies (under 20 words)
        "repetition": 5,       # REPEATY dies (dup bigrams)
        "decontaminated": 4,   # LEAKY dies (shares an 8-gram with BENCH)
        "deduped": 2,          # exact copy 2 and near-dup 7 die
    }
    assert sorted(r["doc_id"] for r in final.collect()) == [1, 6]
    # stage order preserved for the report
    order = [r["stage"] for r in
             curation_report(stages).orderBy("stage_order").collect()]
    assert order == ["input", "quality", "repetition", "decontaminated", "deduped"]


def test_curate_corpus_optional_stages(spark):
    """No benchmark + quality off: only repetition and dedup run."""
    from polipus_spark.pipeline import curate_corpus

    docs = spark.createDataFrame(
        [(1, GOOD), (2, GOOD), (3, SHORT)], "doc_id bigint, text string"
    )
    final, stages = curate_corpus(docs, None, quality=False)
    assert set(stages) == {"input", "repetition", "deduped"}
    # SHORT survives (quality off; "the cat" has 1 distinct bigram of 1)
    assert sorted(r["doc_id"] for r in final.collect()) == [1, 3]


def test_corpus_to_training_sequences_e2e(spark):
    """The full product story on real test data: curate sf0.001 documents
    (with docs 0-4 as the benchmark), chunk the survivors, pack into
    256-word sequences — every stage shrinks or preserves rows and the
    packed output covers every surviving chunk exactly once."""
    from polipus_spark.functions.packing import pack_sequences, packing_efficiency
    from polipus_spark.functions.text import chunk_docs
    from polipus_spark.pipeline import curate_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") < 5)
    curated, stages = curate_corpus(docs, bench)
    n_in, n_out = docs.count(), curated.count()
    assert 0 < n_out < n_in  # benchmark self-hits + near-dups must die

    chunks = chunk_docs(curated, chunk=64, overlap=8)
    packed = pack_sequences(chunks, budget=256, n_bins=4)
    assert packed.count() == chunks.count()
    eff = packing_efficiency(packed, budget=256).collect()[0]
    assert eff["fill_pct"] >= 50


def test_curate_with_store_probe_stage(spark, tmp_path):
    """Optional stage 5 (r5): a doc that near-matches the PERSISTED minhash
    store dies before in-batch dedup; novel docs survive; the store itself
    is never modified by the pipeline (lazy stages, no writes)."""
    from polipus_spark.functions.dedup import build_minhash_store
    from polipus_spark.pipeline import curate_corpus

    store = str(tmp_path / "store")
    prior = spark.createDataFrame([(100, GOOD)], "doc_id bigint, text string")
    build_minhash_store(prior, store)

    near_good = GOOD.replace("river", "ocean")  # near-dup of the stored doc
    docs = spark.createDataFrame(
        [(1, near_good), (2, NEAR_A)], "doc_id bigint, text string")
    final, stages = curate_corpus(docs, None, minhash_store_dir=store)
    assert "store_deduped" in stages
    assert sorted(r["doc_id"] for r in final.collect()) == [2]
    assert stages["store_deduped"].count() == 1  # the kill was THIS stage
    # the store was only read
    assert spark.read.parquet(store).count() == 1


def test_curate_with_semantic_dedup_stage(spark):
    """Optional stage 7 (r5): two docs whose embeddings are near-identical
    collapse to the smaller id; a doc with no embedding row is kept."""
    from polipus_spark.pipeline import curate_corpus

    docs = spark.createDataFrame(
        [(1, GOOD), (2, NEAR_A.replace("quick", "clever")), (3, LEAKY)],
        "doc_id bigint, text string",
    )
    base = [1.0] + [0.0] * 63
    near = [0.999] + [0.0447] + [0.0] * 62  # cosine ≈ 0.999 with base
    ortho = [0.0, 0.0, 1.0] + [0.0] * 61
    emb = spark.createDataFrame(
        [(1, base), (2, near)],  # doc 3 has NO embedding row
        "vec_id bigint, embedding array<double>",
    )
    final, stages = curate_corpus(
        docs, None, embeddings=emb, semantic_threshold=0.9)
    assert "semantic_deduped" in stages
    ids = sorted(r["doc_id"] for r in final.collect())
    assert ids == [1, 3]  # 2 is the pair's larger id; 3 kept (no embedding)
    # the kill happened in the semantic stage, not earlier
    assert stages["deduped"].count() == 3
    del ortho  # documents the kept-if-orthogonal contrast


def test_curate_full_composition_to_packed_sequences(spark, tmp_path):
    """r4 verdict #3 E2E: crawl-shaped corpus → every optional stage on
    (store probe, fuzzy, semantic, span) → chunk → pack. The report covers
    all stages in order and the packed output covers every chunk once."""
    from polipus_spark.functions.dedup import build_minhash_store
    from polipus_spark.functions.packing import pack_sequences
    from polipus_spark.functions.text import chunk_docs
    from polipus_spark.pipeline import curate_corpus, curation_report

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(60)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    store = str(tmp_path / "store")
    # the store already holds docs 0-9's CONTENT under prior-corpus ids
    # (id-shifted: the probe excludes same-id self-matches by design, and a
    # real re-ingest arrives with fresh ids): a re-ingest must drop them
    build_minhash_store(
        docs.where(F.col("doc_id") < 10)
        .withColumn("doc_id", F.col("doc_id") + 1000), store)

    curated, stages = curate_corpus(
        docs, None,
        minhash_store_dir=store, store_min_matches=16,
        embeddings=emb, semantic_threshold=0.95,
    )
    order = [r["stage"] for r in
             curation_report(stages).orderBy("stage_order").collect()]
    assert order == ["input", "quality", "repetition", "store_deduped",
                     "deduped", "semantic_deduped"]
    # every stored doc still alive after the text gates dies at the store
    # probe (its signature matches itself on all 16 positions), and ONLY
    # there — the kill set is exactly the re-ingested survivors
    alive_before = {r["doc_id"] for r in stages["repetition"].collect()
                    if r["doc_id"] < 10}
    alive_after = {r["doc_id"] for r in stages["store_deduped"].collect()}
    assert alive_before and alive_before.isdisjoint(alive_after)
    n = {r["stage"]: r["n_docs"]
         for r in curation_report(stages).collect()}
    # ≥: a doc_id ≥ 10 whose text exactly duplicates a stored doc dies too
    assert n["store_deduped"] <= n["repetition"] - len(alive_before)
    assert 0 < n["semantic_deduped"] <= n["deduped"]

    chunks = chunk_docs(curated, chunk=32, overlap=4)
    packed = pack_sequences(chunks, budget=128, n_bins=4)
    assert packed.count() == chunks.count() > 0


def test_curate_with_span_dedup_stage(spark):
    """Optional stage 6: a repeated 10-word span across the two survivors
    is stripped from both; their unique tails remain."""
    from polipus_spark.pipeline import curate_corpus

    # two quality-passing docs sharing an exact 10-word prefix
    prefix = "the alpha beta gamma delta epsilon zeta eta theta iota"
    a = prefix + " " + "unique tail for the first document with more words here ok"
    b = prefix + " " + "entirely other ending text for the second one with words too"
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id bigint, text string")
    final, stages = curate_corpus(docs, None, span_dedup_words=10)
    assert "span_deduped" in stages
    got = {r["doc_id"]: r["text"] for r in final.collect()}
    assert len(got) == 2
    for t in got.values():
        assert "alpha" not in t          # shared span removed
        assert len(t.split()) > 0        # unique tail kept


def test_curate_with_gopher_stage(spark):
    """A doc that clears the basic quality gate (>=20 words) but fails the
    Gopher word-count floor (50) dies only when gopher=True."""
    from polipus_spark.pipeline import curate_corpus

    long_good = (
        "the quick brown fox jumps over that lazy dog and runs far away "
        "with great speed to find more food near the wide river where "
        "many other animals gather every morning before sunrise while "
        "birds sing loud songs from tall trees and fishermen cast long "
        "lines into deep water hoping to catch something worth keeping "
        "for dinner tonight under bright stars"
    )  # ~60 distinct-bigram words, stopword-rich
    mid = ("the small dog and the tall cat have walked to town with all "
           "of that fresh food they found beside the old mill today")  # ~24
    docs = spark.createDataFrame(
        [(1, long_good), (2, mid)], "doc_id bigint, text string")

    final_off, _ = curate_corpus(docs)
    assert sorted(r["doc_id"] for r in final_off.collect()) == [1, 2]

    final_on, stages = curate_corpus(docs, gopher=True)
    assert [r["doc_id"] for r in final_on.collect()] == [1]
    assert stages["gopher"].count() == 1


def test_curate_with_dsir_stage(spark):
    """Target-domain vocabulary keeps a doc; disjoint vocabulary (bucket
    sets verified disjoint at dim=256 by construction) drives its weight to
    zero and the DSIR floor kills it. Other stages off/neutral."""
    from polipus_spark.pipeline import curate_corpus

    a_words = ("apple river cloud stone music garden yellow window "
               "travel silver")
    b_words = ("quantum nebula cipher vortex ember lattice python marble "
               "falcon orchid")
    docs = spark.createDataFrame(
        [(1, " ".join([a_words] * 3)), (2, " ".join([b_words] * 3))],
        "doc_id bigint, text string")
    target = docs.where(F.col("doc_id") == 1)

    final, stages = curate_corpus(
        docs, quality=False, max_dup_pct=None,
        dsir_target=target, dsir_min_ratio=5000,
    )
    # doc 1's buckets are pure target (ratio 10000 >= 5000 floor per word);
    # doc 2 shares no bucket with the target, weight 0
    assert [r["doc_id"] for r in stages["dsir_selected"].collect()] == [1]
    assert [r["doc_id"] for r in final.collect()] == [1]


def test_curate_with_substring_dedup_stage(spark):
    """Two docs sharing a 16-word run (below the 70% Jaccard whole-doc cut,
    so fuzzy dedup keeps both) both exceed a 50% duplicated-window share
    and die at the EXACTSUBSTR stage; a clean doc survives."""
    from polipus_spark.pipeline import curate_corpus

    shared = ("alpha bravo charlie delta echo foxtrot golf hotel india "
              "juliet kilo lima mike november oscar papa")
    p1 = shared + " red green blue white"
    p2 = shared + " cobalt amber jade pearl"
    clean = ("totally different words describing another topic entirely "
             "with no overlap against those phonetic alphabet sequences "
             "whatsoever in any window")
    docs = spark.createDataFrame(
        [(1, p1), (2, p2), (3, clean)], "doc_id bigint, text string")

    final, stages = curate_corpus(
        docs, quality=False, max_dup_pct=None, substring_dup_pct=50,
    )
    assert stages["deduped"].count() == 3  # fuzzy dedup keeps all three
    assert [r["doc_id"] for r in final.collect()] == [3]
    assert "substring_deduped" in stages
