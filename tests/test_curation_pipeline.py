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
