"""End-to-end corpus curation: the pipeline a training-data user runs.

Chains the repo's individually-oracled operators in the order a real
100 TB curation pass applies them — cheapest, highest-kill-rate filters
first so expensive stages see the fewest rows:

  1. quality gate        (map-only Column filter)
  2. Gopher rules        (optional: the Rae et al. 2021 A1.1 flag set,
                          map-only Column filter)
  3. repetition gate     (map-only Column filter)
  4. language mixing     (map-only deterministic sample)
  5. decontamination     (broadcast semi-join vs the benchmark)
  6. DSIR selection      (optional: fixed-point importance weights vs a
                          target corpus — broadcast ratio table + filter)
  7. store probe         (optional: near-dups of a PERSISTED minhash
                          store die — a re-run curates only the new batch)
  8. fuzzy dedup         (exact → LSH → Jaccard → components)
  9. substring dedup     (optional: EXACTSUBSTR — drop docs whose
                          duplicated-window share exceeds the cut)
 10. semantic dedup      (optional: SemDeDup within-cluster cosine over an
                          embeddings table, min-id survivor)
 11. span dedup          (optional: corpus-wide repeated-window removal)

Every stage is lazy; ``curation_report`` materializes the per-stage
survivor counts as ONE DataFrame (one job), not a driver loop of counts.
``scripts/curate_corpus.py`` drives the whole thing (plus chunking and
sequence packing downstream) from spark-submit flags.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polipus_spark.functions.decontam import decontaminate
from polipus_spark.functions.dedup import fuzzy_dedup
from polipus_spark.functions.sampling import stratified_sample
from polipus_spark.functions.text import (
    lang_id, quality_class, repetition_class,
)


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    quality: bool = True,
    gopher: bool = False,
    gopher_opts: dict | None = None,
    max_dup_pct: int = 30,
    lang_rates_bps: dict[str, int] | None = None,
    default_bps: int = 10_000,
    decontam_ngram: int = 8,
    dsir_target: DataFrame | None = None,
    dsir_min_ratio: int = 0,
    dsir_dim: int = 256,
    substring_dup_pct: int | None = None,
    substring_n: int = 8,
    jaccard_pct: int = 70,
    survivor: str = "min_id",
    span_dedup_words: int | None = None,
    minhash_store_dir: str | None = None,
    store_min_matches: int = 12,
    embeddings: DataFrame | None = None,
    semantic_threshold: float | None = None,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Run the curation pipeline; returns (curated_docs, stages).

    ``stages`` maps stage name → the surviving DataFrame AFTER that stage
    (insertion order = pipeline order), for reporting and debugging.
    Stages whose knob is off are skipped (and absent from ``stages``).

    ``minhash_store_dir`` enables the incremental probe: docs whose banded
    minhash signature collides with the persisted store and agrees on
    ≥ ``store_min_matches`` of 16 positions die before the in-batch dedup
    — the re-ingest path (the store streams map-side, the batch broadcasts;
    nothing store-sized shuffles). The pipeline never WRITES the store
    (stages are lazy); append survivors afterwards with
    ``dedup.build_minhash_store(curated, store_dir, mode="append")``.

    ``gopher`` adds the full Rae et al. 2021 A1.1 rule set after the basic
    quality gate (map-only, fused into the same scan). ``dsir_target``
    enables DSIR importance selection: docs whose mean per-word
    target/raw bucket ratio (``sampling.dsir_weights``, fixed-point bps)
    falls below ``dsir_min_ratio`` die — the "select data that looks like
    the target domain" stage. ``substring_dup_pct`` enables the
    EXACTSUBSTR cut: docs whose duplicated ``substring_n``-word-window
    share exceeds the percentage die (boilerplate-heavy copies that
    whole-doc dedup keeps).

    ``embeddings`` + ``semantic_threshold`` enable SemDeDup: within-cluster
    cosine pairs above the threshold (``similarity.semantic_dedup_pairs``,
    auto-K with hot-cluster LSH fallback) drop the larger id. Docs with no
    embedding row are kept — absence of evidence is not a near-dup."""
    t = F.col(text_col)
    stages: dict[str, DataFrame] = {"input": docs}
    d = docs
    if quality:
        d = d.where(quality_class(t) == "keep")
        stages["quality"] = d
    if gopher:
        from polipus_spark.functions.text import gopher_rules

        # gopher_opts forwards threshold overrides (min_words,
        # min_stopwords, ...) — the published defaults target real web
        # text; domain corpora tune them (e.g. the synthetic test tables
        # contain no English stop words at all).
        d = d.where(gopher_rules(t, **(gopher_opts or {}))["keep"] == 1)
        stages["gopher"] = d
    if max_dup_pct is not None:
        d = d.where(repetition_class(t, max_dup_pct=max_dup_pct) == "keep")
        stages["repetition"] = d
    if lang_rates_bps:
        d = stratified_sample(
            d, lang_id(t), lang_rates_bps, default_bps=default_bps,
            id_col=id_col,
        )
        stages["lang_sample"] = d
    if benchmark is not None:
        d = decontaminate(d, benchmark, n=decontam_ngram,
                          id_col=id_col, text_col=text_col)
        stages["decontaminated"] = d
    if dsir_target is not None:
        from polipus_spark.functions.sampling import dsir_weights

        # keep docs whose mean per-word target/raw ratio clears the floor:
        # weight >= n_words * dsir_min_ratio (both sides exact integers).
        # The weights frame is (id, weight); n_words recomputes map-side.
        w = dsir_weights(d, dsir_target, dim=dsir_dim,
                         id_col=id_col, text_col=text_col)
        n_words = F.size(F.filter(
            F.split(F.lower(t), r"\s+"), lambda x: x != ""))
        d = (
            d.join(w, id_col)
            .where(F.col("weight") >= n_words.cast("bigint") * dsir_min_ratio)
            .drop("weight")
        )
        stages["dsir_selected"] = d
    if minhash_store_dir is not None:
        from polipus_spark.functions.dedup import incremental_dedup_pairs

        hits = (
            incremental_dedup_pairs(
                docs.sparkSession, d, minhash_store_dir,
                min_matches=store_min_matches,
                id_col=id_col, text_col=text_col,
            )
            .select(F.col("new_id").alias(id_col)).distinct()
        )
        d = d.join(hits, id_col, "left_anti")
        stages["store_deduped"] = d
    d = fuzzy_dedup(d, id_col=id_col, text_col=text_col,
                    jaccard_pct=jaccard_pct, survivor=survivor)
    stages["deduped"] = d
    if substring_dup_pct is not None:
        from polipus_spark.functions.dedup import duplicated_window_stats

        # EXACTSUBSTR cut (Lee et al. 2022): drop docs whose duplicated
        # n-word-window share exceeds the threshold — boilerplate-heavy
        # copies that survive whole-doc dedup. Exact integer ratio.
        stats = duplicated_window_stats(d, n=substring_n,
                                        id_col=id_col, text_col=text_col)
        keep_ids = stats.where(
            F.col("n_dup_windows") * 100
            <= F.col("n_windows") * substring_dup_pct
        ).select(id_col)
        d = d.join(keep_ids, id_col, "left_semi")
        stages["substring_deduped"] = d
    if embeddings is not None and semantic_threshold is not None:
        from polipus_spark.functions.similarity import semantic_dedup_pairs

        # restrict the embedding table to the current survivors so cluster
        # sizes (and the auto-K derivation) track the live corpus, then
        # drop each pair's larger id — the same survivor policy as the
        # in-batch LSH stage
        live = embeddings.join(
            d.select(F.col(id_col).alias(emb_id_col)).distinct(), emb_id_col
        )
        pairs = semantic_dedup_pairs(
            live, threshold=semantic_threshold, n_centroids=None,
            id_col=emb_id_col, vec_col=emb_vec_col,
        )
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        d = d.join(losers, id_col, "left_anti")
        stages["semantic_deduped"] = d
    if span_dedup_words:
        from polipus_spark.functions.dedup import dedup_spans

        # dedup_spans returns only (doc_id, text); re-join to the surviving
        # docs so the stage replaces text_col but preserves every other
        # column, like every other stage (r2 ADVICE: enabling span dedup
        # used to silently narrow the output schema).
        sd = dedup_spans(d, span_words=span_dedup_words,
                         id_col=id_col, text_col=text_col)
        # dropDuplicates on the right side: if ids are not unique here
        # (exact dedup disabled / upstream duplication) the inner join would
        # otherwise emit a c×c cross-product per duplicated id; the rebuilt
        # text is identical per id, so keeping one is lossless (r3 ADVICE).
        d = d.drop(text_col).join(
            sd.select(F.col("doc_id").alias(id_col),
                      F.col("text").alias(text_col)).dropDuplicates([id_col]),
            id_col,
        )
        stages["span_deduped"] = d
    return d, stages


def curation_report(stages: dict[str, DataFrame]) -> DataFrame:
    """(stage_order, stage, n_docs): survivor counts per stage as one
    unioned aggregate — a single Spark job when collected."""
    parts = [
        df.agg(
            F.lit(i).alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count("*").alias("n_docs"),
        )
        for i, (name, df) in enumerate(stages.items())
    ]
    return reduce(DataFrame.unionByName, parts)
