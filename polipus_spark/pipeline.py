"""End-to-end corpus curation: the pipeline a training-data user runs.

Chains the repo's individually-oracled operators in the order a real
100 TB curation pass applies them — cheapest, highest-kill-rate filters
first so expensive stages see the fewest rows:

  1. quality gate        (map-only Column filter)
  2. repetition gate     (map-only Column filter)
  3. language mixing     (map-only deterministic sample)
  4. decontamination     (broadcast semi-join vs the benchmark)
  5. fuzzy dedup         (exact → LSH → Jaccard → components)
  6. span dedup          (optional: corpus-wide repeated-window removal)

Every stage is lazy; ``curation_report`` materializes the per-stage
survivor counts as ONE DataFrame (one job), not a driver loop of counts.
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
    max_dup_pct: int = 30,
    lang_rates_bps: dict[str, int] | None = None,
    default_bps: int = 10_000,
    decontam_ngram: int = 8,
    jaccard_pct: int = 70,
    span_dedup_words: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Run the curation pipeline; returns (curated_docs, stages).

    ``stages`` maps stage name → the surviving DataFrame AFTER that stage
    (insertion order = pipeline order), for reporting and debugging.
    Stages whose knob is off are skipped (and absent from ``stages``).
    """
    t = F.col(text_col)
    stages: dict[str, DataFrame] = {"input": docs}
    d = docs
    if quality:
        d = d.where(quality_class(t) == "keep")
        stages["quality"] = d
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
    d = fuzzy_dedup(d, id_col=id_col, text_col=text_col,
                    jaccard_pct=jaccard_pct)
    stages["deduped"] = d
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
