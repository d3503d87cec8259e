"""Cluster entry point for the training-data curation pipeline:

    zip -r polipus_spark.zip polipus_spark/
    spark-submit --py-files polipus_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.shuffle.partitions=<2-4x total cores> \\
        scripts/curate_corpus.py \\
        --docs /path/to/documents --out /path/to/curated \\
        [--benchmark /path/to/eval_set] \\
        [--store /path/to/minhash_store [--update-store]] \\
        [--embeddings /path/to/embeddings --semantic-threshold 0.9] \\
        [--lang-rates en=2500,de=7500] [--chunk 64 --pack-budget 256]

Runs quality → repetition → language mixing → decontamination →
persisted-store probe → fuzzy dedup → semantic dedup
(pipeline.curate_corpus), prints the per-stage survivor report (chunk and
packing stages included when enabled), writes the curated docs, optionally
chunks + packs them into training sequences, and with --update-store
appends the survivors' minhash signatures so the NEXT run only pays for
its new batch. Deterministic end to end — re-running on the same input
produces byte-identical output at any parallelism.
"""

from __future__ import annotations

import argparse


def _parse_rates(spec: str | None) -> dict[str, int] | None:
    if not spec:
        return None
    out: dict[str, int] = {}
    for part in spec.split(","):
        lang, _, bps = part.partition("=")
        out[lang.strip()] = int(bps)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True, help="parquet path of documents (doc_id, text)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--benchmark", default=None, help="parquet path of the eval set to decontaminate against")
    p.add_argument("--no-quality", action="store_true")
    p.add_argument("--gopher", action="store_true",
                   help="apply the Gopher/MassiveText A1.1 rule set")
    p.add_argument("--gopher-min-stopwords", type=int, default=2,
                   help="distinct stop-word floor (0 disables the rule "
                        "for corpora without English function words)")
    p.add_argument("--max-dup-pct", type=int, default=30)
    p.add_argument("--dsir-target", default=None,
                   help="parquet path of the target-domain docs; enables "
                        "DSIR importance selection")
    p.add_argument("--dsir-min-ratio", type=int, default=10_000,
                   help="min mean per-word target/raw ratio in bps "
                        "(10000 = at least as target-like as the raw mix)")
    p.add_argument("--substring-dup-pct", type=int, default=None,
                   help="drop docs with more than this %% of duplicated "
                        "8-word windows (EXACTSUBSTR cut)")
    p.add_argument("--lang-rates", default=None, help="per-language bps, e.g. en=2500,de=7500")
    p.add_argument("--default-bps", type=int, default=10_000)
    p.add_argument("--jaccard-pct", type=int, default=70)
    p.add_argument("--survivor", default="min_id", choices=["min_id", "best"],
                   help="near-dup survivor policy: min_id (cheapest) or "
                        "best (keep the most complete copy per cluster)")
    p.add_argument("--span-dedup-words", type=int, default=None,
                   help="also remove cross-doc repeated N-word spans")
    p.add_argument("--store", default=None,
                   help="persisted minhash store: near-dups of it die "
                        "(incremental re-ingest path)")
    p.add_argument("--store-min-matches", type=int, default=12)
    p.add_argument("--update-store", action="store_true",
                   help="append the survivors' signatures to --store")
    p.add_argument("--embeddings", default=None,
                   help="parquet path of (vec_id, embedding) for SemDeDup")
    p.add_argument("--semantic-threshold", type=float, default=None,
                   help="cosine threshold for the semantic dedup stage")
    p.add_argument("--chunk", type=int, default=None, help="also chunk survivors into N-word windows")
    p.add_argument("--chunk-overlap", type=int, default=8)
    p.add_argument("--pack-budget", type=int, default=None, help="pack chunks into sequences of this many words")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from polipus_spark.pipeline import curate_corpus, curation_report

    spark = SparkSession.builder.appName("curate_corpus").getOrCreate()
    docs = spark.read.parquet(args.docs)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None

    emb = spark.read.parquet(args.embeddings) if args.embeddings else None
    curated, stages = curate_corpus(
        docs, bench,
        quality=not args.no_quality,
        gopher=args.gopher,
        gopher_opts={"min_stopwords": args.gopher_min_stopwords},
        max_dup_pct=args.max_dup_pct,
        dsir_target=(spark.read.parquet(args.dsir_target)
                     if args.dsir_target else None),
        dsir_min_ratio=args.dsir_min_ratio,
        substring_dup_pct=args.substring_dup_pct,
        lang_rates_bps=_parse_rates(args.lang_rates),
        default_bps=args.default_bps,
        jaccard_pct=args.jaccard_pct,
        survivor=args.survivor,
        span_dedup_words=args.span_dedup_words,
        minhash_store_dir=args.store,
        store_min_matches=args.store_min_matches,
        embeddings=emb,
        semantic_threshold=args.semantic_threshold,
    )
    curated = curated.persist()
    curated.write.mode("overwrite").parquet(f"{args.out}/curated")

    if args.chunk:
        from polipus_spark.functions.text import chunk_docs

        chunks = chunk_docs(curated, chunk=args.chunk,
                            overlap=args.chunk_overlap).persist()
        chunks.write.mode("overwrite").parquet(f"{args.out}/chunks")
        stages["chunks"] = chunks
        if args.pack_budget:
            from polipus_spark.functions.packing import (
                pack_sequences, packing_efficiency,
            )

            packed = pack_sequences(chunks, budget=args.pack_budget)
            packed.write.mode("overwrite").parquet(f"{args.out}/packed")
            stages["packed_chunks"] = packed
            eff = packing_efficiency(packed, budget=args.pack_budget).collect()[0]
            print(f"packed: {eff['n_sequences']:,} sequences, "
                  f"{eff['total_words']:,} words, fill {eff['fill_pct']}%")

    # one job for the whole per-stage ledger (chunk/pack rows included)
    for r in curation_report(stages).orderBy("stage_order").collect():
        print(f"{r['stage_order']:>2} {r['stage']:<16} {r['n_docs']:>12,}")

    if args.update_store and args.store:
        from polipus_spark.functions.dedup import build_minhash_store

        build_minhash_store(curated, args.store, mode="append")
        print(f"store updated: +{curated.count():,} signatures")

    spark.stop()


if __name__ == "__main__":
    main()
