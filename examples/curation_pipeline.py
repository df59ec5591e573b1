"""LLM training-data curation end-to-end on the bundled test corpus.

Run:  python examples/curation_pipeline.py  [sf_dir]

The pipeline a 100 TB curation job runs, at fixture scale:

0. Gopher heuristic gates (per-word rules + repetition rules) — the
   scan-speed filters go first, then a per-source frequency cap so no
   domain dominates the corpus
1. heuristic quality score + language ID (pure column expressions)
2. model-based quality filter — Bernoulli Naive Bayes trained on
   balanced weak labels (closed-form, deterministic)
3. benchmark decontamination, exact AND fuzzy — a packed-bitmap Bloom
   filter over the held-out eval set's fingerprints (no false
   negatives: nothing byte-equal to the benchmark survives), then an
   n-gram-Jaccard screen that catches the paraphrased leaks the
   exact filter cannot
4. exact-substring passage dedup (duplicated 12-token runs removed
   from every occurrence — licence headers, templated paragraphs)
5. MinHash-LSH near-duplicate removal with quality-aware survivors
6. DSIR target-distribution selection (hashed-n-gram importance
   weights vs the trusted English subset, Gumbel-top-k draw)
7. leakage-safe train/val/test split — docs similar below the dedup
   bar (>=0.5 Jaccard) bucket on their near-dup COMPONENT label, so a
   near-copy of a val doc can never land in train
8. token-budget packing + deterministic training order (train split)
9. sharded training-data sink (bit-stable on rerun) + a vocabulary
   coverage report of the training split

Every step is engine-replayable (md5-keyed hashing throughout), so the
resulting corpus is auditable: the same inputs produce the same shards
byte-for-byte on any cluster layout.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from thoth_spark import get_spark
from thoth_spark.operators import (
    classifier,
    curation,
    dedup,
    membership,
    sampling,
    text,
)
from thoth_spark.sinks import write_training_shards
from thoth_spark.sources import load_table


def run(spark, sf_dir: str, out_dir: str | None = None) -> dict:
    """Execute the pipeline; returns the stage row-count waterfall (the
    numbers main() prints) so the integration test
    (tests/test_operators.py::test_curation_pipeline_example_waterfall)
    can assert the showcase end-to-end instead of letting it rot."""
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 0. Gopher heuristic gates FIRST — both run at scan speed (pure
    # column expressions / one bounded gram pass), so everything
    # downstream pays for fewer rows: the per-word rules
    # (text.gopher_rules; min_stop_hits=1 — the fixture's synthetic
    # vocabulary carries at most one Gopher stopword) and the
    # repetition rules (text.gopher_repetition_verdict — template spam,
    # duplicated lines)
    ruled = (
        text.gopher_rules(docs, min_stop_hits=1)
        .where(F.col("pass_gopher"))
        .select("doc_id", "text", "source")
    )
    rep_ok = (
        text.gopher_repetition_verdict(ruled, "doc_id", "text")
        .where(F.col("pass_repetition"))
        .select(F.col("id").alias("doc_id"))
    )
    gated = ruled.join(rep_ok, "doc_id", "left_semi")
    n0a = gated.count()

    # 0b. per-source frequency cap (sampling.domain_cap_sample): no
    # single source may dominate the corpus — a no-op on the balanced
    # fixture at sf0.001, binding at larger sf / real crawls
    capped = sampling.domain_cap_sample(
        gated, "source", "doc_id", cap=30
    ).select("doc_id", "text")
    n0b = capped.count()

    # 0c. the OTHER canonical recipe as an AUDIT branch (r16): the
    # complete C4 pipeline — line/page gates then keep-first span dedup
    # (curation.c4_pipeline) — over the same corpus, rendered next to
    # the Gopher stage in the /curation funnel. The fixture has no
    # newlines or punctuation, so the branch derives the deterministic
    # line-structured corpus the C4 driver queries use (three 8-word
    # lines, terminal '.' when (doc_id + line) is even) and prepends a
    # fixed shared 3-sentence phrase to every fifth doc so the span
    # dedup genuinely fires; the MAIN flow stays Gopher-gated.
    toks = F.split(F.trim(F.col("text")), r"\s+")
    line_parts = []
    for i in range(3):
        body = F.concat_ws(" ", F.slice(toks, 1 + i * 8, 8))
        dot = F.when((F.col("doc_id") + i) % 2 == 0, F.lit(".")).otherwise(
            F.lit("")
        )
        line_parts.append(F.concat(body, dot))
    shared = (
        "alpha shared span one. beta shared span two. gamma shared span three."
    )
    lined = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat_ws("\n", F.lit(shared), *line_parts),
        )
        .otherwise(F.concat_ws("\n", *line_parts))
        .alias("text"),
    )
    c4_clean = curation.c4_pipeline(lined, min_sentences=2).localCheckpoint()
    n_c4_gated = c4_clean.count()
    # post-dedup sentence floor on SPLIT sentences (the span grain —
    # deliberately not the gate's punct-count proxy, see c4_pipeline):
    # a page whose surviving span material drops under 2 leaves here
    n_c4_deduped = c4_clean.where(
        F.col("n_sentences") - F.col("n_removed") >= 2
    ).count()
    c4_spans_removed = int(
        c4_clean.agg(F.sum("n_removed")).first()[0] or 0
    )

    # 1. heuristic signals
    scored = text.quality_score(capped, "text").select(
        "doc_id", "text", "quality_score"
    )

    # 2. NB quality filter: label the extremes, balance, train, score all
    labeled = classifier.balance_labels(
        classifier.weak_labels(docs, low=0.72, high=0.78)
    )
    model = classifier.train_nb_quality(labeled, n_features=4096)
    kept = (
        classifier.score_nb(scored, model)
        .where(F.col("nb_pred") == 1)
        .select("doc_id", "text")
    )
    n1 = kept.count()

    # 3. benchmark decontamination: every 97th doc stands in for the
    # held-out eval set; its normalized-text fingerprints build a
    # 64k-bit Bloom filter (<= 2048 bitmap words — broadcastable at any
    # corpus size) and training docs that hit are dropped. No false
    # negatives: a doc byte-equal to a benchmark doc CANNOT survive.
    fps = kept.select("doc_id", F.md5(text.normalize(F.col("text"))).alias("fp"))
    bench = fps.where(F.col("doc_id") % 97 == 0)
    bench_docs = kept.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    flt = membership.bloom_build(bench, "fp", m=1 << 16, n_hashes=3)
    clean_ids = (
        membership.bloom_probe(flt, fps, "doc_id", "fp", m=1 << 16, n_hashes=3)
        .where(~F.col("hit"))
        .select("doc_id")
    )
    kept = kept.join(clean_ids, "doc_id", "left_semi")
    n1b = kept.count()

    # 3b. FUZZY decontamination (dedup.ngram_decontaminate): the Bloom
    # screen is exact-normalized-match only, so a lightly paraphrased
    # benchmark doc sails through it — anything still >= 0.8 3-gram
    # Jaccard to the benchmark slice is dropped here (exact candidate
    # join, benchmark inverted index broadcast)
    fuzzy_hits = dedup.ngram_decontaminate(
        kept, bench_docs, "doc_id", "text", n=3, threshold=0.8
    )
    kept = kept.join(
        fuzzy_hits.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
    )
    n1c = kept.count()

    # 4. passage dedup (ExactSubstr): drop duplicated 12-token runs
    passages = curation.passage_dedup(kept, "doc_id", "text", window=12)
    cleaned = (
        passages.where(F.col("n_kept") > 0)
        .select(F.col("id").alias("doc_id"), F.col("text_deduped").alias("text"))
    )
    n2 = cleaned.count()

    # 4. document-level near-dup removal (MinHash + LSH + verify) with
    # the QUALITY-AWARE survivor rule: per duplicate cluster keep the
    # highest-quality member, not the smallest crawl id
    sh = dedup.shingle_sets(cleaned, "doc_id", "text", n=3).cache()
    sigs = dedup.minhash_signatures(
        cleaned, "doc_id", "text", num_hashes=32, n=3, shingles=sh
    )
    cands = dedup.minhash_lsh_pairs(sigs, bands=8, rows_per_band=4)
    verified = (
        cands.join(
            sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a"
        )
        .join(
            sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b"
        )
        .where(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b"))
            >= 0.8
        )
        .select("id_a", "id_b")
    )
    rescored = text.quality_score(cleaned, "text")
    unique_docs = dedup.quality_survivors(
        rescored, verified, "doc_id", "quality_score"
    ).select("doc_id", "text")
    n3 = unique_docs.count()

    # 5. DSIR selection (Xie et al. 2023): target the mix at the trusted
    # English subset — importance-weight every survivor by a hashed
    # n-gram target/raw likelihood ratio, then draw a fixed-size pool
    # proportional to weight (deterministic Gumbel-top-k, so the draw
    # replays bit-identically on any layout)
    flagged = unique_docs.join(docs.select("doc_id", "lang"), "doc_id").withColumn(
        "is_target", F.col("lang") == "en"
    )
    pool = sampling.dsir_select(
        flagged, "doc_id", "text", "is_target", n_select=max(1, int(n3 * 0.8))
    ).select(F.col("id").alias("doc_id"))
    selected = unique_docs.join(pool, "doc_id", "left_semi")
    n4 = selected.count()

    # 6. LEAKAGE-SAFE train/val/test split (r12): the dedup stage keeps
    # one doc per >=0.8-Jaccard cluster, but docs similar BELOW the
    # dedup bar must still never straddle train and eval — so the
    # split graph re-verifies the LSH candidates among the selected
    # docs at a looser 0.5 threshold and buckets on the near-dup
    # COMPONENT label, making split membership a pure function of the
    # similarity cluster (sampling.leakage_safe_split)
    sel_sh = sh.join(
        selected.select(F.col("doc_id").alias("id")), "id", "left_semi"
    )
    split_pairs = (
        cands.join(
            sel_sh.withColumnRenamed("id", "id_a").withColumnRenamed(
                "sh", "sh_a"
            ),
            "id_a",
        )
        .join(
            sel_sh.withColumnRenamed("id", "id_b").withColumnRenamed(
                "sh", "sh_b"
            ),
            "id_b",
        )
        .where(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b"))
            >= 0.5
        )
        .select("id_a", "id_b")
    )
    split_docs = sampling.leakage_safe_split(
        selected,
        split_pairs,
        "doc_id",
        val_fraction=0.05,
        test_fraction=0.05,
        component_col="split_comp",
    )
    n_val = split_docs.where(F.col("split") == "val").count()
    n_test = split_docs.where(F.col("split") == "test").count()

    # 7. pack into 256-token bins (first-fit per hash shard) — the
    # TRAIN split only; val/test stay out of the training shards
    train_docs = split_docs.where(F.col("split") == "train").select(
        "doc_id", "text"
    )
    sized = train_docs.withColumn("n_tokens", F.size(text.tokens(F.col("text"))))
    packed = curation.pack_sequences(sized, budget=256, n_shards=4)
    with_bins = train_docs.join(
        packed.select(F.col("id").alias("doc_id"), "bin_idx"), "doc_id"
    )

    # 8. sharded sink (deterministic training order inside) — rerunning
    # produces byte-identical files
    if out_dir is None:
        out_dir = os.path.join(tempfile.mkdtemp(prefix="curated_"), "shards")
    write_training_shards(with_bins, out_dir, n_shards=4)

    # vocabulary coverage of what we are about to train on: how many
    # tokens cover 90% of the training split (tokenizer/vocab sizing)
    vocab = text.vocabulary(train_docs, top_n=50)
    n90 = vocab.where(F.col("coverage") >= 0.9).agg(F.min("rank")).first()[0]

    # survivors of the decontamination screen, re-checked at the END of
    # the pipeline: nothing the Bloom filter flagged may reappear
    n_bench_leaked = train_docs.where(F.col("doc_id") % 97 == 0).count()

    return {
        "corpus": n0,
        "gopher_gated": n0a,
        "c4_gated": n_c4_gated,
        "c4_span_deduped": n_c4_deduped,
        "c4_spans_removed": c4_spans_removed,
        "domain_capped": n0b,
        "quality_kept": n1,
        "decontaminated": n1b,
        "fuzzy_decontaminated": n1c,
        "passage_cleaned": n2,
        "near_dup_unique": n3,
        "dsir_selected": n4,
        "split_val": n_val,
        "split_test": n_test,
        "split_train": n4 - n_val - n_test,
        "vocab_90": n90,
        "bench_leaked": n_bench_leaked,
        "out_dir": out_dir,
        "split_docs": split_docs,
        "split_pairs": split_pairs,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(shuffle_partitions=8, app_name="curation-pipeline")
    r = run(spark, sf_dir)
    print(f"corpus:          {r['corpus']} docs")
    print(f"gopher-gated:    {r['gopher_gated']} docs (rules + repetition)")
    print(
        f"c4 audit branch: {r['c4_gated']} pages pass the line/page gates, "
        f"{r['c4_span_deduped']} still over the floor after span dedup "
        f"({r['c4_spans_removed']} duplicated sentences removed)"
    )
    print(f"domain-capped:   {r['domain_capped']} docs (per-source cap)")
    print(f"quality-kept:    {r['quality_kept']} docs (NB filter)")
    print(f"decontaminated:  {r['decontaminated']} docs (Bloom screen vs eval set)")
    print(f"fuzzy-decontam:  {r['fuzzy_decontaminated']} docs (>=0.8 Jaccard screen)")
    print(f"passage-cleaned: {r['passage_cleaned']} docs (empty after dedup dropped)")
    print(f"near-dup-unique: {r['near_dup_unique']} docs (quality-aware MinHash survivors)")
    print(f"dsir-selected:   {r['dsir_selected']} docs (target-distribution pool)")
    print(
        f"split:           {r['split_train']} train / {r['split_val']} val / "
        f"{r['split_test']} test (leakage-safe: near-dup clusters co-assigned)"
    )
    print(f"vocab-90%:       {r['vocab_90']} tokens cover 90% of the training split")
    print(f"shards written:  {r['out_dir']}")
    spark.stop()


if __name__ == "__main__":
    main()
