"""End-to-end LLM training-data pipeline on the engine's operators.

The 100 TB shape this engine exists for, composed from its pieces:

    documents
      -> quality filter      (text.quality_score: cheap Column-only gate)
      -> C4/Gopher battery   (word-shape bounds + boilerplate markers,
                              same scan)
      -> repetition filter   (Gopher-style top-bigram / dup-trigram gates)
      -> paragraph dedup     (CCNet: repeated paragraphs drop corpus-wide,
                              docs reassemble from survivors)
      -> PII scrub           (scan-speed regex redaction)
      -> perplexity gate     (one-row hashed reference-LM broadcast,
                              in-row scoring — stream-capable)
      -> decontamination     (Bloom bitmap of the held-out benchmark's
                              shingles: a broadcast bit test, never a
                              corpus shuffle)
      -> stratified sample   (per-language deterministic %, no RNG)

    Before trusting a trained classifier gate, run the round-9 eval
    pair on its scores: `classifier_calibration_report` (reliability
    bins + ECE — are the probabilities meaningful?) and
    `classifier_threshold_sweep` (P/R/F1 per cut — where to gate).
    A miscalibrated filter silently skews the kept corpus.
      -> near-dup dedup      (MinHash-LSH clusters -> canonical survivors,
                              broadcast anti-join: the corpus never shuffles)
      -> semantic dedup      (SemDeDup: k-means clusters the embeddings,
                              within-cluster cosine neighborhoods keep one
                              representative; quadratic work stays inside
                              clusters)
      -> mixture resample    (per-source keep-% toward target domain
                              weights, map-side salted-hash filter)
      -> token budget        (per-domain budget fill on a salted-bucket
                              histogram; the sequential scan never touches
                              the corpus)
      -> train/val/test tag  (hash split, engine-portable)
      -> sequence packing    (GPT-style concat-then-chunk layout of the
                              train split; writer-ready per-sequence part
                              manifests)
      -> post-deploy monitors (per-window classifier ECE + embedding
                              drift of the kept corpus vs the full-corpus
                              reference — the alarms that fire when the
                              deployed gates go stale; bounded aggregates,
                              streaming twins exist for both)
      -> atomic publish      (corpus snapshot + sequence manifests + BOTH
                              monitor tables commit as ONE
                              MultiManifestTable transaction —
                              cross-table atomicity, paired time travel;
                              a snapshot is never visible without its
                              calibration/drift certificate)

Every stage is a narrow transformation or a broadcast join against a
pairs-sized side table, so the full corpus streams through with ONE
pass; only the dedup clustering shuffles, and that is bounded by the
near-dup pair graph, not the corpus.

Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from wallaroo_spark.operators import dedup, similarity, text
from wallaroo_spark.sources import read_table


PII_PATTERN = r"\b(customer|key|value)\b"


def build_corpus(spark, sf_dir: str, out_dir: str, quality_min: float = 0.5):
    docs = read_table(spark, sf_dir, "documents")

    # 1. quality gate — pure Column math, absorbed by the scan
    good_ids = text.quality_score(docs).filter(
        F.col("quality") >= quality_min
    ).select("doc_id")
    kept = docs.join(good_ids, "doc_id", "left_semi")

    # 1a'. C4/Gopher rule battery — word-shape bounds + boilerplate
    # markers, pure Column regex math absorbed by the same scan
    rules_ok = text.c4_gopher_filters(kept).filter(F.col("keep")).select("doc_id")
    kept = kept.join(rules_ok, "doc_id", "left_semi")

    # 1b. repetition gate — looped/boilerplate text out (Gopher thresholds)
    rep_ok = text.repetition_signals(kept).filter(~F.col("repetitive")).select("doc_id")
    kept = kept.join(rep_ok, "doc_id", "left_semi")

    # 1b'. paragraph-level dedup (CCNet): corpus-wide boilerplate
    # paragraphs drop, documents reassemble from their surviving
    # paragraphs (one md5-int shuffle); fully-duplicated docs empty out
    # and are removed by the n_paras filter. The upstream gate chain is
    # persisted first: paragraph_dedup references its input from several
    # branches (hash, first-occurrence, totals), and without the persist
    # every branch would re-run the whole filter chain above.
    pre_para = kept.persist()
    paras = text.paragraph_dedup(pre_para, block_tokens=16)
    kept = (
        pre_para.drop("text")
        .join(paras.filter(F.col("n_paras") > 0), "doc_id")
        .withColumnRenamed("text_dedup", "text")
        .drop("n_paras", "n_dropped")
        # cut the lineage here: the gate chain above already references
        # itself several times, and the dedup/packing stages below each
        # reference `kept` again — without the cut the composed plan tree
        # grows multiplicatively and can OOM the DRIVER at planning time
        # (on a cluster use a reliable checkpoint dir for this)
        .localCheckpoint(eager=True)
    )
    pre_para.unpersist()

    # 1c. PII scrub — scan-speed regexp rewrite of the text itself
    kept = kept.withColumn("text", F.regexp_replace("text", PII_PATTERN, "[REDACTED]"))

    # 1d. decontamination — the held-out benchmark (stand-in: doc_id%50==0)
    # compresses to a Bloom bitmap; contaminated corpus docs drop via one
    # broadcast anti-join, the corpus never shuffles
    bench_set = docs.filter(F.col("doc_id") % 50 == 0)
    kept = kept.filter(F.col("doc_id") % 50 != 0)
    contaminated = dedup.decontaminate_bloom(kept, bench_set, k=5).select("doc_id")
    kept = kept.join(F.broadcast(contaminated), "doc_id", "left_anti")

    # 1e. reference-LM perplexity gate (CCNet shape) — the one-row hashed
    # bigram model built from the 'en' reference slice broadcasts; scoring
    # is pure in-row array math, so this same stage runs on a stream
    lm = text.lm_score_map(docs.filter(F.col("lang") == "en"))
    kept = text.perplexity_filter_streamable(kept, lm, max_avg_bits=5.4).drop(
        "n_bigrams", "avg_bits"
    )

    # 1f. TRAINED quality gate (GPT-3 learned-filter shape): logistic
    # regression fit distributed on a cheap positive label (here: docs
    # mentioning the target domain terms), scored in-row — keep docs the
    # model rates above threshold. Like 1e, the scorer is streamable.
    from wallaroo_spark.operators import inference

    from wallaroo_spark.operators.text import tokens as _tk

    train = docs.withColumn(
        "_y", F.array_contains(_tk(F.col("text")), "vector").cast("int")
    )
    clf = inference.linear_classifier_fit(train, "_y")
    kept = (
        inference.linear_classifier_score(kept, clf)
        .filter(F.col("clf_prob") >= 0.05)
        .drop("clf_prob", "clf_pred")
    )

    # 1g. POST-DEPLOY MONITORS (round 10): the gate above was calibrated
    # at deploy time; corpora drift, and a drifted filter silently skews
    # what it keeps. Two alarm tables ride the SAME atomic publish below:
    #   * per-window ECE of the deployed classifier over the scored
    #     corpus (windowed_calibration — streaming twin:
    #     CalibrationAggregation, exact-parity-tested), windows
    #     synthesized from doc_id exactly as the registered
    #     windowed_calibration_ece query does;
    #   * embedding drift of the KEPT corpus vs the full-corpus reference
    #     (embedding_drift — mean-shift L2 + exact-integer norm TV;
    #     streaming twin: EmbeddingDriftAggregation).
    # Both are bounded aggregates (windows x bins / d + n_bins rows) —
    # monitoring is free at any corpus size.
    # The monitor scores the KEPT corpus — the slice the publish below
    # actually ships — not the training frame (ADVICE r10: in-sample
    # training-set ECE is a weak drift alarm, and a certificate that
    # rides with the snapshot must describe that snapshot). Labels are
    # re-derived on the kept rows by the same mechanical rule, so the
    # monitor needs no label column to survive the gates above.
    mon_src = kept.withColumn(
        "_y", F.array_contains(_tk(F.col("text")), "vector").cast("int")
    )
    monitor_ece = inference.windowed_calibration(
        inference.linear_classifier_score(mon_src, clf).withColumn(
            "ts",
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("doc_id") * 50),
        ),
        ts_col="ts", size="1 hour", label_col="_y",
    )

    # 2. class-balanced thinning — deterministic per-language percentages
    sampled = text.stratified_sample(
        kept, "lang", {"en": 100, "de": 80, "fr": 80, "es": 80, "zh": 80}
    )

    # 3. near-dup dedup — clusters are pairs-sized; the corpus takes one
    # broadcast anti-join against the non-canonical member list
    clusters = dedup.duplicate_clusters(sampled, threshold=0.5)
    dropped = clusters.filter(F.col("component_id") != F.col("doc_id")).select("doc_id")
    deduped = sampled.join(F.broadcast(dropped), "doc_id", "left_anti")

    # 3b. semantic dedup — SemDeDup over the survivors' embeddings (vec_id
    # aligns with doc_id in the testdata); the quadratic pair work stays
    # inside k-means clusters, survivors anti-join map-side
    emb = read_table(spark, sf_dir, "embeddings")
    sem_emb = emb.join(
        deduped.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem_dropped = (
        similarity.semdedup(sem_emb, k=6, iters=2, tau=0.30)
        .filter(F.col("kept") == 0)
        .select(F.col("vec_id").alias("doc_id"))
    )
    deduped = deduped.join(F.broadcast(sem_dropped), "doc_id", "left_anti")

    # 3c. domain-mixture resample toward target source weights under a
    # 90%-of-corpus budget (rates broadcast; the filter is map-side)
    weights = {f"src{i}": float(i + 1) for i in range(20)}
    mixed = text.target_mixture_sample(deduped, "source", weights, budget_frac=0.9).drop(
        "_n_stratum", "_pct"
    )

    # 3d. hard per-domain token budget — the cutoff scan runs on the tiny
    # bucket histogram, the corpus sees one map-side comparison
    mixed = text.token_budget_filter(mixed, budget=1000)

    # 4. reproducible split tag
    tagged = text.deterministic_split(mixed)

    # 5+6. one ATOMIC publish: the corpus snapshot and the train split's
    # 256-token sequence manifests (no token stream materialized — one
    # distributed prefix scan) commit as a SINGLE MultiManifestTable
    # transaction — readers can never observe sequence manifests that
    # reference corpus rows not yet visible (or vice versa), and time
    # travel rolls both tables back together
    from wallaroo_spark.sinks.manifest import MultiManifestTable

    packed = text.pack_manifest(
        tagged.filter(F.col("split") == "train"), seq_len=256
    )
    # 1g (cont.): embedding drift of the KEPT corpus vs the full corpus —
    # computed on the final survivor set so the published snapshot carries
    # its own drift certificate
    monitor_drift = similarity.embedding_drift(
        emb.join(
            tagged.select(F.col("doc_id").alias("vec_id")), "vec_id",
            "left_semi",
        ),
        emb,
    )
    table = MultiManifestTable(out_dir)
    table.append_multi(
        {
            "corpus": tagged,
            "sequences": packed,
            "monitor_calibration": monitor_ece,
            "monitor_drift": monitor_drift,
        }
    )
    return table


if __name__ == "__main__":
    from wallaroo_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")
    spark = get_spark("training-data-pipeline")
    table = build_corpus(spark, sf_dir, out_dir)
    final = table.read(spark, "corpus")
    final.groupBy("split").count().show()
    print(f"corpus committed under {out_dir}")
    print(f"{table.read(spark, 'sequences').count()} training sequences (same transaction)")
    table.read(spark, "monitor_calibration").orderBy("window_start").show(5)
    table.read(spark, "monitor_drift").show()
