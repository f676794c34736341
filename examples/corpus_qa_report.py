"""Runnable corpus-QA report — the round-7 pipeline QA battery composed
the way a data-curation run would consume it before committing a 100 TB
training snapshot:

1. **index health** — ANN recall vs brute-force exact over the bounded
   query sample (``sim_ann_recall_eval``) + IVF posting-list balance
   (``sim_ivf_cell_balance``): is the similarity index trustworthy and
   skew-free enough to serve dedup/retrieval?
2. **dedup calibration + impact** — MinHash estimator error against
   exact Jaccard (``dedup_minhash_error_eval``) and the near-dup
   cluster-size histogram with removable-document counts
   (``dedup_cluster_stats``): are the LSH parameters right, and how
   much does dedup actually shrink this corpus?
3. **mix + packing** — per-(lang, source) rebalancing weights
   (``doc_mix_rebalance``), the sequence-length histogram
   (``doc_seqlen_histogram``), and the packing-efficiency audit
   (``doc_pack_efficiency``): what do we sample, and how much padding
   does SEQ_LEN=2048 waste on it?
4. **stream readiness** — the event-time disorder audit
   (``events_watermark_lag_audit``) aggregated to the watermark delay
   a streaming deployment of this corpus's event feed would need.

Run:  python examples/corpus_qa_report.py [sf_dir]
      (default /root/testdata/sf0.01)

Everything is the SAME code the registered oracle-checked queries run —
this file only composes the battery into one report.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import quty_server_spark.operators  # noqa: F401,E402  (registers queries)
from quty_server_spark.plans.registry import registry  # noqa: E402
from quty_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("corpus-qa")
    q = registry.queries

    print(f"== corpus QA report over {sf_dir} ==\n")

    # 1. index health
    recall = q["sim_ann_recall_eval"](spark, sf_dir)
    r = recall.agg(
        F.sum("hits").alias("hits"), F.sum("n_exact").alias("n")
    ).collect()[0]
    print(f"ANN (sign-LSH, 256 buckets): micro recall@3 = {r.hits}/{r.n}"
          f" = {r.hits / r.n:.3f}")
    bal = q["sim_ivf_cell_balance"](spark, sf_dir)
    b = bal.agg(
        F.count("*").alias("cells"),
        F.max("pct_of_mean").alias("hottest"),
        F.min("pct_of_mean").alias("coldest"),
    ).collect()[0]
    print(f"IVF balance: {b.cells} cells, hottest {b.hottest}% of mean, "
          f"coldest {b.coldest}% of mean")

    # 2. dedup calibration + impact
    err = q["dedup_minhash_error_eval"](spark, sf_dir).select(
        F.abs(F.col("est_ppm") / 1e6 - F.col("jaccard")).alias("abs_err")
    )
    e = err.agg(F.count("*").alias("n"), F.max("abs_err").alias("worst"),
                F.avg("abs_err").alias("mean")).collect()[0]
    print(f"MinHash estimator vs exact Jaccard over {e.n} LSH candidates: "
          f"mean |err| {e.mean:.3f}, worst {e.worst:.3f}")
    stats = q["dedup_cluster_stats"](spark, sf_dir).orderBy("cluster_size")
    rows = stats.collect()
    removable = sum(x.n_removable for x in rows)
    total = sum(x.n_docs for x in rows)
    print(f"near-dup clusters: {total} docs -> remove {removable} "
          f"({1e2 * removable / total:.2f}%) via keep-one-per-cluster")
    for x in rows:
        print(f"  size {x.cluster_size:>3}: {x.n_clusters} clusters")

    # 3. mix + packing
    mix = q["doc_mix_rebalance"](spark, sf_dir)
    m = mix.agg(
        F.count("*").alias("cells"),
        F.sum("n_docs").alias("docs"),
        F.sum("expected_docs").alias("kept"),
    ).collect()[0]
    print(f"mix rebalance: {m.cells} (lang, source) cells, {m.docs} docs "
          f"-> {m.kept} after flattening weights")
    pack = q["doc_pack_efficiency"](spark, sf_dir)
    p = pack.agg(
        F.sum("tokens_total").alias("toks"),
        F.sum("n_bins").alias("bins"),
        F.sum("n_oversize").alias("oversize"),
    ).collect()[0]
    fill = p.toks / (p.bins * 2048)
    print(f"packing: {p.toks} tokens into {p.bins} x 2048 bins "
          f"(fill {fill:.3f}, {p.oversize} oversize docs need chunking)")

    # 3b. incremental ingest gate (round 9): what the NEXT shard would
    # quarantine against this lake, via the capped asymmetric band join
    gate = q["dedup_incremental_simhash_capped"](spark, sf_dir)
    g = gate.agg(
        F.count("*").alias("pairs"),
        F.countDistinct("incoming_doc_id").alias("flagged"),
    ).collect()[0]
    n_shard = gate.sparkSession.read.parquet(
        f"{sf_dir}/documents.parquet"
    ).filter(F.col("doc_id") % 10 == 0).count()
    print(f"ingest gate: {g.flagged}/{n_shard} shard docs have a near-dup "
          f"already in the lake ({g.pairs} capped candidate pairs)")

    # 3c. repeated-text exposure (round 12): how much of the corpus is
    # verbatim passages shared across documents — the substring-level
    # mass whole-doc dedup cannot see, and the scrub-pass go/no-go.
    ratio = q["doc_passage_dup_ratio"](spark, sf_dir)
    r = ratio.agg(
        F.sum("n_windows").alias("w"),
        F.sum("n_dup_windows").alias("dw"),
        F.count(F.when(F.col("dup_ppm") >= 500000, 1)).alias("mostly_dup"),
    ).collect()[0]
    print(f"repeated text: {r.dw}/{r.w} passage windows duplicated "
          f"({1e2 * r.dw / max(r.w, 1):.1f}% of corpus text), "
          f"{r.mostly_dup} docs >=50% boilerplate (drop-whole candidates)")

    # 4. stream readiness
    lag = q["events_watermark_lag_audit"](spark, sf_dir)
    w = lag.agg(
        F.sum("n_late").alias("late"),
        F.sum("n_events").alias("n"),
        F.max("max_disorder_us").alias("worst_us"),
    ).collect()[0]
    print(f"event-time disorder: {w.late}/{w.n} events late vs ingestion "
          f"order; watermark >= {w.worst_us / 1e6:.1f}s drops none")

    spark.stop()


if __name__ == "__main__":
    main()
