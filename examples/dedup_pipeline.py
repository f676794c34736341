"""Runnable end-to-end corpus-dedup demo — the LLM-data-pipeline tier
composed the way a production run would chain it:

1. **generate** a diverse synthetic corpus (realistic ~30k-word Zipf
   vocabulary, 5% injected near-dups — ``tools/diverse_corpus.py``, the
   same generator behind SCALING.md's sparsity ladder);
2. **candidates** — MinHash-LSH banded signature join
   (``dedup.minhash_candidates``: equality join on band buckets, never
   all-pairs);
3. **verify** — exact Jaccard over the df-capped shingle universe,
   keeping pairs >= 0.5 (``dedup._pair_jaccard_from``);
4. **cluster** — connected components over the verified pairs with the
   hardened BSP loop (``dedup.min_label_components``: pointer doubling,
   reliable checkpoints);
5. **keep canonical** — elect min doc_id per cluster and emit the
   surviving corpus + a dedup report.

Run:  python examples/dedup_pipeline.py [n_docs]   (default 5000)

Everything is the SAME code the registered oracle-checked queries run —
this file only composes it over a corpus you can regenerate and scale.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from quty_server_spark.operators.dedup import (  # noqa: E402
    _pair_jaccard_from,
    doc_shingles,
    min_label_components,
    minhash_candidates,
)
from quty_server_spark.session import get_spark  # noqa: E402
from tools.diverse_corpus import generate  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    corpus_dir = generate(
        os.path.join(tempfile.mkdtemp(prefix="quty_dedup_demo_"), "corpus"),
        n_docs,
    )
    spark = get_spark("dedup-pipeline-demo")

    sh = doc_shingles(spark, corpus_dir).localCheckpoint(eager=False)
    cands = minhash_candidates(spark, corpus_dir, sh)
    verified = (
        _pair_jaccard_from(sh)
        .join(cands, ["doc_a", "doc_b"], "left_semi")
        .filter(F.col("jaccard") >= 0.5)
    )
    n_pairs = verified.count()

    labels, rounds = min_label_components(
        spark, verified.select("doc_a", "doc_b")
    )
    summary = labels.groupBy("lbl").agg(F.count("*").alias("sz")).agg(
        F.count("*").alias("n_clusters"), F.max("sz").alias("largest")
    ).first()
    n_docs_total = spark.read.parquet(
        os.path.join(corpus_dir, "documents.parquet")
    ).count()
    n_clustered = labels.count()
    n_keep = n_docs_total - n_clustered + summary.n_clusters

    print(f"corpus:            {n_docs_total} docs ({corpus_dir})")
    print(f"verified dup pairs: {n_pairs} (jaccard >= 0.5)")
    print(
        f"clusters:          {summary.n_clusters} "
        f"(largest {summary.largest}, "
        f"BSP converged in {rounds} supersteps)"
    )
    print(f"surviving corpus:  {n_keep} docs "
          f"({n_docs_total - n_keep} near-duplicates removed)")
    spark.stop()


if __name__ == "__main__":
    main()
