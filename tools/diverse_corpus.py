"""Synthetic DIVERSE document corpus + banded-join sparsity probe.

The driver fixture's documents table has a ~31-word vocabulary, which
makes every document near-identical: every MinHash/SimHash band bucket
is dense, so the fixture can never demonstrate the property the 100 TB
dedup design rests on — that banded candidate joins stay ~LINEAR in
corpus size on realistic data because buckets are sparse. This tool
manufactures that evidence:

1. ``generate(out_dir, n_docs)``: a deterministic corpus with a
   realistic vocabulary (~30k pseudo-words, Zipf-distributed token
   frequencies, 60-180 tokens/doc) and a controlled 5% near-duplicate
   rate (a dup copies an earlier doc and rewrites ~10% of its tokens) —
   written as ``documents.parquet`` with the fixture schema, so every
   registered dedup operator runs on it unchanged via its sf_dir
   argument.
2. ``main()``: for a doubling ladder of corpus sizes, measure DISTINCT
   candidate-pair counts for the three banded candidate generators
   (MinHash-LSH bands, SimHash pigeonhole bands, df-capped shingle
   blocks) and print pairs-per-doc. Linear scaling shows as a ~2x pair
   step per 2x docs (pairs/doc roughly flat); a dense-bucket blowup
   would show ~4x steps (quadratic). Results are recorded in
   SCALING.md.

Usage: python tools/diverse_corpus.py [--sizes 12500,25000,50000,100000]
       [--json PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 20260814
VOCAB_SIZE = 30_000
ZIPF_EXPONENT = 1.07  # classic English-like rank-frequency slope
DOC_LEN_LO, DOC_LEN_HI = 60, 180
DUP_EVERY = 20  # every 20th doc is a near-dup of the previous doc
DUP_MUTATE = 0.10  # fraction of tokens rewritten in a near-dup

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
    "po", "qua", "ri", "so", "tu", "ve", "wi", "xo", "yu", "za",
    "bra", "cle", "dri", "fla", "gre", "pli", "sto", "tra", "vle", "wro",
]


def _vocab(rng: np.random.Generator) -> np.ndarray:
    """~30k distinct pseudo-words built from 2-4 syllables."""
    words: set[str] = set()
    syl = np.array(_SYLLABLES)
    while len(words) < VOCAB_SIZE:
        need = VOCAB_SIZE - len(words)
        parts = rng.integers(0, len(syl), size=(need * 2, 4))
        n_syl = rng.integers(2, 5, size=need * 2)
        for row, k in zip(parts, n_syl):
            words.add("".join(syl[row[:k]]))
            if len(words) >= VOCAB_SIZE:
                break
    return np.array(sorted(words))


def generate(out_dir: str, n_docs: int, seed: int = SEED) -> str:
    """Write ``documents.parquet`` (fixture schema) under ``out_dir``."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_EXPONENT
    p /= p.sum()

    lens = rng.integers(DOC_LEN_LO, DOC_LEN_HI + 1, size=n_docs)
    texts: list[str] = []
    prev_tokens: np.ndarray | None = None
    for i in range(n_docs):
        if i % DUP_EVERY == DUP_EVERY - 1 and prev_tokens is not None:
            toks = prev_tokens.copy()
            n_mut = max(1, int(len(toks) * DUP_MUTATE))
            pos = rng.choice(len(toks), size=n_mut, replace=False)
            toks[pos] = rng.choice(VOCAB_SIZE, size=n_mut, p=p)
        else:
            toks = rng.choice(VOCAB_SIZE, size=lens[i], p=p)
        prev_tokens = toks
        texts.append(" ".join(vocab[toks]))

    langs = np.where(rng.random(n_docs) < 0.8, "en", "de")
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array(
                [f"web{int(i) % 7}" for i in range(n_docs)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    return out_dir


def measure(spark, sf_dir: str) -> dict[str, int]:
    """Distinct candidate-pair counts of the three banded generators."""
    from pyspark.sql import functions as F

    from quty_server_spark.operators.dedup import (
        _pair_overlap_from,
        doc_shingles,
        minhash_candidates,
        simhash_bands,
        simhash_sigs,
    )

    sh = doc_shingles(spark, sf_dir).localCheckpoint(eager=False)
    minhash_pairs = minhash_candidates(spark, sf_dir, sh).count()
    ngram_pairs = _pair_overlap_from(sh).count()
    bands = simhash_bands(simhash_sigs(spark, sf_dir))
    a, b = bands.alias("a"), bands.alias("b")
    simhash_pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    # The r09 ingest gate's candidate join: shard bands x lake bands.
    # On sparse realistic buckets this must track the SHARD size (a
    # fixed 10% of the corpus here), i.e. grow ~linearly with n_docs —
    # never like the |lake|² a symmetric re-mine would pay.
    new, old = (
        bands.filter(F.col("doc_id") % 10 == 0).alias("n"),
        bands.filter(F.col("doc_id") % 10 != 0).alias("o"),
    )
    incremental_pairs = (
        new.join(
            old,
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.band_val") == F.col("o.band_val")),
        )
        .select("n.doc_id", "o.doc_id")
        .distinct()
        .count()
    )
    # And the CAPPED gate: saturated buckets leave the universe before
    # the shard/lake split (dedup_incremental_simhash_capped) — this is
    # the column that must come back ~linear.
    from pyspark.sql import Window

    from quty_server_spark.operators.dedup import SIMHASH_BUCKET_CAP

    capped = bands.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("band_id", "band_val"))
    ).filter(F.col("bsz") <= SIMHASH_BUCKET_CAP)
    cn, co = (
        capped.filter(F.col("doc_id") % 10 == 0).alias("n"),
        capped.filter(F.col("doc_id") % 10 != 0).alias("o"),
    )
    incremental_capped_pairs = (
        cn.join(
            co,
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.band_val") == F.col("o.band_val")),
        )
        .select("n.doc_id", "o.doc_id")
        .distinct()
        .count()
    )
    # The r10 MinHash-family gate (dedup_incremental_minhash): the same
    # shard-vs-lake split on the MinHash band table. This is the direct
    # measurement behind that gate shipping UNCAPPED — on a realistic
    # vocabulary its buckets must be sparse enough that the asymmetric
    # join tracks the shard (~linear in n_docs, tiny pairs/doc), where
    # the SimHash gate needs SIMHASH_BUCKET_CAP.
    from quty_server_spark.operators.dedup import minhash_bands, minhash_sigs

    mb = minhash_bands(minhash_sigs(sh))
    mn, mo = (
        mb.filter(F.col("doc_id") % 10 == 0).alias("n"),
        mb.filter(F.col("doc_id") % 10 != 0).alias("o"),
    )
    incremental_minhash_pairs = (
        mn.join(
            mo,
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.sig") == F.col("o.sig")),
        )
        .select("n.doc_id", "o.doc_id")
        .distinct()
        .count()
    )
    return {
        "minhash_pairs": minhash_pairs,
        "simhash_pairs": simhash_pairs,
        "ngram_block_pairs": ngram_pairs,
        "incremental_pairs": incremental_pairs,
        "incremental_capped_pairs": incremental_capped_pairs,
        "incremental_minhash_pairs": incremental_minhash_pairs,
    }


# The fixed-shard column holds the nightly shard at the ladder's
# smallest size / 10 (1250 docs on the default ladder) while the lake
# doubles underneath it — the actual production shape (a day's ingest
# does not grow because the lake did). Generation is sequential from a
# single seeded RNG stream, so the first SHARD_N documents are
# byte-identical across ladder sizes and the column isolates lake
# growth alone.
def measure_fixed_shard(spark, sf_dir: str, shard_n: int) -> dict[str, int]:
    """Incremental-gate candidate counts with a CONSTANT shard
    (doc_id < shard_n) against a growing lake (doc_id >= shard_n).

    The capped variant mirrors dedup_incremental_simhash_capped: the
    SIMHASH_BUCKET_CAP is applied to whole-bucket size before the
    shard/lake split, so each surviving shard band row meets at most
    CAP lake rows — per-run candidates are bounded by
    n_bands x CAP x |shard| regardless of lake size. The claim this
    column verifies: capped candidates stay ~flat (or fall, as more
    buckets saturate) while the uncapped count keeps climbing with the
    lake."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from quty_server_spark.operators.dedup import (
        MINHASH_BUCKET_CAP,
        SIMHASH_BUCKET_CAP,
        doc_shingles,
        minhash_bands,
        minhash_sigs,
        simhash_bands,
        simhash_sigs,
    )

    bands = simhash_bands(simhash_sigs(spark, sf_dir))
    # r11 (r10 VERDICT "What's wrong" #1): the MinHash gate's
    # fixed-shard column — the direct measurement of the nightly shape
    # for the family that previously shipped on the shard∝corpus
    # ladder alone. Join key is (band_id, sig).
    mbands = minhash_bands(
        minhash_sigs(doc_shingles(spark, sf_dir).localCheckpoint(eager=False))
    )
    out: dict[str, int] = {}
    for label, side, keys in (
        ("fixed_shard_pairs", bands, ("band_id", "band_val")),
        (
            "fixed_shard_capped_pairs",
            bands.withColumn(
                "bsz",
                F.count("*").over(Window.partitionBy("band_id", "band_val")),
            ).filter(F.col("bsz") <= SIMHASH_BUCKET_CAP),
            ("band_id", "band_val"),
        ),
        ("fixed_shard_minhash_pairs", mbands, ("band_id", "sig")),
        (
            "fixed_shard_minhash_capped_pairs",
            mbands.withColumn(
                "bsz",
                F.count("*").over(Window.partitionBy("band_id", "sig")),
            ).filter(F.col("bsz") <= MINHASH_BUCKET_CAP),
            ("band_id", "sig"),
        ),
    ):
        new, old = (
            side.filter(F.col("doc_id") < shard_n).alias("n"),
            side.filter(F.col("doc_id") >= shard_n).alias("o"),
        )
        cond = (F.col(f"n.{keys[0]}") == F.col(f"o.{keys[0]}")) & (
            F.col(f"n.{keys[1]}") == F.col(f"o.{keys[1]}")
        )
        out[label] = (
            new.join(old, cond)
            .select("n.doc_id", "o.doc_id")
            .distinct()
            .count()
        )
    # r13: the passage-family gate (dedup_incremental_passages). Two
    # columns tell the story: the INNER candidate multiplicity a naive
    # digest join would pay (grows with the lake — recurring boilerplate
    # digests match ever more lake rows) versus the LEFT SEMI hit count
    # the gate actually pays, bounded by |shard windows| regardless of
    # lake size. fixed_shard_passage_windows is that bound (constant by
    # construction — the shard text is byte-identical across rungs).
    #
    # The generator's near-dups copy only the IMMEDIATELY previous doc,
    # so cross-boundary passage repeats never occur naturally (hits
    # would be a vacuous 0). The measurement therefore prepends a fixed
    # 32-token boilerplate passage to every 10th doc — the license-
    # header/navbox case passage dedup exists for — INSIDE this
    # measurement only, leaving every other ladder column byte-
    # comparable with rows measured before r13. Prepending keeps the
    # boilerplate windows stride-aligned across docs, so each
    # boilerplate carrier contributes the same 3 digests.
    from quty_server_spark.operators._helpers import load_table
    from quty_server_spark.operators.dedup import _passage_windows

    boiler = " ".join(f"boilertok{j}" for j in range(32))
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 3,
            F.concat(F.lit(boiler + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    w = _passage_windows(docs).localCheckpoint(eager=False)
    sw = w.filter(F.col("doc_id") < shard_n)
    lw = w.filter(F.col("doc_id") >= shard_n)
    out["fixed_shard_passage_windows"] = sw.count()
    out["fixed_shard_passage_hits"] = sw.join(
        lw, "passage_md5", "leftsemi"
    ).count()
    out["fixed_shard_passage_pairs"] = (
        sw.alias("n")
        .join(lw.alias("o"), "passage_md5")
        .select("n.doc_id", "o.doc_id")
        .distinct()
        .count()
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="12500,25000,50000,100000")
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--shard-n",
        type=int,
        default=None,
        help="fixed-shard size (default min(sizes)//10); pass the "
        "standing ladder's value (1250) when extending it with "
        "single larger sizes so the fixed-shard columns stay "
        "comparable",
    )
    ap.add_argument(
        "--merge",
        default=None,
        help="existing SPARSITY-shaped json to merge into: rows are "
        "combined by n_docs (new rows win), sorted, and ALL step "
        "ratios recomputed over the merged ladder",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from quty_server_spark.session import get_spark

    spark = get_spark("diverse-corpus-probe")
    rows = []
    base = tempfile.mkdtemp(prefix="quty_diverse_")
    shard_n = args.shard_n if args.shard_n is not None else min(sizes) // 10
    for n in sizes:
        d = os.path.join(base, f"n{n}")
        t0 = time.time()
        generate(d, n)
        gen_s = time.time() - t0
        t0 = time.time()
        counts = measure(spark, d)
        counts.update(measure_fixed_shard(spark, d, shard_n))
        row = {
            "n_docs": n,
            "fixed_shard_n": shard_n,
            **counts,
            **{
                k.replace("_pairs", "_per_doc"): round(v / n, 3)
                for k, v in counts.items()
                if k.endswith("_pairs")
            },
            "gen_s": round(gen_s, 1),
            "measure_s": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(row, file=sys.stderr)
    if args.merge:
        with open(args.merge) as f:
            prior = json.load(f)["sizes"]
        by_n = {r["n_docs"]: r for r in prior}
        for r in rows:
            by_n[r["n_docs"]] = r
        rows = [by_n[n] for n in sorted(by_n)]
        for r in rows:  # steps recomputed below over the merged ladder
            for k in [k for k in r if k.endswith("_step")]:
                del r[k]
    for prev, cur in zip(rows, rows[1:]):
        cur["minhash_step"] = round(
            cur["minhash_pairs"] / max(prev["minhash_pairs"], 1), 2
        )
        cur["simhash_step"] = round(
            cur["simhash_pairs"] / max(prev["simhash_pairs"], 1), 2
        )
        cur["ngram_step"] = round(
            cur["ngram_block_pairs"] / max(prev["ngram_block_pairs"], 1), 2
        )
        cur["incremental_step"] = round(
            cur["incremental_pairs"] / max(prev["incremental_pairs"], 1), 2
        )
        cur["incremental_capped_step"] = round(
            cur["incremental_capped_pairs"]
            / max(prev["incremental_capped_pairs"], 1),
            2,
        )
        cur["incremental_minhash_step"] = round(
            cur["incremental_minhash_pairs"]
            / max(prev["incremental_minhash_pairs"], 1),
            2,
        )
        # Fixed-shard steps: the lake doubles between rows while the
        # shard is constant, so ~1.0 here IS the production claim
        # ("per-run cost is a function of the shard, not the lake").
        cur["fixed_shard_step"] = round(
            cur["fixed_shard_pairs"] / max(prev["fixed_shard_pairs"], 1), 2
        )
        cur["fixed_shard_capped_step"] = round(
            cur["fixed_shard_capped_pairs"]
            / max(prev["fixed_shard_capped_pairs"], 1),
            2,
        )
        cur["fixed_shard_minhash_step"] = round(
            cur["fixed_shard_minhash_pairs"]
            / max(prev["fixed_shard_minhash_pairs"], 1),
            2,
        )
        cur["fixed_shard_minhash_capped_step"] = round(
            cur["fixed_shard_minhash_capped_pairs"]
            / max(prev["fixed_shard_minhash_capped_pairs"], 1),
            2,
        )
        # Passage columns exist only on rows measured from r13 on —
        # steps are computed where both rungs carry them.
        for k in ("fixed_shard_passage_pairs", "fixed_shard_passage_hits"):
            if k in prev and k in cur:
                cur[k.replace("_pairs", "").replace("_hits", "_hit") + "_step"] = round(
                    cur[k] / max(prev[k], 1), 2
                )
    out = json.dumps({"seed": SEED, "sizes": rows})
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
