"""Dedup-operator semantics that the fixture corpus cannot exercise.

The documents fixture has no stop-shingles (max df = 9), so the
df-capped Jaccard equals the exact Jaccard there and the oracle-parity
gate never sees the cap fire. This file builds a hot-shingle corpus
where it does.
"""

from __future__ import annotations

from quty_server_spark.operators import dedup as D


def test_jaccard_df_cap_drops_stop_shingles(spark):
    # 20 docs share one boilerplate shingle (df=20 > cap) — the pair
    # explosion a stop-shingle causes. Docs 1 and 2 additionally share a
    # rare shingle. With the cap: the hot shingle leaves the universe, so
    # the only surviving pair is (1, 2) via the rare shingle, with
    # Jaccard computed over kept shingles only (1/1 = 1.0). Without the
    # cap every one of the C(20,2)=190 pairs would score >= 1/3.
    rows = []
    for d in range(1, 21):
        rows.append((d, "the common boiler"))
    rows.append((1, "alpha beta gamma"))
    rows.append((2, "alpha beta gamma"))
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard for r in D._pair_jaccard_from(sh).collect()
    }
    assert got == {(1, 2): 1.0}


def test_jaccard_df_cap_vacuous_below_threshold(spark):
    # At df <= cap nothing is dropped: the capped operator IS the exact
    # Jaccard. Two docs sharing 1 of their 2-and-3 shingles -> 1/4.
    rows = [
        (1, "a b c"),
        (1, "b c d"),
        (2, "b c d"),
        (2, "x y z"),
        (2, "y z w"),
    ]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard for r in D._pair_jaccard_from(sh).collect()
    }
    assert got == {(1, 2): 1 / 4}


def test_min_label_components_line_topology_converges_log_rounds(spark):
    # A 16-node line 0-1-2-...-15: diameter 15, so plain one-hop
    # propagation needs ~15 supersteps. Pointer doubling must label the
    # whole component 0 in O(log diameter) rounds — the property that
    # makes the BSP loop viable at 100 TB component sizes.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "doc_a long, doc_b long"
    )
    labels, rounds = D.min_label_components(spark, pairs)
    got = {r.node: r.lbl for r in labels.collect()}
    assert got == {i: 0 for i in range(16)}
    assert rounds <= 7, f"pointer doubling degraded: {rounds} rounds for diameter 15"


def test_min_label_components_two_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    labels, _ = D.min_label_components(spark, pairs)
    got = {r.node: r.lbl for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_simhash_capped_is_subset_of_uncapped(spark):
    import __spark_entry__ as se
    from tests.conftest import SF_DIR

    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in se.queries()["dedup_simhash"](spark, SF_DIR).collect()
    }
    capped = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in se.queries()["dedup_simhash_capped"](spark, SF_DIR).collect()
    }
    assert capped <= full
    # The fixture's degenerate vocabulary saturates head buckets, so the
    # cap must actually bite here (it is NOT vacuous like the df cap).
    assert len(capped) < len(full)


def test_banded_candidates_linear_on_diverse_corpus(spark, tmp_path):
    # The 100 TB selectivity claim: on a realistic-vocabulary corpus the
    # banded candidate joins grow ~linearly with corpus size. Deterministic
    # seeded corpora -> exact, reproducible counts.
    from tools.diverse_corpus import generate, measure

    small = generate(str(tmp_path / "a"), 1500)
    big = generate(str(tmp_path / "b"), 3000)
    ms = measure(spark, small)
    mb = measure(spark, big)
    # linear candidate growth for the df-capped and minhash generators:
    # a 2x corpus yields < 3x candidates (quadratic would be ~4x).
    assert mb["minhash_pairs"] < 3 * ms["minhash_pairs"]
    assert mb["ngram_block_pairs"] < 3 * ms["ngram_block_pairs"]
    # and the uncapped simhash join demonstrates the saturation the
    # bucket cap exists for: super-linear growth on the same corpus.
    assert mb["simhash_pairs"] > 3 * ms["simhash_pairs"]


def test_levenshtein_block_cap_drops_hot_blocks(spark):
    # cap+1 near-identical docs share one blocking key (hot block: the
    # "the ..."-initial pile-up) — every pair would pass the edit-distance
    # verify, so without the cap this is C(cap+1, 2) result rows. The cap
    # must drop the whole block while a small block elsewhere survives.
    from quty_server_spark.operators.dedup import LEV_BLOCK_CAP

    rows = []
    for i in range(LEV_BLOCK_CAP + 1):
        rows.append((i, "the common header text", "en", 100))
    rows.append((1000, "rare opener body", "en", 100))
    rows.append((1001, "rare opener body x", "en", 100))
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    d.createOrReplaceTempView("_lev_cap_docs")
    import quty_server_spark.operators.dedup as D
    from unittest import mock

    with mock.patch.object(
        D, "load_table", lambda spark_, sf, name: d
    ):
        got = {
            (r.doc_a, r.doc_b)
            for r in D.dedup_fuzzy_levenshtein(spark, "ignored").collect()
        }
    assert got == {(1000, 1001)}


def test_levenshtein_block_cap_null_key_rows_never_join(spark):
    # NULL lang -> NULL block key: excluded from blocks on both engines
    # (the oracle filters block_key IS NOT NULL; Spark's window would
    # otherwise group the NULL partition).
    from unittest import mock

    import quty_server_spark.operators.dedup as D

    rows = [
        (1, "same head here", None, 50),
        (2, "same head here", None, 50),
        (3, "same head here", "en", 50),
        (4, "same head here!", "en", 50),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    with mock.patch.object(D, "load_table", lambda spark_, sf, name: d):
        got = {
            (r.doc_a, r.doc_b)
            for r in D.dedup_fuzzy_levenshtein(spark, "ignored").collect()
        }
    assert got == {(3, 4)}


def test_component_labels_memoized_per_session_and_sf(spark):
    # The BSP label table is the repo's most expensive job; dedup_cluster,
    # dedup_cluster_stats and dedup_keep_canonical must share ONE labeling
    # pass per (session, sf_dir). Pin: the second call returns the cached
    # handle (identity, not just equality), distinct sf_dirs get distinct
    # entries, and a fresh session starts cold (driver sessions rebuild —
    # correctness never depends on the cache).
    sf = "/root/testdata/sf0.001"
    spark._quty_cluster_labels = {}  # start cold regardless of test order
    first = D.simhash_component_labels(spark, sf)
    second = D.simhash_component_labels(spark, sf)
    assert second is first
    assert set(spark._quty_cluster_labels) == {sf}
    # The cached frame is materialized (localCheckpoint) — consuming it
    # twice must not re-run the BSP supersteps; cheap sanity: same rows.
    assert first.count() == second.count()


def test_incremental_simhash_equals_restricted_full_pairs(spark):
    # The asymmetric shard-vs-lake join must find EXACTLY the full pair
    # set restricted to (incoming, lake) — no pair invented, none lost at
    # the band boundary. Normalize the full set's doc_a < doc_b order to
    # the incremental's (incoming, lake) orientation.
    sf = "/root/testdata/sf0.001"
    inc = {
        (r.incoming_doc_id, r.lake_doc_id, r.hamming)
        for r in D.dedup_incremental_simhash(spark, sf).collect()
    }
    full = set()
    for r in D.dedup_simhash(spark, sf).collect():
        a_new, b_new = r.doc_a % 10 == 0, r.doc_b % 10 == 0
        if a_new and not b_new:
            full.add((r.doc_a, r.doc_b, r.hamming))
        elif b_new and not a_new:
            full.add((r.doc_b, r.doc_a, r.hamming))
    assert inc == full
    assert inc  # fixture sanity: the slice actually has near-dups


def test_incremental_capped_is_subset_of_uncapped(spark):
    # The cap only REMOVES candidates (saturated buckets leave the
    # universe before the shard/lake split) — it can never invent a pair,
    # and surviving pairs keep their exact hamming.
    sf = "/root/testdata/sf0.001"
    capped = {
        (r.incoming_doc_id, r.lake_doc_id, r.hamming)
        for r in D.dedup_incremental_simhash_capped(spark, sf).collect()
    }
    full = {
        (r.incoming_doc_id, r.lake_doc_id, r.hamming)
        for r in D.dedup_incremental_simhash(spark, sf).collect()
    }
    assert capped <= full


def test_sig_grain_labeling_equals_doc_grain(spark):
    # r10: simhash_component_labels mines and labels at signature grain
    # (hamming-0 cliques collapsed to their min-doc_id rep) and expands
    # back. Pin exact equivalence against the direct doc-grain path:
    # components over dedup_simhash's full pair list, min-label each.
    sf = "/root/testdata/sf0.001"
    spark._quty_cluster_labels = {}  # force a cold sig-grain build
    fast = {
        (r.node, r.lbl)
        for r in D.simhash_component_labels(spark, sf).collect()
    }
    pairs = D.dedup_simhash(spark, sf).select("doc_a", "doc_b")
    ref_labels, _ = D.min_label_components(spark, pairs)
    ref = {(r.node, r.lbl) for r in ref_labels.collect()}
    assert fast == ref
    assert fast  # fixture sanity: near-dup nodes exist


def test_incremental_minhash_equals_restricted_lsh_pairs(spark):
    # The MinHash gate must find EXACTLY dedup_minhash_lsh's verified
    # pair set restricted to (incoming, lake) orientation — band
    # asymmetry changes cost shape, never the answer.
    sf = "/root/testdata/sf0.001"
    inc = {
        (r.incoming_doc_id, r.lake_doc_id, round(r.jaccard, 9))
        for r in D.dedup_incremental_minhash(spark, sf).collect()
    }
    full = set()
    for r in D.dedup_minhash_lsh(spark, sf).collect():
        a_new, b_new = r.doc_a % 10 == 0, r.doc_b % 10 == 0
        if a_new and not b_new:
            full.add((r.doc_a, r.doc_b, round(r.jaccard, 9)))
        elif b_new and not a_new:
            full.add((r.doc_b, r.doc_a, round(r.jaccard, 9)))
    assert inc == full
    assert inc  # fixture sanity: the slice actually has near-dups


def test_incremental_minhash_capped_vacuous_on_fixture(spark):
    # Fixture buckets max out at 3 docs << MINHASH_BUCKET_CAP, so the
    # capped gate IS the uncapped gate there — the property that lets
    # both share hash-green oracle rows while the cap only ever bites
    # on boilerplate-clone corpora.
    sf = "/root/testdata/sf0.001"
    cap = {
        (r.incoming_doc_id, r.lake_doc_id, round(r.jaccard, 9))
        for r in D.dedup_incremental_minhash_capped(spark, sf).collect()
    }
    unc = {
        (r.incoming_doc_id, r.lake_doc_id, round(r.jaccard, 9))
        for r in D.dedup_incremental_minhash(spark, sf).collect()
    }
    assert cap == unc and cap


def test_minhash_bucket_cap_drops_clone_buckets(spark, tmp_path):
    # 40 byte-identical clones saturate every (band_id, sig) bucket
    # (size 40 > MINHASH_BUCKET_CAP): the uncapped gate pays
    # shard-clones x lake-clones pairs for docs exact dedup already
    # catches; the capped gate drops the saturated buckets and keeps
    # only the rare-text near-dup pair.
    rows = [
        (d, "the common boilerplate body repeated for every page")
        for d in range(40)
    ]
    rows += [
        (50, "rare alpha beta gamma delta epsilon zeta"),
        (41, "rare alpha beta gamma delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    unc = {
        (r.incoming_doc_id, r.lake_doc_id)
        for r in D.dedup_incremental_minhash(spark, sf).collect()
    }
    cap = {
        (r.incoming_doc_id, r.lake_doc_id)
        for r in D.dedup_incremental_minhash_capped(spark, sf).collect()
    }
    # clones: shard {0,10,20,30} x lake (36 others) + the rare pair
    assert len(unc) == 4 * 36 + 1 and (50, 41) in unc
    assert cap == {(50, 41)}


def test_incremental_minhash_artifact_equals_recomputing(spark):
    # The artifact-backed gate must be value-identical to the
    # recomputing gate — same pairs, same exact Jaccard — with the
    # lake's band table and sizes read from parquet instead of
    # recomputed.
    sf = "/root/testdata/sf0.001"
    art = {
        (r.incoming_doc_id, r.lake_doc_id, round(r.jaccard, 9))
        for r in D.dedup_incremental_minhash_artifact(spark, sf).collect()
    }
    rec = {
        (r.incoming_doc_id, r.lake_doc_id, round(r.jaccard, 9))
        for r in D.dedup_incremental_minhash(spark, sf).collect()
    }
    assert art == rec and art


def test_minhash_artifact_rebuild_is_idempotent(spark):
    # The write-once MinHash-band artifact: a forced rebuild (rmtree +
    # rewrite) must land the same band table — per-band summary
    # identical across two builds, memoized path stable in-session,
    # and the path is session-keyed (contains the application id).
    from tests.conftest import SF_DIR

    first = {
        (r.band_id, r.n_rows, r.n_buckets, r.n_docs, r.sum_nsh)
        for r in D.sink_lake_minhash_artifact(spark, SF_DIR).collect()
    }
    p1 = D.lake_minhash_artifact(spark, SF_DIR)
    second = {
        (r.band_id, r.n_rows, r.n_buckets, r.n_docs, r.sum_nsh)
        for r in D.sink_lake_minhash_artifact(spark, SF_DIR).collect()
    }
    p2 = D.lake_minhash_artifact(spark, SF_DIR)
    assert first == second
    assert p1 == p2
    assert spark.sparkContext.applicationId in p1


def test_incremental_cluster_equals_full_recompute_including_bridges(spark):
    """dedup_cluster_incremental's contraction must agree with the
    full-corpus recompute on every shard doc — INCLUDING bridge docs
    (a shard doc whose gate pairs touch >= 2 distinct lake clusters,
    forcing a merge the standing lake labels alone cannot express).
    The fixture corpus contains real bridges at sf0.001 (probed: 3),
    so this is exercised on genuine data, not a vacuous subset."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    inc = {
        (r.doc_id, r.cluster_id)
        for r in D.dedup_cluster_incremental(spark, sf).collect()
    }
    full = {
        (r.doc_id, r.cluster_id)
        for r in D.dedup_cluster(spark, sf)
        .filter(F.col("doc_id") % 10 == 0)
        .collect()
    }
    assert inc == full and inc
    # Non-vacuity: at least one shard doc's gate pairs touch >= 2
    # distinct standing lake clusters (the bridge-merge case).
    lab = spark.read.parquet(
        D.lake_cluster_labels_artifact(spark, sf)
    ).select(F.col("node").alias("lake_doc_id"), "lbl")
    lake_sig = spark.read.parquet(
        D.lake_signature_artifact(spark, sf)
    ).alias("o")
    shard = (
        D.simhash_bands(D.simhash_sigs(spark, sf))
        .filter(F.col("doc_id") % 10 == 0)
        .alias("n")
    )
    gate = (
        shard.join(
            lake_sig,
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.band_val") == F.col("o.band_val")),
        )
        .filter(
            F.bit_count(F.col("n.sig").bitwiseXOR(F.col("o.sig")))
            <= D.HAMMING_MAX
        )
        .select(
            F.col("n.doc_id").alias("incoming_doc_id"),
            F.col("o.doc_id").alias("lake_doc_id"),
        )
        .distinct()
    )
    bridges = (
        gate.join(lab, "lake_doc_id", "left")
        .select(
            "incoming_doc_id",
            F.coalesce("lbl", "lake_doc_id").alias("clbl"),
        )
        .groupBy("incoming_doc_id")
        .agg(F.count_distinct("clbl").alias("k"))
        .filter("k >= 2")
        .count()
    )
    assert bridges >= 1, (
        "fixture no longer contains a bridge-merge case — the "
        "equality above would not exercise cross-cluster merging"
    )


def test_lake_cluster_labels_artifact_is_lake_only(spark):
    """The standing label artifact must contain NO shard docs (its
    whole point is that lake-vs-lake mining ran without tonight's
    shard) and every label must be a lake doc id."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    art = spark.read.parquet(D.lake_cluster_labels_artifact(spark, sf))
    assert art.filter(F.col("node") % 10 == 0).count() == 0
    assert art.filter(F.col("lbl") % 10 == 0).count() == 0
    # Labels are component minima: lbl <= node everywhere.
    assert art.filter(F.col("lbl") > F.col("node")).count() == 0


def test_relabel_queue_on_crafted_bridge_merge(spark, tmp_path):
    """A corpus with a GENUINE standing-cluster merge, built by
    signature construction (dominant-pair majority trick): tokens wa,
    wb sit at SimHash distance 6 (clusters A and B never pair:
    6 > HAMMING_MAX), and the bridge text 10*wa + 10*wb + filler has
    the agreeing bits of both plus filler-decided tie bits — exactly
    distance 3 from EACH cluster. The shard bridge doc must therefore
    merge A and B, dedup_cluster_incremental must give all three the
    full-recompute label (A's, since 1001 < 2000), and the relabel
    queue must contain exactly B's standing label with its 2 artifact
    rows."""
    from pyspark.sql import functions as F

    wa, wb, filler = "tok326", "tok8533", "tok42"
    ta = " ".join([wa] * 10)
    tb = " ".join([wb] * 10)
    tx = " ".join([wa] * 10 + [wb] * 10 + [filler])
    rows = [
        (1001, ta), (1011, ta),   # standing cluster A (label 1001)
        (1003, tb), (1013, tb),   # standing cluster B (label 1003)
        (2000, tx),               # tonight's bridge (shard: % 10 == 0)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")

    # Sanity: the crafted distances hold in the engine's own sigs.
    sigs = {r.doc_id: r.sig for r in D.simhash_sigs(spark, sf).collect()}
    ham = lambda a, b: bin(sigs[a] ^ sigs[b]).count("1")
    assert ham(1001, 1003) == 6   # clusters never pair directly
    assert ham(2000, 1001) == 3   # bridge near A
    assert ham(2000, 1003) == 3   # bridge near B

    # Standing lake state: two 2-doc clusters.
    art = {
        (r.node, r.lbl)
        for r in spark.read.parquet(
            D.lake_cluster_labels_artifact(spark, sf, rebuild=True)
        ).collect()
    }
    assert art == {(1001, 1001), (1011, 1001), (1003, 1003), (1013, 1003)}

    # Incremental assignment merges everything into label 1001 — and
    # equals the full recompute.
    D.lake_signature_artifact(spark, sf, rebuild=True)
    inc = {
        (r.doc_id, r.cluster_id)
        for r in D.dedup_cluster_incremental(spark, sf).collect()
    }
    assert inc == {(2000, 1001)}
    full = {
        (r.doc_id, r.cluster_id)
        for r in D.dedup_cluster(spark, sf).collect()
    }
    assert full == {
        (2000, 1001), (1001, 1001), (1011, 1001),
        (1003, 1001), (1013, 1001),
    }

    # The relabel queue: exactly B's standing label, 2 artifact rows.
    queue = {
        (r.old_lbl, r.new_lbl, r.n_docs)
        for r in D.dedup_cluster_relabel_queue(spark, sf).collect()
    }
    assert queue == {(1003, 1001, 2)}


def test_relabel_apply_maintained_equals_rebuilt_and_touches_only_queued(
    spark, tmp_path
):
    """The relabel APPLY on the crafted bridge-merge corpus: after one
    night of maintenance the artifact's content equals a full-corpus
    recompute (maintained == rebuilt), the rewrite physically touched
    ONLY the queued cluster's home bucket (every other pre-existing
    file is byte-identical), and the append added files without
    rewriting any."""
    import glob
    import os

    from pyspark.sql import functions as F

    wa, wb, filler = "tok326", "tok8533", "tok42"
    ta = " ".join([wa] * 10)
    tb = " ".join([wb] * 10)
    tx = " ".join([wa] * 10 + [wb] * 10 + [filler])
    rows = [(1001, ta), (1011, ta), (1003, tb), (1013, tb), (2000, tx)]
    sf = str(tmp_path / "day1")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )

    # Yesterday's state in home-bucket layout, built by hand so the
    # maintenance step can be snapshotted in between.
    D.lake_signature_artifact(spark, sf, rebuild=True)
    art0 = spark.read.parquet(
        D.lake_cluster_labels_artifact(spark, sf, rebuild=True)
    )
    path = str(tmp_path / "maintained")
    art0b = art0.withColumn(
        "lbl_bucket",
        F.pmod(F.col("lbl"), F.lit(D.LABEL_HOME_BUCKETS)).cast("int"),
    )
    (
        art0b.sortWithinPartitions("lbl_bucket", "node")
        .write.partitionBy("lbl_bucket")
        .parquet(path)
    )
    art0b.select("lbl", "lbl_bucket").distinct().write.parquet(
        f"{path}/_label_homes"
    )

    def snap():
        return {
            f: (os.path.getsize(f), os.path.getmtime(f))
            for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
            # the _label_homes sidecar is metadata, rewritten nightly
            if "_label_homes" not in f
        }

    before = snap()
    D.apply_cluster_label_maintenance(spark, sf, path, staged=False)
    after = snap()

    # Maintained content == full-corpus recompute (components >= 2).
    maintained = {
        (r.node, r.lbl)
        for r in spark.read.parquet(path).select("node", "lbl").collect()
    }
    assert maintained == {
        (1001, 1001), (1011, 1001), (1003, 1001), (1013, 1001),
        (2000, 1001),
    }

    # Physical locality: queued cluster B (lbl 1003) lives in home
    # bucket 1003 % 32 = 11 — the ONLY bucket whose files were
    # rewritten. Appends (2000 -> lbl 1001) land as NEW files in bucket
    # 1001 % 32 = 9; every pre-existing file outside bucket 11 is
    # byte-identical (same size AND mtime).
    affected_dir = f"lbl_bucket={1003 % D.LABEL_HOME_BUCKETS}"
    for f, stat in before.items():
        if affected_dir not in f:
            assert f in after, f"maintenance deleted untouched file {f}"
            assert after[f] == stat, f"maintenance rewrote untouched {f}"
    assert any(f not in before for f in after), "append added no files"
    # The rewrite replaced bucket 11's content (old files gone or new
    # files present there).
    b11_before = {f for f in before if affected_dir in f}
    b11_after = {f for f in after if affected_dir in f}
    assert b11_before and b11_after and b11_before != b11_after


def test_tomorrow_gate_against_maintained_artifact_equals_full_recompute(
    spark, tmp_path
):
    """The day-2 contract the maintenance exists for: after day-1's
    bridge merge is APPLIED, a new day-2 doc near cluster B must get
    the MERGED component's label (1001) — which equals a full
    recompute over the complete corpus history — while the same gate
    against the STALE (un-maintained) artifact would answer B's old
    label (1003). Proves the maintained artifact is load-bearing, not
    decorative."""
    wa, wb, filler = "tok326", "tok8533", "tok42"
    ta = " ".join([wa] * 10)
    tb = " ".join([wb] * 10)
    tx = " ".join([wa] * 10 + [wb] * 10 + [filler])
    day1 = [(1001, ta), (1011, ta), (1003, tb), (1013, tb), (2000, tx)]
    # Day 2: 2000 was admitted yesterday (lives only in the artifact);
    # tonight's shard is 3000, a verbatim copy of cluster B's text.
    day2 = [(1001, ta), (1011, ta), (1003, tb), (1013, tb), (3000, tb)]
    full = day1 + [(3000, tb)]
    dirs = {}
    for name, rows in (("day1", day1), ("day2", day2), ("full", full)):
        sf = str(tmp_path / name)
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.parquet(f"{sf}/documents.parquet")
        dirs[name] = sf

    # Day-1 maintenance (the bridge merge applied).
    D.lake_signature_artifact(spark, dirs["day1"], rebuild=True)
    stale = D.lake_cluster_labels_artifact(
        spark, dirs["day1"], rebuild=True
    )
    maintained = D.maintained_cluster_labels_artifact(
        spark, dirs["day1"], rebuild=True, staged=False
    )

    # Day-2 gate, standing labels = the MAINTAINED artifact.
    D.lake_signature_artifact(spark, dirs["day2"], rebuild=True)
    got = {
        (r.node, r.lbl)
        for r in D._incremental_cluster_labels(
            spark, dirs["day2"], labels_path=maintained
        )
        .filter("node = 3000")
        .collect()
    }
    # Full recompute over the complete corpus history (incl. 2000).
    want = {
        (r.doc_id, r.cluster_id)
        for r in D.dedup_cluster(spark, dirs["full"])
        .filter("doc_id = 3000")
        .collect()
    }
    assert got == want == {(3000, 1001)}

    # Same gate against the STALE artifact: provably wrong (B's old
    # label) — the maintenance is what makes tomorrow's answer right.
    stale_got = {
        (r.node, r.lbl)
        for r in D._incremental_cluster_labels(
            spark, dirs["day2"], labels_path=stale
        )
        .filter("node = 3000")
        .collect()
    }
    assert stale_got == {(3000, 1003)}


def test_two_round_maintenance_equals_rebuild_via_sidecar(spark, tmp_path):
    """Round-N correctness of the relabel APPLY: after round 1 merges
    B into A (label 1001 now owns rows in BOTH home buckets 9 and 11),
    a round-2 shard doc 200 absorbs the whole merged cluster (min id
    200 < 1001). The _label_homes sidecar is what lets round 2 find
    label 1001's rows in bucket 11 — a pmod(1001) guess would rewrite
    bucket 9 only and leave B's rows stale. Also exercises the
    standing-label-is-a-shard-id case: the round-2 queue must contain
    1001 -> 200 even though... (1001 is lake-shaped here; the shard-id
    case is 200 itself becoming standing, checked at the end)."""
    from pyspark.sql import functions as F

    wa, wb, filler = "tok326", "tok8533", "tok42"
    ta = " ".join([wa] * 10)
    tb = " ".join([wb] * 10)
    tx = " ".join([wa] * 10 + [wb] * 10 + [filler])
    lake = [(1001, ta), (1011, ta), (1003, tb), (1013, tb)]
    day1 = lake + [(2000, tx)]          # bridge merges A and B
    day2 = lake + [(200, ta)]           # absorbs the merged cluster
    day3 = lake + [(40, ta)]            # absorbs again (standing=200)
    dirs = {}
    for name, rows in (("day1", day1), ("day2", day2), ("day3", day3)):
        sf = str(tmp_path / name)
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.parquet(f"{sf}/documents.parquet")
        dirs[name] = sf

    # Round 1: base build + bridge merge applied.
    D.lake_signature_artifact(spark, dirs["day1"], rebuild=True)
    path = D.maintained_cluster_labels_artifact(
        spark, dirs["day1"], rebuild=True, staged=False
    )
    content = lambda: {
        (r.node, r.lbl)
        for r in spark.read.parquet(path).select("node", "lbl").collect()
    }
    assert content() == {
        (1001, 1001), (1011, 1001), (1003, 1001), (1013, 1001),
        (2000, 1001),
    }
    homes = lambda: {
        (r.lbl, r.lbl_bucket)
        for r in spark.read.parquet(f"{path}/_label_homes").collect()
    }
    nb = D.LABEL_HOME_BUCKETS
    assert homes() == {(1001, 1001 % nb), (1001, 1003 % nb)}

    # Round 2: doc 200 near A -> min of the merged component is 200.
    # The sidecar must route the rewrite to BOTH buckets 9 and 11.
    D.lake_signature_artifact(spark, dirs["day2"], rebuild=True)
    D.apply_cluster_label_maintenance(spark, dirs["day2"], path)
    assert content() == {
        (1001, 200), (1011, 200), (1003, 200), (1013, 200),
        (2000, 200), (200, 200),
    }
    assert homes() == {
        (200, 1001 % nb), (200, 1003 % nb), (200, 200 % nb),
    }

    # Round 3: the standing label is now a SHARD-id doc (200). The
    # membership-based queue must still rewrite it (id arithmetic
    # would filter it out), and 200 must NOT be re-appended.
    D.lake_signature_artifact(spark, dirs["day3"], rebuild=True)
    D.apply_cluster_label_maintenance(spark, dirs["day3"], path)
    got = content()
    assert got == {
        (1001, 40), (1011, 40), (1003, 40), (1013, 40),
        (2000, 40), (200, 40), (40, 40),
    }, got


def test_maintenance_apply_is_idempotent(spark, tmp_path):
    """Re-running the same night's APPLY (operator retry, replayed job)
    must leave the artifact AND the sidecar byte-for-byte unchanged in
    content: the rewrite re-matches nothing (labels already moved) and
    the append's bucket-pruned anti-join drops every already-stored
    row. Covers both memo states — the second call here hits the
    session memo; the fresh-session case reduces to an empty queue plus
    the same anti-join."""
    wa, wb, filler = "tok326", "tok8533", "tok42"
    ta = " ".join([wa] * 10)
    tb = " ".join([wb] * 10)
    tx = " ".join([wa] * 10 + [wb] * 10 + [filler])
    rows = [(1001, ta), (1011, ta), (1003, tb), (1013, tb), (2000, tx)]
    sf = str(tmp_path / "day1")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    D.lake_signature_artifact(spark, sf, rebuild=True)
    path = D.maintained_cluster_labels_artifact(
        spark, sf, rebuild=True, staged=False
    )
    content = lambda: sorted(
        (r.node, r.lbl)
        for r in spark.read.parquet(path).select("node", "lbl").collect()
    )
    homes = lambda: sorted(
        (r.lbl, r.lbl_bucket)
        for r in spark.read.parquet(f"{path}/_label_homes").collect()
    )
    c1, h1 = content(), homes()
    # Second apply of the SAME night against the already-maintained
    # artifact.
    D.apply_cluster_label_maintenance(spark, sf, path)
    assert content() == c1
    assert homes() == h1


def test_maintenance_cross_epoch_shard_singleton_no_duplicate_append(
    spark, tmp_path
):
    """Pins the r13-advice duplicate-append case: a gate-touched
    null-label doc that is ITSELF a ``% 10 == 0`` prior-epoch shard doc
    lands in BOTH append branches (shard anti-join AND singles
    semi-join). The branches' rows are identical, so the maintained
    artifact must hold exactly one row per node — the COUNT-based
    n_docs oracle contract. Drives the physical write path directly
    with the crafted state the fixtures cannot produce."""
    base = spark.createDataFrame([(1, 1)], "node long, lbl long")
    path = str(tmp_path / "labels")
    D._write_home_bucket_layout(base, path)
    # Tonight's BSP: node 20 (shard-shaped, % 10 == 0, never stored)
    # joined component 1 — and the gate ALSO surfaced it as a touched
    # lake singleton (the cross-epoch overlap).
    labels = spark.createDataFrame(
        [(1, 1), (20, 1)], "node long, lbl long"
    )
    singles = spark.createDataFrame([(20,)], "lake_doc_id long")
    D._apply_maintenance_for_state(spark, path, labels, singles)
    got = sorted(
        (r.node, r.lbl)
        for r in spark.read.parquet(path).select("node", "lbl").collect()
    )
    assert got == [(1, 1), (20, 1)]
