"""Retraction: oracle-verified DELETE propagation through the artifact
tier — the lifecycle verb the r13 verdict named as the standing-lake
story's last gap ("What's missing" #3). A document REMOVED from the
lake (takedown, license revocation, PII purge) must not keep poisoning
the nightly gates through its leftover band rows, minhash rows, IVF
postings, and passage digests, and the clusters it bridged must be
re-labeled (a removal can SPLIT a component).

Physical device: the home-bucket/DPP rewrite the relabel APPLY proved
(operators/dedup.py apply_cluster_label_maintenance) — read ONLY the
partitions holding victim rows (a broadcast join on the partition
column, dynamic partition pruning keeps every other directory unread),
drop the victims with a broadcast anti-join, and overwrite those
partitions in place (``partitionOverwriteMode=dynamic``). Partitions
whose every row was a victim are removed explicitly (a driver-side
loop bounded by the artifact's PARTITION count — metadata grain, never
rows).

Cost follows the victim set, not the lake, wherever the partition key
can be derived from the victims themselves: the PASSAGE artifact's
digest-prefix dirs come from windowing the victims' own text
(|victims| work — a takedown request carries the document, or it is
fetched by id before deletion), and the IVF artifact's cells come from
assigning the victims' vectors against the K-row centroid SIDECAR. The
two BAND artifacts are content-hash partitioned (band_id), so any
victim touches every band directory — the retraction there is one
columnar anti-join pass over the artifact, the unavoidable floor
without a doc-keyed sublayout and the reason production lakes
tombstone-then-compact; the pass is still shuffle-free (victims
broadcast) and preserves the within-file sort contract.

Quantizer note: IVF retraction drops posting rows but does NOT retrain
the coarse quantizer (the centroid sidecar is untouched) — the same
freeze contract the append sink relies on. A PII-grade purge of
centroid VECTORS themselves is a quantizer retrain, i.e. a scheduled
index rebuild — the compaction-tier hygiene the label family already
prices.

Cluster-label retraction re-labels ONLY the affected clusters: victims'
labels are located with one narrow columnar (node, lbl) scan (the
unavoidable read given only doc ids; a node-grain sidecar would remove
it), the affected labels' home buckets come from the ``_label_homes``
sidecar (a DPP-pruned read, never a lake scan), and the surviving
members are re-clustered from their OWN signatures through the exact
labeling core every other consumer shares
(:func:`~quty_server_spark.operators.dedup._labels_from_sigs`).
Removing nodes only removes edges, so affected clusters can only stay,
split, or dissolve — no new cross-cluster edge can appear, which is
what makes the affected-clusters-only recompute equal to a full one
(pinned in tests/test_retract_semantics.py).

Reference analog: quty-server's unsubscribe/kick cascade
(lib/ChannelHub.js:141-210) removes a client from every channel it
touched — this module is that verb lifted to the artifact tier.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from quty_server_spark.operators._helpers import load_table
from quty_server_spark.operators.dedup import (
    _BRIDGE_FILL,
    _BRIDGE_WA,
    _BRIDGE_WB,
    _labels_from_sigs,
    _passage_artifact_summary,
    _passage_pfx,
    _passage_windows,
    _sig_artifact_summary,
    _minhash_artifact_summary,
    _write_home_bucket_layout,
    lake_minhash_artifact,
    lake_passage_artifact,
    lake_signature_artifact,
    simhash_sigs_docs,
    SQL_MINHASH,
    SQL_PASSAGE_WINDOWS,
    SQL_SHINGLES,
    SQL_SIMHASH,
)
from quty_server_spark.operators.dedup import HAMMING_MAX
from quty_server_spark.operators.similarity import (
    _corpus,
    _ivf_artifact_summary,
    _ivf_cells_plan,
    ivf_postings_artifact,
    SQL_CORPUS,
    SQL_IVF_CENT,
)
from quty_server_spark.plans.registry import registry
from quty_server_spark.session import session_tmp_dir

# The deterministic victim set: lake docs / vectors with id % 10 == 3.
# Disjoint from tonight's shard (% 10 == 0) and yesterday's append batch
# (% 10 == 5), so the retraction composes with both standing lifecycle
# fixtures; ~10% of the lake, so every family's removal is non-vacuous
# on the driver corpus at every SF.
RETRACT_MOD = 3

# Staged split fixture (same device as dedup.STAGED_BRIDGE_ROWS, and the
# same probed token trio): two 2-doc lake clusters C and D at SimHash
# distance 6 (never pair directly) plus a LAKE-resident bridge at
# distance 3 from each — all five stored in the standing label artifact
# as ONE cluster. The bridge's id is ≡ RETRACT_MOD (mod 10), so the
# retraction removes exactly the articulation point and the cluster must
# SPLIT into {C}, {D} — the case the verdict named, guaranteed on any
# fixture corpus.
RETRACT_STAGED_ROWS: list[tuple[int, str]] = [
    (9003001, " ".join([_BRIDGE_WA] * 10)),  # cluster C
    (9003011, " ".join([_BRIDGE_WA] * 10)),
    (9003007, " ".join([_BRIDGE_WB] * 10)),  # cluster D
    (9003017, " ".join([_BRIDGE_WB] * 10)),
    # lake bridge — the victim (9003013 % 10 == RETRACT_MOD)
    (9003013, " ".join([_BRIDGE_WA] * 10 + [_BRIDGE_WB] * 10 + [_BRIDGE_FILL])),
]


def retract_staged_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table with the five RETRACT_STAGED_ROWS appended —
    the Spark twin of SQL_DOCS_RSTAGED (same plan-shape argument as
    :func:`~quty_server_spark.operators.dedup.staged_documents`)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(
        RETRACT_STAGED_ROWS, "doc_id long, text string"
    )
    return d.unionByName(extra)


def _doc_victims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Victim doc ids (broadcast-sized: takedown sets are small by
    nature — a mass purge is a rebuild, not a retraction)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == RETRACT_MOD)
        .select("doc_id")
    )


def _retract_rows(
    spark: SparkSession,
    path: str,
    part_col: str,
    affected: DataFrame,
    victims: DataFrame,
    id_col: str,
    sort_key: str,
) -> None:
    """The shared physical DELETE: read ONLY the affected partitions
    (broadcast join on the partition column — DPP keeps every other
    directory unread, plan-pinned in tests/test_scale_plans.py), drop
    victim rows (broadcast anti-join), and dynamically overwrite those
    partitions, preserving the within-file sort contract. Partitions
    left with zero rows are removed explicitly — dynamic overwrite
    cannot delete a partition absent from its input — via a driver
    loop over the (metadata-grain) affected-partition list."""
    affected = affected.select(
        F.col(part_col)
        .cast(dict(spark.read.parquet(path).dtypes)[part_col])
        .alias(part_col)
    ).distinct()
    # Materialize BEFORE overwriting: Spark (correctly) refuses a plan
    # that overwrites a path it is also reading. ONE eager checkpoint of
    # the post-anti-join survivors suffices (the anti-join is a map-side
    # broadcast probe, so folding it into the same pass adds no shuffle)
    # — checkpointing the touched rows separately first was a second
    # full materialization of nearly the same bytes.
    touched = _retract_touched_rows(spark, path, part_col, affected)
    kept = touched.join(
        broadcast(victims.withColumnRenamed(victims.columns[0], id_col)),
        id_col,
        "left_anti",
    ).localCheckpoint(eager=True)
    (
        kept.sortWithinPartitions(part_col, sort_key)
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(part_col)
        .mode("overwrite")
        .parquet(path)
    )
    kept_parts = {r[0] for r in kept.select(part_col).distinct().collect()}
    for r in affected.collect():
        if r[0] not in kept_parts:
            shutil.rmtree(
                os.path.join(path, f"{part_col}={r[0]}"), ignore_errors=True
            )


def _retract_touched_rows(
    spark: SparkSession, path: str, part_col: str, affected: DataFrame
) -> DataFrame:
    """The retraction's ENTIRE artifact read: the partitioned artifact
    joined (broadcast) against the affected-partition set on the
    partition column — dynamic partition pruning keeps every unaffected
    directory unread (plan-pinned in tests/test_scale_plans.py).
    Factored out because :func:`_retract_rows` checkpoints it
    immediately (an RDD leaf is opaque to explain), so the pin targets
    this builder — the same convention as
    dedup._maintenance_touched_rows."""
    return spark.read.parquet(path).join(broadcast(affected), part_col)


def _copy_artifact(src: str, dst: str) -> None:
    """Byte-faithful private copy of a standing artifact. The retract
    queries operate on a copy because the base builders' session memos
    are shared by every other registered query — in production the
    retraction runs on the standing artifact in place; the copy keeps
    the untouched-files byte-identity pin meaningful (the unaffected
    files ARE the original build's bytes)."""
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(src, dst)


def retracted_artifact_paths(
    spark: SparkSession, sf_dir: str, rebuild: bool = False,
    post: "callable | None" = None,
) -> dict[str, str]:
    """Private copies of the four standing artifacts with the victim
    set physically retracted from each — memoized per (session,
    sf_dir) like every artifact builder.

    ``post`` (r17 continuation, guide §2.6): an optional
    ``(family, path) -> None`` callback applied INSIDE each family's
    worker thread right after its rewrite lands — the retract sink
    passes its per-family summary materializer here so the early
    families' read-back + summary aggregation overlaps the IVF
    straggler's rewrite instead of waiting for the whole pool. The
    callback's effects are per-call (the memo stores paths only); on a
    memo hit without a rebuild the callback runs serially over the
    cached paths.

    r17 optimization (guide §2.6 — overlap independent jobs): the four
    family retractions share NOTHING but the victim frame (checkpointed
    up front), so they run in a 4-thread pool instead of sequentially —
    each thread's copy + DPP-scoped read + anti-join + dynamic
    overwrite back-fills the others' straggler tails, and the
    driver-side ``copytree`` staging overlaps the other families' Spark
    jobs. The four BASE artifacts are materialized serially FIRST so
    the threads never race to first-build a shared memoized path. Rows
    are unchanged (each family's jobs are untouched — only their
    scheduling overlaps); at cluster scale the same structure holds:
    four independent partition-scoped rewrite jobs back-fill each
    other's tails under FIFO scheduling."""
    cache = getattr(spark, "_quty_retract_artifacts", None)
    if cache is None:
        cache = {}
        spark._quty_retract_artifacts = cache
    paths = cache.get(sf_dir)
    if paths is None or rebuild:
        from concurrent.futures import ThreadPoolExecutor

        vic = _doc_victims(spark, sf_dir).localCheckpoint(eager=True)
        vdocs = load_table(spark, sf_dir, "documents").join(
            broadcast(vic), "doc_id", "leftsemi"
        )
        # Base-artifact pre-warm (serial): memoized builders are not
        # safe to FIRST-build from two threads.
        base = {
            "sig": lake_signature_artifact(spark, sf_dir),
            "minhash": lake_minhash_artifact(spark, sf_dir),
            "passage": lake_passage_artifact(spark, sf_dir),
            "ivf": ivf_postings_artifact(spark, sf_dir),
        }

        # -- SimHash band artifact: band_id is content-keyed, so any
        # victim touches all 4 dirs; affected = every band partition.
        def _do_sig() -> str:
            p = session_tmp_dir(spark, "quty_retract_sig", sf_dir)
            _copy_artifact(base["sig"], p)
            bands4 = spark.range(4).select(
                F.col("id").cast("int").alias("band_id")
            )
            _retract_rows(
                spark, p, "band_id", bands4, vic, "doc_id", "band_val"
            )
            return p

        # -- MinHash band artifact: same content-keyed layout, 8 dirs.
        def _do_minhash() -> str:
            p = session_tmp_dir(spark, "quty_retract_minhash", sf_dir)
            _copy_artifact(base["minhash"], p)
            bands8 = spark.range(8).select(
                F.col("id").cast("int").alias("band_id")
            )
            _retract_rows(spark, p, "band_id", bands8, vic, "doc_id", "sig")
            return p

        # -- Passage-digest artifact: affected prefixes derive from the
        # victims' OWN windows (|victims| work); the other 15/16-ish of
        # the lake's directories are never read. The selective filter
        # makes Spark insert the DPP subquery (same device as the
        # maintenance rewrite).
        def _do_passage() -> str:
            p = session_tmp_dir(spark, "quty_retract_passages", sf_dir)
            _copy_artifact(base["passage"], p)
            pfx = (
                _passage_windows(vdocs)
                .select(_passage_pfx())
                .distinct()
                .filter(F.col("pfx") >= "0")
            )
            _retract_rows(spark, p, "pfx", pfx, vic, "doc_id", "passage_md5")
            return p

        # -- IVF posting lists: affected cells derive from assigning the
        # victims' vectors against the K-row centroid SIDECAR (never a
        # posting scan); the quantizer itself is NOT retrained.
        def _do_ivf() -> str:
            p = session_tmp_dir(spark, "quty_retract_ivf", sf_dir)
            _copy_artifact(base["ivf"], p)
            vvec = _corpus(spark, sf_dir).filter(
                F.col("vec_id") % 10 == RETRACT_MOD
            )
            cent = spark.read.parquet(os.path.join(p, "_centroids"))
            cells = (
                _ivf_cells_plan(vvec, cent)
                .select("cell")
                .distinct()
                .filter(F.col("cell") >= 0)
            )
            vvic = vvec.select("vec_id").localCheckpoint(eager=True)
            _retract_rows(spark, p, "cell", cells, vvic, "vec_id", "vec_id")
            return p

        tasks = {
            "sig": _do_sig,
            "minhash": _do_minhash,
            "passage": _do_passage,
            "ivf": _do_ivf,
        }
        def _run(fam: str, fn) -> str:
            p = fn()
            if post is not None:
                post(fam, p)
            return p

        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = {k: pool.submit(_run, k, fn) for k, fn in tasks.items()}
            paths = {k: f.result() for k, f in futs.items()}
        cache[sf_dir] = paths
    elif post is not None:
        for fam, p in paths.items():
            post(fam, p)
    return paths


# Combined per-partition summary of the four retracted artifacts, in one
# unified (family, part_key, n_rows, n_keys, n_docs, extra) shape. Each
# family's branch is its write-once sink's summary recomputed from the
# base tables over the SURVIVORS (id % 10 <> RETRACT_MOD) — for IVF with
# the centroid set of the ORIGINAL corpus (the frozen-quantizer
# contract). A green row therefore proves retracted ≡ rebuilt-on-
# survivors for every family at once.
SQL_RETRACT_SUMMARY = f"""
    WITH {SQL_SIMHASH.lstrip()},
    sbands AS (
        SELECT doc_id, b.band_id, (sig >> (12 * b.band_id)) & 4095 AS band_val
        FROM simhash, (SELECT unnest(range(0, 4)) AS band_id) b
        WHERE doc_id % 10 <> 0 AND doc_id % 10 <> {RETRACT_MOD}
    ),
    {SQL_SHINGLES.lstrip()},
    {SQL_MINHASH.lstrip()},
    {SQL_PASSAGE_WINDOWS},
    c AS {SQL_CORPUS},
    cent AS {SQL_IVF_CENT},
    assigned AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY list_cosine_similarity(v, cv) DESC, cid) AS arn
        FROM c CROSS JOIN cent
        WHERE c.vec_id % 10 <> {RETRACT_MOD}),
    cells AS (SELECT vec_id, cid AS cell FROM assigned WHERE arn = 1)
    SELECT 'sig' AS family,
           CAST(band_id AS VARCHAR) AS part_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT band_val) AS BIGINT) AS n_keys,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(NULL AS BIGINT) AS extra
    FROM sbands GROUP BY band_id
    UNION ALL
    SELECT 'minhash', CAST(b.band_id AS VARCHAR),
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT b.sig) AS BIGINT),
           CAST(COUNT(DISTINCT b.doc_id) AS BIGINT),
           CAST(SUM(s.n_sh) AS BIGINT)
    FROM bands b JOIN doc_size s ON b.doc_id = s.doc_id
    WHERE b.doc_id % 10 <> 0 AND b.doc_id % 10 <> {RETRACT_MOD}
    GROUP BY b.band_id
    UNION ALL
    SELECT 'passage', substring(passage_md5, 1, 1),
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT passage_md5) AS BIGINT),
           CAST(COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM passage_windows
    WHERE doc_id % 10 <> 0 AND doc_id % 10 <> {RETRACT_MOD}
    GROUP BY substring(passage_md5, 1, 1)
    UNION ALL
    SELECT 'ivf', CAST(cell AS VARCHAR),
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT vec_id) AS BIGINT),
           CAST(COUNT(DISTINCT vec_id) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE vec_id % 20 = 0) AS BIGINT)
    FROM cells GROUP BY cell
    """


@registry.query(
    "sink_lake_artifacts_retract",
    oracle=SQL_RETRACT_SUMMARY,
)
def sink_lake_artifacts_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retract the victim set from all four standing artifact families
    (forced rebuild of the private copies — this IS the takedown job),
    read each result back, and report the four per-partition summaries
    in one tagged frame. The oracle recomputes every summary from the
    base tables over the survivors, so a green row proves retracted ≡
    rebuilt-on-survivors for band rows, minhash rows, passage digests,
    AND IVF postings (the last under the frozen-quantizer contract the
    append sink also relies on). Probe equality and the poisoned-gate
    counterexample are additionally pinned in
    tests/test_retract_semantics.py.

    Scale: per family, cost follows the victims — sidecar/window-derived
    partition sets with DPP-pruned reads for passage and IVF; one
    shuffle-free columnar anti-join pass for the two content-hash-
    partitioned band families (the documented floor); zero read or
    rewrite of any unaffected passage prefix or IVF cell directory
    (untouched files byte-identical, pinned).

    r17 continuation (guide §2.6): each family's read-back + summary
    aggregation is materialized INSIDE that family's rebuild thread
    (the ``post`` hook), so the three early families' summaries run
    while the IVF straggler is still rewriting — previously all four
    summaries waited for the whole pool (~1.4 s of serialized read-back
    after a ~2.5 s rebuild). Rows identical: the same per-family
    summaries, in the same fixed union order."""
    summaries: dict[str, DataFrame] = {}

    def _post(fam: str, p: str) -> None:
        summaries[fam] = _tagged_family_summary(
            fam, spark.read.parquet(p)
        ).localCheckpoint(eager=True)

    retracted_artifact_paths(spark, sf_dir, rebuild=True, post=_post)
    out = None
    for fam in _RETRACT_FAMILY_ORDER:
        part = summaries[fam]
        out = part if out is None else out.unionByName(part)
    return out


def _tagged_family_summary(fam: str, frame: DataFrame) -> DataFrame:
    """ONE family's per-partition summary in the unified tagged shape —
    the per-family unit of :func:`_tagged_retract_summary`, factored out
    so the physical retract sink can materialize each family's summary
    inside that family's rebuild thread (guide §2.6)."""
    nul = F.lit(None).cast("bigint")
    if fam == "sig":
        return _sig_artifact_summary(frame).select(
            F.lit("sig").alias("family"),
            F.col("band_id").cast("string").alias("part_key"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_buckets").cast("bigint").alias("n_keys"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            nul.alias("extra"),
        )
    if fam == "minhash":
        return _minhash_artifact_summary(frame).select(
            F.lit("minhash").alias("family"),
            F.col("band_id").cast("string").alias("part_key"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_buckets").cast("bigint").alias("n_keys"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_nsh").cast("bigint").alias("extra"),
        )
    if fam == "passage":
        return _passage_artifact_summary(frame).select(
            F.lit("passage").alias("family"),
            F.col("pfx").alias("part_key"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_digests").cast("bigint").alias("n_keys"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            nul.alias("extra"),
        )
    assert fam == "ivf", fam
    return _ivf_artifact_summary(frame).select(
        F.lit("ivf").alias("family"),
        F.col("cell").cast("string").alias("part_key"),
        F.col("n_vecs").cast("bigint").alias("n_rows"),
        F.col("n_vecs").cast("bigint").alias("n_keys"),
        F.col("n_vecs").cast("bigint").alias("n_docs"),
        F.col("n_queries").cast("bigint").alias("extra"),
    )


_RETRACT_FAMILY_ORDER = ("sig", "minhash", "passage", "ivf")


def _tagged_retract_summary(frames: dict[str, DataFrame]) -> DataFrame:
    """The four families' per-partition summaries in one unified tagged
    frame — shared by the physical retract sink (plain artifact reads)
    and the tombstone sink (tombstone-aware live views), so both report
    under the identical oracle contract."""
    out = None
    for fam in _RETRACT_FAMILY_ORDER:
        part = _tagged_family_summary(fam, frames[fam])
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Tombstone tier: O(victims) instant retraction, compacted later
# ---------------------------------------------------------------------------

# The deletion-vector device (Delta/Iceberg's): a takedown must take
# effect IMMEDIATELY, but the physical rewrite above costs at least the
# affected partitions. The tombstone path writes ONLY the victim id
# list (an underscore-prefixed sidecar, invisible to plain partition
# readers like _label_homes and _centroids); every consumer reads the
# artifact through the live view (artifact ANTI-JOIN broadcast
# tombstones — a map-side filter, no shuffle, no extra scan), and a
# scheduled COMPACTION applies the tombstones physically with the exact
# rewrite device above and clears the sidecar. Write cost: O(victims),
# zero artifact files touched (byte-identity of EVERY data file pinned
# in tests/test_retract_semantics.py); read cost: one broadcast hash
# probe per row until compaction.

_TOMBSTONES = "_tombstones"


def read_artifact_live(
    spark: SparkSession, path: str, id_col: str
) -> DataFrame:
    """The tombstone-aware view of an artifact: all rows whose id is
    not tombstoned. Plain read when no sidecar exists, so consumers can
    adopt this reader unconditionally."""
    art = spark.read.parquet(path)
    tp = os.path.join(path, _TOMBSTONES)
    if not os.path.isdir(tp):
        return art
    tomb = spark.read.parquet(tp).select(
        F.col("victim_id").alias(id_col)
    )
    return art.join(broadcast(tomb), id_col, "left_anti")


def _write_tombstones(
    spark: SparkSession, path: str, victims: DataFrame
) -> None:
    """Idempotent O(victims) tombstone write: union with any standing
    sidecar, distinct, rewrite whole (the sidecar is victim-list-sized
    metadata, like _label_homes)."""
    tp = os.path.join(path, _TOMBSTONES)
    new = victims.select(
        F.col(victims.columns[0]).cast("long").alias("victim_id")
    )
    if os.path.isdir(tp):
        new = (
            new.unionByName(spark.read.parquet(tp))
            .distinct()
            .localCheckpoint(eager=True)
        )
    shutil.rmtree(tp, ignore_errors=True)
    new.write.parquet(tp)


def compact_tombstones(
    spark: SparkSession, path: str, part_col: str, id_col: str,
    sort_key: str,
) -> None:
    """Scheduled compaction: apply the standing tombstones physically
    (the exact :func:`_retract_rows` device) and clear the sidecar.
    The affected-partition set comes from one narrow columnar pass of
    (id, partition) semi-joined against the broadcast tombstones — the
    compaction job reads those partitions to rewrite them anyway. The
    live view is invariant across compaction (pinned)."""
    tp = os.path.join(path, _TOMBSTONES)
    if not os.path.isdir(tp):
        return
    tomb = spark.read.parquet(tp).localCheckpoint(eager=True)
    vic = tomb.select(F.col("victim_id").alias(id_col))
    affected = (
        spark.read.parquet(path)
        .select(id_col, part_col)
        .join(broadcast(vic), id_col, "leftsemi")
        .select(part_col)
        .distinct()
        .localCheckpoint(eager=True)
    )
    _retract_rows(spark, path, part_col, affected, vic, id_col, sort_key)
    shutil.rmtree(tp, ignore_errors=True)


# (family -> (partition column, id column, within-file sort key));
# shared by the tombstone sink's compaction pin and any scheduled
# compactor.
ARTIFACT_LAYOUTS: dict[str, tuple[str, str, str]] = {
    "sig": ("band_id", "doc_id", "band_val"),
    "minhash": ("band_id", "doc_id", "sig"),
    "passage": ("pfx", "doc_id", "passage_md5"),
    "ivf": ("cell", "vec_id", "vec_id"),
}


def tombstoned_artifact_paths(
    spark: SparkSession, sf_dir: str, rebuild: bool = False
) -> dict[str, str]:
    """Private copies of the four standing artifacts with the victim
    set TOMBSTONED (sidecar only — every data file byte-identical to
    the base build's). Memoized per (session, sf_dir)."""
    cache = getattr(spark, "_quty_tombstone_artifacts", None)
    if cache is None:
        cache = {}
        spark._quty_tombstone_artifacts = cache
    paths = cache.get(sf_dir)
    if paths is None or rebuild:
        vic = _doc_victims(spark, sf_dir).localCheckpoint(eager=True)
        vvic = (
            _corpus(spark, sf_dir)
            .filter(F.col("vec_id") % 10 == RETRACT_MOD)
            .select("vec_id")
            .localCheckpoint(eager=True)
        )
        builders = {
            "sig": lake_signature_artifact,
            "minhash": lake_minhash_artifact,
            "passage": lake_passage_artifact,
            "ivf": ivf_postings_artifact,
        }
        paths = {}
        for fam, build in builders.items():
            p = session_tmp_dir(spark, f"quty_tomb_{fam}", sf_dir)
            _copy_artifact(build(spark, sf_dir), p)
            _write_tombstones(
                spark, p, vvic if fam == "ivf" else vic
            )
            paths[fam] = p
        cache[sf_dir] = paths
    return paths


@registry.query(
    "sink_lake_artifacts_retract_tombstone",
    oracle=SQL_RETRACT_SUMMARY,
)
def sink_lake_artifacts_retract_tombstone(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The INSTANT half of the retraction lifecycle: tombstone the
    victim set in all four standing artifact families (an O(victims)
    sidecar write — zero data files touched, byte-identity of every
    file pinned), then report the four per-partition summaries read
    through the tombstone-aware live view. The oracle is byte-identical
    to :func:`sink_lake_artifacts_retract`'s survivors recompute, so a
    green row proves the live view ≡ physical retract ≡ rebuilt — the
    deletion-vector contract: takedown effect is immediate, the
    partition rewrites are deferred to scheduled compaction
    (:func:`compact_tombstones`, whose live-view invariance and
    sidecar clearing are pinned in tests/test_retract_semantics.py).

    Scale: the write is the victim list; the read tax is one broadcast
    anti-join per consumer until compaction — the standard
    merge-on-read trade, priced against the physical sink's
    rewrite-now cost."""
    paths = tombstoned_artifact_paths(spark, sf_dir, rebuild=True)
    return _tagged_retract_summary(
        {
            fam: read_artifact_live(
                spark, p, ARTIFACT_LAYOUTS[fam][1]
            )
            for fam, p in paths.items()
        }
    )


@registry.query(
    "sink_lake_artifacts_retract_compacted",
    oracle=SQL_RETRACT_SUMMARY,
)
def sink_lake_artifacts_retract_compacted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The DEFERRED half of the tombstone lifecycle, as its own oracle
    row: tombstone the victims (O(victims) sidecar, zero files touched),
    then run the scheduled COMPACTION on all four families
    (:func:`compact_tombstones` — the physical `_retract_rows` device
    scoped to the affected partitions, sidecar cleared) and report the
    four per-partition summaries from PLAIN artifact reads — no
    tombstone-aware view anywhere in the plan. Sharing
    :data:`SQL_RETRACT_SUMMARY` with the other two retraction sinks
    closes the triangle with oracle rows on every edge: live-view
    (tombstone sink) ≡ compacted-physical (this sink) ≡ physical-now
    (retract sink) ≡ rebuilt-on-survivors (the oracle itself). Sidecar
    clearing and live-view invariance across compaction are additionally
    pinned in tests/test_retract_semantics.py.

    Scale: compaction reads ONLY the affected partitions (one narrow
    (id, partition) columnar pass semi-joined against the broadcast
    tombstones derives the set — the compactor rewrites those
    partitions anyway) and rewrites them with the same DPP-scoped
    dynamic-overwrite device as the immediate retract; the read tax the
    tombstone tier charges every consumer disappears at the price of
    one scheduled job whose cost follows the victims, not the lake."""
    paths = tombstoned_artifact_paths(spark, sf_dir, rebuild=True)
    for fam, p in paths.items():
        part_col, id_col, sort_key = ARTIFACT_LAYOUTS[fam]
        compact_tombstones(spark, p, part_col, id_col, sort_key)
    return _tagged_retract_summary(
        {fam: spark.read.parquet(p) for fam, p in paths.items()}
    )


# ---------------------------------------------------------------------------
# Cluster-label retraction: relabel the clusters the removals split
# ---------------------------------------------------------------------------


def apply_cluster_label_retraction(
    spark: SparkSession, path: str, victims: DataFrame, docs: DataFrame
) -> None:
    """One retraction night against a home-bucket-partitioned label
    artifact at ``path`` (the layout of
    :func:`~quty_server_spark.operators.dedup.maintained_cluster_labels_artifact`):

    1. LOCATE: victims' current labels — one narrow columnar (node,
       lbl) scan semi-joined against the broadcast victim set (the
       unavoidable read given only doc ids).
    2. SCOPE: the affected labels' home buckets via the
       ``_label_homes`` sidecar — a DPP-pruned read of exactly those
       directories, never a lake scan.
    3. RE-CLUSTER: the affected clusters' surviving members are
       re-signed from their own text and re-labeled through the shared
       labeling core (dedup._labels_from_sigs). Removing nodes only
       removes edges, so clusters can only stay, SPLIT, or dissolve —
       no new cross-cluster edge can appear, which makes this
       affected-only recompute equal to a full one.
    4. REWRITE: the affected buckets are dynamically overwritten with
       the co-resident unaffected rows plus the relabeled survivors
       (rows keep their insert-time bucket, the maintained-artifact
       convention); buckets left empty are removed explicitly; the
       sidecar drops the retired labels and gains the new ones."""
    art = spark.read.parquet(path)
    homes = spark.read.parquet(os.path.join(path, "_label_homes"))
    vic = victims.select(F.col(victims.columns[0]).alias("node"))
    aff_lbl = (
        art.join(broadcast(vic), "node", "leftsemi")
        .select("lbl")
        .distinct()
        .localCheckpoint(eager=True)
    )
    aff_buckets = (
        homes.join(broadcast(aff_lbl), "lbl", "leftsemi")
        .select("lbl_bucket")
        .distinct()
        # Selective Filter => Spark inserts the DPP subquery on the
        # partitioned scan (same device as the maintenance rewrite).
        .filter(F.col("lbl_bucket") >= 0)
    )
    touched = art.join(broadcast(aff_buckets), "lbl_bucket").localCheckpoint(
        eager=True
    )
    keep_rows = touched.join(broadcast(aff_lbl), "lbl", "left_anti")
    remaining = (
        touched.join(broadcast(aff_lbl), "lbl", "leftsemi")
        .join(broadcast(vic), "node", "left_anti")
        .select("node", "lbl_bucket")
        .localCheckpoint(eager=True)
    )
    mem_docs = docs.join(
        broadcast(remaining.select(F.col("node").alias("doc_id"))),
        "doc_id",
        "leftsemi",
    )
    new_labels = _labels_from_sigs(spark, simhash_sigs_docs(mem_docs))
    relabeled = (
        remaining.join(
            new_labels.withColumnRenamed("lbl", "new_lbl"), "node", "inner"
        )
        .select("node", F.col("new_lbl").alias("lbl"), "lbl_bucket")
        # Materialized: consumed by the bucket rewrite AND the sidecar
        # update — without this the member re-sign + BSP would run
        # twice.
        .localCheckpoint(eager=True)
    )
    out = (
        keep_rows.select("node", "lbl", "lbl_bucket")
        .unionByName(relabeled)
        .localCheckpoint(eager=True)
    )
    (
        out.sortWithinPartitions("lbl_bucket", "node")
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("lbl_bucket")
        .mode("overwrite")
        .parquet(path)
    )
    kept_buckets = {r[0] for r in out.select("lbl_bucket").distinct().collect()}
    for r in aff_buckets.collect():
        if r[0] not in kept_buckets:
            shutil.rmtree(
                os.path.join(path, f"lbl_bucket={r[0]}"), ignore_errors=True
            )
    # Retired labels leave the sidecar; the relabeled survivors' (new
    # label, insert-time bucket) pairs enter it. keep_rows' labels are
    # unaffected and already recorded, and a new label can never
    # collide with an unaffected cluster's (labels are min member ids
    # and clusters partition the nodes).
    new_homes = (
        homes.join(broadcast(aff_lbl), "lbl", "left_anti")
        .unionByName(relabeled.select("lbl", "lbl_bucket").distinct())
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(os.path.join(path, "_label_homes"), ignore_errors=True)
    new_homes.write.parquet(os.path.join(path, "_label_homes"))


def retracted_cluster_labels_artifact(
    spark: SparkSession, sf_dir: str, rebuild: bool = False
) -> str:
    """The standing lake label artifact (home-bucket layout, built over
    the retract-staged corpus so the split case is guaranteed) run
    through one retraction night. Content equals a fresh lake-only
    labeling of the survivors — the contract the retract sink's oracle
    verifies end to end."""
    cache = getattr(spark, "_quty_retract_clabels", None)
    if cache is None:
        cache = {}
        spark._quty_retract_clabels = cache
    path = cache.get(sf_dir)
    if path is None or rebuild:
        path = session_tmp_dir(spark, "quty_retract_clabels", sf_dir)
        shutil.rmtree(path, ignore_errors=True)
        docs = retract_staged_documents(spark, sf_dir)
        sigs = (
            simhash_sigs_docs(docs)
            .filter(F.col("doc_id") % 10 != 0)
            .localCheckpoint(eager=False)
        )
        _write_home_bucket_layout(_labels_from_sigs(spark, sigs), path)
        victims = docs.filter(
            F.col("doc_id") % 10 == RETRACT_MOD
        ).select("doc_id").localCheckpoint(eager=True)
        apply_cluster_label_retraction(spark, path, victims, docs)
        cache[sf_dir] = path
    return path


SQL_DOCS_RSTAGED = (
    "documents_rstaged AS (\n"
    "        SELECT doc_id, text FROM documents\n"
    "        UNION ALL\n"
    "        SELECT * FROM (VALUES "
    + ", ".join(f"({i}, '{t}')" for i, t in RETRACT_STAGED_ROWS)
    + ") t(doc_id, text)\n    ),\n"
    "    docs_live AS (\n"
    "        SELECT doc_id, text FROM documents_rstaged\n"
    f"        WHERE doc_id % 10 <> {RETRACT_MOD}\n"
    "    )"
)

# SQL_SIMHASH reading the staged-then-retracted relation: victims leave
# BEFORE signing, matching the artifact state where their rows are
# physically gone.
SQL_SIMHASH_RETRACTED = (
    SQL_DOCS_RSTAGED
    + ",\n    "
    + SQL_SIMHASH.lstrip().replace("FROM documents\n", "FROM docs_live\n")
)

SQL_RETRACTED_LABELS_SUMMARY = f"""
    WITH RECURSIVE {SQL_SIMHASH_RETRACTED},
    bands AS (
        SELECT doc_id, b.band_id, (sig >> (12 * b.band_id)) & 4095 AS band_val
        FROM simhash, (SELECT unnest(range(0, 4)) AS band_id) b
        WHERE doc_id % 10 <> 0
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    ),
    near AS (
        SELECT p.doc_a, p.doc_b
        FROM pairs p
        JOIN simhash sa ON p.doc_a = sa.doc_id
        JOIN simhash sb ON p.doc_b = sb.doc_id
        WHERE bit_count(xor(sa.sig, sb.sig)) <= {HAMMING_MAX}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM near
        UNION ALL SELECT doc_b, doc_a FROM near
    ),
    reach(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    labels AS (
        SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY node
    )
    SELECT lbl AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(node) AS BIGINT) AS max_doc_id
    FROM labels GROUP BY lbl
    """


@registry.query(
    "sink_lake_cluster_labels_artifact_retract",
    oracle=SQL_RETRACTED_LABELS_SUMMARY,
)
def sink_lake_cluster_labels_artifact_retract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The label-artifact RETRACTION, oracle-verified end to end: build
    the standing lake label artifact over the retract-staged corpus
    (whose bridge doc guarantees at least one articulation-point
    victim on any fixture), remove the victims and re-label the
    affected clusters (:func:`apply_cluster_label_retraction`), read
    the result back and report the per-cluster summary. The oracle
    recomputes the survivors' components from scratch, so a green row
    proves retracted ≡ rebuilt for exactly the SPLIT case the r13
    verdict named: the staged C–bridge–D cluster must come back as two
    clusters with their own min-node labels, and every fixture cluster
    that lost a victim must shrink or dissolve.

    Scale: locate = one narrow columnar pass; scope = sidecar lookup +
    DPP-pruned bucket read; re-cluster = |affected clusters| signing +
    BSP at cluster grain; rewrite = |affected buckets| dynamic
    overwrite. The lake-sized labeling is the write-once half this
    family always amortizes."""
    path = retracted_cluster_labels_artifact(spark, sf_dir, rebuild=True)
    art = spark.read.parquet(path)
    return art.groupBy(F.col("lbl").alias("cluster_id")).agg(
        F.count("*").alias("n_docs"),
        F.max("node").alias("max_doc_id"),
    )
