"""Semantic properties of the round-5 extension operators — checks the
oracle compare can't express: brute-force equivalence on the small
fixture, coverage/overlap invariants, and recall floors.
"""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as se
from tests.conftest import SF_DIR

TOL_US = 3_600_000_000  # join_asof_tolerance window


def _rows(spark, name):
    return se.queries()[name](spark, SF_DIR).collect()


def test_chunks_cover_every_token_with_fixed_overlap(spark):
    # Every token of every document lands in >= 1 chunk; consecutive
    # chunks overlap by exactly W - S = 16 tokens (except the tail).
    docs = {
        r.doc_id: len(r.text.split(" "))
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    per_doc = defaultdict(list)
    for r in _rows(spark, "doc_chunk_overlap"):
        per_doc[r.doc_id].append((r.chunk_idx, r.n_tokens))
    assert set(per_doc) == set(docs)
    for doc_id, chunks in per_doc.items():
        chunks.sort()
        n = docs[doc_id]
        # contiguous chunk indices from 0
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        # coverage: last chunk starts at 48*idx and reaches the last token
        last_idx, last_n = chunks[-1]
        assert 48 * last_idx + last_n == n
        # every non-tail chunk is the full 64 tokens -> 16-token overlap
        for idx, ntok in chunks[:-1]:
            assert ntok == min(64, n - 48 * idx)


def test_concurrency_sweep_matches_bruteforce(spark):
    # The sweep-line peak must equal the naive O(n^2) definition: the max
    # over open-boundaries t of |{e : e.ts <= t < e.ts + 5min}| (ties:
    # opens counted before closes, i.e. closed-open interval [ts, ts+5m)
    # with inclusive touch at equal instants).
    ev = [
        (r.event_type, r.ts)
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    ]
    by_type = defaultdict(list)
    for et, ts in ev:
        by_type[et].append(ts.timestamp())
    expect = {}
    for et, starts in by_type.items():
        peak = 0
        for t in starts:
            live = sum(1 for s in starts if s <= t <= s + 300)
            peak = max(peak, live)
        expect[et] = peak
    got = {r.event_type: r.peak_concurrent for r in _rows(spark, "events_concurrency_sweep")}
    assert got == expect


def test_asof_tolerance_matches_bruteforce(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    purchases = defaultdict(list)
    for r in ev:
        if r.event_type == "purchase":
            purchases[r.user_id].append(int(r.ts.timestamp() * 1_000_000))
    expect = {}
    for r in ev:
        if r.event_type != "click":
            continue
        t = int(r.ts.timestamp() * 1_000_000)
        cands = [p for p in purchases.get(r.user_id, []) if t <= p <= t + TOL_US]
        expect[r.event_id] = min(cands) if cands else None
    got = {r.event_id: r.next_purchase_us for r in _rows(spark, "join_asof_tolerance")}
    assert got == expect


def test_fuzzy_levenshtein_finds_exact_dup_pairs(spark):
    # Recall floor: every same-language exact-duplicate pair must surface
    # with edit distance 0 (identical text => identical blocking key).
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    groups = defaultdict(list)
    for r in docs:
        groups[(r.lang, r.text)].append(r.doc_id)
    expected_pairs = set()
    for ids in groups.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                expected_pairs.add((a, b))
    got = {(r.doc_a, r.doc_b): r.edit_dist for r in _rows(spark, "dedup_fuzzy_levenshtein")}
    for pair in expected_pairs:
        assert got.get(pair) == 0, f"missing exact-dup pair {pair}"
    # well-formedness: ordered pairs, verified threshold
    for (a, b), d in got.items():
        assert a < b and 0 <= d <= 16


def test_heavy_hitters_shares_are_consistent(spark):
    rows = _rows(spark, "agg_heavy_hitters")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    totals = defaultdict(int)
    for r in ev:
        totals[r.event_type] += 1
    for r in rows:
        assert r.n >= 3
        assert r.share_ppm == r.n * 1_000_000 // totals[r.event_type]
    # shares of the reported subset can never exceed the whole channel
    by_type = defaultdict(int)
    for r in rows:
        by_type[r.event_type] += r.share_ppm
    assert all(v <= 1_000_000 for v in by_type.values())
