"""Hypothesis property tests for the dedup arithmetic that is easiest to
get silently wrong: the SIMD-packed SimHash vote (lane packing must be
bit-for-bit the naive per-bit majority), the passage-window fencepost
arithmetic (Spark's 1-based sequence/slice must enumerate exactly the
reference windows), and the min-label BSP (pointer doubling must equal
plain union-find on arbitrary graphs). Each property is checked against
an independent pure-Python reference, batched per example so one Spark
job covers many random documents.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quty_server_spark.operators import dedup as D

_ALPHABET = ["a", "bb", "ccc", "tok1", "tok2", "zz9", "q", "longtoken"]

_doc = st.lists(st.sampled_from(_ALPHABET), min_size=0, max_size=40)
_docs = st.lists(_doc, min_size=1, max_size=12)


def _h60(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16)


def _naive_simhash(tokens: list[str]) -> int:
    distinct = sorted(set(tokens))
    n = len(distinct)
    sig = 0
    for j in range(D.SIMHASH_BITS):
        votes = sum((_h60(t) >> j) & 1 for t in distinct)
        if votes * 2 > n:
            sig |= 1 << j
    return sig


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_docs)
def test_packed_simhash_equals_naive_majority(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.sig for r in D.simhash_sigs_docs(df).collect()}
    # split(text, ' ') on an empty string yields [''], so the reference
    # tokenization of an empty doc is the single empty token.
    want = {
        i: _naive_simhash(toks if toks else [""])
        for i, toks in enumerate(docs)
    }
    assert got == want


def _naive_windows(tokens: list[str]) -> set[str]:
    w, s = D.PASSAGE_W, D.PASSAGE_STRIDE
    if len(tokens) < w:
        return set()
    return {
        hashlib.md5(" ".join(tokens[i : i + w]).encode()).hexdigest()
        for i in range(0, len(tokens) - w + 1, s)
    }


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.sampled_from(_ALPHABET), min_size=0, max_size=60), min_size=1, max_size=10))
def test_passage_windows_match_reference_fenceposts(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set[str]] = {}
    for r in D._passage_windows(df).collect():
        got.setdefault(r.doc_id, set()).add(r.passage_md5)
    want = {
        i: _naive_windows(toks if toks else [""])
        for i, toks in enumerate(docs)
        if _naive_windows(toks if toks else [""])
    }
    assert got == want


def _union_find_min_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    out = {}
    for members in comps.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=25,
    )
)
def test_min_label_components_equal_union_find(spark, edges):
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
    )
    labels, _ = D.min_label_components(spark, pairs)
    got = {r.node: r.lbl for r in labels.collect()}
    assert got == _union_find_min_labels(edges)


# --- BPE merge device (round 14) -------------------------------------------
#
# text_bpe_merge_step stages the merged pair through a '#' placeholder:
#     replace(regexp_replace(replace(w, l||r, '#'), '(.)', '$1|'), '#', l||r)
# The correctness claim is that leftmost non-overlapping substring
# replacement of a TWO-CHARACTER pair over single-character symbols IS
# textbook greedy BPE merging. Python's str.replace shares the leftmost
# non-overlapping contract with Spark's replace and DuckDB's replace, so
# the device can be property-tested engine-free against a reference
# greedy merger over arbitrary words — including the adversarial l == r
# runs ('aaaa' + merge 'aa' -> aa aa; 'aaa' -> aa a).


def _device_merge(w: str, pair: str) -> list[str]:
    staged = w.replace(pair, "#")
    delim = "".join(ch + "|" for ch in staged)
    return [s for s in delim.replace("#", pair).split("|") if s]


def _greedy_bpe_merge(w: str, pair: str) -> list[str]:
    syms, i = [], 0
    while i < len(w):
        if w[i : i + 2] == pair:
            syms.append(pair)
            i += 2
        else:
            syms.append(w[i])
            i += 1
    return syms


@given(
    w=st.text(alphabet="abc", min_size=0, max_size=40),
    l=st.sampled_from("abc"),
    r=st.sampled_from("abc"),
)
@settings(max_examples=500, deadline=None)
def test_bpe_placeholder_device_equals_greedy_merge(w, l, r):
    assert _device_merge(w, l + r) == _greedy_bpe_merge(w, l + r)
    # and the merge conserves the character stream
    assert "".join(_device_merge(w, l + r)) == w


# text_bpe_train_n applies merges with a left-to-right accumulator SCAN
# (_SQL_BPE_APPLY): merge whenever the accumulator's last symbol is l
# and the incoming symbol is r. Unlike the single-round placeholder
# device (above), the scan stays exact for MULTI-CHARACTER symbols and
# l == r runs — the cases a chained training loop actually produces.
# The scan is replicated here at the same string-accumulator grain the
# SQL uses, and tested against an index-based reference greedy merger
# over symbol sequences.


def _scan_merge(syms: list[str], l: str, r: str) -> list[str]:
    acc = "|"
    for x in syms:
        if acc.endswith("|" + l + "|") and x == r:
            acc = acc[: len(acc) - len(l) - 1] + l + r + "|"
        else:
            acc = acc + x + "|"
    return [s for s in acc.split("|") if s]


def _greedy_syms_merge(syms: list[str], l: str, r: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


_SYMS = ["a", "b", "ab", "ba", "aa", "aba"]


@given(
    syms=st.lists(st.sampled_from(_SYMS), min_size=0, max_size=24),
    l=st.sampled_from(_SYMS),
    r=st.sampled_from(_SYMS),
)
@settings(max_examples=500, deadline=None)
def test_bpe_scan_merge_equals_greedy_over_symbols(syms, l, r):
    assert _scan_merge(syms, l, r) == _greedy_syms_merge(syms, l, r)
    # the merge conserves the character stream
    assert "".join(_scan_merge(syms, l, r)) == "".join(syms)


def test_bpe_scan_merge_handles_runs_where_replace_does_not():
    """The adversarial case that forced the scan: a run of the same
    symbol with l == r. Single substring replacement on the delimited
    form consumes the shared delimiter and splits runs wrongly; the
    scan is textbook."""
    syms = ["a"] * 6
    assert _greedy_syms_merge(syms, "a", "a") == ["aa", "aa", "aa"]
    assert _scan_merge(syms, "a", "a") == ["aa", "aa", "aa"]
    # the replace device miscounts exactly here (why the train loop
    # does NOT reuse the single-round placeholder trick for later
    # rounds):
    s = "|" + "".join(x + "|" for x in syms)
    replaced = s.replace("|a|a|", "|aa|")
    assert [x for x in replaced.split("|") if x] != ["aa", "aa", "aa"]


def test_bpe_train_sql_apply_matches_reference_scan(spark):
    """The actual _SQL_BPE_APPLY expression (Spark higher-order
    aggregate) on crafted delimited vocab rows — including the l == r
    run and multi-character-symbol cases — equals the reference greedy
    merger."""
    from pyspark.sql import functions as F

    from quty_server_spark.operators.textops import _SQL_BPE_APPLY

    cases = [
        (["a", "a", "a", "a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a", "a"], "a", "a"),
        (["ab", "c", "ab", "c"], "ab", "c"),
        (["an", "a", "n", "an"], "a", "n"),
        (["b", "an", "an", "a"], "an", "an"),
        (["x"], "x", "x"),
        ([], "a", "b"),
    ]
    rows = [
        ("|" + "".join(x + "|" for x in syms), l, r)
        for syms, l, r in cases
    ]
    df = spark.createDataFrame(rows, "s string, l string, r string")
    got = [
        [x for x in row["m"].split("|") if x]
        for row in df.select(F.expr(_SQL_BPE_APPLY).alias("m")).collect()
    ]
    want = [_greedy_syms_merge(syms, l, r) for syms, l, r in cases]
    assert got == want


def test_bpe_apply_all_sql_matches_reference_fold(spark):
    """The artifact encoder's nested expression (_SQL_BPE_APPLY_ALL:
    outer aggregate over the merges array, inner exact greedy scan)
    must equal folding the reference greedy merger over the merges in
    order — i.e. 'apply the whole trained tokenizer' is exactly
    'apply each merge in training order', including chains where later
    merges consume earlier merges' outputs and the l == r run case
    compounds across rounds."""
    from pyspark.sql import functions as F

    from quty_server_spark.operators.textops import _SQL_BPE_APPLY_ALL

    cases = [
        # runs compounding round over round: a^8 -> aa^4 -> aaaa^2
        (list("aaaaaaaa"), [("a", "a"), ("aa", "aa")]),
        # classic BPE chain: later merges reference earlier outputs
        (list("banana"), [("a", "n"), ("b", "an"), ("ban", "an")]),
        # a merge whose pair never occurs is a no-op mid-chain
        (list("abab"), [("a", "b"), ("x", "y"), ("ab", "ab")]),
        # empty merges array = identity
        (list("abc"), []),
        # empty word survives any chain
        ([], [("a", "b")]),
        # odd-length run leaves the orphan tail symbol
        (list("aaaaa"), [("a", "a"), ("aa", "a")]),
    ]
    rows = [
        ("|" + "".join(x + "|" for x in syms), merges)
        for syms, merges in cases
    ]
    df = spark.createDataFrame(
        rows, "s string, M array<struct<l: string, r: string>>"
    )
    got = [
        [x for x in row["m"].split("|") if x]
        for row in df.select(F.expr(_SQL_BPE_APPLY_ALL).alias("m")).collect()
    ]
    want = []
    for syms, merges in cases:
        cur = syms
        for l, r in merges:
            cur = _greedy_syms_merge(cur, l, r)
        want.append(cur)
    assert got == want


def test_bpe_train_round1_equals_single_step_argmax(spark):
    """Loop/step consistency: the training loop's first selected merge
    is exactly the argmax of the character-level pair counts the
    single-step op starts from."""
    from tests.conftest import SF_DIR

    from quty_server_spark.operators.textops import (
        text_bpe_pair_counts,
        text_bpe_train_n,
    )

    top = text_bpe_pair_counts(spark, SF_DIR).first()
    r1 = (
        text_bpe_train_n(spark, SF_DIR)
        .filter("merge_round = 1")
        .first()
    )
    assert (r1["l"], r1["r"], r1["pair_count"]) == (
        top["l"],
        top["r"],
        top["pair_count"],
    )


def test_bpe_compression_curve_invariants(spark):
    """The curve is consistent with the merge table: each round's
    symbol-count drop equals the number of merge APPLICATIONS — strictly
    positive (the argmax pair exists in the corpus) and ≤ the selected
    pair's adjacent count (overlapping occurrences merge only once);
    saved_ppm is non-decreasing from 0."""
    from tests.conftest import SF_DIR

    from quty_server_spark.operators.textops import (
        text_bpe_compression,
        text_bpe_train_n,
    )

    curve = {
        r["merge_round"]: (r["corpus_symbols"], r["saved_ppm"])
        for r in text_bpe_compression(spark, SF_DIR).collect()
    }
    merges = {
        r["merge_round"]: r["pair_count"]
        for r in text_bpe_train_n(spark, SF_DIR).collect()
    }
    assert curve[0][1] == 0
    for k in sorted(merges):
        drop = curve[k - 1][0] - curve[k][0]
        assert 0 < drop <= merges[k], (k, drop, merges[k])
        assert curve[k][1] >= curve[k - 1][1]
