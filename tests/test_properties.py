"""Property-based tests (hypothesis): the composed operators must
match brute-force reference implementations on arbitrary small inputs
— edge shapes (empty sides, all-ties, single keys) that fixture tests
under-sample.

Example counts are kept low because every example is a Spark job; the
generators bias toward collisions (tiny key/timestamp domains) where
the bugs live."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from omim_spark.operators.asof import asof_join_backward
from omim_spark.operators.rangejoin import interval_join

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Small domains force key/timestamp collisions.
keys = st.integers(min_value=0, max_value=2)
times = st.integers(min_value=0, max_value=20)

left_rows = st.lists(
    st.tuples(keys, times), min_size=0, max_size=8
)
right_rows = st.lists(
    st.tuples(keys, times, st.integers(0, 100)), min_size=0, max_size=8
)


class TestAsofProperty:
    @given(left=left_rows, right=right_rows)
    @settings(**SETTINGS)
    def test_matches_bruteforce(self, spark, left, right):
        # unique rid per right row = deterministic tiebreak
        right = [(k, t, v, i) for i, (k, t, v) in enumerate(right)]
        left = [(k, t, i) for i, (k, t) in enumerate(left)]
        ldf = spark.createDataFrame(left, "k int, t int, lid int") if left else None
        rdf = (
            spark.createDataFrame(right, "k int, t int, v int, rid int")
            if right
            else None
        )
        if ldf is None:
            return  # nothing to join
        if rdf is None:
            rdf = spark.createDataFrame([], "k int, t int, v int, rid int")
        got = {
            r.lid: r.r_rid
            for r in asof_join_backward(
                ldf, rdf, key="k", left_ts="t", right_ts="t",
                right_payload=("v", "rid"), tiebreak="rid",
            ).collect()
        }
        for k, t, lid in left:
            cand = [(rt, rid) for rk, rt, _, rid in right if rk == k and rt <= t]
            expect = max(cand)[1] if cand else None  # latest ts, max rid tiebreak
            assert got[lid] == expect, (lid, k, t, cand)


class TestIntervalJoinProperty:
    @given(
        points=st.lists(st.tuples(keys, times), min_size=0, max_size=6),
        ivals=st.lists(
            st.tuples(keys, times, st.integers(0, 10)), min_size=0, max_size=6
        ),
        width=st.sampled_from([1, 3, 7]),
    )
    @settings(**SETTINGS)
    def test_matches_bruteforce(self, spark, points, ivals, width):
        points = [(k, t, i) for i, (k, t) in enumerate(points)]
        # interval = [lo, lo + span]
        ivals = [(k, lo, lo + span, i) for i, (k, lo, span) in enumerate(ivals)]
        if not points or not ivals:
            return
        pdf = spark.createDataFrame(points, "k int, t int, pid int")
        idf = spark.createDataFrame(ivals, "k int, lo int, hi int, iid int")
        got = {
            (r.pid, r.iid)
            for r in interval_join(
                pdf, idf, key="k", point_ts_us="t",
                start_us="lo", end_us="hi", bucket_width_us=width,
            ).collect()
        }
        expect = {
            (pid, iid)
            for k, t, pid in points
            for ik, lo, hi, iid in ivals
            if ik == k and lo <= t <= hi
        }
        assert got == expect


class TestChunkingProperty:
    @given(
        n_tokens=st.integers(min_value=1, max_value=40),
        size=st.integers(min_value=1, max_value=10),
        stride=st.integers(min_value=1, max_value=10),
    )
    @settings(**SETTINGS)
    def test_reconstruction_and_bounds(self, spark, n_tokens, size, stride):
        from omim_spark.operators.sampling import chunk_tokens

        text = " ".join(f"t{i}" for i in range(n_tokens))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        rows = sorted(
            chunk_tokens(df, size=size, stride=stride).collect(),
            key=lambda r: r.chunk_id,
        )
        # chunk count = ceil(n/stride); every chunk <= size tokens
        assert len(rows) == -(-n_tokens // stride)
        assert all(1 <= r.n_chunk_tokens <= size for r in rows)
        # chunk c covers tokens [(c-1)*stride, ...]: verify exact content
        toks = text.split(" ")
        for r in rows:
            start = (r.chunk_id - 1) * stride
            assert r.chunk_text.split(" ") == toks[start : start + size]
        # stride <= size implies full coverage (no token skipped)
        if stride <= size:
            covered = set()
            for r in rows:
                start = (r.chunk_id - 1) * stride
                covered.update(range(start, start + r.n_chunk_tokens))
            assert covered == set(range(n_tokens))


class TestBloomProperty:
    """Bloom pruning must NEVER drop a true member, for any key sets."""

    @given(
        build=st.lists(st.integers(0, 50), min_size=0, max_size=12),
        probe=st.lists(st.integers(0, 50), min_size=0, max_size=12),
    )
    @settings(**SETTINGS)
    def test_no_false_negatives(self, spark, build, probe):
        from omim_spark.operators.bloom import bloom_prune

        if not build:
            return  # empty build side: nothing to prune against
        b = spark.createDataFrame([(k,) for k in build], ["k"])
        p = spark.createDataFrame([(k,) for k in probe], ["k"]) if probe else None
        if p is None:
            return
        kept = {r.k for r in bloom_prune(p, b, "k", "k").collect()}
        true_members = set(probe) & set(build)
        assert true_members <= kept  # soundness: no true member dropped


class TestMinhashRowLocalProperty:
    """The row-local signature computation must equal the explode+groupBy
    form on ANY document set (the equivalence the round-4 shuffle
    elimination rests on)."""

    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
                min_size=0,
                max_size=8,
            ).map(" ".join),
            min_size=1,
            max_size=6,
        )
    )
    @settings(**SETTINGS)
    def test_equals_grouped_form(self, spark, texts):
        from omim_spark.workload.dedup import (
            _minhash_wide,
            minhash_signatures,
        )
        from pyspark.sql import functions as F
        from omim_spark.workload.dedup import SHINGLE_SPARK

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        rowlocal = {tuple(r) for r in minhash_signatures(docs).collect()}
        sh = (
            docs.withColumn("tk", F.split("text", " "))
            .filter(F.size("tk") >= 3)
            .select("doc_id", F.explode(F.expr(SHINGLE_SPARK)).alias("s"))
        )
        grouped = {tuple(r) for r in _minhash_wide(sh).collect()}
        assert rowlocal == grouped


class TestMergedSpansProperty:
    # Tiny token alphabet + short docs force window collisions; n=3
    # keeps windows shorter than the docs so islands actually merge.
    doc_texts = st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=12).map(" ".join),
        min_size=0,
        max_size=6,
    )

    @given(texts=doc_texts)
    @settings(**SETTINGS)
    def test_matches_bruteforce(self, spark, texts):
        from omim_spark.operators.dedup import merged_duplicate_spans

        n = 3
        rows = [(i + 1, t) for i, t in enumerate(texts)]
        # Brute force: windows, distinct-doc ownership, island merge.
        wins = {}  # span text -> set of doc ids
        per_doc = {}  # doc -> [pos...]
        for did, t in rows:
            tk = t.split(" ") if t else []
            for p in range(1, len(tk) - n + 2):
                s = " ".join(tk[p - 1 : p - 1 + n])
                wins.setdefault(s, set()).add(did)
        for did, t in rows:
            tk = t.split(" ") if t else []
            flagged = [
                p
                for p in range(1, len(tk) - n + 2)
                if len(wins[" ".join(tk[p - 1 : p - 1 + n])]) >= 2
            ]
            islands = []
            for p in flagged:
                if islands and p - islands[-1][1] <= n:
                    islands[-1][1] = p
                else:
                    islands.append([p, p])
            per_doc[did] = sorted(
                (s0, p_last + n - 1) for s0, p_last in islands
            )
        want = {
            (did, s, e)
            for did, spans in per_doc.items()
            for (s, e) in spans
        }
        if not rows:
            return
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {
            (r.id, r.span_start, r.span_end)
            for r in merged_duplicate_spans(df, n=n, min_docs=2).collect()
        }
        assert got == want
