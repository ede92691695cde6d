"""Property-based tests: text quality signals against Python oracles.

One Spark job per hypothesis example set (single createDataFrame of all
generated documents) keeps runtime bounded, mirroring
test_expressions_property.py.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import ssis_to_dbt_spark.text as tx

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# words of printable ASCII (no whitespace); documents join them with spaces
words = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1,
    max_size=8,
)
documents = st.lists(words, min_size=0, max_size=30).map(" ".join)


def _rows(spark, docs):
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )


def _signals(spark, docs):
    df = _rows(spark, docs)
    t = F.col("text")
    return {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            tx.token_count(t).alias("n"),
            tx.dup_token_fraction(t).alias("dup"),
            tx.top_token_fraction(t).alias("top"),
            tx.max_token_run(t).alias("run"),
            tx.mean_token_length(t).alias("mtl"),
            tx.symbol_fraction(t).alias("sym"),
            tx.digit_fraction(t).alias("dig"),
        ).collect()
    }


class TestSignalProperties:
    @given(docs=st.lists(documents, min_size=1, max_size=8))
    @settings(**SETTINGS)
    def test_invariants_against_python_oracle(self, spark, docs):
        out = _signals(spark, docs)
        for i, d in enumerate(docs):
            toks = d.split()
            r = out[i]
            assert r["n"] == len(toks)
            # fractions bounded
            for k in ("dup", "top", "sym", "dig"):
                assert 0.0 <= r[k] <= 1.0, (k, d)
            if toks:
                # python oracles
                assert r["dup"] == (len(toks) - len(set(toks))) / len(toks)
                counts = {w: toks.count(w) for w in set(toks)}
                assert r["top"] == max(counts.values()) / len(toks)
                best = cur = 1
                for a, b in zip(toks, toks[1:]):
                    cur = cur + 1 if a == b else 1
                    best = max(best, cur)
                assert r["run"] == best
                assert r["run"] <= max(counts.values())
                assert r["mtl"] == sum(len(w) for w in toks) / len(toks)
            else:
                assert r["dup"] == r["top"] == 0.0
                assert r["run"] == 0

    @given(docs=st.lists(documents, min_size=1, max_size=5))
    @settings(**SETTINGS)
    def test_chunking_reassembles_exactly(self, spark, docs):
        # concatenating chunks with overlaps removed must reproduce the doc
        df = _rows(spark, docs)
        chunks = tx.chunk_documents(df, chunk_tokens=5, overlap_tokens=2)
        by_doc = {}
        for r in chunks.collect():
            by_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_text"], r["chunk_len"])
            )
        for i, d in enumerate(docs):
            toks = d.split()
            got = sorted(by_doc[i])
            rebuilt = []
            for idx, text, n in got:
                ctoks = text.split() if text else []
                assert len(ctoks) == n or (n == 1 and text == "")
                rebuilt.extend(ctoks if idx == 0 else ctoks[2:])
            if toks:
                assert rebuilt == toks, d
            # every chunk adds unseen tokens (no fully-contained tail chunk)
            strides = [idx * 3 for idx, _, _ in got]
            for s, (_, _, n) in zip(strides[1:], got[1:]):
                assert s < max(len(toks), 1)


class TestXlsRoundtripProperty:
    """Hypothesis round-trips through the BIFF8 writer/reader: arbitrary
    strings (incl. non-Latin-1 -> 16-bit SST) and numbers must survive."""

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=-10**9, max_value=10**9),
                st.text(
                    alphabet=st.characters(
                        min_codepoint=32, max_codepoint=0x2FFF,
                        blacklist_categories=("Cs",),
                    ),
                    max_size=40,
                ),
            ),
            min_size=1,
            max_size=20,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_roundtrip(self, rows, tmp_path_factory):
        import os

        from ssis_to_dbt_spark.sources.xls import read_xls_rows, write_xls

        p = os.path.join(str(tmp_path_factory.mktemp("xlsprop")), "t.xls")
        write_xls(["k", "v"], [[k, v] for k, v in rows], p)
        grid = read_xls_rows(p)
        assert grid[0] == ["k", "v"]
        got = grid[1:]
        for (k, v), row in zip(rows, got):
            assert row[0] == str(k)
            assert (row[1] or "") == v  # empty cell reads back as None/''
