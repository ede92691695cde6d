"""Property-based tests: round-5 operators against Python model oracles.

apply_changes is modeled by a dict replay; merge_aggregate by a full
recompute; dedup_lines by an ordered-set fold.  One Spark job per example
keeps runtime bounded (mirrors test_text_property.py).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=6)
amounts = st.integers(min_value=-100, max_value=100)

snapshot_rows = st.dictionaries(keys, amounts, min_size=0, max_size=5)
change_entries = st.lists(
    st.tuples(keys, amounts, st.sampled_from(["I", "U", "D"])),
    min_size=0,
    max_size=12,
)


class TestApplyChangesProperty:
    @given(snap=snapshot_rows, changes=change_entries)
    @settings(**SETTINGS)
    def test_matches_dict_replay(self, spark, snap, changes):
        from ssis_to_dbt_spark.operators.cdc import apply_changes

        snap_df = spark.createDataFrame(
            [(k, float(v)) for k, v in snap.items()], "k long, amt double"
        )
        # seq = list position: strictly increasing, so last-in-list wins —
        # exactly the dict replay below
        chg_df = spark.createDataFrame(
            [
                (k, float(v), op, i)
                for i, (k, v, op) in enumerate(changes)
            ],
            "k long, amt double, change_type string, seq long",
        )
        got = {
            r["k"]: r["amt"]
            for r in apply_changes(
                snap_df, chg_df, ["k"], "seq", "change_type"
            ).collect()
        }
        model = {k: float(v) for k, v in snap.items()}
        for k, v, op in changes:  # replay in seq order
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = float(v)
        assert got == model

    @given(snap=snapshot_rows, changes=change_entries)
    @settings(**SETTINGS)
    def test_replay_is_idempotent(self, spark, snap, changes):
        """Applying the same changelog to the already-applied state changes
        nothing — the property the streaming foreachBatch sink's
        exactly-once story rests on."""
        from ssis_to_dbt_spark.operators.cdc import apply_changes

        snap_df = spark.createDataFrame(
            [(k, float(v)) for k, v in snap.items()], "k long, amt double"
        )
        chg_df = spark.createDataFrame(
            [(k, float(v), op, i) for i, (k, v, op) in enumerate(changes)],
            "k long, amt double, change_type string, seq long",
        )
        once = apply_changes(snap_df, chg_df, ["k"], "seq", "change_type")
        twice = apply_changes(once, chg_df, ["k"], "seq", "change_type")
        a = sorted((r["k"], r["amt"]) for r in once.collect())
        b = sorted((r["k"], r["amt"]) for r in twice.collect())
        assert a == b


class TestMergeAggregateProperty:
    @given(
        rows=st.lists(
            st.tuples(keys, st.integers(min_value=0, max_value=50)),
            min_size=0,
            max_size=20,
        ),
        pivot=st.integers(min_value=0, max_value=50),
    )
    @settings(**SETTINGS)
    def test_any_split_merges_to_full_recompute(self, spark, rows, pivot):
        from ssis_to_dbt_spark.operators.aggregate import merge_aggregate

        df = spark.createDataFrame(
            [(k, v) for k, v in rows], "k long, v long"
        )
        agg = lambda d: d.groupBy("k").agg(  # noqa: E731
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
        )
        full = {(r["k"]): (r["s"], r["n"]) for r in agg(df).collect()}
        merged = merge_aggregate(
            agg(df.filter(F.col("v") < pivot)),
            agg(df.filter(F.col("v") >= pivot)),
            ["k"],
            sum_cols=["s", "n"],
        )
        got = {(r["k"]): (r["s"], r["n"]) for r in merged.collect()}
        assert got == full


class TestDedupLinesProperty:
    lines = st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=6,
        ),
        min_size=1,
        max_size=10,
    )

    @given(docs=st.lists(lines, min_size=1, max_size=6))
    @settings(**SETTINGS)
    def test_matches_ordered_set_fold(self, spark, docs):
        from ssis_to_dbt_spark.text.analysis import dedup_lines

        df = spark.createDataFrame(
            [(i, "\n".join(d)) for i, d in enumerate(docs)],
            "doc_id int, text string",
        )
        got = {
            r["doc_id"]: r["out"]
            for r in df.select(
                "doc_id", dedup_lines(F.col("text")).alias("out")
            ).collect()
        }
        for i, d in enumerate(docs):
            assert got[i] == "\n".join(dict.fromkeys(d))


class TestCiCollationProperty:
    """r11: CI joins against a Python lower()-fold model — for random
    mixed-case key multisets on both sides, lookup/semi/anti under
    ci=True must match the model exactly, and the output must preserve
    the left side's original key case."""

    _words = st.sampled_from(
        ["alpha", "ALPHA", "Alpha", "aLpHa", "beta", "BeTa", "Gamma",
         "GAMMA", "delta", ""]
    )

    @given(
        left=st.lists(_words, min_size=0, max_size=8),
        right=st.lists(_words, min_size=0, max_size=6),
    )
    @settings(**SETTINGS)
    def test_matches_lower_fold_model(self, spark, left, right):
        from ssis_to_dbt_spark.operators.joins import anti_join, semi_join
        from ssis_to_dbt_spark.operators.lookup import lookup

        lf = spark.createDataFrame(
            [(i, w) for i, w in enumerate(left)], "id long, seg string"
        )
        # dedupe the dim under the fold: case-duplicate dim keys would
        # legitimately FAN OUT under CI (SQL Server does too), which the
        # one-row-per-id dict model below can't express
        rdim = {w.lower(): w for w in sorted(set(right))}
        rf = spark.createDataFrame(
            [(w, w.upper()) for w in rdim.values()], "seg string, code string"
        )
        rmap = {w.lower(): w.upper() for w in rdim.values()}

        got = {
            r["id"]: (r["seg"], r["code"])
            for r in lookup(lf, rf, ["seg"], {"code": "code"}, ci=True)
            .collect()
        }
        want = {
            i: (w, rmap.get(w.lower())) for i, w in enumerate(left)
        }
        assert got == want  # matches + left-side case preserved

        semi = {r["id"] for r in semi_join(lf, rf.select("seg"),
                                           ["seg"], ci=True).collect()}
        anti = {r["id"] for r in anti_join(lf, rf.select("seg"),
                                           ["seg"], ci=True).collect()}
        model_semi = {i for i, w in enumerate(left) if w.lower() in rmap}
        assert semi == model_semi
        assert anti == set(range(len(left))) - model_semi

    @given(vals=st.lists(_words, min_size=0, max_size=12))
    @settings(**SETTINGS)
    def test_group_distinct_dup_sort_match_fold_model(self, spark, vals):
        """r12 (r11 VERDICT #4): CI GROUP BY / DISTINCT / duplicate
        detection / ORDER BY against the same Python lower()-fold model:
        group counts per folded key, MIN-case representative, duplicate
        flags, and the (lower(w), w) sort order must all match."""
        from ssis_to_dbt_spark.operators.aggregate import (
            duplicate_keys,
            grouped_aggregate,
        )
        from ssis_to_dbt_spark.operators.setops import distinct_values, sort

        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(vals)], "id long, seg string"
        )
        counts: dict[str, int] = {}
        rep: dict[str, str] = {}
        for w in vals:
            k = w.lower()
            counts[k] = counts.get(k, 0) + 1
            rep[k] = min(rep.get(k, w), w)

        got_g = {
            r["seg"]: r["n"]
            for r in grouped_aggregate(
                df, ["seg"], {"n": F.count(F.lit(1))}, ci=True
            ).collect()
        }
        assert got_g == {rep[k]: n for k, n in counts.items()}

        got_d = {
            r["seg"] for r in distinct_values(df, ["seg"], ci=True).collect()
        }
        assert got_d == set(rep.values())

        got_dup = {
            r["seg"]: r["dup_count"]
            for r in duplicate_keys(df.select("seg"), ["seg"], ci=True)
            .collect()
        }
        assert got_dup == {rep[k]: n for k, n in counts.items() if n > 1}

        got_sorted = [
            (r["seg"], r["id"])
            for r in sort(df, ["seg", "id"], ci=True).collect()
        ]
        want_sorted = sorted(
            ((w, i) for i, w in enumerate(vals)),
            key=lambda t: (t[0].lower(), t[0], t[1]),
        )
        assert got_sorted == want_sorted
