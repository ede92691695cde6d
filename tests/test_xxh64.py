"""Pure-Python XXH64 spec twin (text/xxh64.py) and the Python-oracle
bit-identity pins it enables for the three xxhash64 PRODUCTION registry
entries that DuckDB cannot oracle (``minhash_pairs_docs``,
``simhash_pairs_docs``, ``lsh_topk_embeddings``) — upgrading them from
rows-only to value-pinned.

The oracles below recompute each operator's full output in plain Python
(dicts + the spec-twin hash) from the raw fixture text/vectors, then
assert EXACT equality with the Spark result — same discipline as the
DuckDB oracles, but in-process because DuckDB has no xxhash64.
"""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from ssis_to_dbt_spark.text.xxh64 import (
    spark_xxhash64,
    xxh64_bytes,
    xxh64_int,
    xxh64_long,
    xxh64_string,
)

SF = "/root/testdata/sf0.001"
_WS = re.compile(r"\s+", re.ASCII)


class TestXxh64SpecTwin:
    """The Python implementation must reproduce Spark's F.xxhash64
    bit-for-bit for every input type the engine hashes."""

    STRINGS = [
        "", "a", "abc", "hello world",
        "x" * 7, "y" * 8, "z" * 12, "w" * 31, "v" * 32, "u" * 33,
        "t" * 100, "m" * 1000,
        "héllo wörld ünïcode", "日本語テキスト", "emoji 🎉 test",
        "tab\tnew\nline", " lead trail ", "null\x00byte",
    ]

    def test_strings_match_spark(self, spark):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(self.STRINGS)], "i int, s string"
        )
        got = {
            r["i"]: (r["h1"], r["h2"], r["h3"])
            for r in df.select(
                "i",
                F.xxhash64("s").alias("h1"),
                F.xxhash64(F.lit(7), F.col("s")).alias("h2"),
                F.xxhash64(F.col("i").cast("long"), F.col("s")).alias("h3"),
            ).collect()
        }
        for i, s in enumerate(self.STRINGS):
            assert got[i] == (
                xxh64_string(s),
                spark_xxhash64(("int", 7), s),
                spark_xxhash64(("long", i), s),
            ), repr(s)

    def test_numeric_paths_match_spark(self, spark):
        ints = [0, 1, -1, 42, -42, 2**31 - 1, -(2**31)]
        longs = [0, 1, -1, 123456789, -987654321098, 2**63 - 1, -(2**63)]
        row = spark.range(1).select(
            *[F.xxhash64(F.lit(v)).alias(f"i{k}") for k, v in enumerate(ints)],
            *[
                F.xxhash64(F.lit(v).cast("long")).alias(f"l{k}")
                for k, v in enumerate(longs)
            ],
        ).collect()[0]
        for k, v in enumerate(ints):
            assert row[f"i{k}"] == xxh64_int(v), v
        for k, v in enumerate(longs):
            assert row[f"l{k}"] == xxh64_long(v), v

    def test_chaining_and_null_skip(self, spark):
        row = spark.range(1).select(
            F.xxhash64(F.lit("a"), F.lit("b"), F.lit("c")).alias("h1"),
            F.xxhash64(
                F.lit(None).cast("string"), F.lit("x")
            ).alias("h2"),
            F.xxhash64(F.lit(1), F.lit(2).cast("long"), F.lit("z")).alias(
                "h3"
            ),
        ).collect()[0]
        assert row["h1"] == spark_xxhash64("a", "b", "c")
        assert row["h2"] == spark_xxhash64(None, "x") == xxh64_string("x")
        assert row["h3"] == spark_xxhash64(("int", 1), ("long", 2), "z")

    def test_binary_path(self, spark):
        data = [b"", b"abc", bytes(range(256)), b"q" * 33]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(data)], "i int, b binary"
        )
        got = {r["i"]: r["h"] for r in df.select(
            "i", F.xxhash64("b").alias("h")).collect()}
        for i, v in enumerate(data):
            assert got[i] == xxh64_bytes(v), v


def _toks(text: str) -> list[str]:
    """Python twin of dedup._tokens: split(trim(lower(text)), '\\s+') —
    ASCII regex, space-only trim, Java keeps a leading empty token."""
    t = text.lower().strip(" ")
    return _WS.split(t)


def _shingles(text: str, n: int = 3) -> list[str]:
    toks = _toks(text)
    k = len(toks) - (n - 1)
    if k > 0:
        grams = [" ".join(toks[i:i + n]) for i in range(k)]
    else:
        grams = [" ".join(toks)]
    out, seen = [], set()
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _round6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


class TestXxhashProductionTwinsValuePinned:
    """Value pins for the rows-only registry entries: the same operator
    calls the registry queries make, on real fixture text/vectors (plus
    planted near-dups so the pair sets are non-empty), against a complete
    Python recomputation."""

    def _docs(self, spark):
        """First 25 fixture docs + 5 planted near-dups (one appended
        token) — guarantees band collisions without synthetic text."""
        docs = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .filter(F.col("doc_id") < 25)
        )
        dups = docs.filter(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 1000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        )
        return docs.unionByName(dups)

    def test_minhash_pairs_bit_identical_to_python_oracle(self, spark):
        from ssis_to_dbt_spark.text.dedup import minhash_candidates

        df = self._docs(spark)
        got = sorted(
            (r["doc_a"], r["doc_b"], r["est_jaccard"])
            for r in minhash_candidates(df).collect()
        )

        rows = df.collect()
        sigs: dict[int, list[int]] = {}
        for r in rows:
            grams = _shingles(r["text"])
            sigs[r["doc_id"]] = [
                min(spark_xxhash64(("int", i), g) for g in grams)
                for i in range(64)
            ]
        buckets: dict[tuple[int, int], list[int]] = {}
        for did, sig in sigs.items():
            for b in range(16):
                bh = xxh64_string(
                    ",".join(str(v) for v in sig[b * 4:(b + 1) * 4])
                )
                buckets.setdefault((b, bh), []).append(did)
        pairs = set()
        for members in buckets.values():
            for a in members:
                for b in members:
                    if a < b:
                        pairs.add((a, b))
        want = sorted(
            (
                a,
                b,
                sum(x == y for x, y in zip(sigs[a], sigs[b])) / 64.0,
            )
            for a, b in pairs
        )
        assert len(want) > 0, "fixture subset produced no candidate pairs"
        assert got == want

    def test_simhash_pairs_bit_identical_to_python_oracle(self, spark):
        from ssis_to_dbt_spark.text.dedup import simhash_candidates

        df = self._docs(spark)
        got = sorted(
            (r["doc_a"], r["doc_b"], r["hamming_distance"])
            for r in simhash_candidates(df, band_bits=16)
            .filter(F.col("hamming_distance") <= 12)
            .collect()
        )

        rows = df.collect()
        fps: dict[int, int] = {}
        for r in rows:
            votes = [0] * 48
            for tok in _toks(r["text"]):
                h = xxh64_string(tok)
                for j in range(48):
                    votes[j] += 1 if (h >> j) & 1 == 1 else -1
            fps[r["doc_id"]] = sum(
                (1 << j) for j in range(48) if votes[j] > 0
            )
        buckets: dict[tuple[int, int], list[int]] = {}
        for did, fp in fps.items():
            for b in range(3):
                buckets.setdefault(
                    (b, (fp >> (b * 16)) & 0xFFFF), []
                ).append(did)
        pairs = set()
        for members in buckets.values():
            for a in members:
                for b in members:
                    if a < b:
                        pairs.add((a, b))
        want = sorted(
            (a, b, (fps[a] ^ fps[b]).bit_count())
            for a, b in pairs
            if (fps[a] ^ fps[b]).bit_count() <= 12
        )
        assert len(want) > 0, "fixture subset produced no simhash pairs"
        assert got == want

    def test_lsh_topk_bit_identical_to_python_oracle(self, spark):
        """Replicates the registry entry q_lsh_topk_embeddings exactly:
        xxhash64 Rademacher planes (seed 0, 4 planes), query = vec 0's
        bucket, exact cosine top-10, round(cosine, 6)."""
        from ssis_to_dbt_spark.catalog import ALL_QUERIES

        got = [
            (r["vec_id"], r["cosine_r"])
            for r in ALL_QUERIES["lsh_topk_embeddings"](spark, SF).collect()
        ]

        vecs = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        }
        dims = len(vecs[0])
        planes = [
            [
                1.0
                if spark_xxhash64(("int", 0), ("int", p), ("int", j)) & 1 == 1
                else -1.0
                for j in range(dims)
            ]
            for p in range(4)
        ]

        def bucket(v):
            b = 0
            for p, plane in enumerate(planes):
                acc = 0.0
                for x, s in zip(v, plane):
                    acc = acc + x * s
                if acc > 0:
                    b |= 1 << p
            return b

        q = vecs[0]
        qb = bucket(q)

        def fold_dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        def norm(a):
            import math

            acc = 0.0
            for x in a:
                acc = acc + x * x
            return math.sqrt(acc)

        scored = []
        for vid, v in vecs.items():
            if bucket(v) != qb:
                continue
            denom = norm(v) * norm(q)
            c = fold_dot(v, q) / denom if denom > 0 else 0.0
            scored.append((vid, c))
        scored.sort(key=lambda t: (-t[1], t[0]))
        want = [(vid, _round6(c)) for vid, c in scored[:10]]
        assert len(want) > 0
        assert got == want


class TestXxh64Property:
    """Hypothesis sweep: random unicode strings and random byte blobs
    through Spark vs the Python spec twin — one createDataFrame per
    example set keeps the job count bounded."""

    def test_random_strings_and_bytes(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        @given(
            strs=st.lists(
                st.text(min_size=0, max_size=120), min_size=1, max_size=12
            ),
            blobs=st.lists(
                st.binary(min_size=0, max_size=200), min_size=1, max_size=8
            ),
        )
        @settings(max_examples=8, deadline=None,
                  suppress_health_check=[
                      HealthCheck.function_scoped_fixture])
        def inner(strs, blobs):
            # Spark strings are UTF-8: surrogates can't round-trip
            strs = [
                s.encode("utf-8", "surrogatepass").decode(
                    "utf-8", "replace"
                )
                for s in strs
            ]
            df = spark.createDataFrame(
                [(i, s) for i, s in enumerate(strs)], "i int, s string"
            )
            got = {
                r["i"]: (r["h"], r["hc"])
                for r in df.select(
                    "i",
                    F.xxhash64("s").alias("h"),
                    F.xxhash64(F.lit(3), F.col("s")).alias("hc"),
                ).collect()
            }
            for i, s in enumerate(strs):
                assert got[i] == (
                    xxh64_string(s),
                    spark_xxhash64(("int", 3), s),
                ), repr(s)
            bdf = spark.createDataFrame(
                [(i, b) for i, b in enumerate(blobs)], "i int, b binary"
            )
            bgot = {
                r["i"]: r["h"]
                for r in bdf.select(
                    "i", F.xxhash64("b").alias("h")
                ).collect()
            }
            for i, b in enumerate(blobs):
                assert bgot[i] == xxh64_bytes(b), b

        inner()
