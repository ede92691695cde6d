"""Corpus retrieval / supervised-scoring operators: BM25 top-k search and
a multinomial Naive Bayes classifier (fit + apply).

Both are classic public-domain algorithms (Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond"; McCallum &
Nigam 1998 for multinomial NB) expressed as pure DataFrame plans — no
UDFs, no driver-side loops over data.  They extend the engine's
training-data-curation surface: BM25 is the standard lexical retriever
for "find documents like this query" corpus probes, and NB is the
cheapest useful document-quality / domain classifier (the fastText-style
linear baseline) that can be trained inside the same Spark job that
scores the corpus.

Reference analog: the reference's validation layer computes corpus-level
scalar checks (``src/validation/validator.py``); these operators are the
retrieval/classification extension of the same "derive a corpus
statistic, score every row against it" shape, per the engine-extension
charter (SURVEY.md §2.16+).

Determinism discipline (the :func:`~ssis_to_dbt_spark.text.analysis
.bigram_surprisal` pattern): every ``ln()`` result is round(x, 6)
quantized and converted to exact integer micro-units (BIGINT) BEFORE any
summation, so scores are exact integers — order-independent under
Spark's parallel partial aggregation and bit-equal across engines whose
``ln`` differs in the last ulp (JVM vs libm, observed ~8% of inputs).

100 TB shape:
- BM25: the query-term table is a literal (broadcast, a few rows), so
  the corpus explode filters to query terms MAP-SIDE before the
  (doc, term) count agg — the only wide relation is |hits|, not |tokens|.
  Doc lengths are one map-side projection + per-doc agg; corpus scalars
  (N, avgdl) reach the score via a broadcast 1-row crossJoin.  Final
  top-k is a per-query WindowGroupLimit (k rows per query cross the
  exchange, not the corpus).
- NB fit: one (label, term) hash agg with map-side combine; the model
  grid is |vocab| x |labels| rows — bounded model state, not data.
- NB apply: one (doc, term) count agg, one join against the model grid
  (broadcast when the measured vocab is small; token-keyed shuffle
  otherwise), one per-(doc, label) sum, one per-doc argmax window.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import _tokens

_UNIT = 1_000_000


def _ln_units(x: Column) -> Column:
    """round(ln(x), 6) as exact integer micro-units (BIGINT)."""
    return (
        F.round(F.log(x), 6).cast(T.DecimalType(18, 6)) * _UNIT
    ).cast("long")


def _doc_len(text: Column) -> Column:
    """Whitespace token count of lowercased text; blank text counts 0
    (the corpus-wide ``n_tokens`` convention)."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(_tokens(text))
    )


def bm25_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 lexical top-k search: for each named query (a bag of
    lowercase terms), the ``top_k`` highest-scoring documents.

    score(q, d) = sum over distinct terms t in q of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with the Lucene-style non-negative idf
        idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5)).

    Each per-term contribution is round(x, 6)-quantized to integer
    micro-units before the per-(query, doc) sum (module determinism
    discipline), so ``score_units`` is an exact BIGINT.  Ranking ties
    break on ascending ``doc_id``.

    Returns ``(query_id, doc_id, n_terms, score_units, rn)`` — ``n_terms``
    is how many of the query's terms the document contains.

    100 TB shape (module doc): the literal query-term table broadcasts,
    the corpus token explode filters to query terms map-side, and only
    per-query top-k rows cross the final exchange (WindowGroupLimit).
    """
    spark = df.sparkSession
    qterms = spark.createDataFrame(
        sorted({(q, t) for q, terms in queries.items() for t in terms}),
        "query_id string, term string",
    )
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    # map-side prune to the query vocabulary BEFORE the (doc, term) agg
    hits = toks.join(F.broadcast(qterms.select("term").distinct()), "term")
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    dl = df.select(
        F.col(id_col), _doc_len(F.col(text_col)).alias("dl")
    )
    scalars = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_doc_len(F.col(text_col))).alias("total_dl"),
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
    )
    n = F.col("n_docs").cast("double")
    df_t = F.col("df_t").cast("double")
    idf = F.log(
        F.lit(1.0) + (n - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
    )
    avgdl = F.col("total_dl").cast("double") / n
    tfd = F.col("tf").cast("double")
    tfp = (
        tfd * (F.lit(k1) + 1.0)
        / (tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    units = (
        F.round(idf * tfp, 6).cast(T.DecimalType(18, 6)) * _UNIT
    ).cast("long")
    per_term = scored.select(id_col, "term", units.alias("u"))
    per_q = (
        per_term.join(F.broadcast(qterms), "term")
        .groupBy("query_id", id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("u").alias("score_units"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_units").desc(), F.col(id_col)
    )
    return (
        per_q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select(
            "query_id",
            id_col,
            F.col("n_terms").cast("long").alias("n_terms"),
            "score_units",
            F.col("rn").cast("int").alias("rn"),
        )
    )


@dataclass
class NBModel:
    """Multinomial NB model state: the (label, term) log-likelihood grid
    (Laplace-smoothed over the GLOBAL training vocabulary, so every
    vocab term has a defined log-likelihood under every label) and the
    per-label log-priors.  Both are bounded model relations
    (|vocab| x |labels| and |labels| rows), not data."""

    grid: DataFrame     # (label, term, ll_units)
    priors: DataFrame   # (label, prior_units)


def nb_fit(
    train_df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    alpha: int = 1,
) -> NBModel:
    """Fit a multinomial Naive Bayes text classifier on whitespace tokens
    of lowercased ``text_col`` with add-``alpha`` (Laplace) smoothing:

        ll(t | c)  = ln((count(t, c) + alpha) / (tokens_c + alpha * V))
        prior(c)   = ln(n_docs_c / n_docs)

    quantized to integer micro-units (module discipline).  The grid is
    the full labels x vocabulary cross (unseen (t, c) pairs get the
    smoothed floor), so scoring needs no per-row fallback logic.

    100 TB shape: one (label, term) hash agg with map-side combine over
    the exploded tokens; the vocabulary scalar reaches the grid via a
    broadcast 1-row crossJoin; grid size is model-bounded.
    """
    toks = train_df.select(
        F.col(label_col).alias("label"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    counts = toks.groupBy("label", "term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    class_tok = counts.groupBy("label").agg(F.sum("cnt").alias("tok_c"))
    vocab = counts.select("term").distinct()
    v = vocab.agg(F.count(F.lit(1)).alias("v_size"))
    grid = (
        class_tok.crossJoin(vocab)
        .join(counts, ["label", "term"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "label",
            "term",
            _ln_units(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha)).cast(
                    "double"
                )
                / (
                    F.col("tok_c") + F.lit(alpha) * F.col("v_size")
                ).cast("double")
            ).alias("ll_units"),
        )
    )
    n = train_df.agg(F.count(F.lit(1)).alias("n_all"))
    priors = (
        train_df.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_c"))
        .crossJoin(F.broadcast(n))
        .select(
            "label",
            _ln_units(
                F.col("n_c").cast("double") / F.col("n_all").cast("double")
            ).alias("prior_units"),
        )
    )
    return NBModel(grid=grid, priors=priors)


def nb_predict(
    model: NBModel,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents under a fitted :class:`NBModel` and return the
    argmax label per document:

        score(d, c) = prior_units(c)
                      + sum over vocab terms t of m(d, t) * ll_units(t, c)

    where m(d, t) is the document's term count; out-of-vocabulary tokens
    are dropped (they carry no class signal under the model).  Documents
    with NO in-vocabulary tokens still get a row — their score is the
    prior alone, via the (doc x label) left join.  Ties break on
    ascending label.  Exact integer arithmetic throughout.

    Returns ``(doc_id, pred_label, best_units, n_vocab_toks)``.

    ``broadcast_model=True`` hints the model grid broadcast (the model is
    bounded |vocab| x |labels|); pass False when a measured vocabulary is
    too large for the broadcast cap — the join then shuffles on the term
    key, and the per-(doc, label) agg is unchanged.
    """
    m = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    ).groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("m"))
    grid = F.broadcast(model.grid) if broadcast_model else model.grid
    contrib = m.join(grid, "term").groupBy(id_col, "label").agg(
        F.sum(F.col("m") * F.col("ll_units")).alias("tok_units"),
        F.sum("m").alias("n_vocab_toks"),
    )
    base = df.select(F.col(id_col)).crossJoin(F.broadcast(model.priors))
    scores = base.join(contrib, [id_col, "label"], "left").select(
        id_col,
        "label",
        (
            F.col("prior_units")
            + F.coalesce(F.col("tok_units"), F.lit(0))
        ).alias("score_units"),
        F.coalesce(F.col("n_vocab_toks"), F.lit(0)).alias("n_vocab_toks"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_units").desc(), F.col("label")
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            id_col,
            F.col("label").alias("pred_label"),
            F.col("score_units").alias("best_units"),
            F.col("n_vocab_toks").cast("long").alias("n_vocab_toks"),
        )
    )
