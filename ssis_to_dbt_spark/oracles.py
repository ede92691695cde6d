"""Shared DuckDB-oracle SQL fragment builders.

Split out of ``catalog.py`` (r10 — the r9 verdict asked for the catalog
to keep shedding families as it grows): every PARAMETERIZED SQL fragment
that more than one oracle composes — minhash pair CTEs, the Gopher
signal battery, near-dup transitive closure, the two packers, the
temperature mixture, the DSIR fit/score chain, and the composed
curation-pipeline / two-batch crawl-ingest oracles built from them.
Pure string builders: no Spark imports, no query functions — those stay
in ``catalog.py`` and import the SQL from here, so a drift between an
engine query and its oracle text still breaks exactly one definition.

Single-source-of-truth rule: a stage's fragment appears HERE once and
every consumer (standalone oracle, suite oracle, composed pipeline,
crawl loop) re-sources it at its own CTE — drift between consumers is
impossible by construction (r8 ADVICE #3 discipline).
"""

from __future__ import annotations

# Shared pair-generation CTE text: SQL_MINHASH_MD5 and SQL_NEARDUP_CLUSTERS
# must derive the pair set from the byte-identical SQL or the cluster oracle
# would drift from the pair oracle.
def _minhash_md5_ctes(src: str = "documents") -> str:
    """The shared pair-generation CTE text, parameterized on the corpus
    source so the composed curation-pipeline oracle can band the GATED
    corpus (pair sets are subset-dependent — banding collisions only among
    surviving docs)."""
    return rf"""toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM {src}),
sh0 AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct(list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(t[i:i+2], ' ')))
              ELSE [array_to_string(t, ' ')] END AS shingles
  FROM toks),
sh AS (SELECT doc_id, unnest(shingles) AS sh FROM sh0),
perms AS (SELECT range AS perm FROM range(8)),
sig AS (SELECT doc_id, perm, min(md5(perm || ':' || sh)) AS sig
        FROM sh CROSS JOIN perms GROUP BY doc_id, perm),
band AS (SELECT doc_id, perm // 2 AS band_idx,
                md5(string_agg(sig, '|' ORDER BY perm)) AS band_hash
         FROM sig GROUP BY doc_id, perm // 2),
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM band a JOIN band b USING (band_idx, band_hash)
          WHERE a.doc_id < b.doc_id)"""


_MINHASH_MD5_CTES = _minhash_md5_ctes()

def _gopher_signal_sql(source: str) -> str:
    """DuckDB replica of the Gopher signal battery over ``source`` (any
    relation with doc_id, text) — shared by the standalone oracle and the
    corpus-curation suite oracle.  Same integer counts, same double
    divisions, same lex-smallest argmax tie-break as the Spark expressions."""
    ngram_arms = "\n    UNION ALL\n".join(
        f"""    SELECT doc_id, {n} AS n,
      unnest(list_transform(range(1, greatest(len(t) - {n} + 2, 1)),
                            i -> array_to_string(list_slice(t, i, i + {n - 1}), ' '))) AS g
    FROM b"""
        for n in (2, 3, 4, 5)
    )
    return f"""
WITH src AS ({source}),
b AS (
  SELECT doc_id, text,
    regexp_split_to_array(trim(text), '\\s+') AS t,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
    length(text) AS n_chars,
    length(regexp_replace(text, '\\s', '', 'g')) AS n_nospace,
    length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_sym,
    len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|a)\\b')) AS stop_hits,
    len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                    x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words
  FROM src),
lines AS (
  SELECT doc_id,
    len(list_filter(string_split(text, chr(10)), l -> trim(l) <> '')) AS n_lines,
    len(list_filter(string_split(text, chr(10)),
        l -> trim(l) <> '' AND regexp_matches(trim(l), '^[-*•]'))) AS n_bullet,
    len(list_filter(string_split(text, chr(10)),
        l -> trim(l) <> '' AND regexp_matches(trim(l), '(\\.\\.\\.|…)$'))) AS n_ellip
  FROM src),
gg AS (
{ngram_arms}),
cnt AS (SELECT doc_id, n, g, COUNT(*) AS c FROM gg GROUP BY doc_id, n, g),
dup AS (
  SELECT doc_id, n,
    CAST(SUM(c) - COUNT(*) AS DOUBLE) / SUM(c) AS dup_frac,
    SUM(CASE WHEN c > 1 THEN c * length(replace(g, ' ', '')) ELSE 0 END) AS dup_chars
  FROM cnt GROUP BY doc_id, n),
top AS (
  SELECT doc_id, n, c * length(replace(g, ' ', '')) AS top_chars FROM (
    SELECT doc_id, n, g, c,
           row_number() OVER (PARTITION BY doc_id, n ORDER BY c DESC, g ASC) AS rn
    FROM cnt) WHERE rn = 1),
dagg AS (
  SELECT doc_id,
    MAX(CASE WHEN n = 2 THEN dup_frac END) AS dup2,
    MAX(CASE WHEN n = 3 THEN dup_frac END) AS dup3,
    MAX(CASE WHEN n = 5 THEN dup_chars END) AS dupc5
  FROM dup GROUP BY doc_id),
tagg AS (
  SELECT doc_id,
    MAX(CASE WHEN n = 2 THEN top_chars END) AS top2,
    MAX(CASE WHEN n = 3 THEN top_chars END) AS top3,
    MAX(CASE WHEN n = 4 THEN top_chars END) AS top4
  FROM top GROUP BY doc_id),
sig AS (
  SELECT b.doc_id, b.n_tokens, b.n_chars, b.n_nospace, b.n_sym, b.stop_hits,
    COALESCE(dagg.dup2, 0.0) AS dup_2gram_frac,
    COALESCE(dagg.dup3, 0.0) AS dup_3gram_frac,
    CASE WHEN b.n_nospace > 0
         THEN COALESCE(CAST(tagg.top2 AS DOUBLE) / b.n_nospace, 0.0)
         ELSE 0.0 END AS top_2gram_char_frac,
    CASE WHEN b.n_nospace > 0
         THEN COALESCE(CAST(tagg.top3 AS DOUBLE) / b.n_nospace, 0.0)
         ELSE 0.0 END AS top_3gram_char_frac,
    CASE WHEN b.n_nospace > 0
         THEN COALESCE(CAST(tagg.top4 AS DOUBLE) / b.n_nospace, 0.0)
         ELSE 0.0 END AS top_4gram_char_frac,
    CASE WHEN b.n_nospace > 0
         THEN COALESCE(CAST(dagg.dupc5 AS DOUBLE) / b.n_nospace, 0.0)
         ELSE 0.0 END AS dup_5gram_char_frac,
    CASE WHEN lines.n_lines > 0
         THEN CAST(lines.n_bullet AS DOUBLE) / lines.n_lines
         ELSE 0.0 END AS bullet_line_frac,
    CASE WHEN lines.n_lines > 0
         THEN CAST(lines.n_ellip AS DOUBLE) / lines.n_lines
         ELSE 0.0 END AS ellipsis_line_frac,
    CASE WHEN b.n_tokens > 0
         THEN CAST(b.alpha_words AS DOUBLE) / b.n_tokens
         ELSE 0.0 END AS alpha_word_frac,
    CASE WHEN b.n_tokens > 0
         THEN CAST(b.n_nospace AS DOUBLE) / b.n_tokens
         ELSE 0.0 END AS mean_word_len,
    CASE WHEN b.n_chars > 0
         THEN CAST(b.n_sym AS DOUBLE) / b.n_chars
         ELSE 0.0 END AS symbol_frac
  FROM b LEFT JOIN dagg USING (doc_id)
         LEFT JOIN tagg USING (doc_id)
         JOIN lines USING (doc_id))
SELECT doc_id,
  dup_2gram_frac, dup_3gram_frac,
  top_2gram_char_frac, top_3gram_char_frac, top_4gram_char_frac,
  dup_5gram_char_frac, bullet_line_frac, ellipsis_line_frac,
  alpha_word_frac,
  CAST(stop_hits AS INTEGER) AS stop_hits,
  (n_tokens BETWEEN 50 AND 100000
   AND mean_word_len BETWEEN 3.0 AND 10.0
   AND symbol_frac <= 0.1
   AND bullet_line_frac <= 0.9
   AND ellipsis_line_frac <= 0.3
   AND alpha_word_frac >= 0.8
   AND stop_hits >= 2
   AND top_2gram_char_frac <= 0.20
   AND top_3gram_char_frac <= 0.18
   AND top_4gram_char_frac <= 0.16
   AND dup_5gram_char_frac <= 0.15) AS gopher_pass
FROM sig"""


SQL_GOPHER_QUALITY = _gopher_signal_sql("SELECT doc_id, text FROM documents")

# Transitive-closure fragment shared by the cluster and prune oracles —
# both must derive components from byte-identical SQL.
_NEARDUP_COMP_CTES = """edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach AS (
  SELECT node, node AS label FROM nodes
  UNION
  SELECT e.dst AS node, r.label
  FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(label) AS canonical_id
         FROM reach GROUP BY node)"""

# The auto-sizing target the PRODUCTION pack consumers (pipeline stage 6,
# crawl-ingest pack) share with their oracles — imported, not retyped, so
# engine and SQL can never drift.
from .text.analysis import (  # noqa: E402
    DEFAULT_TARGET_BUCKET_TOKENS as _PACK_AUTO_TARGET,
)


def _pack_ctes(src: str, p: str = "", target: int | None = None) -> str:
    """The concat-and-chop packing CTE chain ``pt -> pb -> pc``
    parameterized on the corpus source — shared verbatim by the standalone
    :func:`_pack_sql` oracle, the composed pipeline oracle, and (via the
    ``p`` CTE-name prefix, which lets one query pack several stage
    outputs) the two-batch crawl-ingest oracle — single source of truth:
    a drift between consumers would otherwise fail only via hash
    mismatch.

    ``target=None`` keeps the fixed 16-stream form (the standalone
    `pack_docs` entry, which deliberately exercises stream interleaving
    at fixture scale); a target derives the AUTO-SIZED stream count
    ``{p}nb`` with the engine's exact integer arithmetic — consumers
    must then build ``seq_id`` as ``... * nb + bucket`` from a CROSS
    JOIN against ``{p}nb`` (see :func:`_pack_seq_id_sql`)."""
    if target is None:
        nb_cte = f"{p}nb AS (SELECT 16 AS nb),"
    else:
        nb_cte = (
            f"{p}nb AS (\n"
            f"  SELECT GREATEST((COALESCE(SUM(CAST(n_tok AS BIGINT)), 0)"
            f" + {int(target)} - 1)\n"
            f"             // {int(target)}, 1) AS nb\n"
            f"  FROM {p}pt),"
        )
    return rf"""{p}pt AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM {src}),
{nb_cte}
{p}pb AS (
  SELECT doc_id, n_tok, h,
         CAST('0x' || substr(h, 1, 15) AS BIGINT) % {p}nb.nb AS bucket
  FROM {p}pt CROSS JOIN {p}nb),
{p}pc AS (
  SELECT doc_id, n_tok, bucket,
         SUM(n_tok) OVER (PARTITION BY bucket ORDER BY h
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM {p}pb)"""


def _pack_seq_id_sql(p: str = "") -> str:
    """The packed ``seq_id`` expression for :func:`_pack_ctes` consumers
    (requires ``FROM {p}pc CROSS JOIN {p}nb``)."""
    return f"CAST(((cum - n_tok) // 512) * {p}nb.nb + bucket AS BIGINT)"


def _pack_sql(src: str = "documents") -> str:
    """Sequence-packing SQL parameterized on the corpus source (the
    composed pipeline packs the post-mixture survivors)."""
    return f"""
WITH {_pack_ctes(src)}
SELECT doc_id,
       {_pack_seq_id_sql()} AS seq_id,
       CAST(cum - n_tok AS BIGINT) AS start_tok,
       CAST(cum AS BIGINT) AS end_tok
FROM pc CROSS JOIN nb
"""


SQL_PACK_DOCS = _pack_sql()


_PACK_NOSPLIT_TARGET = 4096  # tokens per packing stream at fixture scale

def _pack_nosplit_sql(src: str = "documents",
                      target: int = _PACK_NOSPLIT_TARGET) -> str:
    """Recursive-CTE oracle for the no-split packer, deriving the bucket
    count with the engine's exact integer arithmetic
    ``max(1, (total + target - 1) // target)``."""
    return rf"""
WITH RECURSIVE pt AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
           AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM {src}),
nbq AS (
  SELECT GREATEST(
           (COALESCE(SUM(CAST(n_tok AS BIGINT)), 0) + {target} - 1)
             // {target},
           1) AS nb
  FROM pt),
pb AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, h,
         CAST('0x' || substr(h, 1, 15) AS BIGINT) % nbq.nb AS bucket
  FROM pt CROSS JOIN nbq),
po AS (
  SELECT *, row_number() OVER (PARTITION BY bucket
                               ORDER BY n_tok DESC, h) AS rn
  FROM pb),
fold AS (
  SELECT bucket, rn, doc_id, n_tok,
         CAST(0 AS BIGINT) AS seq_local,
         CAST(0 AS BIGINT) AS start_tok,
         n_tok AS fill
  FROM po WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.rn, o.doc_id, o.n_tok,
         CASE WHEN f.fill + o.n_tok > 512 AND f.fill > 0
              THEN f.seq_local + 1 ELSE f.seq_local END,
         CASE WHEN f.fill + o.n_tok > 512 AND f.fill > 0
              THEN CAST(0 AS BIGINT) ELSE f.fill END,
         CASE WHEN f.fill + o.n_tok > 512 AND f.fill > 0
              THEN o.n_tok ELSE f.fill + o.n_tok END
  FROM fold f JOIN po o ON o.bucket = f.bucket AND o.rn = f.rn + 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(seq_local * nbq.nb + bucket AS BIGINT) AS seq_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(start_tok + n_tok AS BIGINT) AS end_tok
FROM fold CROSS JOIN nbq
"""


SQL_PACK_NOSPLIT = _pack_nosplit_sql()

def _mixture_ctes(src: str) -> str:
    """The temperature-mixture CTE chain ``mn -> mj -> mtw -> mt -> madm``
    parameterized on the corpus source — shared verbatim by the standalone
    :func:`_temperature_mixture_sql` oracle and the composed pipeline
    oracle (single source of truth)."""
    return f"""mn AS (SELECT lang, COUNT(*) AS n_g FROM {src} GROUP BY lang),
mj AS (SELECT lang, CAST(n_g AS HUGEINT) AS n_g,
              CAST(floor(sqrt(CAST(n_g AS DOUBLE))) AS HUGEINT) AS wt
       FROM mn),
mtw AS (SELECT SUM(wt) AS total_w FROM mj),
mt AS (SELECT MIN(mj.n_g * mtw.total_w // mj.wt) AS t_total FROM mj, mtw),
madm AS (SELECT mj.lang,
                GREATEST(CAST(65536 * mt.t_total * mj.wt
                              // (mtw.total_w * mj.n_g) AS BIGINT), 1)
                  AS admit
         FROM mj, mt, mtw)"""


def _mixture_admit_where(alias: str = "d") -> str:
    """The content-addressed admit predicate against ``madm``."""
    return (
        f"CAST('0x' || substr(md5(CAST({alias}.doc_id AS VARCHAR)), 1, 4) "
        "AS BIGINT) < madm.admit"
    )


def _temperature_mixture_sql(src: str = "documents") -> str:
    """Temperature-mixture SQL parameterized on the corpus source — group
    counts (and so admit rates) are subset-dependent, which the composed
    pipeline oracle needs after the DSIR-select stage."""
    return f"""
WITH {_mixture_ctes(src)}
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(d.lang AS VARCHAR) AS lang
FROM {src} d JOIN madm USING (lang)
WHERE {_mixture_admit_where('d')}
"""


SQL_TEMPERATURE_MIXTURE = _temperature_mixture_sql()

# round(ln(m), 6) as BIGINT micro-units — the engine's _log_units discipline.
def _sql_log_units(m: str) -> str:
    return (
        f"CAST(CAST(round(ln(CAST({m} AS DOUBLE)), 6) AS DECIMAL(18,6))"
        " * 1000000 AS BIGINT)"
    )


def _dsir_doc_cnt_ctes(src: str) -> str:
    """Per-DOCUMENT gram bucket counts ``tk -> grams -> cnt`` — these are
    corpus-INDEPENDENT (each doc's counts depend only on its own text),
    so the two-batch crawl-ingest oracle computes them once over all
    documents and aggregates different fit-corpus subsets from the same
    ``cnt`` relation."""
    return rf"""tk AS (
  SELECT doc_id, (lang = 'en') AS tgt,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM {src}),
grams AS (
  SELECT doc_id, tgt, unnest(t) AS g FROM tk
  UNION ALL
  SELECT doc_id, tgt, t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1]
  FROM (SELECT doc_id, tgt, t, unnest(range(1, len(t))) AS i FROM tk) _x),
cnt AS (
  SELECT doc_id, tgt,
         CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 256 AS b,
         COUNT(*) AS c
  FROM grams GROUP BY 1, 2, 3)"""


# The content-addressed Gumbel draw in engine micro-units (shared by every
# DSIR oracle fragment).
_SQL_GUMBEL = """CAST(CAST(round(-ln(-ln(
             (CAST(CAST('0x' || substr(md5(CAST({alias}.doc_id AS VARCHAR)), 1, 15)
                        AS BIGINT) + 1 AS DOUBLE))
             / 2305843009213693952.0)), 6) AS DECIMAL(18,6)) * 1000000
              AS BIGINT)"""


def _dsir_ctes(src: str = "documents") -> str:
    """DSIR fit+score CTE text parameterized on the corpus source: the
    bucket model is subset-dependent (counts come from the fit corpus), so
    the composed pipeline oracle must fit on the surviving stage-3 docs."""
    return rf"""{_dsir_doc_cnt_ctes(src)},
bstat AS (
  SELECT b, CAST(SUM(c) AS BIGINT) AS q_cnt,
         CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS p_cnt
  FROM cnt GROUP BY b),
tot AS (SELECT CAST(SUM(q_cnt) AS BIGINT) AS qt,
               CAST(SUM(p_cnt) AS BIGINT) AS pt FROM bstat),
ratio AS (
  SELECT b, {_sql_log_units('p_cnt + 1')} - {_sql_log_units('pt + 256')}
            - {_sql_log_units('q_cnt + 1')} + {_sql_log_units('qt + 256')}
            AS r_units
  FROM bstat CROSS JOIN tot),
sc AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
         CAST(SUM(c * r_units) AS BIGINT) AS weight_units
  FROM cnt JOIN ratio USING (b) GROUP BY doc_id),
scored AS (
  SELECT d.doc_id,
         COALESCE(sc.n_feats, 0) AS n_feats,
         COALESCE(sc.weight_units, 0) AS weight_units,
         {_SQL_GUMBEL.format(alias='d')} AS gumbel_units
  FROM {src} d LEFT JOIN sc USING (doc_id))"""


_DSIR_CTES = _dsir_ctes()

SQL_DSIR = f"""
WITH {_DSIR_CTES},
top AS (
  SELECT doc_id FROM scored
  ORDER BY weight_units + gumbel_units DESC, doc_id LIMIT 100)
SELECT s.doc_id, s.n_feats, s.weight_units, s.gumbel_units,
       (t.doc_id IS NOT NULL) AS picked
FROM scored s LEFT JOIN top t USING (doc_id)
"""

# The map-only fit-then-apply path scores the SAME corpus the model was fit
# on, so its weights coincide with the fused two-pass formulation — one
# oracle text serves both (bit-identity between the two engine paths is
# additionally pinned in tests/test_text.py::TestDsir).
SQL_DSIR_APPLY = f"""
WITH {_DSIR_CTES}
SELECT doc_id, n_feats, weight_units, gumbel_units FROM scored
"""

_PIPELINE_DSIR_K = 120

def _curation_pipeline_sql(k_select: int = _PIPELINE_DSIR_K) -> str:
    """The composed oracle: each stage's published SQL fragment re-sourced
    at the previous stage's CTE (the parameterized builders above), so the
    oracle IS the composition — any seam drift (a stage reading the wrong
    corpus) breaks the hash."""
    return rf"""
WITH RECURSIVE
c1 AS MATERIALIZED (
  SELECT d.doc_id, d.text, d.lang, d.n_chars
  FROM documents d JOIN ({SQL_GOPHER_QUALITY}) g USING (doc_id)
  WHERE g.gopher_pass),
{_minhash_md5_ctes('c1')},
{_NEARDUP_COMP_CTES},
sizes AS (SELECT canonical_id, COUNT(*) AS cluster_size
          FROM comp GROUP BY canonical_id),
reps AS (
  SELECT canonical_id, doc_id AS rep_id FROM (
    SELECT c.canonical_id, d.doc_id,
           row_number() OVER (PARTITION BY c.canonical_id
                              ORDER BY d.n_chars DESC, d.doc_id) AS rn
    FROM comp c JOIN c1 d USING (doc_id)) WHERE rn = 1),
prune AS MATERIALIZED (
  SELECT d.doc_id,
         coalesce(c.canonical_id, d.doc_id) AS cluster_id,
         coalesce(s.cluster_size, 1) AS cluster_size,
         (c.doc_id IS NULL OR d.doc_id = r.rep_id) AS kept
  FROM c1 d
  LEFT JOIN comp c ON c.doc_id = d.doc_id
  LEFT JOIN sizes s ON s.canonical_id = c.canonical_id
  LEFT JOIN reps r ON r.canonical_id = c.canonical_id),
c2 AS MATERIALIZED (
  SELECT d.* FROM c1 d JOIN prune p ON p.doc_id = d.doc_id WHERE p.kept),
evt AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '19'),
evs AS MATERIALIZED (
  SELECT DISTINCT dsh FROM (
    SELECT unnest(CASE WHEN len(t) >= 5
              THEN list_distinct(list_transform(range(1, len(t) - 3),
                                 i -> array_to_string(t[i:i+4], ' ')))
              ELSE [array_to_string(t, ' ')] END) AS dsh
    FROM evt) _ev),
trs AS (
  SELECT doc_id, unnest(CASE WHEN len(t) >= 5
              THEN list_distinct(list_transform(range(1, len(t) - 3),
                                 i -> array_to_string(t[i:i+4], ' ')))
              ELSE [array_to_string(t, ' ')] END) AS dsh
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM c2) _tt),
cont AS MATERIALIZED (
  SELECT trs.doc_id, COUNT(*) AS n_shared
  FROM trs JOIN evs USING (dsh) GROUP BY trs.doc_id),
c3 AS MATERIALIZED (
  SELECT d.* FROM c2 d LEFT JOIN cont ON cont.doc_id = d.doc_id
  WHERE cont.doc_id IS NULL),
{_dsir_ctes('c3')},
dtop AS MATERIALIZED (
  SELECT doc_id, weight_units, gumbel_units FROM scored
  ORDER BY weight_units + gumbel_units DESC, doc_id LIMIT {k_select}),
c4 AS MATERIALIZED (SELECT d.*, t.weight_units, t.gumbel_units
       FROM c3 d JOIN dtop t USING (doc_id)),
{_mixture_ctes('c4')},
c5 AS MATERIALIZED (
  SELECT d.* FROM c4 d JOIN madm USING (lang)
  WHERE {_mixture_admit_where('d')}),
{_pack_ctes('c5', target=_PACK_AUTO_TARGET)}
SELECT 'gate' AS component, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS v1, CAST(NULL AS BIGINT) AS v2,
       CAST(lang AS VARCHAR) AS s1
FROM c1
UNION ALL
SELECT 'prune', CAST(doc_id AS BIGINT), CAST(cluster_id AS BIGINT),
       CAST(cluster_size AS BIGINT), CAST(kept AS VARCHAR)
FROM prune
UNION ALL
SELECT 'contaminated', CAST(doc_id AS BIGINT), CAST(n_shared AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
FROM cont
UNION ALL
SELECT 'clean', CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(lang AS VARCHAR)
FROM c3
UNION ALL
SELECT 'dsir_sel', CAST(doc_id AS BIGINT), CAST(weight_units AS BIGINT),
       CAST(gumbel_units AS BIGINT), CAST(NULL AS VARCHAR)
FROM c4
UNION ALL
SELECT 'mixture', CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(lang AS VARCHAR)
FROM c5
UNION ALL
SELECT 'pack', CAST(doc_id AS BIGINT),
       {_pack_seq_id_sql()},
       CAST(cum - n_tok AS BIGINT), CAST(CAST(cum AS BIGINT) AS VARCHAR)
FROM pc CROSS JOIN nb
"""


SQL_CURATION_PIPELINE = _curation_pipeline_sql()

def _cross_match_ctes(suffix: str, batch_rel: str, idx_rel: str) -> str:
    """Candidate-pair match counts between a gated batch and an index id
    set, from the shared per-doc band/signature relations."""
    return f"""c{suffix}m AS MATERIALIZED (
  SELECT p.new_id, p.corpus_id,
         SUM(CASE WHEN s1.sig = s2.sig THEN 1 ELSE 0 END) AS m
  FROM (SELECT DISTINCT a.doc_id AS new_id, c.doc_id AS corpus_id
        FROM bandm a
        JOIN {batch_rel} ON {batch_rel}.doc_id = a.doc_id
        JOIN bandm c ON c.band_idx = a.band_idx
                    AND c.band_hash = a.band_hash
        JOIN {idx_rel} ON {idx_rel}.doc_id = c.doc_id
        WHERE a.doc_id <> c.doc_id) p
  JOIN sigm s1 ON s1.doc_id = p.new_id
  JOIN sigm s2 ON s2.doc_id = p.corpus_id AND s2.perm = s1.perm
  GROUP BY 1, 2),
rej{suffix} AS MATERIALIZED (
  SELECT new_id AS doc_id, COUNT(*) AS n_dups, MAX(m) AS max_matches
  FROM c{suffix}m WHERE m >= 4 GROUP BY 1),
acc{suffix} AS MATERIALIZED (
  SELECT {batch_rel}.* FROM {batch_rel}
  LEFT JOIN rej{suffix} USING (doc_id)
  WHERE rej{suffix}.doc_id IS NULL)"""


def _dsir_fit_subset_ctes(suffix: str, fit_ids: str) -> str:
    """Fit statistics over a fit-corpus id subset, from the shared
    per-doc count relation ``cntm`` — the SQL image of a merged
    ``dsir_fit_state`` (sum-of-sums over exact integers)."""
    return f"""bstat{suffix} AS (
  SELECT b, CAST(SUM(c) AS BIGINT) AS q_cnt,
         CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS p_cnt
  FROM cntm JOIN {fit_ids} USING (doc_id) GROUP BY b),
tot{suffix} AS (SELECT CAST(SUM(q_cnt) AS BIGINT) AS qt,
               CAST(SUM(p_cnt) AS BIGINT) AS pt FROM bstat{suffix}),
ratio{suffix} AS (
  SELECT b, {_sql_log_units('p_cnt + 1')} - {_sql_log_units('pt + 256')}
            - {_sql_log_units('q_cnt + 1')} + {_sql_log_units('qt + 256')}
            AS r_units
  FROM bstat{suffix} CROSS JOIN tot{suffix}),
sc{suffix} AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
         CAST(SUM(c * r_units) AS BIGINT) AS weight_units
  FROM cntm JOIN acc{suffix} USING (doc_id)
  JOIN ratio{suffix} USING (b) GROUP BY doc_id),
scored{suffix} AS (
  SELECT a.doc_id,
         COALESCE(sc{suffix}.n_feats, 0) AS n_feats,
         COALESCE(sc{suffix}.weight_units, 0) AS weight_units,
         {_SQL_GUMBEL.format(alias='a')} AS gumbel_units
  FROM acc{suffix} a LEFT JOIN sc{suffix} USING (doc_id))"""


def _crawl_ingest_sql() -> str:
    """The two-batch loop oracle: per-doc signatures, bands, and DSIR
    gram counts computed ONCE over all documents (corpus-independent),
    then each batch's reject/accept/score/pack derived by re-aggregating
    the id subsets the loop's persistent state represents at that point
    in time — index-at-batch-2 = seed ∪ accepted-batch-1, fit-at-batch-b
    = seed ∪ all prior acceptances ∪ batch b's acceptances."""

    def pack_branch(tag, prefix):
        return f"""SELECT 'pack{tag}', CAST(doc_id AS BIGINT),
       {_pack_seq_id_sql(prefix)},
       CAST(cum - n_tok AS BIGINT), CAST(CAST(cum AS BIGINT) AS VARCHAR)
FROM {prefix}pc CROSS JOIN {prefix}nb"""

    # _minhash_md5_ctes also defines a within-corpus `pairs` CTE this
    # oracle never references — non-MATERIALIZED CTEs are lazy in DuckDB,
    # so it is never evaluated; reusing the shared builder verbatim beats
    # forking a pairs-free variant that could drift.
    return f"""
WITH gq AS MATERIALIZED (
  SELECT doc_id FROM ({SQL_GOPHER_QUALITY}) g WHERE g.gopher_pass),
{_minhash_md5_ctes('documents')},
sigm AS MATERIALIZED (SELECT * FROM sig),
bandm AS MATERIALIZED (SELECT * FROM band),
g1 AS MATERIALIZED (
  SELECT d.doc_id, d.text, d.lang, d.n_chars
  FROM documents d JOIN gq USING (doc_id) WHERE d.doc_id % 5 = 0),
g2 AS MATERIALIZED (
  SELECT d.doc_id, d.text, d.lang, d.n_chars
  FROM documents d JOIN gq USING (doc_id) WHERE d.doc_id % 5 = 1),
seedc AS (SELECT doc_id FROM documents WHERE doc_id % 5 >= 2),
{_cross_match_ctes('1', 'g1', 'seedc')},
idx2 AS (SELECT doc_id FROM seedc UNION ALL SELECT doc_id FROM acc1),
{_cross_match_ctes('2', 'g2', 'idx2')},
{_dsir_doc_cnt_ctes('documents')},
cntm AS MATERIALIZED (SELECT * FROM cnt),
f1 AS (SELECT doc_id FROM seedc UNION ALL SELECT doc_id FROM acc1),
{_dsir_fit_subset_ctes('1', 'f1')},
f2 AS (SELECT doc_id FROM f1 UNION ALL SELECT doc_id FROM acc2),
{_dsir_fit_subset_ctes('2', 'f2')},
{_pack_ctes('acc1', 'a', target=_PACK_AUTO_TARGET)},
{_pack_ctes('acc2', 'z', target=_PACK_AUTO_TARGET)}
SELECT 'gate1' AS component, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS v1, CAST(NULL AS BIGINT) AS v2,
       CAST(lang AS VARCHAR) AS s1
FROM g1
UNION ALL
SELECT 'reject1', CAST(doc_id AS BIGINT), CAST(n_dups AS BIGINT),
       CAST(max_matches AS BIGINT), CAST(NULL AS VARCHAR)
FROM rej1
UNION ALL
SELECT 'accept1', CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(lang AS VARCHAR)
FROM acc1
UNION ALL
SELECT 'dsir1', CAST(doc_id AS BIGINT), CAST(weight_units AS BIGINT),
       CAST(gumbel_units AS BIGINT), CAST(n_feats AS VARCHAR)
FROM scored1
UNION ALL
{pack_branch('1', 'a')}
UNION ALL
SELECT 'gate2', CAST(doc_id AS BIGINT), CAST(n_chars AS BIGINT),
       CAST(NULL AS BIGINT), CAST(lang AS VARCHAR)
FROM g2
UNION ALL
SELECT 'reject2', CAST(doc_id AS BIGINT), CAST(n_dups AS BIGINT),
       CAST(max_matches AS BIGINT), CAST(NULL AS VARCHAR)
FROM rej2
UNION ALL
SELECT 'accept2', CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(lang AS VARCHAR)
FROM acc2
UNION ALL
SELECT 'dsir2', CAST(doc_id AS BIGINT), CAST(weight_units AS BIGINT),
       CAST(gumbel_units AS BIGINT), CAST(n_feats AS VARCHAR)
FROM scored2
UNION ALL
{pack_branch('2', 'z')}
"""


SQL_CRAWL_INGEST = _crawl_ingest_sql()


def _crawl_wb_dedup_sql() -> str:
    """Oracle for the r10 within-batch ingest dedup
    (``ingest_batch(dedup_within_batch=True)``): gate -> thresholded
    within-batch minhash pairs (signature agreement >= 4 of 8 — exactly
    the engine's est_jaccard >= 0.5) -> transitive closure ->
    keep-longest representative -> probe the REPRESENTATIVES against the
    seed index.  Reuses the shared gopher/minhash/cross-match fragments;
    the closure CTEs are renamed (``w*``) because
    :data:`_NEARDUP_COMP_CTES` hardcodes the corpus-wide ``pairs``
    relation this oracle must not cluster on."""
    return f"""
WITH RECURSIVE
gq AS MATERIALIZED (
  SELECT doc_id FROM ({SQL_GOPHER_QUALITY}) g WHERE g.gopher_pass),
{_minhash_md5_ctes('documents')},
sigm AS MATERIALIZED (SELECT * FROM sig),
bandm AS MATERIALIZED (SELECT * FROM band),
g1 AS MATERIALIZED (
  SELECT d.doc_id, d.text, d.lang, d.n_chars
  FROM documents d JOIN gq USING (doc_id) WHERE d.doc_id % 5 = 0),
seedc AS (SELECT doc_id FROM documents WHERE doc_id % 5 >= 2),
wcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bandm a
  JOIN g1 ga ON ga.doc_id = a.doc_id
  JOIN bandm c ON c.band_idx = a.band_idx AND c.band_hash = a.band_hash
  JOIN g1 gb ON gb.doc_id = c.doc_id
  WHERE a.doc_id < c.doc_id),
wpairs AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b
  FROM wcand p
  JOIN sigm s1 ON s1.doc_id = p.doc_a
  JOIN sigm s2 ON s2.doc_id = p.doc_b AND s2.perm = s1.perm
  GROUP BY 1, 2
  HAVING SUM(CASE WHEN s1.sig = s2.sig THEN 1 ELSE 0 END) >= 4),
wedges AS (SELECT doc_a AS src, doc_b AS dst FROM wpairs
           UNION ALL
           SELECT doc_b AS src, doc_a AS dst FROM wpairs),
wnodes AS (SELECT DISTINCT src AS node FROM wedges),
wreach AS (
  SELECT node, node AS label FROM wnodes
  UNION
  SELECT e.dst AS node, r.label
  FROM wreach r JOIN wedges e ON e.src = r.node),
wcomp AS MATERIALIZED (
  SELECT node AS doc_id, MIN(label) AS canonical_id
  FROM wreach GROUP BY node),
wsizes AS (SELECT canonical_id, COUNT(*) AS cluster_size
           FROM wcomp GROUP BY canonical_id),
wreps AS (
  SELECT canonical_id, doc_id AS rep_id FROM (
    SELECT c.canonical_id, d.doc_id,
           row_number() OVER (PARTITION BY c.canonical_id
                              ORDER BY d.n_chars DESC, d.doc_id) AS rn
    FROM wcomp c JOIN g1 d USING (doc_id)) WHERE rn = 1),
wprune AS MATERIALIZED (
  SELECT d.doc_id,
         coalesce(c.canonical_id, d.doc_id) AS cluster_id,
         coalesce(s.cluster_size, 1) AS cluster_size,
         (c.doc_id IS NULL OR d.doc_id = r.rep_id) AS kept
  FROM g1 d
  LEFT JOIN wcomp c ON c.doc_id = d.doc_id
  LEFT JOIN wsizes s ON s.canonical_id = c.canonical_id
  LEFT JOIN wreps r ON r.canonical_id = c.canonical_id),
gk AS MATERIALIZED (
  SELECT d.* FROM g1 d JOIN wprune p ON p.doc_id = d.doc_id WHERE p.kept),
{_cross_match_ctes('1', 'gk', 'seedc')}
SELECT 'pruned' AS component, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(cluster_id AS BIGINT) AS v1, CAST(cluster_size AS BIGINT) AS v2,
       CAST(kept AS VARCHAR) AS s1
FROM wprune
UNION ALL
SELECT 'reject', CAST(doc_id AS BIGINT), CAST(n_dups AS BIGINT),
       CAST(max_matches AS BIGINT), CAST(NULL AS VARCHAR)
FROM rej1
UNION ALL
SELECT 'accept', CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(lang AS VARCHAR)
FROM acc1
"""


SQL_CRAWL_WB_DEDUP = _crawl_wb_dedup_sql()
