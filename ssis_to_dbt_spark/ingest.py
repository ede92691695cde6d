"""Continuous-crawl ingest loop — the incremental/streaming analog of the
composed curation pipeline (:mod:`~ssis_to_dbt_spark.curation`).

Each arriving batch runs the production loop that round 8 built the
pieces for but nothing previously proved end-to-end:

1. **Gopher gate** — map-only Arrow kernel (:func:`curation.stage_gate`);
2. **cross-corpus dedup vs the PERSISTED index** —
   :func:`~ssis_to_dbt_spark.text.dedup.cross_corpus_candidates` against
   the stored ``(signatures, bands)`` index: the corpus is never
   re-scanned or re-minhashed per batch, the (tiny) batch side
   broadcasts, and a batch doc with any candidate at
   ``est_jaccard >= dup_threshold`` is rejected;
3. **index append** — accepted docs' bands/signatures extend the index
   (on disk via
   :func:`~ssis_to_dbt_spark.text.dedup.append_corpus_dedup_index`, or
   functionally inside :func:`ingest_batch` by filtering the batch's
   already-derived sigs/bands to its acceptances — value-identical,
   pytest-pinned);
4. **merged DSIR refit** — the batch's ≤B-row fit-state delta merges
   into the stored state (:func:`dsir_merge_state`; bit-equal to a full
   refit on the concatenated corpus) and the accepted docs re-score
   map-only under the merged model;
5. **pack** — fixed-length sequence assignment of the accepted batch.

Reference analog: the incremental load pattern of
``reference/samples/ssis_packages/InventorySync.dtsx:34-65`` (watermark +
processed-flag loop); the per-batch semantics mirror the one-shot chain
in ``reference/src/agents/orchestrator.py:85-166``.

Scale shape (100 TB, continuous crawling): per batch, corpus-side work
is ZERO exchanges (index probed via broadcast or bucket-local join;
DSIR state merge is O(buckets)); batch-side work is linear in the batch.
The driver entry ``crawl_ingest_docs`` value-verifies TWO chained
batches against a composed DuckDB oracle — batch 2 dedups against an
index that already contains batch 1's accepted docs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import drop_seam_anti_join, stage_gate

DUP_THRESHOLD = 0.5
DSIR_BUCKETS = 256
SEQ_TOKENS = 512
# None = auto-size the packing stream count from the accepted batch's
# token total (pack_sequences' r9 default-target derivation)
PACK_BUCKETS: int | None = None
# A gated batch at or below this many docs broadcasts its band/signature
# tables against the corpus index (~4 band rows/doc — a few hundred MB as
# a hash relation at the limit); above it — a BACKFILL batch — the probe
# falls back to the bucket-local shuffle join, which against the stored
# bucketed index still exchanges only the batch side.  Same measured-not-
# assumed discipline as the curation drop seams.
BATCH_BROADCAST_MAX_DOCS = 1_000_000


@dataclass
class IngestState:
    """The persistent side of the loop: the dedup index (signatures +
    capped band table) and the mergeable DSIR fit state.  The functional
    index append (in-memory deployments) happens inside
    :func:`ingest_batch`, which filters the batch's ALREADY-DERIVED
    sigs/bands to its acceptances; on-disk deployments append via
    :func:`~ssis_to_dbt_spark.text.dedup.append_corpus_dedup_index`
    instead (value-identical — pytest-pinned in
    ``test_skew_bucketing.py``)."""

    sigs: DataFrame
    bands: DataFrame
    dsir_state: DataFrame


@dataclass
class IngestResult:
    gated: DataFrame      # batch docs passing the Gopher gate
    rejected: DataFrame   # (doc_id, n_dups, max_matches) vs the index
    accepted: DataFrame   # gated minus rejected
    # DSIR under the MERGED refit (map-only); None when the iteration ran
    # with ``with_scoring=False`` (dedup-only callers)
    scored: DataFrame | None
    packed: DataFrame | None  # (doc_id, seq_id, start_tok, end_tok)
    state: IngestState    # index with accepted appended + merged state
    # the accepted docs' ALREADY-DERIVED (sigs, bands) — what the
    # functional state append used; on-disk deployments pass these to
    # append_corpus_dedup_index(new_index=...) so the streaming sink
    # runs ONE minhash pass per batch, not two
    accepted_sigs: DataFrame | None = None
    accepted_bands: DataFrame | None = None
    # dedup_within_batch=True only: per-gated-doc cluster verdicts
    # (doc_id, cluster_id, cluster_size, kept) — None otherwise
    batch_pruned: DataFrame | None = None
    # dedup_within_batch=True only: the thresholded within-batch
    # candidate pairs (doc_a, doc_b, est_jaccard) BEFORE clustering —
    # exposed so deployments/tests can audit the self-join's fan-out
    # and plan shape (the band cap bounds it at bands * cap^2 / 2)
    batch_pairs: DataFrame | None = None


def seed_ingest_state(
    corpus_df: DataFrame,
    buckets: int = DSIR_BUCKETS,
    checkpoint: bool = True,
) -> IngestState:
    """Initialize the loop from an existing (already-curated) corpus:
    derive the dedup index once and fit the DSIR state once — after
    this, the corpus text is never re-read.  ``checkpoint=True`` lazily
    checkpoints the index/state frames so consecutive batches reuse the
    materialization instead of re-deriving the seed corpus's signatures
    per batch — the in-process stand-in for the on-disk index
    (:func:`~ssis_to_dbt_spark.text.dedup.write_corpus_dedup_index`,
    which a deployment uses instead)."""
    from .text.analysis import dsir_fit_state
    from .text.dedup import corpus_dedup_index

    # checkpoint_sigs: banding reuses the materialized signature pass
    # instead of re-running the minhash per frame (dedup.py r11 note)
    # r15 perf (guide §7.3/§2.4): Arrow signature kernel — bit-identical
    # values, map-only plan (no shingle-explode exchange), and the lazy
    # checkpoint declaration below stops paying the expression tree's
    # per-plan Catalyst/codegen cost.
    sigs, bands = corpus_dedup_index(
        corpus_df, checkpoint_sigs=checkpoint, engine="arrow"
    )
    state = dsir_fit_state(
        corpus_df, F.col("lang") == "en", buckets=buckets, engine="arrow"
    )
    if checkpoint:
        # r14 perf (r13 VERDICT #6): the BAND table is NOT separately
        # checkpointed — it is a narrow projection + explode + one cap
        # window over the checkpointed SIGNATURES (the expensive minhash
        # pass), so re-deriving it per consumer is one cheap pass over
        # the checkpoint while each avoided localCheckpoint declaration
        # saves a full physical-planning round.
        state = state.localCheckpoint(eager=False)
    return IngestState(sigs=sigs, bands=bands, dsir_state=state)


def ingest_batch(
    batch_df: DataFrame,
    state: IngestState,
    dup_threshold: float = DUP_THRESHOLD,
    buckets: int = DSIR_BUCKETS,
    seq_tokens: int = SEQ_TOKENS,
    pack_buckets: int | None = PACK_BUCKETS,
    checkpoint: bool = True,
    batch_broadcast_max_docs: int = BATCH_BROADCAST_MAX_DOCS,
    dedup_within_batch: bool = False,
    band_bucket_cap: int | None = None,
    pre_gated: DataFrame | None = None,
    pre_index: tuple[DataFrame, DataFrame] | None = None,
    with_scoring: bool = True,
    pre_probe: DataFrame | None = None,
) -> IngestResult:
    """One iteration of the continuous-crawl loop (see module doc).

    ``dedup_within_batch=True`` (r10) additionally dedups the batch
    AGAINST ITSELF before the index probe: near-dup clusters among the
    gated docs (same banded-minhash candidates at the same
    ``dup_threshold``, computed from the batch's ALREADY-DERIVED
    signatures — no extra minhash pass) keep only the longest
    representative (:func:`~ssis_to_dbt_spark.text.dedup
    .prune_clusters`), and only representatives proceed to the probe /
    accept / index-append / score / pack.  A crawl burst that lands the
    same boilerplate page 50 times in one batch then admits it once
    instead of 50 times.  ``band_bucket_cap`` overrides the per-band
    bucket membership cap (default: the dedup module's 10,000) for BOTH
    the within-batch self-join and the index probe — the knob that
    bounds a viral bucket's self-join fan-out at bands * cap^2 pairs.
    The self-join regime is size-aware like the probe: a batch the
    measured count says is over ``batch_broadcast_max_docs`` runs the
    band self-join as a shuffle-hash join (the hint keeps AQE from
    re-pinning a broadcast the count just refuted).  Default OFF — the loop's documented base
    semantics accept within-batch near-dups (they were never in the
    index), and the driver-entry oracle pins that form.  With it ON,
    ``accepted ∪ rejected`` partitions the KEPT representatives (a
    subset of ``gated``); the per-doc cluster verdicts are returned as
    ``batch_pruned``.

    ``pre_gated`` / ``pre_index`` (r11) accept the batch's
    ALREADY-DERIVED gate survivors and ``(sigs, bands)`` index — a
    caller running the same batch through multiple dedup policies (the
    driver suite runs the base loop AND the within-batch variant over
    batch 1) derives them once instead of re-gating and re-minhashing
    per call.  Both must come from the same engine functions
    (:func:`~ssis_to_dbt_spark.curation.stage_gate`,
    :func:`~ssis_to_dbt_spark.text.dedup.corpus_dedup_index`) on this
    exact batch; semantics are unchanged by construction.

    ``with_scoring=False`` (r11) skips the DSIR delta fit / state merge /
    scoring / packing stages entirely — a DEDUP-ONLY iteration for
    callers that consume just the gate/prune/reject/accept verdicts (the
    driver suite's within-batch variant re-runs batch 1 under a second
    dedup policy; its DSIR/pack outputs were never read, but the eager
    state-merge checkpoint still paid a full Arrow fit pass over the
    accepted docs).  ``scored``/``packed`` come back ``None`` and the
    returned state carries the INPUT ``dsir_state`` unchanged — the
    gate/dedup verdicts are byte-identical because gating, the index
    probe, and the acceptance seam never depended on the DSIR stages
    (pytest-pinned).

    ``pre_probe`` (r11, with ``dedup_within_batch=True`` only) accepts
    the REJECTED frame of a prior base iteration over the same
    ``(pre_gated, pre_index, state, dup_threshold)`` — the wb run then
    derives its rejections as ``pre_probe`` semi-joined to the kept
    representatives instead of re-probing the index.  This is EXACT, not
    approximate: rejection is per-doc (a doc's band rows vs the corpus
    index), and in wb mode the band rows come from the SAME pre-derived
    full-batch tables (capped identically) merely filtered to kept ids —
    so a kept doc's candidates, and therefore its (n_dups, max_matches),
    are identical between the two forms (pytest-pinned).  The driver
    suite uses this to run the base + wb policies over batch 1 with ONE
    index probe.

    ``checkpoint=True`` localCheckpoints the multi-consumer
    intermediates (gated feeds the pair join + the anti-join; accepted
    feeds the fit delta, the scorer, the packer, and the index append) —
    the in-process stand-in for the parquet stage boundaries a deployed
    ``foreachBatch`` sink would write.

    Lineage note for LONG in-process loops: the returned state's
    sigs/bands are ``unionByName`` extensions of the input state, so a
    driver loop calling this N times builds an N-deep union plan.  The
    streaming sink bounds this automatically
    (``write_stream_crawl_ingest(state_checkpoint_every=K)`` lazily
    localCheckpoints every K batches — plan-depth pytest-pinned); a
    hand-rolled loop should either do the same every ~8 batches or use
    the persisted-index deployment (``table_prefix``), whose state lives
    in bucketed tables and never accumulates lineage."""
    from .text.analysis import (
        dsir_fit_state,
        dsir_merge_state,
        dsir_model_from_state,
        dsir_score,
        pack_sequences,
        token_count,
    )
    from .text.dedup import cross_corpus_candidates

    if pre_probe is not None and not dedup_within_batch:
        raise ValueError(
            "pre_probe reuses a base iteration's rejections for the "
            "within-batch variant — only valid with dedup_within_batch=True"
        )

    def ck(df: DataFrame) -> DataFrame:
        # r14 perf (r13 VERDICT #6): LAZY checkpoints — each stage still
        # materializes exactly once (multi-consumer reuse unchanged) but
        # at its first consumer instead of as its own blocking job, so
        # the loop stops paying one analysis+scheduling round per stage.
        # Values identical; the checkpoint still truncates lineage.
        return df.localCheckpoint(eager=False) if checkpoint else df

    from .text.dedup import corpus_dedup_index

    gated = ck(stage_gate(batch_df)) if pre_gated is None else pre_gated
    # derive the batch's (sigs, bands) ONCE: they feed the probe join AND
    # (filtered to acceptances) the index append — per-doc derivations
    # are corpus-independent, so reuse is exact and saves a second
    # minhash pass over the accepted docs.
    cap_kw = {} if band_bucket_cap is None else {
        "max_bucket_size": int(band_bucket_cap)
    }
    if pre_index is not None:
        bsigs, bbands = pre_index
    else:
        bsigs, bbands = corpus_dedup_index(
            gated, checkpoint_sigs=checkpoint, engine="arrow", **cap_kw
        )
        # bands ride on the checkpointed sigs — no own checkpoint
        # (see seed_ingest_state's r14 note)
    batch_pruned = batch_pairs = None
    if dedup_within_batch:
        from .text.dedup import prune_clusters

        # within-batch candidate pairs from the SAME derived relations:
        # band self-join (capped buckets — bounded fan-out), signature
        # agreement as est_jaccard, the loop's own dup threshold
        b = bbands.select("band_idx", "band_hash", "doc_id")
        probe = b.alias("b")
        if gated.count() > int(batch_broadcast_max_docs):
            # measured over the broadcast cap: force the shuffle regime
            # so neither the static planner nor AQE pins a broadcast of
            # a corpus-scale backfill batch against itself
            probe = probe.hint("shuffle_hash")
        cand = (
            b.alias("a")
            .join(probe, ["band_idx", "band_hash"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .dropDuplicates(["doc_a", "doc_b"])
        )
        sa = bsigs.select(
            F.col("doc_id").alias("doc_a"), F.col("minhash").alias("sig_a")
        )
        sb = bsigs.select(
            F.col("doc_id").alias("doc_b"), F.col("minhash").alias("sig_b")
        )
        est = (
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda m: m,
                )
            ).cast("double")
            / F.lit(8.0)
        )
        pairs_wb = (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select("doc_a", "doc_b", est.alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= float(dup_threshold))
        )
        # r14 perf (r13 VERDICT #6): no re-checkpoints below —
        # prune_clusters' connected-components output is already
        # checkpointed internally, and every frame here is a cheap
        # filter/semi-join OVER an existing checkpoint, so a new
        # checkpoint declaration (which forces physical planning NOW)
        # costs more than the recompute it saves.
        batch_pairs = pairs_wb
        batch_pruned = prune_clusters(gated, pairs_wb)
        kept_ids = batch_pruned.filter(F.col("kept")).select("doc_id")
        gated = gated.join(kept_ids, "doc_id", "left_semi")
        bsigs = bsigs.join(kept_ids, "doc_id", "left_semi")
        bbands = bbands.join(kept_ids, "doc_id", "left_semi")
    if dedup_within_batch and pre_probe is not None:
        # EXACT probe reuse (see docstring): rejection is per-doc over
        # band rows pre-derived from the full gated batch, so the wb
        # rejections are the base run's, filtered to the representatives
        # cheap semi over the (already materialized) base rejections —
        # no new checkpoint declaration (r14 perf)
        rejected = pre_probe.join(
            batch_pruned.filter(F.col("kept")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    else:
        # size-aware probe: COUNT the gated batch (cheap — checkpointed)
        # and broadcast its band tables only when measured small; a
        # backfill batch takes the bucket-local shuffle join instead of
        # pinning a broadcast the count just refuted
        n_gated = gated.count()
        pairs = cross_corpus_candidates(
            gated, corpus_index=(state.sigs, state.bands),
            new_index=(bsigs, bbands),
            broadcast_batch=(n_gated <= int(batch_broadcast_max_docs)),
            **cap_kw,
        )
        # est_jaccard is matches/num_hashes with num_hashes=8 — exactly
        # representable, so the threshold compare and the *8 recovery of
        # the integer match count are both exact.
        rejected = ck(
            pairs.filter(F.col("est_jaccard") >= float(dup_threshold))
            .groupBy(F.col("new_id").alias("doc_id"))
            .agg(
                F.count(F.lit(1)).alias("n_dups"),
                F.round(F.max("est_jaccard") * 8)
                .cast("long")
                .alias("max_matches"),
            )
        )
    rej_ids = rejected.select("doc_id")
    # one sizing count serves all three seams against the same id set
    # (r14 perf; it also materializes `rejected`'s checkpoint)
    n_rej = rej_ids.count()
    accepted = drop_seam_anti_join(gated, rej_ids, "doc_id",
                                   known_count=n_rej)
    if with_scoring:
        # multi-consumer (fit delta, scorer, packer, index append):
        # checkpoint; the dedup-only path consumes it once — skip the
        # declaration cost (r14 perf)
        accepted = ck(accepted)
        delta = dsir_fit_state(
            accepted, F.col("lang") == "en", buckets=buckets, engine="arrow"
        )
        merged = ck(dsir_merge_state(state.dsir_state, delta))
        model = dsir_model_from_state(merged, buckets)
        scored = dsir_score(accepted, model, engine="arrow")
        dd = accepted.select(
            "doc_id", token_count(F.col("text")).alias("n_tok")
        )
        packed = pack_sequences(
            dd, "n_tok", seq_tokens=seq_tokens, key_col="doc_id",
            n_buckets=pack_buckets,
        )
    else:
        merged = state.dsir_state
        scored = None
        packed = None
    # index append from the ALREADY-DERIVED batch sigs/bands: drop the
    # rejected ids via the same size-aware seam (the band cap was applied
    # on the gated batch, a superset — the cap is a fan-out bound, so a
    # superset cap is equally valid; the persisted-index twin test pins
    # value-equality with the re-derive-from-accepted form at fixture
    # scale).
    acc_sigs = drop_seam_anti_join(bsigs, rej_ids, "doc_id",
                                   known_count=n_rej)
    acc_bands = drop_seam_anti_join(bbands, rej_ids, "doc_id",
                                    known_count=n_rej)
    new_state = IngestState(
        sigs=state.sigs.unionByName(acc_sigs),
        bands=state.bands.unionByName(acc_bands),
        dsir_state=merged,
    )
    return IngestResult(
        gated=gated,
        rejected=rejected,
        accepted=accepted,
        scored=scored,
        packed=packed,
        state=new_state,
        accepted_sigs=acc_sigs,
        accepted_bands=acc_bands,
        batch_pruned=batch_pruned,
        batch_pairs=batch_pairs,
    )


@dataclass
class MediaIngestResult:
    """One media-batch iteration's outputs (the image arm of the
    continuous-crawl loop, r14 — r13 VERDICT #2)."""

    # batch fingerprints surviving within-batch keep-one
    kept: DataFrame
    # kept rows REJECTED by the index probe (near-dup of an indexed image)
    rejected: DataFrame
    # kept rows accepted into the corpus (appended to the index)
    accepted: DataFrame
    # the probe's (media_id, index_id, hamming_distance) pairs
    probe_pairs: DataFrame


def ingest_media_batch(
    spark,
    batch_fp: DataFrame,
    table_prefix: str,
    max_hamming: int = 2,
    id_col: str = "media_id",
    fp_col: str = "phash",
    bits: int = 48,
    band_bits: int = 12,
    max_bucket_size: int | None = 10_000,
    num_buckets: int = 64,
    batch_id: int | None = None,
    append: bool = True,
) -> MediaIngestResult:
    """One iteration of the IMAGE dedup loop against the persisted
    perceptual-hash index (the media twin of :func:`ingest_batch`'s
    dedup stages; the index lifecycle lives in
    :mod:`ssis_to_dbt_spark.text.dedup`):

    1. within-batch keep-one — Hamming-``<=max_hamming`` clusters among
       the batch keep their canonical member
       (:func:`~ssis_to_dbt_spark.text.dedup.phash_keep_one`);
    2. probe the survivors against the stored index
       (:func:`~ssis_to_dbt_spark.text.dedup.phash_probe_index`) —
       matches within ``max_hamming`` REJECT;
    3. append the accepted fingerprints
       (:func:`~ssis_to_dbt_spark.text.dedup.append_phash_index`),
       tagged ``_ib = batch_id``.

    Replay-idempotent with a ``batch_id``: the probe excludes index rows
    the crashed first attempt appended under the same tag (no
    self-rejection), and the append skips when the tag already exists —
    so a replayed batch reaches the identical accept/reject verdicts and
    the index ends in the identical state.  ``append=False`` runs the
    verdict stages only.

    Input contract: ``batch_fp`` is the already-hashed
    ``(media_id, phash)`` relation
    (:func:`~ssis_to_dbt_spark.text.multimodal.image_phash` output) —
    hashing is the map-only stage of the media scan and stays with the
    decode pipeline.  100 TB: every stage here touches fingerprint
    relations only (8 bytes/image), never media bytes."""
    from .text.dedup import (
        append_phash_index,
        phash_keep_one,
        phash_probe_index,
    )

    kept = phash_keep_one(
        batch_fp, id_col, fp_col, max_hamming, bits, band_bits,
        max_bucket_size,
    ).localCheckpoint(eager=False)
    pairs = phash_probe_index(
        spark, kept, table_prefix, max_hamming, id_col, fp_col, bits,
        band_bits, max_bucket_size,
        exclude_tag=batch_id,
    ).localCheckpoint(eager=False)
    rej_ids = pairs.select(id_col).distinct()
    rejected = kept.join(rej_ids, id_col, "semi")
    accepted = kept.join(rej_ids, id_col, "left_anti")
    if append:
        append_phash_index(
            accepted, table_prefix, num_buckets, id_col, fp_col, bits,
            band_bits, batch_id=batch_id,
        )
    return MediaIngestResult(
        kept=kept, rejected=rejected, accepted=accepted, probe_pairs=pairs
    )
