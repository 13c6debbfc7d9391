package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The curation chain COMPOSED into one oracle-gated query (VERDICT r13
  * next-round #1; safety gates added per VERDICT r14 #7): ChainSoak
  * proves the composition's row counts and plan invariants at 100×
  * amplification, but until now no CORRECTNESS row hash-gated the
  * composed OUTPUT. `curation_chain` runs the whole training-data
  * pipeline end to end —
  *
  *   shingle → minhash pairs → clusters → dedupKeep → spanScrubDocs
  *     → decontaminate → gopher admission → pii redact
  *     → budgetSelectDocs → mixtureSample → packSequences
  *
  * — and emits a single summary row: per-stage survivor counts plus
  * order-independent digests of the packed corpus (its layout rows AND
  * its exact scrubbed-redacted texts), so the DuckDB oracle witnesses
  * every stage's composed effect, not just each stage in isolation.
  * The oracle chains the SAME per-stage CTEs the individual queries
  * gate (DedupQueries.dupesCtes, CorpusQueries.scrubCtes, and the
  * decontaminate / gopher_rules / pii_redact / token_budget /
  * mix_sample / seq_pack formulations), so a divergence anywhere in
  * the composition hash-mismatches here even while every stage stays
  * green alone.
  *
  * The safety gates (the stages a production curation run always
  * includes):
  *  - **decontaminate** — the benchmark slice (doc_id % 97 = 0, the
  *    decontaminate query's eval set) leaves the training corpus
  *    entirely, and survivors sharing ≥ 5 shingles with it are dropped
  *    as contaminated. Contamination is a property of the ORIGINAL
  *    content, so the stage reuses the memoized full-corpus shingle
  *    table — zero extra tokenize passes.
  *  - **gopher admission** — only docs passing all five quality rules
  *    (gopher_rules' integer predicates, off the memoized term table)
  *    proceed. Runs BEFORE redaction so dropped docs never pay the
  *    redact pass.
  *  - **pii redact** — the synthetic corpus carries no natural PII, so
  *    (the pii_redact query's own device) a deterministic
  *    doc_id-derived PII suffix is appended before scrubbing; the
  *    redaction then provably fires on every surviving row and its
  *    effect (tags in the text, shifted char masses) flows through
  *    budget, mixing, and packing on BOTH engines — a dropped or
  *    divergent redact stage hash-mismatches the whole summary.
  *
  * Scale shape: inherits each stage's design — bucketed candidate
  * generation over the memoized shingle cache, one codegen'd scrub
  * pass, broadcast bench-shingle and pass-list joins, per-row regex
  * redaction (no shuffle — ChainSoak pins that), banded prefix-sum
  * budget/pack (no whole-language reducer), broadcast mixture weights
  * — and the summary scalars are ungrouped aggregates combined by
  * crossJoin(broadcast(1-row)) (the PlanInvariantsSpec-sanctioned
  * scalar-stats shape). The only driver-side collect is the
  * languages-sized budget table (the ChainSoak precedent). Digests are
  * 40-bit md5 prefixes (bit_xor + sum both BIGINT-safe at any SF; xor
  * alone misses even-multiplicity differences, sum alone misses
  * xor-symmetric swaps — FaultSoak's digest argument).
  *
  * The per-language admission budget is data-derived (half the
  * smallest language's post-redact char mass — SF-proportional, so the
  * boundary machinery engages at every fixture instead of admitting
  * or rejecting whole languages), computed identically by both
  * engines.
  */
object ChainQueries {

  import Tables.t

  /** Dedup survivors scrubbed — the chain's shared expensive prefix,
    * memoized per (session, corpus): clusters → left-anti keep →
    * span-scrub keeping lang/source and replacing text/n_chars with
    * the post-scrub values. First-carrier attribution runs over the
    * SURVIVOR set (fps of removed near-dups must not scrub the
    * canonical copies that outlived them), reusing the memoized
    * full-corpus fp table via one semi-join.
    */
  private def scrubbedKept(s: SparkSession, dir: String): DataFrame =
    Memo.memo("chain_scrubbed", s, dir, persistIt = true) {
      val docs = t(s, dir, "documents")
      val kept = docs.join(chainDupes(s, dir), Seq("doc_id"), "left_anti")
      val keptFps = Corpus.docFps(docs, cacheKey = dir)
        .join(kept.select("doc_id"), Seq("doc_id"), "left_semi")
      Corpus.spanScrubDocs(kept, keptFps)
    }

  /** Non-canonical near-dup cluster member ids (dedup_keep's drop set),
    * off the memoized shingle/cluster caches.
    */
  private def chainDupes(s: SparkSession, dir: String): DataFrame =
    Dedup.clusters(
      Dedup.docShingles(t(s, dir, "documents"), cacheKey = dir), 4, 5,
      cacheKey = dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")

  /** Decontaminated survivors: the benchmark slice itself is excluded
    * from training, and survivors overlapping it in ≥ 5 shingles drop
    * as contaminated — the decontaminate query's rule, over the
    * memoized shingle table (bench side broadcasts).
    */
  private def cleaned(s: SparkSession, dir: String): DataFrame =
    Memo.memo("chain_clean", s, dir, persistIt = true) {
      val contaminated = Pipeline.decontaminate(
        Dedup.docShingles(t(s, dir, "documents"), cacheKey = dir),
        col("doc_id") % 97 === 0, minOverlap = 5)
        .filter(col("contaminated")).select("doc_id")
      scrubbedKept(s, dir)
        .filter(col("doc_id") % 97 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
    }

  /** Quality-gated + redacted survivors: gopher_rules' five-predicate
    * pass set admits (computed over the ORIGINAL corpus off the
    * memoized term table — quality is an intake-time property), then
    * the deterministic PII suffix is appended and redacted, `text` /
    * `n_chars` replaced by the post-redact values and the per-doc PII
    * hit count kept as `n_pii` — every downstream stage meters
    * post-redact mass.
    */
  private def gated(s: SparkSession, dir: String): DataFrame =
    Memo.memo("chain_gated", s, dir, persistIt = false) {
      val pass = Pipeline.gopherRules(t(s, dir, "documents"),
        cacheKey = dir).filter(col("pass")).select("doc_id")
      val injected = cleaned(s, dir)
        .join(pass, Seq("doc_id"), "left_semi")
        .withColumn("txt", concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or +1555"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" ip 10.2."), (col("doc_id") % 256).cast("string"),
          lit(".77")))
      // Lineage-truncated (the chain_summary pattern): with plain
      // persists the chain's tail stages each re-ANALYZE the whole
      // nested dedup→scrub→gate plan at materialization — the r15
      // safety gates pushed that pure-planning cost to ~19 s of the
      // chain's cold run (measured 27.3 s → 8.6 s with the truncation;
      // stage compute is unchanged). Downstream plans see a flat
      // LogicalRDD; Memo's release path owns the checkpoint blocks.
      Pipeline.redactPii(injected, textCol = "txt")
        .select(col("doc_id"), col("lang"), col("source"),
          col("red").as("text"),
          length(col("red")).cast("long").as("n_chars"),
          (col("n_email") + col("n_phone") + col("n_ip")).cast("long")
            .as("n_pii"))
        .localCheckpoint()
    }

  /** Budget-admitted gated docs, memoized: the summary row reads the
    * chain's tail frames several times (counts, xor digests, sum
    * digests, the distinct-pack count), and without persistence every
    * scalar aggregate would re-run budget→mix→pack from scratch —
    * 3-7 recomputations of the corpus tail per execution. Keyed memos
    * (one per stage, the docShingles discipline) make each stage
    * materialize once per (session, corpus).
    */
  private def selected(s: SparkSession, dir: String): DataFrame =
    Memo.memo("chain_sel", s, dir, persistIt = true) {
      val g = gated(s, dir)
      // Languages-sized driver aggregate (ChainSoak's budget shape):
      // half the smallest language's post-redact char mass. An EMPTY
      // gated corpus budgets 0 and flows zero rows through — the
      // oracle's MIN over an empty bud is NULL with the same effect,
      // so the degenerate corpus keeps engine ≡ oracle (the Bpe
      // dry-pairs rule, ADVICE r13) instead of erroring engine-side
      // only.
      val langMass = g.groupBy("lang").agg(sum("n_chars").as("c"))
        .collect().map(_.getLong(1))
      val budget = if (langMass.isEmpty) 0L else langMass.min / 2
      Pipeline.budgetSelectDocs(g, budget)
    }

  private def sampled(s: SparkSession, dir: String): DataFrame =
    Memo.memo("chain_sam", s, dir, persistIt = true) {
      Pipeline.mixtureSample(selected(s, dir))
        .select("doc_id", "lang", "text")
    }

  private def packedLayout(s: SparkSession, dir: String): DataFrame =
    Memo.memo("chain_packed", s, dir, persistIt = true) {
      Pipeline.packSequencesBy(
        sampled(s, dir).select(col("doc_id"), col("lang"),
          expr("cast(size(filter(split(text, ' '), x -> x != '')) " +
            "as int)").as("n_tok")), cap = 2048)
    }

  /** 40-bit BIGINT from an md5 hex prefix — both engines' portable
    * row-hash unit (the winnow_fps64 hex-to-int64 contract, shortened
    * so SUM over any fixture stays far under 2^63).
    */
  private def h40(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 10), 16, 10).cast("long")

  // ---- The incremental (daily-crawl) cadence: curation_chain_incr ----

  /** Incoming docs that near-dup a RESIDENT doc (the new-batch drop
    * set) — cross-split incremental dedup off the memoized shingle and
    * band caches, the dedup_incremental production layout (corpus
    * signatures precomputed, not re-derived per intake batch).
    */
  private def incrNewDups(s: SparkSession, dir: String): DataFrame =
    Memo.memo("incr_dups", s, dir, persistIt = true) {
      val sh = Dedup.docShingles(t(s, dir, "documents"), cacheKey = dir)
      val bands = Dedup.bandSignatures(sh, cacheKey = dir)
      Dedup.incrementalNearDupPairs(
        corpus = sh.filter(col("doc_id") % 2 =!= 0),
        incoming = sh.filter(col("doc_id") % 2 === 0), 4, 5,
        corpusBands = bands.filter(col("doc_id") % 2 =!= 0),
        incomingBands = bands.filter(col("doc_id") % 2 === 0))
        .select(col("new_id").as("doc_id")).distinct()
    }

  /** The new batch's admitted survivors: incoming docs (doc_id even —
    * the dedup_incremental_half split) minus resident near-dups, span-
    * scrubbed with first-carrier attribution over the UNION (resident
    * fps participate, so a span a resident doc already carries scrubs
    * out of the new batch), then budget-admitted under half the
    * smallest language's post-scrub char mass.
    */
  private def incrAdmitted(s: SparkSession, dir: String): DataFrame =
    Memo.memo("incr_admitted", s, dir, persistIt = true) {
      incr2Admit(incrScrubbed(s, dir))
    }

  /** The one-epoch scrub, memoized LINEAGE-TRUNCATED (the incr2Scr1
    * lesson, round 16): the admission consumes the scrub three times
    * (language-mass collect, banded budget boundaries, output), and
    * with a plain nested plan each action re-ran the scrub AND paid
    * seconds of re-analysis of the nested tree — measured 15.1 s →
    * 9.4 s on the query's cold build at sf0.1.
    */
  private def incrScrubbed(s: SparkSession, dir: String): DataFrame =
    Memo.memo("incr_scr", s, dir, persistIt = false) {
      val docs = t(s, dir, "documents")
      val surv = docs.filter(col("doc_id") % 2 === 0)
        .join(incrNewDups(s, dir), Seq("doc_id"), "left_anti")
      val unionIds = docs.filter(col("doc_id") % 2 =!= 0)
        .select("doc_id").unionByName(surv.select("doc_id"))
      val fps = Corpus.docFps(docs, cacheKey = dir)
        .join(unionIds, Seq("doc_id"), "left_semi")
      Corpus.spanScrubDocs(surv, fps).localCheckpoint()
    }

  /** Build-once per (session, corpus): the RESIDENT half materialized
    * as a manifested documents store, then the admitted new batch
    * epoch-appended through the exactly-once intake ledger
    * (StoreIntake.documentsIntakeBatch — staged write, intent record,
    * compositional manifest publish). The declared query reads the
    * POST-APPEND snapshot, so the summary is green only if intake →
    * dedup-against-resident → scrub → admission → ledgered append →
    * manifest flip reproduces the oracle's union exactly.
    */
  private def incrStore(s: SparkSession, dir: String): String =
    incrStoreCache.synchronized(
      incrStoreCache.getOrElseUpdate((s, dir), {
        val p = java.nio.file.Files
          .createTempDirectory("graft-incrstore").toString + "/docs"
        val docs = t(s, dir, "documents")
        AtRestStores.writeDocumentsStore(
          docs.filter(col("doc_id") % 2 =!= 0), p)
        AtRestStores.publishDocumentsManifest(s, p): Unit
        graft.streaming.StoreIntake.documentsIntakeBatch(p, "incr")(
          incrAdmitted(s, dir), 0L)
        p
      }))

  private val incrStoreCache = scala.collection.mutable.Map.empty[
    (SparkSession, String), String]

  // ---- The REPEATED cadence: curation_chain_incr2 (VERDICT r15 #3) —
  // epoch after epoch, each new batch probing the PREVIOUS append's
  // survivors. Slices: resident = odd doc_ids, batch 1 = doc_id % 4
  // == 0, batch 2 = doc_id % 4 == 2. Signature semantics are
  // intake-time (the sig-store contract): dedup shingles and scrub
  // fingerprints come from a doc's ORIGINAL content — the store's
  // scrub rewrites text, never the dedup index — so both epochs probe
  // the memoized full-corpus shingle/fp tables restricted to the
  // probe-set ids, and the oracle mirrors that with original-text
  // signature CTEs over snapshot-membership filters.

  /** Band-signature store maintained ALONGSIDE the documents store —
    * the membership index every epoch's dedup probe hits (the
    * sig_store_probe layout: bucketed (band, sig), signatures appended
    * at admission time under the exactly-once ledger, from ORIGINAL
    * content — intake-time semantics). Probing it is one broadcast of
    * the batch's bands against a bucketed scan: ZERO corpus-sized
    * shuffle per intake epoch. The first build of this query instead
    * semi-joined the full band table with the snapshot's ids — two
    * corpus-sized shuffles per daily epoch at 100 TB, which is
    * exactly the cost the signature store exists to avoid.
    */
  private def incr2Sig(s: SparkSession, dir: String): (String, String) =
    incr2SigCache.synchronized(
      incr2SigCache.getOrElseUpdate((s, dir), {
        val wh = java.nio.file.Files
          .createTempDirectory("graft-incr2sig").toString
        val tbl = "incr2sig_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir) & 0x7fffffff)
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val sh = Dedup.docShingles(t(s, dir, "documents"),
          cacheKey = dir)
        // Born empty; residents arrive through the ledgered intake.
        Dedup.writeSignatureStore(sh.limit(0), s"$wh/sig", tbl)
        graft.streaming.StoreIntake.signatureIntakeBatch(
          tbl, s"$wh/sig", "incr2sig")(
          t(s, dir, "documents").select("doc_id", "text")
            .filter(col("doc_id") % 2 =!= 0), 0L)
        (tbl, s"$wh/sig")
      }))

  private val incr2SigCache = scala.collection.mutable.Map.empty[
    (SparkSession, String), (String, String)]

  /** Batch-1 docs near-dupping a RESIDENT doc — probed off the
    * signature store. The corpus-side parity filter restricts the
    * verified pairs to resident partners: a no-op at epoch-1 probe
    * time (the store holds only residents), load-bearing if the memo
    * is recomputed after epoch 1's admitted signatures landed (a
    * batch-internal pair must stay out of this query's contract).
    */
  private[operators] def incr2Dups1(s: SparkSession, dir: String): DataFrame =
    Memo.memo("incr2_dups1", s, dir, persistIt = true) {
      val sh = Dedup.docShingles(t(s, dir, "documents"), cacheKey = dir)
      val bands = Dedup.bandSignatures(sh, cacheKey = dir)
      val (tbl, _) = incr2Sig(s, dir)
      Dedup.incrementalNearDupPairs(
        corpus = sh,
        incoming = sh.filter(col("doc_id") % 4 === 0), 4, 5,
        corpusBands = Dedup.signatureStore(s, tbl),
        incomingBands = bands.filter(col("doc_id") % 4 === 0))
        .filter(col("corpus_id") % 2 =!= 0)
        .select(col("new_id").as("doc_id")).distinct()
    }

  /** Batch 1's admitted survivors — dedup vs resident, span-scrub with
    * attribution over resident ∪ survivors, budget-admit (half the
    * smallest language's post-scrub mass, computed per epoch).
    */
  private[operators] def incr2Adm1(s: SparkSession, dir: String): DataFrame =
    Memo.memo("incr2_adm1", s, dir, persistIt = true) {
      incr2Admit(incr2Scr1(s, dir))
    }

  /** Epoch 1's scrubbed survivors, memoized: the scrub (first-carrier
    * attribution over the fp subset + the codegen'd span removal) is
    * the epoch's expensive pass, and the admission consumes it three
    * times (language-mass collect, banded budget boundaries, output
    * materialization) — unmemoized it re-ran per action.
    */
  private def incr2Scr1(s: SparkSession, dir: String): DataFrame =
    Memo.memo("incr2_scr1", s, dir, persistIt = false) {
      val docs = t(s, dir, "documents")
      val surv = docs.filter(col("doc_id") % 4 === 0)
        .join(incr2Dups1(s, dir), Seq("doc_id"), "left_anti")
      // Lineage-truncated (the chain_gated lesson, r15): the scrub
      // plan nests snapshot reads, probe checkpoints, and the fp memo;
      // the admission's banded windows reference it from several
      // subtrees, and a plain persist re-ANALYZES the nested tree on
      // every downstream action — measured ~16 s of pure planning per
      // admission action at sf0.1. A flat LogicalRDD makes them ms;
      // Memo's release path owns the checkpoint blocks.
      incr2Scrub(s, dir, surv,
        docs.filter(col("doc_id") % 2 =!= 0).select("doc_id"))
        .localCheckpoint()
    }

  /** Shared epoch scrub: `surv` with first-carrier attribution over
    * `probeIds` ∪ survivors (intake-time fps off the memoized
    * full-corpus table).
    */
  private def incr2Scrub(s: SparkSession, dir: String,
      surv: DataFrame, probeIds: DataFrame): DataFrame = {
    val docs = t(s, dir, "documents")
    val unionIds = probeIds.unionByName(surv.select("doc_id"))
    val fps = Corpus.docFps(docs, cacheKey = dir)
      .join(unionIds, Seq("doc_id"), "left_semi")
    Corpus.spanScrubDocs(surv, fps)
  }

  /** Shared epoch admission: budget-admit the scrubbed survivors under
    * half the smallest language's post-scrub mass.
    */
  private def incr2Admit(scr: DataFrame): DataFrame = {
    val langMass = scr.groupBy("lang").agg(sum("n_chars").as("c"))
      .collect().map(_.getLong(1))
    val budget = if (langMass.isEmpty) 0L else langMass.min / 2
    Pipeline.budgetSelectDocs(scr, budget)
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Resident store + epoch 0 (batch 1) appended to BOTH stores — the
    * documents store (scrubbed text) and the signature store (original
    * content's bands, the intake-time index); returns (path,
    * post-append manifest version). The version pin makes every
    * epoch-2 derivation re-computable after a memo flush even though
    * the CURRENT snapshot has since moved past it.
    */
  private[operators] def incr2Base(s: SparkSession, dir: String): (String, Long) =
    incr2BaseCache.synchronized(
      incr2BaseCache.getOrElseUpdate((s, dir), {
        val p = java.nio.file.Files
          .createTempDirectory("graft-incr2store").toString + "/docs"
        val docs = t(s, dir, "documents")
        AtRestStores.writeDocumentsStore(
          docs.filter(col("doc_id") % 2 =!= 0), p)
        AtRestStores.publishDocumentsManifest(s, p): Unit
        graft.streaming.StoreIntake.documentsIntakeBatch(p, "incr2")(
          incr2Adm1(s, dir), 0L)
        // Admitted docs' signatures land in the membership index —
        // ORIGINAL text (the dedup index is intake-time; the documents
        // store's copy is scrubbed), batch-sized semi-join.
        val (tbl, sigPath) = incr2Sig(s, dir)
        graft.streaming.StoreIntake.signatureIntakeBatch(
          tbl, sigPath, "incr2sig")(
          docs.select("doc_id", "text")
            .join(incr2Adm1(s, dir).select("doc_id"),
              Seq("doc_id"), "left_semi"), 1L)
        (p, StoreManifest.currentVersion(s, p).getOrElse(
          throw new IllegalStateException(s"$p lost its manifest")))
      }))

  private val incr2BaseCache = scala.collection.mutable.Map.empty[
    (SparkSession, String), (String, Long)]

  /** Batch-2 docs near-dupping a POST-EPOCH-1 SNAPSHOT member — the
    * repeat-cadence witness: batch 1's admitted survivors are probe
    * targets, its dropped docs are not. The probe hits the signature
    * store, whose membership after [[incr2Base]] is EXACTLY the
    * post-epoch-1 snapshot's (both fed by the same admissions under
    * the same ledgers); the verified pairs are restricted to that
    * membership explicitly (odd residents by parity, admitted batch-1
    * partners by a batch-sized semi-join), so the set is stable even
    * if a later evolution appended further signature epochs.
    */
  private[operators] def incr2Dups2(s: SparkSession, dir: String): DataFrame =
    Memo.memo("incr2_dups2", s, dir, persistIt = true) {
      incr2Base(s, dir): Unit
      val sh = Dedup.docShingles(t(s, dir, "documents"), cacheKey = dir)
      val bands = Dedup.bandSignatures(sh, cacheKey = dir)
      val (tbl, _) = incr2Sig(s, dir)
      // Checkpointed: the membership restriction below reads the
      // verified pairs TWICE (parity branch + admitted-partner
      // branch); without the truncation the whole probe ran twice.
      // Candidate-pair-sized; Memo's release path owns the blocks via
      // the result plan's LogicalRDD.
      val pairs = Dedup.incrementalNearDupPairs(
        corpus = sh,
        incoming = sh.filter(col("doc_id") % 4 === 2), 4, 5,
        corpusBands = Dedup.signatureStore(s, tbl),
        incomingBands = bands.filter(col("doc_id") % 4 === 2))
        .localCheckpoint()
      val adm1Partner = pairs.filter(col("corpus_id") % 2 === 0)
        .join(incr2Adm1(s, dir).select(col("doc_id").as("corpus_id")),
          Seq("corpus_id"), "left_semi")
      pairs.filter(col("corpus_id") % 2 =!= 0)
        .unionByName(adm1Partner)
        .select(col("new_id").as("doc_id")).distinct()
    }

  /** Batch 2's admitted survivors, attributed against the post-epoch-1
    * snapshot membership ∪ its own survivors.
    */
  private[operators] def incr2Adm2(s: SparkSession, dir: String): DataFrame =
    Memo.memo("incr2_adm2", s, dir, persistIt = true) {
      incr2Admit(incr2Scr2(s, dir))
    }

  /** Epoch 2's scrubbed survivors, memoized (see [[incr2Scr1]]). */
  private def incr2Scr2(s: SparkSession, dir: String): DataFrame =
    Memo.memo("incr2_scr2", s, dir, persistIt = false) {
      val (p, v) = incr2Base(s, dir)
      val docs = t(s, dir, "documents")
      val surv = docs.filter(col("doc_id") % 4 === 2)
        .join(incr2Dups2(s, dir), Seq("doc_id"), "left_anti")
      // Lineage-truncated — see incr2Scr1.
      incr2Scrub(s, dir, surv,
        StoreManifest.snapshotReadAsOf(s, p, v).select("doc_id"))
        .localCheckpoint()
    }

  /** The fully-evolved store: epoch 1 (batch 2) appended on top of
    * [[incr2Base]] through the same exactly-once ledger.
    */
  private[operators] def incr2Store(s: SparkSession, dir: String): String =
    incr2StoreCache.synchronized(
      incr2StoreCache.getOrElseUpdate((s, dir), {
        val (p, _) = incr2Base(s, dir)
        graft.streaming.StoreIntake.documentsIntakeBatch(p, "incr2")(
          incr2Adm2(s, dir), 1L)
        p
      }))

  private val incr2StoreCache = scala.collection.mutable.Map.empty[
    (SparkSession, String), String]

  val all: Seq[QuerySpec] = Seq(

    QuerySpec("curation_chain",
      s"""WITH RECURSIVE ${DedupQueries.dupesCtes},
         |surv AS MATERIALIZED (
         |        SELECT doc_id, text, lang, source FROM documents
         |        WHERE doc_id NOT IN (SELECT doc_id FROM dupes)),
         |${CorpusQueries.scrubCtes("surv")},
         |scr AS MATERIALIZED (
         |        SELECT dl.doc_id, k.lang, k.source,
         |               COALESCE(ks.kt, '') AS text,
         |               CAST(COALESCE(ks.kc, 0) AS BIGINT) AS n_chars
         |        FROM dl LEFT JOIN ks USING (doc_id)
         |        JOIN surv k ON dl.doc_id = k.doc_id),
         |bsh AS (SELECT DISTINCT unnest(sh) AS s FROM d
         |        WHERE doc_id % 97 = 0),
         |cont AS (SELECT doc_id FROM (
         |           SELECT doc_id, unnest(sh) AS s FROM d
         |           WHERE doc_id % 97 != 0)
         |         WHERE s IN (SELECT s FROM bsh)
         |         GROUP BY doc_id HAVING COUNT(*) >= 5),
         |cln AS MATERIALIZED (
         |        SELECT * FROM scr WHERE doc_id % 97 != 0
         |          AND doc_id NOT IN (SELECT doc_id FROM cont)),
         |gtq AS (SELECT doc_id, unnest(${TextOps.toksD}) AS term
         |        FROM documents),
         |gtf AS (SELECT doc_id, term, COUNT(*) AS tf FROM gtq
         |        GROUP BY doc_id, term),
         |gagg AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |          COUNT(*) AS n_distinct,
         |          CAST(MAX(tf) AS BIGINT) AS top_tf,
         |          CAST(SUM(tf * length(term)) AS BIGINT) AS sum_len,
         |          COUNT(*) FILTER (WHERE term IN
         |            (${TextOps.stopEn.map(w => s"'$w'").mkString(", ")}))
         |            AS n_stop_distinct
         |         FROM gtf GROUP BY doc_id),
         |gok AS (SELECT doc_id FROM gagg
         |        WHERE n_tokens >= 20 AND n_tokens <= 100000
         |          AND sum_len >= 4 * n_tokens
         |          AND sum_len <= 10 * n_tokens
         |          AND n_stop_distinct >= 2
         |          AND n_distinct * 10 >= n_tokens * 3
         |          AND top_tf * 5 <= n_tokens),
         |prd AS (SELECT doc_id, lang, source,
         |          text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |          '@mail.example.com or +1555' ||
         |          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         |          ' ip 10.2.' || CAST(doc_id % 256 AS VARCHAR) ||
         |          '.77' AS txt
         |        FROM cln
         |        WHERE doc_id IN (SELECT doc_id FROM gok)),
         |red AS MATERIALIZED (
         |        SELECT doc_id, lang, source,
         |          CAST(len(regexp_extract_all(txt,
         |              '${Pipeline.EmailRe}')) AS BIGINT)
         |          + CAST(len(regexp_extract_all(txt,
         |              '${Pipeline.PhoneRe}')) AS BIGINT)
         |          + CAST(len(regexp_extract_all(txt,
         |              '${Pipeline.Ipv4Re}')) AS BIGINT) AS n_pii,
         |          regexp_replace(regexp_replace(regexp_replace(txt,
         |            '${Pipeline.EmailRe}', '<EMAIL>', 'g'),
         |            '${Pipeline.PhoneRe}', '<PHONE>', 'g'),
         |            '${Pipeline.Ipv4Re}', '<IP>', 'g') AS text
         |        FROM prd),
         |rdc AS MATERIALIZED (
         |        SELECT doc_id, lang, source, text,
         |               CAST(length(text) AS BIGINT) AS n_chars, n_pii
         |        FROM red),
         |bud AS (SELECT MIN(c) // 2 AS b FROM (
         |          SELECT CAST(SUM(n_chars) AS BIGINT) AS c
         |          FROM rdc GROUP BY lang)),
         |sel AS MATERIALIZED (
         |        SELECT doc_id, lang, source, text, n_chars FROM (
         |          SELECT doc_id, lang, source, text, n_chars,
         |                 COALESCE(SUM(n_chars) OVER (PARTITION BY lang
         |                   ORDER BY n_chars DESC, doc_id
         |                   ROWS BETWEEN UNBOUNDED PRECEDING
         |                     AND 1 PRECEDING),
         |                   0) AS cum
         |          FROM rdc)
         |        WHERE cum + n_chars <= (SELECT b FROM bud)),
         |ms AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars_tot
         |       FROM sel GROUP BY source),
         |mw AS (SELECT source,
         |         CAST((1000000 *
         |             CAST((SELECT SUM(chars_tot) FROM ms) AS HUGEINT))
         |           // NULLIF(CAST((SELECT COUNT(*) FROM ms) AS HUGEINT)
         |                * chars_tot, 0)
         |           AS BIGINT) AS weight_micro
         |       FROM ms),
         |sam AS MATERIALIZED (
         |        SELECT sel.doc_id, sel.lang, sel.text
         |        FROM sel JOIN mw
         |          ON sel.source IS NOT DISTINCT FROM mw.source
         |        WHERE ((doc_id * 2246822519) % 4294967296) % 1000000
         |              < CASE WHEN weight_micro IS NULL THEN NULL
         |                     ELSE least(weight_micro, 1000000) END),
         |tok AS (SELECT doc_id, lang, text,
         |          CAST(len(list_filter(string_split(text, ' '),
         |            x -> x != '')) AS BIGINT) AS n_tok
         |        FROM sam),
         |pk AS (SELECT doc_id, lang, text, n_tok,
         |         CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang
         |           ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |           0) AS BIGINT) AS tok_offset
         |       FROM tok),
         |ph AS MATERIALIZED (
         |       SELECT lang, text,
         |         CAST(floor(tok_offset / 2048) AS BIGINT) AS bin,
         |         CAST(('0x' || substring(md5(
         |             CAST(doc_id AS VARCHAR) || ':' ||
         |             COALESCE(lang, '<null>') || ':' ||
         |             CAST(n_tok AS VARCHAR) || ':' ||
         |             CAST(tok_offset AS VARCHAR) || ':' ||
         |             CAST(CAST(floor(tok_offset / 2048) AS BIGINT)
         |               AS VARCHAR)), 1, 10)) AS BIGINT) AS hr
         |       FROM pk)
         |SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         |       (SELECT COUNT(*) FROM surv) AS n_kept,
         |       (SELECT COUNT(*) FROM cln) AS n_clean,
         |       (SELECT COUNT(*) FROM rdc) AS n_quality,
         |       (SELECT CAST(COALESCE(SUM(n_pii), 0) AS BIGINT)
         |        FROM rdc) AS n_pii,
         |       (SELECT COUNT(*) FROM sel) AS n_selected,
         |       (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
         |        FROM sel) AS sel_chars,
         |       (SELECT COUNT(*) FROM sam) AS n_sampled,
         |       (SELECT COUNT(*) FROM
         |          (SELECT DISTINCT lang, bin FROM ph)) AS n_packs,
         |       (SELECT COALESCE(BIT_XOR(CAST(('0x' ||
         |            substring(md5(text), 1, 10)) AS BIGINT)), 0)
         |        FROM ph) AS text_xor,
         |       (SELECT COALESCE(BIT_XOR(hr), 0) FROM ph) AS pack_xor,
         |       (SELECT CAST(COALESCE(SUM(hr), 0) AS BIGINT) FROM ph)
         |         AS pack_sum""".stripMargin) { (s, dir) =>
    // The whole 1-row summary memoizes LINEAGE-TRUNCATED (the
    // clusters-memo pattern): a plain persist still re-ANALYZES the
    // full nested chain plan on every count — measured 2.7-3.1 s of
    // pure driver planning per warm call over already-cached data.
    // localCheckpoint replaces the plan with a 1-row LogicalRDD, so a
    // warm call costs milliseconds; Memo's release path owns the
    // checkpoint blocks.
    Memo.memo("chain_summary", s, dir, persistIt = false) {
      val docs = t(s, dir, "documents")
      val g = gated(s, dir)
      val sel = selected(s, dir)
      val sam = sampled(s, dir)
      val packed = packedLayout(s, dir)
      val packRow = concat_ws(":",
        col("doc_id").cast("string"),
        coalesce(col("lang"), lit("<null>")),
        col("n_tok").cast("string"),
        col("tok_offset").cast("string"),
        col("bin").cast("string"))
      val aDocs = docs.agg(count(lit(1)).as("n_docs"))
      val aKept = docs.join(chainDupes(s, dir), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_kept"))
      val aClean = cleaned(s, dir).agg(count(lit(1)).as("n_clean"))
      val aGated = g.agg(count(lit(1)).as("n_quality"),
        coalesce(sum("n_pii"), lit(0L)).as("n_pii"))
      val aSel = sel.agg(count(lit(1)).as("n_selected"),
        coalesce(sum("n_chars"), lit(0L)).as("sel_chars"))
      val aSam = sam.select(h40(col("text")).as("th"))
        .agg(count(lit(1)).as("n_sampled"),
          coalesce(expr("bit_xor(th)"), lit(0L)).as("text_xor"))
      val aPacks = packed.select("lang", "bin").distinct()
        .agg(count(lit(1)).as("n_packs"))
      val aLayout = packed.select(h40(packRow).as("hr"))
        .agg(coalesce(expr("bit_xor(hr)"), lit(0L)).as("pack_xor"),
          coalesce(sum("hr"), lit(0L)).as("pack_sum"))
      aDocs.crossJoin(broadcast(aKept))
        .crossJoin(broadcast(aClean))
        .crossJoin(broadcast(aGated))
        .crossJoin(broadcast(aSel))
        .crossJoin(broadcast(aSam))
        .crossJoin(broadcast(aPacks))
        .crossJoin(broadcast(aLayout))
        .localCheckpoint()
    }
    },

    // The incremental curation chain — the daily-crawl production
    // cadence (VERDICT r14 next-round #2): curation_chain gates the
    // full-corpus composition and dedup_incremental gates
    // new-batch-vs-corpus dedup in isolation; this gates the whole
    // intake path END TO END — resident half materialized as a
    // manifested store, the new batch (doc_id even, the
    // dedup_incremental_half split) incrementally deduped AGAINST the
    // resident corpus off the shared band caches, span-scrubbed with
    // union-wide first-carrier attribution (a span a resident doc
    // already carries scrubs out of the batch), budget-admitted, and
    // EPOCH-APPENDED through the exactly-once intake ledger with a
    // compositional manifest publish. The summary reads the
    // POST-APPEND SNAPSHOT: counts, char masses, and a full
    // (doc_id, text) digest pair over the store — so a double-applied
    // epoch, a lost row, a mis-attributed scrub, or a wrong admission
    // all hash-mismatch against the oracle's from-scratch union.
    // Batch-INTERNAL near-dups are deliberately out of this query's
    // contract (dedup_incremental's cross-split semantics, shared CTE
    // and all); the full-corpus chain gates those. Category `build`:
    // the cold time is the one-time store build + append.
    QuerySpec.build("curation_chain_incr",
      s"""WITH ${TextOps.docShinglesCteD},
         |${DedupQueries.verifiedPairsCtes},
         |newdup AS (SELECT DISTINCT
         |             CASE WHEN da % 2 = 0 THEN da ELSE db END AS doc_id
         |           FROM p WHERE (da % 2 = 0) != (db % 2 = 0)),
         |surv AS MATERIALIZED (
         |        SELECT doc_id, text, lang, source FROM documents
         |        WHERE doc_id % 2 = 0
         |          AND doc_id NOT IN (SELECT doc_id FROM newdup)),
         |uni AS MATERIALIZED (
         |        SELECT doc_id, text FROM documents WHERE doc_id % 2 != 0
         |        UNION ALL SELECT doc_id, text FROM surv),
         |${CorpusQueries.scrubCtes("uni")},
         |scr AS MATERIALIZED (
         |        SELECT dl.doc_id, k.lang, k.source,
         |               COALESCE(ks.kt, '') AS text,
         |               CAST(COALESCE(ks.kc, 0) AS BIGINT) AS n_chars
         |        FROM dl LEFT JOIN ks USING (doc_id)
         |        JOIN surv k ON dl.doc_id = k.doc_id),
         |bud AS (SELECT MIN(c) // 2 AS b FROM (
         |          SELECT CAST(SUM(n_chars) AS BIGINT) AS c
         |          FROM scr GROUP BY lang)),
         |sel AS MATERIALIZED (
         |        SELECT doc_id, lang, source, text, n_chars FROM (
         |          SELECT doc_id, lang, source, text, n_chars,
         |                 COALESCE(SUM(n_chars) OVER (PARTITION BY lang
         |                   ORDER BY n_chars DESC, doc_id
         |                   ROWS BETWEEN UNBOUNDED PRECEDING
         |                     AND 1 PRECEDING),
         |                   0) AS cum
         |          FROM scr)
         |        WHERE cum + n_chars <= (SELECT b FROM bud)),
         |store AS MATERIALIZED (
         |        SELECT doc_id, lang, source, text,
         |               CAST(n_chars AS BIGINT) AS n_chars
         |        FROM documents WHERE doc_id % 2 != 0
         |        UNION ALL
         |        SELECT doc_id, lang, source, text, n_chars FROM sel),
         |sh40 AS (SELECT CAST(('0x' || substring(md5(
         |             CAST(doc_id AS VARCHAR) || ':' ||
         |             COALESCE(text, '<null>')), 1, 10)) AS BIGINT)
         |           AS hr
         |         FROM store)
         |SELECT (SELECT COUNT(*) FROM documents WHERE doc_id % 2 != 0)
         |         AS n_resident,
         |       (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 0)
         |         AS n_incoming,
         |       (SELECT COUNT(*) FROM newdup) AS n_new_dups,
         |       (SELECT COUNT(*) FROM scr) AS n_scrubbed,
         |       (SELECT COUNT(*) FROM sel) AS n_admitted,
         |       (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
         |        FROM sel) AS adm_chars,
         |       (SELECT COUNT(*) FROM store) AS n_store,
         |       (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
         |        FROM store) AS store_chars,
         |       (SELECT COALESCE(BIT_XOR(hr), 0) FROM sh40)
         |         AS store_xor,
         |       (SELECT CAST(COALESCE(SUM(hr), 0) AS BIGINT) FROM sh40)
         |         AS store_sum""".stripMargin) { (s, dir) =>
    Memo.memo("incr_summary", s, dir, persistIt = false) {
      val docs = t(s, dir, "documents")
      val snap = StoreManifest.snapshotRead(s, incrStore(s, dir))
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          col("n_chars").cast("long").as("n_chars"))
      val adm = incrAdmitted(s, dir)
      val scrCount = {
        // n_scrubbed = the scrub stage's population (pre-budget):
        // incoming survivors with non-null text — recomputed off the
        // memoized dup set, not the admitted memo, so the count
        // witnesses the stage boundary the oracle's scr draws.
        docs.filter(col("doc_id") % 2 === 0 && col("text").isNotNull)
          .join(incrNewDups(s, dir), Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("n_scrubbed"))
      }
      val aRes = docs.filter(col("doc_id") % 2 =!= 0)
        .agg(count(lit(1)).as("n_resident"))
      val aInc = docs.filter(col("doc_id") % 2 === 0)
        .agg(count(lit(1)).as("n_incoming"))
      val aDup = incrNewDups(s, dir)
        .agg(count(lit(1)).as("n_new_dups"))
      val aAdm = adm.agg(count(lit(1)).as("n_admitted"),
        coalesce(sum("n_chars"), lit(0L)).as("adm_chars"))
      val aStore = snap.agg(count(lit(1)).as("n_store"),
        coalesce(sum("n_chars"), lit(0L)).as("store_chars"))
      val aDigest = snap.select(h40(concat_ws(":",
          col("doc_id").cast("string"),
          coalesce(col("text"), lit("<null>")))).as("hr"))
        .agg(coalesce(expr("bit_xor(hr)"), lit(0L)).as("store_xor"),
          coalesce(sum("hr"), lit(0L)).as("store_sum"))
      aRes.crossJoin(broadcast(aInc))
        .crossJoin(broadcast(aDup))
        .crossJoin(broadcast(scrCount))
        .crossJoin(broadcast(aAdm))
        .crossJoin(broadcast(aStore))
        .crossJoin(broadcast(aDigest))
        .localCheckpoint()
    }
    },

    // The incremental cadence REPEATED (VERDICT r15 #3):
    // curation_chain_incr gates ONE epoch; production is epoch after
    // epoch, and the repeat-specific failure modes — the first
    // append's survivors not becoming probe targets, a budget-dropped
    // batch-1 doc still shadowing batch 2, per-epoch attribution
    // drawn from the wrong membership — are invisible to a one-epoch
    // gate. Two batches land on the resident store through the same
    // exactly-once ledger (epochs 0 and 1); batch 2 dedups and
    // attributes against the POST-EPOCH-1 SNAPSHOT membership, and
    // the summary digests the final snapshot against the oracle's
    // from-scratch evolution of all three slices. Signatures are
    // intake-time (original content) on both engines — the store's
    // scrub rewrites text, never the dedup index. Category `build`:
    // cold time is the one-time store build + two ledgered appends.
    QuerySpec.build("curation_chain_incr2",
      s"""WITH ${TextOps.docShinglesCteD},
         |${DedupQueries.verifiedPairsCtes},
         |nd1 AS (SELECT DISTINCT
         |          CASE WHEN da % 4 = 0 THEN da ELSE db END AS doc_id
         |        FROM p
         |        WHERE (da % 4 = 0) != (db % 4 = 0)
         |          AND (CASE WHEN da % 4 = 0 THEN db ELSE da END)
         |              % 2 != 0),
         |s1 AS MATERIALIZED (
         |        SELECT doc_id, text, lang, source FROM documents
         |        WHERE doc_id % 4 = 0
         |          AND doc_id NOT IN (SELECT doc_id FROM nd1)),
         |u1 AS MATERIALIZED (
         |        SELECT doc_id, text FROM documents WHERE doc_id % 2 != 0
         |        UNION ALL SELECT doc_id, text FROM s1),
         |${CorpusQueries.scrubCtes("u1", "q1")},
         |scr1 AS MATERIALIZED (
         |        SELECT q1dl.doc_id, k.lang, k.source,
         |               COALESCE(q1ks.kt, '') AS text,
         |               CAST(COALESCE(q1ks.kc, 0) AS BIGINT) AS n_chars
         |        FROM q1dl LEFT JOIN q1ks USING (doc_id)
         |        JOIN s1 k ON q1dl.doc_id = k.doc_id),
         |bud1 AS (SELECT MIN(c) // 2 AS b FROM (
         |          SELECT CAST(SUM(n_chars) AS BIGINT) AS c
         |          FROM scr1 GROUP BY lang)),
         |sel1 AS MATERIALIZED (
         |        SELECT doc_id, lang, source, text, n_chars FROM (
         |          SELECT doc_id, lang, source, text, n_chars,
         |                 COALESCE(SUM(n_chars) OVER (PARTITION BY lang
         |                   ORDER BY n_chars DESC, doc_id
         |                   ROWS BETWEEN UNBOUNDED PRECEDING
         |                     AND 1 PRECEDING),
         |                   0) AS cum
         |          FROM scr1)
         |        WHERE cum + n_chars <= (SELECT b FROM bud1)),
         |st1 AS MATERIALIZED (
         |        SELECT doc_id, lang, source, text,
         |               CAST(n_chars AS BIGINT) AS n_chars
         |        FROM documents WHERE doc_id % 2 != 0
         |        UNION ALL
         |        SELECT doc_id, lang, source, text, n_chars FROM sel1),
         |nd2 AS (SELECT DISTINCT
         |          CASE WHEN da % 4 = 2 THEN da ELSE db END AS doc_id
         |        FROM p
         |        WHERE (da % 4 = 2) != (db % 4 = 2)
         |          AND (CASE WHEN da % 4 = 2 THEN db ELSE da END)
         |              IN (SELECT doc_id FROM st1)),
         |s2 AS MATERIALIZED (
         |        SELECT doc_id, text, lang, source FROM documents
         |        WHERE doc_id % 4 = 2
         |          AND doc_id NOT IN (SELECT doc_id FROM nd2)),
         |u2 AS MATERIALIZED (
         |        SELECT doc_id, text FROM documents
         |        WHERE doc_id IN (SELECT doc_id FROM st1)
         |        UNION ALL SELECT doc_id, text FROM s2),
         |${CorpusQueries.scrubCtes("u2", "q2")},
         |scr2 AS MATERIALIZED (
         |        SELECT q2dl.doc_id, k.lang, k.source,
         |               COALESCE(q2ks.kt, '') AS text,
         |               CAST(COALESCE(q2ks.kc, 0) AS BIGINT) AS n_chars
         |        FROM q2dl LEFT JOIN q2ks USING (doc_id)
         |        JOIN s2 k ON q2dl.doc_id = k.doc_id),
         |bud2 AS (SELECT MIN(c) // 2 AS b FROM (
         |          SELECT CAST(SUM(n_chars) AS BIGINT) AS c
         |          FROM scr2 GROUP BY lang)),
         |sel2 AS MATERIALIZED (
         |        SELECT doc_id, lang, source, text, n_chars FROM (
         |          SELECT doc_id, lang, source, text, n_chars,
         |                 COALESCE(SUM(n_chars) OVER (PARTITION BY lang
         |                   ORDER BY n_chars DESC, doc_id
         |                   ROWS BETWEEN UNBOUNDED PRECEDING
         |                     AND 1 PRECEDING),
         |                   0) AS cum
         |          FROM scr2)
         |        WHERE cum + n_chars <= (SELECT b FROM bud2)),
         |st2 AS MATERIALIZED (
         |        SELECT * FROM st1
         |        UNION ALL
         |        SELECT doc_id, lang, source, text, n_chars FROM sel2),
         |sh40 AS (SELECT CAST(('0x' || substring(md5(
         |             CAST(doc_id AS VARCHAR) || ':' ||
         |             COALESCE(text, '<null>')), 1, 10)) AS BIGINT)
         |           AS hr
         |         FROM st2)
         |SELECT (SELECT COUNT(*) FROM documents WHERE doc_id % 2 != 0)
         |         AS n_resident,
         |       (SELECT COUNT(*) FROM documents WHERE doc_id % 4 = 0)
         |         AS n_b1,
         |       (SELECT COUNT(*) FROM documents WHERE doc_id % 4 = 2)
         |         AS n_b2,
         |       (SELECT COUNT(*) FROM nd1) AS n_dups1,
         |       (SELECT COUNT(*) FROM nd2) AS n_dups2,
         |       (SELECT COUNT(*) FROM scr1) AS n_scr1,
         |       (SELECT COUNT(*) FROM scr2) AS n_scr2,
         |       (SELECT COUNT(*) FROM sel1) AS n_adm1,
         |       (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
         |        FROM sel1) AS adm1_chars,
         |       (SELECT COUNT(*) FROM sel2) AS n_adm2,
         |       (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
         |        FROM sel2) AS adm2_chars,
         |       (SELECT COUNT(*) FROM st2) AS n_store,
         |       (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
         |        FROM st2) AS store_chars,
         |       (SELECT COALESCE(BIT_XOR(hr), 0) FROM sh40)
         |         AS store_xor,
         |       (SELECT CAST(COALESCE(SUM(hr), 0) AS BIGINT) FROM sh40)
         |         AS store_sum""".stripMargin) { (s, dir) =>
    Memo.memo("incr2_summary", s, dir, persistIt = false) {
      val docs = t(s, dir, "documents")
      val snap = StoreManifest.snapshotRead(s, incr2Store(s, dir))
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          col("n_chars").cast("long").as("n_chars"))
      val aRes = docs.filter(col("doc_id") % 2 =!= 0)
        .agg(count(lit(1)).as("n_resident"))
      val aB1 = docs.filter(col("doc_id") % 4 === 0)
        .agg(count(lit(1)).as("n_b1"))
      val aB2 = docs.filter(col("doc_id") % 4 === 2)
        .agg(count(lit(1)).as("n_b2"))
      val aDup1 = incr2Dups1(s, dir).agg(count(lit(1)).as("n_dups1"))
      val aDup2 = incr2Dups2(s, dir).agg(count(lit(1)).as("n_dups2"))
      val aScr1 = docs
        .filter(col("doc_id") % 4 === 0 && col("text").isNotNull)
        .join(incr2Dups1(s, dir), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_scr1"))
      val aScr2 = docs
        .filter(col("doc_id") % 4 === 2 && col("text").isNotNull)
        .join(incr2Dups2(s, dir), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_scr2"))
      val aAdm1 = incr2Adm1(s, dir).agg(count(lit(1)).as("n_adm1"),
        coalesce(sum("n_chars"), lit(0L)).as("adm1_chars"))
      val aAdm2 = incr2Adm2(s, dir).agg(count(lit(1)).as("n_adm2"),
        coalesce(sum("n_chars"), lit(0L)).as("adm2_chars"))
      val aStore = snap.agg(count(lit(1)).as("n_store"),
        coalesce(sum("n_chars"), lit(0L)).as("store_chars"))
      val aDigest = snap.select(h40(concat_ws(":",
          col("doc_id").cast("string"),
          coalesce(col("text"), lit("<null>")))).as("hr"))
        .agg(coalesce(expr("bit_xor(hr)"), lit(0L)).as("store_xor"),
          coalesce(sum("hr"), lit(0L)).as("store_sum"))
      aRes.crossJoin(broadcast(aB1))
        .crossJoin(broadcast(aB2))
        .crossJoin(broadcast(aDup1))
        .crossJoin(broadcast(aDup2))
        .crossJoin(broadcast(aScr1))
        .crossJoin(broadcast(aScr2))
        .crossJoin(broadcast(aAdm1))
        .crossJoin(broadcast(aAdm2))
        .crossJoin(broadcast(aStore))
        .crossJoin(broadcast(aDigest))
        .localCheckpoint()
    }
    })
}
