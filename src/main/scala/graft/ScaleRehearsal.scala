package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph, KMeans, Similarity}

/** Scale rehearsal for the dedup/similarity family (r3 VERDICT item 7).
  *
  * Builds an sf1-equivalent corpus (`SPARK_GRAFT_FACTOR`× the input, default
  * 10×) by replication with structure-preserving perturbation, then measures
  * LSH candidate-pair counts and verified outputs at both scales. The point:
  * candidate volume must track corpus growth (sub-quadratic), which
  * correctness gates cannot see — exactly the measurement that caught the
  * r3 degenerate-hyperplane bug.
  *
  * Perturbation design — each copy must preserve the ORIGINAL similarity
  * distribution within itself while decorrelating from other copies, or the
  * rehearsal measures a different corpus than it claims:
  * - documents: copy 0 is verbatim; copy c applies a Caesar substitution
  *   (letters shifted by c, case-preserving) — a bijection on characters
  *   and therefore on the CHARACTER n-gram shingles `ShingleHashesExpr`
  *   hashes, so pairwise Jaccard within a copy is EXACTLY the original
  *   corpus's while cross-copy shingle overlap is ~zero (digits/punctuation
  *   only). Two earlier designs failed instructively: tag tokens BETWEEN
  *   words turned trigram overlap into unigram overlap (inflated
  *   similarity), and tag PREFIXES on tokens preserved token shingles but
  *   the operator shingles characters — most char 3-grams were untouched,
  *   so copies stayed near-dups of each other and the pair count exploded
  *   two orders beyond linear. A rehearsal corpus must be validated against
  *   the operator's actual feature space.
  * - embeddings: copy c rotates each vector's dimensions by c positions —
  *   an isometry, so intra-copy cosine structure is EXACTLY the original's,
  *   while cross-copy vectors decorrelate to ~N(0, 1/sqrt(d)) cosines.
  *
  * Prints one JSON line per (family, factor) with corpus size, candidate
  * count, verified count, and elapsed seconds; results and the sizing rules
  * they demonstrate are recorded in BASELINE.md.
  */
object ScaleRehearsal {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val opts = JobArgs.resolve(args.toSeq, required = Nil,
      defaults = Map("SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.1",
        "SPARK_GRAFT_CPUS" -> "32",
        "SPARK_GRAFT_FACTOR" -> "10"))
    val sfDir = opts("SPARK_GRAFT_SF_DIR")
    val factor = opts("SPARK_GRAFT_FACTOR").toInt
    val spark = GraftSession.builder(s"local[${opts("SPARK_GRAFT_CPUS")}]",
      opts("SPARK_GRAFT_CPUS").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val emb1 = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))

    // Perturbation validity bounds (silent degeneration otherwise):
    // - copy c's Caesar shift is c mod 26, so factor > 26 would emit a
    //   VERBATIM copy (shift 0) and exact cross-copy duplicates would
    //   explode pair counts — the rehearsal would measure its own artifact;
    // - the embedding rotation slices [c+1, Dim-c], which is only an
    //   isometry while c < Dim;
    // - replica ids are offset by c*idOffset, so source ids must stay below
    //   the offset or replicas alias each other.
    val idOffset = 10000000L
    require(factor <= 26 && factor < Similarity.Dim,
      s"rehearsal factor $factor exceeds the perturbation family " +
        s"(<= 26 Caesar shifts, < ${Similarity.Dim} rotations)")
    require(docs1.agg(max(col("doc_id"))).head.getLong(0) < idOffset &&
        emb1.agg(max(col("vec_id"))).head.getLong(0) < idOffset,
      s"source ids must be < $idOffset or replica ids alias")

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def replicateDocs(f: Int): DataFrame =
      (0 until f).map { c =>
        val s = c % 26
        val text =
          if (c == 0) col("text")
          else translate(col("text"), lower + upper,
            lower.drop(s) + lower.take(s) + upper.drop(s) + upper.take(s))
        docs1.select((col("doc_id") + lit(c * idOffset)).as("doc_id"),
          text.as("text"))
      }.reduce(_ unionAll _)

    def replicateEmb(f: Int): DataFrame =
      (0 until f).map { c =>
        val e =
          if (c == 0) col("embedding")
          else concat(slice(col("embedding"), c + 1, Similarity.Dim - c),
            slice(col("embedding"), 1, c))
        emb1.select((col("vec_id") + lit(c * idOffset)).as("vec_id"),
          e.as("embedding"))
      }.reduce(_ unionAll _)

    def emit(family: String, f: Int, n: Long, candidates: Long,
             verified: Long, sec: Double): Unit =
      println(s"""{"family":"$family","factor":$f,"n":$n,""" +
        s""""candidates":$candidates,"verified":$verified,"sec":$sec}""")

    Seq(1, factor).foreach { f =>
      // materialize the scaled corpus so generation cost stays out of the
      // operator timings
      val dDir = TempDirs.create(s"graft-scale-docs$f")
      val eDir = TempDirs.create(s"graft-scale-emb$f")
      replicateDocs(f).write.mode("overwrite").parquet(dDir)
      replicateEmb(f).write.mode("overwrite").parquet(eDir)
      val docs = spark.read.parquet(dDir)
      val emb = spark.read.parquet(eDir)
      val nd = docs.count()
      val ne = emb.count()

      // MinHash-LSH (k=16 sigs, 4 bands of 4): candidates = distinct pairs
      // sharing any band bucket (the operator's own first stage), verified
      // = exact-Jaccard >= 0.5 survivors
      val bands = Residue.cut(
        Dedup.minhashBands(docs, n = 3, k = 16, bands = 4)).df
      val (candMh, tCandMh) = timed {
        bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") &&
              col("x.band_key") === col("y.band_key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
      }
      val (verMh, tVerMh) = timed {
        Dedup.minhashLshPairs(docs, n = 3, k = 16, bands = 4, threshold = 0.5).count()
      }
      emit("minhash_lsh", f, nd, candMh, verMh, tCandMh + tVerMh)

      // Stop-band cap (LshBandIndex.stopBands): inject verbatim
      // boilerplate docs (licence-block grade) at 5% of the corpus —
      // identical text, so every band piles them onto ONE key per band.
      // The delta (1/50 slice, templates included pro rata) probes the
      // persisted index capped at 64 and uncapped. Expected shape: the
      // uncapped candidate count grows ~f² (delta templates × all
      // templates), the capped count ~f (real-data buckets only) — the
      // cap is what keeps a boilerplate ingest off the quadratic cliff.
      val boiler = lit(("this software is provided as is without warranty " +
        "of any kind express or implied including but not limited to " +
        "merchantability fitness and noninfringement in no event shall " +
        "the authors be liable for any claim damages or other liability"))
      val mTmpl = math.max(50L, nd / 20)
      val tmpl = spark.range(mTmpl)
        .select((col("id") + lit(27L * idOffset)).as("doc_id"),
          boiler.as("text"))
      val sbDir = TempDirs.create(s"graft-scale-sbdocs$f")
      docs.unionByName(tmpl).write.mode("overwrite").parquet(sbDir)
      val corpusSb = spark.read.parquet(sbDir)
      val histSb = corpusSb.filter(col("doc_id") % 50 =!= 0)
      val deltaSb = corpusSb.filter(col("doc_id") % 50 === 0)
      def sbSweep(stop: Boolean): (Long, Long, Double) = {
        val idx = new graft.sources.LshBandIndex(spark,
          TempDirs.create(s"graft-scale-sbidx$f$stop"), 3, 16, 4)
        idx.bootstrap(histSb)
        idx.compact(buckets = 8)
        val sb = if (stop) Some(idx.stopBands(cap = 64)) else None
        val dB = Dedup.minhashBands(deltaSb, 3, 16, 4)
        val dProbe = sb.fold(dB)(s =>
          dB.join(broadcast(s), Seq("band", "band_key"), "left_anti"))
        val cand = dProbe.as("x").join(idx.bandsDf.as("y"),
            col("x.band") === col("y.band") &&
              col("x.band_key") === col("y.band_key") &&
              col("x.doc_id") =!= col("y.doc_id"))
          .select(least(col("x.doc_id"), col("y.doc_id")),
            greatest(col("x.doc_id"), col("y.doc_id"))).distinct().count()
        val outSb = TempDirs.create(s"graft-scale-sbout$f$stop")
        val (_, sec) = timed {
          idx.sweepAndAppend(corpusSb, deltaSb, threshold = 0.8,
            stopBands = sb) { pairs =>
            pairs.write.mode("overwrite").parquet(outSb)
          }
        }
        (cand, spark.read.parquet(outSb).count(), sec)
      }
      val (cU, vU, tU) = sbSweep(stop = false)
      emit("lsh_stopband_uncapped", f, nd + mTmpl, cU, vU, tU)
      val (cC, vC, tC) = sbSweep(stop = true)
      emit("lsh_stopband_capped", f, nd + mTmpl, cC, vC, tC)

      // SimHash bucket space is FIXED by `bits` (hamming<=2 → 3 chunks of
      // bits/3 key bits): a family sized for 5k docs saturates at 50k and
      // candidate volume goes quadratic no matter how good the data is.
      // The scaling knob is bits ~ log2(n): measure the 16-bit family at
      // 1× only, and the 30-bit family (PolyHash values are 31-bit) at
      // both factors — the latter is the 100 TB sizing rule.
      if (f == 1) {
        val (v16, t16) = timed { Dedup.simhashPairs(docs, 16, 2).count() }
        emit("simhash16", f, nd, -1, v16, t16)
      }
      val (v30, t30) = timed { Dedup.simhashPairs(docs, 30, 2).count() }
      emit("simhash30", f, nd, -1, v30, t30)

      // Embedding LSH (8 tables x 8 bits): candidates from the packed
      // first-collision join. Verified at two thresholds: 0.3 sits at
      // ~2.4σ of the random-cosine distribution for d=64 (so the OUTPUT
      // itself grows quadratically — a threshold-choice property, not an
      // operator defect), while 0.6 (~4.8σ) is outside it and must stay
      // ~linear in corpus size.
      val (candE, tCandE) = timed {
        Similarity.hyperplaneCandidates(emb, tables = 8, bits = 8).count()
      }
      val (verE3, tVerE3) = timed {
        Dedup.embeddingPairs(emb, 0.3, bucketed = true).count()
      }
      emit("embedding_lsh_t03", f, ne, candE, verE3, tCandE + tVerE3)
      val (verE6, tVerE6) = timed {
        Dedup.embeddingPairs(emb, 0.6, bucketed = true).count()
      }
      emit("embedding_lsh_t06", f, ne, candE, verE6, tVerE6)
      // the 8x8 family's random-collision floor is n²/2 · tables · 2^-bits
      // — quadratic once n outgrows 2^bits. The sizing rule is
      // bits ~ log2(n): at 10x, 11-bit keys (5 tables fit the 64-bit pack)
      // pull candidates back to ~linear.
      if (f > 1) {
        val (candE11, tCandE11) = timed {
          Similarity.hyperplaneCandidates(emb, tables = 5, bits = 11).count()
        }
        emit("embedding_lsh_11bit", f, ne, candE11, -1, tCandE11)
      }
      // DEFAULT-parameter families (r4 verdict item 7): the sizing rules
      // above now ARE the defaults — bits/tables/nlist derived from
      // corpus.count() — so the linearity claim is measured with no
      // hand-tuning at all. Candidates must track corpus growth at both
      // factors or the derivation is wrong.
      val (candAuto, tCandAuto) = timed {
        Similarity.hyperplaneCandidatesAuto(emb).count()
      }
      emit("embedding_lsh_auto", f, ne, candAuto, -1, tCandAuto)
      val (vSimAuto, tSimAuto) = timed { Dedup.simhashPairsAuto(docs).count() }
      emit("simhash_auto", f, nd, -1, vSimAuto, tSimAuto)

      // ANN top-5 recall vs brute force for 8 broadcast queries (the
      // sim_ann_topk shape). On weakly-clustered embeddings the per-table
      // hit probability for a ~0.3-cosine neighbor is (1 - θ/π)^bits ≈ 2%,
      // so recall scales with the TABLES knob: measure 4 and 8 tables
      // (the packed first-collision filter caps tables*bits at 64).
      val queries = emb.filter(col("vec_id") < 8)
      val brute = Residue.cut(Similarity.bruteForceTopK(emb, queries, 5)
        .select(col("query_id"), col("neighbor_id"))).df
      val nBrute = brute.count()
      Seq(4, 8).foreach { tables =>
        val (recall, tAnn) = timed {
          val ann = Similarity.hyperplaneTopK(emb, queries, 5,
            tables = tables, bits = 8)
            .select(col("query_id"), col("neighbor_id"))
          ann.intersect(brute).count().toDouble / nBrute
        }
        println(s"""{"family":"ann_topk_${tables}t","factor":$f,"n":$ne,""" +
          s""""recall_vs_brute":$recall,"sec":$tAnn}""")
      }
      // multi-probe: 4 tables + 1-bit-flip probes — recall bought on the
      // broadcast query side instead of corpus-side table replication
      val (recallMp, tMp) = timed {
        val ann = Similarity.hyperplaneTopKMultiProbe(emb, queries, 5,
          tables = 4, bits = 8)
          .select(col("query_id"), col("neighbor_id"))
        ann.intersect(brute).count().toDouble / nBrute
      }
      println(s"""{"family":"ann_multiprobe_4t","factor":$f,"n":$ne,""" +
        s""""recall_vs_brute":$recallMp,"sec":$tMp}""")
      // IVF: nprobe/nlist is the recall dial; cells shrink as n grows for
      // fixed nlist, so nlist must scale with n (same log-rule family)
      val (recallIvf, tIvf) = timed {
        val ann = Similarity.ivfTopK(emb, queries, 5, nlist = 16, nprobe = 4)
          .select(col("query_id"), col("neighbor_id"))
        ann.intersect(brute).count().toDouble / nBrute
      }
      println(s"""{"family":"ann_ivf_16c4p","factor":$f,"n":$ne,""" +
        s""""recall_vs_brute":$recallIvf,"sec":$tIvf}""")

      // Duplicated-span coverage (dedup_spans): the span-hash pass is
      // O(total tokens) by construction, so the scale question is the
      // join back to the >=2-doc hash set. The Caesar copies are
      // bijections on token hashes — cross-copy span collisions are
      // ~zero — so BOTH candidate rows (span occurrences landing in
      // duplicated hashes) and output docs must track corpus growth
      // linearly; a super-linear candidate count would mean the span
      // key space is saturating (same failure mode as the 8-bit LSH).
      import graft.functions.GraftFunctions.{tokenHashes, spanHashes}
      val spanRows = docs.select(col("doc_id"),
        explode(spanHashes(tokenHashes(col("text")), 8)).as("span_hash"))
      val (candSpan, tCandSpan) = timed {
        val dupHashes = spanRows.groupBy(col("span_hash"))
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select("span_hash")
        spanRows.join(dupHashes, Seq("span_hash")).count()
      }
      val (spanDocs, tSpan) = timed {
        Dedup.duplicatedSpanCoverage(docs, 8).count()
      }
      emit("span_coverage", f, nd, candSpan, spanDocs, tCandSpan + tSpan)

      // Chunk-level dedup (dedup_lines): chunk assembly is map-only, so
      // the scale driver is the min(struct)-per-chunk aggregation keyed
      // by chunk content. Caesar copies are character bijections, so
      // chunk strings map bijectively: intra-copy duplicate structure is
      // exactly the original's and cross-copy chunk collisions are ~zero
      // — dropped chunk instances and affected docs must both track
      // corpus growth linearly, or the chunk key space is saturating.
      val (chunkDropped, tChunk) = timed {
        Dedup.chunkDedup(docs, 8)
          .agg(sum(col("total_chunks") - col("kept_chunks")))
          .head.getLong(0)
      }
      val (chunkDocs, tChunkDocs) = timed {
        Dedup.chunkDedup(docs, 8).filter(col("kept_frac") < 1.0).count()
      }
      emit("chunk_dedup", f, nd, chunkDropped, chunkDocs, tChunk + tChunkDocs)

      // Incremental LSH (dedup_incr_lsh): a FIXED delta — the unreplicated
      // copy's %10 sample, identical at both factors — swept against the
      // growing corpus. The scale claim is that per-ingest cost tracks the
      // DELTA and its match set, never the corpus: the Caesar copies are
      // shingle bijections that cannot collide with the unshifted delta,
      // so candidate pairs must stay ~FLAT as the corpus grows 10x. Growth
      // here would mean the probe join is secretly corpus-shaped (the
      // failure the full-resweep design has by construction).
      val delta = docs.filter(col("doc_id") < idOffset && col("doc_id") % 10 === 0)
      val oldDocs = docs.filter(!(col("doc_id") < idOffset && col("doc_id") % 10 === 0))
      val (candIncr, tCandIncr) = timed {
        val dB = Residue.cut(
          Dedup.minhashBands(delta, n = 3, k = 16, bands = 4)).df
        val aB = Dedup.minhashBands(oldDocs, n = 3, k = 16, bands = 4)
          .unionByName(dB)
        dB.as("x").join(aB.as("y"),
            col("x.band") === col("y.band") &&
              col("x.band_key") === col("y.band_key") &&
              col("x.doc_id") =!= col("y.doc_id"))
          .select(least(col("x.doc_id"), col("y.doc_id")),
            greatest(col("x.doc_id"), col("y.doc_id")))
          .distinct().count()
      }
      val (verIncr, tVerIncr) = timed {
        Dedup.minhashLshPairsIncremental(oldDocs, delta,
          n = 3, k = 16, bands = 4, threshold = 0.5).count()
      }
      emit("incr_lsh_fixed_delta", f, nd, candIncr, verIncr,
        tCandIncr + tVerIncr)

      // Persisted-index sweep (dedup_incr_lsh_indexed): the same fixed
      // delta, but the corpus's bands come from the STORED index — built
      // OUTSIDE the timed region, exactly the production state where the
      // corpus was shingled once at ingest. The timed section is the whole
      // per-ingest cost (band delta + probe + verify + append-commit);
      // with the old-side re-banding gone it must grow far slower than
      // the corpus, and verified pairs must equal the recompute path's.
      val idx = new graft.sources.LshBandIndex(spark,
        TempDirs.create(s"graft-scale-lshidx$f"), n = 3, k = 16, bands = 4)
      idx.bootstrap(oldDocs)
      // steady-state layout: the index compacted to one bucketed table on
      // the probe key (maintenance cost, amortized outside the per-ingest
      // timings), so the stored side joins without an exchange
      idx.compact(buckets = 8)
      // probe-only row: the candidate stage against the STORED bands vs
      // the recompute path's tCandIncr (which re-bands the corpus every
      // run) — isolates the banding saving, since the end-to-end sweep's
      // wall is dominated by verifying this delta's 251k-pair match set
      val (candIdx, tCandIdx) = timed {
        val dB = Residue.cut(
          Dedup.minhashBands(delta, n = 3, k = 16, bands = 4)).df
        dB.as("x").join(idx.bandsDf.unionByName(dB).as("y"),
            col("x.band") === col("y.band") &&
              col("x.band_key") === col("y.band_key") &&
              col("x.doc_id") =!= col("y.doc_id"))
          .select(least(col("x.doc_id"), col("y.doc_id")),
            greatest(col("x.doc_id"), col("y.doc_id")))
          .distinct().count()
      }
      emit("incr_lsh_indexed_probe", f, nd, candIdx, -1, tCandIdx)
      val (verIdx, tIdx) = timed {
        var got = 0L
        idx.sweepAndAppend(docs, delta, threshold = 0.5) { p => got = p.count() }
        got
      }
      emit("incr_lsh_indexed", f, nd, candIncr, verIdx, tIdx)

      // Persisted inverted index (text_search/text_bm25): the index is
      // built and compacted OUTSIDE the timed region (the corpus is
      // tokenized once at ingest, ever). The timed rows are the QUERY
      // paths: a fixed conjunctive AND and a fixed BM25 top-k. Caesar
      // copies are letter bijections, so the query terms' postings come
      // only from the unshifted copy — posting volume is FLAT while the
      // corpus (and the index) grows 10x. A query whose wall tracks the
      // corpus here would mean the term filter is secretly scanning the
      // index instead of pruning to the query terms' row groups.
      // "candidates" = matching docs (must stay flat). The append row
      // times a fixed-delta ingest against the 10x index: per-ingest
      // cost must track the delta (tokenize + write), not the corpus.
      val invIdx = new graft.sources.InvertedIndex(spark,
        TempDirs.create(s"graft-scale-invidx$f"))
      invIdx.bootstrap(docs)
      invIdx.compact(buckets = 8)
      val (invHits, tInvProbe) = timed {
        invIdx.conjunctive(Seq("dup", "vector")).count()
      }
      emit("inverted_probe", f, nd, invHits, -1, tInvProbe)
      val (bmHits, tInvBm) = timed {
        invIdx.bm25(Seq("dup", "vector"), 15).count()
      }
      emit("inverted_bm25", f, nd, bmHits, -1, tInvBm)
      val invDelta = docs1.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(27L * idOffset)).as("doc_id"), col("text"))
      val (invAppended, tInvApp) = timed {
        invIdx.append(invDelta)
        invDelta.count()
      }
      emit("inverted_append", f, nd, invAppended, -1, tInvApp)

      // Lead-rarest skew claim, MEASURED (r8 verdict #6): a conjunctive
      // query pairing a stopword-grade term ("table", in ~78% of docs)
      // with a rare term ("dup", ~5%) over a corpus whose postings GROW
      // with the factor (plain-replicated text — the Caesar corpus above
      // keeps query-term postings flat by design, which would hide the
      // skew). "candidates" here = SHUFFLE RECORDS WRITTEN during the
      // query, captured by a task-metrics listener: the aggregation plan
      // shuffles every posting row of BOTH terms (hot-dominated, grows
      // ~f x), while the lead-rarest plan broadcasts the rarest-bounded
      // survivor set and streams the hot posting map-side — its shuffled
      // rows track the RARE posting. The committed rows are the proof the
      // hot posting stays unshuffled at 10x.
      val skewDocs = (0 until f).map(c =>
        docs1.select((col("doc_id") + lit(c * idOffset)).as("doc_id"),
          col("text"))).reduce(_ unionAll _)
      val skewIdx = new graft.sources.InvertedIndex(spark,
        TempDirs.create(s"graft-scale-skewidx$f"))
      skewIdx.bootstrap(skewDocs)
      skewIdx.compact(buckets = 8)
      val shuffleRecs = new java.util.concurrent.atomic.AtomicLong()
      val shuffleListener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) shuffleRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
      def measured(q: => Long): (Long, Long, Double) = {
        shuffleRecs.set(0L)
        spark.sparkContext.addSparkListener(shuffleListener)
        try {
          val (hits, sec) = timed(q)
          Thread.sleep(1000) // listener bus drains asynchronously
          (hits, shuffleRecs.get(), sec)
        } finally spark.sparkContext.removeSparkListener(shuffleListener)
      }
      val (aggHits, aggShuffled, tAgg) = measured {
        skewIdx.conjunctive(Seq("table", "dup")).count()
      }
      println(s"""{"family":"inverted_lead_skew_agg","factor":$f,"n":$nd,""" +
        s""""candidates":$aggShuffled,"verified":$aggHits,"sec":$tAgg}""")
      val (semiHits, semiShuffled, tSemi) = measured {
        skewIdx.conjunctiveLeadRarest(Seq("table", "dup")).count()
      }
      println(s"""{"family":"inverted_lead_skew_semi","factor":$f,"n":$nd,""" +
        s""""candidates":$semiShuffled,"verified":$semiHits,"sec":$tSemi}""")
      require(semiHits == aggHits,
        s"lead-rarest result diverged: $semiHits vs $aggHits")

      // The FULL indexed cleaning composition (corpus_clean_incr_indexed,
      // r7 verdict #4): quality/lang gate over the delta, exact-dedup
      // anti-join against the history's 8-byte fingerprint store, near-dup
      // probe of the PERSISTED compacted band index, admitted-docs report.
      // History-side state — the cleaned/sole'd history text, its
      // fingerprint store, the band index — is built OUTSIDE the timed
      // region, exactly the production state where the corpus was ingested
      // once, ever. The same fixed delta cleans against a 10x history:
      // verified pairs ("candidates" column) and admitted docs ("verified"
      // column) must stay ~flat (Caesar copies cannot near-dup or
      // fingerprint-collide with the unshifted delta), and the wall must
      // track the delta's match set — the probe stage corpus-independent
      // INSIDE the composition, not just in the isolated
      // incr_lsh_indexed_probe row.
      val srcCol = concat(lit("c"),
        (col("doc_id") / idOffset).cast("long").cast("string"))
      def gatedDocs(df: DataFrame) = graft.operators.TextAnalysis.stats(
          df.select(col("doc_id"), col("text"), srcCol.as("source")))
        .where(col("quality_score") >= 0.55 && col("lang_pred") =!= "und" &&
          col("n_tokens").between(5, 5000))
      val histSole = Residue.pin(gatedDocs(oldDocs)
        .groupBy(col("fingerprint"))
        .agg(min(struct(col("doc_id"), col("text"))).as("_r"))
        .select(col("fingerprint"), col("_r.doc_id").as("doc_id"),
          col("_r.text").as("text")))
      val histDir = TempDirs.create(s"graft-scale-cleanhist$f")
      val fpDir = TempDirs.create(s"graft-scale-cleanfp$f")
      histSole.select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(histDir)
      histSole.select(col("fingerprint")).write.mode("overwrite").parquet(fpDir)
      val cleanIdx = new graft.sources.LshBandIndex(spark,
        TempDirs.create(s"graft-scale-cleanidx$f"), n = 3, k = 16, bands = 4)
      cleanIdx.bootstrap(histSole.select(col("doc_id"), col("text")))
      cleanIdx.compact(buckets = 8)
      val histCount = histSole.count()
      val ((admitted, verClean), tCleanIncr) = timed {
        val deltaSole = Residue.cut(gatedDocs(delta)
          .join(spark.read.parquet(fpDir), Seq("fingerprint"), "left_anti")
          .groupBy(col("fingerprint"))
          .agg(min(struct(col("doc_id"), col("text"))).as("_r"))
          .select(col("_r.doc_id").as("doc_id"), col("_r.text").as("text"))).df
        val pairsDir = TempDirs.create(s"graft-scale-cleansweep$f")
        cleanIdx.sweepAndAppend(
          spark.read.parquet(histDir).unionByName(deltaSole),
          deltaSole, threshold = 0.8) { p =>
          p.write.mode("overwrite").parquet(pairsDir)
        }
        val pairs = spark.read.parquet(pairsDir)
        val nPairs = pairs.count()
        val adm = deltaSole.join(
            pairs.select(greatest(col("id_a"), col("id_b")).as("doc_id"))
              .distinct(),
            Seq("doc_id"), "left_anti").count()
        (adm, nPairs)
      }
      emit("clean_incr_indexed", f, histCount, verClean, admitted, tCleanIncr)

      // The FULL pipeline tail (pipeline_e2e_incr, r8 verdict #9): after
      // the gates/exact-dedup/LSH stages above, the SAME fixed delta also
      // passes the banned-term policy probe (inverted index bootstrapped
      // on the f x history — built OUTSIDE the timed region; the timed
      // probe reads only the admitted delta's own appended postings plus
      // the banned term's history posting), eval decontamination
      // (bloom-prefiltered 8-gram overlap vs a FIXED eval set — the eval
      // suite does not grow with the corpus), IVF semantic probe (frozen
      // reference centroids), temperature mix, and shard packing. Every
      // timed stage is delta- or probe-shaped; a wall that tracked f
      // would mean some stage secretly re-reads the history. "candidates"
      // = docs surviving the full chain, "verified" = packed shards.
      val pipeInv = new graft.sources.InvertedIndex(spark,
        TempDirs.create(s"graft-scale-pipeinv$f"))
      pipeInv.bootstrap(spark.read.parquet(histDir))
      pipeInv.compact(buckets = 8)
      val pipeIvf = new graft.sources.IvfIndex(spark,
        TempDirs.create(s"graft-scale-pipeivf$f"), nlist = 16)
      pipeIvf.bootstrap(emb1.filter(col("vec_id") % 10 =!= 0))
      val evalSet = Residue.pin(docs1.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), col("text")))
      val ((pipeSurv, pipeShards), tPipe) = timed {
        val deltaSole = Residue.cut(gatedDocs(delta)
          .join(spark.read.parquet(fpDir), Seq("fingerprint"), "left_anti")
          .groupBy(col("fingerprint"))
          .agg(min(struct(col("doc_id"), col("text"), col("source"),
            col("n_tokens"))).as("_r"))
          .select(col("_r.doc_id").as("doc_id"), col("_r.text").as("text"),
            col("_r.source").as("source"), col("_r.n_tokens").as("n_tokens"))).df
        val pairsDir = TempDirs.create(s"graft-scale-pipesweep$f")
        cleanIdx.sweepAndAppend(
          spark.read.parquet(histDir)
            .unionByName(deltaSole.select(col("doc_id"), col("text"))),
          deltaSole.select(col("doc_id"), col("text")),
          threshold = 0.8, runKey = s"pipe$f") { p =>
          p.write.mode("overwrite").parquet(pairsDir)
        }
        val admittedD = deltaSole.join(
          spark.read.parquet(pairsDir)
            .select(greatest(col("id_a"), col("id_b")).as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        pipeInv.appendBatch(admittedD.select(col("doc_id"), col("text")), 0L)
        val banned = pipeInv.conjunctive(Seq("dup")).select(col("doc_id"))
        val policed = admittedD.join(banned, Seq("doc_id"), "left_anti")
        val contaminated = Dedup.crossOverlapPairsBloom(
            policed.select(col("doc_id"), col("text")), evalSet,
            n = 8, minShared = 100L)
          .select(col("train_id").as("doc_id")).distinct()
        val decont = policed.join(contaminated, Seq("doc_id"), "left_anti")
        val deltaEmb = emb1.select(col("vec_id"), col("embedding"))
          .join(decont.select(col("doc_id").as("vec_id")), Seq("vec_id"))
        val semDrop = pipeIvf.topK(emb1.filter(col("vec_id") % 10 =!= 0),
            deltaEmb, k = 1, nprobe = 2)
          .filter(col("cosine") >= 0.3)
          .select(col("query_id").as("doc_id")).distinct()
        val surviving = decont.join(semDrop, Seq("doc_id"), "left_anti")
        val mixed = graft.operators.Sampling.temperatureMix(
          surviving.select(col("doc_id"), col("source"), col("n_tokens")),
          "source", col("doc_id"), alpha = 0.5)
        val shards = graft.operators.Packing.tokenShards(
            mixed.select(col("doc_id"), col("n_tokens").cast("long").as("n_tok")),
            "doc_id", "n_tok", 128L)
          .agg(countDistinct(col("shard_id")), count(lit(1))).head()
        (shards.getLong(1), shards.getLong(0))
      }
      emit("pipeline_e2e", f, histCount, pipeSurv, pipeShards, tPipe)

      // Persisted IVF index (sim_ivf_indexed): the per-ingest append
      // assigns a FIXED base-corpus delta against frozen centroids —
      // cost is delta × nlist multiplies and must stay ~flat as the
      // corpus grows, while a full bootstrap (the recompute shape the
      // index exists to avoid re-running) scales with the corpus. The
      // frozen seeds are the lowest old vec_ids, base-copy ids at every
      // factor, so both factors append against identical centroids. The
      // timed append is EXACTLY the ingest action (assign + write +
      // commit) — no corpus-sized read hides inside it. At rehearsal
      // scale wall-clock is codegen/job-overhead-dominated (measured:
      // nlist=256 triples the constant and still shows no growth), so
      // the SHAPE signal is the candidates column — rows assigned in
      // the timed region: bootstrap tracks the corpus (1,960 -> 19,960
      // at 10x), append is delta-constant (40 -> 40).
      val ivfDelta = emb.filter(col("vec_id") < idOffset &&
        col("vec_id") % 50 === 0)
      val ivfOld = emb.filter(!(col("vec_id") < idOffset &&
        col("vec_id") % 50 === 0))
      val nDelta = ivfDelta.count()
      val ivfIdx = new graft.sources.IvfIndex(spark,
        TempDirs.create(s"graft-scale-ivfidx$f"), nlist = 16)
      val (_, tIvfBoot) = timed { ivfIdx.bootstrap(ivfOld) }
      emit("ivf_indexed_bootstrap", f, ne, ne - nDelta, -1, tIvfBoot)
      val (_, tIvfAppend) = timed { ivfIdx.append(ivfDelta) }
      emit("ivf_indexed_append", f, ne, nDelta, -1, tIvfAppend)
      // Drift guard (ivf_drift): the per-ingest maintenance check that
      // gates every append — one map-only pass over the DELTA against the
      // O(nlist) frozen seeds plus a single aggregate row. Cost must be
      // delta-constant like the append itself ("candidates" = rows below
      // the floor): a guard that grew with the corpus would never be run,
      // and an unrun guard is how frozen-centroid indexes rot.
      val (driftBelow, tDrift) = timed {
        ivfIdx.driftReport(ivfDelta, cosineFloor = 0.22, maxFracBelow = 0.25)
          .select(col("n_below")).head.getLong(0)
      }
      emit("ivf_drift", f, ne, driftBelow, nDelta.toLong, tDrift)

      // Winnowing fingerprints (dedup_winnow): min-of-window selection
      // keeps ~2/(window+1) of span hashes, and the df<=50 prune bounds
      // any fingerprint's pair fan-out. Caesar copies are token-hash
      // bijections, so cross-copy fingerprint collisions are ~zero and
      // candidate pair rows (the operator's own equi-join input) must
      // track corpus growth linearly — super-linear growth would mean
      // fingerprint-space saturation or a df bound that stopped binding.
      val (candWin, tCandWin) = timed {
        val kept = Residue.cut(Dedup.winnowFingerprints(docs, spanLen = 8,
          window = 4, maxDf = 50)).df
        kept.as("x").join(kept.as("y"),
            col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
          .count()
      }
      val (verWin, tVerWin) = timed {
        Dedup.winnowPairs(docs, spanLen = 8, window = 4,
          minShared = 2, maxDf = 50).count()
      }
      emit("winnow", f, nd, candWin, verWin, tCandWin + tVerWin)

      // Triangle counting (graph_triangles): wedge volume is the join's
      // fan-out and the cost driver. Computed WITHOUT running the join —
      // wedges = sum over oriented heads of C(out_deg, 2) on the
      // operator's own orientation stage. Threshold 0.6 matches the
      // declared query: at 0.5 this corpus's template clusters form
      // 1000+-doc cliques where the triangle OUTPUT itself is cubic in
      // clique size (measured: 347M wedges / 313M triangles on 5k docs —
      // a property of the graph, no orientation can fix an output that
      // size; the dedup pipeline collapses such cliques BEFORE any
      // triangle pass at scale). At 0.6 cliques are genuine near-dups:
      // wedges and triangles must track corpus growth ~linearly, and
      // super-linear wedge growth would mean degree-ordering stopped
      // bounding a hub (the r5 failure mode under min-ID orientation).
      val (wedges, tWedge) = timed {
        val o = Graph.orientByDegree(
          Dedup.minhashLshPairs(docs, n = 3, k = 16, bands = 4,
            threshold = 0.6), "id_a", "id_b")
        o.groupBy(col("u")).agg(count(lit(1)).as("od"))
          .agg(sum(col("od") * (col("od") - 1) / 2).cast("long"))
          .head.getLong(0)
      }
      val (triCorners, tTri) = timed {
        Dedup.minhashLshPairs(docs, n = 3, k = 16, bands = 4, threshold = 0.6)
          .transform(Graph.triangleCounts(_))
          .agg(coalesce(sum(col("n_triangles")), lit(0L)).cast("long"))
          .head.getLong(0)
      }
      emit("triangles", f, nd, wedges, triCorners / 3, tWedge + tTri)

      // Semantic dedup (SemDeDup-style k-means prefilter): candidates are
      // within-cluster pairs, sum over clusters of C(sz,2). With FIXED k
      // the cells grow with n and candidates go quadratic — k is the
      // nlist-family sizing knob and must scale ~n/cellBudget. Measure
      // fixed k=8 at both factors (documents the failure) and a scaled k
      // at 10x (the operating rule). Threshold 0.6 (~4.8 sigma at d=64)
      // keeps the verified output itself off the random-cosine floor.
      def semCandidates(k: Int): Long =
        KMeans.assignFull(emb, k, iters = 2)
          .groupBy(col("cluster")).count()
          .agg(sum(col("count") * (col("count") - 1)).cast("long"))
          .head.getLong(0) / 2
      val (candSemF, tCandSemF) = timed(semCandidates(8))
      val (verSemF, tVerSemF) = timed {
        Dedup.semanticPairs(emb, 0.6, k = 8, iters = 2).count()
      }
      emit("semantic_k8_t06", f, ne, candSemF, verSemF, tCandSemF + tVerSemF)
      if (f > 1) {
        val kScaled = 8 * f
        val (candSemS, tCandSemS) = timed(semCandidates(kScaled))
        val (verSemS, tVerSemS) = timed {
          Dedup.semanticPairs(emb, 0.6, k = kScaled, iters = 2).count()
        }
        emit(s"semantic_k${kScaled}_t06", f, ne, candSemS, verSemS,
          tCandSemS + tVerSemS)
      }
      // Int8 vs float linear scan (sim_topk_int8): same 8 broadcast
      // queries, whole-corpus scoring — the int8 path's per-pair work is
      // one integer dot over d code bytes vs the float path's 4d bytes.
      // Both are linear scans, so both walls grow with the corpus; the
      // claim is the int8 path stays at-or-under the float path while
      // keeping recall (verified := hits in the brute top-5).
      val (int8Hits, tInt8) = timed {
        Similarity.int8TopK(emb, queries, 5, shortlist = 20)
          .select(col("query_id"), col("neighbor_id"))
          .intersect(brute).count()
      }
      emit("int8_scan", f, ne, nBrute, int8Hits, tInt8)

      // Connected components (dedup_clusters/leakage_split/kfold_split):
      // path-halving label propagation over the LSH near-dup graph. The
      // claim is O(log diameter) rounds with node-sized in-loop state —
      // Caesar copies are disjoint subgraphs, so components (verified)
      // must scale ~linearly with the corpus while edges (candidates)
      // track the pair volume, and wall growth stays far below the
      // edge-count growth (each round is one edge-sized join).
      val (compRows, tComp) = timed {
        val prs = Dedup.minhashLshPairs(docs, n = 3, k = 16, bands = 4,
          threshold = 0.6)
        val nEdges = prs.count()
        val comps = Dedup.nearDupClusters(prs)
          .select(countDistinct(col("cluster_id"))).head.getLong(0)
        (nEdges, comps)
      }
      emit("components", f, nd, compRows._1, compRows._2, tComp)

      // BPE round (bpe_merges/bpe_encode): one full train round — pair
      // count, winner pick, map-only kernel rewrite, token recount. Cost
      // must track corpus tokens ~linearly: the rewrite is a per-document
      // O(n) scan with no shuffle, and the pair aggregation's shuffle
      // carries distinct pairs, not occurrences. candidates := the
      // winning pair's count — the Caesar copies shift the top pair into
      // f disjoint variants that TIE at the 1x count (lexicographic
      // winner), so this column stays ~flat by design while n and sec
      // are the growth signals. verified := corpus tokens after.
      val (bpeRow, tBpe) = timed {
        graft.operators.TextAnalysis.bpeMergeRounds(docs, rounds = 1)
          .collect()(0)
      }
      emit("bpe_round", f, nd, bpeRow.getLong(3), bpeRow.getLong(4), tBpe)

      // DSIR (dsir_weights/dsir_apply_incr): fitting the B-row model is
      // one feature pass over the corpus — wall must track corpus size
      // ~linearly while the model stays B rows (candidates := model
      // rows, flat by construction). Applying a PERSISTED model to the
      // FIXED 1x delta slice must stay delta-shaped as the fitted corpus
      // grows 10x — the model is broadcast metadata, so the apply never
      // reads the history (verified := scored delta docs, flat).
      // PQ (sim_pq_topk): training is two passes (argmin projection +
      // cell-mean aggregation — the shuffle carries m*codes*subDim cells,
      // never vectors) and encoding is map-only, so both walls must track
      // the corpus ~linearly while the codebook stays m*codes driver rows.
      // candidates := trained codewords; verified := encoded vectors.
      val (pqBooks, tPqTrain) = timed {
        Similarity.pqTrain(emb, m = 8, codes = 256, iters = 2)
      }
      val (nEnc, tPqEnc) = timed {
        Similarity.pqEncode(emb, pqBooks, m = 8, codes = 256).count()
      }
      emit("pq_train", f, ne, pqBooks.size.toLong, ne, tPqTrain)
      emit("pq_encode", f, ne, pqBooks.size.toLong, nEnc, tPqEnc)

      // Persisted PQ (sim_pq_indexed): bootstrap pays train+encode over
      // the corpus ONCE (wall tracks corpus — the cost the index
      // amortizes), append encodes ONLY the fixed 1x delta against
      // frozen codebooks (must stay delta-shaped at 10x), and the probe
      // is the flat-ADC scan of STORED codes: its wall tracks the corpus
      // by design (linear ANN), but it re-trains and re-encodes NOTHING
      // — the r10 sim_pq_topk cost defect this index closes. The
      // composition that makes the probe corpus-flat is ivfpq_probe.
      val pqQueries = emb.filter(col("vec_id") < 8)
      val pqIdx = new graft.sources.PqIndex(spark,
        TempDirs.create(s"graft-scale-pqidx$f"), m = 8, codes = 256)
      val (_, tPqBoot) = timed { pqIdx.bootstrap(ivfOld) }
      emit("pq_indexed_bootstrap", f, ne, ne - nDelta, -1, tPqBoot)
      val (_, tPqApp) = timed { pqIdx.append(ivfDelta) }
      emit("pq_indexed_append", f, ne, nDelta, -1, tPqApp)
      val (pqHits, tPqProbe) = timed {
        pqIdx.topK(emb, pqQueries, 5, shortlist = 200).count()
      }
      emit("pq_indexed_probe", f, ne, ne, pqHits, tPqProbe)

      // IVF-PQ composition (sim_ivfpq_topk) — the 100 TB ANN shape:
      // nlist tracks the corpus (Sizing.ivfNlist, cellBudget 256), so
      // the ADC-scored candidate set per probe stays ~nprobe*cellBudget
      // rows INDEPENDENT of corpus growth — candidates := scored pairs,
      // the number that must stay ~flat at 10x while bootstrap (train +
      // assign + encode, paid once) tracks the corpus and append stays
      // delta-shaped. verified := exact-re-ranked result rows.
      val ivfpqNlist = Similarity.Sizing.ivfNlist(ne, cellBudget = 256)
      val ivfpqIdx = new graft.sources.IvfPqIndex(spark,
        TempDirs.create(s"graft-scale-ivfpq$f"),
        nlist = ivfpqNlist, m = 8, codes = 256)
      val (_, tIvfPqBoot) = timed { ivfpqIdx.bootstrap(ivfOld) }
      emit("ivfpq_bootstrap", f, ne, ne - nDelta, ivfpqNlist.toLong, tIvfPqBoot)
      val (_, tIvfPqApp) = timed { ivfpqIdx.append(ivfDelta) }
      emit("ivfpq_append", f, ne, nDelta, ivfpqNlist.toLong, tIvfPqApp)
      val ivfpqNprobe = math.min(8, ivfpqNlist) // declared point, clamped at 1x
      val (ivfpqCand, tIvfPqCand) = timed {
        ivfpqIdx.candidates(pqQueries, nprobe = ivfpqNprobe).count()
      }
      val (ivfpqHits, tIvfPqProbe) = timed {
        ivfpqIdx.topK(emb, pqQueries, 5, shortlist = 200, nprobe = ivfpqNprobe).count()
      }
      emit("ivfpq_probe", f, ne, ivfpqCand, ivfpqHits, tIvfPqCand + tIvfPqProbe)

      // ---- distributed batch probe (sim_ivf_batch, r15 — r14 verdict
      // #1): production retrieval batches are 10^4-10^6 queries, and
      // above IndexProbes.BroadcastRowLimit the driver holds only the
      // O(nlist) distinct cell ids — the probe frame (query embeddings
      // included) stays executor-side and candidate generation is a
      // cell-key shuffle join. Two claims measured against ONE
      // auto-sized store (nlist tracks the corpus, the same
      // Sizing.ivfNlist rule as ivfpq_probe): probe cost LINEAR in
      // |queries| (a 4x batch against the same store — compare the x1
      // and x4 rows' sec within a factor) and per-query cost FLAT
      // across the 1x/10x corpus (candidates/query ≈ nprobe·cellBudget
      // regardless of n — compare sec/|queries| across factors). Batch
      // ids live in a disjoint space (no self-exclusion), so every
      // query must return exactly k hits — require()d; the probe-row
      // count (|queries|·nprobe >= 8,000 at the smallest setting)
      // exceeds the 4,096 broadcast limit at EVERY setting, so all
      // four rows exercise the distributed path.
      val batchIdx = new graft.sources.IvfIndex(spark,
        TempDirs.create(s"graft-scale-ivfbatch$f"), nlist = ivfpqNlist)
      batchIdx.bootstrap(emb)
      val batchNprobe = math.min(4, ivfpqNlist)
      Seq(1, 4).foreach { reps =>
        val batchQueries = (0 until reps).map { r =>
          emb.select(
            (lit(1000000000000000L) + col("vec_id") * reps + lit(r.toLong))
              .as("vec_id"),
            col("embedding"))
        }.reduce(_ unionAll _)
        val nq = ne * reps
        val (batchHits, tBatch) = timed {
          batchIdx.topK(emb, batchQueries, 5, nprobe = batchNprobe).count()
        }
        require(batchHits == nq * 5,
          s"batch probe must serve every query: $batchHits of ${nq * 5}")
        emit(s"ivf_batch_probe_x$reps", f, ne, nq, batchHits, tBatch)
      }
      // the COMPOSITION's batch probe through the same threshold
      // machinery: each query carries an m×codes ADC table — the
      // heaviest per-query payload in the engine and the exact
      // driver-OOM hazard the r14 ADVICE named — so a corpus-sized batch
      // (|queries| = n, probe rows = n·nprobe >> the broadcast limit at
      // both factors) exercises the cached-frame shuffle join end to
      // end: ADC scoring, shortlist window, distributed exact re-rank.
      // r16: the probe frame now carries EMBEDDINGS (n·nprobe·~600 B);
      // the 16 KB tables are computed once per query streaming into the
      // shuffle-hash attach build and never persisted or shuffled — the
      // r15-era 16g single-JVM sizing note (a 2.6 GB cached table frame
      // at 10×) no longer applies; the default 8 g heap fits.
      val pqBatch = emb.select(
        (lit(1000000000000000L) + col("vec_id")).as("vec_id"),
        col("embedding"))
      val (pqBatchHits, tPqBatch) = timed {
        ivfpqIdx.topK(emb, pqBatch, 5, shortlist = 200,
          nprobe = ivfpqNprobe).count()
      }
      require(pqBatchHits == ne * 5,
        s"ivfpq batch probe must serve every query: $pqBatchHits of ${ne * 5}")
      emit("ivfpq_batch_probe_x1", f, ne, ne, pqBatchHits, tPqBatch)

      // ---- compaction (r13): the read-amplification axis. A store fed
      // by streaming ingest accumulates one dir per micro-batch; the
      // probe's scan cost then carries a per-fragment floor (listing,
      // footers, row groups interleaving all cells) that grows with
      // ingest HISTORY, not corpus size — invisible to the candidate
      // counts above. Measure the same probe against a 17-dir store
      // (bootstrap + 16 micro-batches) and against its compacted base:
      // candidates := parquet files scanned, verified := probe hits
      // (must be IDENTICAL — compaction folds dirs, never rows); the
      // fold row records files-before vs files-after and the fold cost.
      val cmpIdx = new graft.sources.IvfPqIndex(spark,
        TempDirs.create(s"graft-scale-ivfpqcmp$f"),
        nlist = ivfpqNlist, m = 8, codes = 256)
      cmpIdx.bootstrap(ivfOld)
      (0 until 16).foreach { i =>
        cmpIdx.appendBatch(
          ivfDelta.filter(pmod(col("vec_id"), lit(16)) === lit(i)), i.toLong)
      }
      val filesFrag = cmpIdx.rowsDf.inputFiles.length.toLong
      val (hitsFrag, tFrag) = timed {
        cmpIdx.topK(emb, pqQueries, 5, shortlist = 200, nprobe = ivfpqNprobe).count()
      }
      emit("ivfpq_compact_frag17", f, ne, filesFrag, hitsFrag, tFrag)
      val (_, tCompact) = timed { cmpIdx.compact(retireSuperseded = true) }
      val filesBase = cmpIdx.rowsDf.inputFiles.length.toLong
      val (hitsBase, tBase) = timed {
        cmpIdx.topK(emb, pqQueries, 5, shortlist = 200, nprobe = ivfpqNprobe).count()
      }
      require(hitsBase == hitsFrag,
        s"compaction changed probe results: $hitsFrag -> $hitsBase")
      emit("ivfpq_compact_base", f, ne, filesBase, hitsBase, tBase)
      emit("ivfpq_compact_fold", f, ne, filesFrag, filesBase, tCompact)

      // ---- ANN recall@k (r11 verdict #1) ----
      // The oracle replays declared arithmetic, so a degraded codebook
      // passes every correctness gate (the round-3 hyperplane lesson),
      // and volume rehearsals measure candidates, not QUALITY. Recall
      // here = |ANN top-k ∩ exact top-k| / k averaged over the 8 probe
      // queries, ground truth the exact scan, at 1x and 10x, sweeping
      // nprobe 1/4/8/16 and shortlist 20/100/200/400 (the r11 point,
      // the knee, the declared r12 point, and the buy-back point). The
      // declared operating point (codes=256, nprobe=8, shortlist=200)
      // carries the recall floor recorded in BASELINE.md — the
      // 20-shortlist rows document why the r11 point was retired
      // (recall ~0.45), the 400 rows where a 10x corpus's quantization
      // loss is bought back at query-side-only cost.
      def emitRecall(family: String, k: Int, n: Long,
                     recall: Double, sec: Double): Unit =
        println(s"""{"family":"$family","factor":$f,"n":$n,"k":$k,""" +
          s""""recall":${math.rint(recall * 1e4) / 1e4},"sec":$sec}""")
      val recallK = 5
      def topkSets(df: DataFrame): Map[Long, Set[Long]] =
        df.select(col("query_id"), col("neighbor_id"))
          .collect().groupBy(_.getLong(0))
          .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      def recallVs(exact: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
        val per = exact.map { case (q, ex) =>
          got.getOrElse(q, Set.empty[Long]).count(ex).toDouble / ex.size }
        per.sum / per.size
      }
      val exactBase = topkSets(Similarity.bruteForceTopK(emb, pqQueries, recallK))
      for (sl <- Seq(20, 100, 200, 400)) {
        val (r, t) = timed {
          recallVs(exactBase, topkSets(pqIdx.topK(emb, pqQueries, recallK, sl))) }
        emitRecall(s"recall_pq_s$sl", recallK, ne, r, t)
      }
      for (np <- Seq(1, 4, 8, 16); sl <- Seq(20, 100, 200, 400)) {
        val npc = math.min(np, ivfpqNlist)
        val (r, t) = timed {
          recallVs(exactBase,
            topkSets(ivfpqIdx.topK(emb, pqQueries, recallK, sl, nprobe = npc))) }
        emitRecall(s"recall_ivfpq_p${np}_s$sl", recallK, ne, r, t)
      }
      for (np <- Seq(1, 4, 8)) {
        val (r, t) = timed {
          recallVs(exactBase,
            topkSets(ivfIdx.topK(emb, pqQueries, recallK, nprobe = np))) }
        emitRecall(s"recall_ivf_p$np", recallK, ne, r, t)
      }

      // ---- executable operating-point re-validation (r12 verdict #2) —
      // the maintenance operator that REPLACES BASELINE.md's manual rule:
      // at each era (factor) it must re-derive a point that clears the
      // 0.9 floor from the same sweep grid the recall rows measure. At 1x
      // the declared r12 point (nprobe<=8, shortlist<=200) clears, so the
      // chosen point must be at most that; at 10x the capacity effect
      // pushes the choice toward the buy-back settings (shortlist 400 /
      // wider probe) — the chosen row IS the policy output, and
      // floor_cleared=false on it is the reseed signal. candidates :=
      // chosen nprobe, verified := chosen shortlist; the recall row
      // carries the chosen point's measured recall.
      val (revalRows, tReval) = timed {
        ivfpqIdx.revalidateOperatingPoint(emb, pqQueries, recallK,
            recallFloor = 0.9,
            nprobes = Seq(1, 4, 8, 16), shortlists = Seq(20, 100, 200, 400))
          .filter(col("chosen"))
          .select(col("phase"), col("nprobe"), col("shortlist"),
            col("recall"), col("floor_cleared"))
          .collect()
      }
      val revalSl = revalRows.find(_.getString(0) == "shortlist").get
      emit("ivfpq_revalidate", f, ne, revalSl.getInt(1).toLong,
        revalSl.getInt(2).toLong, tReval)
      emitRecall(s"ivfpq_revalidate_chosen_p${revalSl.getInt(1)}_s${revalSl.getInt(2)}",
        recallK, ne, revalSl.getDouble(3), tReval)

      // ---- CAPACITY-ADAPTIVE maintain (r13 verdict #2 — the failing
      // case to flip was the 10x era committing the sweep's widest
      // setting as its "validated" point). A store whose nlist was
      // frozen at bootstrap (here: the undersized 2-cell worst case a
      // naive deployment carries into growth) can only answer corpus
      // growth with probe width; maintain(cellBudget>0) must read a
      // sweep that clears ONLY at the full coarse scan as a CAPACITY
      // signal, rebuild at Sizing.ivfNlist(n), and re-commit a point
      // with nprobe < nlist — a real pruned probe at every era.
      // candidates := grown nlist, verified := chosen nprobe; the
      // recall row names action/nprobe/nlist so the claim is in the row.
      val growIdx = new graft.sources.IvfPqIndex(spark,
        TempDirs.create(s"graft-scale-grow$f"), nlist = 2, m = 8, codes = 256)
      growIdx.bootstrap(ivfOld)
      growIdx.append(ivfDelta)
      val (growM, tGrow) = timed {
        growIdx.maintain(emb, ivfDelta, pqQueries, k = recallK,
          recallFloor = 0.9, cosineFloor = 0.22, maxFracBelow = 1.0,
          nprobes = Seq(1, 4, 8, 16), shortlists = Seq(20, 100, 200, 400),
          reseedDir = Some(TempDirs.create(s"graft-scale-grown$f")),
          cellBudget = 256)
      }
      val gr = growM.report.collect().head
      val (gAction, gNlist, gNp, gRecall) = (gr.getAs[String]("action"),
        gr.getAs[Int]("nlist"), gr.getAs[Int]("nprobe"), gr.getAs[Double]("recall"))
      require(gAction == "grow" && gNp < gNlist,
        s"capacity maintain failed to grow past the frozen 2-cell store " +
          s"or committed a non-pruning point: action=$gAction np=$gNp nlist=$gNlist")
      emit("ivfpq_maintain_grow", f, ne, gNlist.toLong, gNp.toLong, tGrow)
      emitRecall(s"ivfpq_maintain_${gAction}_p${gNp}_nl$gNlist",
        recallK, ne, gRecall, tGrow)

      // ---- IVF-PQ reseed recovery on a SHIFTED delta (r11 verdict #5)
      // A genuinely drifted family: rotation by Dim/2 (outside the
      // replica set's 0..factor-1 rotations), so shifted vectors are
      // ~orthogonal to every old seed AND mis-modeled by the old
      // codebooks. Id remap is the fixture's seed-coverage device: base
      // ids go EVEN, shifted ids ODD, so the engine's deterministic
      // lowest-vec_id seed rule gives the OLD index pure-base seeds and
      // the RE-SEEDED index an alternating mix of both families — the
      // deterministic stand-in for re-sampling seeds from the combined
      // corpus. Expected: old-lineage probe recall on shifted queries
      // collapses (wrong cells, wrong codebooks); after reseedInto
      // (seeds AND codebooks retrained on combined) it recovers, at the
      // same probe cost shape.
      val half = Similarity.Dim / 2
      val rsBase = emb.select((col("vec_id") * 2).as("vec_id"), col("embedding"))
      val rsShift = emb.select((col("vec_id") * 2 + 1).as("vec_id"),
        concat(slice(col("embedding"), half + 1, Similarity.Dim - half),
          slice(col("embedding"), 1, half)).as("embedding"))
      val rsDir = TempDirs.create(s"graft-scale-rs$f")
      rsBase.write.mode("overwrite").parquet(s"$rsDir/base")
      rsShift.write.mode("overwrite").parquet(s"$rsDir/shift")
      val rsB = spark.read.parquet(s"$rsDir/base")
      val rsS = spark.read.parquet(s"$rsDir/shift")
      val rsAll = spark.read.parquet(s"$rsDir/base", s"$rsDir/shift")
      val rsQueries = rsS.filter(col("vec_id") < 16) // 8 shifted queries
      val rsOldIdx = new graft.sources.IvfPqIndex(spark,
        TempDirs.create(s"graft-scale-rsold$f"),
        nlist = ivfpqNlist, m = 8, codes = 256)
      rsOldIdx.bootstrap(rsB)
      rsOldIdx.append(rsS) // frozen-structure ingest of the drifted mass
      val rsDrift = rsOldIdx.driftReport(rsS, cosineFloor = 0.22,
        maxFracBelow = 0.25).head()
      emit("ivfpq_reseed_drift", f, 2 * ne, rsDrift.getLong(1),
        rsDrift.getLong(0), 0.0) // candidates := n_below, verified := n
      val exactShift = topkSets(Similarity.bruteForceTopK(rsAll, rsQueries, recallK))
      val (rOld, tOld) = timed {
        recallVs(exactShift,
          topkSets(rsOldIdx.topK(rsAll, rsQueries, recallK, 200, nprobe = 4))) }
      emitRecall("ivfpq_reseed_old", recallK, 2 * ne, rOld, tOld)
      val rsNew = rsOldIdx.reseedInto(TempDirs.create(s"graft-scale-rsnew$f"),
        rsAll, nlist = Similarity.Sizing.ivfNlist(2 * ne, cellBudget = 256))
      val (rNew, tNew) = timed {
        recallVs(exactShift,
          topkSets(rsNew.topK(rsAll, rsQueries, recallK, 200, nprobe = 4))) }
      emitRecall("ivfpq_reseed_new", recallK, 2 * ne, rNew, tNew)

      val dsirTgt = pmod(col("doc_id"), lit(5)) === 0
      val mDir = TempDirs.create(s"graft-scale-dsir$f")
      val (mRows, tFit) = timed {
        val m = graft.operators.Sampling.dsirModel(docs, dsirTgt, 2048)
        m.write.mode("overwrite").parquet(mDir)
        spark.read.parquet(mDir).count()
      }
      emit("dsir_fit", f, nd, mRows, nd, tFit)
      val dsirDelta = docs.filter(
        col("doc_id") < idOffset && col("doc_id") % 50 === 0)
      val storedModel = spark.read.parquet(mDir)
      val (nScored, tApply) = timed {
        graft.operators.Sampling.dsirApply(dsirDelta, storedModel, 2048).count()
      }
      emit("dsir_apply", f, nd, mRows, nScored, tApply)
      // dsir_select_incr: Gumbel-top-k over the persisted model on the
      // FIXED 1x delta — selection cost must stay delta-shaped as the
      // fitted corpus grows 10x (score the delta + TakeOrdered k; the
      // model is broadcast metadata, the history is never read)
      val (nSel, tSel) = timed {
        graft.operators.Sampling
          .dsirSelectApplied(dsirDelta, storedModel, 2048, k = 20).count()
      }
      emit("dsir_select_incr", f, nd, mRows, nSel, tSel)

      // Frozen-vocab BPE (bpe_encode_incr): fit learns the 3 merges over
      // the corpus (wall tracks corpus — training is inherently
      // full-pass), encoding the FIXED 1x delta folds the frozen rules
      // map-only and must stay delta-shaped at 10x — zero pair-count
      // shuffles, no dependence on the fitted corpus's size.
      // candidates := merge rules; verified := encoded delta docs.
      val bpeVocab = new graft.sources.BpeVocabStore(spark,
        TempDirs.create(s"graft-scale-bpevocab$f"), rounds = 3)
      val (_, tBpeFit) = timed { bpeVocab.fit(docs) }
      val incrDelta = docs.filter(
        col("doc_id") < idOffset && col("doc_id") % 50 === 0)
      val (nBpeEnc, tBpeEnc) = timed { bpeVocab.encode(incrDelta).count() }
      emit("bpe_vocab_fit", f, nd, 3L, nd, tBpeFit)
      emit("bpe_encode_frozen", f, nd, 3L, nBpeEnc, tBpeEnc)

      // Persisted bigram LM (lm_perplexity_incr): fit aggregates the
      // corpus bigram stream once (wall tracks corpus); scoring the
      // FIXED 1x delta joins its bigrams against the STORED table.
      // candidates := vocabulary size V — the Caesar replicas multiply
      // vocab ~f x by design, so the score wall's growth component
      // exposes the LM-table scan (distinct-bigram-bounded), never a
      // corpus re-read; verified := scored delta docs (flat).
      val lmStore = new graft.sources.LmStore(spark,
        TempDirs.create(s"graft-scale-lm$f"))
      val (_, tLmFit) = timed { lmStore.fit(docs) }
      val (nLmScored, tLmScore) = timed { lmStore.scoreDelta(incrDelta).count() }
      emit("lm_fit", f, nd, lmStore.vocabSize, nd, tLmFit)
      emit("lm_score_frozen", f, nd, lmStore.vocabSize, nLmScored, tLmScore)

      // Hybrid RRF (hybrid_search_rrf): both arms are top-30 lists, so
      // the fusion joins 30x30 rows REGARDLESS of corpus growth — the
      // wall tracks the arms (pruned posting scan + linear vector scan),
      // and the fused row count (verified) must stay exactly k at 10x.
      val (nFused, tHybrid) = timed {
        val tArm = graft.operators.HybridSearch.rankArm(
          invIdx.bm25(Seq("dup", "vector"), 30), col("score"), "r_text")
        val vArm = Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") === 0), 30)
          .select(col("neighbor_id").as("doc_id"), col("rank").as("r_vec"))
        graft.operators.HybridSearch.rrf2(tArm, vArm, k = 20).count()
      }
      emit("hybrid_rrf", f, nd, 60L, nFused, tHybrid)

      // Hybrid RRF with the ANN arm (the scale path): identical fusion,
      // but the vector arm probes the PERSISTED IvfIndex (nprobe cells)
      // instead of scanning the corpus — the hybrid's wall must go
      // probe-bound while the brute-arm variant above stays linear in
      // the corpus. Same k-bounded fusion either way.
      val (nFusedIvf, tHybridIvf) = timed {
        val tArm = graft.operators.HybridSearch.rankArm(
          invIdx.bm25(Seq("dup", "vector"), 30), col("score"), "r_text")
        val vArm = ivfIdx
          .topK(emb, emb.filter(col("vec_id") === 0), 30, nprobe = 4)
          .select(col("neighbor_id").as("doc_id"), col("rank").as("r_vec"))
        graft.operators.HybridSearch.rrf2(tArm, vArm, k = 20).count()
      }
      emit("hybrid_rrf_ivf", f, nd, 60L, nFusedIvf, tHybridIvf)

      // Hybrid RRF with the IVF-PQ arm (hybrid_search_rrf_ivfpq — the
      // 100 TB refinement, r12 verdict #5): the vector arm ADC-scores
      // m-byte codes for the probed cells' members and reads full-width
      // floats only for the shortlist re-rank. candidates := the arm's
      // ADC-scored pair count for the single query — must stay ~flat at
      // 10x (nlist tracks n), while the flat-IVF arm above re-reads
      // full-width vectors for the same candidate set. verified := fused
      // rows, exactly k.
      val q0 = emb.filter(col("vec_id") === 0)
      val ivfpqArmCand = ivfpqIdx.candidates(q0, nprobe = ivfpqNprobe).count()
      val (nFusedPq, tHybridPq) = timed {
        val tArm = graft.operators.HybridSearch.rankArm(
          invIdx.bm25(Seq("dup", "vector"), 30), col("score"), "r_text")
        val vArm = ivfpqIdx
          .topK(emb, q0, 30, shortlist = 200, nprobe = ivfpqNprobe)
          .select(col("neighbor_id").as("doc_id"), col("rank").as("r_vec"))
        graft.operators.HybridSearch.rrf2(tArm, vArm, k = 20).count()
      }
      emit("hybrid_rrf_ivfpq", f, nd, ivfpqArmCand, nFusedPq, tHybridPq)

      // ---- BATCH hybrid (hybrid_batch_rrf, r16 — r15 verdict #7):
      // both arms and the fusion batch-shaped for |queries| = n·reps.
      // The vector arm rides the auto-sized store's distributed probe
      // (probe rows >> the broadcast limit at every setting); the text
      // arm is the per-query BM25 with the SALTED term join — term keys
      // are low-cardinality, so the unsalted join measured 223 s on two
      // tasks for the 10k-query declared batch. Two claims: cost LINEAR
      // in |queries| (x1 vs x4 at factor 1), and per-query cost ~FLAT
      // across the 1x/10x corpus — the text arm's work is posting-
      // length-bound, not corpus-bound (the probed terms live only in
      // the unshifted replica, so their postings do NOT grow with the
      // corpus and the pruned scan never reads the rest), and the
      // vector arm's candidates/query track nprobe·cellBudget. Every
      // query must fuse exactly k rows — require()d. The x4 batch runs
      // at factor 1 only (the x-scaling claim needs one factor; at 10x
      // the x1 row already measures 10x the queries).
      val hybridReps = if (f == 1) Seq(1, 4) else Seq(1)
      hybridReps.foreach { reps =>
        val nq = ne * reps
        val hq = (0 until reps).map { r =>
          emb.select(
            (lit(2000000000000000L) + col("vec_id") * reps + lit(r.toLong))
              .as("vec_id"),
            col("embedding"))
        }.reduce(_ unionAll _)
        val (nFusedBatch, tHybridBatch) = timed {
          val qt = hq.select(col("vec_id").as("query_id"))
            .withColumn("term", explode(array(lit("dup"), lit("vector"))))
          val tArm = graft.operators.HybridSearch.rankArmBatch(
            invIdx.bm25Batch(qt, 30), col("score"), "r_text")
          val vArm = batchIdx.topK(emb, hq, 30, nprobe = batchNprobe)
            .select(col("query_id"), col("neighbor_id").as("doc_id"),
              col("rank").as("r_vec"))
          graft.operators.HybridSearch.rrf2Batch(tArm, vArm, k = 20).count()
        }
        require(nFusedBatch == nq * 20,
          s"batch hybrid must fuse k rows per query: $nFusedBatch of ${nq * 20}")
        emit(s"hybrid_batch_x$reps", f, nq, 60L * nq, nFusedBatch, tHybridBatch)
      }

      // one factor's materializations must not contaminate the next
      // factor's timings — same per-run hygiene as Bench
      Residue.drain(spark)
    }
    spark.stop()
  }
}
