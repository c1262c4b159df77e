package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Training-data pipeline queries over the driver's parquet tables
  * (`documents`, `embeddings`, `events`, `lineitem`, …) — the
  * capability-extension operator set of SURVEY.md §2.7, built out to
  * the full list the 100 TB north star mandates: dedup (exact, MinHash
  * LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search
  * (brute-force + IVF), text analysis, windowed/sessionized events,
  * and multimodal binary plumbing.
  *
  * Each Spark plan pairs with a DuckDB oracle computing the same
  * semantics; integer outputs are exact, float outputs go through the
  * shared floor-rounding or exact DECIMAL sums (see
  * [[graft.pipeline.Events]]).
  */
object PipelineQueries {

  /** Adaptive scan spread (optimization guide §2.5, input skew: "one
    * huge unsplittable file … repartition immediately after the
    * read"): the gate/bench corpora arrive as ONE single-row-group
    * parquet file each, so every corpus-pass map stage (tokenize,
    * shingle, md5) would otherwise run as ONE task however many cores
    * the session has — measured 2.9 s single-task tokenize+hash walls
    * on a 32-core local[32] bench. When the scan's natural split count
    * is below the session's parallelism, ONE round-robin exchange of
    * the small unsplittable input spreads the downstream work; with
    * real inputs (many files / row groups ⟹ splits ≥ cores) the
    * condition is false and the plan is untouched — this never adds an
    * exchange at scale. Results are invariant to the re-partitioning:
    * every consumer is declarative (agg/join/window with total-order
    * ties) or an order-independent exact accumulator, and the two
    * spark_partition_id users are local-prefilter top-k patterns whose
    * global re-rank is partition-invariant. */
  private def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  /** [[docs]] + [[spread]] — OPT-IN per consumer after the r16
    * interleaved A/Bs: the exchange costs ~0.3-0.5 s at gate scale
    * (one producer task serializes the text corpus) and only pays for
    * itself when the downstream per-row work is a heavy single-task
    * wall (5-gram shingling, signature computation, span hashing:
    * q_dupspan 4.11 → 1.16 s, q_simhash_neardup 3.08 → 0.99,
    * q_minhash_sig 1.51 → 0.66). Blanket-spreading every docs()
    * consumer (the first r16 attempt) was a measured net LOSS — ~45
    * light/multi-reference queries each paid the exchange (and
    * re-paid it per plan reference: q_ngram_jaccard_capped 3.28 →
    * 5.50 s, q_decontam_bloom 1.34 → 3.03, q_vocab_topk 0.32 → 0.83)
    * for parallelism their scan-side work never uses. embeddings/
    * events are likewise never spread (q_embedding_robust_stats
    * 2.9 → 4.7 s when tried). */
  private def docsSpread(s: SparkSession, dir: String): DataFrame =
    spread(docs(s, dir))
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  /** Events table, `ts` normalized to micro-precision TimestampType
    * regardless of which encoding the generator used (see
    * [[graft.pipeline.Events.load]]); the oracle's
    * `epoch_ns(ts) // 1000` truncation is equally encoding-agnostic. */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Events.load(s, dir)

  private val evCte =
    """SELECT event_id, user_id, event_type, value,
      make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events"""

  // ---- scale-adaptive oracle shards (r11 verdict #4) ---------------
  //
  // Ten contract queries are gated by deliberately QUADRATIC oracle
  // constructions (brute all-pairs cosine, recursive-closure dedup,
  // LSH/n-gram pair verification over clone-heavy corpora, recursive
  // greedy packing): declarative statements of semantics, not engine
  // paths. At the gate/bench scales they replay in seconds, but at
  // sf1.0+ the DuckDB side goes 57 s to 53 min (and past a 10-minute
  // cap at sf10 for the two r13 additions, q_dedup_minhash and
  // q_ngram_jaccard) while the engine answers in seconds — so scale
  // sweeps couldn't run fully inside
  // check_oracle. Fix: those queries (ten at r11; the audio pair
  // joined at r15 — per-doc-linear but unnest-volume-bound in DuckDB)
  // restrict their input, BOTH engines identically, to a
  // deterministic shard whose MODULUS
  // adapts to the data: ceil(rowcount / cap) with cap = the sf0.1 row
  // count. At every scale up to and including the bench scale the
  // modulus is 1 — no filter on the Spark side (plans and pins
  // untouched), a tautological WHERE on the SQL side — and results
  // are bit-identical to the unsharded queries. Past that, the shard
  // holds the oracle's effective input at ≈ sf0.1 size (quadratic
  // work capped), while the queries keep exercising the full engine
  // path on real data. The modulus derives from count(*) in BOTH
  // engines (integer ceil over the same table), so the two sides can
  // never disagree about the shard.

  private val docShardCap = 5000L // = the sf0.1 documents row count
  private val embShardCap = 2000L // = the sf0.1 embeddings row count

  // The DOCUMENT shard keeps doc_id RANGES (blocks of docShardCap
  // contiguous ids, every m-th block), not strides (r14 verdict #3):
  // the generator's planted near-dup pairs live WITHIN a source copy
  // (measured id distance up to ~0.86 × the corpus span — clustered
  // by copy, not tightly adjacent), so a stride shard at modulus m
  // keeps 1-in-m docs but ~0 planted pairs — the sharded dedup
  // oracles at sf10/sf100 agreed on an empty relation (0 = 0,
  // vacuous). The block is sized to the FULL sf0.1 id span (5000):
  // under the key-shift synthesis every kept block is exactly one
  // source copy, so the complete within-copy pair relation survives
  // at sf0.1 density — 1000-id sub-blocks were tried first and lost
  // the long-range pairs (q_ngram_jaccard's ~1-in-500-docs pairs all
  // straddled sub-block boundaries). At modulus 1 (every scale ≤
  // sf0.1) the predicate is a tautology on both engines — results
  // and plans bit-identical to the unsharded form.
  private val docShardBlock = 5000L

  private def shardModulus(n: Long, cap: Long): Long = (n + cap - 1) / cap

  /** Modulus cache keyed by table path: the count that derives the
    * shard modulus is a property of the (static) input snapshot, not of
    * the query, so computing it once per (path, JVM) is enough — without
    * this every sharded query construction (including plan-only audits
    * that never execute the query) re-ran a full-table count job
    * (r12 advice #4). */
  private val shardModCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def cachedModulus(d: DataFrame, path: String, cap: Long): Long =
    shardModCache.computeIfAbsent(s"$path#$cap", _ => shardModulus(d.count(), cap))

  /** `documents` restricted to the adaptive shard (identity below the
    * cap — no filter node, so plan pins are untouched). */
  private def docsSharded(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val m = cachedModulus(d, s"$dir/documents.parquet", docShardCap)
    if (m > 1) d.filter(s"(doc_id div $docShardBlock) % $m = 0") else d
  }

  /** [[docsSharded]] + [[spread]] — the MinHash/n-gram dedup chain's
    * shingle walls are the heavy single-task regime the spread exists
    * for (A/B: q_dedup_minhash 2.26 → 2.04 s, q_ngram_jaccard 1.74 →
    * 1.36); the light docsSharded consumers (audio decode, packing)
    * measured the exchange as a loss and stay unspread. */
  private def docsShardedSpread(s: SparkSession, dir: String): DataFrame =
    spread(docsSharded(s, dir))

  private def embSharded(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val m = cachedModulus(e, s"$dir/embeddings.parquet", embShardCap)
    if (m > 1) e.filter(s"vec_id % $m = 0") else e
  }

  /** The same shard as a DuckDB predicate — the modulus is a scalar
    * subquery over the same table, so it equals the Spark side's
    * driver-computed value by construction. */
  private val docShardSql =
    s"(doc_id // $docShardBlock) % (SELECT (count(*) + ${docShardCap - 1}) // $docShardCap FROM documents) = 0"
  private val embShardSql =
    s"vec_id % (SELECT (count(*) + ${embShardCap - 1}) // $embShardCap FROM embeddings) = 0"

  // ---- scale-adaptive ANN probe stride (r13 verdict #1/#3) ---------
  //
  // Every in-query ANN fixture used `vec_id % 50 = 0` as its probe
  // set — probes grew WITH the corpus, so probes × per-probe candidate
  // volume made the whole family quadratic at scale (sf10: q_ann_pq_mp
  // 1,485 s, q_ann_pq 853 s, and q_ann_topk's oracle 2,914 s — the one
  // query that couldn't climb the ladder). The serving DESIGN was
  // never the problem (a production index answers a bounded query
  // stream, not "2% of the corpus queries itself"); the fixture's
  // probe count was. Fix: the probe STRIDE scales with the same
  // adaptive shard modulus as [[embSharded]] — stride = 50 × modulus —
  // so the probe set stays ≈ 40 vectors at every rung while the INDEX
  // side keeps covering the full corpus (training, cell assignment,
  // candidate scans all remain corpus-scale; total work goes linear).
  // At every scale up to and including the bench sf0.1 the modulus is
  // 1, the predicate is literally `vec_id % 50 = 0`, and plans,
  // results, and exchange pins are bit-identical to r13.
  //
  // Both engines derive the stride from count(*) over the same table
  // (integer ceil), so they can never disagree about the probe set.

  private def annProbePred(s: SparkSession, dir: String): String = {
    val m = cachedModulus(emb(s, dir), s"$dir/embeddings.parquet", embShardCap)
    s"vec_id % ${50L * m} = 0"
  }

  /** The same stride as a DuckDB predicate over probe id column `c`
    * (scalar-subquery modulus, the [[embShardSql]] pattern). */
  private def annProbeSql(c: String): String =
    s"$c % (50 * (SELECT (count(*) + ${embShardCap - 1}) // $embShardCap FROM embeddings)) = 0"

  // ---- shared DuckDB fragments (same semantics as TextOps exprs) ----

  private val tokCte =
    "SELECT doc_id, source, text, string_split_regex(trim(text), '\\s+') AS tokens FROM documents"

  /** [[tokCte]] over the adaptive document shard — the base CTE of the
    * recursive-closure dedup oracles. */
  private val tokShardCte = s"$tokCte WHERE $docShardSql"

  private def sh(n: Int) =
    s"""SELECT DISTINCT doc_id, source, unnest(list_transform(
        generate_series(0, len(tokens) - $n),
        i -> array_to_string(list_slice(tokens, i + 1, i + $n), ' '))) AS s
      FROM tok WHERE len(tokens) >= $n"""

  private def hits(words: Seq[String]) =
    s"CAST(len(list_filter(tokens, t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS INTEGER)"

  private def h60(e: String) = s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  private def r9(e: String) = s"floor(($e) * 1.0e9 + 0.5e0) / 1.0e9"

  /** Per-process sketch-snapshot directory for the persistence-cycle
    * queries — same per-PID + dead-orphan housekeeping as the G8
    * weight-file round-trips (RegridQueries.weightsIoPath): concurrent
    * JVMs must not race on one file, and the no-clobber writer must
    * never see a same-PID leftover from a prior invocation. */
  private def sketchIoPath(s: SparkSession): String = {
    val dir = "/root/repo/target/sketch_io"
    val self = ProcessHandle.current().pid()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val re = "snap_(\\d+)".r
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      f.getName match {
        case re(pid) if pid.toLong == self ||
            !ProcessHandle.of(pid.toLong).isPresent =>
          fs.delete(new org.apache.hadoop.fs.Path(f.getPath), true)
        case _ => ()
      }
    }
    s"$dir/snap_$self"
  }

  /** Per-process catalog table name for q_ann_pq_persisted's bucketed
    * code relation, with dead-orphan sweeping over the warehouse
    * directory (same discipline as [[sketchIoPath]]): concurrent JVMs
    * get distinct tables, dead PIDs' leftovers are reaped, and
    * AnnIO.save's own stale-location clearing handles the same-PID
    * repeat invocation. */
  private def perPidTable(s: SparkSession, prefix: String): String = {
    val self = ProcessHandle.current().pid()
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val re = (java.util.regex.Pattern.quote(prefix) + "(\\d+)").r
    Option(new java.io.File(wh).listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach { f =>
        f.getName match {
          case re(pid) if !ProcessHandle.of(pid.toLong).isPresent =>
            val p = new org.apache.hadoop.fs.Path(f.getPath)
            p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
          case _ => ()
        }
      }
    s"$prefix$self"
  }

  private def annPqTable(s: SparkSession): String =
    perPidTable(s, "graft_annpq_codes_")

  private def annPqfTable(s: SparkSession): String =
    perPidTable(s, "graft_annpqf_codes_")

  /** Count-Min point-estimate oracle, shared VERBATIM by
    * q_cm_frequency (direct full-corpus sketch) and q_cm_merge (two
    * persisted snapshot sketches, elementwise-summed) — counters are
    * linear, so the two plans must be result-identical, and one SQL
    * string makes the gate prove exactly that (the asofOracleSql
    * precedent). */
  private lazy val cmFrequencyOracleSql: String = {
    val probeVals = TextOps.langMarkers.flatMap(_._2).distinct.sorted
      .map(w => s"('$w')").mkString(", ")
    def bucket(tok: String) =
      Sketches.cmBucketSql(s"md5($tok)", "r.r", 1024)
    s"""WITH tok AS ($tokCte),
      t AS (SELECT unnest(tokens) AS token FROM tok),
      probes(token) AS (VALUES $probeVals),
      r(r) AS (VALUES (0), (1), (2), (3)),
      sk AS (SELECT r.r AS r, ${bucket("t.token")} AS c,
          CAST(count(*) AS BIGINT) AS cnt
        FROM t CROSS JOIN r GROUP BY 1, 2),
      pe AS (SELECT p.token, min(coalesce(sk.cnt, 0)) AS est_cm
        FROM probes p CROSS JOIN r
        LEFT JOIN sk ON sk.r = r.r AND sk.c = ${bucket("p.token")}
        GROUP BY 1),
      ex AS (SELECT token, CAST(count(*) AS BIGINT) AS n_exact
        FROM t WHERE token IN (SELECT token FROM probes) GROUP BY 1)
      SELECT pe.token, coalesce(ex.n_exact, 0) AS n_exact, pe.est_cm
      FROM pe LEFT JOIN ex ON ex.token = pe.token
      ORDER BY pe.token"""
  }

  /** Bloom decontamination oracle, shared VERBATIM by q_decontam_bloom
    * (filter built from the whole eval set) and q_bloom_merge (filter
    * distinct-unioned from two persisted snapshot bit files) — a Bloom
    * filter is a set of positions, so the two plans must be
    * result-identical, and one SQL string makes the gate prove it. */
  private lazy val bloomDecontamOracleSql: String = {
    val m = 65536; val k = 3
    def bucket(e: String) = Sketches.cmBucketSql(s"md5($e)", "r.r", m)
    s"""WITH tok AS ($tokCte), sh5 AS (${sh(5)}),
      r(r) AS (VALUES (0), (1), (2)),
      ev AS (SELECT DISTINCT s FROM sh5 WHERE $evalPred),
      bits AS (SELECT DISTINCT ${bucket("ev.s")} AS pos
        FROM ev CROSS JOIN r),
      tr AS (SELECT DISTINCT doc_id, s FROM sh5 WHERE NOT ($evalPred)),
      pp AS (SELECT tr.doc_id, tr.s, r.r, ${bucket("tr.s")} AS pos
        FROM tr CROSS JOIN r),
      hit AS (SELECT doc_id, s, count(bits.pos) AS nset
        FROM pp LEFT JOIN bits ON bits.pos = pp.pos
        GROUP BY 1, 2)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_maybe
      FROM hit WHERE nset = $k
      GROUP BY 1 ORDER BY doc_id"""
  }

  /** Backward-inclusive as-of oracle, shared VERBATIM by q_asof_join
    * and q_asof_join_bucketed — the two plans must be result-identical,
    * and giving them one SQL string makes the gate prove exactly that. */
  private val asofOracleSql =
    """WITH e AS (SELECT event_id, user_id, event_type,
            CAST(DATE '1995-01-01' + CAST(event_id % 2500 AS INTEGER) AS TIMESTAMP)
              AS cutoff
          FROM events),
        o AS (SELECT o_custkey, o_orderkey,
            make_timestamp(epoch_ns(o_orderdate) // 1000) AS odate, o_totalprice
          FROM orders),
        c AS (SELECT e.event_id, o.o_orderkey, o.odate, o.o_totalprice,
            row_number() OVER (PARTITION BY e.event_id
              ORDER BY o.odate DESC, o.o_orderkey DESC) AS rn
          FROM e JOIN o ON o.o_custkey = e.user_id AND o.odate <= e.cutoff)
        SELECT e.event_id, e.user_id, e.event_type, e.cutoff,
          c.o_orderkey AS last_o_orderkey, c.odate AS last_o_orderdate,
          c.o_totalprice AS last_o_totalprice
        FROM e LEFT JOIN c ON c.event_id = e.event_id AND c.rn = 1
        ORDER BY e.event_id"""

  /** MinHash band-signature CTE prefix (tok → shingles → minhash →
    * bands) — shared by the in-corpus LSH chain below and the fuzzy
    * decontamination oracle. */
  private lazy val minhashBandCtes = minhashBandCtesWith(tokCte)

  private def minhashBandCtesWith(tokSrc: String) =
    s"""tok AS ($tokSrc), sh5 AS (${sh(5)}),
        hm AS (SELECT doc_id, ${h60("s")} % ${TextOps.minhashM} AS m FROM sh5),
        perm AS (SELECT * FROM (VALUES ${(0 until 16).map(i =>
          s"(${i}, ${TextOps.minhashA(i)}, ${TextOps.minhashB(i)})").mkString(", ")})
          t(seed, a, b)),
        mh AS (SELECT doc_id, seed, min((a * m + b) % ${TextOps.minhashP}) AS m
               FROM hm, perm GROUP BY 1, 2),
        bands AS (SELECT doc_id, seed // 4 AS band,
                    md5(string_agg(CAST(m AS VARCHAR), '|' ORDER BY seed)) AS sig
                  FROM mh GROUP BY 1, 2)"""

  /** Full MinHash-LSH CTE chain ([[minhashBandCtes]] → candidates →
    * intersection sizes), used by q_dedup_minhash and
    * q_dedup_clusters. */
  private lazy val minhashCtes = minhashCtesWith(minhashBandCtes)

  /** The sharded chain for the recursive-closure dedup oracles (the
    * adaptive document shard is a no-op below the cap). */
  private lazy val minhashCtesSharded =
    minhashCtesWith(minhashBandCtesWith(tokShardCte))

  private def minhashCtesWith(bandCtes: String) =
    s"""$bandCtes,
        cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                 FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig
                 WHERE x.doc_id < y.doc_id),
        sz AS (SELECT doc_id, count(*) AS n FROM sh5 GROUP BY 1),
        inter AS (SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS i
                  FROM sh5 sa JOIN sh5 sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id
                  JOIN cand ON cand.a = sa.doc_id AND cand.b = sb.doc_id
                  GROUP BY 1, 2)"""

  private val jaccardSelect =
    s"""SELECT inter.a, inter.b, ${r9("CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE)")} AS jaccard
      FROM inter JOIN sz sa ON inter.a = sa.doc_id JOIN sz sb ON inter.b = sb.doc_id"""

  /** DuckDB 6-bit sign-bucket expression + the shared embeddings CTE
    * prefix — must stay literal-identical between q_ann_ivf and
    * q_ann_ivf_mp, so both oracles use this single definition. */
  private def bucketSql(v: String) = (0 until 6).map(i =>
    s"CASE WHEN $v[${i + 1}] > 0.0e0 THEN ${1L << i} ELSE 0 END").mkString("(", " + ", ")")
  private lazy val ivfCtes =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        eb AS (SELECT vec_id, v, ${bucketSql("v")} AS bucket FROM e)"""

  /** [[ivfCtes]] over the adaptive embedding shard (r15 verdict #2):
    * q_ann_ivf_mp's oracle is per-candidate-linear in the INDEX side's
    * size and DuckDB's list-kernel cosine runs it >90 min at 2M
    * vectors, so the multi-probe variant caps BOTH engines' corpus at
    * the sf0.1 size (identity below — the WHERE is a tautology at
    * modulus 1, plans and hashes untouched). Single-probe q_ann_ivf
    * keeps the full corpus: the unsharded full-scan serve path stays
    * oracle-covered at every rung through it and q_ann_filtered. */
  private lazy val ivfShardCtes =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE $embShardSql),
        eb AS (SELECT vec_id, v, ${bucketSql("v")} AS bucket FROM e)"""

  // DuckDB cosine between two DOUBLE[] (fold order = Spark's aggregate)
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_transform(list_zip($a, $b), p -> p[1] * p[2]), (acc, v) -> acc + v)"
  private def cosSql(a: String, b: String) =
    r9(s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))")

  /** Shared 60-bit SimHash CTE chain (mirrors [[TextOps.simhash]]),
    * ending in `sim (doc_id, simhash)` — used by q_simhash and the
    * Hamming near-dup join. */
  private lazy val simhashCtes =
    s"""tok AS ($tokCte),
        t AS (SELECT doc_id, unnest(tokens) AS t FROM tok),
        h AS (SELECT doc_id, ${h60("t")} AS h FROM t),
        bits AS (SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS sv
                 FROM h, range(60) r(b) GROUP BY 1, 2),
        sim AS (SELECT doc_id, CAST(sum(CASE WHEN sv > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
                FROM bits GROUP BY 1)"""

  /** DuckDB mirror of [[graft.pipeline.Similarity.bandSignatures]]:
    * one UNION ALL branch per band over a CTE named `e (vec_id, v)` —
    * `sig` packs the band's hyperplane sign bits (dot > 0), dots
    * left-folded exactly like the Spark kernel, ±1 coefficients
    * embedded as literals from the shared deterministic generator. */
  private def bandedSigBranches(bands: Int, rpb: Int, dim: Int = 64): String = {
    def arr(c: Array[Double]) =
      c.map(x => if (x > 0) "1.0e0" else "-1.0e0").mkString("[", ", ", "]")
    // one UNION ALL branch per band: sig packs the band's sign bits
    // (dot > 0), dots left-folded exactly like the Spark kernel
    (0 until bands).map { b =>
      val bits = (0 until rpb).map { j =>
        val c = Similarity.planeCoeffs(b * rpb + j, dim)
        s"CASE WHEN ${dotSql("v", arr(c))} > 0.0e0 THEN ${1L << j} ELSE 0 END"
      }.mkString("(", " + ", ")")
      s"SELECT vec_id, $b AS band, $bits AS sig FROM e"
    }.mkString("\n        UNION ALL ")
  }

  // ---- decontamination / PII / sampling shared fragments ----

  /** Eval split for the decontamination contract: every 20th doc plays
    * the benchmark corpus, the rest are training docs. */
  private val evalPred = "doc_id % 20 = 0"

  /** DuckDB mirror of [[Sampling.uExpr]] (same salt). */
  private def uSql(salt: String) =
    s"${h60(s"concat('$salt:', CAST(doc_id AS VARCHAR))")} % 1000000"

  /** Shared scored+labeled relation for the AUC contract pair
    * (q_classifier_auc / q_auc_merged): the hashed classifier with
    * source carried, plus a PLANTED noisy ground truth — the
    * classifier's own sign with a deterministic 20% hash flip, so the
    * true AUC sits meaningfully above 0.5 and both engines derive the
    * identical label. */
  private def aucScored(s: SparkSession, dir: String): DataFrame =
    TextOps.hashedClassifier(docs(s, dir), carry = Seq("source"))
      .withColumn("label", expr(
        s"(w_sum > 0L) != (${Sampling.uExpr("auc")} < 200000L)"))

  /** DuckDB replay of [[TextOps.hashedClassifier]], carry-parameterized
    * exactly like the Scala side's `carry` — the SINGLE source of the
    * classifier-formula SQL for both the q_quality_classifier oracle
    * and the eval family (a formula change lands in one place or the
    * two oracle families would silently diverge). Ends in
    * `p (doc_id, carry…, n_tokens, w_sum, prob)`. */
  private def classifierCtes(carry: Seq[String]): String = {
    val c = carry.map(x => s"$x, ").mkString
    s"""tok AS ($tokCte),
        m AS (SELECT doc_id, ${c}CAST(len(tokens) AS INTEGER) AS n_tokens,
                CAST(list_sum(list_transform(tokens, t -> ${h60("t")} % 2001 - 1000)) AS BIGINT) AS w_sum
              FROM tok),
        z AS (SELECT doc_id, ${c}n_tokens, w_sum,
                CAST(w_sum AS DOUBLE) / (1000.0e0 * CAST(n_tokens AS DOUBLE)) AS z
              FROM m),
        p AS (SELECT doc_id, ${c}n_tokens, w_sum,
                floor((0.5e0 + 0.5e0 * z / (1.0e0 + abs(z))) * 1.0e9 + 0.5e0) / 1.0e9 AS prob
              FROM z)"""
  }

  /** Shared DuckDB CTE prefix for the classifier-eval contract family
    * (AUC / PR sweep / calibration) — ends in
    * `sc (doc_id, source, prob, sq, pos)`: the hashedClassifier replay
    * with the planted noisy label, prob on the 1e-9 lattice, sq = the
    * BIGINT score. */
  private lazy val aucScoredCtes =
    s"""${classifierCtes(Seq("source"))},
        sc AS (SELECT doc_id, source, prob, CAST(floor(prob * 1.0e9 + 0.5e0) AS BIGINT) AS sq,
                CASE WHEN (w_sum > 0) <> (${uSql("auc")} < 200000) THEN 1 ELSE 0 END AS pos
              FROM p)"""

  /** Shared oracle for q_classifier_auc AND q_auc_merged — the merged
    * persisted-histogram path must reproduce the direct full-corpus
    * AUC, so both use this SQL verbatim (the q_asof_join_bucketed
    * result-identity pattern). Midrank AUC from per-distinct-score
    * counts: A = Σ neg_s·(2·cumpos_<s + pos_s) counts discordant pairs
    * twice + ties once ⇒ auc = 1 − A/(2·P·N), exact BIGINTs until one
    * identically-shaped double division. */
  private lazy val aucOracleSql =
    s"""WITH $aucScoredCtes,
        h AS (SELECT source, sq, sum(pos) AS p, sum(1 - pos) AS ng
              FROM sc GROUP BY 1, 2),
        c AS (SELECT *, coalesce(sum(p) OVER (PARTITION BY source ORDER BY sq
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
              FROM h),
        a AS (SELECT source, CAST(sum(p) AS BIGINT) AS n_pos,
                CAST(sum(ng) AS BIGINT) AS n_neg,
                CAST(sum(ng * (2 * cum + p)) AS BIGINT) AS a2
              FROM c GROUP BY 1)
        SELECT source, n_pos, n_neg,
          CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS DOUBLE)
               ELSE floor((1.0e0 - CAST(a2 AS DOUBLE)
                 / (2.0e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
                 * 1.0e9 + 0.5e0) / 1.0e9 END AS auc
        FROM a ORDER BY source"""

  /** Shared oracle for q_calibration AND q_calibration_hist — the
    * histogram-reconstructed reliability diagram must reproduce the
    * direct one, so both use this SQL verbatim (the aucOracleSql
    * pattern). */
  private lazy val calibrationOracleSql =
    s"""WITH $aucScoredCtes,
        cal AS (SELECT source, CAST(floor(prob * 1.0e6 + 0.5e0) AS BIGINT) AS pu, pos
                FROM sc),
        b AS (SELECT source,
                CAST(least((pu * 10) // 1000000, 9) AS INTEGER) AS bin,
                count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
                CAST(sum(pu) AS BIGINT) AS pu_sum
              FROM cal GROUP BY 1, 2)
        SELECT source, bin, n, n_pos,
          floor(CAST(pu_sum AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e6)
            * 1.0e9 + 0.5e0) / 1.0e9 AS mean_prob,
          floor(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
            * 1.0e9 + 0.5e0) / 1.0e9 AS pos_rate
        FROM b ORDER BY source, bin"""

  /** Per-source Bernoulli rates for the stratified-sample contract:
    * five rate tiers cycling over the 20 sources. */
  private val sampleRates: Map[String, Double] =
    (0 to 19).map(i => s"src$i" -> (i % 5 + 1) * 0.15).toMap

  /** DuckDB threshold CASE — same `round(rate·10⁶)` integers the Spark
    * side builds in [[Sampling.stratified]]. */
  private val thrSql = sampleRates.toSeq.sortBy(_._1)
    .map { case (s, r) => s"WHEN '$s' THEN ${math.round(r * 1e6)}" }
    .mkString("CASE source ", " ", " ELSE 0 END")

  /** Temperature-mix contract constants + the DuckDB mixture-recipe CTE
    * chain (per-source exact token counts → micro-unit √ weights →
    * one-row totals → r9 shares → budgeted per-source rates) — the
    * literal-identical mirror of [[Sampling.temperatureMixRates]].
    * Ends in a `rates` CTE. */
  private val mixBudgetPermille = 250
  /** CTE-name-tagged, τ-parameterized variant (the weight expression is
    * the shared nested-sqrt formula [[graft.pipeline.Sampling.tauPowExpr]],
    * identical text on both engines); tag keeps three τ chains
    * coexisting in one query. */
  private def mixCtesT(tag: String, tauQuarters: Int): String = {
    val bf = graft.regrid.Rounding.sqlLit(mixBudgetPermille / 1000.0)
    s"""tok$tag AS ($tokCte),
        per$tag AS (SELECT source, count(*) AS n_docs,
                  CAST(sum(len(tokens)) AS BIGINT) AS n_tokens
                FROM tok$tag GROUP BY 1),
        wgt$tag AS (SELECT *, CAST(floor(${Sampling.tauPowExpr("CAST(n_tokens AS DOUBLE)", tauQuarters)} * 1.0e6 + 0.5e0) AS BIGINT) AS w_u
                FROM per$tag),
        tw$tag AS (SELECT CAST(sum(w_u) AS BIGINT) AS tot_w,
                 CAST(sum(n_tokens) AS BIGINT) AS tot_tok FROM wgt$tag),
        pm$tag AS (SELECT source, n_docs, n_tokens, w_u, tot_tok,
                 floor((CAST(w_u AS DOUBLE) / CAST(tot_w AS DOUBLE)) * 1.0e9 + 0.5e0) / 1.0e9 AS p_mix
               FROM wgt$tag CROSS JOIN tw$tag),
        rates$tag AS (SELECT source, n_docs, n_tokens, w_u, p_mix,
                    LEAST(CAST(1000000 AS BIGINT), CAST(floor(
                      (($bf * CAST(tot_tok AS DOUBLE)) * p_mix / CAST(n_tokens AS DOUBLE))
                      * 1.0e6 + 0.5e0) AS BIGINT)) AS rate_u
                  FROM pm$tag)"""
  }
  private lazy val mixCtes: String = mixCtesT("", 2)

  /** Sequence-packing contract constants: 256-token bins over 8 shards
    * (avg doc ≈ 54 tokens → ~4 docs/bin; 8 sequential chains keep the
    * recursive oracle's depth at ~60 rows/shard at sf0.01). */
  private val packCap = 256L
  private val packShards = 8

  /** DuckDB replay of [[Packing.packGreedy]]'s next-fit recurrence:
    * rank docs per shard, then walk rn = 1, 2, … carrying (bin, fill)
    * — the recursive CTE states sequentially what the Spark side
    * computes in one streaming mapPartitions pass. Used by
    * q_pack_greedy (assignments) and q_pack_stats (per-shard audit). */
  private lazy val packCtes =
    s"""d AS (SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
          CAST(${h60("concat('r4:', CAST(doc_id AS VARCHAR))")} % $packShards AS INTEGER) AS shard
        FROM documents WHERE $docShardSql),
        r AS (SELECT doc_id, n_tok, shard,
                row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
              FROM d),
        rec AS (
          SELECT shard, rn, doc_id, n_tok,
            CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS bin_offset,
            n_tok AS fill
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.shard, r.rn, r.doc_id, r.n_tok,
            CASE WHEN rec.fill + r.n_tok > $packCap
                 THEN rec.bin_id + 1 ELSE rec.bin_id END,
            CASE WHEN rec.fill + r.n_tok > $packCap
                 THEN CAST(0 AS BIGINT) ELSE rec.fill END,
            CASE WHEN rec.fill + r.n_tok > $packCap
                 THEN r.n_tok ELSE rec.fill + r.n_tok END
          FROM rec JOIN r ON r.shard = rec.shard AND r.rn = rec.rn + 1)"""

  /** k-means contract constants and the unrolled-Lloyd oracle chain.
    * Parity is engineered to be bit-exact (quantized integer-valued
    * doubles → exact order-independent sums; one IEEE division per
    * centroid component; fixed-order distance folds — see
    * [[graft.pipeline.Clustering]]), so the oracle needs no tolerance. */
  private val kmK = 8
  private val kmIters = 3
  /** The full-vector chain is the trivial slice [1, 64] of the
    * generalized per-subspace builder — ONE copy of the unrolled-Lloyd
    * SQL serves q_kmeans, q_ann_ivf_learned, q_semantic_dedup and the
    * IVF-PQ codebooks. */
  private lazy val kmeansCtes: String = kmeansSubCtes("", 1, 64, kmK, kmIters)

  /** Product-quantization contract constants and the per-subspace
    * unrolled-Lloyd CTE builder (the [[kmeansCtes]] chain generalized
    * to a vector slice and a name tag so two codebooks coexist in one
    * query). Parity inherits q_kmeans' engineering: quantized exact
    * sums, fixed-order folds, tie-break on ids. */
  private val pqM = 2
  private val pqK = 8
  private val pqIters = 2
  private val pqCells = 4
  private def pqDist(v: String, c: String) =
    s"""list_reduce(list_transform(list_zip($v, $c),
        p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b)"""
  private def kmeansSubCtes(tag: String, lo: Int, len: Int,
                            k: Int, iters: Int,
                            where: String = ""): String = {
    val w = if (where.isEmpty) "" else s" WHERE $where"
    val init =
      s"""e$tag AS (SELECT vec_id, list_transform(
            list_slice(CAST(embedding AS DOUBLE[]), $lo, ${lo + len - 1}),
            x -> round(x * 10000.0e0)) AS v FROM embeddings$w),
          c0$tag AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cl, v AS c
                     FROM (SELECT * FROM e$tag ORDER BY vec_id LIMIT $k))"""
    val rounds = (1 to iters).map { i =>
      val assign =
        s"""a$i$tag AS (SELECT vec_id, v, cl, d FROM (
              SELECT vec_id, v, cl, d,
                row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
              FROM (SELECT e$tag.vec_id, e$tag.v, c${i - 1}$tag.cl,
                      ${pqDist(s"e$tag.v", s"c${i - 1}$tag.c")} AS d
                    FROM e$tag CROSS JOIN c${i - 1}$tag))
            WHERE rn = 1)"""
      val update = if (i == iters) "" else
        s""", u$i$tag AS (SELECT cl, j, sum(v[j]) AS s, count(*) AS n
              FROM a$i$tag CROSS JOIN generate_series(1, $len) t(j) GROUP BY 1, 2),
            c$i$tag AS (SELECT cl, list(s / n ORDER BY j) AS c FROM u$i$tag GROUP BY 1)"""
      assign + update
    }
    (init +: rounds).mkString(", ")
  }

  /** The full IVF-PQ oracle chain: three unrolled Lloyd runs (two
    * 32-dim slice codebooks + the coarse full-vector cells), ADC LUTs,
    * the cell-restricted candidate join, and the approximate ranking —
    * ends in `rr (query_id, neighbor_id, adist, rank)`. Shared by
    * q_ann_pq (the ADC cut) and q_ann_pq_rerank (exact refinement of
    * the ADC top-20). */
  /** Learned-IVF exact-within-cell top-5 oracle, shared VERBATIM by
    * q_ann_ivf_learned (in-memory train-and-query) and
    * q_ann_ivf_persisted (train → AnnIO.saveIvf → loadIvf →
    * ivfQueryTopK) — the persisted index must serve identical results,
    * proven through the one SQL string.
    *
    * Over the adaptive embedding shard since r16 (r15 verdict #2): the
    * unrolled-Lloyd chain's cost is driven by the in-query TRAINING
    * corpus — each Lloyd round is corpus × k list-kernel distances
    * plus a corpus × dim unnest for the update, >45 min in DuckDB at
    * 2M vectors — so both queries cap BOTH engines' corpus at the
    * sf0.1 size (the q_ann_topk discipline: identity below the cap —
    * tautological WHERE, modulus 1, plans and hashes untouched). The
    * learned-cell training path itself stays full-corpus-covered at
    * scale through q_kmeans / q_kmeans_twolevel / the PQ family, whose
    * oracles replay at sf100. */
  private lazy val annIvfOracleSql: String =
    s"""WITH ${kmeansSubCtes("", 1, 64, kmK, kmIters, where = embShardSql)},
      g AS (SELECT vec_id, cl FROM a$kmIters),
      ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             WHERE $embShardSql),
      c AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
              ${cosSql("qv.v", "nv.v")} AS cos
            FROM g q JOIN g n ON q.cl = n.cl AND q.vec_id <> n.vec_id
            JOIN ev qv ON qv.vec_id = q.vec_id
            JOIN ev nv ON nv.vec_id = n.vec_id
            WHERE ${annProbeSql("q.vec_id")}),
      r AS (SELECT *, CAST(row_number() OVER
              (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
            FROM c)
      SELECT * FROM r WHERE rank <= 5 ORDER BY query_id, rank"""

  /** IVF-PQ ADC top-5 oracle, shared VERBATIM by q_ann_pq (in-memory
    * train-and-query) and q_ann_pq_persisted (train → AnnIO.save →
    * load → pqQueryTopK) — the persisted index must serve identical
    * results, and one SQL string makes the gate prove exactly that. */
  private lazy val annPqOracleSql: String =
    s"""WITH $pqCtes
      SELECT query_id, neighbor_id, adist, rank FROM rr WHERE rank <= 5
      ORDER BY query_id, rank"""

  private lazy val pqCtes: String = pqCtesWith(
    s"qc AS (SELECT vec_id AS query_id, cell FROM cells WHERE ${annProbeSql("vec_id")})")

  /** Multi-probe `qc`: each query's `nprobe` nearest FINAL coarse
    * centroids by quantized-space distance (ties on cell id) — the
    * oracle mirror of [[graft.pipeline.Clustering.probeCells]]. */
  private def pqQcMultiProbe(nprobe: Int): String =
    s"""qc AS (SELECT query_id, cell FROM (
          SELECT query_id, cell,
            row_number() OVER (PARTITION BY query_id ORDER BY d, cell) AS rn
          FROM (SELECT e.vec_id AS query_id, c.cl AS cell,
                  ${pqDist("e.v", "c.c")} AS d
                FROM epc e CROSS JOIN c${pqIters - 1}pc c
                WHERE ${annProbeSql("e.vec_id")}))
        WHERE rn <= $nprobe)"""

  private def pqCtesWith(qcCte: String, neighborWhere: String = "",
                         cellsCte: String = ""): String =
    s"""${kmeansSubCtes("pa", 1, 32, pqK, pqIters)},
        ${kmeansSubCtes("pb", 33, 32, pqK, pqIters)},
        ${kmeansSubCtes("pc", 1, 64, pqCells, pqIters)},
        luta AS (SELECT q.vec_id AS query_id, c.cl AS code,
                   ${pqDist("q.v", "c.c")} AS d
                 FROM epa q CROSS JOIN c${pqIters - 1}pa c WHERE ${annProbeSql("q.vec_id")}),
        lutb AS (SELECT q.vec_id AS query_id, c.cl AS code,
                   ${pqDist("q.v", "c.c")} AS d
                 FROM epb q CROSS JOIN c${pqIters - 1}pb c WHERE ${annProbeSql("q.vec_id")}),
        ${if (cellsCte.nonEmpty) cellsCte
          else s"cells AS (SELECT vec_id, cl AS cell FROM a${pqIters}pc)"},
        $qcCte,
        cd AS (SELECT a.vec_id, a.cl AS ca, b.cl AS cb, cells.cell
               FROM a${pqIters}pa a JOIN a${pqIters}pb b USING (vec_id)
               JOIN cells USING (vec_id)),
        sc AS (SELECT qc.query_id, cd.vec_id AS neighbor_id, la.d + lb.d AS adist
               FROM cd JOIN qc ON qc.cell = cd.cell
                       JOIN luta la ON la.query_id = qc.query_id AND la.code = cd.ca
                       JOIN lutb lb ON lb.query_id = qc.query_id AND lb.code = cd.cb
               WHERE cd.vec_id <> qc.query_id$neighborWhere),
        rr AS (SELECT *, CAST(row_number() OVER
                 (PARTITION BY query_id ORDER BY adist, neighbor_id) AS INTEGER) AS rank
               FROM sc)"""

  /** Rollover contract constants: the refresh batch and its
    * per-centroid prior weight — small enough that the refreshed
    * coarse centroids move visibly (cells actually flip), the drift
    * regime a rollover exists for. */
  private val rollPw = 50L
  private val rollBatchPred = "vec_id % 3 = 0"

  /** q_ann_refresh_serve oracle: the shared IVF-PQ chain with the
    * COARSE model replaced by its decayed mini-batch refresh
    * (q_centroid_refresh's oracle pattern on the `pc` chain) and every
    * corpus vector RE-CELLED against the refreshed centroids — exactly
    * what [[graft.pipeline.AnnIO.rollover]] persists. Codebooks (and
    * hence LUT distances) are untouched; only cell membership moves.
    * Serving through the rolled-over index must reproduce this chain
    * bit-for-bit. */
  private lazy val annPqRefreshOracleSql: String = {
    val fin = s"c${pqIters - 1}pc" // the trained coarse model the refresh starts from
    val refreshAndCells =
      s"""rb AS (SELECT vec_id, v FROM epc WHERE $rollBatchPred),
        rba AS (SELECT vec_id, v, cl FROM (
                SELECT rb.vec_id, rb.v, cf.cl,
                  row_number() OVER (PARTITION BY rb.vec_id
                    ORDER BY ${pqDist("rb.v", "cf.c")}, cf.cl) AS rn
                FROM rb CROSS JOIN $fin cf)
              WHERE rn = 1),
        rbs AS (SELECT cl, j, sum(v[j]) AS s, count(*) AS n
               FROM rba CROSS JOIN generate_series(1, 64) t(j) GROUP BY 1, 2),
        rcj AS (SELECT cl, j, c[j] AS cv
               FROM $fin CROSS JOIN generate_series(1, 64) t(j)),
        rcd AS (SELECT rcj.cl, rcj.j,
                CASE WHEN rbs.n IS NULL THEN rcj.cv
                     ELSE (${rollPw}.0e0 * rcj.cv + rbs.s)
                          / (${rollPw}.0e0 + CAST(rbs.n AS DOUBLE)) END AS val
              FROM rcj LEFT JOIN rbs ON rbs.cl = rcj.cl AND rbs.j = rcj.j),
        cr AS (SELECT cl, list(val ORDER BY j) AS c FROM rcd GROUP BY cl),
        cells AS (SELECT vec_id, cl AS cell FROM (
                SELECT e.vec_id, cr.cl,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY ${pqDist("e.v", "cr.c")}, cr.cl) AS rn
                FROM epc e CROSS JOIN cr)
              WHERE rn = 1)"""
    s"""WITH ${pqCtesWith(
        s"qc AS (SELECT vec_id AS query_id, cell FROM cells WHERE ${annProbeSql("vec_id")})",
        cellsCte = refreshAndCells)}
      SELECT query_id, neighbor_id, adist, rank FROM rr WHERE rank <= 5
      ORDER BY query_id, rank"""
  }

  /** Duplicate-span contract constants (Lee-et-al-style substring
    * dedup): 5-token shingles, duplicated = ≥ 2 occurrences corpus-wide
    * (multiplicity counted). The islands chain below mirrors
    * [[Spans.duplicateSpans]]: positioned shingles → occurrence counts
    * → join back → per-doc merge of overlapping/adjacent spans via the
    * classic gaps-and-islands window recurrence. */
  private val spanN = 5
  private lazy val spanCtes =
    s"""tok AS ($tokCte),
        pos AS (SELECT doc_id, tokens,
                  unnest(generate_series(0, len(tokens) - $spanN)) AS st
                FROM tok WHERE len(tokens) >= $spanN),
        shp AS (SELECT doc_id, st, st + ${spanN - 1} AS en,
                  ${h60(s"array_to_string(list_slice(tokens, st + 1, st + $spanN), ' ')")} AS h
                FROM pos),
        dup AS (SELECT h FROM shp GROUP BY h HAVING count(*) >= 2),
        sp AS (SELECT shp.doc_id, shp.st, shp.en FROM shp JOIN dup USING (h)),
        mx AS (SELECT doc_id, st, en,
                 max(en) OVER (PARTITION BY doc_id ORDER BY st
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
               FROM sp),
        fl AS (SELECT *, CASE WHEN prev_max IS NULL OR st > prev_max + 1
                 THEN 1 ELSE 0 END AS is_new FROM mx),
        gr AS (SELECT *, sum(is_new) OVER (PARTITION BY doc_id ORDER BY st
                 ROWS UNBOUNDED PRECEDING) AS grp FROM fl),
        isl AS (SELECT doc_id, min(st) AS t0, max(en) AS t1
                FROM gr GROUP BY doc_id, grp)"""

  /** BM25 contract constants: fixed query terms with spread document
    * frequencies in the synthetic vocabulary, top-20 cut. */
  private val bm25Terms = Seq("spark", "vector", "merge")
  private val bm25K = 20

  /** Phrase-search contract queries: mixed 2- and 3-token phrases,
    * including one with a repeated term (the `count(*) = plen`
    * exactness case). */
  private val phraseSet: Seq[Seq[String]] = Seq(
    Seq("scan", "query"), Seq("the", "table"), Seq("fast", "scan"),
    Seq("table", "table"), Seq("value", "table", "part"))

  /** DuckDB single-quoted literal for a portable regex (RE2 strings
    * take backslashes verbatim — no doubling, unlike Spark literals). */
  private def rx(p: String) = s"'$p'"

  private val redactSql = Pii.masks.foldLeft("text") { case (e, (p, m)) =>
    s"regexp_replace($e, ${rx(p)}, '$m', 'g')"
  }

  /** Deterministic PII injection — the synthetic texts carry no PII, so
    * both engines append hash-free, doc_id-derived emails / phones /
    * IPs to two thirds of the docs (the remaining third is the
    * negative control). Spark and DuckDB texts are byte-identical. */
  private def piiInject(castStr: String) =
    s"""CASE CAST(doc_id % 3 AS INTEGER)
       WHEN 0 THEN concat(text, ' contact user', CAST(doc_id AS $castStr),
         '@example.com or node 10.', CAST(doc_id % 200 AS $castStr), '.',
         CAST((doc_id * 7) % 256 AS $castStr), '.', CAST(doc_id % 250 AS $castStr))
       WHEN 1 THEN concat('call +1-555-', lpad(CAST(doc_id % 10000 AS $castStr), 4, '0'),
         ' ', text)
       ELSE text END"""

  /** Markup-injection fixture (the synthetic corpus carries no HTML):
    * tags/entities derived from doc_id, same CASE on both engines. */
  private val markupInject =
    """CASE CAST(doc_id % 4 AS INTEGER)
       WHEN 0 THEN concat('<div class="post"><p>', text, '</p></div>')
       WHEN 1 THEN concat('<b>title</b> ', replace(text, ' the ', ' &amp; '), ' <br/>')
       WHEN 2 THEN concat(text, ' &lt;escaped&gt;&nbsp;tail')
       ELSE text END"""

  val defs: Seq[QueryDef] = Seq(

    // ---- text analysis ----

    QueryDef("q_text_tokens",
      (s, dir) => TextOps.tokenStats(docs(s, dir)).orderBy("doc_id"),
      Some(s"""WITH tok AS ($tokCte)
        SELECT doc_id, CAST(len(tokens) AS INTEGER) AS n_tokens,
          CAST(len(list_distinct(tokens)) AS INTEGER) AS n_uniq,
          CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / len(tokens) AS avg_token_len
        FROM tok ORDER BY doc_id""")),

    QueryDef("q_tokens_bpe",
      // BPE-ish pre-tokenizer counts (GPT-2 pattern family restricted
      // to the RE2 ∩ Java portable regex subset)
      (s, dir) => TextOps.bpeTokenStats(docs(s, dir)).orderBy("doc_id"),
      Some("""SELECT doc_id,
          CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)|\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+')) AS INTEGER) AS n_bpe,
          CAST(len(regexp_extract_all(text, '\p{L}+')) AS INTEGER) AS n_word,
          CAST(len(regexp_extract_all(text, '\p{N}+')) AS INTEGER) AS n_num
        FROM documents ORDER BY doc_id""")),

    QueryDef("q_lang_id",
      (s, dir) => TextOps.langId(docs(s, dir)).orderBy("doc_id"),
      Some {
        val hs = TextOps.langMarkers.map { case (l, ws) => s"${hits(ws)} AS hits_$l" }
        val langs = TextOps.langMarkers.map(_._1)
        val caseExpr = langs.init.zipWithIndex.map { case (l, i) =>
          val rest = langs.drop(i + 1)
          s"WHEN ${rest.map(r => s"hits_$l >= hits_$r").mkString(" AND ")} THEN '$l'"
        }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
        s"""WITH tok AS ($tokCte),
          h AS (SELECT doc_id, ${hs.mkString(", ")} FROM tok)
          SELECT doc_id, hits_en, hits_de, hits_fr, hits_es, hits_zh,
            $caseExpr AS predicted
          FROM h ORDER BY doc_id"""
      }),

    QueryDef("q_repetition",
      // Gopher/C4 repetition filters: duplicate-line and duplicate-char
      // ratios over non-empty trimmed lines (boilerplate/templated-spam
      // signal that token stats miss)
      (s, dir) => TextOps.repetitionStats(docs(s, dir)).orderBy("doc_id"),
      Some(s"""WITH l AS (
          SELECT doc_id,
            list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
              l -> l <> '') AS lines
          FROM documents
        ),
        c AS (
          SELECT doc_id,
            len(lines) AS n_lines,
            len(list_distinct(lines)) AS n_distinct_lines,
            coalesce(list_sum(list_transform(lines, l -> length(l))), 0) AS tot_chars,
            coalesce(list_sum(list_transform(list_distinct(lines), l -> length(l))), 0) AS dist_chars
          FROM l
        )
        SELECT doc_id,
          CAST(n_lines AS INTEGER) AS n_lines,
          CAST(n_distinct_lines AS INTEGER) AS n_distinct_lines,
          CASE WHEN n_lines = 0 THEN 0.0e0 ELSE
            floor((1.0e0 - CAST(n_distinct_lines AS DOUBLE) / CAST(n_lines AS DOUBLE))
            * 1.0e9 + 0.5e0) / 1.0e9 END AS dup_line_ratio,
          CASE WHEN tot_chars = 0 THEN 0.0e0 ELSE
            floor((1.0e0 - CAST(dist_chars AS DOUBLE) / CAST(tot_chars AS DOUBLE))
            * 1.0e9 + 0.5e0) / 1.0e9 END AS dup_char_ratio
        FROM c ORDER BY doc_id""")),

    QueryDef("q_quality_score",
      (s, dir) => TextOps.qualityScore(docs(s, dir)).orderBy("doc_id"),
      Some(s"""WITH tok AS ($tokCte),
        m AS (SELECT doc_id,
          CAST(length(text) AS INTEGER) AS n_chars,
          CAST(len(tokens) AS INTEGER) AS n_tokens,
          CAST(${hits(TextOps.langMarkers.head._2)} AS DOUBLE) / len(tokens) AS stop_ratio,
          CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio
        FROM tok)
        SELECT doc_id, n_chars, n_tokens, stop_ratio, alpha_ratio,
          floor((0.3e0 * stop_ratio + 0.4e0 * alpha_ratio +
            0.3e0 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0e0)) * 1.0e9 + 0.5e0) / 1.0e9 AS score
        FROM m ORDER BY doc_id""")),

    QueryDef("q_corpus_report",
      // per-source corpus report card: volume, mean length, language
      // spread, mean quality — one map-side combined aggregate. Scores
      // re-quantized to integer nano-units before the group sum (r9
      // doubles are not exactly representable; a float sum would be
      // order-dependent).
      (s, dir) => TextOps.corpusReport(docs(s, dir)).orderBy("source"),
      Some(s"""WITH tok AS ($tokCte),
        ld AS (SELECT doc_id, lang FROM documents),
        m AS (SELECT tok.doc_id, source, lang,
                CAST(len(tokens) AS BIGINT) AS n_tok,
                CAST(${hits(TextOps.langMarkers.head._2)} AS DOUBLE) / len(tokens) AS stop_ratio,
                CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio
              FROM tok JOIN ld ON tok.doc_id = ld.doc_id),
        sc AS (SELECT source, lang, n_tok,
                 CAST(floor(floor((0.3e0 * stop_ratio + 0.4e0 * alpha_ratio +
                   0.3e0 * (CAST(least(n_tok, 100) AS DOUBLE) / 100.0e0)) * 1.0e9 + 0.5e0) / 1.0e9
                   * 1.0e9 + 0.5e0) AS BIGINT) AS score_n
               FROM m),
        g AS (SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                count(DISTINCT lang) AS n_langs, CAST(sum(score_n) AS BIGINT) AS sum_score_n
              FROM sc GROUP BY 1)
        SELECT source, n_docs, n_tokens,
          floor((CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)) * 1.0e9 + 0.5e0) / 1.0e9 AS mean_tokens,
          n_langs,
          floor((CAST(sum_score_n AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1.0e9) * 1.0e9 + 0.5e0) / 1.0e9 AS mean_quality
        FROM g ORDER BY source""")),

    QueryDef("q_length_quantiles",
      // X38: exact corpus order statistics — the value at rank
      // ⌈p·n/100⌉ of the doc-length distribution, computed with NO
      // global sort / corpus window (value-range histogram + distinct
      // -value counts in the target buckets only, all joins
      // broadcast; see Sampling.exactPercentiles). The oracle states
      // the same rank semantics declaratively with a global
      // row_number — affordable for DuckDB at sf scale, the exact
      // thing the Spark plan avoids.
      (s, dir) => Sampling.exactPercentiles(
        docs(s, dir), "n_chars", Seq(1, 25, 50, 75, 90, 99, 100))
        .orderBy("pct"),
      Some("""WITH v AS (SELECT CAST(n_chars AS BIGINT) AS val FROM documents),
        n AS (SELECT count(*) AS c FROM v),
        r AS (SELECT val, row_number() OVER (ORDER BY val) AS rn FROM v),
        p(pct) AS (VALUES (1), (25), (50), (75), (90), (99), (100))
        SELECT p.pct, (CAST(p.pct AS BIGINT) * n.c + 99) // 100 AS n_rank,
          r.val AS value
        FROM p CROSS JOIN n
        JOIN r ON r.rn = (CAST(p.pct AS BIGINT) * n.c + 99) // 100
        ORDER BY p.pct""")),

    QueryDef("q_length_quantiles_by_source",
      // X38 grouped: one exact rank set per source — the per-source
      // length-distribution half of the corpus report card. With a
      // group key the rank location is a broadcast EQUI-join (hash on
      // source, range residual as filter), so the grouped plan has no
      // nested-loop lookup at all.
      (s, dir) => Sampling.exactPercentilesBy(
        docs(s, dir), "n_chars", Seq(25, 50, 75, 99), Seq("source"))
        .orderBy("source", "pct"),
      Some("""WITH v AS (SELECT source, CAST(n_chars AS BIGINT) AS val FROM documents),
        n AS (SELECT source, count(*) AS c FROM v GROUP BY 1),
        r AS (SELECT source, val,
                row_number() OVER (PARTITION BY source ORDER BY val) AS rn
              FROM v),
        p(pct) AS (VALUES (25), (50), (75), (99))
        SELECT n.source, p.pct,
          (CAST(p.pct AS BIGINT) * n.c + 99) // 100 AS n_rank, r.val AS value
        FROM p CROSS JOIN n
        JOIN r ON r.source = n.source
              AND r.rn = (CAST(p.pct AS BIGINT) * n.c + 99) // 100
        ORDER BY n.source, p.pct""")),

    QueryDef("q_quantiles_merged",
      // X38's histogram as a PERSISTED, MERGEABLE summary: the corpus
      // splits into two snapshots (doc_id parity), each snapshot's
      // per-source (val, cnt) histogram of n_chars is WRITTEN to
      // Parquet, read back, summed elementwise, and ranked — counts
      // are additive, so the merged percentiles must equal the direct
      // full-corpus exact percentiles, which is what the oracle
      // computes (same SQL shape as q_length_quantiles_by_source)
      // without seeing the snapshot files. The 100 TB shape:
      // cross-snapshot exact order statistics from histogram-sized
      // summaries, old corpora never re-scanned.
      (s, dir) => {
        val d = docs(s, dir)
        val base = sketchIoPath(s)
        SketchIO.writeSketch(
          Sampling.valueHistogram(d.filter(col("doc_id") % 2 === 0), "n_chars", Seq("source")),
          s"$base/lenhist_even.parquet")
        SketchIO.writeSketch(
          Sampling.valueHistogram(d.filter(col("doc_id") % 2 === 1), "n_chars", Seq("source")),
          s"$base/lenhist_odd.parquet")
        Sampling.percentilesFromHistogram(
          Sampling.mergeValueHistograms(Seq(
            SketchIO.readSketch(s, s"$base/lenhist_even.parquet"),
            SketchIO.readSketch(s, s"$base/lenhist_odd.parquet")), Seq("source")),
          Seq(25, 50, 75, 99), Seq("source"))
          .orderBy("source", "pct")
      },
      Some("""WITH v AS (SELECT source, CAST(n_chars AS BIGINT) AS val FROM documents),
        n AS (SELECT source, count(*) AS c FROM v GROUP BY 1),
        r AS (SELECT source, val,
                row_number() OVER (PARTITION BY source ORDER BY val) AS rn
              FROM v),
        p(pct) AS (VALUES (25), (50), (75), (99))
        SELECT n.source, p.pct,
          (CAST(p.pct AS BIGINT) * n.c + 99) // 100 AS n_rank, r.val AS value
        FROM p CROSS JOIN n
        JOIN r ON r.source = n.source
              AND r.rn = (CAST(p.pct AS BIGINT) * n.c + 99) // 100
        ORDER BY n.source, p.pct""")),

    QueryDef("q_kmv_distinct",
      // mergeable KMV distinct-count sketch (Sketches.kmvDistinct):
      // per-source distinct 5-shingle cardinality — the corpus-dedup
      // accounting number — estimated from the k=128 smallest shared
      // 60-bit hashes (≤ k longs of state per group, map-side
      // combined; the exact countDistinct rides along only for
      // calibration), plus a below-k group set (per-source languages)
      // pinning the exact branch. Unlike engine-native HLL++ the
      // sketch is bit-deterministic on both engines, so even the
      // ESTIMATES hash-match the oracle.
      (s, dir) => {
        val d = docs(s, dir)
        Sketches.kmvDistinct(TextOps.shingleSet(d, 5, carry = Seq("source")),
            "source", col("s"), 128)
          .withColumn("metric", lit("shingles_5"))
          .unionByName(
            Sketches.kmvDistinct(d, "source", col("lang"), 128)
              .withColumn("metric", lit("langs")))
          .orderBy("metric", "source")
      },
      Some {
        def est(v: String, metric: String) =
          s"""SELECT '$metric' AS metric, g AS source, nd AS n_exact,
              ${Sketches.kmvSql(128)} AS est_kmv
            FROM (SELECT g, count(*) AS nd,
                max(CASE WHEN rn <= 128 THEN h END) AS hk
              FROM (SELECT g, h, row_number() OVER
                  (PARTITION BY g ORDER BY h) AS rn FROM $v) GROUP BY g)"""
        s"""WITH tok AS ($tokCte), sh5 AS (${sh(5)}),
          v1 AS (SELECT DISTINCT source AS g, ${h60("s")} AS h FROM sh5),
          v2 AS (SELECT DISTINCT source AS g, ${h60("lang")} AS h FROM documents)
          ${est("v1", "shingles_5")} UNION ALL ${est("v2", "langs")}
          ORDER BY metric, source"""
      }),

    QueryDef("q_hll_distinct",
      // HyperLogLog register file (Sketches.hllSketch/hllEstimate) —
      // the FIXED-SIZE distinct sketch next to X44's KMV order
      // statistic: 256 single-long max-rank registers per group,
      // mergeable by elementwise max, ≤ 2^p rows per group in the
      // exchange at any corpus size. Bit-deterministic (integer
      // bin()-length ranks + an exact integer harmonic denominator
      // spent in ONE double division), so unlike engine-native HLL++
      // the ESTIMATES hash-gate. Same two metrics as q_kmv_distinct:
      // per-source 5-shingle cardinality exercises the raw
      // harmonic-mean branch, per-source languages the
      // linear-counting (zeros) branch.
      (s, dir) => {
        val d = docs(s, dir)
        Sketches.hllDistinct(TextOps.shingleSet(d, 5, carry = Seq("source")),
            "source", col("s"), 8)
          .withColumn("metric", lit("shingles_5"))
          .unionByName(
            Sketches.hllDistinct(d, "source", col("lang"), 8)
              .withColumn("metric", lit("langs")))
          .orderBy("metric", "source")
      },
      Some {
        def est(v: String, metric: String) =
          s"""SELECT '$metric' AS metric, ex.g AS source, ex.n_exact,
              ${Sketches.hllEstSql(8)} AS est_hll
            FROM (SELECT g, count(DISTINCT h) AS n_exact FROM $v GROUP BY g) ex
            JOIN (SELECT g, 256 - present AS zeros,
                dpres + (256 - present) * (CAST(1 AS BIGINT) << 53) AS dscaled
              FROM (SELECT g, count(*) AS present,
                  sum(CAST(1 AS BIGINT) << (53 - r)) AS dpres
                FROM (SELECT g, h % 256 AS bucket,
                    max(CASE WHEN h // 256 = 0 THEN 53
                        ELSE 53 - length(bin(h // 256)) END) AS r
                  FROM $v GROUP BY 1, 2) GROUP BY g)) e ON e.g = ex.g"""
        s"""WITH tok AS ($tokCte), sh5 AS (${sh(5)}),
          v1 AS (SELECT source AS g, ${h60("s")} AS h FROM sh5),
          v2 AS (SELECT source AS g, ${h60("lang")} AS h FROM documents)
          ${est("v1", "shingles_5")} UNION ALL ${est("v2", "langs")}
          ORDER BY metric, source"""
      }),

    QueryDef("q_hll_overlap",
      // pairwise source overlap from HLL register files ALONE — the
      // fixed-size twin of q_kmv_jaccard's sketch algebra: register
      // files are closed under elementwise max (max-merge = the
      // union's file, exactly), |A∪B| estimated from the merged file,
      // overlap by inclusion-exclusion. Corpus touched once; each pair
      // costs <= 2·2^p register rows of integer work. Every float step
      // is the shared engine-neutral fragment, so even the compounded
      // overlap estimates hash-gate.
      (s, dir) => Sketches.hllPairOverlap(
          TextOps.shingleSet(docsSpread(s, dir), 5, carry = Seq("source")),
          "source", col("s"), 8)
        .orderBy("group_a", "group_b"),
      Some {
        val estFrag = Sketches.hllEstSql(8)
        s"""WITH tok AS ($tokCte), sh5 AS (${sh(5)}),
          v AS (SELECT source AS g, ${h60("s")} AS h FROM sh5),
          rg AS (SELECT g, h % 256 AS bucket,
              max(CASE WHEN h // 256 = 0 THEN 53
                  ELSE 53 - length(bin(h // 256)) END) AS r
            FROM v GROUP BY 1, 2),
          e AS (SELECT g, 256 - present AS zeros,
              dpres + (256 - present) * (CAST(1 AS BIGINT) << 53) AS dscaled
            FROM (SELECT g, count(*) AS present,
                sum(CAST(1 AS BIGINT) << (53 - r)) AS dpres
              FROM rg GROUP BY g)),
          se AS (SELECT g, $estFrag AS est FROM e),
          pr AS (SELECT a.g AS ga, b.g AS gb FROM se a JOIN se b ON a.g < b.g),
          mg AS (SELECT ga, gb, bucket, max(r) AS r FROM (
              SELECT pr.ga, pr.gb, rg.bucket, rg.r FROM pr JOIN rg ON rg.g = pr.ga
              UNION ALL
              SELECT pr.ga, pr.gb, rg.bucket, rg.r FROM pr JOIN rg ON rg.g = pr.gb)
            GROUP BY 1, 2, 3),
          eu AS (SELECT ga, gb, 256 - present AS zeros,
              dpres + (256 - present) * (CAST(1 AS BIGINT) << 53) AS dscaled
            FROM (SELECT ga, gb, count(*) AS present,
                sum(CAST(1 AS BIGINT) << (53 - r)) AS dpres
              FROM mg GROUP BY 1, 2)),
          su AS (SELECT ga, gb, $estFrag AS est_union FROM eu)
          SELECT su.ga AS group_a, su.gb AS group_b,
            sa.est AS est_a, sb.est AS est_b, su.est_union,
            ${graft.regrid.Rounding.sqlRoundN(
              "greatest(sa.est + sb.est - su.est_union, 0.0e0)", 6)} AS overlap_est
          FROM su JOIN se sa ON sa.g = su.ga JOIN se sb ON sb.g = su.gb
          ORDER BY group_a, group_b"""
      }),

    QueryDef("q_hll_merge",
      // the sketch PERSISTENCE lifecycle (SketchIO), oracle-proven: the
      // corpus is split into two snapshots (doc_id parity — the per-day
      // ingest stand-in), each snapshot's HLL register file is WRITTEN
      // to Parquet (V8 no-clobber), read back, and max-merged; the
      // estimate over the merged file must equal the direct full-corpus
      // register replay BIT-FOR-BIT (max-merge of register files IS the
      // union's file — exact, not approximate), which is exactly what
      // the oracle computes without ever seeing the snapshot files.
      // The 100 TB shape: per-day distinct accounting from persisted
      // 2^p-row summaries, old corpora never re-scanned.
      (s, dir) => {
        val sh5 = TextOps.shingleSet(docsSpread(s, dir), 5, carry = Seq("source"))
        val base = sketchIoPath(s)
        SketchIO.writeSketch(
          Sketches.hllSketch(sh5.filter(col("doc_id") % 2 === 0), "source", col("s"), 8),
          s"$base/hll_even.parquet")
        SketchIO.writeSketch(
          Sketches.hllSketch(sh5.filter(col("doc_id") % 2 === 1), "source", col("s"), 8),
          s"$base/hll_odd.parquet")
        Sketches.hllEstimate(
          SketchIO.mergeHll(Seq(
            SketchIO.readSketch(s, s"$base/hll_even.parquet"),
            SketchIO.readSketch(s, s"$base/hll_odd.parquet")), "source"),
          "source", 8).orderBy("source")
      },
      Some {
        s"""WITH tok AS ($tokCte), sh5 AS (${sh(5)}),
          v AS (SELECT source AS g, ${h60("s")} AS h FROM sh5),
          rg AS (SELECT g, h % 256 AS bucket,
              max(CASE WHEN h // 256 = 0 THEN 53
                  ELSE 53 - length(bin(h // 256)) END) AS r
            FROM v GROUP BY 1, 2),
          e AS (SELECT g, 256 - present AS zeros,
              dpres + (256 - present) * (CAST(1 AS BIGINT) << 53) AS dscaled
            FROM (SELECT g, count(*) AS present,
                sum(CAST(1 AS BIGINT) << (53 - r)) AS dpres
              FROM rg GROUP BY g))
          SELECT g AS source, ${Sketches.hllEstSql(8)} AS est_hll
          FROM e ORDER BY source"""
      }),

    QueryDef("q_corpus_layout",
      // the corpus STORAGE-LAYOUT lifecycle (CorpusIO), oracle-proven
      // layout-invariant: the corpus is rewritten partitioned by lang
      // (hive directories → planning-time partition pruning) and
      // range-clustered + sorted on n_chars (parquet footer stats →
      // read-time file/row-group skipping), then a selective question
      // — one language, one length band — is answered THROUGH the
      // layout round-trip. The oracle computes the same answer from
      // the raw pile, so the gate proves the layout changes the scan
      // cost (probe section `layout`) and nothing else. The 100 TB
      // shape: every selective downstream job reads only its
      // directory's files instead of the whole corpus.
      (s, dir) => {
        val base = sketchIoPath(s)
        val path = s"$base/corpus_lang"
        CorpusIO.writeLayout(docs(s, dir), path,
          partitionCols = Seq("lang"), sortCols = Seq("n_chars"),
          fileTargets = 8)
        CorpusIO.readLayout(s, path)
          .filter(col("lang") === "en" && col("n_chars").between(200, 800))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents
        WHERE lang = 'en' AND n_chars BETWEEN 200 AND 800
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("q_corpus_append",
      // the layout LIFECYCLE oracle-proven end to end (the AnnIO
      // append/compact discipline applied to the corpus store): the
      // even-doc_id half is snapshotted, the odd half lands as an
      // ingest-batch APPEND (staged against the spec stored in the
      // snapshot's _layout_meta — new files only, existing files and
      // the old corpus untouched), the appended snapshot is COMPACTED
      // to a fresh one (meta-driven, file count and non-overlapping
      // per-file sort ranges restored), and the selective question is
      // answered through the compacted round-trip while the oracle
      // reads the raw pile. Write → append → compact must be exactly
      // row-preserving or the hash breaks. The 100 TB shape: daily
      // ingest appends O(batch), periodic compaction restores scan
      // economics, old snapshots stay immutable history.
      (s, dir) => {
        val base = sketchIoPath(s)
        val d = docs(s, dir)
        val path = s"$base/corpus_appended"
        CorpusIO.writeLayout(d.filter(col("doc_id") % 2 === 0), path,
          partitionCols = Seq("lang"), sortCols = Seq("n_chars"),
          fileTargets = 8)
        CorpusIO.appendLayout(d.filter(col("doc_id") % 2 === 1), path,
          fileTargets = 4)
        CorpusIO.compactLayout(s, path, s"$base/corpus_compacted",
          fileTargets = 8)
        CorpusIO.readLayout(s, s"$base/corpus_compacted")
          .filter(col("lang") === "de" && col("n_chars").between(300, 900))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents
        WHERE lang = 'de' AND n_chars BETWEEN 300 AND 900
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("q_corpus_zorder",
      // the multi-column layout (CorpusIO z-order), oracle-proven
      // layout-invariant: the corpus is rewritten clustered on the
      // Morton interleave of (n_chars, doc_id) equal-frequency ranks,
      // then a TWO-column selective question is answered through the
      // round-trip while the oracle reads the raw pile. The scan
      // economics — either column's range predicate alone skips files
      // — are measured in probe `zorder` (single-key sort: 2% on its
      // key, 73% off it; z-order: ≤13% on both) and pinned in
      // CorpusIOSpec; the gate proves the curve changes nothing else.
      (s, dir) => {
        val base = sketchIoPath(s)
        val path = s"$base/corpus_z"
        CorpusIO.writeLayoutZordered(docs(s, dir), path,
          partitionCols = Nil, zCols = Seq("n_chars", "doc_id"),
          bits = 4, fileTargets = 8)
        CorpusIO.readLayout(s, path)
          .filter(col("n_chars").between(250, 600) &&
            col("doc_id").between(100, 400))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            min("doc_id").as("min_doc"),
            max("doc_id").as("max_doc"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM documents
        WHERE n_chars BETWEEN 250 AND 600 AND doc_id BETWEEN 100 AND 400
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("q_kmv_jaccard",
      // pairwise source-overlap estimation from KMV sketches ALONE
      // (sketches are closed under union: merge + re-truncate IS the
      // union's sketch; inclusion–exclusion gives Jaccard) — corpus
      // touched once for the sketch agg, then O(k) array algebra on
      // |sources|² broadcast-sized rows. The exact per-pair Jaccard
      // rides along (independently computed on both engines) to
      // calibrate the estimates in the same gated artifact.
      (s, dir) => {
        val sh = TextOps.shingleSet(docs(s, dir), 5, carry = Seq("source"))
        val est = Sketches.kmvPairSimilarity(sh, "source", col("s"), 128)
        val v = sh.select(col("source"), Sketches.hash60(col("s")).as("h")).distinct()
        val sizes = v.groupBy("source").agg(count(lit(1)).as("nd"))
        val inter = v.toDF("ga", "h").join(v.toDF("gb", "h"), Seq("h"))
          .where(col("ga") < col("gb"))
          .groupBy("ga", "gb").agg(count(lit(1)).as("inter"))
        est
          .join(inter, est("group_a") === inter("ga") && est("group_b") === inter("gb"), "left")
          .join(broadcast(sizes.toDF("group_a", "na")), "group_a")
          .join(broadcast(sizes.toDF("group_b", "nb")), "group_b")
          .withColumn("inter", coalesce(col("inter"), lit(0L)))
          .withColumn("jaccard_exact", expr(
            """floor((CAST(inter AS DOUBLE)
               / CAST(na + nb - inter AS DOUBLE)) * 1.0e6 + 0.5e0) / 1.0e6"""))
          .select("group_a", "group_b", "est_a", "est_b", "est_union",
            "jaccard_est", "jaccard_exact")
          .orderBy("group_a", "group_b")
      },
      Some {
        val k = 128
        def est(m: String) =
          s"""CASE WHEN len($m) < $k THEN CAST(len($m) AS DOUBLE)
              ELSE floor((${(k - 1).toDouble}e0
                / (CAST($m[$k] AS DOUBLE) / 1.152921504606846976e18))
                * 1.0e3 + 0.5e0) / 1.0e3 END"""
        s"""WITH tok AS ($tokCte), sh5 AS (${sh(5)}),
          v AS (SELECT DISTINCT source AS g, ${h60("s")} AS h FROM sh5),
          sk AS (SELECT g, list_slice(list(h ORDER BY h), 1, $k) AS mins
            FROM v GROUP BY g),
          sz AS (SELECT g, CAST(count(*) AS BIGINT) AS nd FROM v GROUP BY g),
          pairs AS (SELECT a.g AS group_a, b.g AS group_b, a.mins AS ma, b.mins AS mb,
              list_slice(list_sort(list_distinct(list_concat(a.mins, b.mins))), 1, $k) AS mu
            FROM sk a JOIN sk b ON a.g < b.g),
          ij AS (SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS inter
            FROM v a JOIN v b ON a.h = b.h AND a.g < b.g GROUP BY 1, 2),
          e AS (SELECT group_a, group_b,
              ${est("ma")} AS est_a, ${est("mb")} AS est_b, ${est("mu")} AS est_union
            FROM pairs)
          SELECT e.group_a, e.group_b, e.est_a, e.est_b, e.est_union,
            floor((greatest(e.est_a + e.est_b - e.est_union, 0.0e0) / e.est_union)
              * 1.0e6 + 0.5e0) / 1.0e6 AS jaccard_est,
            floor((CAST(coalesce(ij.inter, 0) AS DOUBLE)
              / CAST(sa.nd + sb.nd - coalesce(ij.inter, 0) AS DOUBLE))
              * 1.0e6 + 0.5e0) / 1.0e6 AS jaccard_exact
          FROM e LEFT JOIN ij ON ij.ga = e.group_a AND ij.gb = e.group_b
            JOIN sz sa ON sa.g = e.group_a
            JOIN sz sb ON sb.g = e.group_b
          ORDER BY e.group_a, e.group_b"""
      }),

    QueryDef("q_cm_frequency",
      // Count-Min frequency sketch (Sketches.cmSketch): token
      // frequencies of the full corpus compressed to a 4×1024
      // additive counter matrix (map-side combined — the exchange
      // carries ≤ d·w rows per partition at any corpus size), then
      // point-queried for the fixed language-marker vocabulary with
      // the exact counts riding along for calibration. CM is the
      // frequency complement of the KMV distinct sketch; additivity
      // makes it partitioning-invariant and mergeable across corpus
      // snapshots, so even the ESTIMATES hash-gate (est_cm ≥ n_exact
      // always — the one-sided error bound — pinned in scalatest).
      (s, dir) => {
        import s.implicits._
        val toks = TextOps.withTokens(docs(s, dir)).selectExpr("explode(tokens) AS token")
        val sk = Sketches.cmSketch(toks, col("token"), depth = 4, width = 1024)
        val probes = TextOps.langMarkers.flatMap(_._2).distinct.sorted.toDF("token")
        val exact = toks.join(broadcast(probes), Seq("token"), "left_semi")
          .groupBy("token").agg(count(lit(1)).as("n_exact"))
        Sketches.cmEstimate(sk, probes, "token", depth = 4, width = 1024)
          .join(exact, Seq("token"), "left")
          .na.fill(0L, Seq("n_exact"))
          .select("token", "n_exact", "est_cm")
          .orderBy("token")
      },
      Some(cmFrequencyOracleSql)),

    QueryDef("q_cm_merge",
      // X57's Count-Min leg, oracle-proven: two doc_id-parity snapshot
      // counter matrices are WRITTEN to Parquet, read back, and summed
      // elementwise (counters are linear, so the merge IS the sketch of
      // the concatenated corpora — exact); the point estimates over the
      // merged sketch must equal q_cm_frequency's direct full-corpus
      // sketch BIT-FOR-BIT, which is what the SHARED oracle SQL
      // (verbatim — result identity proven through the oracle channel,
      // the asofOracleSql precedent) computes without seeing the files.
      (s, dir) => {
        import s.implicits._
        val d = docs(s, dir)
        def toks(dd: org.apache.spark.sql.DataFrame) =
          TextOps.withTokens(dd).selectExpr("explode(tokens) AS token")
        val base = sketchIoPath(s)
        SketchIO.writeSketch(
          Sketches.cmSketch(toks(d.filter(col("doc_id") % 2 === 0)), col("token"), 4, 1024),
          s"$base/cm_even.parquet")
        SketchIO.writeSketch(
          Sketches.cmSketch(toks(d.filter(col("doc_id") % 2 === 1)), col("token"), 4, 1024),
          s"$base/cm_odd.parquet")
        val sk = SketchIO.mergeCm(Seq(
          SketchIO.readSketch(s, s"$base/cm_even.parquet"),
          SketchIO.readSketch(s, s"$base/cm_odd.parquet")))
        val probes = TextOps.langMarkers.flatMap(_._2).distinct.sorted.toDF("token")
        val exact = toks(d).join(broadcast(probes), Seq("token"), "left_semi")
          .groupBy("token").agg(count(lit(1)).as("n_exact"))
        Sketches.cmEstimate(sk, probes, "token", depth = 4, width = 1024)
          .join(exact, Seq("token"), "left")
          .na.fill(0L, Seq("n_exact"))
          .select("token", "n_exact", "est_cm")
          .orderBy("token")
      },
      Some(cmFrequencyOracleSql)),

    QueryDef("q_skew_report",
      // key-skew histogram over token frequencies (the Zipf tail that
      // makes vocabulary joins straggle): per-key counts bucketed by
      // bit length — exact integer bucketing via length(bin(cnt)), no
      // float-log edge cases — with per-bucket key counts, row volume,
      // worst key, and row share. One map-side-combined count agg +
      // a tiny bucket agg.
      (s, dir) => Diagnostics.keySkewReport(
          TextOps.withTokens(docs(s, dir)).selectExpr("explode(tokens) AS token"),
          Seq("token"))
        .orderBy("bucket_bits"),
      Some(s"""WITH tok AS ($tokCte),
        x AS (SELECT unnest(tokens) AS token FROM tok),
        c AS (SELECT token, count(*) AS cnt FROM x GROUP BY 1),
        n AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
        SELECT CAST(length(bin(cnt)) AS INTEGER) AS bucket_bits,
          count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total_rows,
          max(cnt) AS max_count,
          floor((CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE)
            / CAST(n.total AS DOUBLE)) * 1.0e9 + 0.5e0) / 1.0e9 AS row_share
        FROM c CROSS JOIN n
        GROUP BY 1, n.total ORDER BY 1""")),

    QueryDef("q_corpus_rollup",
      // OLAP subtotal lattice over the corpus: (source, lang) counts
      // and char volumes with per-source and grand-total subtotals in
      // ONE pass — Spark's rollup() emits the partial-agg-friendly
      // grouping-sets plan (no per-level rescans). Aggregated-out
      // keys are coalesced to 'ALL' on both engines so the subtotal
      // rows hash-compare exactly.
      (s, dir) => docs(s, dir)
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .select(coalesce(col("source"), lit("ALL")).as("source"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          col("n_docs"), col("sum_chars"))
        .orderBy("source", "lang"),
      Some("""SELECT coalesce(source, 'ALL') AS source,
          coalesce(lang, 'ALL') AS lang,
          count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY ROLLUP(source, lang)
        ORDER BY source, lang""")),

    QueryDef("q_doc_fingerprint",
      (s, dir) => TextOps.fingerprint(docs(s, dir)).orderBy("doc_id"),
      Some(s"""WITH tok AS ($tokCte)
        SELECT doc_id, list_aggregate(list_transform(
            list_transform(generate_series(0, len(tokens) - 5),
              i -> array_to_string(list_slice(tokens, i + 1, i + 5), ' ')),
            s -> md5(s)), 'min') AS fp
        FROM tok WHERE len(tokens) >= 5 ORDER BY doc_id""")),

    QueryDef("q_minhash_sig",
      (s, dir) => TextOps.minhash(docsSpread(s, dir)).orderBy("doc_id", "seed"),
      Some(s"""WITH tok AS ($tokCte), sh5 AS (${sh(5)}),
        m AS (SELECT doc_id, ${h60("s")} % ${TextOps.minhashM} AS m FROM sh5),
        perm AS (SELECT * FROM (VALUES ${(0 until 16).map(i =>
          s"(${i}, ${TextOps.minhashA(i)}, ${TextOps.minhashB(i)})").mkString(", ")})
          t(seed, a, b))
        SELECT doc_id, CAST(seed AS INTEGER) AS seed,
          min((a * m + b) % ${TextOps.minhashP}) AS minhash
        FROM m, perm GROUP BY 1, 2 ORDER BY doc_id, seed""")),

    QueryDef("q_minhash_bands_stateless",
      // the streaming-safe signature path: band signatures computed as
      // ONE per-row array projection (no per-doc groupBy — what lets
      // nearDupFlagsStream run on an unaggregated stream, and what a
      // 100 TB batch side computes with zero exchanges). Must emit the
      // IDENTICAL (doc_id, band, sig) rows as the grouped chain, so
      // the oracle is the grouped chain.
      (s, dir) => TextOps.bandSigsStateless(docs(s, dir))
        .orderBy("doc_id", "band"),
      Some(s"""WITH $minhashBandCtes
        SELECT doc_id, CAST(band AS INTEGER) AS band, sig
        FROM bands ORDER BY doc_id, band""")),

    QueryDef("q_simhash",
      (s, dir) => TextOps.simhash(docs(s, dir)).orderBy("doc_id"),
      Some(s"""WITH $simhashCtes
        SELECT doc_id, simhash FROM sim ORDER BY doc_id""")),

    QueryDef("q_simhash_neardup",
      // EXACT Hamming-≤3 near-dup join over the 60-bit signatures via
      // the pigeonhole band join (4 bands × 15 bits: ≤3 differing bits
      // cannot touch all 4 bands, so the per-band chunk equi-join
      // provably misses nothing — a complete candidate set, unlike the
      // probabilistic MinHash/hyperplane LSH). The oracle states the
      // semantics declaratively as the all-pairs Hamming filter.
      (s, dir) => Dedup.simhashNearDup(docsSpread(s, dir), 3).orderBy("a", "b"),
      Some(s"""WITH $simhashCtes,
        c AS (SELECT x.doc_id AS a, y.doc_id AS b,
                CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
              FROM sim x JOIN sim y ON x.doc_id < y.doc_id)
        SELECT a, b, hamming FROM c WHERE hamming <= 3 ORDER BY a, b""")),

    // ---- dedup ----

    QueryDef("q_dedup_exact",
      (s, dir) => Dedup.exact(docs(s, dir)).orderBy("h"),
      Some("""SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keep_id,
          count(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY h""")),

    QueryDef("q_dedup_minhash",
      // sharded since r13: the sf10 rehearsal put the full-corpus LSH
      // oracle past a 10-minute cap (clone-quadratic candidate set) —
      // same adaptive-shard treatment as the closure oracles, identity
      // below the cap
      (s, dir) => Dedup.minhashLsh(docsShardedSpread(s, dir)).orderBy("a", "b"),
      Some(s"""WITH $minhashCtesSharded
        $jaccardSelect ORDER BY a, b""")),

    QueryDef("q_dedup_incremental",
      // incremental-ingest near-dup: every 20th doc plays the NEW
      // batch, the rest the standing corpus — pairs touching the batch
      // (batch↔corpus + batch↔batch) with exact-Jaccard verify, and
      // the corpus pair space never self-joins. The oracle states the
      // semantics declaratively: the full LSH pair relation filtered
      // to batch-touching pairs.
      (s, dir) => {
        val all = docs(s, dir)
        Dedup.minhashLshIncremental(
          all.filter("doc_id % 20 != 7"), all.filter("doc_id % 20 = 7"))
          .orderBy("a", "b")
      },
      Some(s"""WITH $minhashCtes
        SELECT * FROM ($jaccardSelect) j
        WHERE a % 20 = 7 OR b % 20 = 7 ORDER BY a, b""")),

    QueryDef("q_dedup_clusters",
      // duplicate-CLUSTER resolution: connected components over the
      // LSH near-dup pairs (jaccard >= 0.5), every clustered doc
      // labeled with its component's min doc_id — the canonical-keeper
      // step a training pipeline runs after pair generation. Spark:
      // min-label propagation with pointer jumping (O(log diameter)
      // equi-join rounds); oracle: recursive transitive closure.
      (s, dir) => Dedup.clusters(
        Dedup.minhashLsh(docsShardedSpread(s, dir)).filter(col("jaccard") >= 0.5))
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $minhashCtesSharded,
        j AS ($jaccardSelect),
        ed AS (SELECT a AS x, b AS y FROM j WHERE jaccard >= 0.5e0
               UNION SELECT b AS x, a AS y FROM j WHERE jaccard >= 0.5e0),
        nodes AS (SELECT DISTINCT x AS id FROM ed),
        reach(id, r) AS (
          SELECT id, id AS r FROM nodes
          UNION
          SELECT reach.id, ed.y AS r FROM reach JOIN ed ON ed.x = reach.r
        )
        SELECT id AS doc_id, min(r) AS cluster_id FROM reach
        GROUP BY id ORDER BY doc_id""")),

    QueryDef("q_dedup_keep_best",
      // the retention decision after clustering: keep each near-dup
      // group's highest-QUALITY doc (argmax score, ties min id) — the
      // min-id cluster label names the group, the best doc survives.
      // Oracle: the recursive-closure chain + the quality CTE + the
      // same argmax window.
      (s, dir) => {
        val d = docsShardedSpread(s, dir)
        Dedup.keepBest(
          Dedup.clusters(Dedup.minhashLsh(d).filter(col("jaccard") >= 0.5)),
          TextOps.qualityScore(d).select("doc_id", "score"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $minhashCtesSharded,
        j AS ($jaccardSelect),
        ed AS (SELECT a AS x, b AS y FROM j WHERE jaccard >= 0.5e0
               UNION SELECT b AS x, a AS y FROM j WHERE jaccard >= 0.5e0),
        nodes AS (SELECT DISTINCT x AS id FROM ed),
        reach(id, r) AS (
          SELECT id, id AS r FROM nodes
          UNION
          SELECT reach.id, ed.y AS r FROM reach JOIN ed ON ed.x = reach.r
        ),
        cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        qm AS (SELECT doc_id,
                 CAST(len(tokens) AS INTEGER) AS n_tokens,
                 CAST(${hits(TextOps.langMarkers.head._2)} AS DOUBLE) / len(tokens) AS stop_ratio,
                 CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio
               FROM tok),
        sc AS (SELECT doc_id,
                 floor((0.3e0 * stop_ratio + 0.4e0 * alpha_ratio +
                   0.3e0 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0e0)) * 1.0e9 + 0.5e0) / 1.0e9 AS score
               FROM qm),
        x AS (SELECT cl.doc_id, cl.cluster_id, sc.score,
                row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, cl.doc_id) AS rn
              FROM cl JOIN sc USING (doc_id))
        SELECT doc_id, cluster_id, score, rn = 1 AS keep
        FROM x ORDER BY doc_id""")),

    QueryDef("q_ngram_jaccard",
      // sharded since r13 (same sf10 finding as q_dedup_minhash: the
      // all-collision intersection CTE is quadratic in clone count)
      (s, dir) => Dedup.ngramJaccardBlocked(docsShardedSpread(s, dir), 3, 0.3).orderBy("a", "b"),
      Some(s"""WITH tok AS ($tokShardCte), sh3 AS (${sh(3)}),
        sz AS (SELECT doc_id, count(*) AS n FROM sh3 GROUP BY 1),
        inter AS (SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS i
                  FROM sh3 sa JOIN sh3 sb
                    ON sa.source = sb.source AND sa.s = sb.s AND sa.doc_id < sb.doc_id
                  GROUP BY 1, 2)
        SELECT * FROM ($jaccardSelect) j WHERE jaccard >= 0.3e0 ORDER BY a, b""")),

    QueryDef("q_ngram_jaccard_capped",
      // the df-cap variant — the hot-shingle skew guard actually
      // exercised: shingles appearing in more than maxDocFreq documents
      // are dropped BEFORE the inverted-index self-join (a boilerplate
      // shingle shared by 10⁶ docs would put 10¹² pairs in one join
      // key), and Jaccard is over the RETAINED shingle space (both
      // |A∩B| and the sizes) — the oracle mirrors that space exactly.
      (s, dir) => Dedup.ngramJaccardBlocked(docs(s, dir), 3, 0.3,
          maxDocFreq = Some(2)).orderBy("a", "b"),
      Some(s"""WITH tok AS ($tokCte), sh3 AS (${sh(3)}),
        rare AS (SELECT s FROM sh3 GROUP BY s HAVING count(*) <= 2),
        shr AS (SELECT sh3.* FROM sh3 JOIN rare USING (s)),
        sz AS (SELECT doc_id, count(*) AS n FROM shr GROUP BY 1),
        inter AS (SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS i
                  FROM shr sa JOIN shr sb
                    ON sa.source = sb.source AND sa.s = sb.s AND sa.doc_id < sb.doc_id
                  GROUP BY 1, 2)
        SELECT * FROM ($jaccardSelect) j WHERE jaccard >= 0.3e0 ORDER BY a, b""")),

    QueryDef("q_embedding_stats",
      // per-(label, dim) embedding moments on the shared 1e-4
      // quantization lattice: integer-exact sums make mean/variance
      // bit-deterministic under any partitioning (raw float sums
      // would drift in the low bits). One posexplode + one hash agg,
      // map-side combined; output is 64x|labels| rows at any corpus
      // size.
      (s, dir) => Similarity.embeddingMoments(emb(s, dir), 64)
        .orderBy("label", "pos"),
      Some("""WITH q AS (SELECT label,
            CAST(generate_subscripts(emb, 1) - 1 AS INTEGER) AS pos,
            round(unnest(emb) * 10000.0e0) AS qv
          FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)),
        g AS (SELECT label, pos, count(*) AS n,
            CAST(sum(qv) AS BIGINT) AS sum_q,
            CAST(sum(qv * qv) AS BIGINT) AS sum_q2
          FROM q GROUP BY 1, 2)
        SELECT label, pos, n,
          floor((CAST(sum_q AS DOUBLE) / CAST(n AS DOUBLE) / 1.0e4)
            * 1.0e9 + 0.5e0) / 1.0e9 AS mean,
          floor(((CAST(sum_q2 AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(sum_q AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(sum_q AS DOUBLE) / CAST(n AS DOUBLE))) / 1.0e8)
            * 1.0e9 + 0.5e0) / 1.0e9 AS variance
        FROM g ORDER BY label, pos""")),

    QueryDef("q_embedding_robust_stats",
      // exact per-dimension median + MAD on the quantization lattice
      // (outlier-immune drift stats) — the exact-order-statistics
      // machinery keyed per dimension, median re-centering via a
      // broadcast 64-row join, no per-dimension sorts. Oracle = the
      // declarative per-pos row_number ranks both passes avoid.
      (s, dir) => Similarity.embeddingRobustStats(emb(s, dir), 64)
        .orderBy("pos"),
      Some("""WITH qv AS (SELECT
            CAST(generate_subscripts(emb, 1) - 1 AS INTEGER) AS pos,
            CAST(round(unnest(emb) * 10000.0e0) AS BIGINT) AS q
          FROM (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)),
        n AS (SELECT pos, count(*) AS c FROM qv GROUP BY 1),
        r AS (SELECT pos, q, row_number() OVER
            (PARTITION BY pos ORDER BY q) AS rn FROM qv),
        med AS (SELECT r.pos, r.q AS med_q FROM r JOIN n ON r.pos = n.pos
          AND r.rn = (50 * n.c + 99) // 100),
        d AS (SELECT qv.pos, abs(qv.q - med.med_q) AS adev
          FROM qv JOIN med ON qv.pos = med.pos),
        r2 AS (SELECT pos, adev, row_number() OVER
            (PARTITION BY pos ORDER BY adev) AS rn FROM d),
        mad AS (SELECT r2.pos, r2.adev AS mad_q FROM r2 JOIN n ON r2.pos = n.pos
          AND r2.rn = (50 * n.c + 99) // 100)
        SELECT n.pos, n.c AS n,
          floor((CAST(med.med_q AS DOUBLE) / 1.0e4) * 1.0e9 + 0.5e0) / 1.0e9 AS median,
          floor((CAST(mad.mad_q AS DOUBLE) / 1.0e4) * 1.0e9 + 0.5e0) / 1.0e9 AS mad
        FROM n JOIN med ON n.pos = med.pos JOIN mad ON n.pos = mad.pos
        ORDER BY n.pos""")),

    QueryDef("q_embedding_cosine",
      // EXACT all-pairs near-dup, distributed shape: block-pair
      // replication → shuffled hash EQUI-join (no nested loop), pair
      // cosine evaluated exactly once. Same semantics as the naive
      // quadratic join, so the oracle stays the declarative all-pairs
      // statement.
      (s, dir) => Similarity.nearDupPairsBlocked(embSharded(s, dir), 0.45).orderBy("a", "b"),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                          WHERE $embShardSql),
        p AS (SELECT a.vec_id AS a, b.vec_id AS b, ${cosSql("a.v", "b.v")} AS cos
              FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT * FROM p WHERE cos >= 0.45e0 ORDER BY a, b""")),

    QueryDef("q_embedding_cosine_lsh",
      // THE HEADLINE LSH CONTRACT, re-pointed (r7, per the r6 verdict)
      // at the regime the 100 TB near-dup pass actually runs in:
      // planted cos≈0.999 partners (each vec_id % 40 = 0 gets
      // a deterministically perturbed copy at +1e6 — both engines
      // derive the identical doubles from md5 noise) with the 8 bands ×
      // 8 bits config at threshold 0.9. Here sign-LSH prunes hard
      // (random pairs collide at ~1-(1-0.5^8)^8 ≈ 3% of all-pairs;
      // candidates ≤ 3% asserted in PipelineSpec) while planted recall
      // stays ≈ 1 (per-band agreement 0.98^8, 8 chances) — the
      // selectivity that justifies LSH, now hash-verified cross-engine.
      (s, dir) => {
        val noise = "(CAST(" + TextOps.hash60(
          "concat('hc:', CAST(vec_id AS STRING), ':', CAST(j AS STRING))") +
          " % 2001 AS DOUBLE) - 1000.0D) / 1000.0D"
        val base = embSharded(s, dir)
        val aug = base
          .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
          .unionByName(base.filter("vec_id % 40 = 0").selectExpr(
            s"""transform(embedding, (x, j) ->
                CAST(x AS DOUBLE) * (1.0D + 0.03D * $noise)) AS embedding""",
            "vec_id + 1000000 AS vec_id"))
        Similarity.nearDupPairsBanded(aug, 0.9, bands = 8, rowsPerBand = 8)
          .orderBy("a", "b")
      },
      Some {
        val noise = "(CAST(" + h60(
          "concat('hc:', CAST(vec_id AS VARCHAR), ':', CAST(j - 1 AS VARCHAR))") +
          " % 2001 AS DOUBLE) - 1000.0e0) / 1000.0e0"
        s"""WITH eb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                        WHERE $embShardSql),
        pl AS (SELECT vid + 1000000 AS vec_id, v FROM (
                 SELECT vec_id AS vid,
                   list_transform(generate_series(1, 64), j ->
                     v[j] * (1.0e0 + 0.03e0 * $noise)) AS v
                 FROM eb WHERE vec_id % 40 = 0)),
        e AS (SELECT vec_id, v FROM eb UNION ALL SELECT vec_id, v FROM pl),
        sigs AS MATERIALIZED (${bandedSigBranches(8, 8)}),
        cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
                 FROM sigs x JOIN sigs y ON x.band = y.band AND x.sig = y.sig
                 WHERE x.vec_id < y.vec_id),
        p AS (SELECT cand.a, cand.b, ${cosSql("ea.v", "eb2.v")} AS cos
              FROM cand JOIN e ea ON ea.vec_id = cand.a
                        JOIN e eb2 ON eb2.vec_id = cand.b)
        SELECT * FROM p WHERE cos >= 0.9e0 ORDER BY a, b"""
      }),

    QueryDef("q_embedding_cosine_lsh_recall",
      // the LOW-threshold recall-regime fixture, kept deliberately
      // SMALL (half corpus): 24 bands × 4 sign bits at threshold 0.45,
      // where per-band agreement for random pairs is high (p = 0.5 ⇒
      // candidates ≈ 0.8× all-pairs — sign-LSH's own documented
      // worst case, Similarity.nearDupPairsBanded scaladoc) but recall
      // vs exact all-pairs is ≥ 0.99. The half-corpus filter cuts the
      // near-quadratic candidate volume 4× so the worst-regime
      // coverage stays cross-engine-verified without being the
      // heaviest query in the bench (the r6 verdict's one `weak`).
      (s, dir) => Similarity.nearDupPairsBanded(
        embSharded(s, dir).filter("vec_id % 2 = 0"), 0.45)
        .orderBy("a", "b"),
      Some {
        // MATERIALIZED: keeps the CASE-heavy signature CTE out of the
        // join inlining path (DuckDB 1.0.0 flat-vector bug)
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                       WHERE vec_id % 2 = 0 AND $embShardSql),
        sigs AS MATERIALIZED (${bandedSigBranches(24, 4)}),
        cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
                 FROM sigs x JOIN sigs y ON x.band = y.band AND x.sig = y.sig
                 WHERE x.vec_id < y.vec_id),
        p AS (SELECT cand.a, cand.b, ${cosSql("ea.v", "eb.v")} AS cos
              FROM cand JOIN e ea ON ea.vec_id = cand.a
                        JOIN e eb ON eb.vec_id = cand.b)
        SELECT * FROM p WHERE cos >= 0.45e0 ORDER BY a, b"""
      }),

    // ---- similarity search ----

    QueryDef("q_ann_topk",
      // the EXACT brute-force baseline — quadratic BY DEFINITION
      // (every probe × every corpus vector), so unlike the index
      // fixtures it cannot go linear by capping probes alone: the
      // r13 ladder's slowest engine query (412 s) and only over-cap
      // oracle (2,914 s at sf10). r13 verdict #1: the shard restricts
      // BOTH sides symmetrically — corpus via [[embSharded]], probes
      // via the adaptive stride — so the baseline costs the same at
      // every rung ≥ sf0.1 (and is bit-identical below, modulus 1).
      (s, dir) => Similarity.bruteTopK(embSharded(s, dir),
          annProbePred(s, dir), 5)
        .orderBy("query_id", "rank"),
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                WHERE $embShardSql),
        c AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                ${cosSql("q.v", "n.v")} AS cos
              FROM e q JOIN e n ON q.vec_id <> n.vec_id
              WHERE ${annProbeSql("q.vec_id")}),
        r AS (SELECT *, CAST(row_number() OVER
                (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
              FROM c)
        SELECT * FROM r WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("q_ann_ivf",
      (s, dir) => Similarity.ivfTopK(emb(s, dir), annProbePred(s, dir), 5)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank"),
      Some(s"""WITH $ivfCtes,
        c AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                ${cosSql("q.v", "n.v")} AS cos
              FROM eb q JOIN eb n ON q.bucket = n.bucket AND q.vec_id <> n.vec_id
              WHERE ${annProbeSql("q.vec_id")}),
        r AS (SELECT *, CAST(row_number() OVER
                (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
              FROM c)
        SELECT * FROM r WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("q_ann_ivf_mp",
      // multi-probe IVF: each query scans its bucket + every Hamming-1
      // neighbor bucket — the recall lever beyond nprobe=1 (neighbors
      // that land just across one sign boundary are recovered at
      // (bits+1)x candidate volume); still a pure bucket equi-join.
      // r15 verdict #2: corpus capped via [[embSharded]] (identity
      // below sf0.1) so the oracle replays at sf100 — see
      // [[ivfShardCtes]] for why q_ann_ivf keeps the full corpus.
      (s, dir) => Similarity.ivfTopK(embSharded(s, dir), annProbePred(s, dir), 5,
        hammingProbes = true)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank"),
      Some {
        val flips = (0L +: (0 until 6).map(i => 1L << i)).map(f => s"($f)").mkString(", ")
        s"""WITH $ivfShardCtes,
        qp AS (SELECT vec_id, v, xor(CAST(bucket AS BIGINT), f) AS bucket
               FROM eb CROSS JOIN (VALUES $flips) t(f)
               WHERE ${annProbeSql("vec_id")}),
        c AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                ${cosSql("q.v", "n.v")} AS cos
              FROM qp q JOIN eb n ON q.bucket = CAST(n.bucket AS BIGINT)
                AND q.vec_id <> n.vec_id),
        r AS (SELECT *, CAST(row_number() OVER
                (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
              FROM c)
        SELECT * FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
      }),

    QueryDef("q_ann_filtered",
      // FILTERED vector search, pre-filter semantics: top-k among
      // neighbors whose metadata satisfies the predicate (here
      // `label = 1`, ~10% selectivity) — the serving shape behind
      // "nearest English docs" / "nearest from source X". The filter
      // lands on the index side BEFORE the bucket join (pushed into
      // the index scan, candidate volume shrinks with selectivity),
      // not as a post-filter over an over-provisioned k that a
      // selective predicate could empty entirely. Multi-probe stays on
      // because filtered buckets are ~10x sparser — the recall lever
      // and the filter compose, still one bucket equi-join.
      (s, dir) => Similarity.ivfTopK(emb(s, dir), annProbePred(s, dir), 5,
        hammingProbes = true, indexFilter = "label = 1")
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank"),
      Some {
        val flips = (0L +: (0 until 6).map(i => 1L << i)).map(f => s"($f)").mkString(", ")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        eb AS (SELECT vec_id, v, label, ${bucketSql("v")} AS bucket FROM e),
        qp AS (SELECT vec_id, v, xor(CAST(bucket AS BIGINT), f) AS bucket
               FROM eb CROSS JOIN (VALUES $flips) t(f)
               WHERE ${annProbeSql("vec_id")}),
        c AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                ${cosSql("q.v", "n.v")} AS cos
              FROM qp q JOIN eb n ON q.bucket = CAST(n.bucket AS BIGINT)
                AND q.vec_id <> n.vec_id
              WHERE n.label = 1),
        r AS (SELECT *, CAST(row_number() OVER
                (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
              FROM c)
        SELECT * FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
      }),

    QueryDef("q_decontam_semantic",
      // embedding-space decontamination: train vectors within cosine
      // 0.8 of any EVAL vector, candidates via the same Hamming-1
      // multi-probe sign-bucket equi-join as q_ann_ivf_mp with the
      // SMALL eval side replicated — catches paraphrase-level
      // benchmark leakage that the token-level q_decontam /
      // q_decontam_fuzzy passes cannot. The eval split is a planted
      // LEAK: every 50th corpus vector, scaled + offset (cos ≈ 1 to
      // its source, while the corpus's own max cross-pair cosine is
      // 0.44) — so the gate checks that exactly the leaked partners
      // surface, through the bucket discipline, not a full scan.
      // r13: input sharded (the oracle's bucket-join cosine chain ran
      // 591 s at sf10 — one rehearsal scale from the cap) and the
      // planted ids are NEGATIVE (-vec_id - 1) instead of +1e6: the
      // additive offset collides with real ids once the corpus holds
      // >1M embeddings, a ceiling the negative range never has.
      (s, dir) => {
        val base = embSharded(s, dir)
        val planted = base.filter("vec_id % 50 = 0")
          .selectExpr("-vec_id - 1 AS vec_id",
            "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.02e0 + 0.01e0 AS FLOAT)) AS embedding",
            "label")
        Similarity.semanticDecontamFlags(
            base.unionByName(planted), "vec_id < 0", 0.8e0)
          .orderBy("train_id", "eval_id")
      },
      Some {
        val flips = (0L +: (0 until 6).map(i => 1L << i)).map(f => s"($f)").mkString(", ")
        s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE $embShardSql),
        e AS (SELECT vec_id, v FROM e0
              UNION ALL
              SELECT -vec_id - 1 AS vec_id,
                list_transform(v, x -> CAST(CAST(x * 1.02e0 + 0.01e0 AS FLOAT) AS DOUBLE)) AS v
              FROM e0 WHERE vec_id % 50 = 0),
        eb AS (SELECT vec_id, v, ${bucketSql("v")} AS bucket FROM e),
        qp AS (SELECT vec_id, v, xor(CAST(bucket AS BIGINT), f) AS bucket
               FROM eb CROSS JOIN (VALUES $flips) t(f)
               WHERE vec_id < 0),
        c AS (SELECT n.vec_id AS train_id, q.vec_id AS eval_id,
                ${cosSql("n.v", "q.v")} AS cos
              FROM qp q JOIN eb n ON q.bucket = CAST(n.bucket AS BIGINT)
              WHERE n.vec_id >= 0)
        SELECT train_id, eval_id, cos FROM c WHERE cos >= 0.8e0
        ORDER BY train_id, eval_id"""
      }),

    // ---- events / time series ----

    QueryDef("q_events_window",
      (s, dir) => Events.hourly(events(s, dir)).orderBy("hour", "event_type"),
      Some(s"""WITH ev AS ($evCte)
        SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
          count(DISTINCT user_id) AS n_users
        FROM ev GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q_events_sessions",
      (s, dir) => Events.sessions(events(s, dir)).orderBy("user_id", "session_idx"),
      Some(s"""WITH ev AS ($evCte),
        x AS (SELECT user_id, event_id, ts, value,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM ev),
        y AS (SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new FROM x),
        z AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM y)
        SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end,
          count(*) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM z GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q_events_funnel",
      // ordered-step funnel view → click → purchase: per user the
      // earliest t1 <= t2 <= t3 chain, partial funnels kept (greedy
      // earliest-completion is exact — min t_i only loosens later
      // constraints). Plan: one filtered scan + user_id equi-join +
      // hash agg per step, never a per-user sort/window over events.
      (s, dir) => Events.funnel(events(s, dir), Seq("view", "click", "purchase"))
        .orderBy("user_id"),
      Some(s"""WITH ev AS ($evCte),
        s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
               WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM ev e
               JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM ev e
               JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)
        SELECT s1.user_id, s1.t1, s2.t2, s3.t3
        FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
                LEFT JOIN s3 ON s1.user_id = s3.user_id
        ORDER BY s1.user_id""")),

    QueryDef("q_events_funnel_steps",
      // funnel conversion summary: users reaching each step
      // (non-increasing by construction) — one pass over the per-user
      // funnel relation
      (s, dir) => Events.funnelSteps(events(s, dir), Seq("view", "click", "purchase"))
        .orderBy("step_idx"),
      Some(s"""WITH ev AS ($evCte),
        s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
               WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM ev e
               JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM ev e
               JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)
        SELECT 1 AS step_idx, 'view' AS event_type,
          CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
        UNION ALL SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
        ORDER BY step_idx""")),

    QueryDef("q_events_retention",
      // cohort retention triangle: signup-week cohorts × weekly-active
      // users at each week offset. Plan: filtered-scan hash agg for
      // cohorts, distinct (user, week) for activity, one user_id
      // equi-join, one (cohort, offset) agg — no windows or sorts.
      (s, dir) => Events.retentionCohorts(events(s, dir), "signup")
        .orderBy("cohort_week", "week_offset"),
      Some(s"""WITH ev AS ($evCte),
        c AS (SELECT user_id,
                CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
              FROM ev WHERE event_type = 'signup' GROUP BY 1),
        a AS (SELECT DISTINCT user_id,
                CAST(date_trunc('week', ts) AS DATE) AS act_week FROM ev)
        SELECT c.cohort_week,
          CAST(date_diff('day', c.cohort_week, a.act_week) // 7 AS INTEGER)
            AS week_offset,
          CAST(count(*) AS BIGINT) AS n_users
        FROM a JOIN c ON a.user_id = c.user_id
        WHERE a.act_week >= c.cohort_week
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q_item_cooccurrence",
      // association mining over the events stream: users co-viewing
      // item pairs + lift, the co-view recommender primitive. Exact
      // (uncapped) here so the oracle is a plain self-join; the
      // maxPerUser skew cap is scalatest-pinned (deterministic
      // smallest-hash basket sampling).
      (s, dir) => Events.coOccurrence(events(s, dir), "view",
          maxPerUser = 0, minSupport = 2)
        .orderBy("item_a", "item_b"),
      Some("""WITH it AS (SELECT DISTINCT user_id,
            CAST(json_extract_string(props, '$.k') AS INTEGER) AS item
          FROM events WHERE event_type = 'view'),
        n AS (SELECT count(DISTINCT user_id) AS nu FROM it),
        pi AS (SELECT item, count(*) AS n_item FROM it GROUP BY 1),
        pr AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_co
          FROM it a JOIN it b ON a.user_id = b.user_id AND a.item < b.item
          GROUP BY 1, 2)
        SELECT pr.item_a, pr.item_b, pr.n_co,
          floor((CAST(pr.n_co AS DOUBLE) * CAST(n.nu AS DOUBLE)
            / (CAST(pa.n_item AS DOUBLE) * CAST(pb.n_item AS DOUBLE)))
            * 1.0e9 + 0.5e0) / 1.0e9 AS lift
        FROM pr JOIN pi pa ON pr.item_a = pa.item
          JOIN pi pb ON pr.item_b = pb.item
          CROSS JOIN n
        WHERE pr.n_co >= 2
        ORDER BY item_a, item_b""")),

    QueryDef("q_rolling_anomaly",
      // X61: rolling trailing-window anomaly detection — each event's
      // z-score against the mean/std of the PRIOR 8 values of its own
      // (user, event_type) metric stream, flagged at |z| > 3 with >= 4
      // rows of history. Plan: one (user_id, event_type) exchange +
      // within-partition sort, a single WindowExec buffering <= 8 rows
      // per frame — no global sort, no self-join. Window sums in exact
      // DECIMAL; the double mean/var/std/z expressions and the flag
      // predicate are mirrored verbatim in the oracle.
      (s, dir) => Events.rollingAnomaly(events(s, dir)).orderBy("event_id"),
      Some(s"""WITH ev AS ($evCte),
        w AS (SELECT event_id, user_id, event_type, ts, value,
                CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vu
              FROM ev),
        x AS (SELECT *,
                CAST(count(vu) OVER wnd AS INTEGER) AS n_prior,
                sum(CAST(vu AS DECIMAL(18,0))) OVER wnd AS su,
                sum(CAST(vu AS DECIMAL(18,0)) * CAST(vu AS DECIMAL(18,0)))
                  OVER wnd AS ssq
              FROM w
              WINDOW wnd AS (PARTITION BY user_id, event_type
                ORDER BY ts, event_id
                ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)),
        nm AS (SELECT *,
                CAST(n_prior AS DECIMAL(2,0)) * CAST(ssq AS DECIMAL(36,0))
                  - CAST(su AS DECIMAL(19,0)) * CAST(su AS DECIMAL(19,0)) AS num
              FROM x),
        y AS (SELECT *,
                CASE WHEN n_prior > 0
                  THEN CAST(su AS DOUBLE) / 1.0e6 / CAST(n_prior AS DOUBLE) END AS mean,
                CASE WHEN n_prior > 0 THEN CAST(num AS DOUBLE)
                  / (CAST(n_prior AS DOUBLE) * CAST(n_prior AS DOUBLE)) / 1.0e12 END AS var
              FROM nm),
        zz AS (SELECT *, sqrt(var) AS std FROM y),
        a AS (SELECT *,
                CASE WHEN std > 0.0e0 THEN (value - mean) / std END AS zs,
                CASE WHEN std > 0.0e0 THEN
                  least(greatest((value - mean) / std, -1.0e9), 1.0e9) END AS zc
              FROM zz)
        SELECT event_id, user_id, event_type, ts, value, n_prior,
          ${r9("mean")} AS roll_mean, ${r9("std")} AS roll_std,
          ${r9("zc")} AS z,
          coalesce(n_prior >= 4 AND std > 0.0e0 AND abs(zs) > 3.0e0, false)
            AS is_anomaly
        FROM a ORDER BY event_id""")),

    QueryDef("q_graph_triangles",
      // per-node triangle counts + local clustering coefficient over
      // the co-view item graph (edges = q_item_cooccurrence pairs with
      // support >= 2). The Spark plan uses degree orientation — wedges
      // only at each node's out-neighbors, O(m^1.5) worst case, hub
      // nodes emit nothing — while the oracle states the naive
      // three-way self-join it replaces; identical per-node counts
      // prove the orientation loses and double-counts nothing.
      (s, dir) => Graphs.triangleStats(
          Events.coOccurrence(events(s, dir), "view", 0, 2)
            .select(col("item_a").as("a"), col("item_b").as("b")))
        .orderBy("node"),
      Some("""WITH it AS (SELECT DISTINCT user_id,
            CAST(json_extract_string(props, '$.k') AS INTEGER) AS item
          FROM events WHERE event_type = 'view'),
        pr AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_co
          FROM it a JOIN it b ON a.user_id = b.user_id AND a.item < b.item
          GROUP BY 1, 2),
        e AS (SELECT CAST(item_a AS BIGINT) AS a, CAST(item_b AS BIGINT) AS b
          FROM pr WHERE n_co >= 2),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1 JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
            SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri) GROUP BY 1)
        SELECT deg.node, deg.degree,
          coalesce(pn.n_tri, CAST(0 AS BIGINT)) AS n_tri,
          CASE WHEN deg.degree < 2 THEN 0.0e0
            ELSE floor((2.0e0 * CAST(coalesce(pn.n_tri, 0) AS DOUBLE)
              / (CAST(deg.degree AS DOUBLE) * CAST(deg.degree - 1 AS DOUBLE)))
              * 1.0e9 + 0.5e0) / 1.0e9 END AS clustering
        FROM deg LEFT JOIN pn ON deg.node = pn.node
        ORDER BY deg.node""")),

    QueryDef("q_graph_pagerank",
      // 5 rounds of fixed-point PageRank over the co-view item graph:
      // ranks are BIGINT multiples of 1e-12, contributions integer
      // divisions, so the result is bit-identical across engines,
      // partitionings, and shuffle orders — float PageRank can't
      // hash-gate, this can. Oracle replays the 5 rounds declaratively.
      (s, dir) => Graphs.pageRankFixedPoint(
          Events.coOccurrence(events(s, dir), "view", 0, 2)
            .select(col("item_a").as("a"), col("item_b").as("b")), 5)
        .orderBy("node"),
      Some {
        val iters = 5
        val sc = Graphs.PrScale
        val rounds = (1 to iters).map { r =>
          s"""p$r AS MATERIALIZED (
            SELECT od.src AS node,
              (($sc * 15 // 100) // nn.n) + (coalesce(c.s, 0) * 85 // 100) AS pr
            FROM od CROSS JOIN nn LEFT JOIN (
              SELECT e.dst, CAST(sum(p${r - 1}.pr // od.od) AS BIGINT) AS s
              FROM p${r - 1} JOIN od ON od.src = p${r - 1}.node
                JOIN e ON e.src = p${r - 1}.node
              GROUP BY 1) c ON c.dst = od.src)"""
        }
        s"""WITH it AS (SELECT DISTINCT user_id,
            CAST(json_extract_string(props, '$$.k') AS INTEGER) AS item
          FROM events WHERE event_type = 'view'),
        co AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_co
          FROM it a JOIN it b ON a.user_id = b.user_id AND a.item < b.item
          GROUP BY 1, 2),
        und AS (SELECT CAST(item_a AS BIGINT) AS a, CAST(item_b AS BIGINT) AS b
          FROM co WHERE n_co >= 2),
        e AS (SELECT a AS src, b AS dst FROM und
          UNION ALL SELECT b AS src, a AS dst FROM und),
        od AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM od),
        p0 AS (SELECT src AS node, ($sc // n) AS pr FROM od CROSS JOIN nn),
        ${rounds.mkString(",\n")}
        SELECT node, pr AS pr_fixed,
          floor((CAST(pr AS DOUBLE) / $sc.0e0) * 1.0e9 + 0.5e0) / 1.0e9 AS pr
        FROM p$iters ORDER BY node"""
      }),

    QueryDef("q_asof_join",
      // backward inclusive as-of join (point-in-time enrichment): each
      // event picks the latest order of its user at or before a
      // per-event cutoff, ties on o_orderdate broken by greatest
      // o_orderkey. The generator's event clock (2024) postdates every
      // order (1995–2001), which would make "latest order <= ts" the
      // degenerate per-user max — so the cutoff is derived
      // deterministically from event_id to sweep the whole order-date
      // range, exercising per-event winners AND the no-match null path
      // (cutoffs before the user's first order). Plan: ONE shuffle on
      // user_id + per-key window — no range-join explosion, no per-row
      // subquery (see Temporal.asofJoin scaladoc for the 100 TB
      // mega-key variant).
      (s, dir) => {
        val e = events(s, dir).select(col("event_id"), col("user_id"),
          col("event_type"),
          expr("timestamp(date_add(DATE '1995-01-01', CAST(event_id % 2500 AS INT)))")
            .as("cutoff"))
        Temporal.asofJoin(e, Temporal.loadOrders(s, dir),
            leftKey = "user_id", rightKey = "o_custkey",
            leftTs = "cutoff", rightTs = "o_orderdate",
            tieBreak = "o_orderkey",
            payload = Seq("o_orderkey", "o_orderdate", "o_totalprice"),
            prefix = "last_")
          .orderBy("event_id")
      },
      Some(asofOracleSql)),

    QueryDef("q_asof_join_bucketed",
      // the MEGA-KEY as-of variant through the oracle channel (r8
      // verdict #4): same inputs, same semantics, but the plan splits
      // each key's timeline into fixed-width buckets — per-(key,bucket)
      // windows plus a one-row-per-bucket carry-forward summary join —
      // so ONE hot key spreads across the cluster instead of
      // serializing one task (asofskew probe: 15.8 s single-task →
      // 5.9 s at 1000 buckets on a 10M-row key). Result-identical to
      // asofJoin by construction; the oracle SQL is the q_asof_join
      // oracle VERBATIM, so the hash gate proves it, exactly as
      // q_kmeans_twolevel did for two-level training. Bucket width
      // 180 days (micros) puts the 1995–2001 order range across ~14
      // buckets, exercising both the in-bucket and the carried-summary
      // match paths.
      (s, dir) => {
        val e = events(s, dir).select(col("event_id"), col("user_id"),
          col("event_type"),
          expr("timestamp(date_add(DATE '1995-01-01', CAST(event_id % 2500 AS INT)))")
            .as("cutoff"))
        Temporal.asofJoinBucketed(e, Temporal.loadOrders(s, dir),
            leftKey = "user_id", rightKey = "o_custkey",
            leftTs = "cutoff", rightTs = "o_orderdate",
            tieBreak = "o_orderkey",
            payload = Seq("o_orderkey", "o_orderdate", "o_totalprice"),
            bucketWidth = 180L * 86400L * 1000000L,
            prefix = "last_")
          .orderBy("event_id")
      },
      Some(asofOracleSql)),

    QueryDef("q_range_join",
      // interval containment join via the bucketed equi-join reduction
      // (Temporal.rangeJoin): each event's synthetic cutoff (same
      // formula as q_asof_join) against its user's 30-day order
      // windows — multiplicity 0..n per event, overlapping windows
      // included. The plan is an EQUI-join on (user_id, time-bucket)
      // with the range predicate residual, never a per-key cross
      // product; the oracle states the naive inequality join the plan
      // avoids.
      (s, dir) => {
        val e = events(s, dir).select(col("event_id"), col("user_id"),
          expr("timestamp(date_add(DATE '1995-01-01', CAST(event_id % 2500 AS INT)))")
            .as("cutoff"))
        val o = Temporal.loadOrders(s, dir).select(
          col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").as("win_start"),
          expr("o_orderdate + INTERVAL 30 DAY").as("win_end"))
        Temporal.rangeJoin(e, o, "user_id", "o_custkey",
            "cutoff", "win_start", "win_end", bucketSec = 30L * 86400L)
          .select("event_id", "user_id", "cutoff", "o_orderkey", "win_start")
          .orderBy("event_id", "o_orderkey")
      },
      Some(s"""WITH e AS (SELECT event_id, user_id,
            CAST(DATE '1995-01-01' + CAST(event_id % 2500 AS INTEGER) AS TIMESTAMP)
              AS cutoff
          FROM events),
        o AS (SELECT o_custkey, o_orderkey,
            make_timestamp(epoch_ns(o_orderdate) // 1000) AS win_start
          FROM orders)
        SELECT e.event_id, e.user_id, e.cutoff, o.o_orderkey, o.win_start
        FROM e JOIN o ON o.o_custkey = e.user_id
          AND e.cutoff >= o.win_start
          AND e.cutoff < o.win_start + INTERVAL 30 DAY
        ORDER BY event_id, o_orderkey""")),

    // ---- multimodal binary plumbing ----

    QueryDef("q_multimodal_meta",
      (s, dir) => Multimodal.metaRelational(docs(s, dir)).orderBy("doc_id"),
      Some(s"""SELECT doc_id,
          CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
          CAST(64 + ${h60("text")} % 448 AS INTEGER) AS width,
          CAST(64 + (${h60("text")} // 448) % 448 AS INTEGER) AS height,
          CASE WHEN ${h60("text")} % 3 = 0 THEN 'jpeg'
               WHEN ${h60("text")} % 3 = 1 THEN 'png' ELSE 'webp' END AS format
        FROM documents ORDER BY doc_id""")),

    QueryDef("q_multimodal_decode",
      // REAL codec round-trip: synthesize a deterministic solid-color
      // PNG per doc (ImageIO encode), decode it back (ImageIO decode),
      // extract per-channel pixel means. The oracle recomputes the
      // expected shape/means analytically from the same content hash —
      // any codec or plumbing fault breaks the hash compare.
      (s, dir) => Multimodal.decodePng(s, Multimodal.withPngPayload(s, docs(s, dir)))
        .select("doc_id", "img_w", "img_h", "mean_r", "mean_g", "mean_b")
        .orderBy("doc_id"),
      Some(s"""WITH h AS (SELECT doc_id, ${h60("text")} AS h FROM documents)
        SELECT doc_id,
          CAST(16 + h % 48 AS INTEGER) AS img_w,
          CAST(16 + (h // 48) % 48 AS INTEGER) AS img_h,
          CAST((h % 16777216) // 65536 AS DOUBLE) AS mean_r,
          CAST(((h % 16777216) // 256) % 256 AS DOUBLE) AS mean_g,
          CAST((h % 16777216) % 256 AS DOUBLE) AS mean_b
        FROM h ORDER BY doc_id""")),

    QueryDef("q_multimodal_resize",
      // decode → 2x nearest-neighbor downscale on real pixels →
      // features of the RESIZED image; oracle: halved hash-derived
      // dims, means invariant for the solid fill
      (s, dir) => Multimodal.resizePng(s, Multimodal.withPngPayload(s, docs(s, dir)))
        .orderBy("doc_id"),
      Some(s"""WITH h AS (SELECT doc_id, ${h60("text")} AS h FROM documents)
        SELECT doc_id,
          CAST((16 + h % 48) // 2 AS INTEGER) AS rw,
          CAST((16 + (h // 48) % 48) // 2 AS INTEGER) AS rh,
          CAST((h % 16777216) // 65536 AS DOUBLE) AS mean_r,
          CAST(((h % 16777216) // 256) % 256 AS DOUBLE) AS mean_g,
          CAST((h % 16777216) % 256 AS DOUBLE) AS mean_b
        FROM h ORDER BY doc_id""")),

    QueryDef("q_multimodal_gradient",
      // gradient fixture: pixel (x,y) = (x, y, (x+y) mod 256), means in
      // closed form — catches pixel-order/stride/transpose faults the
      // solid-color fixture is blind to (a transposed decode swaps
      // mean_r/mean_g; a stride fault smears the ramp)
      (s, dir) => Multimodal.decodePng(s, Multimodal.withGradientPngPayload(s, docs(s, dir)))
        .select("doc_id", "img_w", "img_h", "mean_r", "mean_g", "mean_b")
        .orderBy("doc_id"),
      Some(s"""WITH h AS (SELECT doc_id, ${h60("text")} AS h FROM documents),
        d AS (SELECT doc_id,
          CAST(16 + h % 48 AS INTEGER) AS img_w,
          CAST(16 + (h // 48) % 48 AS INTEGER) AS img_h FROM h)
        SELECT doc_id, img_w, img_h,
          (CAST(img_w AS DOUBLE) - 1.0e0) / 2.0e0 AS mean_r,
          (CAST(img_h AS DOUBLE) - 1.0e0) / 2.0e0 AS mean_g,
          (CAST(img_w AS DOUBLE) - 1.0e0) / 2.0e0
            + (CAST(img_h AS DOUBLE) - 1.0e0) / 2.0e0 AS mean_b
        FROM d ORDER BY doc_id""")),

    QueryDef("q_multimodal_gradient_resize",
      // decode -> 2x NN downscale of the gradient: sampled values are
      // 2x', 2y', so the resized means are rw-1, rh-1, rw+rh-2 — a
      // sampling-offset fault (in(2x+1) etc.) shifts them
      (s, dir) => Multimodal.resizePng(s, Multimodal.withGradientPngPayload(s, docs(s, dir)))
        .orderBy("doc_id"),
      Some(s"""WITH h AS (SELECT doc_id, ${h60("text")} AS h FROM documents),
        d AS (SELECT doc_id,
          CAST((16 + h % 48) // 2 AS INTEGER) AS rw,
          CAST((16 + (h // 48) % 48) // 2 AS INTEGER) AS rh FROM h)
        SELECT doc_id, rw, rh,
          CAST(rw AS DOUBLE) - 1.0e0 AS mean_r,
          CAST(rh AS DOUBLE) - 1.0e0 AS mean_g,
          (CAST(rw AS DOUBLE) - 1.0e0) + (CAST(rh AS DOUBLE) - 1.0e0) AS mean_b
        FROM d ORDER BY doc_id""")),

    QueryDef("q_multimodal_frames",
      // video column (ARRAY<BINARY> of real PNG frames) → sample every
      // 2nd frame → decode → per-frame channel means; oracle derives
      // the same frame colors from the content hash
      (s, dir) => Multimodal.sampleFrames(s,
        Multimodal.withVideoPayload(s, docs(s, dir)), step = 2)
        .orderBy("doc_id", "frame_idx"),
      Some(s"""WITH h AS (SELECT doc_id, ${h60("text")} AS h FROM documents),
        f AS (SELECT doc_id, h, unnest(range(3 + h % 5)) AS i FROM h)
        SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
          CAST(((h + i * 2654435761) % 16777216) // 65536 AS DOUBLE) AS mean_r,
          CAST((((h + i * 2654435761) % 16777216) // 256) % 256 AS DOUBLE) AS mean_g,
          CAST(((h + i * 2654435761) % 16777216) % 256 AS DOUBLE) AS mean_b
        FROM f WHERE i % 2 = 0 ORDER BY doc_id, frame_idx""")),

    QueryDef("q_image_neardup",
      // perceptual IMAGE near-dup (r15 verdict #4 — the visual analog
      // of q_simhash_neardup): block-pattern PNGs per doc with planted
      // RESIZED re-encodes (every 25th, id -2d-1) and one-block
      // PERTURBED re-encodes (every 40th, id -2d-2), then decode →
      // 8×8 nearest-neighbor tiny raster → 56-bit dHash → 2×28-bit
      // pigeonhole band join → Hamming-≤1 verify. All codec work is
      // real (ImageIO both directions; the copies share no BYTES with
      // their source), while the oracle derives every dHash in closed
      // form from the content hash — the q_multimodal_gradient
      // discipline — and states the semantics as the declarative
      // all-pairs Hamming filter (band completeness is the pigeonhole
      // theorem, scalatest-pinned). Doc-sharded from day one (r15
      // verdict #8): identity ≤ sf0.1, and past it the oracle's
      // all-pairs statement stays at sf0.1 volume while the engine
      // path keeps its banded (never all-pairs) shape on real data.
      (s, dir) => ImageDedup.nearDupPairs(s, docsSharded(s, dir), maxHamming = 1)
        .orderBy("a", "b"),
      Some(s"""WITH hh AS (SELECT doc_id, ${h60("text")} AS h FROM documents
          WHERE $docShardSql),
        ids AS (SELECT doc_id AS id, h, 0 AS pert FROM hh
          UNION ALL SELECT -2 * doc_id - 1, h, 0 FROM hh WHERE doc_id % 25 = 0
          UNION ALL SELECT -2 * doc_id - 2, h, 1 FROM hh WHERE doc_id % 40 = 0),
        g0 AS (SELECT id, b, pert, h,
            (h + (b + 1) * 2654435761) % 1000003 AS v
          FROM ids, range(64) r(b)),
        g AS (SELECT id, b,
            CASE WHEN pert = 1 AND (b // 8) = h % 8 AND (b % 8) = 0
              THEN ((v * v) % 1000003 % 256 + 128) % 256
              ELSE (v * v) % 1000003 % 256 END AS gray
          FROM g0),
        bits AS (SELECT g1.id, (g1.b // 8) * 7 + (g1.b % 8) AS k,
            CASE WHEN g2.gray > g1.gray THEN 1 ELSE 0 END AS bit
          FROM g g1 JOIN g g2 ON g2.id = g1.id AND g2.b = g1.b + 1
          WHERE g1.b % 8 <= 6),
        dh AS (SELECT id, CAST(sum(CASE WHEN bit = 1
              THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS dhash
          FROM bits GROUP BY id),
        c AS (SELECT x.id AS a, y.id AS b,
            CAST(bit_count(xor(x.dhash, y.dhash)) AS INTEGER) AS hamming
          FROM dh x JOIN dh y ON x.id < y.id)
        SELECT a, b, hamming FROM c WHERE hamming <= 1 ORDER BY a, b""")),

    QueryDef("q_audio_decode",
      // audio twin of q_multimodal_decode: synthesize a REAL RIFF/WAV
      // PCM payload per doc (in-repo codec — canonical 44-byte header
      // + 16-bit LE samples from an integer hash recurrence), parse it
      // back (magic/fmt validation), reduce to integer signal
      // statistics (peak, energy, zero crossings — exact on both
      // engines, no float ULP risk). The oracle regenerates the same
      // PCM from the content hash and aggregates it declaratively.
      // Doc-sharded since r15 (r14 verdict #1): the oracle is per-doc
      // LINEAR but materializes ~1150 synthetic samples per doc — at
      // 5M docs DuckDB spills on the 5.75B-row unnest, so the sf100
      // rung was stuck oracle-at-sf10. The adaptive block shard
      // (identity ≤ sf0.1) holds the oracle's unnest at sf0.1 volume
      // at every rung while the ENGINE payload path stays exercised
      // on real sharded data end-to-end.
      (s, dir) => Multimodal.decodeWavFeatures(s,
        Multimodal.withWavPayload(s, docsSharded(s, dir))).orderBy("doc_id"),
      Some(s"""WITH hh AS (SELECT doc_id, ${h60("text")} AS h FROM documents
          WHERE $docShardSql),
        spec AS (SELECT doc_id,
            CAST(CASE h % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                 WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
            256 + (h // 4) % 1792 AS ns, h % 1000003 AS hm FROM hh),
        s AS (SELECT doc_id, sample_rate, ns, hm,
                unnest(generate_series(0, ns - 1)) AS i FROM spec),
        v AS (SELECT doc_id, sample_rate, ns, i,
                (hm * 31 + i * 2654435761) % 65536 - 32768 AS v FROM s),
        w AS (SELECT *, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM v)
        SELECT doc_id, min(sample_rate) AS sample_rate,
          CAST(count(*) AS BIGINT) AS n_samples,
          CAST(min(ns) * 1000 // min(sample_rate) AS BIGINT) AS duration_ms,
          CAST(max(abs(v)) AS BIGINT) AS peak_abs,
          CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
          CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) != (v < 0))
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
        FROM w GROUP BY doc_id ORDER BY doc_id""")),

    QueryDef("q_audio_resample",
      // decode → decimate by 2 (keep every 2nd sample — the audio twin
      // of the 2x image downscale) → features of the RESAMPLED signal;
      // zero crossings re-counted over the kept subsequence, so a
      // wrong stride or offset breaks the hash. Doc-sharded since r15
      // (r14 verdict #1) — same rationale as q_audio_decode.
      (s, dir) => Multimodal.resampleWav(s,
        Multimodal.withWavPayload(s, docsSharded(s, dir)), factor = 2)
        .orderBy("doc_id"),
      Some(s"""WITH hh AS (SELECT doc_id, ${h60("text")} AS h FROM documents
          WHERE $docShardSql),
        spec AS (SELECT doc_id,
            CAST(CASE h % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                 WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
            256 + (h // 4) % 1792 AS ns, h % 1000003 AS hm FROM hh),
        s AS (SELECT doc_id, sample_rate, ns, hm,
                unnest(generate_series(0, ns - 1)) AS i FROM spec),
        k AS (SELECT doc_id, sample_rate, i,
                (hm * 31 + i * 2654435761) % 65536 - 32768 AS v
              FROM s WHERE i % 2 = 0),
        w AS (SELECT *, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM k)
        SELECT doc_id, CAST(min(sample_rate) // 2 AS INTEGER) AS out_rate,
          CAST(count(*) AS BIGINT) AS n_samples,
          CAST(max(abs(v)) AS BIGINT) AS peak_abs,
          CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
          CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) != (v < 0))
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
        FROM w GROUP BY doc_id ORDER BY doc_id""")),

    // ---- decontamination / PII / sampling ----

    QueryDef("q_decontam",
      // benchmark decontamination: training docs sharing any 5-token
      // shingle with the eval split, with overlap evidence. Plan: eval
      // shingles broadcast, train side scanned once (never shuffled
      // before the match), per-doc distinct counts on the survivors.
      (s, dir) => {
        val d = docsSpread(s, dir)
        Decontam.contamination(
          d.filter(s"NOT ($evalPred)"), d.filter(evalPred), 5)
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS ($tokCte), sh5 AS (${sh(5)}),
        ev AS (SELECT doc_id AS eval_id, s FROM sh5 WHERE $evalPred),
        tr AS (SELECT doc_id, s FROM sh5 WHERE NOT ($evalPred))
        SELECT tr.doc_id, count(DISTINCT tr.s) AS n_shared,
          count(DISTINCT ev.eval_id) AS n_eval_docs
        FROM tr JOIN ev ON tr.s = ev.s
        GROUP BY 1 ORDER BY doc_id""")),

    QueryDef("q_decontam_bloom",
      // decontamination against a BLOOM filter of the eval shingle set
      // (Sketches.bloomBits/bloomMaybeContains): the eval index ships
      // as ≤ m set-bit positions instead of the raw n-gram relation —
      // the fixed-size-index variant of q_decontam for when the eval
      // side is itself huge (every benchmark's n-grams). Zero false
      // negatives by construction (spec-pinned: flagged ⊇ the exact
      // q_decontam doc set); false positives at the standard rate and
      // DETERMINISTIC (same md5-slice positions on both engines), so
      // the per-doc maybe-counts hash-gate exactly. Train side scanned
      // once, never shuffled before the broadcast-bits match.
      (s, dir) => {
        val d = docs(s, dir)
        val m = 65536; val k = 3
        val bits = Sketches.bloomBits(
          TextOps.shingleSet(d.filter(evalPred), 5), col("s"), m, k)
        Sketches.bloomMaybeContains(bits,
            TextOps.shingleSet(d.filter(s"NOT ($evalPred)"), 5)
              .select("doc_id", "s"),
            "s", m, k, carry = Seq("doc_id"))
          .filter(col("maybe_present"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_maybe"))
          .orderBy("doc_id")
      },
      Some(bloomDecontamOracleSql)),

    QueryDef("q_bloom_merge",
      // X57's Bloom leg, oracle-proven: the eval index is built as two
      // doc_id-parity snapshot bit relations WRITTEN to Parquet, read
      // back, and distinct-unioned (the filter of a union is the union
      // of the filters — a set, exact); probing the train side against
      // the merged filter must flag exactly q_decontam_bloom's docs
      // with the same maybe-counts, which the SHARED oracle SQL
      // (verbatim) computes from the whole eval set without seeing the
      // snapshot files. The per-benchmark workflow: each new eval suite
      // ships its own bit file; decontamination probes the merged set.
      (s, dir) => {
        val d = docs(s, dir)
        val m = 65536; val k = 3
        val base = sketchIoPath(s)
        def bitsOf(pred: String) = Sketches.bloomBits(
          TextOps.shingleSet(d.filter(pred), 5), col("s"), m, k)
        SketchIO.writeSketch(bitsOf(s"($evalPred) AND doc_id % 2 = 0"),
          s"$base/bloom_even.parquet")
        SketchIO.writeSketch(bitsOf(s"($evalPred) AND doc_id % 2 = 1"),
          s"$base/bloom_odd.parquet")
        val bits = SketchIO.mergeBloom(Seq(
          SketchIO.readSketch(s, s"$base/bloom_even.parquet"),
          SketchIO.readSketch(s, s"$base/bloom_odd.parquet")))
        Sketches.bloomMaybeContains(bits,
            TextOps.shingleSet(d.filter(s"NOT ($evalPred)"), 5)
              .select("doc_id", "s"),
            "s", m, k, carry = Seq("doc_id"))
          .filter(col("maybe_present"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_maybe"))
          .orderBy("doc_id")
      },
      Some(bloomDecontamOracleSql)),

    QueryDef("q_decontam_keep",
      // the surviving corpus after "any overlap → drop": left-anti join
      // against the contaminated ids, per-source survivor counts
      (s, dir) => {
        val d = docs(s, dir)
        Decontam.decontaminate(
          d.filter(s"NOT ($evalPred)"), d.filter(evalPred), 5)
          .groupBy("source").agg(count("*").as("n_kept"))
          .orderBy("source")
      },
      Some(s"""WITH tok AS ($tokCte), sh5 AS (${sh(5)}),
        ev AS (SELECT doc_id AS eval_id, s FROM sh5 WHERE $evalPred),
        bad AS (SELECT DISTINCT tr.doc_id FROM sh5 tr JOIN ev ON tr.s = ev.s
                WHERE NOT (tr.$evalPred))
        SELECT source, count(*) AS n_kept FROM documents
        WHERE NOT ($evalPred) AND doc_id NOT IN (SELECT doc_id FROM bad)
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("q_pii_redact",
      // PII scrub: count + mask emails/phones/IPv4s injected
      // deterministically from doc_id (the synthetic corpus carries
      // none). Codegen'd regexp projection, no shuffle; identical
      // pattern strings run on both engines (Java regex ∩ RE2).
      (s, dir) => Pii.redact(
        docs(s, dir).selectExpr("doc_id", s"${piiInject("STRING")} AS text"))
        .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, ${piiInject("VARCHAR")} AS text FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, ${rx(Pii.emailPattern)})) AS INTEGER) AS n_email,
          CAST(len(regexp_extract_all(text, ${rx(Pii.phonePattern)})) AS INTEGER) AS n_phone,
          CAST(len(regexp_extract_all(text, ${rx(Pii.ipv4Pattern)})) AS INTEGER) AS n_ip,
          $redactSql AS redacted
        FROM d ORDER BY doc_id""")),

    QueryDef("q_sample_stratified",
      // deterministic per-source Bernoulli sample (corpus mixing):
      // hash-derived keep decision, pure codegen'd filter — zero
      // shuffles before the audit aggregate. Checksum pins exact
      // membership, not just counts.
      (s, dir) => Sampling.stratified(docs(s, dir), sampleRates, "r4")
        .groupBy("source")
        .agg(count("*").as("n_kept"), sum("doc_id").as("checksum"))
        .orderBy("source"),
      Some(s"""WITH u AS (SELECT source, doc_id, ${uSql("r4")} AS u FROM documents)
        SELECT source, count(*) AS n_kept,
          CAST(sum(doc_id) AS BIGINT) AS checksum
        FROM u WHERE u < $thrSql GROUP BY 1 ORDER BY 1""")),

    QueryDef("q_sample_stratum_topk",
      // exactly-10-per-source deterministic draw (eval-split carving).
      // Spark runs the two-level exact top-k (per-(partition, source)
      // pre-top-k bounds every sort group; a single stratum never lands
      // in one task); the oracle states the equivalent one-level rank.
      (s, dir) => Sampling.perStratumTopK(docs(s, dir), 10, "r4")
        .select("doc_id", "source", "rank")
        .orderBy("source", "rank"),
      Some(s"""WITH u AS (SELECT doc_id, source, ${uSql("r4")} AS u FROM documents),
        r AS (SELECT doc_id, source, CAST(row_number() OVER
                (PARTITION BY source ORDER BY u, doc_id) AS INTEGER) AS rank
              FROM u)
        SELECT doc_id, source, rank FROM r WHERE rank <= 10
        ORDER BY source, rank""")),

    QueryDef("q_kmeans",
      // distributed Lloyd's k-means (fixed 3 iterations, deterministic
      // init) — the semantic-dedup / learned-IVF backbone. Assignment
      // is a stateless map against broadcast centroids; the update
      // shuffles only per-partition dense accumulators. Bit-exact
      // cross-engine parity by construction (see kmeansCtes scaladoc).
      (s, dir) => Clustering.kmeans(emb(s, dir), kmK, kmIters)
        .select(col("vec_id"), col("cluster"),
          graft.regrid.Rounding.r9(col("dist2")).as("dist2"))
        .orderBy("vec_id"),
      Some(s"""WITH $kmeansCtes
        SELECT vec_id, cl AS cluster, ${r9("d")} AS dist2 FROM a$kmIters
        ORDER BY vec_id""")),

    QueryDef("q_centroid_refresh",
      // X70 under the ORACLE, not just the tolerance spec: the decayed
      // mini-batch centroid refresh is exact arithmetic — batch
      // assignment against the FINAL trained centroids (same quantized
      // L2 + (d, cl) tie-break as training), exact integer per-(cl, j)
      // batch sums, then c' = (pw·c + Σv)/(pw + n) in one
      // identically-shaped double expression per dim (untouched
      // centroids pass through bit-unchanged). The oracle replays the
      // unrolled Lloyd chain (c$kmIters−1 = the final model, the same
      // relation a$kmIters assigns against), re-assigns the batch, and
      // folds the same prior-weighted update. Output one row per
      // (cl, dim), r9-rounded on both engines.
      (s, dir) => {
        val e = emb(s, dir)
        val (_, cents) = Clustering.kmeansFull(e, kmK, kmIters)
        val refreshed = Clustering.refreshCentroids(
          cents, e.filter("vec_id % 3 = 0"), priorWeight = 500L)
        import s.implicits._
        refreshed.toSeq.flatMap { case (cl, c) =>
          c.zipWithIndex.map { case (v, j) => (cl, j, v) }
        }.toDF("cl", "dim", "val")
          .select(col("cl"), col("dim"),
            graft.regrid.Rounding.r9(col("val")).as("val"))
          .orderBy("cl", "dim")
      },
      Some(s"""WITH $kmeansCtes,
        b AS (SELECT vec_id, v FROM e WHERE vec_id % 3 = 0),
        ba AS (SELECT vec_id, v, cl FROM (
                SELECT b.vec_id, b.v, cf.cl,
                  row_number() OVER (PARTITION BY b.vec_id
                    ORDER BY ${pqDist("b.v", "cf.c")}, cf.cl) AS rn
                FROM b CROSS JOIN c${kmIters - 1} cf)
              WHERE rn = 1),
        bs AS (SELECT cl, j, sum(v[j]) AS s, count(*) AS n
               FROM ba CROSS JOIN generate_series(1, 64) t(j) GROUP BY 1, 2),
        cj AS (SELECT cl, j, c[j] AS cv
               FROM c${kmIters - 1} CROSS JOIN generate_series(1, 64) t(j)),
        r AS (SELECT cj.cl, cj.j,
                CASE WHEN bs.n IS NULL THEN cj.cv
                     ELSE (500.0e0 * cj.cv + bs.s)
                          / (500.0e0 + CAST(bs.n AS DOUBLE)) END AS val
              FROM cj LEFT JOIN bs ON bs.cl = cj.cl AND bs.j = cj.j)
        SELECT cl, CAST(j - 1 AS INTEGER) AS dim, ${r9("val")} AS val
        FROM r ORDER BY cl, dim""")),

    QueryDef("q_kmeans_twolevel",
      // the LARGE-K training scale path (kmeansFullTwoLevel: the
      // two-level coarse-then-fine scan inside every Lloyd round,
      // per-iteration cost sublinear in k — probe-measured at k=4096
      // on 1M vectors) under the DuckDB hash gate: with p = g every
      // coarse group is probed, so every per-round assignment — hence
      // the whole training trajectory — is bit-identical to the dense
      // rounds (scalatest-pinned), and the q_kmeans oracle applies
      // VERBATIM (r7 verdict #4: prove the scale path through the
      // oracle channel, not only scalatest).
      (s, dir) => Clustering.kmeansFullTwoLevel(emb(s, dir), kmK, kmIters,
          coarseGroups = 4, coarseProbes = 4)._1
        .select(col("vec_id"), col("cluster"),
          graft.regrid.Rounding.r9(col("dist2")).as("dist2"))
        .orderBy("vec_id"),
      Some(s"""WITH $kmeansCtes
        SELECT vec_id, cl AS cluster, ${r9("d")} AS dist2 FROM a$kmIters
        ORDER BY vec_id""")),

    QueryDef("q_ann_ivf_learned",
      // IVF with LEARNED cells: nearest-k-means-centroid replaces the
      // sign bucket — data-adaptive cells, same one-equi-join plan
      // shape as q_ann_ivf. Probe set matches q_ann_ivf for direct
      // comparability. Corpus capped via embSharded since r16
      // (identity below sf0.1) — see annIvfOracleSql's scaladoc.
      (s, dir) => Clustering.ivfLearnedTopK(embSharded(s, dir), annProbePred(s, dir), 5,
          kmK, kmIters)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank"),
      Some(annIvfOracleSql)),

    QueryDef("q_ann_ivf_persisted",
      // the learned-IVF index under the persistence gate — the
      // IvfIndex sibling of q_ann_pq_persisted: train, saveIvf (cell
      // assignment bucketed on vec_id, the key it joins the embedding
      // table on; centroids + meta alongside, meta last), loadIvf, and
      // serve through ivfQueryTopK. Must reproduce q_ann_ivf_learned
      // bit-for-bit — the shared oracle SQL proves it through the gate.
      (s, dir) => {
        val e = embSharded(s, dir)
        val base = sketchIoPath(s)
        val idx = Clustering.trainIvfIndex(e, kmK, kmIters)
        AnnIO.saveIvf(idx, s"$base/ivf_idx", perPidTable(s, "graft_annivf_asg_"))
        Clustering.ivfQueryTopK(AnnIO.loadIvf(s, s"$base/ivf_idx"), e,
            annProbePred(s, dir), 5)
          .select("query_id", "neighbor_id", "cos", "rank")
          .orderBy("query_id", "rank")
      },
      Some(annIvfOracleSql)),

    QueryDef("q_ann_ivf_learned_mp",
      // multi-probe learned IVF: each query scans its 2 nearest
      // k-means cells instead of 1 (probeCells — broadcast centroids,
      // still a pure cell equi-join with 2 probe rows per query),
      // recovering neighbors just across a Voronoi boundary. Oracle:
      // the same unrolled-Lloyd chain; probe cells are the top-2
      // final centroids by quantized-space distance, ties on cell id.
      (s, dir) => Clustering.ivfLearnedTopK(emb(s, dir), annProbePred(s, dir), 5,
          kmK, kmIters, nprobe = 2)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank"),
      Some(s"""WITH $kmeansCtes,
        g AS (SELECT vec_id, cl FROM a$kmIters),
        qp AS (SELECT query_id, cl FROM (
            SELECT query_id, cl,
              row_number() OVER (PARTITION BY query_id ORDER BY d, cl) AS rn
            FROM (SELECT e.vec_id AS query_id, c.cl,
                    ${pqDist("e.v", "c.c")} AS d
                  FROM e CROSS JOIN c${kmIters - 1} c
                  WHERE ${annProbeSql("e.vec_id")}))
          WHERE rn <= 2),
        ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        c AS (SELECT q.query_id, n.vec_id AS neighbor_id,
                ${cosSql("qv.v", "nv.v")} AS cos
              FROM qp q JOIN g n ON q.cl = n.cl AND q.query_id <> n.vec_id
              JOIN ev qv ON qv.vec_id = q.query_id
              JOIN ev nv ON nv.vec_id = n.vec_id),
        r AS (SELECT *, CAST(row_number() OVER
                (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
              FROM c)
        SELECT * FROM r WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("q_ann_pq",
      // IVF-PQ ANN: 4 coarse k-means cells restrict each query's scan
      // to its own cell, and within it distance is the asymmetric (ADC)
      // sum of per-subspace LUT entries over two 32-dim codebook codes
      // (k=8, 2 Lloyd rounds) — the corpus-side scan never touches raw
      // vectors. Oracle: three unrolled Lloyd chains (coarse + two
      // slices) + the same LUT join, bit-exact by construction.
      (s, dir) => Clustering.pqTopK(emb(s, dir), annProbePred(s, dir), 5,
          pqM, pqK, pqIters, coarseCells = pqCells)
        .orderBy("query_id", "rank"),
      Some(annPqOracleSql)),

    QueryDef("q_ann_pq_persisted",
      // X58's serving lifecycle under the ORACLE, not just the spec:
      // the same IVF-PQ model is trained, SAVED (meta-last no-clobber,
      // codes bucketed on the coarse cell), LOADED, and queried through
      // pqQueryTopK — and must reproduce q_ann_pq bit-for-bit, proven
      // by sharing its oracle SQL verbatim (the asofOracleSql
      // precedent). What the gate now covers: codebook/centroid/code
      // round-trip through Parquet, the meta existence check, and the
      // loaded-index query path — the serve-from-disk workflow a
      // 100 TB corpus runs daily.
      (s, dir) => {
        val e = emb(s, dir)
        val base = sketchIoPath(s)
        val idx = Clustering.trainPqIndex(e, pqM, pqK, pqIters,
          coarseCells = pqCells)
        AnnIO.save(idx, s"$base/pq_idx", annPqTable(s))
        Clustering.pqQueryTopK(AnnIO.load(s, s"$base/pq_idx"), e,
            annProbePred(s, dir), 5)
          .orderBy("query_id", "rank")
      },
      Some(annPqOracleSql)),

    QueryDef("q_ann_refresh_serve",
      // X72 — the model-ROLLOVER lifecycle under the oracle (r11
      // verdict #1): train → save v1 → load → refreshCentroids on an
      // ingest batch (decayed mini-batch, priorWeight small enough
      // that cells actually flip) → AnnIO.rollover (re-cell the code
      // relation in one corpus pass against the refreshed coarse
      // model, persist as the v2 index with a FRESH fingerprint,
      // retire v1) → serve through the loaded v2. The oracle replays
      // the shared IVF-PQ chain with the coarse model refreshed and
      // every vector re-celled — bit-equality proves the whole
      // refresh-to-serving workflow, not just the centroid math.
      (s, dir) => {
        val e = emb(s, dir)
        val base = sketchIoPath(s)
        val idx = Clustering.trainPqIndex(e, pqM, pqK, pqIters,
          coarseCells = pqCells)
        AnnIO.save(idx, s"$base/pq_roll_v1", perPidTable(s, "graft_annroll1_"))
        val v1 = AnnIO.load(s, s"$base/pq_roll_v1")
        val refreshed = Clustering.refreshCentroids(
          v1.coarse.get, e.filter(rollBatchPred), priorWeight = rollPw)
        AnnIO.rollover(s, s"$base/pq_roll_v1", e, refreshed,
          s"$base/pq_roll_v2", perPidTable(s, "graft_annroll2_"))
        Clustering.pqQueryTopK(AnnIO.load(s, s"$base/pq_roll_v2"), e,
            annProbePred(s, dir), 5)
          .orderBy("query_id", "rank")
      },
      Some(annPqRefreshOracleSql)),

    QueryDef("q_ann_filtered_persisted",
      // X67's pre-filter contract at the PERSISTED-index layer: the
      // label rides INTO the stored code relation (AnnIO.save
      // metaCols — denormalized alongside the codes, the
      // filtered-serving design), so pqQueryTopK's indexFilter is
      // answered inside the bucketed code scan — no side join against
      // a corpus-sized attribute table at query time, index
      // distribution untouched. The probe side stays unfiltered (a
      // query needn't satisfy the predicate it searches under).
      // Oracle: the shared PQ CTE chain with the same label
      // restriction on the candidate side only.
      (s, dir) => {
        val e = emb(s, dir)
        val base = sketchIoPath(s)
        val idx = Clustering.trainPqIndex(e, pqM, pqK, pqIters,
          coarseCells = pqCells)
        val withMeta = idx.copy(
          codes = idx.codes.join(e.select("vec_id", "label"), "vec_id"))
        AnnIO.save(withMeta, s"$base/pq_idx_f", annPqfTable(s),
          metaCols = Seq("label"))
        Clustering.pqQueryTopK(AnnIO.load(s, s"$base/pq_idx_f"), e,
            annProbePred(s, dir), 5, indexFilter = "label = 1")
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH ${pqCtesWith(
          s"qc AS (SELECT vec_id AS query_id, cell FROM cells WHERE ${annProbeSql("vec_id")})",
          " AND cd.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 1)")}
        SELECT query_id, neighbor_id, adist, rank FROM rr WHERE rank <= 5
        ORDER BY query_id, rank""")),

    QueryDef("q_ann_pq_mp",
      // multi-probe IVF-PQ: queries scan their 2 nearest coarse cells
      // (probeCells on the coarse codebook), doubling the ADC candidate
      // pool without touching raw vectors — the recall lever the
      // nprobe=1 contract (q_ann_pq) lacks. Plan unchanged otherwise:
      // broadcast LUT equi-joins over codes, cell-keyed first join.
      (s, dir) => Clustering.pqTopK(emb(s, dir), annProbePred(s, dir), 5,
          pqM, pqK, pqIters, coarseCells = pqCells, coarseNprobe = 2)
        .orderBy("query_id", "rank"),
      Some(s"""WITH ${pqCtesWith(pqQcMultiProbe(2))}
        SELECT query_id, neighbor_id, adist, rank FROM rr WHERE rank <= 5
        ORDER BY query_id, rank""")),

    QueryDef("q_ann_pq_rerank",
      // the IVF-PQ refinement step: ADC top-20 candidates re-scored
      // with the TRUE vectors (exact r9 cosine), cut to 5 — only
      // probes × 20 vectors are read at full precision.
      (s, dir) => Clustering.pqTopKRefined(emb(s, dir), annProbePred(s, dir),
          5, 20, pqM, pqK, pqIters, coarseCells = pqCells)
        .orderBy("query_id", "rank"),
      Some(s"""WITH $pqCtes,
        cnd AS (SELECT query_id, neighbor_id FROM rr WHERE rank <= 20),
        ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cs AS (SELECT c.query_id, c.neighbor_id, ${cosSql("qv.v", "nv.v")} AS cos
               FROM cnd c JOIN ev qv ON qv.vec_id = c.query_id
                          JOIN ev nv ON nv.vec_id = c.neighbor_id),
        r2 AS (SELECT *, CAST(row_number() OVER
                 (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
               FROM cs)
        SELECT query_id, neighbor_id, cos, rank FROM r2 WHERE rank <= 5
        ORDER BY query_id, rank""")),

    QueryDef("q_semantic_dedup",
      // SemDeDup composition: k-means cells -> within-cell exact cosine
      // pairs (equi-join on the cell id) -> connected components ->
      // min-id representative per near-dup group. Oracle: the unrolled
      // Lloyd chain + within-cell pair join + recursive closure.
      (s, dir) => Clustering.semanticDedup(embSharded(s, dir), kmK, kmIters, 0.45)
        .orderBy("vec_id"),
      Some(s"""WITH RECURSIVE ${kmeansSubCtes("", 1, 64, kmK, kmIters, embShardSql)},
        g AS (SELECT vec_id, cl FROM a$kmIters),
        ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
               WHERE $embShardSql),
        pr AS (SELECT x.vec_id AS a, y.vec_id AS b FROM g x
               JOIN g y ON x.cl = y.cl AND x.vec_id < y.vec_id
               JOIN ev xv ON xv.vec_id = x.vec_id
               JOIN ev yv ON yv.vec_id = y.vec_id
               WHERE ${cosSql("xv.v", "yv.v")} >= 0.45e0),
        ed AS (SELECT a AS x, b AS y FROM pr UNION SELECT b, a FROM pr),
        nodes AS (SELECT DISTINCT x AS id FROM ed),
        reach(id, r) AS (
          SELECT id, id AS r FROM nodes
          UNION
          SELECT reach.id, ed.y AS r FROM reach JOIN ed ON ed.x = reach.r),
        rep AS (SELECT id AS vec_id, min(r) AS rep_id FROM reach GROUP BY id)
        SELECT e2.vec_id, coalesce(rep.rep_id, e2.vec_id) AS rep_id,
          coalesce(rep.rep_id, e2.vec_id) = e2.vec_id AS keep
        FROM (SELECT vec_id FROM embeddings WHERE $embShardSql) e2
        LEFT JOIN rep ON rep.vec_id = e2.vec_id
        ORDER BY e2.vec_id""")),

    QueryDef("q_ngram_topk",
      // corpus-wide heavy-hitter 3-grams (boilerplate detector): per-doc
      // distinct shingles -> doc-frequency count (map-side partial agg)
      // -> top-50 via TakeOrdered, total-ordered so the cut is exact
      (s, dir) => TextOps.topShingles(docsSpread(s, dir), 3, 50),
      Some(s"""WITH tok AS ($tokCte), sh3 AS (${sh(3)})
        SELECT s, count(*) AS n_docs FROM sh3 GROUP BY 1
        ORDER BY n_docs DESC, s LIMIT 50""")),

    QueryDef("q_pack_greedy",
      // sequence packing: docs → fixed-capacity training windows via
      // sharded greedy next-fit (one exchange on shard, then a
      // streaming O(1)-memory pass; shard count = parallelism knob).
      // The oracle replays the same sequential recurrence as a
      // recursive CTE.
      (s, dir) => Packing.packGreedy(docsSharded(s, dir), packCap, packShards, "r4")
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $packCtes
        SELECT doc_id, shard, n_tok, bin_id, bin_offset FROM rec
        ORDER BY doc_id""")),

    QueryDef("q_pack_stats",
      // packing audit: bins, docs, tokens, and capacity utilization per
      // shard — the number that sizes `capacity` for a corpus
      (s, dir) => Packing.packStats(
        Packing.packGreedy(docsSharded(s, dir), packCap, packShards, "r4"), packCap)
        .orderBy("shard"),
      Some(s"""WITH RECURSIVE $packCtes
        SELECT shard, max(bin_id) + 1 AS n_bins, count(*) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS n_tok,
          ${r9(s"CAST(sum(n_tok) AS DOUBLE) / (CAST(max(bin_id) + 1 AS DOUBLE) * ${packCap}.0e0)")} AS utilization
        FROM rec GROUP BY 1 ORDER BY shard""")),

    QueryDef("q_dupspan",
      // duplicate-SPAN detection (substring-level dedup, Lee et al.
      // 2021 re-expressed shingle-granular): maximal token runs covered
      // by 5-gram shingles occurring >= 2 times corpus-wide. Plan:
      // positioned-shingle scan -> hash-agg occurrence counts ->
      // equi-join back -> per-doc gaps-and-islands window (span counts
      // per doc are small, so the doc_id window never sees a large
      // partition).
      (s, dir) => Spans.duplicateSpans(docsSpread(s, dir), spanN)
        .orderBy("doc_id", "tok_start"),
      Some(s"""WITH $spanCtes
        SELECT doc_id, CAST(t0 AS INTEGER) AS tok_start,
          CAST(t1 AS INTEGER) AS tok_end,
          CAST(t1 - t0 + 1 AS INTEGER) AS span_toks
        FROM isl ORDER BY doc_id, tok_start""")),

    QueryDef("q_dupspan_scrub",
      // the scrubbed corpus: duplicated spans removed, unique remainder
      // kept for EVERY doc (n_removed = 0 where nothing matched).
      // Spark removes via a codegen'd indexed filter over the token
      // array; the oracle re-derives the same text from a zipped unnest
      // anti-joined against the span intervals.
      (s, dir) => Spans.scrub(docs(s, dir), spanN).orderBy("doc_id"),
      Some(s"""WITH $spanCtes,
        tk AS (SELECT doc_id, unnest(tokens) AS t,
                 unnest(generate_series(1, len(tokens))) AS idx
               FROM tok),
        keep AS (SELECT tk.doc_id, tk.t, tk.idx
                 FROM tk LEFT JOIN isl ON tk.doc_id = isl.doc_id
                   AND tk.idx - 1 >= isl.t0 AND tk.idx - 1 <= isl.t1
                 WHERE isl.doc_id IS NULL),
        ag AS (SELECT doc_id, count(*) AS n_kept,
                 string_agg(t, ' ' ORDER BY idx) AS clean_text
               FROM keep GROUP BY doc_id)
        SELECT tok.doc_id, CAST(len(tokens) AS INTEGER) AS n_tokens,
          CAST(len(tokens) - coalesce(ag.n_kept, 0) AS INTEGER) AS n_removed,
          coalesce(ag.clean_text, '') AS clean_text
        FROM tok LEFT JOIN ag USING (doc_id) ORDER BY doc_id""")),

    QueryDef("q_phrase_search",
      // X63: exact positional phrase search — documents containing
      // each query phrase's tokens CONSECUTIVELY, with occurrence
      // count and first position; the adjacency reduction over a
      // positional inverted index (one term-filtered postings
      // projection + a broadcast join against the (phrase, offset,
      // term) relation + two hash aggs — no postings self-join). The
      // oracle restates the same reduction from DuckDB's positional
      // unnest.
      (s, dir) => Search.phraseMatch(docs(s, dir), phraseSet)
        .orderBy("phrase", "doc_id"),
      Some {
        val vals = phraseSet.flatMap { p =>
          p.zipWithIndex.map { case (w, k) =>
            s"('${p.mkString(" ")}', $k, '$w', ${p.size})" }
        }.mkString(", ")
        s"""WITH tok AS ($tokCte),
        pp AS (SELECT doc_id, unnest(generate_series(0, len(tokens) - 1)) AS i,
                 tokens FROM tok),
        pos AS (SELECT doc_id, CAST(i AS INTEGER) AS i, tokens[i + 1] AS t
                FROM pp),
        terms(phrase, k, term, plen) AS (VALUES $vals),
        c AS (SELECT tm.phrase, tm.plen, p.doc_id, p.i - tm.k AS start
              FROM pos p JOIN terms tm ON p.t = tm.term
              WHERE p.i - tm.k >= 0),
        g AS (SELECT phrase, plen, doc_id, start, count(*) AS n_terms
              FROM c GROUP BY 1, 2, 3, 4),
        m AS (SELECT phrase, doc_id, start FROM g WHERE n_terms = plen)
        SELECT phrase, doc_id, count(*) AS n_matches,
          CAST(min(start) AS INTEGER) AS first_pos
        FROM m GROUP BY 1, 2 ORDER BY phrase, doc_id"""
      }),

    QueryDef("q_bm25_topk",
      // Okapi BM25 keyword retrieval, exact top-20: query-term filter
      // inside the scan projection, tiny per-term df aggregate
      // broadcast back, global cut via TakeOrdered. Per-(doc, term)
      // scores are quantized to integer micro-units and summed as
      // BIGINTs (order-independent exact sums), so the oracle
      // hash-matches without tolerance.
      (s, dir) => Search.bm25TopK(docs(s, dir), bm25Terms, bm25K),
      Some {
        import Search.{dlit, k1, b, k1p1}
        val termList = bm25Terms.map(t => s"'$t'").mkString(", ")
        s"""WITH tok AS ($tokCte),
        d AS (SELECT doc_id, tokens, len(tokens) AS dl FROM tok),
        st AS (SELECT count(*) AS n, sum(dl) AS tot FROM d),
        tf0 AS (SELECT doc_id, dl,
                  unnest(list_filter(tokens, t -> t IN ($termList))) AS term
                FROM d),
        tfc AS (SELECT doc_id, dl, term, count(*) AS tf FROM tf0 GROUP BY 1, 2, 3),
        dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        sc AS (SELECT doc_id, CAST(floor((ln(1.0e0 + (CAST(st.n AS DOUBLE) - df + 0.5e0) / (df + 0.5e0))
                 * (tf * ${dlit(k1p1)})
                 / (tf + ${dlit(k1)} * (1.0e0 - ${dlit(b)} + ${dlit(b)} * dl / (CAST(st.tot AS DOUBLE) / CAST(st.n AS DOUBLE)))))
                 * 1.0e6 + 0.5e0) AS BIGINT) AS sq
               FROM tfc CROSS JOIN st JOIN dfc USING (term)),
        g AS (SELECT doc_id, sum(sq) AS score_u FROM sc GROUP BY 1),
        r AS (SELECT doc_id, CAST(score_u AS DOUBLE) / 1.0e6 AS score,
                CAST(row_number() OVER (ORDER BY score_u DESC, doc_id) AS INTEGER) AS rank
              FROM g)
        SELECT doc_id, score, rank FROM r WHERE rank <= $bm25K ORDER BY rank"""
      }),

    QueryDef("q_quality_classifier",
      // hashed-feature linear classifier (fastText-shape cheap filter):
      // integer feature fold over the token array, one division, a
      // rational sigmoid — basic IEEE ops only, bit-exact cross-engine.
      // Pure codegen'd projection, zero shuffles.
      (s, dir) => TextOps.hashedClassifier(docs(s, dir)).orderBy("doc_id"),
      Some(s"""WITH ${classifierCtes(Nil)}
        SELECT doc_id, n_tokens, w_sum, prob, prob >= 0.5e0 AS keep
        FROM p ORDER BY doc_id""")),

    QueryDef("q_classifier_auc",
      // exact tie-aware ROC-AUC of the hashed classifier per source —
      // the eval read behind every keep-threshold decision, at corpus
      // scale with NO global sort (Diagnostics.aucBy's two-level
      // midrank ranks: per-distinct-score hash agg, within-bucket
      // windows partitioned by (source, bucket), bucket offsets over
      // the tiny histogram). Ground truth is a PLANTED noisy label:
      // the classifier's own sign with a deterministic 20% hash flip,
      // so the true AUC is meaningfully above 0.5 and both engines
      // derive the identical label. Scores ride the 1e-9 prob lattice
      // (rank-based AUC is invariant to the monotone quantization
      // except ties it creates identically on both engines); the only
      // division happens once per group after exact BIGINT pair
      // counting, so the statistic hash-gates.
      (s, dir) => Diagnostics.aucBy(
        aucScored(s, dir),
        "CAST(floor(prob * 1.0e9 + 0.5e0) AS BIGINT)", "label",
        by = Seq("source"))
        .orderBy("source"),
      Some(aucOracleSql)),

    QueryDef("q_auc_merged",
      // the AUC evaluation as a PERSISTED, MERGEABLE summary (the
      // q_quantiles_merged discipline applied to classifier eval): the
      // corpus splits into two snapshots (doc_id parity), each
      // snapshot's per-source per-distinct-score (pos, neg) histogram
      // is WRITTEN to Parquet, read back, summed elementwise, and
      // ranked — counts are additive, so the merged AUC must equal the
      // direct full-corpus AUC, which is what the oracle computes
      // (the q_classifier_auc SQL verbatim — result-identity proven
      // through the oracle channel) without seeing the snapshot files.
      // The 100 TB shape: daily classifier-eval rollups from
      // histogram-sized summaries, old corpora never re-scanned.
      (s, dir) => {
        val scored = aucScored(s, dir)
        val base = sketchIoPath(s)
        Seq(0, 1).foreach { par =>
          SketchIO.writeSketch(
            Diagnostics.scoreHistogram(
              scored.filter(col("doc_id") % 2 === par),
              "CAST(floor(prob * 1.0e9 + 0.5e0) AS BIGINT)", "label",
              by = Seq("source")),
            s"$base/auchist_$par.parquet")
        }
        Diagnostics.aucFromHistogram(
          Diagnostics.mergeScoreHistograms(Seq(
            SketchIO.readSketch(s, s"$base/auchist_0.parquet"),
            SketchIO.readSketch(s, s"$base/auchist_1.parquet")), Seq("source")),
          by = Seq("source"))
          .orderBy("source")
      },
      Some(aucOracleSql)),

    QueryDef("q_auc_weighted",
      // importance-weighted AUC through the oracle channel: per-doc
      // weight = doc_id % 3 + 1 (a deterministic dedup-multiplicity
      // stand-in), exact replicated-rows semantics — the weighted
      // histogram's integer pair counting is the same midrank
      // machinery, so the statistic still hash-gates. The oracle
      // weighs the same per-score sums.
      (s, dir) => Diagnostics.aucFromHistogram(
        Diagnostics.scoreHistogram(
          aucScored(s, dir).withColumn("w", expr("doc_id % 3L + 1L")),
          "CAST(floor(prob * 1.0e9 + 0.5e0) AS BIGINT)", "label",
          by = Seq("source"), weightExpr = "w"),
        by = Seq("source"))
        .orderBy("source"),
      Some(s"""WITH $aucScoredCtes,
        sw AS (SELECT sc.*, doc_id % 3 + 1 AS w FROM sc),
        h AS (SELECT source, sq, sum(pos * w) AS p, sum((1 - pos) * w) AS ng
              FROM sw GROUP BY 1, 2),
        c AS (SELECT *, coalesce(sum(p) OVER (PARTITION BY source ORDER BY sq
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
              FROM h),
        a AS (SELECT source, CAST(sum(p) AS BIGINT) AS n_pos,
                CAST(sum(ng) AS BIGINT) AS n_neg,
                CAST(sum(ng * (2 * cum + p)) AS BIGINT) AS a2
              FROM c GROUP BY 1)
        SELECT source, n_pos, n_neg,
          CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS DOUBLE)
               ELSE floor((1.0e0 - CAST(a2 AS DOUBLE)
                 / (2.0e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
                 * 1.0e9 + 0.5e0) / 1.0e9 END AS auc
        FROM a ORDER BY source""")),

    QueryDef("q_pr_curve",
      // exact precision/recall/F1 operating-point sweep per source at
      // 5e7-lattice thresholds (~20 points over the prob range) — the
      // read behind choosing a keep-threshold, each point an exact
      // count. Runs over the SAME scoreHistogram relation as the AUC
      // pair (evaluates persisted/merged snapshots too); thresholds
      // ride the bucket grid so the output is bounded at any corpus
      // size and every cumulative is a suffix sum over the tiny
      // per-bucket histogram, never the corpus.
      (s, dir) => Diagnostics.prAtThresholds(
        Diagnostics.scoreHistogram(aucScored(s, dir),
          "CAST(floor(prob * 1.0e9 + 0.5e0) AS BIGINT)", "label",
          by = Seq("source")),
        by = Seq("source"), bucketWidth = 50000000L)
        .orderBy("source", "threshold"),
      Some(s"""WITH $aucScoredCtes,
        pb AS (SELECT source, (sq - (sq % 50000000)) // 50000000 AS bucket,
                 sum(pos) AS bp, sum(1 - pos) AS bn
               FROM sc GROUP BY 1, 2),
        c AS (SELECT *,
                sum(bp) OVER (PARTITION BY source ORDER BY bucket DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
                sum(bn) OVER (PARTITION BY source ORDER BY bucket DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
              FROM pb),
        t AS (SELECT source, sum(bp) AS all_p, sum(bn) AS all_n
              FROM pb GROUP BY 1)
        SELECT c.source, bucket * 50000000 AS threshold,
          CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
          CAST(all_p - tp AS BIGINT) AS fn, CAST(all_n - fp AS BIGINT) AS tn,
          CASE WHEN tp + fp = 0 THEN CAST(NULL AS DOUBLE)
               ELSE floor(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                 * 1.0e9 + 0.5e0) / 1.0e9 END AS precision,
          CASE WHEN all_p = 0 THEN CAST(NULL AS DOUBLE)
               ELSE floor(CAST(tp AS DOUBLE) / CAST(all_p AS DOUBLE)
                 * 1.0e9 + 0.5e0) / 1.0e9 END AS recall,
          CASE WHEN 2 * tp + fp + (all_p - tp) = 0 THEN CAST(NULL AS DOUBLE)
               ELSE floor(2.0e0 * CAST(tp AS DOUBLE)
                 / CAST(2 * tp + fp + (all_p - tp) AS DOUBLE)
                 * 1.0e9 + 0.5e0) / 1.0e9 END AS f1
        FROM c JOIN t ON c.source = t.source
        ORDER BY c.source, threshold""")),

    QueryDef("q_calibration",
      // reliability diagram per source: decile bins over the
      // micro-unit prob lattice, per bin the exact count, positives,
      // mean predicted prob (integer micro sum, one division) and
      // empirical positive rate — "does 0.8 come true 80% of the
      // time". One map-side-combined agg over the scan.
      (s, dir) => Diagnostics.calibrationBins(
        aucScored(s, dir), "prob", "label", by = Seq("source"))
        .orderBy("source", "bin"),
      Some(calibrationOracleSql)),

    QueryDef("q_calibration_hist",
      // the same reliability diagram reconstructed from a SCORE
      // HISTOGRAM whose score is the micro-unit prob lattice — the
      // persisted/merged/streamed read path (aucFromHistogram's
      // discipline applied to calibration). Must reproduce
      // q_calibration bit-for-bit, proven by sharing its oracle SQL
      // verbatim (the q_asof_join_bucketed result-identity pattern);
      // this is also the batch half of the streaming calibration pin
      // (scoreHistogramStream → calibrationFromHistogram).
      (s, dir) => Diagnostics.calibrationFromHistogram(
        Diagnostics.scoreHistogram(aucScored(s, dir),
          "CAST(floor(prob * 1.0e6 + 0.5e0) AS BIGINT)", "label",
          by = Seq("source")),
        by = Seq("source"))
        .orderBy("source", "bin"),
      Some(calibrationOracleSql)),

    QueryDef("q_split_assign",
      // deterministic train/val/test assignment: stateless hash draw
      // cut at 98%/1%/1% — stable under re-runs and corpus growth
      // (adding docs never reassigns an existing one). Zero shuffles.
      (s, dir) => Sampling.splitAssign(docs(s, dir), "r4")
        .select("doc_id", "source", "u", "split")
        .orderBy("doc_id"),
      Some(s"""WITH u AS (SELECT doc_id, source, ${uSql("r4")} AS u FROM documents)
        SELECT doc_id, source, u,
          CASE WHEN u < 980000 THEN 'train'
               WHEN u < 990000 THEN 'val' ELSE 'test' END AS split
        FROM u ORDER BY doc_id""")),

    QueryDef("q_pipeline_e2e",
      // X62: the operators composed as a USER would run them — one
      // Catalyst plan chaining exact dedup → benchmark decontamination
      // → quality filter → split assignment → per-(source, split)
      // report card. Each stage is the already-gated kernel (Dedup
      // .exact's keeper ids, Decontam.decontaminate's broadcast
      // anti-join, TextOps.qualityScore's single-scan projection,
      // Sampling.splitAssign's stateless hash cut), so the only
      // exchanges are the dedup agg, the shingle-flag agg, and the
      // final 60-key report agg — the quality filter and the split
      // decision never leave their scan stage. The oracle restates the
      // whole chain declaratively from the shared fragments.
      (s, dir) => {
        val d = docs(s, dir)
        val keep = Dedup.exact(d).select(col("keep_id").as("doc_id"))
        val deduped = d.join(keep, "doc_id")
        val clean = Decontam.decontaminate(
          deduped.filter(s"NOT ($evalPred)"), d.filter(evalPred), 5)
        val kept = TextOps.qualityScore(clean, carry = Seq("source"))
          .filter("score >= 0.45e0")
        Sampling.splitAssign(kept, "e2e", 900, 50)
          .selectExpr("source", "split", "CAST(n_tokens AS BIGINT) AS n_tok",
            "CAST(floor(score * 1.0e9 + 0.5e0) AS BIGINT) AS score_n")
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
            sum("score_n").as("sum_score_n"))
          .selectExpr("source", "split", "n_docs", "n_tokens",
            "floor((CAST(sum_score_n AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1.0e9) * 1.0e9 + 0.5e0) / 1.0e9 AS mean_quality")
          .orderBy("source", "split")
      },
      Some(s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
                 GROUP BY md5(lower(trim(text)))),
        dd AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
        tok AS ($tokCte),
        sh5 AS (${sh(5)}),
        ev AS (SELECT DISTINCT s FROM sh5 WHERE $evalPred),
        flag AS (SELECT DISTINCT t.doc_id FROM sh5 t JOIN ev USING (s)
                 WHERE NOT (t.doc_id % 20 = 0)),
        clean AS (SELECT dd.* FROM dd WHERE NOT (dd.doc_id % 20 = 0)
                  AND dd.doc_id NOT IN (SELECT doc_id FROM flag)),
        m AS (SELECT tok.doc_id, tok.source,
                CAST(len(tok.tokens) AS INTEGER) AS n_tokens,
                CAST(${hits(TextOps.langMarkers.head._2)} AS DOUBLE) / len(tokens) AS stop_ratio,
                CAST(length(regexp_replace(tok.text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(tok.text) AS alpha_ratio
              FROM tok JOIN clean ON tok.doc_id = clean.doc_id),
        q AS (SELECT doc_id, source, n_tokens,
                floor((0.3e0 * stop_ratio + 0.4e0 * alpha_ratio +
                  0.3e0 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0e0)) * 1.0e9 + 0.5e0) / 1.0e9 AS score
              FROM m),
        f AS (SELECT * FROM q WHERE score >= 0.45e0),
        u AS (SELECT *, ${uSql("e2e")} AS u FROM f),
        sp AS (SELECT source,
                 CASE WHEN u < 900000 THEN 'train'
                      WHEN u < 950000 THEN 'val' ELSE 'test' END AS split,
                 n_tokens,
                 CAST(floor(score * 1.0e9 + 0.5e0) AS BIGINT) AS score_n
               FROM u),
        g AS (SELECT source, split, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                CAST(sum(score_n) AS BIGINT) AS sum_score_n
              FROM sp GROUP BY 1, 2)
        SELECT source, split, n_docs, n_tokens,
          floor((CAST(sum_score_n AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1.0e9) * 1.0e9 + 0.5e0) / 1.0e9 AS mean_quality
        FROM g ORDER BY source, split""")),

    QueryDef("q_shuffle_order",
      // deterministic global shuffle (training order): hash draw →
      // range-bucket two-level rank — bucket order ≡ global order, so
      // ord = bucket offset + within-bucket rank with NO single-task
      // global sort window. Oracle states the equivalent one-level rank.
      (s, dir) => Sampling.shuffleOrder(docs(s, dir), "r4", 100)
        .select("doc_id", "u", "ord")
        .orderBy("ord"),
      Some(s"""WITH u AS (SELECT doc_id, ${uSql("r4")} AS u FROM documents)
        SELECT doc_id, u,
          CAST(row_number() OVER (ORDER BY u, doc_id) - 1 AS BIGINT) AS ord
        FROM u ORDER BY ord""")),

    QueryDef("q_mix_weights",
      // temperature-weighted source-mixing recipe (τ = 0.5 via IEEE
      // sqrt): per-source mixture shares and the per-source Bernoulli
      // rate that spends 25% of the corpus token budget at those
      // shares. One agg-only scan + a one-row totals broadcast.
      (s, dir) => Sampling.temperatureMixRates(docs(s, dir), mixBudgetPermille)
        .orderBy("source"),
      Some(s"""WITH $mixCtes
        SELECT source, n_docs, n_tokens, w_u, p_mix, rate_u
        FROM rates ORDER BY source""")),

    QueryDef("q_mix_weights_tau",
      // the τ grid in one oracle-checked query: recipes at τ = ¼, ½, ¾
      // side by side (x^¼ = √√x, x^¾ = √x·√√x — nested correctly-
      // rounded sqrt IS the operator contract, so parity needs no pow).
      // Lower τ flattens the mixture toward uniform-over-sources;
      // the three-way union makes that gradient hash-verified.
      (s, dir) => (1 to 3).map(q =>
          Sampling.temperatureMixRates(docs(s, dir), mixBudgetPermille, q)
            .withColumn("tau_q", lit(q)))
        .reduce(_ unionByName _)
        .orderBy("tau_q", "source"),
      Some {
        val branches = (1 to 3).map(q =>
          s"""SELECT source, n_docs, n_tokens, w_u, p_mix, rate_u,
              CAST($q AS INTEGER) AS tau_q FROM rates_t$q""")
        s"""WITH ${(1 to 3).map(q => mixCtesT(s"_t$q", q)).mkString(", ")}
        ${branches.mkString(" UNION ALL ")} ORDER BY tau_q, source"""
      }),

    QueryDef("q_mix_apply",
      // the recipe applied: broadcast the rates table, keep docs whose
      // hash draw clears their source's threshold — the keep decision
      // never shuffles the corpus side. Checksum pins exact membership.
      (s, dir) => Sampling.temperatureMixSample(
          docs(s, dir), mixBudgetPermille, "r4mix")
        .groupBy("source")
        .agg(count("*").as("n_kept"), sum("doc_id").as("checksum"))
        .orderBy("source"),
      Some(s"""WITH $mixCtes,
        u AS (SELECT source, doc_id, ${uSql("r4mix")} AS u FROM documents)
        SELECT u.source, count(*) AS n_kept,
          CAST(sum(u.doc_id) AS BIGINT) AS checksum
        FROM u JOIN rates r ON u.source = r.source
        WHERE u.u < r.rate_u GROUP BY 1 ORDER BY 1""")),

    QueryDef("q_decontam_fuzzy",
      // FUZZY decontamination: training docs whose MinHash-LSH band
      // signatures collide with any eval doc's — the whole-document
      // near-duplicate contamination signal complementing q_decontam's
      // any-shared-n-gram filter. Eval bands broadcast; per-doc
      // signatures are identical whether computed before or after the
      // corpus split, so the oracle filters the shared bands CTE.
      (s, dir) => {
        val d = docsSpread(s, dir)
        Decontam.fuzzyContamination(
          d.filter(s"NOT ($evalPred)"), d.filter(evalPred))
          .orderBy("doc_id")
      },
      Some(s"""WITH $minhashBandCtes,
        tr AS (SELECT doc_id, band, sig FROM bands WHERE NOT ($evalPred)),
        ev AS (SELECT doc_id AS eval_id, band, sig FROM bands WHERE $evalPred)
        SELECT tr.doc_id, count(DISTINCT tr.band) AS n_bands,
          count(DISTINCT ev.eval_id) AS n_eval_docs
        FROM tr JOIN ev ON tr.band = ev.band AND tr.sig = ev.sig
        GROUP BY 1 ORDER BY doc_id""")),

    QueryDef("q_strip_markup",
      // C4-style markup cleanup: tags stripped, common entities decoded
      // (amp last — no double decode), whitespace collapsed; tag/entity
      // counts as the dirtiness signal. Codegen'd projection, zero
      // shuffles; fixture injects markup deterministically from doc_id.
      (s, dir) => TextOps.stripMarkup(
          docs(s, dir).selectExpr("doc_id", s"$markupInject AS text"))
        .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, $markupInject AS text FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '<[^>]*>')) AS INTEGER) AS n_tags,
          CAST(len(regexp_extract_all(text, '&(amp|lt|gt|quot|#39|nbsp);')) AS INTEGER) AS n_entities,
          trim(regexp_replace(
            replace(replace(replace(replace(replace(replace(
              regexp_replace(text, '<[^>]*>', ' ', 'g'),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
            '\\s+', ' ', 'g')) AS clean_text
        FROM d ORDER BY doc_id""")),

    QueryDef("q_weighted_sample",
      // weighted sampling without replacement (Efraimidis–Spirakis
      // exponential keys): exactly 50 docs, inclusion probability
      // increasing in token count — the importance sampler. Keys
      // quantized to nano-units; two-level exact top-k on the Spark
      // side, one-level rank in the oracle.
      (s, dir) => Sampling.weightedTopK(docs(s, dir),
          s"CAST(size(${TextOps.tokensExpr}) AS DOUBLE)", 50, "r4")
        .select("doc_id", "w", "key_n", "rank")
        .orderBy("rank"),
      Some(s"""WITH t AS (SELECT doc_id,
                 CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS w,
                 ${uSql("r4")} AS u FROM documents),
        kk AS (SELECT doc_id, w,
                 CAST(floor(-ln((u + 0.5e0) / 1.0e6) / w * 1.0e9 + 0.5e0) AS BIGINT) AS key_n
               FROM t),
        r AS (SELECT doc_id, w, key_n, CAST(row_number() OVER
                (ORDER BY key_n, doc_id) AS INTEGER) AS rank FROM kk)
        SELECT doc_id, w, key_n, rank FROM r WHERE rank <= 50 ORDER BY rank""")),

    QueryDef("q_corpus_diff",
      // corpus snapshot diff (incremental processing): v2 derived
      // deterministically from the corpus — docs ≡ 0 (mod 13) removed,
      // ≡ 0 (mod 7) text-mutated, 25 new ids appended. One narrow
      // (id, hash) projection per side + a full outer equi-join.
      (s, dir) => {
        val v1 = docs(s, dir)
        val v2 = v1.filter("doc_id % 13 != 0")
          .selectExpr("doc_id",
            "IF(doc_id % 7 = 0, concat(text, ' v2'), text) AS text")
          .unionByName(v1.filter("doc_id < 25")
            .selectExpr("doc_id + 100000 AS doc_id", "text"))
        Dedup.corpusDiff(v1, v2).orderBy("doc_id")
      },
      Some("""WITH v1 AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM documents),
        v2r AS (SELECT doc_id,
                  CASE WHEN doc_id % 7 = 0 THEN concat(text, ' v2') ELSE text END AS text
                FROM documents WHERE doc_id % 13 <> 0
                UNION ALL
                SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25),
        v2 AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM v2r)
        SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
          CASE WHEN v1.h IS NULL THEN 'added'
               WHEN v2.h IS NULL THEN 'removed'
               WHEN v1.h = v2.h THEN 'unchanged'
               ELSE 'changed' END AS status
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        ORDER BY doc_id""")),

    QueryDef("q_bigram_lm",
      // corpus-learned bigram LM score (CCNet-style perplexity filter):
      // add-1/2-smoothed bigram MLE, per-doc mean negative log-likelihood.
      // Counts joined back by shingle key; log-probs quantized to
      // integer micro-units and summed exactly (BM25's ln-parity
      // rationale).
      (s, dir) => TextOps.bigramLmScore(docsSpread(s, dir)).orderBy("doc_id"),
      Some(s"""WITH tok AS ($tokCte),
        bgx AS (SELECT doc_id, unnest(list_transform(
                  generate_series(0, len(tokens) - 2),
                  i -> array_to_string(list_slice(tokens, i + 1, i + 2), ' '))) AS s2
                FROM tok WHERE len(tokens) >= 2),
        bg AS (SELECT doc_id, s2, string_split(s2, ' ')[1] AS w1 FROM bgx),
        bc AS (SELECT s2, count(*) AS cb FROM bg GROUP BY 1),
        u AS (SELECT unnest(tokens) AS w1 FROM tok),
        uc AS (SELECT w1, count(*) AS cu FROM u GROUP BY 1),
        vv AS (SELECT count(*) AS v FROM uc),
        sc AS (SELECT doc_id,
                 CAST(floor(ln((cb + 0.5e0) / (cu + 0.5e0 * v)) * 1.0e6 + 0.5e0) AS BIGINT) AS lp_u
               FROM bg JOIN bc USING (s2) JOIN uc USING (w1) CROSS JOIN vv),
        g AS (SELECT doc_id, count(*) AS n_bigrams,
                CAST(-sum(lp_u) AS BIGINT) AS nll_u FROM sc GROUP BY 1)
        SELECT doc_id, n_bigrams, nll_u,
          floor((CAST(nll_u AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * 1.0e6)) * 1.0e9 + 0.5e0) / 1.0e9 AS mean_nll
        FROM g ORDER BY doc_id""")),

    QueryDef("q_chunk_docs",
      // long-document chunking: overlapping 32-token windows at stride
      // 16 — pure codegen'd explode(sequence) projection, no shuffle,
      // the step before packing/embedding. Tail windows truncate at
      // the doc end.
      (s, dir) => TextOps.chunkDocs(docs(s, dir), 32, 16)
        .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH tok AS ($tokCte),
        t AS (SELECT doc_id, tokens, CAST(len(tokens) AS INTEGER) AS n_tok FROM tok),
        st AS (SELECT doc_id, tokens, n_tok,
                 CAST(unnest(generate_series(0, n_tok - 1, 16)) AS INTEGER) AS tok_start
               FROM t)
        SELECT doc_id, CAST(tok_start // 16 AS INTEGER) AS chunk_id, tok_start,
          CAST(least(32, n_tok - tok_start) AS INTEGER) AS chunk_len,
          array_to_string(list_slice(tokens, tok_start + 1, tok_start + 32), ' ') AS chunk_text
        FROM st ORDER BY doc_id, chunk_id""")),

    QueryDef("q_vocab_topk",
      // corpus-induced vocabulary: top-50 tokens by total occurrences —
      // explode → map-side-combined count → TakeOrdered (never a full
      // sort); (n_occ DESC, token) is a total order so the cut is exact.
      (s, dir) => TextOps.vocabTopV(docs(s, dir), 50)
        .orderBy("rank"),
      Some(s"""WITH tok AS ($tokCte),
        x AS (SELECT unnest(tokens) AS token FROM tok),
        c AS (SELECT token, count(*) AS n_occ FROM x GROUP BY 1),
        r AS (SELECT token, n_occ, CAST(row_number() OVER
                (ORDER BY n_occ DESC, token) AS INTEGER) AS rank FROM c)
        SELECT token, n_occ, rank FROM r WHERE rank <= 50 ORDER BY rank""")),

    QueryDef("q_oov_rate",
      // per-document OOV stats vs the induced top-50 vocabulary: the
      // tokenizer-coverage signal. Vocabulary broadcast; corpus side is
      // explode → broadcast left join → per-doc count-agg.
      (s, dir) => TextOps.oovStats(
          docs(s, dir), TextOps.vocabTopV(docs(s, dir), 50))
        .orderBy("doc_id"),
      Some(s"""WITH tok AS ($tokCte),
        x AS (SELECT unnest(tokens) AS token FROM tok),
        c AS (SELECT token, count(*) AS n_occ FROM x GROUP BY 1),
        r AS (SELECT token, n_occ, row_number() OVER
                (ORDER BY n_occ DESC, token) AS rank FROM c),
        v AS (SELECT token FROM r WHERE rank <= 50),
        e AS (SELECT doc_id, unnest(tokens) AS token FROM tok),
        o AS (SELECT e.doc_id, count(*) AS n_tokens,
                CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
              FROM e LEFT JOIN v ON e.token = v.token GROUP BY 1)
        SELECT doc_id, n_tokens, n_oov,
          floor((CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 1.0e9 + 0.5e0) / 1.0e9 AS oov_rate
        FROM o ORDER BY doc_id""")),

    QueryDef("q_bpe_train",
      // BPE merge-rule training (Sennrich 2016) — the learned half of
      // the tokenizer surface (q_tokens_bpe applies a FIXED
      // pre-tokenizer; this LEARNS the merge table). Trains on the
      // word-frequency dictionary, so corpus cost is one token-count
      // agg regardless of merge count. The oracle replays all 12
      // rounds declaratively: per round a weighted pair count, an
      // argmax under (cnt DESC, lhs, rhs), and a list_reduce fold
      // re-segmentation — any divergence in counting convention,
      // tie-break, or left-to-right application breaks the hash.
      (s, dir) => TextOps.bpeTrain(docs(s, dir), 12).orderBy("rank"),
      Some {
        val n = 12
        val rounds = (1 to n).map { r =>
          s"""pc$r AS (SELECT syms[i] AS a, syms[i + 1] AS b,
              CAST(sum(freq) AS BIGINT) AS cnt
            FROM s${r - 1}, unnest(generate_series(1, len(syms) - 1)) AS u(i)
            GROUP BY 1, 2),
          m$r AS (SELECT $r AS rank, a, b, cnt FROM pc$r
            ORDER BY cnt DESC, a, b LIMIT 1),
          s$r AS MATERIALIZED (SELECT word, freq, list_reduce(list_transform(syms, x -> [x]),
              (acc, x) -> CASE WHEN acc[-1] = m$r.a AND x[1] = m$r.b
                THEN list_concat(list_slice(acc, 1, len(acc) - 1), [m$r.a || m$r.b])
                ELSE list_concat(acc, x) END) AS syms
            FROM s${r - 1}, m$r)"""
        }
        s"""WITH tok AS ($tokCte),
          w AS (SELECT unnest(tokens) AS word FROM tok),
          wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w
            WHERE length(word) >= 1 GROUP BY 1),
          s0 AS (SELECT word, freq, list_transform(generate_series(1, length(word)),
              i -> substr(word, i, 1)) AS syms FROM wf),
          ${rounds.mkString(",\n")}
          SELECT rank, a AS lhs, b AS rhs, a || b AS merged, cnt
          FROM (${(1 to n).map(r => s"SELECT * FROM m$r").mkString(" UNION ALL ")})
          ORDER BY rank"""
      }),

    QueryDef("q_bpe_apply",
      // the learned tokenizer's APPLY path: per-source token/char/
      // symbol totals and compression under the 12-rule BPE vocabulary
      // of q_bpe_train. The corpus is segmented by joining tokens to
      // the segmented DICTIONARY (vocabulary-sized → broadcast), never
      // by re-folding per corpus row. Oracle = the same 12 replayed
      // rounds + the dictionary join, stated declaratively.
      (s, dir) => TextOps.bpeSegmentStats(docs(s, dir), 12).orderBy("source"),
      Some {
        val n = 12
        val rounds = (1 to n).map { r =>
          s"""pc$r AS (SELECT syms[i] AS a, syms[i + 1] AS b,
              CAST(sum(freq) AS BIGINT) AS cnt
            FROM s${r - 1}, unnest(generate_series(1, len(syms) - 1)) AS u(i)
            GROUP BY 1, 2),
          m$r AS (SELECT $r AS rank, a, b, cnt FROM pc$r
            ORDER BY cnt DESC, a, b LIMIT 1),
          s$r AS MATERIALIZED (SELECT word, freq, list_reduce(list_transform(syms, x -> [x]),
              (acc, x) -> CASE WHEN acc[-1] = m$r.a AND x[1] = m$r.b
                THEN list_concat(list_slice(acc, 1, len(acc) - 1), [m$r.a || m$r.b])
                ELSE list_concat(acc, x) END) AS syms
            FROM s${r - 1}, m$r)"""
        }
        s"""WITH tok AS ($tokCte),
          w AS (SELECT unnest(tokens) AS word FROM tok),
          wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w
            WHERE length(word) >= 1 GROUP BY 1),
          s0 AS (SELECT word, freq, list_transform(generate_series(1, length(word)),
              i -> substr(word, i, 1)) AS syms FROM wf),
          ${rounds.mkString(",\n")},
          t AS (SELECT source, unnest(tokens) AS word FROM tok),
          j AS (SELECT t.source, length(t.word) AS n_chars, len(d.syms) AS n_syms
            FROM t JOIN s$n d ON t.word = d.word)
          SELECT source, count(*) AS n_tokens,
            CAST(sum(n_chars) AS BIGINT) AS sum_chars,
            CAST(sum(n_syms) AS BIGINT) AS sum_syms,
            floor((CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_syms) AS DOUBLE))
              * 1.0e9 + 0.5e0) / 1.0e9 AS compression
          FROM j GROUP BY source ORDER BY source"""
      }),

    // ---- relational breadth on the star schema ----

    QueryDef("q_lineitem_pricing",
      // money sums are exact DECIMAL sums rounded HALF-UP to 3 decimals
      // IN DECIMAL SPACE, then cast to double ONCE: both engines round
      // the identical exact decimal, so the result is bit-equal at any
      // magnitude. (The previous milli-trick did the rounding in double
      // space — floor(x·1e3 + 0.5) — which silently breaks once the
      // group sum passes ~2^51/1e3 ≈ 2.25e12, where x·1e3 has ulp 0.5
      // and the floor goes addition-order-dependent: found as a real
      // 2-ulp mismatch at the sf100 rehearsal's 600M-row Q1 groups.)
      (s, dir) => s.read.parquet(s"$dir/lineitem.parquet")
        .filter(expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count("*").as("n"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)").as("sum_qty"),
          expr("CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 3) AS DOUBLE)").as("sum_base"),
          expr("CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0e0 - l_discount AS DECIMAL(18,6))), 3) AS DOUBLE)")
            .as("sum_disc_price"))
        .withColumn("avg_qty", expr("sum_qty / CAST(n AS DOUBLE)"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 3) AS DOUBLE) AS sum_base,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0e0 - l_discount AS DECIMAL(18,6))), 3) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q_shipping_priority",
      // TPC-H Q3 shape: unshipped-revenue top-10 for one market
      // segment — the three-way selective join (segment-filtered
      // customer BROADCAST into orders, then an orderkey equi-join to
      // post-cutoff lineitems), milli-rounded decimal revenue, and a
      // TakeOrdered top-10 under the (revenue DESC, o_orderdate,
      // l_orderkey) total order instead of a full sort.
      (s, dir) => {
        val c = s.read.parquet(s"$dir/customer.parquet")
          .filter(col("c_mktsegment") === "BUILDING")
        val o = Temporal.loadOrders(s, dir)
          .filter(expr("o_orderdate < TIMESTAMP '1998-06-01 00:00:00'"))
        val l = s.read.parquet(s"$dir/lineitem.parquet")
          .filter(expr("l_shipdate > TIMESTAMP '1998-06-01 00:00:00'"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(expr(
            """floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
               * CAST(1.0e0 - l_discount AS DECIMAL(18,6))) AS DOUBLE)
               * 1.0e3 + 0.5e0) / 1.0e3""").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
          floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
            * CAST(1.0e0 - l_discount AS DECIMAL(18,6))) AS DOUBLE)
            * 1.0e3 + 0.5e0) / 1.0e3 AS revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""")),

    QueryDef("q_orders_revenue",
      (s, dir) => {
        val o = s.read.parquet(s"$dir/orders.parquet")
        val c = s.read.parquet(s"$dir/customer.parquet")
        val n = s.read.parquet(s"$dir/nation.parquet")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(count("*").as("n_orders"),
            // decimal-space round: see q_lineitem_pricing — n_name is
            // shared across the whole corpus, so this group sum also
            // grows unboundedly with scale
            expr("CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 3) AS DOUBLE)")
              .as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n_orders,
          CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 3) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("q_local_supplier_volume",
      // TPC-H Q5 shape: revenue from lineitems where the supplier and
      // the customer share a nation, restricted to one region and a
      // date window, grouped by nation. The scale-relevant plan: the
      // two big fact tables (lineitem, orders) hash-join on orderkey;
      // EVERY dimension (customer 1.5k, supplier 0.1k, nation 25,
      // region 5 rows per SF... all ≪ fact) broadcasts, so the only
      // shuffle in the whole query is the lineitem⋈orders equi-join +
      // the final 25-group agg. The region filter prunes through the
      // broadcast chain before the fact join; revenue is an exact
      // DECIMAL sum (order-invariant) rounded half-up to 1e-3 IN
      // DECIMAL SPACE, then cast to double once (see
      // q_lineitem_pricing — n_name groups grow with the corpus, so a
      // double-space milli-round goes order-dependent past ~2.25e12).
      (s, dir) => {
        val l = s.read.parquet(s"$dir/lineitem.parquet")
        val o = Temporal.loadOrders(s, dir)
          .filter(expr("o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'") &&
            expr("o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"))
        val c = s.read.parquet(s"$dir/customer.parquet")
        val sup = s.read.parquet(s"$dir/supplier.parquet")
        val n = s.read.parquet(s"$dir/nation.parquet")
        val r = s.read.parquet(s"$dir/region.parquet")
        val asiaNations = n.join(broadcast(r.filter(col("r_name") === "ASIA")),
          n("n_regionkey") === r("r_regionkey"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
            c("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(asiaNations), sup("s_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(
            count(lit(1)).as("n_lineitems"),
            expr("""CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                * CAST(1.0e0 - l_discount AS DECIMAL(18,6))), 3) AS DOUBLE)""")
              .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_lineitems,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
            * CAST(1.0e0 - l_discount AS DECIMAL(18,6))), 3) AS DOUBLE) AS revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1 ORDER BY revenue DESC, n_name"""))
  )
}
