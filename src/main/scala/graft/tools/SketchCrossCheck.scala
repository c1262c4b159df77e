package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Sketches, Spans, TextOps}

/** Engine-internal cross-check for the sketch/shingle contract tail at
  * rungs the DuckDB oracle cannot execute (r15 verdict #1/#3): at sf100
  * single-node DuckDB dies on the exact pairwise distinct-overlap
  * statements (q_hll_overlap, q_kmv_jaccard, q_ngram_jaccard_capped —
  * progress-bar worker death at 5M docs) and OOMs reconstructing 5M
  * scrubbed texts (q_dupspan_scrub), so those four carried
  * "oracle-exact at sf10" evidence only. All four are bit-DETERMINISTIC
  * by design (integer register/sketch algebra; float steps are shared
  * engine-neutral fragments), so a second, independently SHAPED engine
  * plan verifies them exactly without an external oracle — the
  * [[GraphCrossCheck]] pattern:
  *
  *  - q_hll_overlap: the operator (per-group register files →
  *    pair-replicate → max-merge, `Sketches.hllPairOverlap`) vs the
  *    oracle's declarative chain executed by Spark SQL — registers
  *    re-derived per PAIR directly from the hashed shingle stream;
  *  - q_kmv_jaccard: the KMV UDAF sketch + hash-join exact
  *    intersection vs a window-ranked k-minima (row_number ≤ k) and an
  *    inclusion–exclusion exact intersection (per-pair distinct count
  *    over the UNIONED streams — no hash self-join);
  *  - q_ngram_jaccard_capped: `Dedup.ngramJaccardBlocked`'s block-pair
  *    machinery vs the oracle's inverted-index statement (df-cap
  *    HAVING, per-(source, shingle) self-join) in Spark SQL;
  *  - q_dupspan_scrub: the codegen'd indexed array filter vs the
  *    oracle's zipped-unnest anti-join + ordered string re-aggregation.
  *
  * Equality is multiset (`exceptAll` both directions, fully
  * distributed — nothing collects). Exit 0 + one JSON line per op on
  * match; exit 3 on any difference.
  *
  * Round 16 adds the LAST two oracle-bound paths (r15 verdict's
  * `remaining_oracle_bound` tail), so every sf-dependent contract
  * query now has SOME at-sf100 verification:
  *
  *  - q_simhash_neardup: `Dedup.simhashNearDup`'s contiguous 4×15
  *    band join vs signatures RE-DERIVED declaratively in Spark SQL
  *    (the oracle's CTE chain in Spark dialect) banded by an
  *    INTERLEAVED bit partition — band j gathers bits {4i+j} — a
  *    different complete pigeonhole cover (4 disjoint 15-bit groups;
  *    ≤3 flips leave one untouched), so candidate generation shares
  *    neither code nor band geometry with the operator;
  *  - q_dedup_incremental: the incremental path (batch↔corpus +
  *    batch↔batch, corpus never self-joins) vs the DEFINING identity
  *    `minhashLsh(corpus ∪ batch)` filtered to batch-touching pairs —
  *    the full self-join topology the incremental plan exists to
  *    avoid. The two sides share the signature kernel (that kernel is
  *    oracle-exact at sf100 through q_dedup_minhash); what this
  *    checks at scale is the incremental JOIN STRUCTURE, exactly the
  *    property the query claims.
  *
  * Usage: runMain graft.tools.SketchCrossCheck <sfDir> [op1,op2,...]
  *   ops ⊆ {hll_overlap, kmv_jaccard, ngram_capped, dupspan_scrub,
  *          simhash_neardup, dedup_incremental}
  *
  * `--selftest` proves the comparison can FAIL (the PlanAudit
  * discipline): the hll_overlap naive plan's pair max-merge is
  * deliberately flipped to a min-merge — a single-keyword semantic
  * regression — and the run succeeds (exit 0) only if the diff
  * REJECTS it (mismatch > 0).
  */
object SketchCrossCheck {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val selftest = args.contains("--selftest")
    val ops: Set[String] =
      if (selftest) Set("hll_overlap")
      else args.lift(1)
        .map(_.split(',').toSet)
        .getOrElse(Set("hll_overlap", "kmv_jaccard", "ngram_capped", "dupspan_scrub",
          "simhash_neardup", "dedup_incremental"))
    new java.io.File("/root/repo/target/spark-tmp").mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/root/repo/target/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.createOrReplaceTempView("documents")

    // both sides are materialized ONCE (localCheckpoint) before the
    // two exceptAll passes — without it each side recomputes from the
    // shingle stream per pass, tripling a linear-in-corpus plan at
    // exactly the rung (sf100) this tool exists for
    def diff(a: DataFrame, b: DataFrame): Long =
      a.exceptAll(b).count() + b.exceptAll(a).count()
    def pinned(df: DataFrame): DataFrame = df.localCheckpoint()

    // shared Spark-SQL dialect fragments of the DuckDB oracle text
    // (list_slice → slice, len → size, '//' → div, h60 → conv/md5)
    val h60s = "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
    def shCte(n: Int) =
      s"""tok AS (SELECT doc_id, source, split(trim(text), '\\\\s+') AS tokens
            FROM documents),
          sh$n AS (SELECT DISTINCT doc_id, source, s FROM (
            SELECT doc_id, source,
              explode(transform(sequence(0, size(tokens) - $n),
                i -> array_join(slice(tokens, i + 1, $n), ' '))) AS s
            FROM tok WHERE size(tokens) >= $n))"""

    var failed = false
    def report(op: String, rows: Long, mismatch: Long, wall: Double): Unit = {
      println(f"""{"tool":"sketch_crosscheck","op":"$op","sf":"$sfDir",""" +
        f""""rows":$rows,"mismatch":$mismatch,"wall_s":$wall%.1f}""")
      if (mismatch != 0) failed = true
    }

    // ---- q_hll_overlap: operator vs per-pair register re-derivation --
    if (ops("hll_overlap")) {
      val t0 = System.nanoTime()
      val op = Sketches.hllPairOverlap(
        TextOps.shingleSet(docs, 5, carry = Seq("source")), "source", col("s"), 8)
      val est = Sketches.hllEstSql(8)
      val naive = spark.sql(
        s"""WITH ${shCte(5)},
          v AS (SELECT source AS g, $h60s AS h FROM sh5),
          rg AS (SELECT g, h % 256 AS bucket,
              max(CASE WHEN h div 256 = 0 THEN 53
                  ELSE 53 - length(bin(h div 256)) END) AS r
            FROM v GROUP BY 1, 2),
          e AS (SELECT g, 256 - present AS zeros,
              dpres + (256 - present) * (CAST(1 AS BIGINT) << 53) AS dscaled
            FROM (SELECT g, count(*) AS present,
                sum(CAST(1 AS BIGINT) << (53 - r)) AS dpres
              FROM rg GROUP BY g)),
          se AS (SELECT g, $est AS est FROM e),
          pr AS (SELECT a.g AS ga, b.g AS gb FROM se a JOIN se b ON a.g < b.g),
          mg AS (SELECT ga, gb, bucket, ${if (selftest) "min" else "max"}(r) AS r FROM (
              SELECT pr.ga, pr.gb, rg.bucket, rg.r FROM pr JOIN rg ON rg.g = pr.ga
              UNION ALL
              SELECT pr.ga, pr.gb, rg.bucket, rg.r FROM pr JOIN rg ON rg.g = pr.gb)
            GROUP BY 1, 2, 3),
          eu AS (SELECT ga, gb, 256 - present AS zeros,
              dpres + (256 - present) * (CAST(1 AS BIGINT) << 53) AS dscaled
            FROM (SELECT ga, gb, count(*) AS present,
                sum(CAST(1 AS BIGINT) << (53 - r)) AS dpres
              FROM mg GROUP BY 1, 2)),
          su AS (SELECT ga, gb, $est AS est_union FROM eu)
          SELECT su.ga AS group_a, su.gb AS group_b,
            sa.est AS est_a, sb.est AS est_b, su.est_union,
            ${graft.regrid.Rounding.sqlRoundN(
              "greatest(sa.est + sb.est - su.est_union, 0.0e0)", 6)} AS overlap_est
          FROM su JOIN se sa ON sa.g = su.ga JOIN se sb ON sb.g = su.gb""")
      val (opP, naiveP) = (pinned(op), pinned(naive))
      report("hll_overlap", opP.count(), diff(opP, naiveP), (System.nanoTime() - t0) / 1e9)
    }

    // ---- q_kmv_jaccard: UDAF sketch + hash-join intersection vs
    // window-ranked minima + inclusion-exclusion ----------------------
    if (ops("kmv_jaccard")) {
      val t0 = System.nanoTime()
      val k = 128
      val sh = TextOps.shingleSet(docs, 5, carry = Seq("source"))
      val opEst = Sketches.kmvPairSimilarity(sh, "source", col("s"), k)
      val v = sh.select(col("source"), Sketches.hash60(col("s")).as("h")).distinct()
      val opSizes = v.groupBy("source").agg(count(lit(1)).as("nd"))
      val opInter = v.toDF("ga", "h").join(v.toDF("gb", "h"), Seq("h"))
        .where(col("ga") < col("gb"))
        .groupBy("ga", "gb").agg(count(lit(1)).as("inter"))
      val op = opEst
        .join(opInter, opEst("group_a") === opInter("ga") && opEst("group_b") === opInter("gb"), "left")
        .join(broadcast(opSizes.toDF("group_a", "na")), "group_a")
        .join(broadcast(opSizes.toDF("group_b", "nb")), "group_b")
        .withColumn("inter", coalesce(col("inter"), lit(0L)))
        .withColumn("jaccard_exact", expr(
          """floor((CAST(inter AS DOUBLE)
             / CAST(na + nb - inter AS DOUBLE)) * 1.0e6 + 0.5e0) / 1.0e6"""))
        .select("group_a", "group_b", "est_a", "est_b", "est_union",
          "jaccard_est", "jaccard_exact")

      // naive: distinct hashes re-derived through the SQL dialect chain,
      // k-minima via window rank (no UDAF), union sizes via per-pair
      // distinct count over the unioned streams (no hash self-join)
      v.createOrReplaceTempView("kv")
      def estSql(m: String) =
        s"""CASE WHEN size($m) < $k THEN CAST(size($m) AS DOUBLE)
            ELSE floor((${(k - 1).toDouble}e0
              / (CAST(element_at($m, $k) AS DOUBLE) / 1.152921504606846976e18))
              * 1.0e3 + 0.5e0) / 1.0e3 END"""
      val naive = spark.sql(
        s"""WITH mins AS (SELECT g, sort_array(collect_list(h)) AS m FROM (
              SELECT source AS g, h,
                row_number() OVER (PARTITION BY source ORDER BY h) AS rn
              FROM kv) WHERE rn <= $k GROUP BY g),
          sz AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS nd FROM kv GROUP BY 1),
          pairs AS (SELECT a.g AS ga, b.g AS gb, a.m AS ma, b.m AS mb,
              slice(sort_array(array_distinct(concat(a.m, b.m))), 1, $k) AS mu
            FROM mins a JOIN mins b ON a.g < b.g),
          uni AS (SELECT ga, gb, CAST(count(DISTINCT h) AS BIGINT) AS ndu FROM (
              SELECT p.ga, p.gb, kv.h FROM (SELECT DISTINCT ga, gb FROM pairs) p
                JOIN kv ON kv.source = p.ga
              UNION ALL
              SELECT p.ga, p.gb, kv.h FROM (SELECT DISTINCT ga, gb FROM pairs) p
                JOIN kv ON kv.source = p.gb)
            GROUP BY ga, gb),
          e AS (SELECT ga, gb,
              ${estSql("ma")} AS est_a, ${estSql("mb")} AS est_b,
              ${estSql("mu")} AS est_union
            FROM pairs)
          SELECT e.ga AS group_a, e.gb AS group_b,
            e.est_a, e.est_b, e.est_union,
            floor((greatest(e.est_a + e.est_b - e.est_union, 0.0e0) / e.est_union)
              * 1.0e6 + 0.5e0) / 1.0e6 AS jaccard_est,
            floor((CAST(sa.nd + sb.nd - uni.ndu AS DOUBLE)
              / CAST(uni.ndu AS DOUBLE)) * 1.0e6 + 0.5e0) / 1.0e6 AS jaccard_exact
          FROM e JOIN uni ON uni.ga = e.ga AND uni.gb = e.gb
            JOIN sz sa ON sa.g = e.ga JOIN sz sb ON sb.g = e.gb""")
      val (opP, naiveP) = (pinned(op), pinned(naive))
      report("kmv_jaccard", opP.count(), diff(opP, naiveP), (System.nanoTime() - t0) / 1e9)
    }

    // ---- q_ngram_jaccard_capped: blocked machinery vs the
    // inverted-index statement in Spark SQL ---------------------------
    if (ops("ngram_capped")) {
      val t0 = System.nanoTime()
      val op = Dedup.ngramJaccardBlocked(docs, 3, 0.3, maxDocFreq = Some(2))
      val naive = spark.sql(
        s"""WITH ${shCte(3)},
          rare AS (SELECT s FROM sh3 GROUP BY s HAVING count(*) <= 2),
          shr AS (SELECT sh3.* FROM sh3 JOIN rare USING (s)),
          sz AS (SELECT doc_id, count(*) AS n FROM shr GROUP BY 1),
          inter AS (SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS i
                    FROM shr sa JOIN shr sb
                      ON sa.source = sb.source AND sa.s = sb.s AND sa.doc_id < sb.doc_id
                    GROUP BY 1, 2),
          j AS (SELECT inter.a, inter.b,
              floor((CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE))
                * 1.0e9 + 0.5e0) / 1.0e9 AS jaccard
            FROM inter JOIN sz sa ON inter.a = sa.doc_id
                       JOIN sz sb ON inter.b = sb.doc_id)
          SELECT * FROM j WHERE jaccard >= 0.3e0""")
      val (opP, naiveP) = (pinned(op), pinned(naive))
      report("ngram_capped", opP.count(), diff(opP, naiveP), (System.nanoTime() - t0) / 1e9)
    }

    // ---- q_dupspan_scrub: indexed array filter vs zipped-unnest
    // anti-join + ordered string re-aggregation -----------------------
    if (ops("dupspan_scrub")) {
      val t0 = System.nanoTime()
      val op = Spans.scrub(docs, 5)
      val naive = spark.sql(
        s"""WITH tok AS (SELECT doc_id, split(trim(text), '\\\\s+') AS tokens
              FROM documents),
          pos AS (SELECT doc_id, tokens,
              explode(sequence(0, size(tokens) - 5)) AS st
            FROM tok WHERE size(tokens) >= 5),
          shp AS (SELECT doc_id, st, st + 4 AS en,
              CAST(conv(substring(md5(array_join(slice(tokens, st + 1, 5), ' ')),
                1, 15), 16, 10) AS BIGINT) AS h
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
            FROM gr GROUP BY doc_id, grp),
          tk AS (SELECT doc_id, p AS idx0, t
            FROM tok LATERAL VIEW posexplode(tokens) AS p, t),
          keep AS (SELECT tk.doc_id, tk.t, tk.idx0
            FROM tk LEFT JOIN isl ON tk.doc_id = isl.doc_id
              AND tk.idx0 >= isl.t0 AND tk.idx0 <= isl.t1
            WHERE isl.doc_id IS NULL),
          ag AS (SELECT doc_id, count(*) AS n_kept,
              array_join(transform(array_sort(collect_list(struct(idx0, t))),
                x -> x.t), ' ') AS clean_text
            FROM keep GROUP BY doc_id)
          SELECT tok.doc_id, CAST(size(tokens) AS INT) AS n_tokens,
            CAST(size(tokens) - coalesce(ag.n_kept, 0) AS INT) AS n_removed,
            coalesce(ag.clean_text, '') AS clean_text
          FROM tok LEFT JOIN ag USING (doc_id)""")
      val (opP, naiveP) = (pinned(op), pinned(naive))
      report("dupspan_scrub", opP.count(), diff(opP, naiveP), (System.nanoTime() - t0) / 1e9)
    }

    // ---- q_simhash_neardup: contiguous-band machinery vs SQL-derived
    // signatures + INTERLEAVED-bit pigeonhole bands -------------------
    if (ops("simhash_neardup")) {
      val t0 = System.nanoTime()
      val op = Dedup.simhashNearDup(docs, 3)
      // band j gathers bits {4i+j : i < 15} — 4 disjoint 15-bit groups,
      // so ≤3 differing bits leave one whole group untouched (the same
      // pigeonhole statement as the operator's contiguous split, over a
      // different partition of the bit positions)
      val gather = (0 until 15)
        .map(i => s"shiftleft(shiftright(simhash, 4 * $i + j) & 1, $i)")
        .mkString(" + ")
      val naive = spark.sql(
        s"""WITH tok AS (SELECT doc_id, split(trim(text), '\\\\s+') AS tokens
              FROM documents),
          t AS (SELECT doc_id, explode(tokens) AS t FROM tok),
          h AS (SELECT doc_id, ${h60s.replace("(s)", "(t)")} AS h FROM t),
          bits AS (SELECT doc_id, b,
              sum(CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END) AS sv
            FROM h LATERAL VIEW explode(sequence(0, 59)) AS b
            GROUP BY doc_id, b),
          sim AS (SELECT doc_id, CAST(sum(CASE WHEN sv > 0
                THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)
              AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id),
          bd AS (SELECT doc_id, simhash, j AS band, $gather AS chunk
            FROM sim LATERAL VIEW explode(sequence(0, 3)) AS j),
          cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
              x.simhash AS ha, y.simhash AS hb
            FROM bd x JOIN bd y
              ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id)
          SELECT a, b, CAST(bit_count(ha ^ hb) AS INT) AS hamming
          FROM cand WHERE bit_count(ha ^ hb) <= 3""")
      val (opP, naiveP) = (pinned(op), pinned(naive))
      report("simhash_neardup", opP.count(), diff(opP, naiveP),
        (System.nanoTime() - t0) / 1e9)
    }

    // ---- q_dedup_incremental: incremental join topology vs the
    // defining identity (full LSH filtered to batch-touching pairs) --
    if (ops("dedup_incremental")) {
      val t0 = System.nanoTime()
      val op = Dedup.minhashLshIncremental(
        docs.filter("doc_id % 20 != 7"), docs.filter("doc_id % 20 = 7"))
      val naive = Dedup.minhashLsh(docs).where("a % 20 = 7 OR b % 20 = 7")
      val (opP, naiveP) = (pinned(op), pinned(naive))
      report("dedup_incremental", opP.count(), diff(opP, naiveP),
        (System.nanoTime() - t0) / 1e9)
    }

    spark.stop()
    if (selftest) {
      val caught = failed
      println(s"""{"tool":"sketch_crosscheck","selftest":${caught},""" +
        s""""note":"min-merge corruption ${if (caught) "REJECTED (pass)" else "ACCEPTED (FAIL)"}"}""")
      if (!caught) sys.exit(3)
    } else if (failed) sys.exit(3)
  }
}
