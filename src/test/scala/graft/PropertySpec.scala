package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded randomized invariants (deterministic — fixed seeds). */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  test("prefixPred ⟺ startsWith over 400 random ASCII key/prefix pairs") {
    val rnd = new Random(42)
    val chars = "abz/09.AZ" + "ÿ￿"
    def str(n: Int) = (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
    val cases = (0 until 400).map { _ =>
      val key = str(rnd.nextInt(12))
      val prefix = if (rnd.nextBoolean() && key.nonEmpty)
        key.take(rnd.nextInt(key.length) + 1) else str(rnd.nextInt(5) + 1)
      (key, prefix)
    }
    val df = cases.toDF("k", "p").persist()
    cases.map(_._2).distinct.foreach { p =>
      val got = df.filter(col("p") === p)
        .filter(graft.operators.Listing.prefixPred(col("k"), p))
        .select("k").as[String].collect().sorted.toSeq
      val want = cases.filter(c => c._2 == p && c._1.startsWith(p))
        .map(_._1).sorted
      assert(got === want, s"prefix '$p'")
    }
  }

  test("duplicateSpans == brute-force reference over random small corpora") {
    import spark.implicits._
    val rnd = new Random(11)
    val k = 3
    for (trial <- 0 until 5) {
      // tiny alphabet forces genuine cross- and within-doc k-gram repeats
      val docs = (0 until 12).map { i =>
        val n = 3 + rnd.nextInt(20)
        (i.toLong, Seq.fill(n)("t" + rnd.nextInt(4)).mkString(" "))
      }
      // brute force: every k-gram occurrence, gram -> global count,
      // mark+merge (adjacency included) per doc
      val occ = docs.flatMap { case (id, text) =>
        val ws = text.split(" ")
        (0 to ws.length - k).map(p => (id, p, ws.slice(p, p + k).mkString(" ")))
      }
      val counts = occ.groupBy(_._3).view.mapValues(_.size).toMap
      val expected = occ.filter(o => counts(o._3) > 1)
        .groupBy(_._1).view.mapValues { os =>
          val spans = os.map(o => (o._2.toLong, (o._2 + k - 1).toLong))
            .sortBy(identity)
          spans.tail.foldLeft(Vector(spans.head)) { case (acc, (s, e)) =>
            val (ls, le) = acc.last
            if (s <= le + 1) acc.init :+ (ls, math.max(le, e))
            else acc :+ (s, e)
          }
        }.toMap
      val got = graft.operators.Dedup
        .duplicateSpans(docs.toDF("doc_id", "text"), k).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getLong(2)))
          .toVector.sortBy(identity)).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("graft_dot_long == HOF fold over 300 random long-vector pairs") {
    val rnd = new Random(7)
    val cases = (0 until 300).map { i =>
      val n = rnd.nextInt(80) // includes 0-length
      val a = Seq.fill(n)(rnd.nextLong() % 100000)
      // mix equal-length and mismatched pairs
      val b = if (i % 5 == 0) Seq.fill(n + 1)(rnd.nextLong() % 100000)
              else Seq.fill(n)(rnd.nextLong() % 100000)
      (i.toLong, a, b)
    }
    val both = cases.toDF("id", "a", "b")
      .select(col("id"),
        expr("graft_dot_long(a, b)").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("hof"))
      .collect()
    for (r <- both)
      assert(r.get(1) === r.get(2), s"id=${r.get(0)}")
  }

  test("pow2BinValue matches the BigInt reference over random longs") {
    val rnd = new Random(7)
    def refBin(x: Long, minBin: Long): Long = {
      val b = if (x <= 1) 1L
        else BigInt(2).pow((BigInt(x) - 1).bitLength).toLong
      math.max(b, minBin)
    }
    (0 until 2000).foreach { _ =>
      val x = math.abs(rnd.nextLong()) % (1L << 50)
      assert(graft.functions.TypedAggs.pow2BinValue(x, 1024L) === refBin(x, 1024L),
        s"x=$x")
    }
  }

  test("RS(6,3) survives 200 random erasure patterns on random stripes") {
    val rnd = new Random(1234)
    val codec = graft.functions.ReedSolomon.Codec(6, 3)
    (0 until 200).foreach { trial =>
      val data = Array.fill(6)(Array.fill(24)(rnd.nextInt(256).toByte))
      val full = data ++ codec.encode(data)
      val erase = rnd.shuffle((0 until 9).toList).take(rnd.nextInt(3) + 1)
      val damaged = full.map(_.clone: Array[Byte])
      erase.foreach(i => damaged(i) = null)
      val rec = codec.decode(damaged)
      full.indices.foreach(i =>
        assert(rec(i).toSeq === full(i).toSeq, s"trial $trial shard $i erased $erase"))
    }
  }

  test("bucket-name validity == first-principles HddsClientUtils port over random names") {
    import graft.operators.BucketOps
    // independent re-derivation of verifyResourceName(strictS3) straight
    // from the reference's per-char + whole-name rules — no regexes, so a
    // translation slip in the operator's regex form can't hide
    def refValid(s: String): Boolean = {
      if (s.length < 3 || s.length > 63) return false
      var prev: Char = 0
      var isIPv4 = true
      for (c <- s) {
        if (c != '.') isIPv4 &= c >= '0' && c <= '9'
        if (c.isUpper) return false
        val ok = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
          c == '-' || c == '.'
        if (!ok) return false
        if (prev == '.' && c == '.') return false
        if (prev == '-' && c == '.') return false
        if (prev == '.' && c == '-') return false
        prev = c
      }
      if (isIPv4) return false
      if (s.head == '.' || s.head == '-') return false
      if (s.last == '.' || s.last == '-') return false
      true
    }
    val rnd = new scala.util.Random(20260813)
    val alpha = "abz019.-_AB$"
    val names = (Seq("abc", "a.b-c", "192.168.1.1", "1.2.3", "...", "ab",
      "a" * 63, "a" * 64, "a-.b", "a.-b", "xn--ab") ++
      (1 to 300).map(_ => (1 to (rnd.nextInt(10) + 1))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)).distinct
    val reqs = names.zipWithIndex
      .map { case (n, i) => (i.toLong, "v1", n, false, false, false, 10L) }
      .toDF("req_id", "volume", "bucket", "has_source_volume",
        "has_source_bucket", "has_encryption", "quota_bytes")
    val vols = Seq(("v1", 0L, -1L, -1L))
      .toDF("volume", "bucket_count", "quota_bytes", "quota_namespace")
    val bkts = Seq.empty[(String, String, Long)]
      .toDF("volume", "bucket", "quota_bytes")
    val got = BucketOps.bucketCreateDecisions(reqs, vols, bkts)
      .collect().map(r => r.getString(2) -> r.getString(3)).toMap
    names.foreach { n =>
      val expected = if (refValid(n)) "CREATED" else "INVALID_BUCKET_NAME"
      assert(got(n) === expected, s"name '$n'")
    }
  }

  test("typed sessionizer streams a 100k-event user without buffering the group") {
    val rnd = new Random(99)
    // one pathological user with 1e5 events + a second small user, gaps
    // engineered so dozens of sessions close mid-stream
    var ts = 0L
    val big = (0 until 100000).map { i =>
      ts += (if (rnd.nextInt(1000) == 0) 2000000L else rnd.nextInt(1000).toLong)
      (i.toLong, "heavy", "e", rnd.nextDouble() * 10, ts)
    }
    val small = Seq((200000L, "light", "e", 1.0, 5L), (200001L, "light", "e", 2.0, 4000000L))
    val ev = (big ++ small)
      .toDF("event_id", "user_id", "event_type", "value", "ts_ms")
    val typed = graft.operators.Events.sessionizeTyped(spark, ev)
      .toDF("user_id", "n_events", "start_ms", "end_ms", "value_cents")
    val base = graft.operators.Events.sessionize(ev)
      .select("user_id", "n_events", "start_ms", "end_ms", "value_cents")
    assert(typed.exceptAll(base).count() === 0)
    assert(base.exceptAll(typed).count() === 0)
    assert(typed.filter(col("user_id") === "heavy").count() > 10)
    // every heavy event is in exactly one session
    assert(typed.filter(col("user_id") === "heavy")
      .agg(sum("n_events")).head.getLong(0) === 100000L)
  }

  test("session_window and the typed iterator sessionizer agree with the window-lag sessionizer") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val base = graft.operators.Events.sessionize(ev)
      .select("user_id", "n_events", "start_ms", "end_ms", "value_cents")
    val viaWindow = graft.operators.Events.sessionWindows(ev)
      .select("user_id", "n_events", "start_ms", "end_ms", "value_cents")
    assert(viaWindow.exceptAll(base).count() === 0)
    assert(base.exceptAll(viaWindow).count() === 0)
    val viaState = graft.operators.Events.sessionizeTyped(spark, ev)
      .toDF("user_id", "n_events", "start_ms", "end_ms", "value_cents")
    assert(viaState.exceptAll(base).count() === 0)
    assert(base.exceptAll(viaState).count() === 0)
  }

  test("container lifecycle fold == reference walk over random event streams") {
    val rnd = new Random(7)
    val events = Seq("FINALIZE", "QUASI_CLOSE", "CLOSE", "FORCE_CLOSE",
      "DELETE", "CLEANUP")
    // the reference transition function, ported literally
    def step(s: String, e: String): String = (s, e) match {
      case ("OPEN", "FINALIZE") => "CLOSING"
      case ("CLOSING", "QUASI_CLOSE") => "QUASI_CLOSED"
      case ("CLOSING", "CLOSE") => "CLOSED"
      case ("QUASI_CLOSED", "FORCE_CLOSE") => "CLOSED"
      case ("QUASI_CLOSED", "DELETE") | ("CLOSED", "DELETE") => "DELETING"
      case ("DELETING", "CLEANUP") => "DELETED"
      case _ => s
    }
    val order = Map("OPEN" -> 0, "CLOSING" -> 1, "QUASI_CLOSED" -> 2,
      "CLOSED" -> 2, "DELETING" -> 3, "DELETED" -> 4)
    val streams = (0 until 40).map { c =>
      c.toLong -> (1 to rnd.nextInt(8) + 1)
        .map(i => (i.toLong, events(rnd.nextInt(events.size))))
    }
    val df = streams.flatMap { case (c, evs) =>
      evs.map { case (seq, e) => (c, seq, e) }
    }.toDF("container_id", "seq", "event")
    val got = graft.operators.ClusterHealth.containerLifecycleFold(df)
      .select("container_id", "seq", "state_before", "state_after")
      .as[(Long, Long, String, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    streams.foreach { case (c, evs) =>
      var s = "OPEN"
      evs.foreach { case (seq, e) =>
        val (gb, ga) = got((c, seq))
        assert(gb === s, s"pre-state c=$c seq=$seq")
        s = step(s, e)
        assert(ga === s, s"post-state c=$c seq=$seq")
        // the DAG never walks backwards
        assert(order(gb) <= order(ga))
      }
    }
  }

  test("under-replication decide == a literal RatisContainerReplicaCount" +
    " walk over random cluster states") {
    // Random containers/replicas/pending-ops; expectations computed by an
    // independent Scala walk of RatisUnderReplicationHandler:84-167 and
    // RatisContainerReplicaCount:141-618 (countReplicas, missingReplicas
    // with the maintenance discount and the min(rf,2) floor,
    // redundancyDelta, verify ladder, source selection with max-BCSID).
    val rnd = new Random(1234)
    case class Rep(dn: String, state: String, seq: Long, empty: Boolean,
                   origin: String, nodeHealthy: Boolean, op: String)
    case class Cont(id: Long, qc: Boolean, cSeq: Long, reps: Seq[Rep],
                    nAdd: Long, delDn: String)
    val states = Seq("CLOSED", "QUASI_CLOSED", "UNHEALTHY", "CLOSING")
    val ops = Seq("IN_SERVICE", "IN_SERVICE", "IN_SERVICE",
      "DECOMMISSIONING", "IN_MAINTENANCE", "ENTERING_MAINTENANCE",
      "DECOMMISSIONED")
    val conts = (0L until 400L).map { id =>
      val qc = rnd.nextBoolean()
      val cSeq = id * 100
      val n = rnd.nextInt(6) // 0..5 replicas
      val reps = (0 until n).map { r =>
        Rep("dn" + r, states(rnd.nextInt(states.length)),
          cSeq - rnd.nextInt(3) + (if (rnd.nextInt(10) == 0) 2 else 0),
          rnd.nextInt(5) == 0,
          "o" + rnd.nextInt(math.max(n - 1, 1)),
          rnd.nextInt(4) != 0, ops(rnd.nextInt(ops.length)))
      }
      Cont(id, qc, cSeq, reps, if (rnd.nextBoolean()) 1L else 0L,
        if (rnd.nextInt(3) == 0 && n > 0) reps(rnd.nextInt(n)).dn else "")
    }
    // ---- the literal walk ----
    def expected(ct: Cont): (String, Long, Long) = {
      val contState = if (ct.qc) "QUASI_CLOSED" else "CLOSED"
      def treatedUnh(r: Rep) = r.state == "UNHEALTHY" ||
        (r.state == "QUASI_CLOSED" && !ct.qc && r.seq != ct.cSeq)
      def isMaint(r: Rep) =
        r.op == "IN_MAINTENANCE" || r.op == "ENTERING_MAINTENANCE"
      def isDecom(r: Rep) =
        r.op == "DECOMMISSIONING" || r.op == "DECOMMISSIONED"
      val healthyIs = ct.reps.count(r =>
        !treatedUnh(r) && !isMaint(r) && !isDecom(r))
      val unhIs = ct.reps.count(r =>
        treatedUnh(r) && !isMaint(r) && !isDecom(r))
      val maintH = ct.reps.count(r => !treatedUnh(r) && isMaint(r))
      val maintU = ct.reps.count(r => treatedUnh(r) && isMaint(r))
      val decomH = ct.reps.count(r => !treatedUnh(r) && isDecom(r))
      val healthyCount = healthyIs + maintH + decomH
      val delOnUnh = ct.delDn.nonEmpty &&
        ct.reps.exists(r => r.dn == ct.delDn && treatedUnh(r))
      val delWithout = if (ct.delDn.nonEmpty && !delOnUnh) 1 else 0
      val delWith = if (ct.delDn.nonEmpty) 1 else 0
      def missing(avail: Int, maint: Int): Int = {
        val delta = 3 - avail
        if (delta < 0) delta
        else if (delta > 0)
          math.max(math.max(delta - maint, 0), math.max(2 - avail, 0))
        else 0
      }
      val missW = missing(healthyIs, maintH)
      val missU = missing(healthyIs + unhIs, maintH + maintU)
      // vulnerable (getVulnerableUnhealthyReplicas)
      val inSvcOrigins = ct.reps.filter(r => r.op == "IN_SERVICE" &&
        r.nodeHealthy && r.seq == ct.cSeq).map(_.origin).toSet
      val vuln = if (ct.qc && ct.reps.exists(_.state != "UNHEALTHY"))
        ct.reps.count(r => r.state == "UNHEALTHY" && r.seq == ct.cSeq &&
          !r.empty && r.nodeHealthy && !inSvcOrigins.contains(r.origin))
      else 0
      // ladder
      if (ct.reps.nonEmpty && ct.reps.forall(_.empty) && ct.qc)
        return ("SKIP_EMPTY_QC", 0L, 0L)
      if (vuln > 0 && ct.nAdd >= vuln)
        return ("SKIP_VULNERABLE_PENDING", 0L, vuln.toLong)
      if (vuln > 0) return ("REPLICATE_VULNERABLE", 0L, vuln.toLong)
      if (missW + delWithout <= 0) return ("NOT_UNDER", 0L, 0L)
      if (missW + delWithout - ct.nAdd <= 0) return ("PENDING_FIX", 0L, 0L)
      if (ct.reps.isEmpty) return ("UNRECOVERABLE", 0L, 0L)
      if (missU + delWith - ct.nAdd <= 0 && healthyCount == 0)
        return ("PENDING_UNHEALTHY_FIX", 0L, 0L)
      // sources
      val hasClosed = ct.reps.exists(_.state == "CLOSED")
      val srcCand = ct.reps.filter { r =>
        (r.state == "CLOSED" ||
          (r.state == "QUASI_CLOSED" && (!hasClosed || ct.qc)) ||
          (r.state == "UNHEALTHY" && healthyCount == 0)) &&
          r.nodeHealthy && r.dn != ct.delDn
      }
      val maxSeq = if (srcCand.nonEmpty) srcCand.map(_.seq).max else -1L
      val sources = srcCand.filter(_.seq == maxSeq)
      val needed =
        if (healthyCount == 0) {
          if (missU < 0) missU + delWith
          else math.max(0, missU - ct.nAdd.toInt + delWith)
        } else {
          if (missW < 0) missW + delWithout
          else math.max(0, missW - ct.nAdd.toInt + delWithout)
        }
      if (sources.isEmpty) return ("NO_SOURCES", needed.toLong, 0L)
      ("REPLICATE", needed.toLong, 0L)
    }
    // ---- drive the engine's decide over the same inputs ----
    val contDf = conts.map(ct => (ct.id,
      if (ct.qc) "QUASI_CLOSED" else "CLOSED", 3, ct.cSeq))
      .toDF("container_id", "container_state", "replication_factor",
        "c_seq")
    val repDf = conts.flatMap(ct => ct.reps.map(r => (ct.id,
      if (ct.qc) "QUASI_CLOSED" else "CLOSED", ct.cSeq, r.dn, r.state,
      r.seq, r.empty, r.origin,
      if (r.nodeHealthy) "HEALTHY" else "STALE", r.op)))
      .toDF("container_id", "container_state", "c_seq", "datanode",
        "replica_state", "seq", "is_empty", "origin", "node_state",
        "op_state")
    val pendDf = conts.map(ct => (ct.id, ct.nAdd, ct.delDn))
      .toDF("container_id", "n_add", "del_dn")
    val got = graft.operators.ClusterHealth
      .underReplicationDecide(contDf, repDf, pendDf)
      .collect().map(r => r.getAs[Long]("container_id") ->
        (r.getAs[String]("verdict"), r.getAs[Long]("needed"),
          r.getAs[Long]("n_vulnerable"))).toMap
    conts.foreach { ct =>
      val (v, needed, vuln) = expected(ct)
      val g = got(ct.id)
      assert(g._1 === v, s"verdict c=${ct.id} ${ct}")
      if (v == "REPLICATE" || v == "NO_SOURCES")
        assert(g._2 === needed, s"needed c=${ct.id} ${ct}")
      if (v.startsWith("REPLICATE_VULNERABLE") ||
        v == "SKIP_VULNERABLE_PENDING")
        assert(g._3 === vuln, s"vuln c=${ct.id}")
    }
    // the random space actually reaches the interesting rungs
    val verdicts = conts.map(expected(_)._1).toSet
    assert(verdicts.contains("REPLICATE"))
    assert(verdicts.contains("NO_SOURCES"))
    assert(verdicts.contains("UNRECOVERABLE"))
    assert(verdicts.contains("PENDING_UNHEALTHY_FIX"))
  }

  test("EC under-replication decide == a literal ECContainerReplicaCount" +
    " walk over random index states") {
    // Random (h, d, m, src, pa) per index; expectations from an
    // independent walk of ECContainerReplicaCount:474-492 sufficiency,
    // :350-377 unavailableIndexes, :249-302 offline-only indexes,
    // :386-389 additionalMaintenanceCopiesNeeded, and the
    // ECUnderReplicationHandler command math (rs-3-2, rmr = 1).
    val rnd = new Random(777)
    case class Idx(h: Long, d: Long, m: Long, src: Long, pa: Long)
    val conts = (0L until 300L).map { id =>
      id -> (1 to 5).map { _ =>
        Idx(rnd.nextInt(3).toLong,
          if (rnd.nextInt(3) == 0) 1L else 0L,
          if (rnd.nextInt(3) == 0) 1L else 0L,
          rnd.nextInt(2).toLong,
          if (rnd.nextInt(8) == 0) 1L else 0L)
      }
    }
    def expected(idxs: Seq[Idx]): (String, Long, String, Long, Long) = {
      val suffNo = idxs.forall(_.h >= 1) ||
        (idxs.forall(i => i.h + i.m >= 1) && idxs.count(_.h >= 1) >= 4)
      val suffAdd = idxs.forall(i => i.h + i.pa >= 1) ||
        (idxs.forall(i => i.h + i.pa + i.m >= 1) &&
          idxs.count(i => i.h + i.pa >= 1) >= 4)
      if (suffNo) return ("NOT_UNDER", 0L, "", 0L, 0L)
      if (suffAdd) return ("PENDING_FIX", 0L, "", 0L, 0L)
      val missing = idxs.count(i =>
        i.h == 0 && i.pa == 0 && i.m == 0 && i.d == 0)
      val nSrc = idxs.map(_.src).sum
      val rec = if (missing == 0) ""
        else if (nSrc >= 3) "RECONSTRUCT" else "NO_SOURCES"
      val decomCmds = idxs.count(i =>
        i.d > 0 && i.h == 0 && i.pa == 0 && i.src == 1).toLong
      val maintOnly = idxs.count(i => i.m > 0 && i.h == 0 && i.pa == 0)
      val addl = math.max(0, maintOnly - 1).toLong
      val maintSrc = idxs.count(i =>
        i.m > 0 && i.h == 0 && i.pa == 0 && i.src == 1).toLong
      val maintCmds = math.min(addl, maintSrc)
      ("REPAIR", missing.toLong, rec, decomCmds, maintCmds)
    }
    val perIdx = conts.flatMap { case (id, idxs) =>
      idxs.zipWithIndex.map { case (x, i) =>
        (id, (i + 1).toLong, x.h, x.d, x.m, x.src.toInt, x.pa)
      }
    }.toDF("container_id", "replica_index", "h", "d", "m", "src", "pa")
    val got = graft.operators.ClusterHealth
      .ecUnderDecide(perIdx, 3, 1, 1)
      .collect().map(r => r.getAs[Long]("container_id") ->
        (r.getAs[String]("verdict"), r.getAs[Long]("n_missing"),
          r.getAs[String]("reconstruct"),
          r.getAs[Long]("n_decom_cmds"),
          r.getAs[Long]("n_maint_cmds"))).toMap
    conts.foreach { case (id, idxs) =>
      assert(got(id) === expected(idxs), s"container $id $idxs")
    }
    val vs = conts.map(c => expected(c._2)).toSet
    assert(vs.exists(_._3 == "RECONSTRUCT"))
    assert(vs.exists(_._3 == "NO_SOURCES"))
    assert(vs.exists(_._5 > 0), "maintenance top-ups reached")
  }

  test("QCS per-origin accounting == a literal QuasiClosedStuckReplica" +
    "Count walk over random origin maps") {
    // Random (origin, seq, healthy, in-service, maintenance) replica
    // sets; expectations from a direct walk of
    // QuasiClosedStuckReplicaCount:142-220 — single-origin targets 3
    // (with the minHealthyForMaintenance floor), multi-origin best
    // origins (max HEALTHY BCSID) target 2 and others 1, maintenance
    // origins only need one online copy, over-replication counts
    // in-service copies only.
    val rnd = new Random(4242)
    case class R(origin: String, seq: Long, healthy: Boolean,
                 inService: Boolean, maint: Boolean)
    val conts = (0L until 300L).map { id =>
      val nOrigins = rnd.nextInt(3) + 1
      id -> (0 until (rnd.nextInt(4) + 1)).map { _ =>
        val op = rnd.nextInt(3)
        R("o" + rnd.nextInt(nOrigins), id * 10 + rnd.nextInt(3),
          rnd.nextInt(4) != 0, op == 0, op == 1)
      }
    }
    def expected(reps: Seq[R]): Map[String, (Boolean, Int, Long, Long)] = {
      val byOrigin = reps.groupBy(_.origin)
      val maxHealthy = reps.filter(_.healthy).map(_.seq)
        .reduceOption(_ max _)
      byOrigin.map { case (o, rs) =>
        val isBest = maxHealthy.exists(mx =>
          rs.exists(r => r.healthy && r.seq == mx))
        val target = if (byOrigin.size == 1) 3
          else if (isBest) 2 else 1
        val inSvc = rs.count(_.inService).toLong
        val nMaint = rs.count(_.maint).toLong
        val under =
          if (byOrigin.size == 1) {
            if (nMaint > 0) math.max(2 - inSvc, 0L)
            else math.max(3 - inSvc, 0L)
          } else if (inSvc < target) {
            if (nMaint > 0) { if (inSvc == 0) 1L else 0L }
            else target - inSvc
          } else 0L
        val over = math.max(inSvc - target, 0L)
        o -> ((isBest, target, under, over))
      }
    }
    val rows = conts.flatMap { case (id, reps) =>
      reps.map(r => (id, r.origin, r.seq, r.healthy, r.inService,
        r.maint))
    }.toDF("container_id", "origin", "seq", "healthy", "in_service",
      "maint")
    val got = graft.operators.ClusterHealth.qcsPerOrigin(rows, 2, 1, 2)
      .collect().map(r => (r.getAs[Long]("container_id"),
        r.getAs[String]("origin")) ->
        ((r.getAs[Boolean]("is_best"), r.getAs[Int]("target"),
          r.getAs[Long]("under_delta"), r.getAs[Long]("over_delta"))))
      .toMap
    conts.foreach { case (id, reps) =>
      expected(reps).foreach { case (o, want) =>
        assert(got((id, o)) === want, s"container $id origin $o $reps")
      }
    }
  }

  test("balancerMoves == a literal rank-paired budgeted-fill walk over" +
    " random cluster states") {
    // ContainerBalancer iteration shape: eligible-node utilizations vs
    // avg±threshold, over/under sets rank-paired, per-pair budget =
    // min(source shed, target headroom, maxSizeToMove), candidate
    // containers (CLOSED, on source, absent from target) filled
    // largest-first under the budget.
    val rnd = new Random(60621)
    val th = 1000L
    val maxMove = 100L * 1024 * 1024 * 1024
    val nodeStates = Seq("HEALTHY", "HEALTHY", "HEALTHY", "STALE")
    val opStates = Seq("IN_SERVICE", "IN_SERVICE", "IN_SERVICE",
      "DECOMMISSIONING")
    val dns = (0 until 10).map { i =>
      val cap = 1000000000L
      (s"dn$i", "r" + (i % 3),
        nodeStates(rnd.nextInt(nodeStates.length)),
        opStates(rnd.nextInt(opStates.length)),
        cap, (cap * (5 + rnd.nextInt(90)) / 100))
    }
    val contStates = Seq("CLOSED", "CLOSED", "OPEN", "DELETED")
    val conts = (1L to 200L).map(id => (id,
      contStates(rnd.nextInt(contStates.length)),
      1000000L + rnd.nextInt(50000000).toLong))
    val reps = conts.flatMap { case (id, _, _) =>
      rnd.shuffle(dns.map(_._1)).take(rnd.nextInt(3) + 1).map(dn =>
        (id, dn, "CLOSED"))
    }
    // ---- literal walk ----
    val eligible = dns.filter(d => d._3 == "HEALTHY" && d._4 == "IN_SERVICE")
      .map(d => (d._1, d._5, d._6, (d._5 - d._6) * 10000L / d._5))
    val avg = (eligible.map(_._2).sum - eligible.map(_._3).sum) * 10000L /
      eligible.map(_._2).sum
    val over = eligible.filter(_._4 > avg + th)
      .sortBy(e => (-e._4, e._1))
      .map(e => (e._1, e._2 * (e._4 - (avg - th)) / 10000L))
    val under = eligible.filter(_._4 < avg - th)
      .sortBy(e => (e._4, e._1))
      .map(e => (e._1, e._2 * ((avg + th) - e._4) / 10000L))
    val contMap = conts.map(c => c._1 -> c).toMap
    val repsByDn = reps.groupBy(_._2)
    val holders = reps.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val expected = over.zip(under).flatMap {
      case ((src, sb), (tgt, tb)) =>
        val budget = Seq(sb, tb, maxMove).min
        val cands = repsByDn.getOrElse(src, Seq.empty)
          .map(_._1).distinct
          .filter(id => contMap(id)._2 == "CLOSED" &&
            !holders(id).contains(tgt))
          .map(id => (id, contMap(id)._3))
          .sortBy { case (id, used) => (-used, id) }
        var cum = 0L
        cands.flatMap { case (id, used) =>
          cum += used
          if (cum <= budget) Some((src, id) -> ((tgt, used, cum)))
          else None
        }
    }.toMap
    // ---- engine ----
    val got = graft.operators.ClusterHealth.balancerMoves(
        dns.toDF("uuid", "rack", "state", "op_state", "capacity",
          "remaining"),
        reps.toDF("container_id", "datanode", "replica_state"),
        conts.toDF("container_id", "state", "used_bytes"))
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("container_id")) ->
        ((r.getAs[String]("target"), r.getAs[Long]("used_bytes"),
          r.getAs[Long]("cum_bytes")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"move $k")
    }
    assert(expected.nonEmpty, "random space produced moves")
  }

  test("replicaPlacement == a literal rack-aware pick walk over random" +
    " cluster states") {
    // SCMContainerPlacementRackAware shape: under-replicated containers,
    // eligible nodes (healthy, in-service, space for max(5GB, container)),
    // first pick prefers uncovered racks then free space then uuid, the
    // second pick additionally avoids the first pick's rack with the
    // same fallbacks.
    val rnd = new Random(90210)
    val fiveGb = 5L * 1024 * 1024 * 1024
    val nodeStates = Seq("HEALTHY", "HEALTHY", "HEALTHY", "STALE")
    val opStates = Seq("IN_SERVICE", "IN_SERVICE", "IN_SERVICE",
      "IN_MAINTENANCE")
    val dns = (0 until 12).map { i =>
      (s"dn$i", "r" + (i % 4),
        nodeStates(rnd.nextInt(nodeStates.length)),
        opStates(rnd.nextInt(opStates.length)),
        // remaining straddles the 5 GB floor so the space rung fires
        (3L + rnd.nextInt(6)) * 1024 * 1024 * 1024)
    }
    val repStates = Seq("CLOSED", "CLOSED", "CLOSED", "UNHEALTHY")
    val conts = (1L to 250L).map(id => (id,
      if (rnd.nextInt(15) == 0) "DELETED" else "CLOSED", 3,
      (1L + rnd.nextInt(7)) * 1024 * 1024 * 1024))
    val reps = conts.flatMap { case (id, _, _, _) =>
      rnd.shuffle(dns.map(d => (d._1, d._2))).take(rnd.nextInt(3) + 1)
        .map { case (dn, rack) =>
          (id, dn, rack, repStates(rnd.nextInt(repStates.length))) }
    }
    // ---- literal walk ----
    val dnMap = dns.map(d => d._1 -> d).toMap
    val eligible = dns.filter(d => d._3 == "HEALTHY" && d._4 == "IN_SERVICE")
    val expected = conts.filter(_._2 != "DELETED").flatMap {
      case (id, _, rf, bytes) =>
        val rs = reps.filter(_._1 == id)
        if (rs.isEmpty) Seq.empty
        else {
          val healthy = rs.count(_._4 != "UNHEALTHY")
          val needed = rf - healthy
          if (needed <= 0) Seq.empty
          else {
            val heldNodes = rs.map(_._2).toSet
            val heldRacks = rs.filter(_._4 != "UNHEALTHY").map(_._3).toSet
            val cands = eligible
              .filter(d => !heldNodes.contains(d._1) &&
                d._5 >= math.max(fiveGb, bytes))
              .map(d => (d._1, d._2, d._5, !heldRacks.contains(d._2)))
            val sorted1 = cands.sortBy { case (u, _, rem, nr) =>
              (!nr, -rem, u) }
            sorted1.headOption.toSeq.flatMap { p1 =>
              val first = (id, 1L) -> ((p1._1, p1._2, p1._4))
              val second = if (needed >= 2) {
                cands.filter(_._1 != p1._1)
                  .sortBy { case (u, rk, rem, nr) =>
                    (rk == p1._2, !nr, -rem, u) }
                  .headOption.map(p2 => (id, 2L) -> ((p2._1, p2._2, p2._4)))
              } else None
              Seq(first) ++ second
            }
          }
        }
    }.toMap
    // ---- engine ----
    val got = graft.operators.ClusterHealth.replicaPlacement(
        reps.toDF("container_id", "datanode", "rack", "replica_state"),
        dns.toDF("uuid", "rack", "state", "op_state", "remaining"),
        conts.toDF("container_id", "state", "replication_factor",
          "used_bytes"))
      .collect().map(r => (r.getAs[Long]("container_id"),
        r.getAs[Long]("pick")) ->
        ((r.getAs[String]("datanode"), r.getAs[String]("rack"),
          r.getAs[Boolean]("new_rack")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"pick $k")
    }
    // both pick orders and both rack outcomes reached
    assert(expected.keys.exists(_._2 == 2L))
    assert(expected.values.exists(_._3) && expected.values.exists(!_._3))
  }

  test("containerReportFold == a literal FCR/ICR replay over random" +
    " report streams") {
    // SCM report ingest: a full container report REPLACES the node's
    // replica set (events before the last FCR boundary are dead), an
    // incremental report upserts one replica, DELETED removes it.
    val rnd = new Random(24601)
    val states = Seq("OPEN", "CLOSED", "QUASI_CLOSED", "UNHEALTHY",
      "DELETED")
    val events = (0 until 12).flatMap { d =>
      val dn = s"dn$d"
      (1L to (3 + rnd.nextInt(8)).toLong).flatMap { seq =>
        if (rnd.nextInt(4) == 0) {
          // FCR: a fresh set of 0..4 distinct containers at this seq
          rnd.shuffle((1L to 9L).toList).take(rnd.nextInt(5)).map(c =>
            (dn, seq, "FCR", c, states(rnd.nextInt(4))))
        } else {
          Seq((dn, seq, "ICR", 1L + rnd.nextInt(9),
            states(rnd.nextInt(states.length))))
        }
      }
    }
    // ---- literal walk ----
    val expected = events.groupBy(_._1).flatMap { case (dn, evs) =>
      val lastFcr = evs.filter(_._3 == "FCR").map(_._2)
        .reduceOption(_ max _).getOrElse(0L)
      evs.filter(_._2 >= lastFcr)
        .groupBy(_._4)
        .map { case (c, es) => (dn, c) -> es.maxBy(_._2)._5 }
        .filter(_._2 != "DELETED")
    }.toMap
    // ---- engine ----
    val got = graft.operators.ClusterHealth.containerReportFold(
        events.toDF("datanode", "seq", "kind", "container_id",
          "replica_state"))
      .collect().map(r => (r.getAs[String]("datanode"),
        r.getAs[Long]("container_id")) ->
        r.getAs[String]("replica_state")).toMap
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("nodeHealthFold == a literal NodeStateManager state machine over" +
    " random heartbeat/check timelines") {
    // HEALTHY/HEALTHY_READONLY/STALE/DEAD with the layout gate, the
    // timeout-wins capture order, resurrection rules, and the
    // long-pause skip guard; fired-event strings per transition.
    val rnd = new Random(31415)
    val scmMlv = 3L; val staleMs = 300000L; val deadMs = 600000L
    val minChk = staleMs
    val events = (0 until 10).flatMap { d =>
      val uuid = s"dn$d"
      var t = 2L + 2 * rnd.nextInt(50000)
      val reg = (uuid, t, "REGISTER", 2L + rnd.nextInt(3))
      val hbs = (0 until rnd.nextInt(12)).map { _ =>
        t += 2 * (10000 + rnd.nextInt(250000))
        (uuid, t, "HB", 2L + rnd.nextInt(3))
      }
      reg +: hbs
    }
    val checks = {
      var t = 100001L
      val b = scala.collection.mutable.ArrayBuffer[Long]()
      while (t < 3200000L) { b += t; t += 2 * (40000 + rnd.nextInt(200000)) }
      b.toSeq
    }
    // ---- literal walk ----
    case class S(state: String, lastHb: Long, lastChk: Long, mlv: Long)
    def net(s: S, t: Long): String = s.state match {
      case "HEALTHY" =>
        if (s.lastHb < t - staleMs) "STALE"
        else if (s.mlv != scmMlv) "HEALTHY_READONLY" else "HEALTHY"
      case "HEALTHY_READONLY" =>
        if (s.lastHb < t - staleMs) "STALE"
        else if (s.mlv == scmMlv) "HEALTHY" else "HEALTHY_READONLY"
      case "STALE" =>
        if (s.lastHb < t - deadMs) "DEAD"
        else if (s.lastHb >= t - staleMs) "HEALTHY_READONLY" else "STALE"
      case _ =>
        if (s.lastHb >= t - staleMs) "HEALTHY_READONLY" else "DEAD"
    }
    val expected = events.map(_._1).distinct.flatMap { uuid =>
      val merged = (events.filter(_._1 == uuid)
        .map(e => (e._2, e._3, e._4)) ++
        checks.map(c => (c, "CHECK", -1L)))
        .sortBy(identity)
      var s = S("", -1L, 0L, -1L)
      merged.flatMap { case (t, kind, mlv) =>
        kind match {
          case "REGISTER" =>
            s = S(if (mlv != scmMlv) "HEALTHY_READONLY" else "HEALTHY",
              t, s.lastChk, mlv); None
          case "HB" =>
            s = S(s.state, t, s.lastChk, mlv); None
          case _ =>
            val pre = s
            val skipped = pre.state == "" || t - pre.lastChk >= minChk
            val after = if (skipped) pre.state else net(pre, t)
            s = S(after, pre.lastHb, t, pre.mlv)
            if (pre.state == "") None
            else {
              val stale = pre.lastHb < t - staleMs
              val dead = pre.lastHb < t - deadMs
              val mism = pre.mlv != scmMlv
              val fired =
                if (skipped) ""
                else pre.state match {
                  case "HEALTHY" =>
                    if (mism && stale) "HEALTHY_READONLY_NODE,STALE_NODE"
                    else if (mism) "HEALTHY_READONLY_NODE"
                    else if (stale) "STALE_NODE" else ""
                  case "HEALTHY_READONLY" =>
                    if (!mism && stale)
                      "HEALTHY_READONLY_TO_HEALTHY_NODE,STALE_NODE"
                    else if (!mism) "HEALTHY_READONLY_TO_HEALTHY_NODE"
                    else if (stale) "STALE_NODE" else ""
                  case "STALE" =>
                    if (dead) "DEAD_NODE"
                    else if (!stale) "HEALTHY_READONLY_NODE" else ""
                  case _ =>
                    if (!stale) "HEALTHY_READONLY_NODE" else ""
                }
              Some((uuid, t) -> ((if (skipped) 1 else 0, pre.state, after,
                pre.lastHb, fired)))
            }
        }
      }
    }.toMap
    // ---- engine ----
    val got = graft.operators.ClusterHealth.nodeHealthFold(
        events.toDF("uuid", "ts_ms", "kind", "mlv"),
        checks.toDF("check_ms"))
      .collect().map(r => (r.getAs[String]("uuid"),
        r.getAs[Long]("check_ms")) ->
        ((r.getAs[Int]("skipped"), r.getAs[String]("state_before"),
          r.getAs[String]("state_after"), r.getAs[Long]("last_hb_ms"),
          r.getAs[String]("fired")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"check $k")
    }
    val states = expected.values.map(_._3).toSet
    assert(Set("HEALTHY", "HEALTHY_READONLY", "STALE", "DEAD")
      .subsetOf(states), s"state space reached: $states")
  }

  test("dnDispatchLadder == a literal KeyValueHandler replay over random" +
    " op streams") {
    // state gate (refusal reason per container state), DELETE_BLOCK
    // unsupported, the running per-container BCSID fence (replay
    // ignored at or below the watermark), read-side UNKNOWN_BCSID /
    // NO_SUCH_BLOCK / BCSID_MISMATCH probes.
    val rnd = new Random(1729)
    val cstates = Seq("OPEN", "CLOSING", "RECOVERING", "QUASI_CLOSED",
      "CLOSED", "UNHEALTHY", "INVALID", "DELETING")
    val conts = (1L to 12L).map(id =>
      (id, cstates(rnd.nextInt(cstates.length)), rnd.nextInt(20).toLong))
    val opKinds = Seq("PUT_BLOCK", "PUT_BLOCK", "WRITE_CHUNK",
      "GET_BLOCK", "DELETE_BLOCK")
    val ops = (1L to 400L).map { seq =>
      (seq, conts(rnd.nextInt(conts.size))._1,
        opKinds(rnd.nextInt(opKinds.length)),
        rnd.nextInt(30).toLong, rnd.nextInt(4) != 0,
        rnd.nextInt(30).toLong)
    }
    // ---- literal walk ----
    val contMap = conts.map(c => c._1 -> c).toMap
    val writeOps = Set("PUT_BLOCK", "WRITE_CHUNK")
    val expected = ops.groupBy(_._2).flatMap { case (cid, cOps) =>
      val (_, cstate, initBcs) = contMap(cid)
      val gateOk = Set("OPEN", "CLOSING", "RECOVERING").contains(cstate)
      var watermark = 0L
      cOps.sortBy(_._1).map { case (seq, _, op, bcsid, exists, stored) =>
        val before = math.max(initBcs, watermark)
        val decision =
          if (writeOps(op) && !gateOk) {
            if (cstate == "QUASI_CLOSED" || cstate == "CLOSED")
              "CLOSED_CONTAINER_IO"
            else if (cstate == "UNHEALTHY") "CONTAINER_UNHEALTHY"
            else if (cstate == "INVALID") "INVALID_CONTAINER_STATE"
            else "CONTAINER_INTERNAL_ERROR"
          } else if (op == "DELETE_BLOCK") "UNSUPPORTED_OP"
          else if (op == "PUT_BLOCK" && bcsid != 0 && bcsid <= before)
            "REPLAY_IGNORED"
          else if (writeOps(op)) "APPLIED"
          else if (bcsid > before) "UNKNOWN_BCSID"
          else if (!exists) "NO_SUCH_BLOCK"
          else if (stored < bcsid) "BCSID_MISMATCH"
          else "OK"
        if (op == "PUT_BLOCK" && gateOk && bcsid != 0)
          watermark = math.max(watermark, bcsid)
        seq -> ((cid, op, decision, math.max(initBcs, watermark)))
      }
    }.toMap
    // ---- engine ----
    val got = graft.operators.ClusterHealth.dnDispatchLadder(
        ops.toDF("seq", "container_id", "op", "bcsid", "block_exists",
          "stored_bcsid"),
        conts.toDF("container_id", "cstate", "initial_bcsid"))
      .collect().map(r => r.getAs[Long]("seq") ->
        ((r.getAs[Long]("container_id"), r.getAs[String]("op"),
          r.getAs[String]("decision"), r.getAs[Long]("bcs_after")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"op $k")
    }
    val ds = expected.values.map(_._3).toSet
    assert(ds.contains("REPLAY_IGNORED") && ds.contains("APPLIED") &&
      ds.contains("UNKNOWN_BCSID"), s"rungs reached: $ds")
  }

  test("pipelineCreatePlan == a literal topology walk over random node" +
    " catalogs") {
    // PipelinePlacementPolicy shape: viability rungs (health, op state,
    // space for meta+data, per-node open-Ratis pipeline limit), then
    // least-engaged anchor, a different-rack second, and a third that
    // prefers the anchor's rack, then the second's, then any viable.
    val rnd = new Random(8128)
    val metaBytes = 1000000000L; val dataBytes = 700000000000L
    val need = metaBytes + dataBytes
    for (trial <- 0 until 30) {
      val dns = (0 until 8).map { i =>
        (s"dn$i", "r" + rnd.nextInt(3),
          if (rnd.nextInt(5) == 0) "STALE" else "HEALTHY",
          if (rnd.nextInt(5) == 0) "DECOMMISSIONING" else "IN_SERVICE",
          if (rnd.nextInt(4) == 0) need / 2 else need + rnd.nextInt(1000))
      }
      val pipes = (1L to 6L).map(p => (p,
        if (rnd.nextBoolean()) "RATIS/THREE" else "EC/rs-3-2-1024k",
        if (rnd.nextInt(4) == 0) "CLOSED" else "OPEN"))
      val members = pipes.flatMap { case (pid, _, _) =>
        rnd.shuffle(dns.map(_._1)).take(3).map(dn => (pid, dn))
      }
      // ---- literal walk ----
      val openRatis = pipes.filter(p =>
        p._2 == "RATIS/THREE" && p._3 != "CLOSED").map(_._1).toSet
      val pcount = members.filter(m => openRatis(m._1))
        .groupBy(_._2).view.mapValues(_.size.toLong).toMap
        .withDefaultValue(0L)
      val staged = dns.map { case (u, rack, st, op, rem) =>
        val v0 =
          if (st != "HEALTHY") "EXCLUDED_HEALTH"
          else if (op != "IN_SERVICE") "EXCLUDED_OP_STATE"
          else if (rem < need) "EXCLUDED_SPACE"
          else if (pcount(u) >= 2L) "EXCLUDED_PIPELINE_LIMIT"
          else "VIABLE"
        (u, rack, pcount(u), v0)
      }
      val viable = staged.filter(_._4 == "VIABLE")
        .sortBy(s => (s._3, s._1))
      val expected = scala.collection.mutable.Map[String, String]()
      staged.foreach { s => expected(s._1) = s._4 }
      viable.headOption.foreach { a =>
        expected(a._1) = "ANCHOR"
        val second = viable.tail.find(_._2 != a._2)
        second.foreach { sn => expected(sn._1) = "SECOND_DIFF_RACK" }
        val nRack = second.map(_._2)
        val thirds = viable
          .filter(v => v._1 != a._1 && !second.exists(_._1 == v._1))
          .sortBy { v =>
            val pref = if (v._2 == a._2) 0
              else if (nRack.contains(v._2)) 1 else 2
            (pref, v._3, v._1)
          }
        thirds.headOption.foreach { t =>
          val pref = if (t._2 == a._2) "THIRD_ANCHOR_RACK"
            else if (nRack.contains(t._2)) "THIRD_NEXT_RACK"
            else "THIRD_FALLBACK"
          expected(t._1) = pref
        }
        viable.foreach { v =>
          if (expected(v._1) == "VIABLE") expected(v._1) = "VIABLE_UNUSED" }
      }
      // ---- engine ----
      val got = graft.operators.ClusterHealth.pipelineCreatePlan(
          dns.toDF("uuid", "rack", "state", "op_state", "remaining"),
          pipes.toDF("pipeline_id", "replication", "state"),
          members.toDF("pipeline_id", "datanode"))
        .collect().map(r => r.getAs[String]("uuid") ->
          r.getAs[String]("verdict")).toMap
      assert(got === expected.toMap, s"trial $trial: $dns")
    }
  }

  test("ecRecoveryPlan == a literal shard census over random shard maps") {
    // ECContainerReplicaCount census: per-index online (healthy copy on
    // an in-service node) vs offline-only; UNRECOVERABLE below the data
    // shard count, missing-index reconstruction, per-index excess,
    // offline-only re-copies.
    val rnd = new Random(496)
    val opStates = Seq("IN_SERVICE", "IN_SERVICE", "IN_SERVICE",
      "DECOMMISSIONING", "IN_MAINTENANCE")
    val dns = (0 until 10).map(i => (s"dn$i",
      opStates(rnd.nextInt(opStates.length))))
    val dnOp = dns.toMap
    val shardStates = Seq("CLOSED", "CLOSED", "CLOSED", "UNHEALTHY")
    val inSvc = dns.filter(_._2 == "IN_SERVICE").map(_._1)
    val shards = (1L to 150L).flatMap { cid =>
      (1 to 5).flatMap { idx =>
        (0 until rnd.nextInt(3)).map { _ =>
          (cid, idx, dns(rnd.nextInt(dns.size))._1,
            shardStates(rnd.nextInt(shardStates.length)))
        }
      }
    } ++ (1 to 5).map(idx => (900L, idx, inSvc.head, "CLOSED"))
    // ---- literal walk ----
    val expected = shards.groupBy(_._1).map { case (cid, ss) =>
      val perIdx = (1 to 5).map { idx =>
        val g = ss.filter(_._2 == idx)
        val online = g.count(s => s._4 != "UNHEALTHY" &&
          dnOp(s._3) == "IN_SERVICE").toLong
        val offline = g.count(s => s._4 != "UNHEALTHY" &&
          dnOp(s._3) != "IN_SERVICE").toLong
        (online, offline)
      }
      val onlineIdx = perIdx.count(_._1 >= 1).toLong
      val offlineOnly = perIdx.count(p => p._1 == 0 && p._2 >= 1).toLong
      val maxCopies = perIdx.map(_._1).max
      val avail = onlineIdx + offlineOnly
      val missing = 5L - avail
      val decision =
        if (avail < 3) "UNRECOVERABLE"
        else if (missing > 0) "UNDER_REPLICATED"
        else if (maxCopies > 1) "OVER_REPLICATED"
        else if (offlineOnly > 0) "OFFLINE_COPIES"
        else "HEALTHY"
      cid -> ((onlineIdx, offlineOnly, missing, maxCopies, decision,
        if (decision == "UNDER_REPLICATED") missing else 0L))
    }
    // ---- engine ----
    val got = graft.operators.ClusterHealth.ecRecoveryPlan(
        shards.toDF("container_id", "replica_index", "datanode",
          "shard_state"),
        dns.toDF("uuid", "op_state"))
      .collect().map(r => r.getAs[Long]("container_id") ->
        ((r.getAs[Long]("online_indexes"),
          r.getAs[Long]("offline_only_indexes"),
          r.getAs[Long]("missing_indexes"), r.getAs[Long]("max_copies"),
          r.getAs[String]("decision"),
          r.getAs[Long]("reconstruct_shards")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"container $k")
    }
    val ds = expected.values.map(_._5).toSet
    assert(ds === Set("UNRECOVERABLE", "UNDER_REPLICATED",
      "OVER_REPLICATED", "OFFLINE_COPIES", "HEALTHY"))
  }

  test("scmBlockDispatch == the literal getTransactions loop over random" +
    " txn logs") {
    // DeletedBlockLogImpl.getTransactions walked literally: circular
    // resume, budget at loop top, per-DN caps over ALL replicas,
    // per-DN duplication filtering, replica-copy budget accounting.
    val rnd = new Random(8192)
    for (trial <- 0 until 12) {
      val limit = 60L + rnd.nextInt(100)
      val lastProcessed = rnd.nextInt(14).toLong
      val dns = (1 to 5).map(i => s"d$i")
      val included = dns.filter(_ => rnd.nextInt(10) < 8)
      val factor = included.size / 2
      val maxPerDn = if (factor > 0) math.min(limit, limit / factor)
        else limit
      val conts = (1 to 8).map { i =>
        (s"c$i",
          Seq("CLOSED", "CLOSED", "CLOSED", "DELETED", "OPEN")(
            rnd.nextInt(5)),
          rnd.nextInt(10) < 8)
      }
      val reps = conts.flatMap { case (c, _, _) =>
        dns.filter(_ => rnd.nextInt(10) < 5).map(d => (c, d))
      }
      val txns = (1L to 12L).map { t =>
        (t, s"c${1 + rnd.nextInt(9)}", 5L + rnd.nextInt(30))
      } // c9 is absent from the container catalog
      val dups = txns.flatMap { case (t, c, _) =>
        reps.filter(_._1 == c).map(_._2).distinct
          .filter(_ => rnd.nextInt(10) < 2).map(d => (d, t))
      }
      // literal walk
      val contMap = conts.map(c => c._1 -> c).toMap
      val repMap = reps.groupBy(_._1).map { case (c, l) =>
        c -> l.map(_._2).distinct.sorted }
      val perDn = collection.mutable.Map[String, Long]().withDefaultValue(0L)
      var global = 0L
      val order = txns.filter(_._1 > lastProcessed).sortBy(_._1) ++
        txns.filter(_._1 <= lastProcessed).sortBy(_._1)
      val expected = order.map { case (t, c, blocks) =>
        if (global >= limit) t -> (("NOT_REACHED", 0L, 0L))
        else contMap.get(c) match {
          case None => t -> (("CLEANUP_COMPLETED", 0L, 0L))
          case Some((_, "DELETED", _)) => t -> (("CLEANUP_COMPLETED", 0L, 0L))
          case Some((_, "OPEN", _)) => t -> (("SKIP_OPEN", 0L, 0L))
          case Some((_, _, healthOk)) =>
            val rs = repMap.getOrElse(c, Seq.empty)
            if (rs.exists(!included.contains(_)) || !healthOk)
              t -> (("SKIP_INADEQUATE_REPLICA", 0L, 0L))
            else if (rs.exists(d => perDn(d) >= maxPerDn))
              t -> (("SKIP_DN_CAP", 0L, 0L))
            else {
              val nd = rs.filterNot(d => dups.contains((d, t)))
              if (nd.isEmpty) t -> (("SKIP_ALL_DUPLICATE", 0L, 0L))
              else {
                nd.foreach(d => perDn(d) += blocks)
                global += blocks * nd.size
                t -> (("DISPATCHED", nd.size.toLong,
                  blocks * nd.size))
              }
            }
        }
      }.toMap
      import spark.implicits._
      val got = graft.operators.ClusterHealth.scmBlockDispatch(
          txns.toDF("txn_id", "container_id", "blocks"),
          conts.toDF("container_id", "cstate", "health_ok"),
          reps.distinct.toDF("container_id", "dn"),
          included.toDF("dn"),
          (if (dups.nonEmpty) dups.distinct else Seq(("dx", -1L)))
            .toDF("dn", "txn_id"),
          limit, 2L, lastProcessed)
        .collect().map(r => r.getAs[Long]("txn_id") ->
          ((r.getAs[String]("verdict"), r.getAs[Long]("dns_sent"),
            r.getAs[Long]("blocks_added")))).toMap
      assert(got === expected,
        s"trial $trial limit=$limit lp=$lastProcessed inc=$included")
    }
  }

  test("volumeChooseFold == the literal RoundRobinVolumeChoosingPolicy" +
    " loop over random op streams") {
    // RoundRobinVolumeChoosingPolicy.chooseVolume walked literally:
    // circular scan from the persistent cursor, success-only cursor
    // advance, committed accumulation, removals stranding the cursor,
    // empty-list refusals.
    val rnd = new Random(512)
    for (trial <- 0 until 10) {
      var volId = 0
      val ops = collection.mutable.ArrayBuffer[(Long, String)]()
      val pool = collection.mutable.ArrayBuffer[String]()
      for (seqi <- 1 to 30) {
        val r = rnd.nextInt(10)
        if (r < 2 || pool.isEmpty) {
          val v = s"v$volId"; volId += 1
          ops += ((seqi.toLong, s"ADD:$v:${(rnd.nextInt(10) + 1) * 100}"))
          pool += v
        } else if (r < 3) {
          val v = pool.remove(rnd.nextInt(pool.size))
          ops += ((seqi.toLong, s"REMOVE:$v"))
        } else {
          ops += ((seqi.toLong, s"ALLOC:${(rnd.nextInt(8) + 1) * 50}"))
        }
      }
      // literal policy walk
      case class V(id: String, av: Long, var com: Long)
      val vols = collection.mutable.ArrayBuffer[V]()
      var next = 0
      val expected = ops.map { case (seqi, op) =>
        val f = op.split(":")
        f(0) match {
          case "ADD" =>
            vols += V(f(1), f(2).toLong, 0L)
            seqi -> (("ADDED", f(1), 0L, next.toLong))
          case "REMOVE" =>
            val i = vols.indexWhere(_.id == f(1))
            if (i >= 0) vols.remove(i)
            seqi -> (("REMOVED", f(1), 0L, next.toLong))
          case _ =>
            val sz = f(1).toLong
            if (vols.isEmpty) seqi -> (("NO_VOLUMES", "", 0L, next.toLong))
            else {
              val start = if (next < vols.size) next else 0
              val found = (0 until vols.size)
                .map(k => (start + k) % vols.size)
                .find(i => vols(i).av - vols(i).com >= sz)
              found match {
                case Some(i) =>
                  vols(i).com += sz
                  next = (i + 1) % vols.size
                  seqi -> (("CHOSEN", vols(i).id, vols(i).com,
                    next.toLong))
                case None =>
                  seqi -> (("OUT_OF_SPACE", "", 0L, next.toLong))
              }
            }
        }
      }.toMap
      val got = graft.operators.ClusterHealth.volumeChooseFold(
          ops.toSeq.toDF("seq", "op"))
        .collect().map(r => r.getAs[Long]("seq") ->
          ((r.getAs[String]("action"), r.getAs[String]("vol"),
            r.getAs[Long]("committed_after"),
            r.getAs[Long]("next_after")))).toMap
      assert(got === expected, s"trial $trial ops=$ops")
    }
  }

  test("scmBlockAllocate cursor rule == the literal tail/head NavigableSet" +
    " walk over random container sets") {
    // ContainerStateManagerImpl.getMatchingContainer walked literally:
    // tailSet(cursor, exclusive) first-with-space, empty tail → whole
    // set, space-less tail → headSet(cursor, inclusive). Mints are
    // disabled (limit-0 pipeline, space-less member) so a miss is
    // observable as CREATE_PIPELINE.
    val rnd = new Random(2048)
    for (trial <- 0 until 15) {
      val ids = (1 to 5 + rnd.nextInt(8)).map(_ => 100L + rnd.nextInt(40))
        .distinct.sorted
      val used = ids.map(id => id -> rnd.nextInt(1100).toLong).toMap
      val size = 50L + rnd.nextInt(100)
      val hasCursor = rnd.nextBoolean()
      val cursor = if (hasCursor) ids(rnd.nextInt(ids.size)) else ids.min
      val fits = (id: Long) => used(id) + size <= 1000L
      val tail = ids.filter(_ > cursor)
      val expected =
        (if (tail.isEmpty) ids.find(fits)
         else tail.find(fits).orElse(ids.filter(_ <= cursor).find(fits)))
      import spark.implicits._
      val got = graft.operators.ClusterHealth.scmBlockAllocate(
        Seq((1L, size, "o", "R", "", "", 0L)).toDF("req_id", "size",
          "owner", "rep_config", "excl_dn", "excl_pipeline",
          "excl_container"),
        Seq(("pl-x", "R", "OPEN", true)).toDF("pipeline_id",
          "rep_config", "pstate", "healthy"),
        Seq(("pl-x", "dnZ")).toDF("pipeline_id", "dn"),
        Seq(("dnZ", 1L, 0L, false)).toDF("dn", "healthy_volumes",
          "pipeline_limit", "has_space"),
        ids.map(id => (id, "pl-x", "o", used(id)))
          .toDF("container_id", "pipeline_id", "owner", "used"),
        (if (hasCursor) Seq(("o", "pl-x", cursor)) else Seq.empty)
          .toDF("owner", "pipeline_id", "last_used"))
        .collect().head
      val gotHit = if (got.getAs[String]("verdict") == "ALLOCATED")
        Some(got.getAs[Long]("container_id")) else None
      assert(gotHit === expected,
        s"trial $trial ids=$ids cursor=$cursor size=$size used=$used")
    }
  }

  test("snapshotDeleteWalk prefix-sum plan == the sequential two-budget" +
    " loop over random chains") {
    // SnapshotDeletingService.call walked literally: reverse global
    // order, free skips, keys→dirs→renames drains, purge-listing,
    // both budget cutoffs. Diagnostic budget columns are only compared
    // on reached rows (past the stop the engine's full-demand prefix
    // keeps falling while the loop's counter freezes — same verdicts).
    val rnd = new Random(4096)
    for (trial <- 0 until 20) {
      val keyLimit = 5L + rnd.nextInt(21)
      val snapLimit = 2L + rnd.nextInt(5)
      val pathSeqs = collection.mutable.Map[String, Long]()
      val rows = (1L to 40L).map { gs =>
        val path = s"p${rnd.nextInt(4)}"
        val seq = pathSeqs.getOrElse(path, 0L) + 1
        pathSeqs(path) = seq
        val status = if (rnd.nextInt(10) < 3) "SNAPSHOT_ACTIVE"
          else "SNAPSHOT_DELETED"
        (gs, s"s$gs", path, seq, status, rnd.nextInt(10) < 8,
          rnd.nextInt(4).toLong, rnd.nextInt(3).toLong,
          rnd.nextInt(2).toLong)
      }
      val nextOf = rows.groupBy(_._3).values.flatMap { ps =>
        val sorted = ps.sortBy(_._4)
        sorted.zip(sorted.drop(1)).map { case (a, b) =>
          a._2 -> ((b._2, b._5)) }
      }.toMap
      var r = keyLimit; var sl = snapLimit
      val expected = rows.sortBy(-_._1).map {
        case (gs, snap, _, _, status, flushed, nk, nd, nr) =>
          val next = nextOf.get(snap)
          if (r <= 0 || sl <= 0) snap -> (("NOT_REACHED", 0L, 0L, 0L, ""))
          else if (status != "SNAPSHOT_DELETED")
            snap -> (("SKIP_ACTIVE", 0L, 0L, 0L, ""))
          else if (!flushed) snap -> (("SKIP_NOT_FLUSHED", 0L, 0L, 0L, ""))
          else if (next.exists(_._2 != "SNAPSHOT_ACTIVE"))
            snap -> (("SKIP_NEXT_NOT_ACTIVE", 0L, 0L, 0L, ""))
          else if (nk + nd + nr == 0) {
            sl -= 1; snap -> (("PURGE_LISTED", 0L, 0L, 0L, ""))
          } else {
            val km = math.min(nk, r); val dm = math.min(nd, r - km)
            val rm = math.min(nr, r - km - dm)
            r -= km + dm + rm; sl -= 1
            snap -> (("MOVED", km, dm, rm, next.map(_._1).getOrElse("AOS")))
          }
      }.toMap
      val got = graft.operators.Reclaim.snapshotDeleteWalk(
          rows.toDF("global_seq", "snap", "path_id", "path_seq",
            "status", "flushed", "n_deleted_keys", "n_deleted_dirs",
            "n_renames"), keyLimit, snapLimit)
        .collect().map(row => row.getAs[String]("snap") ->
          ((row.getAs[String]("action"), row.getAs[Long]("keys_moved"),
            row.getAs[Long]("dirs_moved"),
            row.getAs[Long]("renames_moved"),
            row.getAs[String]("dest")))).toMap
      assert(got === expected, s"trial $trial key=$keyLimit snap=$snapLimit")
    }
  }

  test("dirDeleteWalk prefix-sum plan == the sequential budget loop" +
    " over random pending-dir tables") {
    // The engine replaces DirectoryDeletingService's stateful
    // remainNum loop with full-demand prefix sums; this walks the
    // ACTUAL sequential loop and checks row-for-row equivalence,
    // including the truncation boundary and post-budget cutoff.
    val rnd = new Random(1024)
    for (trial <- 0 until 20) {
      val budget = 15L + rnd.nextInt(40)
      val dirs = (1L to 60L).map { id =>
        val files = rnd.nextInt(5).toLong
        (id, rnd.nextInt(4).toLong, files,
          if (files == 0) 0L else rnd.nextInt(files.toInt + 1).toLong,
          rnd.nextBoolean())
      }
      var r = budget
      val expected = dirs.map { case (id, sd, sf, rf, purge) =>
        val eligible = if (purge) sf else rf
        val base = sd + eligible
        if (r <= 0) { id -> (("NOT_REACHED", 0L, 0L, false)) }
        else if (base <= r) {
          val action = if (purge) "PURGED"
            else if (base > 0) "MOVED" else "SKIP_EMPTY"
          r -= base + (if (purge) 1L else 0L)
          id -> ((action, sd, eligible, purge))
        } else {
          val sdm = math.min(sd, r)
          val fm = math.min(eligible, r - sdm)
          r = 0
          id -> (("PARTIAL", sdm, fm, false))
        }
      }.toMap
      val got = graft.operators.Reclaim.dirDeleteWalk(
          dirs.toDF("dir_id", "n_subdirs", "n_subfiles",
            "n_reclaimable_files", "purge_dir"), budget)
        .collect().map(row => row.getAs[Long]("dir_id") ->
          ((row.getAs[String]("action"), row.getAs[Long]("subdirs_moved"),
            row.getAs[Long]("files_moved"),
            row.getAs[Boolean]("parent_purged")))).toMap
      assert(got === expected, s"trial $trial budget $budget")
    }
  }

  test("mpuCleanupWalk prefix-sum plan == the sequential loop-top budget" +
    " walk + abort ladder over random MPU stores") {
    // getExpiredMultipartUploads checks `numParts < maxParts` at LOOP
    // TOP, so the entry crossing the budget is fully included and only
    // expired entries charge; the abort apply then runs the
    // bucket-missing / gone-at-apply / updateID-fence ladder. This
    // walks the actual sequential loop and checks row-for-row
    // equivalence against the windowed plan.
    val rnd = new Random(2718)
    for (trial <- 0 until 20) {
      val maxParts = 5L + rnd.nextInt(30)
      val trxn = 500L
      val live = (for (v <- 0 until 2; b <- 0 until 3
                       if rnd.nextInt(5) != 0)
        yield (s"v$v", s"b$b")).toSeq
      val store = (1 to 50).map { i =>
        (s"v${rnd.nextInt(2)}", s"b${rnd.nextInt(3)}",
          f"k$i%03d", f"up${rnd.nextInt(1000)}%04d",
          rnd.nextLong(2000L),          // initiated_ms; cutoff 1000
          1L + rnd.nextInt(6),          // num_parts
          rnd.nextLong(1000L),          // update_id
          rnd.nextInt(4) != 0)          // present_at_apply
      }
      val liveSet = live.toSet
      var used = 0L
      val expected = store
        .map { case (v, b, k, up, init, np, uid, present) =>
          (s"/$v/$b/$k/$up", v, b, init, np, uid, present)
        }
        .sortBy(_._1)
        .map { case (mk, v, b, init, np, uid, present) =>
          val budgetBefore = maxParts - used
          val decision =
            if (budgetBefore <= 0) "NOT_REACHED"
            else if (init > 1000L) "NOT_EXPIRED"
            else {
              used += np
              if (!liveSet((v, b))) "SKIP_BUCKET_MISSING"
              else if (!present) "SKIP_GONE"
              else if (trxn < uid) "SKIP_UPDATE_FENCE"
              else "ABORTED"
            }
          val deleted = if (decision == "ABORTED") np else 0L
          mk -> ((decision, np, budgetBefore, deleted))
        }.toMap
      val got = graft.operators.Lifecycle.mpuCleanupWalk(
          store.toDF("volume", "bucket", "key", "upload_id",
            "initiated_ms", "num_parts", "update_id", "present_at_apply"),
          live.toDF("volume", "bucket"),
          expiredBeforeMs = 1000L, maxParts = maxParts, trxnIndex = trxn)
        .collect().map(r => r.getAs[String]("mpu_key") ->
          ((r.getAs[String]("decision"), r.getAs[Long]("num_parts"),
            r.getAs[Long]("budget_before"),
            r.getAs[Long]("parts_deleted")))).toMap
      assert(got === expected, s"trial $trial maxParts $maxParts")
    }
  }

  test("pipelineCapacityCompare == the literal SCMNodeMetric stack walk" +
    " over random pipelines (float path included)") {
    // The engine's integer epsilon band must agree with the reference's
    // float comparator (SCMNodeMetric.isGreater/isLess) on every random
    // pair — weights here are k/1000-grained, far from the 1e-6 band
    // edge, which is the documented fixture-cleanliness contract.
    val rnd = new Random(31337)
    for (trial <- 0 until 15) {
      val pipes = (0 until 6).map { p =>
        val n = 1 + rnd.nextInt(4)
        s"pp$p" -> (0 until n).map { i =>
          val cap = (1 + rnd.nextInt(10)) * 100000L
          val used = (rnd.nextInt(11).toLong * cap) / 10 // 0.0..1.0 steps
          (s"pp${p}n$i", used, cap)
        }
      }
      // literal comparator: float weights, 1e-6 band, raw-used tiebreak
      def cmpNode(a: (String, Long, Long), b: (String, Long, Long)): Int = {
        val wa = a._2 / (if (a._3 == 0) 1L else a._3).toFloat
        val wb = b._2 / (if (b._3 == 0) 1L else b._3).toFloat
        if (math.abs(wa - wb) > 0.000001) { if (wa > wb) 1 else -1 }
        else if (a._2 != b._2) { if (a._2 > b._2) 1 else -1 }
        else 0
      }
      def stack(nodes: Seq[(String, Long, Long)]) =
        nodes.sortWith((x, y) => cmpNode(x, y) < 0).reverse
      val expected = (for {
        (p1, n1) <- pipes; (p2, n2) <- pipes
      } yield {
        val winner =
          if (p1 == p2) p1
          else {
            val walk = stack(n1).zip(stack(n2))
              .map { case (a, b) => cmpNode(a, b) }.find(_ != 0)
            if (walk.getOrElse(0) <= 0) p1 else p2
          }
        (p1, p2) -> winner
      }).toMap
      val rows = pipes.flatMap { case (p, ns) =>
        ns.map(n => (p, n._1, n._2, n._3)) }
      val got = graft.operators.ClusterHealth.pipelineCapacityCompare(
          rows.toDF("pipeline_id", "node", "used", "capacity"))
        .collect().map(r => (r.getAs[String]("first_id"),
          r.getAs[String]("second_id")) -> r.getAs[String]("winner_id"))
        .toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("ecContainerProvider == the literal getContainer loop over random" +
    " provider states") {
    val rnd = new Random(8086)
    for (trial <- 0 until 20) {
      val nPipes = 3 + rnd.nextInt(8)
      val pipes = (1L to nPipes).map(id =>
        (id, rnd.nextInt(5) != 0, rnd.nextLong(1100000L)))
      val excl = pipes.filter(_ => rnd.nextInt(3) == 0).map(p => ("X", p._1))
      val reqs = (1L to 6L).map(id =>
        (id, 1L + rnd.nextInt(12), 0L, 0L, 1L + rnd.nextInt(12),
          rnd.nextBoolean(), "X"))
      // ---- literal sequential loop ----
      val exSet = excl.map(_._2).toSet
      val expected = reqs.map { case (id, minP, _, _, nodeCnt, cf, _) =>
        val max0 = minP
        var open = nPipes.toLong
        if (open < max0 && !cf) {
          id -> (("NEW_ALLOC_PREMAX", 0L, 0L, 0L, max0))
        } else {
          var sel = 0L; var closed = 0L; var skipped = 0L
          val it = pipes.iterator
          while (sel == 0 && it.hasNext) {
            val (pid, hasC, used) = it.next()
            if (!hasC || used + 100000L > 1000000L) {
              closed += 1; open -= 1
            } else if (exSet(pid)) skipped += 1
            else sel = pid
          }
          if (sel != 0) id -> (("SELECTED", sel, closed, skipped, max0))
          else {
            var maxF = max0
            if (open >= maxF && nodeCnt > maxF) maxF = nodeCnt
            val out =
              if (open < maxF) { if (cf) "FAIL_CREATE"
                else "NEW_ALLOC_FINAL" }
              else "FAIL_LIMIT"
            id -> ((out, 0L, closed, skipped, maxF))
          }
        }
      }.toMap
      val got = graft.operators.ClusterHealth.ecContainerProvider(
          reqs.toDF("req_id", "min_pipelines", "factor_bp",
            "healthy_volumes", "node_count", "create_fails", "set_id"),
          pipes.toDF("pipeline_id", "has_container", "used_bytes"),
          (("X", -1L) +: excl)
            .toDF("set_id", "pipeline_id"))
        .collect().map(r => r.getAs[Long]("req_id") ->
          ((r.getAs[String]("outcome"), r.getAs[Long]("chosen_pipeline"),
            r.getAs[Long]("n_closed"), r.getAs[Long]("n_skipped"),
            r.getAs[Long]("final_max")))).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("safemodeEcRules == a literal rule evaluation over random" +
    " cluster states") {
    val rnd = new Random(5150)
    for (trial <- 0 until 15) {
      val conts = (1L to 80L).map { id =>
        val ec = rnd.nextBoolean()
        (id, if (ec) "EC" else "RATIS", if (ec) 2 + rnd.nextInt(4) else 0,
          Seq("CLOSED", "QUASI_CLOSED", "OPEN", "CLOSING",
            "DELETED")(rnd.nextInt(5)),
          rnd.nextInt(4).toLong)
      }
      val reports = conts.flatMap { case (id, _, _, _, _) =>
        (0 until rnd.nextInt(5)).map(i => (id, s"dn${(id + i * 7) % 15}"))
      }
      val dns = (0 until 15).map(i => (s"dn$i",
        if (rnd.nextInt(4) == 0) "STALE" else "HEALTHY",
        if (rnd.nextInt(5) == 0) "DECOMMISSIONING" else "IN_SERVICE"))
      // literal rules
      val repMap = reports.groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).distinct.size }
      def rule(tp: String): (Long, Long) = {
        val tracked = conts.filter(c => c._2 == tp &&
          Set("CLOSED", "QUASI_CLOSED")(c._4) && c._5 > 0)
        val actual = tracked.count(c =>
          repMap.getOrElse(c._1, 0) >= (if (tp == "EC") c._3 else 1))
        val total = tracked.size.toLong
        ((total * 9900 + 9999) / 10000, actual.toLong)
      }
      val healthy = dns.count(d =>
        d._2 == "HEALTHY" && d._3 == "IN_SERVICE").toLong
      val expected = Map(
        "RATIS_CONTAINER" -> rule("RATIS"),
        "EC_CONTAINER" -> rule("EC"),
        "EC_MIN_DATANODE" -> ((5L, healthy)))
      val got = graft.operators.ClusterHealth.safemodeEcRules(
          conts.toDF("container_id", "rep_type", "ec_data", "state",
            "num_keys"),
          reports.toDF("container_id", "datanode"),
          dns.toDF("uuid", "state", "op_state"),
          defaultEc = Some((3, 2)))
        .collect().map(r => r.getAs[String]("rule") ->
          ((r.getAs[Long]("required"), r.getAs[Long]("actual")))).toMap
      expected.foreach { case (k, v) =>
        assert(got(k) === v, s"trial $trial rule $k")
      }
    }
  }

  test("scmBlockDispatch packed fold == the sequential circular-walk" +
    " budget/cap/dup ladder over random txn logs") {
    // DeletedBlockLogImpl.getTransactions: circular resume strictly
    // after lastProcessed (cursor row examined LAST), global budget at
    // loop top, per-DN cap = min(limit, limit DIV (nDns DIV factor)),
    // CLEANUP/OPEN/INADEQUATE rungs charge nothing, a dispatch charges
    // blocks × non-duplicate datanodes. 20 trials × ~16 txns, block
    // sizes chosen so the budget boundary lands mid-walk.
    val rnd = new Random(40961)
    for (trial <- 0 until 20) {
      val allDns = (0 until 3 + rnd.nextInt(4)).map(i => s"d$i")
      val included = allDns.filter(_ => rnd.nextInt(6) != 0)
      val nConts = 5 + rnd.nextInt(5)
      val conts = (1 to nConts).flatMap { c =>
        if (rnd.nextInt(8) == 0) None // missing from SCM → CLEANUP
        else Some((s"c$c",
          Seq("CLOSED", "CLOSED", "CLOSED", "OPEN", "DELETED")(
            rnd.nextInt(5)),
          rnd.nextInt(5) != 0))
      }
      val reps = (1 to nConts).flatMap { c =>
        rnd.shuffle(allDns).take(1 + rnd.nextInt(3)).map(d => (s"c$c", d))
      }.distinct
      val nTxns = 12 + rnd.nextInt(8)
      val txns = (1 to nTxns).map(t =>
        (t.toLong, s"c${1 + rnd.nextInt(nConts)}", 1L + rnd.nextInt(30)))
      val dups = txns.flatMap { case (t, c, _) =>
        reps.filter(_._1 == c).filter(_ => rnd.nextInt(5) == 0)
          .map { case (_, d) => (d, t) }
      }.distinct
      val blockLimit = 20L + rnd.nextInt(130)
      val lastProcessed = rnd.nextInt(nTxns + 1).toLong
      val factor = included.size.toLong / 2L
      val maxPerDn =
        if (factor > 0) math.min(blockLimit, blockLimit / factor)
        else blockLimit
      val contMap = conts.map(c => c._1 -> c).toMap
      val repMap = reps.groupBy(_._1).map { case (c, rs) =>
        c -> rs.map(_._2).sorted
      }
      val dupSet = dups.toSet
      // the sequential reference walk
      val state = scala.collection.mutable.Map.empty[String, Long]
      val order = txns.map(_._1).sorted
        .sortBy(t => if (t <= lastProcessed) 1 else 0)
      val expected = order.zipWithIndex.map { case (t, i) =>
        val (_, c, blocks) = txns(t.toInt - 1)
        val globalBefore = state.values.sum
        val all = repMap.getOrElse(c, Nil)
        val nd = all.filterNot(d => dupSet((d, t)))
        val verdict =
          if (globalBefore >= blockLimit) "NOT_REACHED"
          else contMap.get(c) match {
            case None => "CLEANUP_COMPLETED"
            case Some((_, "DELETED", _)) => "CLEANUP_COMPLETED"
            case Some((_, "OPEN", _)) => "SKIP_OPEN"
            case Some((_, _, ok))
              if !ok || all.exists(!included.contains(_)) =>
              "SKIP_INADEQUATE_REPLICA"
            case _ =>
              if (all.exists(d => state.getOrElse(d, 0L) >= maxPerDn))
                "SKIP_DN_CAP"
              else if (nd.isEmpty) "SKIP_ALL_DUPLICATE"
              else {
                nd.foreach(d => state(d) = state.getOrElse(d, 0L) + blocks)
                "DISPATCHED"
              }
          }
        val sent = if (verdict == "DISPATCHED") nd.size.toLong else 0L
        t -> ((i + 1L, verdict, sent, sent * blocks, globalBefore))
      }.toMap
      val got = graft.operators.ClusterHealth.scmBlockDispatch(
          txns.toDF("txn_id", "container_id", "blocks"),
          conts.toDF("container_id", "cstate", "health_ok"),
          reps.toDF("container_id", "dn"),
          included.toDF("dn"),
          if (dups.isEmpty) Seq(("", -1L)).toDF("dn", "txn_id")
          else dups.toDF("dn", "txn_id"),
          blockLimit = blockLimit, lastProcessed = lastProcessed)
        .collect().map(r => r.getAs[Long]("txn_id") ->
          ((r.getAs[Long]("walk_pos"), r.getAs[String]("verdict"),
            r.getAs[Long]("dns_sent"), r.getAs[Long]("blocks_added"),
            r.getAs[Long]("global_before")))).toMap
      assert(got === expected,
        s"trial $trial limit $blockLimit cursor $lastProcessed")
    }
  }

  test("exportJobLadder == the sequential ExportJobManager walk over" +
    " random trackers and request batches") {
    // submitJob:131-170 evaluated sequentially: duplicate-state check
    // (QUEUED/RUNNING/COMPLETED tracked ∪ batch-accepted) BEFORE the
    // QUEUED-only capacity check; refused submits are never tracked.
    // STATUS/DOWNLOAD/CANCEL read the snapshot (one per job id, the
    // batch shape the declared fixture uses — in-batch cancel eviction
    // is out of the modeled snapshot semantics).
    val states = Seq("MISSING", "EMPTY_MISSING", "UNDER_REPLICATED",
      "OVER_REPLICATED", "MIS_REPLICATED", "ALL_REPLICAS_BAD",
      "NEGATIVE_SIZE", "REPLICA_MISMATCH")
    val rnd = new Random(77003)
    for (trial <- 0 until 20) {
      val maxQueue = 1 + rnd.nextInt(4)
      val maxDl = 1 + rnd.nextInt(3)
      val nTracked = rnd.nextInt(5)
      val statuses = Seq("QUEUED", "RUNNING", "COMPLETED", "FAILED")
      val tracked = rnd.shuffle(states).take(nTracked).zipWithIndex.map {
        case (st, i) => ((i + 1).toLong, s"job${i + 1}", st,
          statuses(rnd.nextInt(4)), rnd.nextInt(maxDl + 1).toLong)
      }
      val submits = (1 to 6 + rnd.nextInt(5)).map { i =>
        (i.toLong, "SUBMIT",
          if (rnd.nextInt(8) == 0) "BAD_STATE"
          else states(rnd.nextInt(states.size)))
      }
      val others = {
        val ids = tracked.map(_._2) ++ Seq("jobX")
        val base = submits.size
        rnd.shuffle(Seq("STATUS", "DOWNLOAD", "CANCEL").flatMap(op =>
          rnd.shuffle(ids).take(1 + rnd.nextInt(ids.size))
            .map(op -> _))).zipWithIndex
          .map { case ((op, id), i) => ((base + i + 1).toLong, op, id) }
      }
      val reqs = submits ++ others
      // sequential reference walk
      val trackMap = tracked.map(t => t._2 -> t).toMap
      val qpos = tracked.filter(_._4 == "QUEUED").map(_._2)
        .zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }.toMap
      val active = tracked.filter(t =>
        Set("QUEUED", "RUNNING", "COMPLETED")(t._4)).map(_._3).toSet
      var acceptedStates = Set.empty[String]
      var queued = qpos.size.toLong
      val expected = reqs.map { case (rid, op, arg) =>
        val r = op match {
          case "SUBMIT" =>
            if (!states.contains(arg)) ("INVALID_STATE", 0L, 0L)
            else if (active(arg) || acceptedStates(arg))
              ("DUPLICATE_STATE", 0L, 0L)
            else if (queued >= maxQueue) ("QUEUE_FULL", 0L, 0L)
            else {
              acceptedStates += arg; queued += 1
              ("ACCEPTED", queued, 0L)
            }
          case "STATUS" => trackMap.get(arg) match {
            case None => ("NOT_FOUND", 0L, 0L)
            case Some((_, _, _, st, _)) =>
              (st, if (st == "QUEUED") qpos(arg) else 0L, 0L)
          }
          case "DOWNLOAD" => trackMap.get(arg) match {
            case None => ("NOT_FOUND", 0L, 0L)
            case Some((_, _, _, st, _)) if st != "COMPLETED" =>
              ("NOT_COMPLETED", 0L, 0L)
            case Some((_, _, _, _, dc)) if dc >= maxDl =>
              ("LIMIT_REACHED", 0L, 0L)
            case Some((_, _, _, _, dc)) =>
              ("DOWNLOAD_OK", 0L, maxDl - dc - 1L)
          }
          case _ => trackMap.get(arg) match {
            case None => ("NOT_FOUND", 0L, 0L)
            case Some((_, _, _, st, _))
              if st == "QUEUED" || st == "RUNNING" =>
              ("CANCELLED", 0L, 0L)
            case _ => ("DELETED", 0L, 0L)
          }
        }
        rid -> r
      }.toMap
      val got = graft.operators.ReconJobs.exportJobLadderOver(
          tracked.toDF("job_idx", "job_id", "state", "status",
            "download_count"),
          reqs.toDF("req_id", "op", "arg"),
          maxQueueSize = maxQueue, maxDownloads = maxDl)
        .collect().map(r => r.getAs[Long]("req_id") ->
          ((r.getAs[String]("verdict"), r.getAs[Long]("queue_position"),
            r.getAs[Long]("downloads_left")))).toMap
      assert(got === expected, s"trial $trial queue $maxQueue dl $maxDl")
    }
  }
}
