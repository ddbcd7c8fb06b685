package graft

import scala.util.Random

/**
 * Literal-walk property tests for the replication/purge decision cores
 * whose declared queries have shown environment-dependent gate behavior:
 * each Spark plan is checked against an independent imperative walk of
 * the reference algorithm over randomized cluster states (fixed seeds —
 * deterministic). Complements PropertySpec (Ratis/EC/QCS-per-origin and
 * lifecycle cores).
 */
class RedFamilyPropertySpec extends SparkSpecBase {
  import spark.implicits._

  test("replicationQueue == a literal ReplicationQueue weighted-" +
    "redundancy walk over random cluster states") {
    // ReplicationManager under-replicated queue: dead replicas gone,
    // CLOSED replicas only, out-of-service copies weigh a fixed 5 so
    // real redundancy loss drains first; order (weighted, container).
    val rnd = new Random(9001)
    val nodeStates = Seq("HEALTHY", "HEALTHY", "STALE", "DEAD")
    val opStates = Seq("IN_SERVICE", "IN_SERVICE", "IN_SERVICE",
      "DECOMMISSIONING", "IN_MAINTENANCE")
    val dns = (0 until 12).map(i => (s"dn$i",
      nodeStates(rnd.nextInt(nodeStates.length)),
      opStates(rnd.nextInt(opStates.length))))
    val contStates = Seq("OPEN", "CLOSED", "QUASI_CLOSED", "DELETED")
    val conts = (1L to 300L).map(id => (id,
      contStates(rnd.nextInt(contStates.length)),
      1 + rnd.nextInt(3)))
    val repStates = Seq("CLOSED", "CLOSED", "OPEN", "UNHEALTHY")
    val reps = conts.flatMap { case (id, _, _) =>
      rnd.shuffle(dns.map(_._1)).take(rnd.nextInt(5)).map(dn =>
        (id, dn, repStates(rnd.nextInt(repStates.length))))
    }
    // ---- literal walk ----
    val dnMap = dns.map(d => d._1 -> d).toMap
    val expected = conts.filter(_._2 != "DELETED").flatMap {
      case (id, _, rf) =>
        val live = reps.filter(r => r._1 == id && r._3 == "CLOSED" &&
          dnMap(r._2)._2 != "DEAD")
        val av = live.count(r => dnMap(r._2)._3 == "IN_SERVICE").toLong
        val oos = live.size - av
        if (av < rf && av + oos > 0) {
          val remaining = math.max(av + oos - 1, 0L)
          val due = av + oos >= rf
          val weighted = if (due) 5L else remaining
          Some((id, rf.toLong, av, oos, remaining, due, weighted))
        } else None
    }.sortBy(e => (e._7, e._1)).zipWithIndex.map { case (e, i) =>
      e._1 -> ((i + 1L, e._2, e._3, e._4, e._5, e._6, e._7))
    }.toMap
    // ---- engine ----
    val got = graft.operators.ClusterHealth.replicationQueue(
        reps.toDF("container_id", "datanode", "replica_state"),
        dns.toDF("uuid", "state", "op_state"),
        conts.toDF("container_id", "state", "replication_factor"))
      .collect().map(r => r.getAs[Long]("container_id") ->
        ((r.getAs[Long]("queue_pos"),
          r.getAs[Int]("replication_factor").toLong,
          r.getAs[Long]("available"), r.getAs[Long]("out_of_service"),
          r.getAs[Long]("remaining_redundancy"),
          r.getAs[Boolean]("due_to_out_of_service"),
          r.getAs[Long]("weighted_redundancy")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, want) =>
      assert(got(id) === want, s"container $id")
    }
    // random space reaches both weight classes
    assert(expected.values.exists(_._6), "due_to_out_of_service reached")
    assert(expected.values.exists(!_._6), "redundancy-loss class reached")
  }

  test("misReplicationPlan == a literal rack-scatter walk over random" +
    " cluster states") {
    // MisReplicationHandler:106-160 + replicasToCopyToFixMisreplication:
    // pending skip, stability gate, rack-count satisfaction, per-rack
    // shed of (size-1) copies from source-eligible replicas in name
    // order, shortfall surfaced when a rack lacks copyable replicas.
    val rnd = new Random(4601)
    val nodeStates = Seq("HEALTHY", "HEALTHY", "HEALTHY", "STALE")
    val opStates = Seq("IN_SERVICE", "IN_SERVICE", "IN_SERVICE",
      "DECOMMISSIONING")
    val dns = (0 until 9).map(i => (s"dn$i",
      nodeStates(rnd.nextInt(nodeStates.length)),
      opStates(rnd.nextInt(opStates.length))))
    val dnMap = dns.map(d => d._1 -> d).toMap
    val repStates = Seq("CLOSED", "QUASI_CLOSED", "OPEN", "UNHEALTHY")
    // ids stride 23 so %46 pending ids occur; a few DELETED containers
    val conts = (1L to 250L).map(i => (i * 23,
      if (rnd.nextInt(20) == 0) "DELETED" else "CLOSED",
      3))
    val reps = conts.flatMap { case (id, _, _) =>
      rnd.shuffle(dns.map(_._1)).take(rnd.nextInt(5)).map(dn =>
        (id, dn, "r" + rnd.nextInt(3),
          repStates(rnd.nextInt(repStates.length))))
    }
    // ---- literal walk ----
    val expected = conts.filter(_._2 != "DELETED").flatMap {
      case (id, _, rf) =>
        val rs = reps.filter(_._1 == id)
        if (rs.isEmpty) Seq.empty
        else {
          val byRack = rs.groupBy(_._3)
          val nRacks = byRack.size
          val nTotal = rs.size
          val required = math.min(5, nTotal)
          def srcOk(r: (Long, String, String, String)) =
            (r._4 == "CLOSED" || r._4 == "QUASI_CLOSED") &&
              dnMap(r._2)._2 == "HEALTHY" && dnMap(r._2)._3 == "IN_SERVICE"
          val shortfall = byRack.values.map { g =>
            val shed = math.max(g.size - 1, 0)
            shed - math.min(shed, g.count(srcOk))
          }.sum.toLong
          rs.map { r =>
            val verdict =
              if (id % 46 == 0) "SKIP_PENDING"
              else if (nTotal != rf) "SKIP_NOT_STABLE"
              else if (nRacks >= required) "NOT_MISREPLICATED"
              else {
                val rack = byRack(r._3).sortBy(_._2)
                val srcRank = rack.filter(_._2 <= r._2).count(srcOk)
                if (srcOk(r) && srcRank <= rack.size - 1) "COPY"
                else "STAY"
              }
            val sf = if (verdict == "COPY" || verdict == "STAY")
              shortfall else 0L
            (id, r._2) -> ((r._3, verdict, sf))
          }
        }
    }.toMap
    // ---- engine ----
    val got = graft.operators.ClusterHealth.misReplicationPlan(
        reps.toDF("container_id", "datanode", "rack", "replica_state"),
        dns.toDF("uuid", "state", "op_state"),
        conts.toDF("container_id", "state", "replication_factor"))
      .collect().map(r => (r.getAs[Long]("container_id"),
        r.getAs[String]("datanode")) ->
        ((r.getAs[String]("rack"), r.getAs[String]("verdict"),
          r.getAs[Long]("shortfall")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"replica $k")
    }
    val verdicts = expected.values.map(_._2).toSet
    assert(verdicts ===
      Set("SKIP_PENDING", "SKIP_NOT_STABLE", "NOT_MISREPLICATED",
        "COPY", "STAY"))
  }

  test("keyPurgeDecisions == a literal OMKeyPurgeRequest walk over" +
    " random chains and request batches") {
    // OMKeyPurgeRequest.validateAndUpdateCache:79-166 + updateBucketSize
    // :186-213: snapshot probe, expected-previous chain fence (path
    // predecessor, or latest GLOBAL for AOS purges), empty-list error,
    // refunds gated on live-bucket id match.
    val rnd = new Random(7777)
    val vols = Seq("vol0", "vol1", "vol2")
    val bcks = Seq("bucket0", "bucket3", "bucket5")
    // globally-unique snapshot names scattered over (volume, bucket)
    val chain = (1L to 12L).map(i =>
      (i, s"s$i", vols(rnd.nextInt(3)), bcks(rnd.nextInt(3))))
    val names = chain.map(_._2)
    val liveBuckets = for (v <- vols; b <- bcks
                           if rnd.nextInt(4) != 0) yield (v, b)
    def mint(v: String, b: String): Long =
      v.substring(3).toLong * 100 + b.substring(6).toLong + 10
    val reqs = (1L to 200L).map { id =>
      val from = rnd.nextInt(4) match {
        case 0 => ""
        case 1 => "ghost" + rnd.nextInt(3)
        case _ => names(rnd.nextInt(names.length))
      }
      val hasExp = rnd.nextBoolean()
      val exp = if (rnd.nextBoolean()) ""
        else names(rnd.nextInt(names.length))
      (id, from, hasExp, exp, rnd.nextInt(3).toLong, rnd.nextInt(2).toLong)
    }
    val sizes = reqs.flatMap { case (id, _, _, _, _, _) =>
      (0 until rnd.nextInt(3)).map { _ =>
        val v = vols(rnd.nextInt(3)); val b = bcks(rnd.nextInt(3))
        val bid = if (rnd.nextBoolean()) mint(v, b) else 999L
        (id, v, b, bid, rnd.nextInt(1000).toLong + 1L,
          rnd.nextInt(3).toLong)
      }
    }
    // ---- literal walk ----
    val prevOf = chain.groupBy(c => (c._3, c._4)).flatMap { case (_, cs) =>
      val sorted = cs.sortBy(_._1)
      sorted.zipWithIndex.map { case (c, i) =>
        c._2 -> (if (i == 0) "" else sorted(i - 1)._2)
      }
    }
    val latestGlobal = chain.maxBy(_._1)._2
    val live = liveBuckets.toSet
    val expected = reqs.map { case (id, from, hasExp, exp, nd, nr) =>
      val decision =
        if (from.nonEmpty && !prevOf.contains(from)) "FILE_NOT_FOUND"
        else {
          val actualPrev = if (from == "") latestGlobal else prevOf(from)
          if (hasExp && exp != actualPrev) "INVALID_REQUEST"
          else if (nd + nr == 0) "KEY_DELETION_ERROR"
          else "PURGED"
        }
      val applied = sizes.filter(s => s._1 == id &&
        live((s._2, s._3)) && s._4 == mint(s._2, s._3))
      val (bu, by) =
        if (decision == "PURGED")
          (applied.map(s => (s._2, s._3)).distinct.size.toLong,
            applied.map(_._5).sum)
        else (0L, 0L)
      id -> ((from, decision,
        if (decision == "PURGED") nd else 0L,
        if (decision == "PURGED") nr else 0L, bu, by))
    }.toMap
    // ---- engine ----
    val got = graft.operators.CommitLog.keyPurgeDecisions(
        reqs.toDF("req_id", "from_snapshot", "has_expected",
          "expected_prev", "n_deleted", "n_renamed"),
        sizes.toDF("req_id", "volume", "bucket", "bucket_id",
          "purged_bytes", "purged_namespace"),
        chain.toDF("global_idx", "name", "volume", "bucket"),
        liveBuckets.toDF("volume", "bucket"))
      .collect().map(r => r.getAs[Long]("req_id") ->
        ((r.getAs[String]("from_snapshot"), r.getAs[String]("decision"),
          r.getAs[Long]("purged_keys"), r.getAs[Long]("purged_renames"),
          r.getAs[Long]("buckets_updated"),
          r.getAs[Long]("bytes_refunded")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, want) =>
      assert(got(id) === want, s"req $id")
    }
    val ds = expected.values.map(_._2).toSet
    assert(ds === Set("FILE_NOT_FOUND", "INVALID_REQUEST",
      "KEY_DELETION_ERROR", "PURGED"))
  }

  test("quasiClosedStuckCount == a literal per-origin walk over random" +
    " stuck-cluster states") {
    // End-to-end dual of the q_qcs_replicas query: the %119 stuck-set
    // filter, the synthetic seq/origin minting of qcsBase, and the
    // QuasiClosedStuckReplicaCount:142-220 per-origin targets/deltas.
    val rnd = new Random(11911)
    val opStates = Seq("IN_SERVICE", "IN_SERVICE", "IN_MAINTENANCE",
      "ENTERING_MAINTENANCE", "DECOMMISSIONING")
    val dns = (0 until 8).map(i => (s"dn$i", "HEALTHY",
      opStates(rnd.nextInt(opStates.length))))
    val dnOp = dns.map(d => d._1 -> d._3).toMap
    // mix of stuck (%119) and non-stuck ids; one stuck DELETED
    val conts = ((1L to 220L).map(_ * 119) ++ Seq(7L, 500L, 1001L))
      .map(id => (id,
        if (id == 119L * 3) "DELETED" else "QUASI_CLOSED", 3))
    val reps = conts.flatMap { case (id, _, _) =>
      rnd.shuffle(dns.map(_._1)).take(rnd.nextInt(4) + 1).map(dn =>
        (id, dn,
          if (rnd.nextInt(4) == 0) "UNHEALTHY" else "QUASI_CLOSED"))
    }
    // ---- literal walk (stuck, non-deleted ids only) ----
    case class Row(dn: String, healthy: Boolean, inSvc: Boolean,
                   maint: Boolean, seq: Long, origin: String)
    val expected = conts
      .filter(c => c._1 % 119 == 0 && c._2 != "DELETED")
      .flatMap { case (id, _, _) =>
        val rs0 = reps.filter(_._1 == id)
        if (rs0.isEmpty) Seq.empty
        else {
          val minDn = rs0.map(_._2).min
          val maxDn = rs0.map(_._2).max
          val rows = rs0.map { case (_, dn, st) =>
            val origin =
              if (id % 3 == 0) minDn
              else if (dn == maxDn) minDn
              else dn
            Row(dn, st != "UNHEALTHY", dnOp(dn) == "IN_SERVICE",
              dnOp(dn) == "IN_MAINTENANCE" ||
                dnOp(dn) == "ENTERING_MAINTENANCE",
              id * 100 + dn.substring(2).toLong, origin)
          }
          val maxHealthy = rows.filter(_.healthy).map(_.seq)
            .reduceOption(_ max _)
          val byOrigin = rows.groupBy(_.origin)
          byOrigin.toSeq.map { case (o, g) =>
            val isBest = maxHealthy.exists(mx =>
              g.exists(r => r.healthy && r.seq == mx))
            val target = if (byOrigin.size == 1) 3
              else if (isBest) 2 else 1
            val inSvc = g.count(_.inSvc).toLong
            val nMaint = g.count(_.maint).toLong
            val under =
              if (byOrigin.size == 1) {
                if (nMaint > 0) math.max(2 - inSvc, 0L)
                else math.max(3 - inSvc, 0L)
              } else if (inSvc < target) {
                if (nMaint > 0) { if (inSvc == 0) 1L else 0L }
                else target - inSvc
              } else 0L
            val over = math.max(inSvc - target, 0L)
            val status = if (under > 0) "UNDER_REPLICATED"
              else if (over > 0) "OVER_REPLICATED" else "OK"
            (id, o) -> ((g.size.toLong, inSvc, nMaint, isBest,
              target, status, under, over))
          }
        }
      }.toMap
    // ---- engine ----
    val got = graft.operators.ClusterHealth.quasiClosedStuckCount(
        reps.toDF("container_id", "datanode", "replica_state"),
        dns.toDF("uuid", "state", "op_state"),
        conts.toDF("container_id", "state", "replication_factor"))
      .collect().map(r => (r.getAs[Long]("container_id"),
        r.getAs[String]("origin")) ->
        ((r.getAs[Long]("n_replicas"), r.getAs[Long]("n_in_service"),
          r.getAs[Long]("n_maintenance"), r.getAs[Boolean]("is_best"),
          r.getAs[Int]("target"), r.getAs[String]("status"),
          r.getAs[Long]("under_delta"), r.getAs[Long]("over_delta"))))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"(container, origin) $k")
    }
    val statuses = expected.values.map(_._6).toSet
    assert(statuses === Set("UNDER_REPLICATED", "OVER_REPLICATED", "OK"))
  }

  test("blockAckDecide == a literal ACK-quorum walk over random" +
    " txn/replica states") {
    // DeletedBlockLog ACK fold: per (txn, container) the replica set's
    // ack/success classes (the %3 ack fixture rules), the %7 stale-dn
    // commit top-up, then the quorum ladder: enough commits and no
    // missing ⇒ PURGED; enough commits but missing replicas ⇒
    // WAITING_ALL_REPLICAS; else PENDING.
    val rnd = new Random(31337)
    val conts = (1L to 40L).map(id =>
      id -> rnd.shuffle((0 until 8).map(i => s"dn$i"))
        .take(rnd.nextInt(5) + 1).sorted)
    val txns = (1L to 300L).map(t =>
      (t, conts(rnd.nextInt(conts.size).toInt.max(0))._1))
      .map { case (t, c) => (t, conts((t % conts.size).toInt)._1) }
      .distinct
    val expected = txns.map { case (t, c) =>
      val dns = conts.find(_._1 == c).get._2
      val maxDn = dns.max; val minDn = dns.min
      val classes = dns.map { dn =>
        val acked = !(t % 3 == 1 && dn == maxDn)
        val success = acked && !(t % 3 == 2 && dn == minDn)
        success
      }
      val nAcks = classes.count(identity).toLong
      val nMissing = classes.size - nAcks
      val nCommitted = nAcks + (if (t % 7 == 0) 1L else 0L)
      val status =
        if (math.min(dns.size.toLong, nCommitted) >= 3L) {
          if (nMissing == 0) "PURGED" else "WAITING_ALL_REPLICAS"
        } else "PENDING"
      (t, c) -> ((dns.size.toLong, nCommitted, nMissing.toLong, status))
    }.toMap
    val got = graft.operators.ClusterHealth.blockAckDecide(
        txns.toDF("txn_id", "container_id"),
        conts.flatMap { case (c, dns) => dns.map(dn => (c, dn)) }
          .toDF("container_id", "datanode"),
        requiredNodes = 3)
      .collect().map(r => (r.getAs[Long]("txn_id"),
        r.getAs[Long]("container_id")) ->
        ((r.getAs[Long]("n_replicas"), r.getAs[Long]("n_committed"),
          r.getAs[Long]("n_missing"), r.getAs[String]("status")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"txn $k")
    }
    val statuses = expected.values.map(_._4).toSet
    assert(statuses === Set("PURGED", "WAITING_ALL_REPLICAS", "PENDING"))
  }

  test("hardNegatives == an exact brute-force walk over the real" +
    " embedding corpus") {
    // Independent of the DuckDB oracle: integer-exact cosines recomputed
    // in plain Scala (BigInt isqrt, floor division), top-3 different-
    // label neighbors per query with the (cos desc, id) tie-break and
    // the best-positive margin.
    val sf = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv")
      .collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)),
        r.getSeq[Long](2).toArray))
    def isqrt(x: BigInt): BigInt = {
      if (x == 0) return BigInt(0)
      var s = BigInt(math.sqrt(x.toDouble).toLong)
      while (s * s > x) s -= 1
      while ((s + 1) * (s + 1) <= x) s += 1
      s
    }
    def cos(a: Array[Long], b: Array[Long]): Long = {
      val dot = BigInt(a.zip(b).map { case (x, y) => x * y }.sum)
      val na = a.map(v => v * v).sum; val nb = b.map(v => v * v).sum
      val s = isqrt(BigInt(na) * BigInt(nb))
      val num = dot * 1000000
      // floor division (BigInt / truncates toward zero)
      val q = num / s
      (if (num.sign < 0 && q * s != num) q - 1 else q).toLong
    }
    val expected = emb.filter(_._1 < 20).flatMap { case (qid, qlab, qv) =>
      val scored = emb.filter(_._1 != qid)
        .map { case (nid, nlab, nv) => (nid, nlab, cos(nv, qv)) }
      val bestPos = scored.filter(_._2 == qlab).map(_._3)
        .reduceOption(_ max _).getOrElse(0L)
      scored.filter(_._2 != qlab)
        .sortBy { case (nid, _, c) => (-c, nid) }.take(3).zipWithIndex
        .map { case ((nid, _, c), i) =>
          (qid, nid) -> ((i + 1L, c, bestPos - c))
        }
    }.toMap
    val got = graft.operators.Similarity.hardNegatives(
        graft.core.Tables.embeddings(spark, sf))
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id")) ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("cos_x1e6"),
          r.getAs[Long]("margin_x1e6")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, want) =>
      assert(got(k) === want, s"pair $k")
    }
  }
}
