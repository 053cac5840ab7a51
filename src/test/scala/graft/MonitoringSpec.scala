package graft

import org.apache.spark.sql.functions._
import graft.queries.{EventQueries, GraphQueries, TextQueries}

/** Driver-side integer replicas of the r11 monitoring/mining censuses
  * (KS drift, decayed popularity, basket rules): every expectation is
  * recomputed exactly from the collected sf tables, so the distributed
  * arithmetic — cross-multiplied KS, shift decay, ppm lift — is pinned
  * value-for-value, not just shape-checked.
  */
class MonitoringSpec extends SparkSpec {

  test("KS drift audit equals an exact integer replica per source") {
    val rows = TextQueries.queries("ingest_drift_audit")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = graft.queries.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).map { case (src, xs) =>
      val a = xs.filter(_._2 % 2 == 0).map(_._3)
      val b = xs.filter(_._2 % 2 == 1).map(_._3)
      val (na, nb) = (a.length.toLong, b.length.toLong)
      val support = (a ++ b).distinct.sorted
      val d = if (na * nb == 0) 0L else support.map { v =>
        math.abs(a.count(_ <= v) * nb - b.count(_ <= v) * na)
      }.max * 1000000L / (na * nb)
      src -> ((na, nb, d))
    }
    assert(rows == expect)
  }

  test("decayed popularity equals a shift-decay replica per event type") {
    val rows = EventQueries.queries("events_decayed_popularity")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = graft.queries.Tables.events(spark, sfDir)
      .select(col("event_type"), unix_millis(col("ts")).as("ms"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val maxMs = ev.map(_._2).max
    val expect = ev.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.length.toLong, xs.map(_._3).sum,
        xs.map { case (_, ms, c) =>
          val age = math.min((maxMs - ms) / 86400000L, 62L).toInt
          c >> age
        }.sum))
    }
    assert(rows == expect)
  }

  test("basket rules equal an exact ppm replica (support, confidence, lift)") {
    val rows = GraphQueries.queries("basket_association_rules")(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val op = graft.queries.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = byOrder.size.toLong
    val perPart = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val support = scala.collection.mutable.Map
      .empty[(Long, Long), Long].withDefaultValue(0L)
    byOrder.values.foreach { parts =>
      for (a <- parts; b <- parts if a != b) support((a, b)) += 1L
    }
    val expect = support.toSeq.filter(_._2 >= 2L).map { case ((a, b), w) =>
      (a, b, w, w * 1000000L / perPart(a),
        w * nOrders * 1000000L / (perPart(a) * perPart(b)))
    }.sortBy { case (a, b, _, _, l) => (-l, a, b) }.take(20)
    assert(rows.toSeq == expect)
  }
}
