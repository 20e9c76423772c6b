package graft

import graft.tables.Tables

/** Batch specs for the A/B readout, stats freshness and char-trigram LID. */
class PipelineReportsSpec extends SparkSpec {

  test("ab test: variants partition the user base; rates are proper fractions") {
    val ev = Tables.events(spark, sf0001)
    val r = graft.events.Events.abTest(ev).collect()(0)
    val nUsers = ev.select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == nUsers)
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
    assert(r.getAs[Double]("rate_a") >= 0.0 && r.getAs[Double]("rate_a") <= 1.0)
  }

  test("stats freshness: staleness bounded and flag consistent with threshold") {
    val rows = graft.lake.Manifest.statsFreshness(Tables.orders(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pct = r.getAs[Double]("stale_pct")
      assert(pct >= 0.0 && pct <= 100.0)
      assert(r.getAs[Long]("rows_since_stats") <= r.getAs[Long]("rows_total"))
    }
  }

  test("new-vs-returning conserves users; commit cadence gaps are non-negative") {
    val ev = Tables.events(spark, sf0001)
    val rows = graft.events.Events.newVsReturning(ev).collect()
    assert(rows.map(_.getAs[Long]("new_users")).sum == ev.select("user_id").distinct().count(),
      "every user is new exactly once")
    rows.foreach(r => assert(
      r.getAs[Long]("new_users") + r.getAs[Long]("returning_users") == r.getAs[Long]("active_users")))
    val cad = graft.lake.Snapshots.commitCadence(Tables.orders(spark, sf0001)).collect()
    assert(cad.nonEmpty)
    cad.foreach { r =>
      assert(r.getAs[Double]("median_abs_gap") <= r.getAs[Double]("p95_abs_gap"))
    }
  }

  test("char-trigram language id classifies every doc exactly once") {
    val docs = Tables.documents(spark, sf0001)
    val conf = graft.text.TextAnalysis.charTrigramLangId(docs).collect()
    assert(conf.map(_.getAs[Long]("n")).sum == docs.count(),
      "confusion matrix must account for every document")
  }
}
