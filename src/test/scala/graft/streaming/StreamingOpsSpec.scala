package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Top-level so Spark can derive its encoder (inner classes capture the
  * spec's scope and fail encoder resolution).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** True Structured Streaming semantics (SURVEY §2.10): the streaming forms
  * of the batch analogs run under MemoryStream and agree with batch
  * results; watermark dedup drops late duplicates.
  */
class StreamingOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val sample = Seq(
    Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 10:15:00"), 1, "click", 2.0),
    Ev(3, ts("2024-01-01 11:05:00"), 1, "view", 3.0),
    Ev(4, ts("2024-01-01 10:20:00"), 2, "click", 4.0),
    Ev(5, ts("2024-01-01 12:00:00"), 2, "view", 5.0),
  )

  "tumblingHourly (stream)" should "match the batch aggregation" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample: _*)
    val q = StreamingOps.tumblingHourly(mem.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val got = s.table("tumb")
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("w"), col("event_type"), col("n_events"))
      .orderBy("w", "event_type").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = sample.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("w"), col("event_type"), col("n_events"))
      .orderBy("w", "event_type").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    got shouldBe want
    got.length should be > 0
  }

  "sessionPerUser (stream)" should "merge events within the 30-minute gap" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample: _*)
    val q = StreamingOps.sessionPerUser(mem.toDF())
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val got = s.table("sess")
      .select(col("user_id"), col("n_events"))
      .orderBy("user_id", "n_events").collect().map(r => (r.getLong(0), r.getLong(1)))
    // user 1: events at 10:05+10:15 merge (gap 10m), 11:05 separate;
    // user 2: 10:20 and 12:00 are separate sessions
    got shouldBe Array((1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L))
  }

  "runningUserTotals (mapGroupsWithState)" should "accumulate state across micro-batches" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = StreamingOps.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("totals").outputMode("update").start()
    mem.addData(UserEvent(1, 10.0), UserEvent(1, 5.0), UserEvent(2, 1.0))
    q.processAllAvailable()
    mem.addData(UserEvent(1, 2.5)) // second micro-batch: state must carry over
    q.processAllAvailable(); q.stop()
    val last = s.table("totals").groupBy("user_id")
      .agg(max("n_events").as("n"), max("sum_value").as("sum"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    last shouldBe Array((1L, 3L, 17.5), (2L, 1L, 1.0))
  }

  "purchasesWithRecentClicks (stream-stream join)" should "pair within the interval only" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = StreamingOps.purchasesWithRecentClicks(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    clicks.addData(
      Ev(10, ts("2024-01-01 09:30:00"), 1, "click", 0.0), // in window
      Ev(11, ts("2024-01-01 08:00:00"), 1, "click", 0.0), // too old
      Ev(12, ts("2024-01-01 09:45:00"), 2, "click", 0.0)) // other user
    purchases.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, "purchase", 50.0))
    q.processAllAvailable(); q.stop()
    val got = s.table("ssj").select("p_user", "c_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    got shouldBe Array((1L, ts("2024-01-01 09:30:00")))
  }

  "foreachBatch + deleteRangeAppend" should "stream into an idempotent partitioned table" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val path = tmpDir("stream-sink")
    val mem = MemoryStream[Ev]
    val q = mem.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val norm = graft.transform.Normalize.normalize(batch.toDF())
        graft.io.Sinks.deleteRangeAppend(norm, "ts_ts", path)
      }
      .start()
    val day1 = Seq(Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 11:00:00"), 1, "view", 2.0))
    val day2 = Seq(Ev(3, ts("2024-01-02 09:00:00"), 2, "click", 3.0))
    mem.addData(day1: _*); q.processAllAvailable()
    mem.addData(day2: _*); q.processAllAvailable()
    spark.read.parquet(path).count() shouldBe 3
    // replay day2 in full (late re-delivery): partition overwritten, no dupes
    mem.addData(day2: _*); q.processAllAvailable(); q.stop()
    spark.read.parquet(path).count() shouldBe 3
  }

  "foreachBatch + deleteRangeAppend" should "keep the sink idempotent across replayed batches" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val path = tmpDir("stream-sink") + "/events"
    // day 1 in batch 1; batch 2 REPLAYS day 1 (same rows, the at-least-once
    // delivery case) and adds day 2 — dynamic partition overwrite must
    // leave exactly one copy of each day
    val day1 = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 11:00:00"), 1, "view", 2.0))
    val day2 = Seq(Ev(3, ts("2024-01-02 09:00:00"), 2, "click", 3.0))
    val mem = MemoryStream[Ev]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.io.Sinks.loadIfNonEmpty(batch,
          b => graft.io.Sinks.deleteRangeAppend(b, "ts", path)): Unit
      }
      .start()
    mem.addData(day1: _*); q.processAllAvailable()
    mem.addData(day1 ++ day2: _*); q.processAllAvailable()
    q.stop()
    val out = s.read.parquet(path)
    out.count() shouldBe 3
    out.select("event_id").orderBy("event_id").collect().map(_.getLong(0)) shouldBe Array(1L, 2L, 3L)
  }

  "dedupWithinWatermark" should "drop duplicate event_ids inside the horizon" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample :+ Ev(1, ts("2024-01-01 10:06:00"), 1, "click", 1.0): _*)
    val q = StreamingOps.dedupWithinWatermark(mem.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    s.table("dedup").count() shouldBe sample.length.toLong
  }

  "highWaterPerUser (transformWithState)" should "emit only on per-user improvements across batches" in {
    // transformWithState needs the RocksDB state store; isolate the
    // provider conf in a child session (shared context, own SQLConf)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = StreamingOps.highWaterPerUser(mem.toDS())
      .writeStream.format("memory").queryName("hiwater").outputMode("update").start()
    mem.addData(UserEvent(1, 5.0), UserEvent(1, 3.0), UserEvent(2, 1.0))
    q.processAllAvailable()
    mem.addData(UserEvent(1, 4.0)) // below user 1's high water: no emit
    q.processAllAvailable()
    mem.addData(UserEvent(1, 7.0), UserEvent(2, 0.5)) // only user 1 improves
    q.processAllAvailable(); q.stop()
    val got = s2.table("hiwater").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    got shouldBe Seq((1L, 5.0), (1L, 7.0), (2L, 1.0))
  }

  /** Child session with the RocksDB state store `transformWithState`
    * requires, plus the fixture events as an in-order TypedEvent array
    * ready to split across micro-batches.
    */
  private def rocksSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2
  }

  private def fixtureEvents(s2: org.apache.spark.sql.SparkSession): Array[TypedEvent] = {
    import s2.implicits._
    graft.io.Sources.events(s2, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[TypedEvent].collect()
      .sortBy(e => (e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000, e.event_id))
  }

  "funnelStages (transformWithState)" should "reproduce the batch funnel stage counts" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val evs = fixtureEvents(s2)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[TypedEvent]
    val q = StreamingOps.funnelStages(mem.toDS())
      .writeStream.format("memory").queryName("funnel_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    val got = s2.table("funnel_s").groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = graft.ops.Analytics.funnel(s2, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    got shouldBe want
  }

  "transitionPairs (transformWithState)" should "reproduce the batch transition counts" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val evs = fixtureEvents(s2)
    val (b1, b2) = evs.splitAt(evs.length / 3)
    val mem = MemoryStream[TypedEvent]
    val q = StreamingOps.transitionPairs(mem.toDS())
      .writeStream.format("memory").queryName("trans_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    val got = s2.table("trans_s").groupBy("prev", "nxt").agg(count(lit(1)).as("n"))
      .orderBy("prev", "nxt").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val want = graft.ops.Temporal.transitionMatrix(s2, sfDir)
      .select("prev", "nxt", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    got shouldBe want
  }

  "nearDupHits (transformWithState)" should "emit exactly the batch verified near-dup pairs" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val docs = graft.io.Sources.documents(s2, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // boundary split: pairs whose members arrive in different batches
    // must still match through the bucket state
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.nearDupHits(mem.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    // a pair sharing k bands emits k times (identically) — distinct, as
    // the batch candidate generator's distinct() does
    val got = s2.table("neardup_s").distinct()
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = graft.SparkEntry.queries("dedup_minhash_lsh")(s2, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got shouldBe want
    got should not be empty
  }

  "incGroupAssignments (transformWithState)" should "replay batch incremental group maintenance across micro-batches" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    // yesterday's static groups table + the delta pair set, exactly as
    // the batch query defines them (delta = every tenth doc)
    def isDelta(id: Long): Boolean = id % 10 == 0
    val baseGroups = graft.ops.TextOps.textDedupBaseGroupsRaw(s2, sfDir)
    val deltaPairs = graft.ops.TextOps.ngramJaccardPairsRaw(s2, sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => isDelta(p._1) || isDelta(p._2)).sorted
    deltaPairs should not be empty
    // 3-way replay split: merges that BRIDGE batches (an edge whose
    // root was relabeled by an earlier batch) must resolve through the
    // forest state
    val batches = deltaPairs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(_._1).toSeq)
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingOps.incGroupAssignments(
        mem.toDS().toDF("id_a", "id_b"), baseGroups)
      .writeStream.format("memory").queryName("incgroups_s")
      .outputMode("update").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // labels only decrease, so min-per-node over all emissions = final
    val merged = s2.table("incgroups_s").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (n, gs) => n -> gs.map(_._2).min }
    // assemble the full output with incrementalMerge's rules and
    // compare to the batch query row-for-row
    val deltaDocs = graft.io.Sources.documents(s2, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).filter(isDelta)
    val baseRows = baseGroups.collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = (deltaDocs.map(id =>
        (id, merged.getOrElse(id, id), true, false)) ++
      baseRows.map { case (id, g) =>
        val ng = merged.getOrElse(g, g)
        (id, ng, false, ng != g)
      }).sortBy(_._1).toSeq
    val want = graft.SparkEntry.queries("text_dedup_incremental")(s2, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toSeq
    got shouldBe want
    // the replay must have actually merged something cross-batch
    merged.values.toSet.size should be < merged.size
  }

  "postingIndex (transformWithState)" should "maintain the exact from-scratch index and serve batch query results" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val docs = graft.io.Sources.documents(s2, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // boundary split: posting lists and (df, cf) counters must carry
    // across the micro-batch boundary
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.postingIndex(mem.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("idx_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    val upds = s2.table("idx_s")

    // 1. the union of appends IS the from-scratch positional index
    val gotIdx = upds
      .select(col("term"), col("doc_id"), col("tf"), col("positions"))
      .orderBy("term", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getSeq[Long](3))).toSeq
    val wantIdx = graft.io.Sources.documents(s2, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .groupBy("w", "doc_id")
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos").cast("long"))).as("positions"))
      .orderBy("w", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getSeq[Long](3))).toSeq
    gotIdx shouldBe wantIdx
    gotIdx should not be empty

    // 2. the LAST update per term carries the batch (df, cf)
    val gotStats = upds.groupBy("term")
      .agg(max(struct(col("df"), col("cf"))).as("m"))
      .select(col("term"), col("m.df"), col("m.cf")).orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val wantStats = wantIdx.groupBy(_._1).view
      .mapValues(ps => (ps.size.toLong, ps.map(_._3).sum)).toSeq
      .map { case (t, (df, cf)) => (t, df, cf) }.sortBy(_._1)
    gotStats shouldBe wantStats

    // 3. boolean-AND served from the maintained index == batch query
    // (fresh DataFrame per reference: self-joining the memory-sink view
    // trips a conflicting-attribute INTERNAL_ERROR in Spark 4.1)
    def idx = gotIdx.toDF("term", "doc_id", "tf", "positions")
    def tfOf(t: String) = idx.filter(col("term") === t)
      .select(col("doc_id"), col("tf").as(s"tf_$t"))
    val gotBool = tfOf("spark").join(tfOf("dup"), "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val wantBool = graft.ops.TextSignals.booleanAnd(s2, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    gotBool shouldBe wantBool

    // 4. positional phrase match served from the maintained index
    val a = idx.filter(col("term") === "window")
      .select(col("doc_id"), explode(col("positions")).as("pos"))
    val b = idx.filter(col("term") === "join")
      .select(col("doc_id"), explode(col("positions")).as("p0"))
      .select(col("doc_id"), (col("p0") - 1).as("pos"))
    val gotPhrase = a.join(b, Seq("doc_id", "pos"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"), min("pos").cast("long").as("first_pos"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val wantPhrase = graft.ops.TextSignals.phraseMatch(s2, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    gotPhrase shouldBe wantPhrase
    gotPhrase should not be empty
  }

  "qgridCells (streaming aggregate)" should "converge to the batch merged grid" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val b = graft.io.Sources.events(s2, sfDir)
      .agg(min("value").as("lo"), max("value").as("hi")).head()
    val (lo, hi) = (b.getAs[Double]("lo"), b.getAs[Double]("hi"))
    val vals = graft.io.Sources.events(s2, sfDir).select("value").as[Double].collect()
    val (v1, v2) = vals.splitAt(vals.length / 2)
    val mem = MemoryStream[Double]
    val q = StreamingOps.qgridCells(mem.toDS().toDF("value"), lo, hi)
      .writeStream.format("memory").queryName("qgrid_s").outputMode("update").start()
    mem.addData(v1.toSeq: _*); q.processAllAvailable()
    mem.addData(v2.toSeq: _*); q.processAllAvailable(); q.stop()
    val got = s2.table("qgrid_s").groupBy("bucket")
      .agg(max("cnt").as("cnt")).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = graft.ops.Sketches.quantileGridDaily(s2, sfDir)
      .groupBy("bucket").agg(sum("cnt").as("cnt")).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe want
  }

  "cmsCellCounts (streaming aggregate)" should "converge to the batch sketch" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val users = graft.io.Sources.events(s2, sfDir)
      .select("user_id").as[Long].collect()
    val (b1, b2) = users.splitAt(users.length / 2)
    val mem = MemoryStream[Long]
    val q = StreamingOps.cmsCellCounts(mem.toDS().toDF("user_id"))
      .writeStream.format("memory").queryName("cms_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    // update mode re-emits a cell on every change: the LATEST count per
    // cell is the max (counts are monotone)
    val got = s2.table("cms_s").groupBy("j", "bucket")
      .agg(max("cnt").as("cnt")).orderBy("j", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = graft.ops.Sketches.cmsTable(s2, sfDir)
      .orderBy("j", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
  }

  "psiBuckets (streaming aggregate)" should "match the batch current-window bucket counts" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    // frozen edges from the batch baseline period (the model artifact)
    val edges = graft.io.Sources.events(s2, sfDir)
      .filter(col("ts") < lit("2024-01-16").cast("timestamp"))
      .agg(expr("percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"))
      .head().getSeq[Double](0)
    val cur = graft.io.Sources.events(s2, sfDir)
      .filter(col("ts") >= lit("2024-01-16").cast("timestamp"))
      .select("value").as[Double].collect()
    val (b1, b2) = cur.splitAt(cur.length / 2)
    val mem = MemoryStream[Double]
    val q = StreamingOps.psiBuckets(mem.toDS().toDF("value"), edges)
      .writeStream.format("memory").queryName("psi_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    val got = s2.table("psi_s").groupBy("bucket")
      .agg(max("cnt").as("cnt")).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the batch op's current-window counts (cb) per non-empty bucket
    val want = graft.ops.Audit.psiDrift(s2, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).filter(_._2 > 0).toSeq
    got shouldBe want
  }

  "patternCounts (transformWithState)" should "reproduce the batch conversion counts" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val evs = fixtureEvents(s2)
    // uneven split so some c+p runs straddle the micro-batch boundary —
    // the state machine must carry an open run across batches
    val (b1, b2) = evs.splitAt(evs.length / 3)
    val mem = MemoryStream[TypedEvent]
    val q = StreamingOps.patternCounts(mem.toDS())
      .writeStream.format("memory").queryName("pattern_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    // update mode emits one totals row per (user, batch): keep the LAST
    // per user (max n_events is the latest, counters are monotone)
    val got = s2.table("pattern_s")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_conversions"))).as("m"))
      .select(col("user_id"), col("m.n_events"), col("m.n_conversions"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = graft.ops.StreamingAnalogs.patternConversions(s2, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
  }

  "attributionPerPurchase (transformWithState)" should "reproduce the batch channel totals exactly" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val evs = fixtureEvents(s2)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[TypedEvent]
    val q = StreamingOps.attributionPerPurchase(mem.toDS())
      .writeStream.format("memory").queryName("attr_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    val rows = s2.table("attr_s").collect()
    rows should not be empty
    // per-purchase mass conservation
    rows.foreach { r =>
      r.getAs[Long]("cents") shouldBe
        r.getAs[Long]("click_cents") + r.getAs[Long]("view_cents") +
        r.getAs[Long]("signup_cents") + r.getAs[Long]("residual_cents") +
        r.getAs[Long]("unattributed_cents")
    }
    // channel totals equal the batch operator's 5-row output EXACTLY
    // (integer cents; state carried across the micro-batch boundary)
    val got = Map(
      "click" -> rows.map(_.getAs[Long]("click_cents")).sum,
      "view" -> rows.map(_.getAs[Long]("view_cents")).sum,
      "signup" -> rows.map(_.getAs[Long]("signup_cents")).sum,
      "residual" -> rows.map(_.getAs[Long]("residual_cents")).sum,
      "unattributed" -> rows.map(_.getAs[Long]("unattributed_cents")).sum)
    val want = graft.ops.Analytics.attributionLinear(s2, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe want
  }

  "interArrivalPerUser (transformWithState)" should "emit the batch lag gaps exactly" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val evs = fixtureEvents(s2)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[TypedEvent]
    val q = StreamingOps.interArrivalPerUser(mem.toDS())
      .writeStream.format("memory").queryName("arr_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    val got = s2.table("arr_s").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Long]("gap_us")))
      .toSet
    // batch derivation: per-user (ts, event_id)-sorted consecutive diffs
    def micros(e: TypedEvent): Long = e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000
    val want = evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (micros(e), e.event_id))
      sorted.zipWithIndex.map { case (e, i) =>
        (u, e.event_id, if (i == 0) -1L else micros(e) - micros(sorted(i - 1)))
      }
    }.toSet
    got shouldBe want
  }

  "pageCusumPerUser (transformWithState)" should "match the batch summary bit-for-bit" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val evs = fixtureEvents(s2)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[TypedEvent]
    val q = StreamingOps.pageCusumPerUser(mem.toDS())
      .writeStream.format("memory").queryName("page_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    // Update sink keeps the latest row per key = the post-all-data state
    val got = s2.table("page_s").collect()
      .map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_alarms"), r.getAs[Long]("final_s"))))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2._1)._2).toMap
    val want = graft.ops.Temporal.pageCusum(s2, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    got shouldBe want
    // the thresholds bind on the fixture: some user fires an alarm
    want.values.map(_._2).sum should be > 0L
  }

  "ewmaPerUser (transformWithState)" should "be bit-equal to the batch fold" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val evs = fixtureEvents(s2)
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[TypedEvent]
    val q = StreamingOps.ewmaPerUser(mem.toDS())
      .writeStream.format("memory").queryName("ewma_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    // join on (user, event_id): every streamed ewma must equal the batch
    // fold EXACTLY — same IEEE op sequence, state carried across batches
    val batch = graft.ops.Temporal.ewma(s2, sfDir)
      .orderBy("user_id", "rn").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(3)).toSeq).toMap
    val streamed = s2.table("ewma_s").orderBy("user_id", "event_id")
    val got = streamed.collect().groupBy(_.getAs[Long]("user_id"))
    got.keySet shouldBe batch.keySet
    // per-user in-ts-order delivery: fixtureEvents is globally ts-sorted
    // and splitAt preserves it, so sequence k of the stream = batch rn k+1
    val streamedSeq = s2.table("ewma_s").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Double]("ewma")))
    val evOrder = evs.zipWithIndex.groupBy(_._1.user_id).view
      .mapValues(_.sortBy(_._2).map(_._1.event_id).toSeq).toMap
    streamedSeq.groupBy(_._1).foreach { case (u, rows) =>
      val byEvent = rows.map(r => r._2 -> r._3).toMap
      val ordered = evOrder(u).map(byEvent)
      ordered shouldBe batch(u) // exact double equality
    }
  }

  "dailyCounts → driftOverDaily" should "match the batch drift monitor on finalized days" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val evs = fixtureEvents(s2)
    // stage 1: watermarked daily aggregate; a far-future sentinel event
    // advances the watermark so every fixture day finalizes (the
    // sentinel's own day stays open and never emits)
    val sentinel = TypedEvent(-1L, ts("2030-01-01 00:00:00"), -1L, "view", 0.0)
    val memEv = MemoryStream[TypedEvent]
    val q1 = StreamingOps.dailyCounts(memEv.toDF())
      .writeStream.format("memory").queryName("daily_s").outputMode("append").start()
    memEv.addData(evs.toSeq: _*); q1.processAllAvailable()
    memEv.addData(sentinel); q1.processAllAvailable(); q1.stop()
    val finalized = s2.table("daily_s").filter(col("event_type") =!= "view" || col("day") =!= "2030-01-01")
      .as[DailyCount].collect().sortBy(d => (d.event_type, d.day))
    finalized.length should be > 0
    // stage 2: drift scoring over the finalized-day stream, in day order
    val memDaily = MemoryStream[DailyCount]
    val q2 = StreamingOps.driftOverDaily(memDaily.toDS())
      .writeStream.format("memory").queryName("drift_s").outputMode("update").start()
    memDaily.addData(finalized.toSeq: _*); q2.processAllAvailable(); q2.stop()
    val got = s2.table("drift_s")
      .select("event_type", "day", "n", "base_mean", "z", "anomaly")
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.getAs[java.lang.Double]("base_mean")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue), r.getBoolean(5))).toSeq
    val want = graft.ops.StreamingAnalogs.driftMonitor(s2, sfDir)
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.getAs[java.lang.Double]("base_mean")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue), r.getBoolean(5))).toSeq
    got shouldBe want
  }

  "enrichWithDim (stream-static join)" should "enrich each micro-batch against the dimension" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dimPath = tmpDir("dim") + "/customer"
    Seq((1L, "AUTO"), (2L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(dimPath)
    val dim = s.read.parquet(dimPath)
    val mem = MemoryStream[Ev]
    val q = StreamingOps.enrichWithDim(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enriched").outputMode("complete").start()
    mem.addData(sample: _*) // users 1 and 2 both present
    q.processAllAvailable()
    val got1 = s.table("enriched")
      .groupBy("c_mktsegment").agg(sum("n_events").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got1 shouldBe Map("AUTO" -> 3L, "BUILDING" -> 2L)
    // a later micro-batch joins the same pinned dimension snapshot
    mem.addData(Ev(6, ts("2024-01-01 13:00:00"), 2, "view", 6.0))
    q.processAllAvailable(); q.stop()
    val got2 = s.table("enriched")
      .groupBy("c_mktsegment").agg(sum("n_events").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got2 shouldBe Map("AUTO" -> 3L, "BUILDING" -> 3L)
  }

  "heavyHittersSketch (transformWithState)" should "equal the sequential sketch fold across a batch boundary" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val k = 8
    // per-language token streams from the fixture, in (doc_id, pos) order
    val toks = graft.io.Sources.documents(s2, sfDir)
      .select(col("lang"), col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .orderBy("lang", "doc_id", "pos").collect().zipWithIndex
      .map { case (r, i) => MGIn(r.getString(0), r.getString(3), i.toLong) }
    val (b1, b2) = toks.splitAt(toks.length / 2)
    val mem = MemoryStream[MGIn]
    val q = StreamingOps.heavyHittersSketch(mem.toDS(), k)
      .writeStream.format("memory").queryName("mg_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()

    // latest snapshot per group = rows at that group's max n_seen
    val snaps = s2.table("mg_s").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (g, rows) =>
        val last = rows.map(_._4).max
        g -> rows.filter(_._4 == last).map(t => (t._2, t._3)).sortBy(p => (-p._2, p._1)).toSeq
      }

    // driver-side sequential fold with the identical reduce step
    val mg = new graft.functions.MisraGriesAggregator(k)
    val want = toks.groupBy(_.grp).map { case (g, ts) =>
      val counters = ts.sortBy(_.seq).foldLeft(Map.empty[String, Long])((b, t) => mg.reduce(b, t.item))
      g -> mg.finish(counters).map(e => (e.item, e.est))
    }
    snaps shouldBe want

    // classic MG guarantee: true frequency > n/(k+1) ⇒ item reported
    toks.groupBy(_.grp).foreach { case (g, ts) =>
      val n = ts.length
      val exact = ts.groupBy(_.item).view.mapValues(_.length).toMap
      val reported = snaps(g).map(_._1).toSet
      exact.filter { case (_, c) => c > n / (k + 1) }.keys
        .foreach(w => reported should contain(w))
    }
  }

  "targetEncStats (transformWithState)" should "serve the exact batch LOO encodings from maintained state" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val facts = graft.io.Sources.orders(s2, sfDir)
      .join(graft.io.Sources.customer(s2, sfDir)
        .select("c_custkey", "c_mktsegment"), expr("o_custkey = c_custkey"))
      .select(col("o_orderkey").as("order_id"),
        col("c_mktsegment").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .as[EncIn].collect().sortBy(_.order_id)
    // boundary split: group sums must carry across the micro-batch edge
    val (b1, b2) = facts.splitAt(facts.length / 2)
    val mem = MemoryStream[EncIn]
    val q = StreamingOps.targetEncStats(mem.toDS())
      .writeStream.format("memory").queryName("tenc_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()

    // serving snapshot: the last update per group == the batch aggregate
    val stats = s2.table("tenc_s").groupBy("seg")
      .agg(max(struct(col("n_g"), col("s_g"))).as("m"))
      .select(col("seg"), col("m.n_g").as("n_g"), col("m.s_g").as("s_g"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wantStats = facts.groupBy(_.seg).view.mapValues(fs =>
      (fs.length.toLong, fs.map(_.cents).sum)).toMap
    stats shouldBe wantStats

    // LOO encodings computed FROM THE MAINTAINED STATE reproduce the
    // batch ml_target_encoding rows bit-for-bit
    val nAll = stats.values.map(_._1).sum
    val sAll = stats.values.map(_._2).sum
    val got = facts.map { f =>
      val (ng, sg) = stats(f.seg)
      val enc = BigDecimal(
        (sg.toDouble - f.cents + 20.0 * (sAll.toDouble / nAll)) / (ng - 1 + 20) / 100)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      (f.order_id, f.seg, enc)
    }.sortBy(_._1).toSeq
    val want = graft.SparkEntry.queries("ml_target_encoding")(s2, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    got shouldBe want
    got should not be empty
  }

  "cdcApplyPerUser (transformWithState)" should "reproduce the batch etl_cdc_apply table" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val evs = fixtureEvents(s2)
    // shuffle-resistant split: CDC apply must be ORDER-INSENSITIVE
    // (max-fold on the ordering key), so the batches deliberately
    // interleave event times instead of splitting chronologically
    val (b1, b2) = evs.partition(_.event_id % 2 == 0)
    val mem = MemoryStream[TypedEvent]
    val q = StreamingOps.cdcApplyPerUser(mem.toDS())
      .writeStream.format("memory").queryName("cdc_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable(); q.stop()
    // the state is monotone in the CDC order (us, event_id), which the
    // emission carries — the final state per user is the max-ordinal row
    val got = s2.table("cdc_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getDouble(5), r.getBoolean(6)))
      .groupBy(_._1).values.map(_.maxBy(t => (t._2, t._3))).toSeq
      .filter(!_._7)
      .map(t => (t._1, t._4, t._5, t._6)).sortBy(_._1)
    val want = graft.SparkEntry.queries("etl_cdc_apply")(s2, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).toSeq
    got shouldBe want
    got should not be empty
  }

  "sessionizePerUser (transformWithState)" should "reproduce the batch ts_sessionize table" in {
    val s2 = rocksSession
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val evs = fixtureEvents(s2)
    // a three-way split so open sessions cross TWO micro-batch
    // boundaries: the state (ordinal, start, count, cents) must carry
    // and the re-emitted open-session rows must supersede
    val (b1, rest) = evs.splitAt(evs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val mem = MemoryStream[TypedEvent]
    val q = StreamingOps.sessionizePerUser(mem.toDS())
      .writeStream.format("memory").queryName("sess_s").outputMode("update").start()
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable()
    mem.addData(b3.toSeq: _*); q.processAllAvailable(); q.stop()
    // last emission per (user, session_n) = the one with maximal
    // n_events (a session only re-emits when it absorbed events)
    val got = s2.table("sess_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(t => (t._1, t._2)).values.map(_.maxBy(_._3)).toSeq.sorted
    val want = graft.ops.Temporal.sessionize(s2, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted
    got shouldBe want
    got should not be empty
    // and sessions must actually straddle the splits for the test to
    // mean anything: some user must have rows in more than one batch
    val usersPerBatch = Seq(b1, b2, b3).map(_.map(_.user_id).toSet)
    usersPerBatch.sliding(2).exists(p => (p(0) & p(1)).nonEmpty) shouldBe true
  }
}
