package graft

import graft.stream.Windows
import graft.stream.Windows.{Session, SessionEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming event-time operators: watermarked window agg + stateful
  * gap sessionization, driven through MemoryStream micro-batches. */
class WindowsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .master("local[4]")
    .appName("graft-windows-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling window aggregation emits finalized windows") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val out = Windows.windowedCounts(df, watermarkDelay = "5 minutes", windowLen = "10 minutes")
    val q = out.writeStream.format("memory").queryName("win")
      .outputMode("append").start()
    try {
      in.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0), (ts(7), "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to finalize the 10:00-10:10 window
      in.addData((ts(30), "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("win").orderBy("win_start", "event_type").collect()
      assert(rows.length == 2) // (10:00 click n=2), (10:00 view n=1); 10:30 not finalized
      assert(rows(0).getString(1) == "click" && rows(0).getLong(2) == 2)
      assert(rows(1).getString(1) == "view" && rows(1).getLong(2) == 1)
    } finally q.stop()
  }

  test("late event farther than gap BEFORE the tracked session forms its own session") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val out = Windows.sessionize(in.toDS(), watermarkDelay = "40 minutes", gapMs = 10 * 60 * 1000L)
    val q = out.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      in.addData(SessionEvent(7, ts(30), 1))
      q.processAllAvailable()
      // 25 min BEFORE the tracked session (> gap): must NOT bridge the
      // silence into one session
      in.addData(SessionEvent(7, ts(5), 2))
      q.processAllAvailable()
      // push watermark far past everything: the open session times out
      in.addData(SessionEvent(8, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), 3))
      q.processAllAvailable()
      in.addData(SessionEvent(8, java.sql.Timestamp.valueOf("2024-01-01 15:00:00"), 4))
      q.processAllAvailable()
      val sessions = spark.table("sess_late").as[Session].collect()
        .filter(_.user_id == 7L).map(x => (x.session_start.toString, x.n_events)).toSet
      assert(sessions == Set((ts(5).toString, 1L), (ts(30).toString, 1L)))
    } finally q.stop()
  }

  test("sessionization runs on the RocksDB state store (the at-scale state backend)") {
    // HDFS-backed state is the default; RocksDB is what a 100 TB run
    // uses (state >> heap). Same query, same results, different backend.
    import spark.implicits._
    implicit val s: SparkSession = spark
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[SessionEvent]
      val out = Windows.sessionize(in.toDS(), watermarkDelay = "1 minutes", gapMs = 10 * 60 * 1000L)
      val q = out.writeStream.format("memory").queryName("sess_rocks")
        .outputMode("append").start()
      try {
        in.addData(SessionEvent(1, ts(1), 100), SessionEvent(1, ts(5), 101))
        q.processAllAvailable()
        in.addData(SessionEvent(9, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 999))
        q.processAllAvailable()
        val sessions = spark.table("sess_rocks").as[Session].collect()
          .map(x => (x.user_id, x.session_start.toString, x.n_events)).toSet
        assert(sessions.contains((1L, ts(1).toString, 2L)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("flatMapGroupsWithState sessionization closes sessions on event-time gaps") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val out = Windows.sessionize(in.toDS(), watermarkDelay = "1 minutes", gapMs = 10 * 60 * 1000L)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // user 1: events at 10:01, 10:05 (one session); user 2: 10:02
      in.addData(SessionEvent(1, ts(1), 100), SessionEvent(1, ts(5), 101),
        SessionEvent(2, ts(2), 200))
      q.processAllAvailable()
      // in-batch gap: user 1 again at 10:40 and 10:41 — the 10:01-10:05
      // session closes inside the state function
      in.addData(SessionEvent(1, ts(40), 102), SessionEvent(1, ts(41), 103))
      q.processAllAvailable()
      // push the watermark way past everything: timeouts fire for the rest
      in.addData(SessionEvent(9, ts(59), 999))
      q.processAllAvailable()
      in.addData(SessionEvent(9, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1000))
      q.processAllAvailable()

      val sessions = spark.table("sess").as[Session].collect()
        .map(s => (s.user_id, s.session_start.toString, s.n_events)).toSet
      assert(sessions.contains((1L, ts(1).toString, 2L)))  // closed in-batch by the gap
      assert(sessions.contains((2L, ts(2).toString, 1L)))  // closed by timeout
      assert(sessions.contains((1L, ts(40).toString, 2L))) // closed by timeout
    } finally q.stop()
  }
}
