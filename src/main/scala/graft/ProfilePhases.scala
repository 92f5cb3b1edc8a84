package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMP dev probe (r16): phase-level timing of the commit-tax ids.
  * Not part of any query path; deleted before round close if not useful.
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          stages.addAndGet(j.stageInfos.size)
          ()
        }
      })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobs.get(); val s0 = stages.get()
      val r = f
      Thread.sleep(30) // let listener events drain
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3fs" +
        f" jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
      r
    }
    // warm up session machinery so phase 1 isn't charged JVM startup
    s.read.parquet(s"$sfDir/orders.parquet").limit(1000).count()

    for (rep <- 1 to 2) {
      println(s"== dedup_embedding stages rep $rep ==")
      val cands = t("lshCandidates") {
        val c = graft.operators.VectorOps.lshCandidates(s, sfDir)
          .localCheckpoint(true)
        println(s"  candidates=${c.count()}")
        c
      }
      t("verify (scaledPairs)") {
        val e = Tables.embeddings(s, sfDir)
          .select(col("vec_id"), col("embedding"))
        import graft.functions.VectorExprs.dotF
        val n = cands
          .join(e.select(col("vec_id").as("id1"), col("embedding").as("e1")),
            "id1")
          .join(e.select(col("vec_id").as("id2"), col("embedding").as("e2")),
            "id2")
          .select(col("id1"), col("id2"),
            round(dotF(col("e1"), col("e2")), 4).as("sim"))
          .where(col("sim") >= 0.4).count()
        println(s"  verified=$n")
      }
      t("full dedup_embedding") {
        SparkEntry.queries("dedup_embedding")(s, sfDir).count()
      }
    }

    for (rep <- 1 to 2) {
      println(s"== table_log_replay rep $rep ==")
      t("catalog conf") {
        s.conf.set("spark.sql.catalog.graft",
          classOf[graft.sources.GraftMergeCatalog].getName)
      }
      t("temp view") {
        Tables.orders(s, sfDir)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_orderstatus"), col("o_totalprice"))
          .createOrReplaceTempView("logr_src")
      }
      t("drop") { s.sql("DROP TABLE IF EXISTS graft.logr_orders") }
      t("create") {
        s.sql("CREATE TABLE graft.logr_orders (o_orderkey BIGINT, " +
          "o_orderpriority STRING, o_orderstatus STRING, " +
          "o_totalprice DOUBLE) PARTITIONED BY (o_orderpriority) " +
          "TBLPROPERTIES ('graft.store'='parquet', " +
          "'graft.delete.mode'='dv')")
      }
      t("insert v0") {
        s.sql("INSERT INTO graft.logr_orders SELECT * FROM logr_src")
      }
      t("insert v1") {
        s.sql("INSERT INTO graft.logr_orders " +
          "SELECT o_orderkey + 10000000, o_orderpriority, " +
          "o_orderstatus, o_totalprice FROM logr_src " +
          "WHERE o_orderkey % 7 = 0")
      }
      t("delete dv") {
        s.sql("DELETE FROM graft.logr_orders WHERE o_orderkey < 1000")
      }
      t("tag") {
        graft.api.GraftApi.createTag(s, "graft.logr_orders", "audit")
      }
      t("restart") {
        graft.sources.GraftLog.simulateProcessRestart(
          Seq("graft.logr_orders"))
      }
      t("readout") {
        val cur = s.table("graft.logr_orders")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_now"))
        val v0 = s.sql("SELECT o_orderstatus, COUNT(*) AS n_v0 " +
          "FROM graft.logr_orders VERSION AS OF 0 GROUP BY 1")
        val tag = s.sql("SELECT o_orderstatus, COUNT(*) AS n_tag " +
          "FROM graft.logr_orders VERSION AS OF 'audit' GROUP BY 1")
        cur.join(v0, "o_orderstatus").join(tag, "o_orderstatus")
          .orderBy("o_orderstatus").count()
      }
    }
    spark.stop()
  }
}
