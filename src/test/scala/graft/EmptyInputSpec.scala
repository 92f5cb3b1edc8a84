package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every query must survive empty inputs — at 100 TB whole partitions,
  * date ranges, or freshly-created tables are routinely empty, and a
  * pipeline that throws on them takes the whole job down. Stages limit(0)
  * copies of all tables and runs the full query map against them.
  */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_empty_sf").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    // events: stage the raw ns file through the same nanosAsLong read the
    // engine uses, then write (ts becomes µs — the post-read shape)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawEvents = spark.read.parquet(s"$sf/events.parquet").limit(0)
    rawEvents.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name returns (possibly zero) rows on empty tables") {
      val n = fn(spark, emptyDir).count()
      assert(n >= 0)
    }
  }
}
