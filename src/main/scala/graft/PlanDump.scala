package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev utility: dump `explain("formatted")` for named queries to files —
  * the optimization-round evidence trail (plans/r15/<id>_<tag>.txt).
  * Usage: runMain graft.PlanDump <outDir> <tag> <id1,id2,...> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val ids = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    ids.foreach { id =>
      try {
        val df = SparkEntry.queries(id)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${id}_$tag.txt"), txt)
        System.err.println(s"[plandump] wrote $id")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $id failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
