package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Experiment harness #6: dump generated code for the q121 stage whose
  * whole-stage compile fails ("Redefinition of local variable").
  */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q121_dsir_select")(spark, sfDir)
    df.collect()
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/q121_codegen.txt"),
      codegenString(df.queryExecution.executedPlan))
    println("[scratch6] wrote /tmp/q121_codegen.txt")
    spark.stop()
  }
}
