package graft.tools

import org.apache.spark.sql.SparkSession

/** A pluggable concurrent phase for [[KillSoak]]: runs its own
  * verify loop until `stop()` turns true and reports
  * (iterations, green). Implementations that need TEST-classpath
  * fixtures (the in-JVM FTP/SFTP mini servers) live in test sources
  * and are discovered by class name when the soak is launched with
  * `sbt "Test/runMain graft.tools.KillSoak …"` — the production jar
  * carries only this trait.
  */
trait SoakPhase {
  /** Phase name for the soak JSON (e.g. "stage"). */
  def name: String
  /** Run until `stop()`; return (iterations, green). Must swallow its
    * own exceptions into non-green iterations — a phase crash must
    * not take the soak down.
    */
  def run(spark: SparkSession, stop: () => Boolean): (Int, Int)

  /** Extra per-phase counters for the soak JSON, read after [[run]]
    * returns (e.g. the staging phase's publish-leg split). Every
    * `<k> -> v` lands as `"<name>_<k>":v`; keys ending in
    * `_iterations` are gated green like the primary pair by
    * [[KillSoak]] (their `_green` twin must match).
    */
  def detail: Map[String, Int] = Map.empty
}

object SoakPhase {
  /** Instantiate a phase by class name if it is on the classpath
    * (test-classpath fixtures are absent under plain `runMain`).
    */
  def load(className: String): Option[SoakPhase] =
    try Some(Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[SoakPhase])
    catch { case _: ClassNotFoundException => None }
}
