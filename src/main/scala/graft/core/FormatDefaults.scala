package graft.core

/** One definition of the per-format reader/writer option defaults every
  * manifested-table path applies (round 15; ADVICE round-14). Before
  * this, [[ManifestFileIndex.relation]] injected `header=true` for csv
  * but [[ManifestWrite]] and the streaming sink wrote csv headerless and
  * the streaming source read it with no defaults — so a csv table
  * written and read through `format("graftmanifest")` consumed its first
  * data row as a header, and connector-written (header-bearing) csv
  * ingested each file's header line as data. Mirrors
  * [[FileConnector]]'s own configureR/configureW defaults; explicit user
  * options always win (callers apply these as `defaults ++ options`).
  */
object FormatDefaults {
  def read(format: String): Map[String, String] = format match {
    case "csv" => Map("header" -> "true", "inferSchema" -> "true")
    case _     => Map.empty
  }

  def write(format: String): Map[String, String] = format match {
    case "csv" => Map("header" -> "true")
    case _     => Map.empty
  }
}
