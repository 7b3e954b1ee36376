package graft.io

import org.apache.spark.sql.DataFrame

/** CSV sink (SURVEY.md §2.1 S6; reference writes one CSV,
  * /root/reference/main.py:742).
  *
  * Single-file mode exists for parity with the reference's one-file
  * handoff; the default is a normal partitioned write — a coalesce(1) on
  * 100 TB would funnel everything through one task.
  */
object CsvSink {

  def write(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write
      .mode("overwrite")
      .option("header", "true")
      .csv(path)
  }
}
