package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-discovery surface (SURVEY.md §2.1 S1-S2, §2.2 P1, §2.8 F1/F2):
  * the reference discovers its dataset id and file resources on the
  * dados.gov.br REST API and filters them to relevant SCM/SMP/STFC
  * ODS/CSV files (/root/reference/main.py:35-171).
  *
  * The HTTP fetch itself is driver-side plumbing (and the harness has no
  * egress); everything AFTER the fetch — resource-list shaping, URL
  * fixing, service/format filtering, year extraction, service
  * classification — is data logic, implemented here over a DataFrame of
  * resource descriptors so it is testable against canned API JSON
  * (FIXTURES.md A2).
  */
object ResourceCatalog {

  /** Parse a canned API response (the `recursos` array) into a resource
    * frame (link, titulo, formato).
    */
  def fromJson(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(json).toDS())
      .select(explode(col("recursos")).as("r"))
      .select(col("r.link"), col("r.titulo"), col("r.formato"))
  }

  /** Service classifier with the reference's precedence order
    * (SCM before SMP before STFC, else OUTROS — main.py:174-189).
    */
  def serviceOf(titulo: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(upper(titulo).contains("SCM"), "SCM")
      .when(upper(titulo).contains("SMP"), "SMP")
      .when(upper(titulo).contains("STFC"), "STFC")
      .otherwise("OUTROS")

  /** Relevant-resource filter (main.py:122-171): non-empty link,
    * title mentions a target service, format or link indicates ODS/CSV;
    * backslashes in URLs fixed; year extracted from the title
    * (first 4-digit run, else null).
    */
  def relevantResources(resources: DataFrame): DataFrame =
    resources
      .filter(col("link").isNotNull && col("link") =!= "")
      .withColumn("link", regexp_replace(col("link"), "\\\\", "/"))
      .filter(upper(col("titulo")).rlike("SCM|SMP|STFC"))
      .filter(
        upper(coalesce(col("formato"), lit(""))).contains("ODS") ||
          upper(col("link")).contains(".ODS") ||
          upper(coalesce(col("formato"), lit(""))).contains("CSV") ||
          upper(col("link")).contains(".CSV"))
      .withColumn("ano", nullif(regexp_extract(col("titulo"), "(\\d{4})", 1), lit("")).cast("int"))
      .withColumn("servico", serviceOf(col("titulo")))
      .select("link", "titulo", "formato", "ano", "servico")
}
