package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Injectable HTTP transport for the discovery→download path (SURVEY.md
  * §2.1 S1/S3; reference `main.py:35-116` API discovery and
  * `main.py:347-369` download). The sandbox has no egress, so the
  * TRANSPORT is the seam: [[Discovery]] carries the reference's request
  * shaping, response handling, and retry semantics against this trait,
  * [[HttpTransport]] is the production implementation (plain JDK
  * HttpURLConnection — driver-side control plane, never on executors),
  * and the spec drives the full chain (discover id → list resources →
  * filter → download → ingest) through a canned double.
  */
trait Transport {

  /** GET `url` with `headers`; network-level failures throw, HTTP-level
    * failures return their status (the reference distinguishes the two:
    * a non-200 download triggers the no-auth retry, a thrown request
    * error aborts — main.py:355-369).
    */
  def get(url: String, headers: Map[String, String], timeoutMs: Int): Transport.Response
}

object Transport {
  final case class Response(status: Int, body: Array[Byte]) {
    def text: String = new String(body, java.nio.charset.StandardCharsets.UTF_8)
    def ok: Boolean = status >= 200 && status < 300
  }
}

/** Production transport: JDK HttpURLConnection, no extra dependencies.
  * Driver-side only — downloads feed the distributed readers
  * ([[OdsReader]], [[CsvEncodingReader]]) as local files, exactly the
  * reference's collect-then-process split (SURVEY §7.5).
  */
final class HttpTransport extends Transport {
  def get(url: String, headers: Map[String, String], timeoutMs: Int): Transport.Response = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val status = conn.getResponseCode
      val in = Option(if (status >= 400) conn.getErrorStream else conn.getInputStream)
      val body = in.fold(Array.emptyByteArray)(s =>
        try s.readAllBytes() finally s.close())
      Transport.Response(status, body)
    } finally conn.disconnect()
  }
}

/** The reference's discovery/download client, re-expressed over the
  * injectable [[Transport]]. Each method mirrors one reference function's
  * observable contract:
  *
  *  - [[findDatasetId]] ≡ `buscar_dataset_id_dinamicamente`
  *    (main.py:35-84): search endpoint with the fixed params, first
  *    result's `id`; None on empty list, missing id, or ANY request
  *    failure (the reference swallows errors and returns None).
  *  - [[fetchResources]] ≡ `fazer_requisicao_api` (main.py:87-116):
  *    dataset endpoint, non-2xx or transport failure THROWS (the
  *    reference re-raises), body parsed to the `recursos` frame via
  *    [[ResourceCatalog.fromJson]].
  *  - [[download]] ≡ `baixar_arquivo` (main.py:347-369): first attempt
  *    WITH auth headers; on any non-200, ONE retry without them (some
  *    files are public); still-failing or throwing downloads yield None.
  */
final class Discovery(transport: Transport, apiKey: Option[String] = None) {

  import Discovery._

  private def authHeaders: Map[String, String] =
    Map("accept" -> "application/json") ++
      apiKey.map("chave-api-dados-abertos" -> _)

  /** Search the catalog for the IDA dataset; None on any failure.
    * The FIRST array element's id, parsed driver-side with Jackson —
    * the reference indexes `datasets[0]` (main.py:74), and a
    * distributed `spark.read.json` makes no contractual row-order
    * guarantee for a parsed array, so element order is pinned here
    * where it is semantic. (A search response is a control-plane
    * payload of a few KB — driver-side parsing is also the right cost
    * shape; Spark never needs to see it.)
    */
  def findDatasetId(spark: SparkSession): Option[String] =
    try {
      val url = s"$BaseUrl/conjuntos-dados?" +
        s"nomeConjuntoDados=$DatasetSlug&dadosAbertos=true&isPrivado=false&pagina=1"
      val resp = transport.get(url, authHeaders, timeoutMs = 15000)
      if (!resp.ok) None
      else {
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(resp.text)
        if (!root.isArray || root.isEmpty) None
        else Option(root.get(0).get("id"))
          .filterNot(n => n.isNull || n.isMissingNode)
          .map(_.asText())
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fetch the dataset's resource list; non-2xx and transport failures
    * throw (callers abort — there is no pipeline without the listing).
    */
  def fetchResources(spark: SparkSession, datasetId: String): DataFrame = {
    val resp = transport.get(
      s"$BaseUrl/conjuntos-dados/$datasetId", authHeaders, timeoutMs = 15000)
    if (!resp.ok)
      throw new java.io.IOException(
        s"dataset fetch failed: HTTP ${resp.status}: ${resp.text.take(200)}")
    ResourceCatalog.fromJson(spark, resp.text)
  }

  /** Download one resource: auth first, anonymous retry on any non-200,
    * None when both fail or the transport throws.
    */
  def download(url: String): Option[Array[Byte]] =
    try {
      val first = transport.get(url, authHeaders, timeoutMs = 20000)
      val resp = if (first.status == 200) first
        else transport.get(url, Map.empty, timeoutMs = 20000)
      if (resp.ok) Some(resp.body) else None
    } catch { case scala.util.control.NonFatal(_) => None }
}

object Discovery {
  /** main.py:33 — the public open-data API base. */
  val BaseUrl = "https://dados.gov.br/dados/api/publico"

  /** main.py:47 — the dataset search slug. */
  val DatasetSlug = "indice-desempenho-atendimento"
}
