package graft.sources

/** Option parsing shared by the DSv2 connectors (they must not depend
  * on each other for it).
  */
private[graft] object ConnectorOptions {

  /** `option("header.Authorization", "ApiKey ...")`-style options
    * become request headers on EVERY exchange the connector makes
    * (search, scroll/PIT page and release, watermark poll, bulk
    * write) — the auth seam. Names arrive lowercased through Spark's
    * case-insensitive option map; HTTP header names are
    * case-insensitive, so that is harmless. Values are credentials
    * and never logged.
    */
  def headers(properties: java.util.Map[String, String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    properties.forEach((k, v) =>
      if (k.toLowerCase.startsWith("header.")) out += (k.substring(7) -> v))
    out.result()
  }
}
