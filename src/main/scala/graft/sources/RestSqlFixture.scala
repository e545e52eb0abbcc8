package graft.sources

/** Built-in recorded REST-SQL transcripts driving the zero-egress
  * gates (q_snowflake_scan / q_databricks_scan) — the response shapes
  * the live Snowflake SQL API and Databricks Statement Execution API
  * produce, per their public docs and the reference's clients
  * (src/parsing_snowflake.jl:188-250, src/parsing_databricks.jl:80-130).
  * In-source like [[GSheetFixture]] so a bare compiled-classes run
  * needs no resource-copy step. */
object RestSqlFixture {

  val snowflakeUrl = "https://acct-x1.snowflakecomputing.com/api/v2/statements"

  /** one statement POST → typed 200 result: fixed(0)/fixed(2)/real/
    * boolean/text columns, NULLs in both numeric and text positions */
  val snowflakeTranscript: String =
    s"""### POST $snowflakeUrl
       |HTTP/1.1 200 OK
       |Content-Type: application/json
       |
       |{"resultSetMetaData":{"rowType":[
       |{"name":"o_id","type":"fixed","scale":0},
       |{"name":"amount","type":"fixed","scale":2},
       |{"name":"ratio","type":"real"},
       |{"name":"shipped","type":"boolean"},
       |{"name":"region","type":"text"}]},
       |"data":[
       |["1","19.99","0.5","true","EUROPE"],
       |["2","7.50","1.25","false","ASIA"],
       |["3",null,"0.0","true",null],
       |["4","1250.00","2.75","false","AMERICA"],
       |["5","0.01",null,"true","EUROPE"]]}""".stripMargin
      .linesIterator.mkString("\n")

  val databricksUrl =
    "https://ws-1.cloud.databricks.com/api/2.0/sql/statements"

  /** POST → PENDING, one poll → SUCCEEDED with EXTERNAL_LINKS; two
    * presigned chunks fetched executor-side (no auth header) */
  val databricksTranscript: String = {
    val manifest =
      """"manifest":{"schema":{"columns":[""" +
        """{"name":"doc_id","type_name":"LONG","position":0},""" +
        """{"name":"score","type_name":"DOUBLE","position":1},""" +
        """{"name":"tag","type_name":"STRING","position":2}]}}"""
    s"""### POST $databricksUrl
       |HTTP/1.1 200 OK
       |Content-Type: application/json
       |
       |{"statement_id":"st-graft-1","status":{"state":"PENDING"}}
       |### GET $databricksUrl/st-graft-1
       |HTTP/1.1 200 OK
       |Content-Type: application/json
       |
       |{"statement_id":"st-graft-1","status":{"state":"SUCCEEDED"},$manifest,
       |"result":{"external_links":[
       |{"external_link":"https://presigned.cloud-store.example/chunk-0"},
       |{"external_link":"https://presigned.cloud-store.example/chunk-1"}]}}
       |### GET https://presigned.cloud-store.example/chunk-0
       |HTTP/1.1 200 OK
       |Content-Type: application/json
       |
       |[["10","0.125","clean"],["11","0.5",null],["12","0.875","clean"]]
       |### GET https://presigned.cloud-store.example/chunk-1
       |HTTP/1.1 200 OK
       |Content-Type: application/json
       |
       |[["13","1.0","flagged"],["14","0.25","clean"]]""".stripMargin
  }

  def snowflakeConn: RestSql.SnowflakeConnection =
    RestSql.SnowflakeConnection(snowflakeUrl, "recorded-token", "GRAFT",
      "PUBLIC", "WH_XS",
      RestSql.recordedTransportFromString(snowflakeTranscript))

  def databricksConn: RestSql.DatabricksConnection =
    RestSql.DatabricksConnection(databricksUrl, "recorded-token", "wh-1",
      RestSql.recordedTransportFromString(databricksTranscript),
      pollDelayMs = 0L)
}
