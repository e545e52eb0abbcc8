package graft

import graft.sources.RestSql
import graft.sources.RestSql._

/** REST-SQL warehouse clients (SURVEY §2.1 — the reference's
  * Snowflake/Databricks HTTP backends) driven end to end on RECORDED
  * byte transcripts: typed materialization, the PENDING→SUCCEEDED poll
  * loop, inline chunk pagination, executor-side presigned-link
  * fetches, and loud failures. The live transport is the same code
  * path with real sockets. */
class RestSqlSpec extends SparkSpec {

  private val sfUrl = "https://acct.snowflakecomputing.com/api/v2/statements"

  private def snowflakeTranscript(body: String, status: Int = 200): Transport =
    RestSql.recordedTransportFromString(
      s"""### POST $sfUrl
         |HTTP/1.1 $status ${if (status == 200) "OK" else "Error"}
         |Content-Type: application/json
         |
         |$body""".stripMargin)

  test("Snowflake: typed materialization from resultSetMetaData (fixed/real/boolean/text, nulls)") {
    val t = snowflakeTranscript(
      """{"resultSetMetaData":{"rowType":[
        |{"name":"ID","type":"fixed","scale":0},
        |{"name":"PRICE","type":"fixed","scale":2},
        |{"name":"RATIO","type":"real"},
        |{"name":"OK","type":"boolean"},
        |{"name":"NAME","type":"text"}]},
        |"data":[["1","19.99","0.5","true","widget"],
        |["2",null,"1.25","false",null]]}""".stripMargin.replaceAll("\n", ""))
    val conn = SnowflakeConnection(sfUrl, "tok", "DB", "PUBLIC", "WH", t)
    val df = RestSql.querySnowflake(spark, conn, "SELECT * FROM items")
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("ID", "bigint"), ("PRICE", "double"), ("RATIO", "double"),
        ("OK", "boolean"), ("NAME", "string")))
    val rows = df.orderBy("ID").collect()
    assert(rows(0).toSeq == Seq(1L, 19.99, 0.5, true, "widget"))
    assert(rows(1).getLong(0) == 2L && rows(1).isNullAt(1) && rows(1).isNullAt(4))
  }

  test("Snowflake: non-200 and missing-metadata responses fail loudly") {
    val bad = snowflakeTranscript("""{"message":"Authentication token expired"}""",
      status = 401)
    val conn = SnowflakeConnection(sfUrl, "tok", "DB", "PUBLIC", "WH", bad)
    val e = intercept[IllegalArgumentException] {
      RestSql.querySnowflake(spark, conn, "SELECT 1")
    }
    assert(e.getMessage.contains("HTTP 401"))
    val noMeta = snowflakeTranscript("""{"data":[["1"]]}""")
    val e2 = intercept[IllegalStateException] {
      RestSql.querySnowflake(spark,
        SnowflakeConnection(sfUrl, "tok", "DB", "PUBLIC", "WH", noMeta), "SELECT 1")
    }
    assert(e2.getMessage.contains("rowType"))
  }

  private val dbxUrl = "https://ws.cloud.databricks.com/api/2.0/sql/statements"

  test("Databricks: PENDING -> RUNNING -> SUCCEEDED poll loop, inline result + chunk pagination") {
    val manifest =
      """"manifest":{"schema":{"columns":[
        |{"name":"k","type_name":"STRING","position":0},
        |{"name":"n","type_name":"LONG","position":1}]}}""".stripMargin
        .replaceAll("\n", "")
    val t = RestSql.recordedTransportFromString(
      s"""### POST $dbxUrl
         |HTTP/1.1 200 OK
         |
         |{"statement_id":"st1","status":{"state":"PENDING"}}
         |### GET $dbxUrl/st1
         |HTTP/1.1 200 OK
         |
         |{"statement_id":"st1","status":{"state":"RUNNING"}}
         |### GET $dbxUrl/st1
         |HTTP/1.1 200 OK
         |
         |{"statement_id":"st1","status":{"state":"SUCCEEDED"},$manifest,
         |"result":{"data_array":[["a","1"],["b","2"]],
         |"next_chunk_internal_link":"/api/2.0/sql/statements/st1/result/chunks/1"}}
         |### GET https://ws.cloud.databricks.com/api/2.0/sql/statements/st1/result/chunks/1
         |HTTP/1.1 200 OK
         |
         |{"data_array":[["c","3"]]}""".stripMargin)
    val conn = DatabricksConnection(dbxUrl, "tok", "wh1", t, pollDelayMs = 0L)
    val df = RestSql.queryDatabricks(spark, conn, "SELECT k, n FROM t")
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("k", "string"), ("n", "bigint")))
    assert(df.orderBy("k").collect().map(_.toSeq).toSeq ==
      Seq(Seq("a", 1L), Seq("b", 2L), Seq("c", 3L)))
  }

  test("Databricks: EXTERNAL_LINKS chunks fetch on executors without auth headers") {
    val manifest =
      """"manifest":{"schema":{"columns":[
        |{"name":"id","type_name":"LONG","position":0},
        |{"name":"v","type_name":"DOUBLE","position":1}]}}""".stripMargin
        .replaceAll("\n", "")
    val t = RestSql.recordedTransportFromString(
      s"""### POST $dbxUrl
         |HTTP/1.1 200 OK
         |
         |{"statement_id":"st2","status":{"state":"SUCCEEDED"},$manifest,
         |"result":{"external_links":[
         |{"external_link":"https://presigned.example.com/chunk0"},
         |{"external_link":"https://presigned.example.com/chunk1"}]}}
         |### GET https://presigned.example.com/chunk0
         |HTTP/1.1 200 OK
         |
         |[["1","0.5"],["2","1.5"]]
         |### GET https://presigned.example.com/chunk1
         |HTTP/1.1 200 OK
         |
         |[["3","2.5"]]""".stripMargin)
    val conn = DatabricksConnection(dbxUrl, "tok", "wh1", t, pollDelayMs = 0L)
    val df = RestSql.queryDatabricks(spark, conn, "SELECT id, v FROM big")
    // chunks land one per task (the distributed path)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.orderBy("id").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1L, 0.5), Seq(2L, 1.5), Seq(3L, 2.5)))
  }

  test("Databricks: FAILED state and poll exhaustion fail loudly") {
    val failed = RestSql.recordedTransportFromString(
      s"""### POST $dbxUrl
         |HTTP/1.1 200 OK
         |
         |{"statement_id":"st3","status":{"state":"FAILED",
         |"error":{"message":"TABLE_OR_VIEW_NOT_FOUND: nope"}}}""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      RestSql.queryDatabricks(spark,
        DatabricksConnection(dbxUrl, "tok", "wh1", failed, pollDelayMs = 0L),
        "SELECT * FROM nope")
    }
    assert(e.getMessage.contains("FAILED") && e.getMessage.contains("NOT_FOUND"))

    val stuck = RestSql.recordedTransportFromString(
      (s"""### POST $dbxUrl
          |HTTP/1.1 200 OK
          |
          |{"statement_id":"st4","status":{"state":"PENDING"}}
          |""".stripMargin +
        (1 to 3).map(_ =>
          s"""### GET $dbxUrl/st4
             |HTTP/1.1 200 OK
             |
             |{"statement_id":"st4","status":{"state":"PENDING"}}
             |""".stripMargin).mkString).stripSuffix("\n"))
    val e2 = intercept[IllegalArgumentException] {
      RestSql.queryDatabricks(spark,
        DatabricksConnection(dbxUrl, "tok", "wh1", stuck,
          maxPolls = 3, pollDelayMs = 0L),
        "SELECT 1")
    }
    assert(e2.getMessage.contains("after 3 polls"))
  }

  test("recorded transport sequences repeated requests and is exhausted loudly") {
    val t = RestSql.recordedTransportFromString(
      """### GET http://x/a
        |HTTP/1.1 200 OK
        |
        |first
        |### GET http://x/a
        |HTTP/1.1 200 OK
        |
        |second""".stripMargin)
    assert(t.request("GET", "http://x/a", Map.empty, None).text == "first")
    assert(t.request("GET", "http://x/a", Map.empty, None).text == "second")
    val e = intercept[IllegalArgumentException] {
      t.request("GET", "http://x/a", Map.empty, None)
    }
    assert(e.getMessage.contains("no (more) recorded exchanges"))
    // method is part of the key
    val e2 = intercept[IllegalArgumentException] {
      t.request("POST", "http://x/a", Map.empty, None)
    }
    assert(e2.getMessage.contains("POST http://x/a"))
  }

  test("Tidier.readSnowflake/readDatabricks chain into the verb surface") {
    import org.apache.spark.sql.functions.col
    val sfDf = Tidier.readSnowflake(spark,
      graft.sources.RestSqlFixture.snowflakeConn,
      "SELECT * FROM orders_v")
      .filter(col("shipped") === true)
      .arrange("o_id")
      .select("o_id", "region")
      .df.collect().map(_.toSeq).toSeq
    assert(sfDf == Seq(Seq(1L, "EUROPE"), Seq(3L, null), Seq(5L, "EUROPE")))
    val dbxN = Tidier.readDatabricks(spark,
      graft.sources.RestSqlFixture.databricksConn,
      "SELECT * FROM scored_docs")
      .filter(col("tag") === "clean")
      .df.count()
    assert(dbxN == 3L)
  }

  test("snowflakeTableMetadata issues the INFORMATION_SCHEMA probe through the same path") {
    val t = snowflakeTranscript(
      """{"resultSetMetaData":{"rowType":[
        |{"name":"COLUMN_NAME","type":"text"},
        |{"name":"DATA_TYPE","type":"text"}]},
        |"data":[["ID","NUMBER"],["NAME","TEXT"]]}""".stripMargin.replaceAll("\n", ""))
    val conn = SnowflakeConnection(sfUrl, "tok", "DB", "PUBLIC", "WH", t)
    val df = RestSql.snowflakeTableMetadata(spark, conn, "items")
    assert(df.collect().map(_.toSeq).toSeq ==
      Seq(Seq("ID", "NUMBER"), Seq("NAME", "TEXT")))
  }

  test("metadata probe escapes identifiers and literals (no SQL injection)") {
    assert(RestSql.sfIdent("""my"db""") == "\"my\"\"db\"")
    assert(RestSql.sfLit("sch'ema") == "'sch''ema'")
    assert(RestSql.sfLit("""a\'b""") == """'a\\''b'""")
    // an attacker-supplied table name stays INSIDE the literal: the
    // quote is doubled, so the statement still has exactly 2 literals
    val hostile = "X' OR '1'='1"
    val lit = RestSql.sfLit(hostile)
    assert(lit == "'X'' OR ''1''=''1'")
  }
}
