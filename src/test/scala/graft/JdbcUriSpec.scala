package graft

import graft.sources.{JdbcUri, Sources}

/** Dialect URI builders pinned against the reference's own
  * expectations (connection_test.rb:100-135 for SQL Server; the
  * builder code at connection.rb:313-457 for the rest), plus an
  * end-to-end read through the raw-`jdbc` dialect against embedded
  * Derby.
  */
class JdbcUriSpec extends SparkSpec {

  // --- SQL Server: the three reference-test pins, verbatim ---

  test("sqlserver URI: host/port/instance/database " +
      "(connection_test.rb:105)") {
    assert(JdbcUri.uri("sqlserver", Map(
      "host" -> "example.com", "port" -> "1234",
      "instance" -> "MSSQLSERVER", "database" -> "example_db")) ===
      "jdbc:sqlserver://example.com:1234;databaseName=example_db;" +
        "instanceName=MSSQLSERVER")
  }

  test("sqlserver URI: instance name as free property " +
      "(connection_test.rb:116)") {
    assert(JdbcUri.uri("sqlserver", Map("host" -> "example.com"),
      properties = Seq("instanceName" -> "MSSQLSERVER")) ===
      "jdbc:sqlserver://example.com;instanceName=MSSQLSERVER")
  }

  test("sqlserver URI: integratedSecurity (connection_test.rb:127)") {
    assert(JdbcUri.uri("sqlserver", Map("host" -> "example.com",
      "integrated_security" -> "true")) ===
      "jdbc:sqlserver://example.com;integratedSecurity=true")
  }

  // --- the other dialects, per connection.rb's builders ---

  test("mysql URI carries the UTF-8 defaults; caller properties " +
      "override in place") {
    assert(JdbcUri.uri("mysql", Map(
      "host" -> "db.example.com", "database" -> "sales")) ===
      "jdbc:mysql://db.example.com/sales?useUnicode=true&" +
        "characterEncoding=UTF-8")
    // merge! semantics: override keeps position, new key appends
    assert(JdbcUri.uri("mysql", Map("host" -> "h", "database" -> "d"),
      properties = Seq("characterEncoding" -> "latin1",
        "ssl" -> "true")) ===
      "jdbc:mysql://h/d?useUnicode=true&characterEncoding=latin1&" +
        "ssl=true")
  }

  test("postgresql / vertica / mariadb use the plain generic form") {
    for (d <- Seq("postgresql", "vertica", "mariadb"))
      assert(JdbcUri.uri(d, Map("host" -> "h", "port" -> "5",
        "database" -> "db")) === s"jdbc:$d://h:5/db")
    assert(JdbcUri.uri("postgresql", Map("host" -> "h")) ===
      "jdbc:postgresql://h")
  }

  test("oracle URI: SID colon heuristic, service-name slash, " +
      "explicit url wins") {
    assert(JdbcUri.uri("oracle", Map("host" -> "h",
      "database" -> "ORCL")) === "jdbc:oracle:thin:@h:1521:ORCL")
    assert(JdbcUri.uri("oracle", Map("host" -> "h", "port" -> "1522",
      "database" -> "/svc.example.com")) ===
      "jdbc:oracle:thin:@h:1522/svc.example.com")
    assert(JdbcUri.uri("oracle",
      Map("url" -> "jdbc:oracle:thin:@tns_alias")) ===
      "jdbc:oracle:thin:@tns_alias")
    // defaults when only a database is given and TNS_ADMIN is absent
    // (env passed explicitly: the machine's real env must not decide
    // which branch this test exercises)
    assert(JdbcUri.uri("oracle", Map("database" -> "XE"),
      env = Map.empty) === "jdbc:oracle:thin:@localhost:1521:XE")
    // with TNS_ADMIN set, a bare database IS the TNS alias
    assert(JdbcUri.uri("oracle", Map("database" -> "XE"),
      env = Map("TNS_ADMIN" -> "/etc/tns")) === "jdbc:oracle:thin:@XE")
  }

  test("snowflake URI: db/schema/warehouse map behind /?") {
    assert(JdbcUri.uri("snowflake", Map(
      "host" -> "acct.snowflakecomputing.com", "database" -> "D",
      "database_schema" -> "S", "warehouse" -> "W")) ===
      "jdbc:snowflake://acct.snowflakecomputing.com/?db=D&schema=S&" +
        "warehouse=W")
  }

  test("clickhouse URI: optional validated protocol prefix") {
    assert(JdbcUri.uri("clickhouse", Map("host" -> "h",
      "port" -> "8123", "database" -> "db")) ===
      "jdbc:ch://h:8123/db")
    assert(JdbcUri.uri("clickhouse", Map("host" -> "h",
      "protocol" -> "https", "database" -> "db")) ===
      "jdbc:ch:https://h/db")
    intercept[IllegalArgumentException] {
      JdbcUri.uri("clickhouse", Map("host" -> "h",
        "protocol" -> "bad proto"))
    }
  }

  test("raw jdbc dialect passes jdbc_url through and requires it") {
    assert(JdbcUri.uri("jdbc",
      Map("jdbc_url" -> "jdbc:derby:/x/db")) === "jdbc:derby:/x/db")
    intercept[IllegalArgumentException] { JdbcUri.uri("jdbc") }
    intercept[IllegalArgumentException] { JdbcUri.uri("db2") }
  }

  test("driver classes match the reference's JDBC_DRIVER_CLASS table") {
    assert(JdbcUri.driverClass("postgresql") === "org.postgresql.Driver")
    assert(JdbcUri.driverClass("oracle") === "oracle.jdbc.OracleDriver")
    assert(JdbcUri.driverClass("sqlserver") ===
      "com.microsoft.sqlserver.jdbc.SQLServerDriver")
    assert(JdbcUri.driverClass("vertica") === "com.vertica.jdbc.Driver")
    assert(JdbcUri.driverClass("snowflake") ===
      "net.snowflake.client.jdbc.SnowflakeDriver")
    assert(JdbcUri.driverClass("clickhouse") ===
      "com.clickhouse.jdbc.ClickHouseDriver")
    assert(JdbcUri.driverClass("mariadb") === "org.mariadb.jdbc.Driver")
    // no Connector/J on this classpath -> legacy class name
    assert(JdbcUri.driverClass("mysql") === "com.mysql.jdbc.Driver")
    assert(JdbcUri.driverClass("jdbc",
      Map("jdbc_driver" -> "x.Y")) === "x.Y")
    intercept[IllegalArgumentException] { JdbcUri.driverClass("jdbc") }
    intercept[IllegalArgumentException] { JdbcUri.driverClass("db2") }
  }

  test("JdbcUri.load reads a table end-to-end via the raw-jdbc " +
      "dialect (embedded Derby)") {
    val base = graft.Tables.load(spark, Sf, "nation")
    val db = java.nio.file.Files
      .createTempDirectory("graft_derby_uri").toString + "/db"
    Sources.writeJdbc(base, s"jdbc:derby:$db;create=true", "nation_j",
      Map("createTableColumnTypes" -> "n_name VARCHAR(64)"))
    val back = JdbcUri.load(spark, "jdbc", "nation_j", Map(
      "jdbc_url" -> s"jdbc:derby:$db",
      "jdbc_driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver"))
    assert(back.count() === base.count())
    assert(back.columns.sorted === base.columns.sorted)
  }
}
