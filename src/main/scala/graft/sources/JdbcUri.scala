package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dialect-keyed JDBC URI builders — the Spark-side parity of the
  * reference's nine connection builders (connection.rb:313-457:
  * `jdbc_uri_mysql/postgresql/vertica/mariadb/oracle/sqlserver/
  * snowflake/clickhouse/jdbc` plus the `JDBC_DRIVER_CLASS` table).
  * The URI grammar is pinned against the reference's own
  * connection_test.rb:100-135 expectations (SQL Server port/instance/
  * database, property-map and integratedSecurity forms).
  *
  * The output feeds straight into Spark's JDBC source
  * (`Sources.loadJdbc` + a `driver` option): Spark's JdbcDialects
  * registry handles the per-database SQL quirks once the URL is
  * right, so these builders are the whole dialect surface a reference
  * user needs to port a connection config. `params` keys use the
  * reference's snake_case names (`host`, `port`, `database`,
  * `instance`, `integrated_security`, `database_schema`,
  * `warehouse`, `protocol`, `url`, `jdbc_url`, `jdbc_driver`);
  * `properties` are the free-form URI properties appended after the
  * dialect defaults (merge keeps the default's position but takes
  * the caller's value, matching Ruby `Hash#merge!`).
  */
object JdbcUri {

  /** Build the dialect-specific JDBC URI (connection.rb:313-318
    * dispatches on the driver name exactly like this).
    */
  def uri(driver: String, params: Map[String, String] = Map.empty,
      properties: Seq[(String, String)] = Nil,
      env: Map[String, String] = sys.env): String = driver match {
    case "mysql" => generic("mysql", params, properties,
      defaults = Seq("useUnicode" -> "true", "characterEncoding" -> "UTF-8"))
    case "postgresql" | "vertica" | "mariadb" =>
      generic(driver, params, properties)
    case "oracle" => oracle(params, env)
    case "sqlserver" => generic("sqlserver", params, properties,
      uriPrefix = Some("jdbc:sqlserver://"), addDatabase = false,
      separator = ";", firstSeparator = ";",
      defaults = paramProperties(params, SqlServerParamProperties))
    case "snowflake" => generic("snowflake", params, properties,
      addDatabase = false, separator = "&", firstSeparator = "/?",
      defaults = paramProperties(params, SnowflakeParamProperties))
    case "clickhouse" =>
      val protocol = params.get("protocol").map { p =>
        require(p.matches("\\w+"), s"invalid protocol $p")
        s":$p"
      }.getOrElse("")
      generic("clickhouse", params, properties,
        uriPrefix = Some(s"jdbc:ch$protocol://"))
    case "jdbc" => params.getOrElse("jdbc_url",
      throw new IllegalArgumentException("missing jdbc_url parameter"))
    case other =>
      throw new IllegalArgumentException(s"unknown JDBC driver '$other'")
  }

  /** Driver class per dialect (connection.rb JDBC_DRIVER_CLASS plus
    * the mysql Connector/J 8-vs-5 probe and the raw-`jdbc` escape
    * hatch).
    */
  def driverClass(driver: String,
      params: Map[String, String] = Map.empty): String = driver match {
    case "mysql" =>
      // prefer Connector/J 8's class if present on the classpath
      try { Class.forName("com.mysql.cj.jdbc.Driver")
        "com.mysql.cj.jdbc.Driver" }
      catch { case _: ClassNotFoundException => "com.mysql.jdbc.Driver" }
    case "jdbc" => params.getOrElse("jdbc_driver",
      throw new IllegalArgumentException("missing jdbc_driver parameter"))
    case other => DriverClass.getOrElse(other,
      throw new IllegalArgumentException(s"unknown JDBC driver '$other'"))
  }

  /** One-call dialect read: build URI + driver class, hand to
    * `Sources.loadJdbc`. The Spark `options` (partitionColumn /
    * numPartitions / pushDownPredicate ...) ride through untouched —
    * that is where the 100 TB concerns (parallel strided reads,
    * remote pushdown) live, orthogonal to the dialect grammar.
    */
  def load(spark: SparkSession, driver: String, table: String,
      params: Map[String, String] = Map.empty,
      properties: Seq[(String, String)] = Nil,
      options: Map[String, String] = Map.empty): DataFrame =
    Sources.loadJdbc(spark, uri(driver, params, properties), table,
      options + ("driver" -> driverClass(driver, params)))

  private val DriverClass = Map(
    "postgresql" -> "org.postgresql.Driver",
    "oracle" -> "oracle.jdbc.OracleDriver",
    "sqlserver" -> "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "vertica" -> "com.vertica.jdbc.Driver",
    "snowflake" -> "net.snowflake.client.jdbc.SnowflakeDriver",
    "clickhouse" -> "com.clickhouse.jdbc.ClickHouseDriver",
    "mariadb" -> "org.mariadb.jdbc.Driver")

  // param-key -> URI-property mappings, in the reference's declared
  // (and therefore emission) order; `instance` after `instance_name`
  // so the short form wins on conflict, as Ruby's hash insert does
  private val SqlServerParamProperties = Seq(
    "database" -> "databaseName",
    "integrated_security" -> "integratedSecurity",
    "application_name" -> "applicationName",
    "instance_name" -> "instanceName",
    "instance" -> "instanceName")

  private val SnowflakeParamProperties = Seq(
    "database" -> "db",
    "database_schema" -> "schema",
    "warehouse" -> "warehouse")

  private def paramProperties(params: Map[String, String],
      mapping: Seq[(String, String)]): Seq[(String, String)] =
    mapping.foldLeft(Seq.empty[(String, String)]) {
      case (acc, (param, prop)) => params.get(param) match {
        case Some(v) => merge(acc, Seq(prop -> v))
        case None => acc
      }
    }

  /** connection.rb:338-347 `jdbc_uri_generic`. */
  private def generic(driver: String, params: Map[String, String],
      properties: Seq[(String, String)],
      uriPrefix: Option[String] = None,
      addDatabase: Boolean = true,
      separator: String = "&", firstSeparator: String = "?",
      defaults: Seq[(String, String)] = Nil): String = {
    val prefix = uriPrefix.getOrElse(s"jdbc:$driver://")
    val port = params.get("port")
    var out = prefix + params.getOrElse("host", "") +
      port.map(":" + _).getOrElse("")
    if (addDatabase) params.get("database").foreach(d => out += s"/$d")
    val props = merge(defaults, properties)
    if (props.isEmpty) out
    else out + firstSeparator +
      props.map { case (k, v) => s"$k=$v" }.mkString(separator)
  }

  /** connection.rb:374-388 `jdbc_uri_oracle` — explicit `url` wins;
    * a bare `database` with TNS_ADMIN set is a TNS alias; otherwise
    * host:port with the SID-colon backward-compat heuristic.
    */
  private def oracle(params: Map[String, String],
      env: Map[String, String]): String = {
    val database = params.get("database")
    if (database.isDefined && params.get("host").isEmpty &&
        params.get("url").isEmpty && env.contains("TNS_ADMIN"))
      s"jdbc:oracle:thin:@${database.get}"
    else params.getOrElse("url", {
      val db = database.map { d =>
        if (d.startsWith(":") || d.startsWith("/")) d else s":$d"
      }.getOrElse("")
      val host = params.getOrElse("host", "localhost")
      val port = params.getOrElse("port", "1521")
      s"jdbc:oracle:thin:@$host:$port$db"
    })
  }

  /** Insertion-order merge matching Ruby `Hash#merge!`: an override
    * of an existing key keeps the key's position but takes the new
    * value; new keys append.
    */
  private def merge(base: Seq[(String, String)],
      overrides: Seq[(String, String)]): Seq[(String, String)] =
    overrides.foldLeft(base) { case (acc, (k, v)) =>
      if (acc.exists(_._1 == k)) acc.map {
        case (`k`, _) => (k, v)
        case kv => kv
      } else acc :+ (k -> v)
    }
}
