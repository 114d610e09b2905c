package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Postgres setup + schema introspection (S6/S7).
 *
 * S7: the reference captures per-table schemas once at stream start with a
 * 3-way `information_schema` join (`cmd/vaults/commands.go:851-921`)
 * yielding (column_name, data_type, is_nullable, is_primary) per table.
 * Here the same query text is generated ([[introspectionSql]]) and its
 * result rows fold into [[TableSchema]]s ([[fromRows]]); against a live
 * database the rows arrive via `spark.read.jdbc` ([[tableSchemas]]).
 *
 * S6: `CREATE PUBLICATION` DDL (idempotent), `cmd/vaults/commands.go:838-848`.
 */
object PgIntrospection {

  /** S6: publication DDL; the reference prefixes `pub_basin_`. */
  def createPublicationSql(name: String, tables: Seq[String]): String = {
    require(tables.nonEmpty, "publication needs at least one table")
    s"CREATE PUBLICATION pub_basin_$name FOR TABLE ${tables.mkString(", ")}"
  }

  /**
   * S7: one query over information_schema + pg constraint catalogs;
   * semantically equivalent to the reference's introspection (columns ⋈
   * PK constraint columns ⋈ array element types, resolving `ARRAY` to
   * `element_type[]`). Constrained `numeric` columns keep their
   * `(precision,scale)` in the captured type text — `PgTypes.normalize`
   * strips it for the default decode, and the `pgNumericAsDecimal`
   * opt-in reads it to resolve the exact `DecimalType(p,s)`.
   */
  /** SQL string-literal escape (double embedded single quotes) — the
    * schema/table names are interpolated into the query text. */
  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  def introspectionSql(schema: String, tables: Seq[String]): String = {
    val tableList = tables.map(lit).mkString(", ")
    s"""SELECT c.table_name,
       |       c.column_name,
       |       CASE WHEN c.data_type = 'ARRAY'
       |            THEN e.data_type || '[]'
       |            WHEN c.data_type = 'numeric' AND c.numeric_precision IS NOT NULL
       |            THEN 'numeric(' || c.numeric_precision || ',' || c.numeric_scale || ')'
       |            ELSE c.data_type END AS data_type,
       |       c.is_nullable = 'YES' AS is_nullable,
       |       pk.column_name IS NOT NULL AS is_primary,
       |       c.ordinal_position
       |FROM information_schema.columns c
       |LEFT JOIN information_schema.element_types e
       |  ON c.table_catalog = e.object_catalog
       | AND c.table_schema = e.object_schema
       | AND c.table_name = e.object_name
       | AND c.dtd_identifier = e.collection_type_identifier
       |LEFT JOIN (
       |  SELECT kcu.table_schema, kcu.table_name, kcu.column_name
       |  FROM information_schema.table_constraints tc
       |  JOIN information_schema.key_column_usage kcu
       |    ON tc.constraint_name = kcu.constraint_name
       |   AND tc.constraint_schema = kcu.constraint_schema
       |   AND tc.table_schema = kcu.table_schema
       |   AND tc.table_name = kcu.table_name
       |  WHERE tc.constraint_type = 'PRIMARY KEY'
       |    AND tc.table_schema = ${lit(schema)}
       |) pk ON pk.table_schema = c.table_schema
       |    AND pk.table_name = c.table_name
       |    AND pk.column_name = c.column_name
       |WHERE c.table_schema = ${lit(schema)} AND c.table_name IN ($tableList)
       |ORDER BY c.table_name, c.ordinal_position""".stripMargin
  }

  /** Fold introspection rows (table, column, data_type, nullable,
    * primary) into TableSchemas, validating the type universe eagerly —
    * unsupported types fail here, like the reference's DDL generation. */
  def fromRows(rows: Seq[(String, String, String, Boolean, Boolean)]): Seq[TableSchema] =
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (table, cols) =>
      val ts = TableSchema(table, cols.map { case (_, name, typ, nullable, primary) =>
        TableColumn(name, typ, nullable, primary)
      })
      ts.validate()
      ts
    }

  /** Live-database path: ship the introspection query to Postgres via
    * JDBC (requires the pg JDBC driver on the classpath). */
  def tableSchemas(spark: SparkSession, jdbcUrl: String, props: java.util.Properties,
                   schema: String, tables: Seq[String]): Seq[TableSchema] = {
    val df: DataFrame = spark.read.jdbc(jdbcUrl,
      s"(${introspectionSql(schema, tables)}) AS s", props)
    fromRows(df.collect().toSeq.map(r => (
      r.getString(0), r.getString(1), r.getString(2),
      r.getBoolean(3), r.getBoolean(4))))
  }
}
