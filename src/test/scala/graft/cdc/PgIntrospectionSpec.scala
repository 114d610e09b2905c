package graft.cdc

import graft.core.UnsupportedPgTypeException
import org.scalatest.funsuite.AnyFunSuite

/** S6/S7 spec: publication DDL and introspection-row → TableSchema fold. */
class PgIntrospectionSpec extends AnyFunSuite {

  test("publication DDL matches reference naming (commands.go:838-848)") {
    assert(PgIntrospection.createPublicationSql("mydb", Seq("t1", "t2")) ==
      "CREATE PUBLICATION pub_basin_mydb FOR TABLE t1, t2")
    intercept[IllegalArgumentException](PgIntrospection.createPublicationSql("x", Nil))
  }

  test("introspection SQL covers arrays and PKs") {
    val sql = PgIntrospection.introspectionSql("public", Seq("t", "t2"))
    assert(sql.contains("information_schema.columns"))
    assert(sql.contains("element_types"))       // array element resolution
    assert(sql.contains("PRIMARY KEY"))
    assert(sql.contains("'t', 't2'"))
  }

  test("rows fold into TableSchemas with Spark types") {
    val rows = Seq(
      ("t", "id", "integer", false, true),
      ("t", "name", "text", true, false),
      ("t", "tags", "text[]", true, false),
      ("t2", "v", "numeric(10,2)", true, false))
    val schemas = PgIntrospection.fromRows(rows)
    assert(schemas.map(_.table) == Seq("t", "t2"))
    val t = schemas.head.toStructType
    assert(t("id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(!t("id").nullable && t("id").metadata.getBoolean("isPrimary"))
    assert(t("tags").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    assert(schemas(1).toStructType("v").dataType == org.apache.spark.sql.types.DoubleType)
  }

  test("unsupported type fails eagerly, like reference DDL generation") {
    intercept[UnsupportedPgTypeException] {
      PgIntrospection.fromRows(Seq(("t", "c", "USER-DEFINED", true, false)))
    }
  }
}
