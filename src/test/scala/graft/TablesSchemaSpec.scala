package graft

import org.apache.spark.sql.types._

/** Early-warning pins for driver testdata regenerations — the general form
  * of the events.ts lesson (round 5: a silent physical-type change cost a
  * third of the catalog; see TablesAdaptiveSpec for the adaptive loader).
  *
  * Each table's column NAMES are pinned exactly, and each column's type is
  * pinned to the SET of encodings the engine handles. A regeneration that
  * renames, drops, or re-types a column fails here first, by name, in
  * seconds — not as 30 cryptic rows in the driver's correctness gate.
  */
class TablesSchemaSpec extends SparkSpec {

  private val integral: Set[DataType] = Set(LongType, IntegerType)
  private val fractional: Set[DataType] = Set(DoubleType, FloatType)
  private def decimalOr(others: DataType*): DataType => Boolean =
    dt => dt.isInstanceOf[DecimalType] || others.contains(dt)

  private def pin(name: String, df: org.apache.spark.sql.DataFrame,
                  expect: Seq[(String, DataType => Boolean)]): Unit = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(df.schema.fieldNames.toSeq == expect.map(_._1),
      s"$name columns drifted: ${df.schema.fieldNames.mkString(",")}")
    expect.foreach { case (c, ok) =>
      assert(ok(fields(c)), s"$name.$c has unhandled type ${fields(c)}")
    }
  }

  test("documents schema is the shape every text operator assumes") {
    pin("documents", Tables.documents(spark, sfDir), Seq(
      "doc_id" -> integral.contains _,
      "text" -> (_ == StringType),
      "lang" -> (_ == StringType),
      "source" -> (_ == StringType),
      "n_chars" -> integral.contains _))
  }

  test("embeddings schema is the shape every similarity operator assumes") {
    val e = Tables.embeddings(spark, sfDir)
    pin("embeddings", e, Seq(
      "vec_id" -> integral.contains _,
      "embedding" -> {
        case ArrayType(et, _) => fractional.contains(et)
        case _ => false
      },
      "label" -> integral.contains _))
  }

  test("events schema (post-loader) is the shape every temporal operator assumes") {
    pin("events", Tables.events(spark, sfDir), Seq(
      "event_id" -> integral.contains _,
      "ts" -> (_ == TimestampType), // the loader's normalization contract
      "user_id" -> integral.contains _,
      "event_type" -> (_ == StringType),
      "value" -> fractional.contains _,
      "props" -> (_ == StringType)))
  }

  test("lineitem/orders carry the columns and numeric families the relational family assumes") {
    val li = Tables.lineitem(spark, sfDir)
    val expectedLi = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    assert(expectedLi.forall(li.schema.fieldNames.contains),
      s"lineitem keys drifted: ${li.schema.fieldNames.mkString(",")}")
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").foreach { c =>
      assert(decimalOr(DoubleType, FloatType)(li.schema(c).dataType),
        s"lineitem.$c has unhandled type ${li.schema(c).dataType}")
    }
    // date-valued column; every filter compares against DATE literals,
    // which Spark coerces across all three of these encodings
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType)
      .contains(li.schema("l_shipdate").dataType),
      s"l_shipdate unhandled: ${li.schema("l_shipdate").dataType}")
    val o = Tables.orders(spark, sfDir)
    assert(Seq("o_orderkey", "o_custkey", "o_orderdate").forall(o.schema.fieldNames.contains),
      s"orders keys drifted: ${o.schema.fieldNames.mkString(",")}")
  }
}
