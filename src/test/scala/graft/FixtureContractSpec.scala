package graft

import org.apache.spark.sql.functions._

/** Tripwire for the driver-regenerated fixture: every assumption the
  * engine bakes in about `/root/testdata` is asserted HERE, loudly, so a
  * regeneration that changes an encoding or a shape fails one named spec
  * instead of silently skewing dozens of oracle compares.
  *
  * Motivating incident: the round-4 regeneration switched events.ts from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS). The then-reader divided the raw
  * INT64 by 1000 unconditionally, every event collapsed onto day zero,
  * and 7 data-sensitive specs failed while the queries themselves still
  * "ran fine" — the divergence was only visible against the DuckDB
  * oracle. These contracts make the next such change a one-line diagnosis.
  */
class FixtureContractSpec extends SparkSpec {

  private def table(name: String) = spark.read.parquet(s"$sf/$name.parquet")

  test("every fixture table carries exactly the expected columns") {
    val expected = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (t, cols) =>
      val actual = table(t).columns.toSeq
      if (actual == cols) None else Some(s"$t: expected $cols got $actual")
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("events raw epoch is one unit (ns or us) and lands in a sane decade") {
    // read the physical INT64 exactly as the engine's reader does
    val raw = spark.read
      .schema(graft.events.EventsQueries.RawSchema)
      .parquet(s"$sf/events.parquet")
    val r = raw.agg(min("ts").as("lo"), max("ts").as("hi")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val floor = graft.events.EventsQueries.RawNsFloor
    assert((lo >= floor) == (hi >= floor),
      s"mixed epoch units in one file: min=$lo max=$hi straddle $floor")
    // normalized event time must land in [2000, 2100): a regeneration
    // that moves to ms or s epochs would escape this band
    val us = graft.events.EventsQueries.events(spark, sf)
      .agg(min("ts"), max("ts")).head()
    val year2000Us = 946684800000000L
    val year2100Us = 4102444800000000L
    assert(us.getLong(0) >= year2000Us && us.getLong(1) < year2100Us,
      s"normalized µs epochs out of band: ${us.getLong(0)}..${us.getLong(1)}")
  }

  test("footer logical type agrees with the magnitude-based unit pick") {
    // the parquet footer is the AUTHORITATIVE unit declaration; tsUs
    // normalizes per row by magnitude (so a regenerated fixture works
    // without a code change) — this pins the two in agreement, so a
    // file whose footer says MICROS but whose values look like NANOS
    // (or vice versa) fails loudly instead of being silently "fixed"
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    val path = new org.apache.hadoop.fs.Path(s"$sf/events.parquet")
    val fs = path.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(path).isDirectory)
        fs.listStatus(path).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(fail(s"no parquet part file under $path"))
      else path
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    val unit = try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      schema.getFields.get(schema.getFieldIndex("ts"))
          .asPrimitiveType().getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit.toString
        case other => fail(s"ts carries no timestamp annotation: $other")
      }
    } finally reader.close()
    val rawMax = spark.read
      .schema(graft.events.EventsQueries.RawSchema)
      .parquet(s"$sf/events.parquet")
      .agg(max("ts")).head().getLong(0)
    val magnitudeSaysNanos = rawMax >= graft.events.EventsQueries.RawNsFloor
    unit match {
      case "NANOS"  => assert(magnitudeSaysNanos,
        s"footer NANOS but values ($rawMax) classify as µs")
      case "MICROS" => assert(!magnitudeSaysNanos,
        s"footer MICROS but values ($rawMax) classify as ns")
      case other    => fail(s"unexpected events epoch unit: $other")
    }
  }

  test("date columns are timestamp-typed (inference-compatible, not NANOS)") {
    // orders/lineitem dates are read WITHOUT explicit schemas throughout
    // the engine: Spark rejects TIMESTAMP(NANOS) at inference, so this
    // spec failing means every relational query just broke
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    for ((t, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val dt = table(t).schema(c).dataType
      assert(dt == TimestampType || dt == TimestampNTZType, s"$t.$c is $dt")
    }
  }

  test("events columns all materialize through the explicit-schema read") {
    // events is read with an explicit schema everywhere (the ns-era
    // reader contract), and Spark silently yields all-NULL for a column
    // the file no longer carries — so the contract is "no nulls", not
    // "schema equality": a dropped/renamed column fails HERE, not as an
    // oracle hash mismatch three layers downstream
    val ev = spark.read
      .schema(graft.events.EventsQueries.RawSchemaWithProps)
      .parquet(s"$sf/events.parquet")
    val nulls = ev.select(ev.columns.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)).toSeq: _*).head()
    val offenders = ev.columns.zipWithIndex
      .collect { case (c, i) if nulls.getLong(i) > 0 => s"$c: ${nulls.getLong(i)} nulls" }
    assert(offenders.isEmpty, offenders.mkString(", "))
  }

  test("identifier keys are unique per table") {
    val checks = Seq("events" -> "event_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id", "orders" -> "o_orderkey",
      "customer" -> "c_custkey", "part" -> "p_partkey",
      "supplier" -> "s_suppkey")
    val dups = checks.flatMap { case (t, k) =>
      val df =
        if (t == "events") graft.events.EventsQueries.events(spark, sf)
        else table(t)
      val n = df.groupBy(col(k)).count().filter(col("count") > 1).count()
      if (n == 0) None else Some(s"$t.$k: $n duplicated keys")
    }
    assert(dups.isEmpty, dups.mkString("\n"))
  }

  test("date bands cover the windows the relational queries filter on") {
    // q3/q4/q14/q15 window 1995-1996, q22's dormancy cut is 2000+; a
    // regeneration that shifts the order calendar empties those windows
    // and QuerySweep would only say "0 rows" — this names the cause
    val o = table("orders")
      .agg(min(year(col("o_orderdate"))), max(year(col("o_orderdate")))).head()
    val (omin, omax) = (o.getInt(0), o.getInt(1))
    assert(omin <= 1995 && omax >= 2000,
      s"orders span [$omin, $omax] no longer covers 1995..2000")
    val l = table("lineitem")
      .agg(min(year(col("l_shipdate"))), max(year(col("l_shipdate")))).head()
    assert(l.getInt(0) <= 1995 && l.getInt(1) >= 1996,
      s"lineitem ship span [${l.getInt(0)}, ${l.getInt(1)}] misses 1995/1996")
  }

  test("the literals the TPC-H shapes filter on exist in the fixture") {
    // a regeneration that renames nations, reshuffles part types/names,
    // or drops an order status would silently empty q6-q21's predicates
    // (an empty result still oracle-matches — this names the cause)
    val natNames = table("nation").select("n_name").collect()
      .map(_.getString(0)).toSet
    assert(Set("NATION_3", "NATION_8").subsetOf(natNames),
      s"q7/q8's nation literals missing from $natNames")
    val suppNations = table("supplier").select("s_nationkey").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(Set(3, 8).subsetOf(suppNations),
      s"q7's pair needs suppliers in nations 3 and 8, got $suppNations")
    assert(table("orders").filter(col("o_orderstatus") === "F").count() > 0,
      "q21's finished-order cut matches nothing")
    assert(table("part").filter(col("p_type") === "PROMO").count() > 0,
      "q8/q14's PROMO part type matches nothing")
    assert(table("part").filter(col("p_name").contains("widget")).count() > 0,
      "q9's widget name cut matches nothing")
    assert(table("lineitem").filter(col("l_returnflag") === "R").count() > 0,
      "q10's returned-items cut matches nothing")
    assert(table("orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count() > 0,
      "q12's high-priority class literals match nothing")
    assert(table("lineitem")
      .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24).count() > 0,
      "q6's discount/quantity band matches nothing")
  }

  test("events event_type is never null (ORDER BY parity across engines)") {
    // Spark's orderBy defaults NULLS FIRST, DuckDB's NULLS LAST: a NULL
    // event_type would silently reorder every per-type result. The
    // weekday-profile oracle spells NULLS FIRST, but the contract is
    // cheaper to pin once here.
    val nulls = graft.events.EventsQueries.events(spark, sf)
      .filter(col("event_type").isNull).count()
    assert(nulls === 0L, s"$nulls events with NULL event_type")
  }

  test("events cover enough distinct days for the daily analytics") {
    // weekday profile needs all 7 weekdays; anomaly/retention/decay need
    // a multi-day series — one day of events would zero them all
    val days = graft.events.EventsQueries.events(spark, sf)
      .select(expr(s"ts div ${graft.events.EventsQueries.DayUs}").as("day"))
      .distinct()
    val nDays = days.count()
    assert(nDays >= 7, s"only $nDays distinct event days")
    val nWeekdays = days.select(pmod(col("day") + 3, lit(7L))).distinct().count()
    assert(nWeekdays === 7L, s"only $nWeekdays of 7 weekdays present")
  }

  test("embeddings have one constant dimension and finite values") {
    val dims = table("embeddings")
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.length == 1, s"ragged embedding dims: ${dims.toSeq}")
    val bad = table("embeddings")
      .select(explode(col("embedding")).as("x"))
      .filter(isnan(col("x")) || col("x").isNull).count()
    assert(bad == 0, s"$bad NaN/null embedding components")
  }

  test("documents text is non-null and n_chars consistent") {
    val d = table("documents")
    assert(d.filter(col("text").isNull).count() == 0, "null document text")
    val off = d.filter(length(col("text")) =!= col("n_chars")).count()
    assert(off == 0, s"$off documents where n_chars != length(text)")
  }
}
