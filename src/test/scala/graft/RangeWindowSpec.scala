package graft

import org.scalatest.funsuite.AnyFunSuite

/** q35's contract, against ground truth recomputed in plain Scala from
  * the daily aggregate: for every (brand, day) the RANGE frame must
  * cover exactly the rows whose day falls in [day-6, day] — the VALUE
  * axis — and the spec separately proves the frame kind MATTERS on this
  * data: somewhere the series has a gap, so a 7-ROWS frame (q23's kind)
  * would disagree. If that ever stops holding the operator would be
  * indistinguishable from a rows frame and the entry would be vacuous.
  */
class RangeWindowSpec extends AnyFunSuite with SparkFixture {

  private def r2(x: Double): Double =
    math.floor((x + 1e-6) * 100 + 0.5) / 100

  // l_shipdate's physical encoding shifts across driver testdata
  // generations (see Tables.withTsUs) — accept any of them
  private def asLocalDate(x: Any): java.time.LocalDate = x match {
    case d: java.sql.Date => d.toLocalDate
    case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
    case t: java.time.LocalDateTime => t.toLocalDate
    case d: java.time.LocalDate => d
    case other => fail(s"unexpected date encoding: ${other.getClass}")
  }

  test("q35 range frame equals the hand-computed trailing-week window") {
    val got = SparkEntry.queries("q35_range_window")(spark, sfDir).collect()
      .map(r => (r.getString(0), asLocalDate(r.get(1)).toString) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got.nonEmpty)

    // ground truth from the raw tables, aggregated independently
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_shipdate", "l_extendedprice").collect()
      .map(r => (r.getLong(0), asLocalDate(r.get(1)), r.getDouble(2)))
    val brandOf = graft.sources.Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val daily = li.groupBy { case (pk, day, _) => (brandOf(pk), day) }
      .map { case ((b, day), rows) =>
        (b, day, r2(rows.map(_._3).sum / rows.size), rows.size.toLong) }
      .toSeq
    val byBrand = daily.groupBy(_._1)

    var rangeDiffersFromRows = false
    daily.foreach { case (b, day, avg, _) =>
      val series = byBrand(b).sortBy(_._2.toEpochDay)
      val inRange = series.filter { case (_, d2, _, _) =>
        val diff = day.toEpochDay - d2.toEpochDay
        diff >= 0 && diff <= 6
      }
      val expMa = r2(inRange.map(_._3).sum / inRange.size)
      val expN7 = inRange.map(_._4).sum
      val (gAvg, gMa, gN7) = got((b, day.toString))
      assert(gAvg == avg, s"daily avg mismatch at ($b, $day)")
      assert(gMa == expMa, s"range ma mismatch at ($b, $day): got $gMa want $expMa")
      assert(gN7 == expN7, s"range n7 mismatch at ($b, $day): got $gN7 want $expN7")

      // would a 7-ROWS frame have said something else here?
      val idx = series.indexWhere(t => t._2 == day)
      val rowsFrame = series.slice(math.max(0, idx - 6), idx + 1)
      if (r2(rowsFrame.map(_._3).sum / rowsFrame.size) != expMa)
        rangeDiffersFromRows = true
    }
    assert(rangeDiffersFromRows,
      "no gap anywhere: RANGE == ROWS on this data, the entry tests nothing")
  }

  test("q36 densifies every brand calendar and forward-fills across gaps") {
    val got = SparkEntry.queries("q36_gap_fill")(spark, sfDir).collect()
      .map(r => (r.getString(0), asLocalDate(r.get(1)).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.nonEmpty)

    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_shipdate", "l_extendedprice").collect()
      .map(r => (r.getLong(0), asLocalDate(r.get(1)), r.getDouble(2)))
    val brandOf = graft.sources.Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val daily = li.groupBy { case (pk, day, _) => (brandOf(pk), day) }
      .map { case ((b, day), rows) =>
        (b, day) -> ((r2(rows.map(_._3).sum / rows.size), rows.size.toLong)) }

    var sawGap = false
    daily.groupBy(_._1._1).foreach { case (b, cells) =>
      val days = cells.keys.map(_._2).toSeq
      val (d0, d1) = (days.minBy(_.toEpochDay), days.maxBy(_.toEpochDay))
      var lastPx = Double.NaN
      var day = d0
      while (!day.isAfter(d1)) {
        val cell = daily.get((b, day))
        cell.foreach { case (px, _) => lastPx = px }
        val (gn, gpx, ggap) = got((b, day.toString))
        assert(gn == cell.map(_._2).getOrElse(0L), s"n at ($b, $day)")
        assert(gpx == lastPx, s"px_ff at ($b, $day): got $gpx want $lastPx")
        assert(ggap == cell.isEmpty, s"is_gap at ($b, $day)")
        if (cell.isEmpty) sawGap = true
        day = day.plusDays(1)
      }
      // the dense calendar has EXACTLY (d1 - d0 + 1) rows for this brand
      val nRows = got.keys.count(_._1 == b)
      assert(nRows == d1.toEpochDay - d0.toEpochDay + 1,
        s"calendar for $b not dense: $nRows rows")
    }
    assert(sawGap, "no gap day anywhere: forward-fill untested, entry vacuous")
  }
}
