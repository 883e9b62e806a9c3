package graft.yougile

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.yougile.Model._

/** Property-style invariants (SURVEY.md §5): for generated universes of
  * contracts and lots, the assembled grain must equal
  * Σ max(1, |subtasks|) minus occurrences of deleted lots, and the
  * data-loss probe must count exactly the dangling references.
  *
  * ScalaCheck generators are sampled with fixed seeds (no scalatestplus
  * bridge in the offline dependency set), one Spark run per universe.
  */
class InvariantSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private case class U(contracts: Seq[TaskObj], lots: Seq[TaskObj])

  private val genUniverse: Gen[U] = for {
    nLots <- Gen.choose(0, 12)
    deletedFlags <- Gen.listOfN(nLots, Gen.oneOf(Some(true), Some(false), None))
    nContracts <- Gen.choose(1, 8)
    // each contract references 0-4 ids drawn from real lots and two dangling ids
    refsPerContract <- Gen.listOfN(nContracts,
      Gen.choose(0, 4).flatMap(n => Gen.listOfN(n,
        Gen.oneOf((0 until nLots).map(i => s"L$i") ++ Seq("GONE-1", "GONE-2")))))
    hasField <- Gen.listOfN(nContracts, Gen.oneOf(true, false))
  } yield {
    val lots = deletedFlags.zipWithIndex.map { case (d, i) =>
      TaskObj(s"L$i", s"Лот $i", 0L, None, None, d, Some(Map.empty), None)
    }
    val contracts = refsPerContract.zip(hasField).zipWithIndex.map { case ((refs, hf), i) =>
      val subtasks = if (!hf && refs.isEmpty) None else Some(refs)
      TaskObj(s"K$i", s"Сделка $i", 0L, Some("c1"), subtasks, None, None, None)
    }
    U(contracts, lots.filter(_ => nLots > 0))
  }

  private def sample(seed: Long): U =
    genUniverse.pureApply(Gen.Parameters.default, rng.Seed(seed))

  test("assembly row count and DQ count match the model for 16 generated universes") {
    (1L to 16L).foreach { seed =>
      val u = sample(seed)
      val deleted = u.lots.filter(_.deleted.contains(true)).map(_.id).toSet
      val real = u.lots.map(_.id).toSet

      val expectedRows = u.contracts.map { c =>
        val refs = c.subtasks.getOrElse(Nil)
        if (refs.isEmpty) 1L else refs.count(r => !deleted.contains(r)).toLong
      }.sum
      val expectedLost = u.contracts.flatMap(_.subtasks.getOrElse(Nil)).count(!real.contains(_))

      val assembled = Transform.taskAssembly(
        Transform.contractsPrepared(u.contracts.toDS().toDF()),
        Transform.subtasksPrepared(
          if (u.lots.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            u.contracts.toDS().toDF().schema)
          else u.lots.toDS().toDF()))

      assert(assembled.count() == expectedRows, s"grain mismatch, seed=$seed")
      assert(Transform.lostSubtasks(assembled).count() == expectedLost, s"DQ mismatch, seed=$seed")
    }
  }

  test("generated sticker slots round-trip the C1–C7 scalar block, 12 universes") {
    val qtyGen = Gen.oneOf(None, Some(""), Some("12.5"), Some("7"), Some("junk"))
    val datesGen = Gen.oneOf(
      None, Some(""), Some("01.02.2024 - 03.02.2024"), Some("01.02.2024-03.02.2024"),
      Some("15.03.2024"))
    val placeGen = Gen.oneOf(None, Some("Порт А"), Some("Порт Б"))
    val deadlineGen = Gen.oneOf(
      None,
      Some(Deadline(Some(1706745600000L), Some(1707350400000L))), // 2024-02-01 / 02-08 UTC
      Some(Deadline(None, None)))
    case class LotSlots(qty: Option[String], dates: Option[String],
        p1: Option[String], p2: Option[String], dl: Option[Deadline])
    val lotGen = for {
      q <- qtyGen; d <- datesGen; p1 <- placeGen; p2 <- placeGen; dl <- deadlineGen
    } yield LotSlots(q, d, p1, p2, dl)
    val uniGen = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, lotGen))

    (40L to 51L).foreach { seed =>
      val slots = uniGen.pureApply(Gen.Parameters.default, rng.Seed(seed))
      val lots = slots.zipWithIndex.map { case (ls, i) =>
        val m = Map.newBuilder[String, String]
        ls.qty.foreach(v => m += Stickers.QuantityPlan -> v)
        ls.dates.foreach(v => m += Stickers.LoadingDates1 -> v)
        ls.p1.foreach(v => m += Stickers.DischargingPlace1 -> v)
        ls.p2.foreach(v => m += Stickers.DischargingPlace2 -> v)
        TaskObj(s"L$i", s"Лот $i", 0L, None, None, Some(false), Some(m.result()), ls.dl)
      }
      val contract = TaskObj("K0", "Сделка", 1706000000000L, Some("c1"),
        Some(lots.map(_.id)), None, Some(Map.empty), None)
      val boards = Seq(Board("b1", "Доска Трейдинг А", "p1")).toDF()
      val cols = Seq(BoardColumn("c1", "В работе", "b1")).toDF()
      val bc = Transform.brdClmn(boards, cols, Seq("Доска Трейдинг А"))
      val states = Transform.stickerStates(
        Seq(StickerDict(Stickers.LotStatus, HubNames.LotStatus,
          Seq(StickerState("s1", "X")))).toDS().toDF())
      val m = Transform.mart(
        Transform.taskAssembly(
          Transform.contractsPrepared(Seq(contract).toDS().toDF()),
          Transform.subtasksPrepared(lots.toDS().toDF())),
        bc, states, "2026-01-01 00:00:00")
      val got = m.collect().map(r => r.getAs[String]("subtask_id") -> r).toMap
      assert(got.size == lots.size, s"seed=$seed grain")

      val utcDay = java.time.ZoneOffset.UTC
      def msToDate(ms: Long) = java.sql.Date.valueOf(
        java.time.Instant.ofEpochMilli(ms).atZone(utcDay).toLocalDate)
      slots.zipWithIndex.foreach { case (ls, i) =>
        val r = got(s"L$i")
        // C7: empty/missing/garbage numeric slot → null, else double
        val expQty: Any =
          ls.qty.filter(_.nonEmpty).flatMap(_.toDoubleOption).map(Double.box).orNull
        assert(r.getAs[Any]("quantity_plan") == expQty, s"seed=$seed L$i qty ${ls.qty}")
        // C3: slot-1 wins, pandas-fillna style
        val expPlace = ls.p1.orElse(ls.p2).orNull
        assert(r.getAs[String]("discharging_place") == expPlace, s"seed=$seed L$i place")
        // C1+C2+C4: strip spaces, split on '-', parse dd.MM.yyyy (null on missing)
        val parts = ls.dates.map(_.replace(" ", "").split("-", -1)).getOrElse(Array.empty)
        def datePart(j: Int) =
          if (parts.length > j && parts(j).nonEmpty)
            java.sql.Date.valueOf(java.time.LocalDate.parse(
              parts(j), java.time.format.DateTimeFormatter.ofPattern("dd.MM.yyyy")))
          else null
        assert(r.getAs[java.sql.Date]("loading_start_date") == datePart(0), s"seed=$seed L$i start")
        assert(r.getAs[java.sql.Date]("loading_end_date") == datePart(1), s"seed=$seed L$i end")
        // C5: epoch-ms → UTC date, null-through
        val expDl = ls.dl.flatMap(_.startDate).map(msToDate).orNull
        assert(r.getAs[java.sql.Date]("deadline_start_date") == expDl, s"seed=$seed L$i deadline")
      }
    }
  }

  test("mart row count never exceeds assembly and dedup is idempotent") {
    (20L to 23L).foreach { seed =>
      val u = sample(seed)
      val boards = Seq(Board("b1", "Доска Трейдинг А", "p1")).toDF()
      val cols = Seq(BoardColumn("c1", "В работе", "b1")).toDF()
      val bc = Transform.brdClmn(boards, cols, Seq("Доска Трейдинг А"))
      val states = Transform.stickerStates(
        Seq(StickerDict(Stickers.LotStatus, HubNames.LotStatus, Seq(StickerState("s1", "X")))).toDS().toDF())
      val assembled = Transform.taskAssembly(
        Transform.contractsPrepared(u.contracts.toDS().toDF()),
        Transform.subtasksPrepared(
          if (u.lots.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            u.contracts.toDS().toDF().schema)
          else u.lots.toDS().toDF()))
      val m = Transform.mart(assembled, bc, states, "2026-01-01 00:00:00")
      val n = m.count()
      assert(n <= assembled.count())
      assert(m.dropDuplicates().count() == n)
    }
  }
}
