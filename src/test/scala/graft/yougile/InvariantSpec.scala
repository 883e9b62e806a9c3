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

  test("assembly row count and DQ count match the model for 8 generated universes") {
    (1L to 8L).foreach { seed =>
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
