package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the public-suffix-list matcher (r17 VERDICT #8):
  * `Text.pldOf` (a broadcast theta-join + max_by priority pick) vs an
  * INDEPENDENT driver-side implementation of the publicsuffix.org
  * algorithm written label-wise (split host into labels, a rule matches
  * when its labels align right-to-left with '*' as a one-label
  * wildcard, an exception rule wins outright and its effective suffix
  * is the rule minus its leftmost label, otherwise the rule with the
  * most labels prevails, registrable domain = suffix + one label, a
  * host that IS a suffix or matches nothing yields None). Eight seeded
  * corpora of random rule sets (plain/wildcard/exception mixes in the
  * shapes the real PSL contains — exceptions only under wildcards,
  * never single-label) and hosts planted to hit them densely.
  */
class PslFuzzSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  /** Reference PSL algorithm, label-wise — deliberately a different
    * formulation from pldOf's string-suffix arithmetic.
    */
  private def refPld(host: String, rules: Seq[String]): Option[String] = {
    val hl = host.split('.')
    def matches(rule: String): Boolean = {
      val rl = rule.split('.')
      rl.length <= hl.length && rl.reverse.zip(hl.reverse).forall {
        case (r, h) => r == "*" || r == h
      }
    }
    val excs = rules.collect { case r if r.startsWith("!") => r.drop(1) }
      .filter(matches)
    val suffixLabels: Option[Int] =
      if (excs.nonEmpty) Some(excs.map(_.split('.').length).max - 1)
      else {
        val ms = rules.filterNot(_.startsWith("!")).filter(matches)
        if (ms.isEmpty) None else Some(ms.map(_.split('.').length).max)
      }
    suffixLabels.flatMap { n =>
      if (hl.length <= n) None else Some(hl.takeRight(n + 1).mkString("."))
    }
  }

  test("pldOf matches the label-wise PSL reference on 8 seeded rule/host corpora") {
    import spark.implicits._
    def lcg(seed: Long): () => Long = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      () => { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 16 }
    }
    val vocab = Array("a", "b", "co", "uk", "ck", "jp", "com", "x", "zz")
    (1L to 8L).foreach { seed =>
      val nx = lcg(seed)
      def label() = vocab((nx() % vocab.length).toInt)
      def base() = // 1–2 labels, the real PSL's plain-rule depth range
        if (nx() % 2 == 0) label() else s"${label()}.${label()}"
      val plain = (0 until 6).map(_ => base()).distinct
      val wildBases = (0 until 3).map(_ => base()).distinct
      val wild = wildBases.map("*." + _)
      // exceptions only under an existing wildcard, ≥2 labels total —
      // the only shapes a valid PSL contains
      val excs = wildBases.take(2).map(b => s"!${label()}.$b")
      val rules = (plain ++ wild ++ excs).distinct
      // hosts: random 1–4 label names PLUS planted hits around every
      // rule base (the base itself, one deeper, two deeper)
      val planted = (plain ++ wildBases).flatMap(b =>
        Seq(b, s"${label()}.$b", s"${label()}.${label()}.$b")) ++
        excs.map(_.drop(1)) ++ excs.map(e => s"${label()}.${e.drop(1)}")
      val random = (0 until 40).map { _ =>
        (0 to (nx() % 4).toInt).map(_ => label()).mkString(".")
      }
      val hosts = (planted ++ random).distinct
      val got = graft.queries.Text.pldOf(hosts.toDF("host"), rules.toDF("suffix"))
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      hosts.foreach { h =>
        val want = refPld(h, rules)
        assert(got(h) == want,
          s"seed=$seed host=$h rules=${rules.mkString(",")}: got=${got(h)} want=$want")
      }
    }
  }
}
