package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate: the scale story of the headline queries
  * lives in their PHYSICAL plans — a silent fallback to a cartesian
  * product, a lost broadcast, or a new shuffle would pass every
  * correctness oracle and only show up at 100× the data. This suite pins
  * the plan properties the PLANS.md audits argue from, so a Spark bump
  * or refactor that degrades a plan fails CI instead of the next scale
  * sweep.
  *
  * Budgets are per-query UPPER bounds chosen from the current audited
  * plans (a shuffle under budget is fine; a new one over budget needs a
  * PLANS.md disposition and a budget bump in the same commit).
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    needle.r.findAllIn(hay).length

  /** (query, max exchanges, expect broadcast join). Exchange budget
    * counts ShuffleExchange operators in the final physical plan —
    * reused exchanges still print once per occurrence, making this a
    * conservative bound. */
  private val budgets: Seq[(String, Int, Boolean)] = Seq(
    // scan→filter→project: NO shuffle at all (pushdown + pruning)
    ("q_filter_project", 0, false),
    // one hash-agg shuffle
    ("q1_agg", 1, false),
    // dim join must broadcast (small side), one agg shuffle
    ("q_join_revenue", 2, true),
    // interval-containment against a derived quarter dim: broadcast,
    // never a cartesian/sort-merge over ranges
    ("q_range_join", 2, true),
    // windowed latest-per-key: one shuffle for the window
    ("q_events_latest", 2, false),
    // LSH band join: banding agg + self-join shuffles, bounded
    ("q_lsh_pairs", 8, false),
    // CDC decode is narrow from scan to typed rows: sort for the
    // orderBy is the only exchange
    ("q_cdc_roundtrip", 1, false),
    // upsert merge: ONE shuffle keyed on the PK (+ output sort)
    ("q_cdc_upsert", 2, false)
  )

  budgets.foreach { case (name, maxExchanges, wantBroadcast) =>
    test(s"$name: no cartesian, exchanges <= $maxExchanges" +
        (if (wantBroadcast) ", broadcasts its small side" else "")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name fell back to a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") || wantBroadcast,
        s"$name uses a nested-loop join it shouldn't:\n$p")
      // hashpartitioning only: the final orderBy's rangepartitioning is
      // presentation (oracle-stable output order), not a scale cost —
      // at cluster scale results land unsorted in a keyed sink
      val exchanges = count(p, "Exchange hashpartitioning")
      assert(exchanges <= maxExchanges,
        s"$name has $exchanges shuffle exchanges (budget $maxExchanges):\n$p")
      if (wantBroadcast)
        assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
          s"$name lost its broadcast join:\n$p")
    }
  }

  test("q_filter_project pushes filters and prunes columns at the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"no filters pushed to scan:\n$p")
  }

  test("headline queries stay inside whole-stage codegen") {
    // every budgeted query must have at least one WholeStageCodegen span —
    // a query that lost codegen entirely (e.g. an interpreted expression
    // taking over the hot path) is a 5-10x CPU regression at scale.
    // Under AQE codegen is applied per query stage at RUNTIME, so the
    // plan must be executed before inspecting it (the pre-execution
    // AdaptiveSparkPlan string carries no codegen markers).
    val missing = budgets.map(_._1).filterNot { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // executes THIS QueryExecution, finalizing its AQE plan
      val p = df.queryExecution.executedPlan.toString
      p.contains("WholeStageCodegen") || p.contains("*(")
    }
    assert(missing.isEmpty, s"no WholeStageCodegen span in: $missing")
  }
}
