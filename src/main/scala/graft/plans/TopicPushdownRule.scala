package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ElementAt, EqualTo, Expression, In, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{EthSpjTable, EthTable}

/** Optimizer rule: rewrite `element_at(topics, 1) IN ('0x..','0x..')` /
  * `element_at(topics, 1) = '0x..'` predicates over a graft-eth logs
  * relation into the connector's `topics` option, so the topic filter
  * reaches the NODE (the reference pushes topics into the eth_getLogs
  * filter — LogsService.java:548-556,384-386). V1 `Filter` pushdown can't
  * express a predicate on an array element, hence a plan rule.
  *
  * Safety: the Catalyst `Filter` is left in place, so the pushed option is
  * purely data-reducing — the residual re-filter preserves exact semantics
  * (including dropping empty-topics rows that the reference's node filter
  * semantics let through, quirk §8.4).
  *
  * Injected via `GraftExtensions` (spark.sql.extensions) as an operator
  * optimization rule — these run before the V2 scan-pushdown batch, while
  * the relation is still a `DataSourceV2Relation`.
  */
object TopicPushdownRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, r: DataSourceV2Relation)
        if (r.table.isInstanceOf[EthTable] && r.table.name() == "graft-eth:logs"
          || r.table.isInstanceOf[EthSpjTable] && r.table.name() == "graft-eth-spj:logs")
          && !r.options.containsKey("topics") =>
      val topics = splitConjunctivePredicates(cond).flatMap(extractTopic0(_, r))
      if (topics.isEmpty) f
      else {
        val newOpts = new java.util.HashMap[String, String](r.options)
        newOpts.put("topics", topics.distinct.mkString(","))
        f.copy(child = r.copy(options = new CaseInsensitiveStringMap(newOpts)))
      }
  }

  /** Matches element_at(topics, 1) = lit / IN (lits) over THIS relation's
    * `topics` column; yields the topic strings.
    */
  private def extractTopic0(e: Expression, r: DataSourceV2Relation): Seq[String] = {
    def isTopic0(x: Expression): Boolean = x match {
      case ElementAt(attr, Literal(idx, _), _, _) =>
        idx == 1 && r.output.exists(o => o.name == "topics" && attr.references.contains(o))
      case _ => false
    }
    e match {
      case EqualTo(l, Literal(v: UTF8String, _)) if isTopic0(l) => Seq(v.toString)
      case EqualTo(Literal(v: UTF8String, _), rhs) if isTopic0(rhs) => Seq(v.toString)
      case In(l, vs) if isTopic0(l) && vs.nonEmpty && vs.forall {
            case Literal(_: UTF8String, _) => true
            case _ => false
          } =>
        vs.map { case Literal(v: UTF8String, _) => v.toString }
      case _ => Seq.empty
    }
  }
}
