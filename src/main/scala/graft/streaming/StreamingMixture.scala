package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming token-budget admission control — the continuous counterpart
  * of the batch dataset mixture (q113, `SampleOps.budgetedMixture`).
  *
  * The batch op picks a deterministic md5-ordered prefix per source; a
  * stream has no global order to prefix, so the streaming spelling is
  * ADMISSION CONTROL: documents are admitted in arrival order while their
  * source's lifetime token total is under that source's budget, the
  * boundary-crossing document is admitted (greedy, same contract as the
  * batch op), and everything after is dropped. Sources without a budget
  * admit nothing.
  *
  * Scale design: state is ONE long (the source's running token total) per
  * source key, sharded by the groupByKey shuffle — bounded by the source
  * catalog, not the corpus. Within a micro-batch each source's rows are
  * ordered by `seq` before admission, because the group iterator's order
  * is partitioning-dependent — without the sort, replays after a crash
  * could admit a different prefix. With it, (source's arrival batches ×
  * seq) is a total order, so the admitted set is deterministic and a spec
  * can pin stream == batch-fold equality.
  */
object StreamingMixture {

  final case class DocTok(doc_id: Long, stratum: String, n_tok: Long,
      seq: Long)
  final case class Admitted(doc_id: Long, stratum: String, n_tok: Long,
      cum_tok: Long)

  /** Admit docs while each stratum's running total is under its budget.
    * `seq` orders rows WITHIN a micro-batch per stratum (use the upstream
    * event/file sequence; doc_id works when ids are arrival-ordered). */
  def admissionControl(docs: DataFrame, budgets: Map[String, Long],
      idCol: String = "doc_id", strataCol: String = "stratum",
      tokCol: String = "n_tok", seqCol: String = "seq"): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    val typed = docs.select(col(idCol).cast(LongType).as("doc_id"),
        col(strataCol).cast(StringType).as("stratum"),
        col(tokCol).cast(LongType).as("n_tok"),
        col(seqCol).cast(LongType).as("seq")).as[DocTok]
    typed.groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (stratum: String, rows: Iterator[DocTok], state: GroupState[Long]) =>
          budgets.get(stratum) match {
            case None => Iterator.empty
            case Some(budget) =>
              var cum = state.getOption.getOrElse(0L)
              val out = Seq.newBuilder[Admitted]
              // deterministic within-batch order — see scaladoc
              rows.toSeq.sortBy(_.seq).foreach { d =>
                if (cum < budget) {
                  cum += d.n_tok
                  out += Admitted(d.doc_id, d.stratum, d.n_tok, cum)
                }
              }
              state.update(cum)
              out.result().iterator
          })
  }

  /** Batch reference: the same greedy fold, driver-side, over rows in
    * (batch, seq) order — what the stream must equal on bounded input. */
  def referenceFold(batches: Seq[Seq[(Long, String, Long)]],
      budgets: Map[String, Long]): Seq[Admitted] = {
    val cums = scala.collection.mutable.Map.empty[String, Long]
    val out = Seq.newBuilder[Admitted]
    for (batch <- batches; (id, st, tok) <- batch) {
      budgets.get(st).foreach { budget =>
        val cum = cums.getOrElse(st, 0L)
        if (cum < budget) {
          cums(st) = cum + tok
          out += Admitted(id, st, tok, cum + tok)
        }
      }
    }
    out.result()
  }
}
