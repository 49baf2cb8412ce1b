package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One change row of a CDC stream (the streaming twin of
  * [[graft.operators.Cdc.compact]]'s input, payload fixed to one
  * numeric column — the plumbing pattern; widen the case class for a
  * richer payload).
  */
case class Change(k: Long, ver: Long, op: String, price: Option[Double])

/** The compacted view of one key (matches the batch operator's output
  * columns).
  */
case class CompactRow(k: Long, n_changes: Long, last_version: Long,
    first_op: String, last_op: String, net_op: String,
    price: Option[Double])

/** Accumulating compaction state for one key (top-level — Spark's
  * state encoder codegen needs a publicly constructible class).
  */
case class CdcState(n: Long, firstVer: Long, firstRank: Int,
    firstOp: String, lastVer: Long, lastRank: Int, lastOp: String,
    lastPrice: Option[Double])

/** Streaming CDC compaction — `mapGroupsWithState` in Update mode:
  * every micro-batch folds a key's new I/U/D rows into a tiny running
  * state (counts + first/last by (version, lifecycle-rank)) and emits
  * the key's CURRENT compacted row — exactly the upsert view a
  * downstream merge sink consumes. State per key is ONE small case
  * class regardless of change volume (never the change backlog), and
  * the fold is associative with the batch operator's aggregation, so
  * after any prefix of batches the emitted row equals
  * [[graft.operators.Cdc.compact]] over the union of those batches —
  * the parity CdcStreamSpec pins.
  */
object CdcStream {

  private def rank(op: String): Int =
    op match { case "I" => 0; case "U" => 1; case _ => 2 }

  def compactStream(changes: Dataset[Change]): Dataset[CompactRow] = {
    import changes.sparkSession.implicits._

    def fold(key: Long, it: Iterator[Change],
        state: GroupState[CdcState]): CompactRow = {
      var st = state.getOption.orNull
      it.foreach { c =>
        val r = rank(c.op)
        st =
          if (st == null)
            CdcState(1L, c.ver, r, c.op, c.ver, r, c.op, c.price)
          else {
            val isFirst = c.ver < st.firstVer ||
              (c.ver == st.firstVer && r < st.firstRank)
            val isLast = c.ver > st.lastVer ||
              (c.ver == st.lastVer && r > st.lastRank)
            CdcState(st.n + 1,
              if (isFirst) c.ver else st.firstVer,
              if (isFirst) r else st.firstRank,
              if (isFirst) c.op else st.firstOp,
              if (isLast) c.ver else st.lastVer,
              if (isLast) r else st.lastRank,
              if (isLast) c.op else st.lastOp,
              if (isLast) c.price else st.lastPrice)
          }
      }
      state.update(st)
      val net =
        if (st.firstOp == "I" && st.lastOp == "D") "noop"
        else if (st.lastOp == "D") "delete"
        else if (st.firstOp == "I") "insert"
        else "update"
      CompactRow(key, st.n, st.lastVer, st.firstOp, st.lastOp, net,
        if (st.lastOp == "D") None else st.lastPrice)
    }

    changes.groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold)
  }

  /** Start the compacted stream into an in-memory table (tests). */
  def startMemory(changes: Dataset[Change], name: String) =
    compactStream(changes).writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Update).start()
}
