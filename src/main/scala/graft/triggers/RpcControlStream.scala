package graft.triggers

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** One RPC call as it rides the control stream: the encoded protobuf
  * `Call` plus the transport's correlation id and a per-source offset
  * (the queue position — replay ordering across a restart).
  */
final case class ControlCall(callId: String, payload: Array[Byte], offset: Long)

/** S9 live wiring: the RPC control plane consumed AS A STREAM next to
  * the data pipeline — the Spark shape of the reference running its
  * RPC consumer in the same supervision tree as the data consumers
  * (`application.ex:42`, `rpc/handler.ex:35-100`).
  *
  * Each micro-batch's calls are applied IN OFFSET ORDER to the shared
  * [[RpcControlPlane]] on the driver — `foreachBatch` runs
  * driver-side, which is exactly where the plane's installed-trigger
  * overlay lives, so no executor ever needs mutable trigger state.
  * The collect is deliberate and bounded: control-plane traffic is
  * operator-issued trigger management, orders of magnitude below the
  * data plane; a control stream that needed distribution would be a
  * design smell, not a scale win. Every reply is handed to `onReply`
  * for the transport glue to publish on the reply-to queue.
  *
  * Visibility contract (ST3): an install acked in micro-batch N of
  * the control stream is seen by the data query's next state-function
  * invocation — the data stream re-reads the provider per micro-batch,
  * so the trigger fires from the data stream's next micro-batch on,
  * and a congruence-aware delete stops exactly the deleted id's
  * targets while congruent survivors keep firing.
  */
object RpcControlStream {

  def attach(
      calls: Dataset[ControlCall],
      plane: RpcControlPlane,
      onReply: (String, Array[Byte]) => Unit = (_, _) => (),
      checkpointDir: Option[String] = None,
      queryName: String = "graft-rpc-control"): StreamingQuery = {
    val writer = calls.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[ControlCall], _: Long) =>
        batch.orderBy(col("offset")).collect().foreach { c =>
          onReply(c.callId, plane.handleRpc(c.payload))
        }
        ()
      }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }
}
