package graft.tools

import graft.streaming.TopicClient

/** Cross-process producer for the topic-broker spec (two JVMs, real
  * sockets — the reference's event port is a network boundary, so the
  * broker twin must be exercised from a FOREIGN process, not just
  * loopback threads in one JVM). Connects to the broker, produces
  * `count` records under an idempotent batch id, re-sends the SAME
  * batch once (simulating a client retry after a lost ACK), and prints
  * the two appended counts for the parent spec to assert on.
  *
  * args: port count tsMs batchId
  */
object TopicProducerAgent {
  def main(args: Array[String]): Unit = {
    val Array(port, count, tsMs, batchId) = args.take(4)
    val recs = (0 until count.toInt).map(i => (s"agent-key-$i", s"agent-val-$i"))
    val c = new TopicClient("127.0.0.1", port.toInt)
    try {
      val first = c.produce(recs, tsMs.toLong, batchId = Some(batchId))
      val retry = c.produce(recs, tsMs.toLong, batchId = Some(batchId))
      println(s"AGENT_APPENDED $first $retry")
    } finally c.close()
  }
}
