package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Logit

/** Streaming deployment of the trained q132 curation gate — the
  * deployment shape of every learned filter: train OFFLINE (the
  * deterministic IRLS of [[Logit.train]], weights bit-identical at any
  * partition count), freeze the weights into the streaming plan as
  * literals, and score each arriving micro-batch with exactly the
  * expressions the batch entry uses.
  *
  * Unlike the engine's stateful twins (sessionization, CDC, spike
  * detection), this gate is STATELESS BY CONSTRUCTION: featurization
  * is per-row map work (token counts, the codegen'd blocklist
  * alternation) and the sigmoid projection carries the weights as plan
  * literals — no watermark, no state store, no shuffle appears in the
  * physical plan (ScoreStreamSpec asserts zero state operators), so
  * the gate runs at wire speed in front of storage and recovers from
  * failure by pure reprocessing. Batch==stream equality is therefore
  * not just observed but structural — the SAME projection over the
  * SAME frozen weights — and the spec still proves it row for row.
  */
object ScoreStream {

  /** Score a (possibly streaming) `(doc_id, text)` frame under frozen
    * weights: (doc_id, label, p_keep, pred) per arriving document —
    * `label` here is the hand rule's decision, emitted alongside so
    * ingest-time monitoring can track model-vs-rule divergence
    * continuously (the drift alarm a deployed filter needs). */
  def scored(docs: DataFrame, weights: Array[Double]): DataFrame =
    Logit.scoreWith(Logit.featuresOf(docs), weights)
}
