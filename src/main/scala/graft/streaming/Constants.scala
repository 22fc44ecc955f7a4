package graft.streaming

/** Business-code constants (F13 — RT/common/GmallConstant.java:6-68).
  * Only the codes the pipeline actually branches on. */
object Constants {
  /** Good-appraise comment code (GmallConstant.java:21, APPRAISE_GOOD). */
  val AppraiseGood = "1201"
  /** Order status codes consumed by measure builders. */
  val OrderStatusPaid = "1002"
  val OrderStatusRefund = "1005"
  /** Keyword source tags (GmallConstant.java:60-68). */
  val KeywordSearch = "search"
  val KeywordClick = "click"
  val KeywordCart = "cart"
  val KeywordOrder = "order"
}
