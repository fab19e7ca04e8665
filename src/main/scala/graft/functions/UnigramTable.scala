package graft.functions

/** Frozen unigram-LM vocabulary — trained deterministically by
  * [[graft.ml.UnigramTrain.train]] (default Config: vocabSize 512, seed
  * 2048, maxPieceLen 8, 2+2 hard-EM rounds) over the sf0.001 `documents`
  * fixture corpus, then COMMITTED like a shipped tokenizer's vocab file:
  * the encoder ([[Unigram.countTokens]]), the ScalaTest goldens, and the
  * trainer-parity spec (which re-derives this table from the same corpus
  * and must match it exactly) all hang off this one array. The corpus's
  * 31-word vocabulary makes the trained table small; the DP and trainer
  * are exercised against richer toy vocabularies in UnigramSpec.
  */
object UnigramTable {
  /** (piece, logprob), sorted by piece. */
  val pieces: Array[(String, Double)] = Array(("a", -10.269934593623564), ("b", -10.269934593623564), ("c", -10.269934593623564), ("customer", -3.4798373581096587), ("d", -10.269934593623564), ("e", -10.269934593623564), ("f", -10.269934593623564), ("g", -10.269934593623564), ("h", -10.269934593623564), ("i", -10.269934593623564), ("j", -10.269934593623564), ("k", -10.269934593623564), ("l", -10.269934593623564), ("m", -10.269934593623564), ("n", -10.269934593623564), ("o", -10.269934593623564), ("p", -10.269934593623564), ("q", -10.269934593623564), ("r", -10.269934593623564), ("s", -10.269934593623564), ("t", -10.269934593623564), ("u", -10.269934593623564), ("v", -10.269934593623564), ("w", -10.269934593623564), ("y", -10.269934593623564), ("▁", -3.4798373581096587), ("▁a", -3.433675316346496), ("▁agg", -3.410319689969361), ("▁batch", -3.456489994112667), ("▁big", -3.4787131308973778), ("▁column", -3.384424923588746), ("▁data", -3.471994180648633), ("▁dup", -6.902638763637089), ("▁fast", -3.453198713028595), ("▁filter", -3.4488271213670982), ("▁group", -3.4304581553947204), ("▁hash", -3.442305359120711), ("▁join", -3.4283191171459713), ("▁key", -3.4187496661298207), ("▁line", -3.417692024571685), ("▁merge", -3.4293880643348764), ("▁order", -3.387497122625716), ("▁part", -3.399881181825438), ("▁query", -3.4304581553947204), ("▁row", -3.5060496850611282), ("▁scan", -3.3783086965713096), ("▁slow", -3.4444745573682565), ("▁small", -3.469764525321364), ("▁sort", -3.3885232899810283), ("▁spark", -3.456489994112667), ("▁stream", -3.446648471267876), ("▁table", -3.464212040206578), ("▁the", -3.456489994112667), ("▁value", -3.4134726090289766), ("▁vector", -3.433675316346496), ("▁window", -3.386472007210471))
}
