package graft.functions

/** A TRAINED document-quality classifier (the CCNet / GPT-3-class
  * pipeline stage): logistic regression over hashed-token features
  * (the text_hash_embed signed hashing trick, D=64), trained on the
  * embedded labeled corpus below and SHIPPED AS INTEGER LITERALS —
  * model parameters are literals exactly the way the language-ID
  * profiles and the PQ codebooks are, so both engines (Spark and the
  * DuckDB oracle) replay the score bit-for-bit.
  *
  * The decision is the linear margin in EXACT INTEGER arithmetic
  * (sigmoid is monotone, so the gate never needs it): with cnt(d) the
  * signed token-count of hash dim d and n the token count,
  *
  *   scoreMilli = Σ_d W(d)·cnt(d) + B·n      (length-normalized by
  *   cross-multiplication: margin/n + b ≥ 0  ⇔  margin + b·n ≥ 0)
  *
  * and q_pass = scoreMilli ≥ 0. W/B are the converged training
  * weights quantized ×1000 — TextVectorSpec RE-RUNS the training
  * (deterministic: zero init, fixed epochs/rate, corpus order) and
  * pins that it reproduces these exact literals, then pins held-out
  * accuracy ≥ 0.9 on documents the training never saw, strictly above
  * both the majority baseline and the hand-rule text_quality gate on
  * the same split (the rule gate is blind to token identity, so
  * high-TTR gibberish fools it by construction).
  *
  * At 100 TB the score is a narrow map + one (doc, dim) combine over
  * md5 arithmetic — no vocabulary broadcast, no model server, the
  * stateless shape a streaming admission gate needs.
  */
object QualityModel {
  val Dims = 64

  /** The embedded labeled corpus. `label` 1 = keep-quality prose,
    * 0 = reject (gibberish, token repetition, boilerplate/navigation
    * chrome, keyword stuffing). TRAIN and TEST splits are disjoint;
    * the held-out docs share only the natural-language token
    * distribution (function words), not content words — exactly the
    * generalization a hashed logistic gate is supposed to carry. */
  val TrainDocs: Seq[(Int, String)] = Seq(
    1 -> "the committee approved the budget after a long debate over spending priorities",
    1 -> "she walked along the river in the early morning and watched the light change",
    1 -> "a good essay states its claim early and supports it with clear evidence",
    1 -> "the engineers traced the outage to a failed switch in the northern data center",
    1 -> "historians still argue about the causes of the collapse of the empire",
    1 -> "the recipe calls for two eggs a cup of flour and a pinch of salt",
    1 -> "when the train finally arrived the platform was already crowded with travelers",
    1 -> "the study found that sleep quality affects memory more than total sleep time",
    1 -> "he repaired the old clock carefully replacing the worn gears one by one",
    1 -> "the novel follows three generations of a family through war and migration",
    1 -> "investors worried that rising rates would slow the housing market this year",
    1 -> "the museum opened a new wing devoted to early photography and film",
    1 -> "volunteers cleared the trail and rebuilt the wooden bridge across the creek",
    1 -> "the professor explained that the proof depends on a clever change of variables",
    1 -> "local farmers sell tomatoes and corn at the market every saturday morning",
    1 -> "the orchestra rehearsed the final movement until the balance felt right",
    1 -> "clear writing is mostly clear thinking done in advance of the sentence",
    1 -> "the ship left the harbor at dawn and turned south along the coast",
    1 -> "researchers sequenced the genome and found an unexpected family of genes",
    1 -> "the city council voted to extend the tram line to the airport",
    0 -> "zqv xkp wrn jml qgt bzx vkd plm znq xwt rkj mvb",
    0 -> "buy now buy now buy now buy now buy now buy now buy now",
    0 -> "home about contact login register privacy terms sitemap faq careers",
    0 -> "cheap watches cheap watches best cheap watches discount watches watches",
    0 -> "asdf asdf asdf jkl jkl jkl asdf jkl asdf jkl asdf jkl",
    0 -> "click here click here click here subscribe subscribe subscribe now now",
    0 -> "qwerty uiop zxcv bnm qwerty uiop zxcv bnm qwerty uiop",
    0 -> "free free free win win win prize prize prize money money",
    0 -> "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod",
    0 -> "menu search cart checkout wishlist account orders returns help footer",
    0 -> "xjqz vplm wkrt nbgd zsfh qymc xjqz vplm wkrt nbgd",
    0 -> "casino poker slots casino poker slots jackpot jackpot bonus bonus",
    0 -> "gg wp ez gg wp ez gg wp ez gg wp ez",
    0 -> "copyright all rights reserved cookie policy accept decline settings language",
    0 -> "viagra cialis pills pharmacy viagra cialis pills pharmacy cheap meds",
    0 -> "mxkz pqvw trjl bhdn gsfy cmxk zpqv wtrj lbhd ngsf",
    0 -> "follow like share follow like share comment comment subscribe bell icon",
    0 -> "404 error page not found error 404 not found try again",
    0 -> "untitled document untitled document new folder new folder final final v2",
    0 -> "skip to content skip to navigation toggle menu close dialog open")

  val TestDocs: Seq[(Int, String)] = Seq(
    1 -> "the bakery on the corner sells bread that is still warm at noon",
    1 -> "after the storm passed the crew checked the sails and the rigging",
    1 -> "the lecture covered how glaciers carve valleys over thousands of years",
    1 -> "she revised the draft twice before sending it to the editor",
    1 -> "the garden needs water in the evening when the heat has faded",
    1 -> "a fair tax system is simple to understand and hard to avoid",
    1 -> "the children built a small dam of stones across the stream",
    1 -> "his research compares wage growth across regions over the last decade",
    1 -> "the pilot reported calm air and an early arrival into the valley",
    1 -> "good tools disappear into the work and bad tools interrupt it",
    0 -> "wvnx kqjr tzpl mdgb hsfc wvnx kqjr tzpl mdgb hsfc",
    0 -> "subscribe now subscribe now limited offer limited offer act fast act",
    0 -> "next prev page 1 2 3 4 5 6 last",
    0 -> "best price best price best deal best deal order order today",
    0 -> "plok mijn uhby vgtc plok mijn uhby vgtc plok mijn",
    0 -> "terms conditions apply see store for details offer void where prohibited",
    0 -> "zzz aaa zzz aaa zzz aaa zzz aaa zzz aaa",
    0 -> "download install update download install update restart retry cancel ok",
    0 -> "jackpot winner claim prize wire transfer fee urgent reply immediately kindly",
    0 -> "share this post share this post like and subscribe like and")

  /** the EXACT arithmetic of text_hash_embed's dim/sign, JVM-side:
    * md5 hex, first 8 chars as unsigned int → dim, 9th hex char
    * parity → sign. Must stay in lock-step with [[graft.operators
    * .TextOps.hashEmbedCore]] and the DuckDB CTE (spec-pinned via the
    * literal-replay assertion: a drift here converges to DIFFERENT
    * weights than the shipped literals). */
  def tokDim(tok: String): Int = {
    val h = md5Hex(tok)
    (java.lang.Long.parseLong(h.substring(0, 8), 16) % Dims).toInt
  }
  def tokSign(tok: String): Int =
    if (java.lang.Long.parseLong(md5Hex(tok).substring(8, 9), 16) % 2 == 0)
      1 else -1
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** TWO SHAPE FEATURES past the hashed dims — both exact integers in
    * the relational domain, so the cross-multiplied margin stays
    * integer: slot Dims = distinct-token count / n (type-token ratio:
    * catches repetition of tokens training never saw, which no
    * bag-of-hashed-tokens weight can), slot Dims+1 = summed token
    * length / n (mean token length: keyboard-mash and chrome skew
    * short). */
  val NumFeatures: Int = Dims + 2

  /** mean token length is ~5, an order above every other feature —
    * scaled down for GD conditioning; [[train]] folds the scale back
    * into the shipped per-sumLen-unit integer weight, so the
    * relational margin still multiplies the RAW summed length. */
  val LenScale = 8.0

  /** per-doc feature vector: signed token counts over [[Dims]] hash
    * dims + the two shape features, all length-normalized — plus the
    * token count. */
  def features(text: String): (Array[Double], Int) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val x = new Array[Double](NumFeatures)
    toks.foreach(t => x(tokDim(t)) += tokSign(t))
    x(Dims) = toks.distinct.length
    x(Dims + 1) = toks.map(_.length).sum / LenScale
    val n = toks.length
    if (n > 0) {
      var i = 0; while (i < NumFeatures) { x(i) /= n; i += 1 }
    }
    (x, n)
  }

  /** DETERMINISTIC logistic-regression training: zero init, full-batch
    * gradient descent, fixed rate and epoch count, corpus order fixed
    * by the literal — bit-reproducible anywhere, which is what lets
    * the spec re-run it and pin the shipped literals. Returns
    * (weights ×1000 rounded, bias ×1000 rounded). */
  def train(): (Array[Long], Long) = {
    val data = TrainDocs.map { case (y, t) => (y.toDouble, features(t)._1) }
    val w = new Array[Double](NumFeatures)
    var b = 0.0
    val lr = 0.5
    var epoch = 0
    while (epoch < 800) {
      val gw = new Array[Double](NumFeatures)
      var gb = 0.0
      data.foreach { case (y, x) =>
        var z = b
        var i = 0
        while (i < NumFeatures) { z += w(i) * x(i); i += 1 }
        // StrictMath: Math.exp may use platform intrinsics that vary
        // across CPUs — the literal-replay pin needs the SAME
        // converged weights on any JVM
        val p = 1.0 / (1.0 + StrictMath.exp(-z))
        val e = p - y
        i = 0
        while (i < NumFeatures) { gw(i) += e * x(i); i += 1 }
        gb += e
      }
      val inv = lr / data.length
      var i = 0
      while (i < NumFeatures) { w(i) -= inv * gw(i); i += 1 }
      b -= inv * gb
      epoch += 1
    }
    // per-INTEGER-UNIT quantization: hashed dims and the distinct
    // count were already unit-scaled; the length weight divides by
    // LenScale so the shipped literal multiplies the RAW summed length
    val q = w.zipWithIndex.map { case (v, i) =>
      math.round((if (i == Dims + 1) v / LenScale else v) * 1000.0)
    }
    (q, math.round(b * 1000.0))
  }

  /** THE SHIPPED MODEL: [[train]]'s converged output, quantized ×1000
    * — regenerate by running `train()` and pasting (TextVectorSpec
    * fails loudly if these drift from what training produces). */
  val Weights: Array[Long] = Array(
    // 64 hashed-token dims (8 per row), then distinct-count and
    // summed-token-length unit weights
    89L, 388L, -1034L, 938L, 505L, -1584L, 146L, 617L,
    -213L, 622L, 813L, 2015L, -383L, 34L, 574L, -731L,
    756L, -782L, 54L, 420L, -234L, -266L, 218L, -993L,
    916L, -2427L, 0L, 1213L, 693L, 136L, 164L, -436L,
    -735L, 980L, -829L, 652L, 101L, -332L, 375L, 438L,
    -802L, 133L, 823L, -868L, 548L, -8552L, 968L, 561L,
    373L, -196L, -998L, -137L, 496L, 434L, 938L, -1826L,
    576L, 2254L, 924L, -262L, 436L, -444L, -521L, -1165L,
    4241L, -207L)
  val Bias: Long = -2926L

  /** integer margin of one JVM-side doc — the same arithmetic the
    * query/oracle run relationally:
    * Σ W(d)·cnt(d) + W(D)·distinct + W(D+1)·sumLen + Bias·n. */
  def scoreMilli(text: String): Long = {
    val toks = text.split(" ").filter(_.nonEmpty)
    var s = Bias * toks.length +
      Weights(Dims) * toks.distinct.length +
      Weights(Dims + 1) * toks.map(_.length).sum
    toks.foreach(t => s += Weights(tokDim(t)) * tokSign(t))
    s
  }
}
