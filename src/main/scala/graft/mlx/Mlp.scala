package graft.mlx

/** Minimal dense MLP (tanh hidden layers, softmax/sigmoid output) with
  * seeded deterministic init and SGD — the JVM-side stand-in for the
  * reference's Candle model (`ml/src/candle_model.rs`, 480 LoC). Training
  * rows are collected to the driver exactly as the reference does
  * (`execute_ml_train.rs`); inference is distributed via broadcast
  * weights + mapPartitions (see MlPredict).
  */
final case class Mlp(
    layers: Array[Array[Array[Double]]], // per layer: (out x (in+1)) incl. bias col
    outputs: Seq[String],                // class labels; single label = binary sigmoid
    binary: Boolean) extends Serializable {

  def forward(x: Array[Double]): Array[Double] = {
    var a = x
    var li = 0
    while (li < layers.length) {
      val w = layers(li)
      val out = new Array[Double](w.length)
      var j = 0
      while (j < w.length) {
        var z = w(j)(a.length) // bias
        var k = 0
        while (k < a.length) { z += w(j)(k) * a(k); k += 1 }
        out(j) = if (li == layers.length - 1) z else math.tanh(z)
        j += 1
      }
      a = out
      li += 1
    }
    if (binary) Array(1.0 / (1.0 + math.exp(-a(0))))
    else {
      val m = a.max
      val exps = a.map(v => math.exp(v - m))
      val s = exps.sum
      exps.map(_ / s)
    }
  }

  def predictLabel(x: Array[Double]): String = {
    val p = forward(x)
    if (binary) { if (p(0) > 0.5) outputs.head else s"not_${outputs.head}" }
    else outputs(p.indexOf(p.max))
  }
}

object Mlp {
  /** Deterministic Xavier-ish init. */
  def init(sizes: Seq[Int], outputs: Seq[String], binary: Boolean, seed: Long = 42L): Mlp = {
    val rnd = new scala.util.Random(seed)
    val layers = sizes.sliding(2).map { case Seq(in, out) =>
      val scale = math.sqrt(6.0 / (in + out))
      Array.fill(out)(Array.fill(in + 1)((rnd.nextDouble() * 2 - 1) * scale))
    }.toArray
    Mlp(layers, outputs, binary)
  }

  /** Plain SGD with backprop; cross-entropy (softmax) or logistic loss.
    * Returns (model, per-epoch mean loss). */
  def train(model: Mlp, data: Seq[(Array[Double], Int)], lr: Double,
      epochs: Int, batch: Int, seed: Long = 42L): (Mlp, Seq[Double]) = {
    var m = model
    val rnd = new scala.util.Random(seed)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 0 until epochs) {
      val shuffled = rnd.shuffle(data)
      var epochLoss = 0.0
      shuffled.grouped(math.max(batch, 1)).foreach { b =>
        val grads = m.layers.map(l => l.map(r => new Array[Double](r.length)))
        b.foreach { case (x, y) =>
          // forward pass keeping activations
          val acts = scala.collection.mutable.ArrayBuffer[Array[Double]](x)
          var a = x
          for ((w, li) <- m.layers.zipWithIndex) {
            val out = new Array[Double](w.length)
            for (j <- w.indices) {
              var z = w(j)(a.length)
              for (k <- a.indices) z += w(j)(k) * a(k)
              out(j) = if (li == m.layers.length - 1) z else math.tanh(z)
            }
            a = out
            acts += a
          }
          // output delta
          val logits = acts.last
          val delta: Array[Double] =
            if (m.binary) {
              val p = 1.0 / (1.0 + math.exp(-logits(0)))
              epochLoss += -(if (y == 1) math.log(p + 1e-12) else math.log(1 - p + 1e-12))
              Array(p - y)
            } else {
              val mx = logits.max
              val exps = logits.map(v => math.exp(v - mx))
              val s = exps.sum
              val p = exps.map(_ / s)
              epochLoss += -math.log(p(y) + 1e-12)
              p.zipWithIndex.map { case (pv, j) => pv - (if (j == y) 1.0 else 0.0) }
            }
          // backprop
          var d = delta
          for (li <- m.layers.indices.reverse) {
            val w = m.layers(li)
            val aIn = acts(li)
            for (j <- w.indices) {
              for (k <- aIn.indices) grads(li)(j)(k) += d(j) * aIn(k)
              grads(li)(j)(aIn.length) += d(j)
            }
            if (li > 0) {
              val nd = new Array[Double](aIn.length)
              for (k <- aIn.indices) {
                var acc = 0.0
                for (j <- w.indices) acc += w(j)(k) * d(j)
                nd(k) = acc * (1 - aIn(k) * aIn(k)) // tanh'
              }
              d = nd
            }
          }
        }
        val inv = lr / b.size
        m = Mlp(m.layers.zip(grads).map { case (lw, lg) =>
          lw.zip(lg).map { case (rw, rg) =>
            rw.zip(rg).map { case (w0, g) => w0 - inv * g }
          }
        }, m.outputs, m.binary)
      }
      losses += epochLoss / data.size
    }
    (m, losses.toSeq)
  }
}
