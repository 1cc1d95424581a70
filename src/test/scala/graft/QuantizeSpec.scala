package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantize

class QuantizeSpec extends SparkSuite {
  import spark.implicits._

  test("int8: hand-computed codes, bounds, and round-half-up at 127.5") {
    val df = Seq((1L, Array(0f, 1f, 2f))).toDF("vec_id", "embedding")
    val r = Quantize.int8(df)
      .select("q_lo", "q_hi", "codes").as[(Double, Double, Seq[Long])].head()
    assert(r._1 == 0.0 && r._2 == 2.0)
    // scale = 2/255; 1.0/scale = 127.5 rounds half-up to 128
    assert(r._3 == Seq(0L, 128L, 255L))
  }

  test("int8: constant vector quantizes to zero codes with zero error") {
    val df = Seq((1L, Array(3.5f, 3.5f, 3.5f))).toDF("vec_id", "embedding")
    val r = Quantize.int8(df)
      .select("q_scale", "codes", "q_err").as[(Double, Seq[Long], Double)].head()
    assert(r == ((0.0, Seq(0L, 0L, 0L), 0.0)))
  }

  test("int8 on the corpus: codes in [0,255], mean error <= scale/2") {
    val q = Quantize.int8(Tables.embeddings(spark, sf)).limit(200)
    val bad = q.where(exists(col("codes"), c => c < 0 || c > 255)).count()
    assert(bad == 0)
    val overErr = q.where(col("q_err") > col("q_scale") / 2 + 1e-9).count()
    assert(overErr == 0)
  }

  test("codesHash matches poly_hash of the joined decimal string") {
    val df = Seq((1L, Array(0f, 1f, 2f))).toDF("vec_id", "embedding")
    val got = Quantize.int8(df)
      .select(Quantize.codesHash(col("codes"))).as[Long].head()
    assert(got == graft.functions.PolyHash.hash("0,128,255"))
  }

  test("quantization plan is map-only (no Exchange)") {
    val plan = Quantize.int8(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization must not shuffle:\n$plan")
  }
}
