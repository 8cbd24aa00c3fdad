package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t_repetition's per-row mode kernel: the longest-run scan over a sorted
  * array must equal the naive mode (max count, smallest element on ties)
  * for arbitrary token sequences. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def naiveMode(toks: Seq[String]): (String, Long) = {
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val best = counts.values.max
    (counts.filter(_._2 == best).keys.min, best)
  }

  test("longest-run mode equals naive mode on random token arrays") {
    val rng = new scala.util.Random(7)
    // NB: plain `Vector(...)` here would resolve to graft.queries.Vector
    val vocab = scala.collection.immutable.Vector("a", "b", "c", "dd", "e", "ff", "g")
    val rows = (0 until 200).map { i =>
      val n = 1 + rng.nextInt(40)
      (i.toLong, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val got = rows.toDF("id", "text")
      .withColumn("r", expr(Text.longestRunSql("array_sort(split(text, ' '))")))
      .select(col("id"), col("r.btok"), col("r.best"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    rows.foreach { case (id, text) =>
      assert(got(id) == naiveMode(text.split(' ').toSeq), s"doc $id: '$text'")
    }
  }

  test("single-token and uniform documents hit the boundary cases") {
    val rows = Seq((0L, "x"), (1L, "y y y y"), (2L, "b a b a"))
    val got = rows.toDF("id", "text")
      .withColumn("r", expr(Text.longestRunSql("array_sort(split(text, ' '))")))
      .select(col("id"), col("r.btok"), col("r.best"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(0L) == ("x", 1L))
    assert(got(1L) == ("y", 4L))
    assert(got(2L) == ("a", 2L)) // tie at 2 -> smallest token
  }
}
