package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.core.TokenCodec
import graft.streaming.SessionEngine.ActionRow

/** Codec law: decode(encode(x)) == quantize(x), on the golden fixture and
  * seeded random games. */
class TokenCodecSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("game_id", "action_id", "period_id", "time_seconds",
    "team_id", "player_id", "start_x", "start_y", "end_x", "end_y",
    "type_id", "result_id", "bodypart_id")

  private def normalized(df: org.apache.spark.sql.DataFrame) =
    df.select(
      col("game_id").cast("long"), col("action_id").cast("long"),
      col("period_id").cast("int"), col("time_seconds").cast("double"),
      col("team_id").cast("long"), col("player_id").cast("long"),
      col("start_x"), col("start_y"), col("end_x"), col("end_y"),
      col("type_id").cast("int"), col("result_id").cast("int"),
      col("bodypart_id").cast("int"))
      .orderBy("game_id", "action_id").collect().toSeq

  test("roundtrip on the golden 400-action game") {
    val g = goldenSpadl
    val round = TokenCodec.decode(TokenCodec.encode(g))
    assert(round.count() == 400)
    assert(normalized(round) == normalized(TokenCodec.quantize(g).select(cols.map(col): _*)))
  }

  test("n_tok = stride * actions; doc per game") {
    val enc = TokenCodec.encode(goldenSpadl)
    val r = enc.select("doc_id", "n_tok", "source").head
    assert(r.getString(0) == "8657")
    assert(r.getInt(1) == 400 * TokenCodec.Stride)
    assert(r.getString(2) == "spadl")
    assert(enc.count() == 1)
  }

  test("roundtrip on random multi-game frames") {
    val rnd = new Random(7)
    val rows = (0 until 20).flatMap { g =>
      (0 until 1 + rnd.nextInt(50)).map { i =>
        ActionRow(g.toLong, i.toLong, 1 + rnd.nextInt(2), rnd.nextDouble() * 3000,
          rnd.nextInt(4).toLong, rnd.nextInt(30).toLong,
          rnd.nextDouble() * 105, rnd.nextDouble() * 68,
          rnd.nextDouble() * 105, rnd.nextDouble() * 68,
          rnd.nextInt(23), rnd.nextInt(6), rnd.nextInt(6), i.toLong)
      }
    }
    val df = rows.toDF()
    val round = TokenCodec.decode(TokenCodec.encode(df))
    assert(round.count() == rows.size)
    assert(normalized(round) ==
      normalized(TokenCodec.quantize(df).select(cols.map(col): _*)))
    // idempotence: encoding the decoded frame reproduces the same tokens
    val enc1 = TokenCodec.encode(df).select("doc_id", "tokens")
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val enc2 = TokenCodec.encode(TokenCodec.decode(TokenCodec.encode(df)))
      .select("doc_id", "tokens")
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(enc1 == enc2)
  }
}
