package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The WLD kernel as a typed Aggregator (SURVEY §2.11) — the reference's
  * most repeated pattern (≥10 call sites) expressed once for typed
  * Dataset pipelines: `ds.groupByKey(...).agg(WldAggregator.toColumn)`
  * or registered via `functions.udaf`. Spark plans it as a partial/final
  * aggregate exactly like the expression form in [[Wld]]; the buffer is
  * four longs, so only 32 bytes per group shuffle.
  *
  * Draw counting matches deck_type.py:256-269: anything that is neither
  * "win" nor "loss" is a draw. Empty input finishes to zeros with
  * win_rate 0.0 (user_analytics.py:213-220).
  */
final case class WldStats(games: Long, wins: Long, losses: Long, draws: Long, win_rate: Double)

final case class WldBuffer(games: Long, wins: Long, losses: Long, draws: Long)

object WldAggregator extends Aggregator[String, WldBuffer, WldStats] {

  override def zero: WldBuffer = WldBuffer(0L, 0L, 0L, 0L)

  override def reduce(b: WldBuffer, result: String): WldBuffer = result match {
    case "win"  => b.copy(games = b.games + 1, wins = b.wins + 1)
    case "loss" => b.copy(games = b.games + 1, losses = b.losses + 1)
    case _      => b.copy(games = b.games + 1, draws = b.draws + 1)
  }

  override def merge(a: WldBuffer, b: WldBuffer): WldBuffer =
    WldBuffer(a.games + b.games, a.wins + b.wins, a.losses + b.losses, a.draws + b.draws)

  override def finish(b: WldBuffer): WldStats = {
    val rate =
      if (b.games == 0L) 0.0
      else math.floor(b.wins.toDouble / b.games * 1e6 + 0.5) / 1e6
    WldStats(b.games, b.wins, b.losses, b.draws, rate)
  }

  override def bufferEncoder: Encoder[WldBuffer] = Encoders.product[WldBuffer]
  override def outputEncoder: Encoder[WldStats] = Encoders.product[WldStats]
}
