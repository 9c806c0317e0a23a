package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Row

/** Bullet-style result envelope: a JSON object with a `records` array and a
  * `meta` map (reference: `querier.getResult → clip.asJSON`,
  * `/root/reference/src/main/scala/com/yahoo/bullet/spark/utils/BulletSparkUtils.scala:69-70`).
  */
final case class Clip(meta: Map[String, Any], records: Seq[Map[String, Any]]) {
  def asJson: String = Clip.render(Map("meta" -> meta, "records" -> records))
}

object Clip {

  def ofRows(meta: Map[String, Any], rows: Seq[Row]): Clip =
    Clip(meta, rows.map(rowToMap))

  def rowToMap(r: Row): Map[String, Any] =
    r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap

  private def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def render(v: Any): String = v match {
    case null => "null"
    case None => "null"
    case Some(x) => render(x)
    case s: String => "\"" + escape(s) + "\""
    case b: Boolean => b.toString
    case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float => render(f.toDouble)
    case n: Number => n.toString
    case t: Timestamp => "\"" + t.toInstant.toString + "\""
    case m: Map[_, _] =>
      m.map { case (k, x) => "\"" + escape(k.toString) + "\":" + render(x) }
        .mkString("{", ",", "}")
    case r: Row => render(rowToMap(r))
    case it: Iterable[_] => it.map(render).mkString("[", ",", "]")
    case arr: Array[_] => arr.map(render).mkString("[", ",", "]")
    case other => "\"" + escape(other.toString) + "\""
  }
}

/** Signals on the result channel (reference `Signal` KILL/COMPLETE/FAIL,
  * `/root/reference/src/main/scala/com/yahoo/bullet/spark/data/BulletSignalData.scala:17`). */
object ResultKind extends Enumeration {
  val Window, Complete, Fail, Kill = Value
}

final case class ResultMessage(queryId: String, kind: ResultKind.Value, clip: Clip)
